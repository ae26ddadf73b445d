package graft

import graft.streaming.{Sessionize, Salting}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize: gap splits sessions, end = last + gap") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 00:10:00", 2.0),  // same session (gap 15m)
      (1L, "2024-01-01 01:00:00", 3.0),  // new session
      (2L, "2024-01-01 00:05:00", 4.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = Sessionize.sessionize(ev, "ts", "user_id", "15 minutes")
      .orderBy("user_id", "session_start").collect()
    assert(out.length === 3)
    assert(out(0).getAs[Long]("n_events") === 2)
    assert(out(0).getAs[java.sql.Timestamp]("session_end").toString
      === "2024-01-01 00:25:00.0") // last event 00:10 + 15m gap
    assert(out(1).getAs[Long]("n_events") === 1)
  }

  test("runningUserStats accumulates across streaming micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.UserEvent]
    val query = Sessionize.runningUserStats(input.toDS())
      .writeStream.format("memory").queryName("user_stats")
      .outputMode("update").start()
    input.addData(Sessionize.UserEvent(1, "click", 1.0),
      Sessionize.UserEvent(1, "purchase", 10.0))
    query.processAllAvailable()
    input.addData(Sessionize.UserEvent(1, "purchase", 5.0),
      Sessionize.UserEvent(2, "view", 2.0))
    query.processAllAvailable()
    val rows = spark.sql(
      """SELECT user_id, max(n_events) n, max(sum_value) s,
        |max(n_purchases) p FROM user_stats GROUP BY user_id
        |ORDER BY user_id""".stripMargin).collect()
    query.stop()
    assert(rows(0).getLong(1) === 3L)   // state carried across batches
    assert(rows(0).getDouble(2) === 16.0)
    assert(rows(0).getLong(3) === 2L)
    assert(rows(1).getLong(1) === 1L)
  }

  test("saltedJoin equals the plain join") {
    val big = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val small = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = big.join(small, "l_orderkey")
    val salted = Salting.saltedJoin(big, small, "l_orderkey", 8)
    assert(salted.count() === plain.count())
    assert(salted.columns.sorted.toSeq === plain.columns.sorted.toSeq)
    val diff = salted.groupBy("l_orderkey").count()
      .join(plain.groupBy("l_orderkey").count()
        .withColumnRenamed("count", "c2"), "l_orderkey")
      .filter(col("count") =!= col("c2")).count()
    assert(diff === 0)
  }
}
