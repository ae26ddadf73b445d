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

  test("closedSessions: event-time timeout emits closed sessions once") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[Sessionize.TimedEvent]
    val query = Sessionize.closedSessions(input.toDS(), gapSeconds = 600,
      watermark = "0 seconds")
      .writeStream.format("memory").queryName("closed_sessions")
      .outputMode("append").start()
    // batch 1: one open session for user 1
    input.addData(
      Sessionize.TimedEvent(1, ts("2024-01-01 00:00:00"), 1.0),
      Sessionize.TimedEvent(1, ts("2024-01-01 00:05:00"), 2.0))
    query.processAllAvailable()
    assert(spark.sql("SELECT * FROM closed_sessions").count() === 0)
    // batch 2: a much later event closes user 1's session inline AND
    // advances the watermark past user 2's (absent) state
    input.addData(
      Sessionize.TimedEvent(1, ts("2024-01-01 02:00:00"), 5.0))
    query.processAllAvailable()
    // the first session closed with 2 events, end = last + gap
    val rows = spark.sql(
      "SELECT * FROM closed_sessions ORDER BY session_start").collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[Long]("n_events") === 2L)
    assert(rows(0).getAs[java.sql.Timestamp]("session_end").toString
      === "2024-01-01 00:15:00.0")
    assert(rows(0).getAs[Double]("sum_value") === 3.0)
    // batch 3: watermark moves far ahead -> timeout closes the 02:00
    // session without any new event for user 1
    input.addData(
      Sessionize.TimedEvent(2, ts("2024-01-01 06:00:00"), 9.0))
    query.processAllAvailable()
    input.addData(
      Sessionize.TimedEvent(2, ts("2024-01-01 07:00:00"), 1.0))
    query.processAllAvailable()
    val rows2 = spark.sql(
      "SELECT * FROM closed_sessions ORDER BY session_start").collect()
    query.stop()
    assert(rows2.length >= 2)
    val second = rows2(1)
    assert(second.getAs[Long]("user_id") === 1L)
    assert(second.getAs[Long]("n_events") === 1L)
    assert(second.getAs[Double]("sum_value") === 5.0)
  }
}
