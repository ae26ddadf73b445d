package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: inclusive, per-key, tie-broken, null before first") {
    val quotes = Seq(
      (1L, "2024-01-01 00:00:00", 100L, 1.0),
      (1L, "2024-01-01 00:10:00", 101L, 2.0),
      (1L, "2024-01-01 00:10:00", 102L, 3.0), // tie: higher id wins
      (2L, "2024-01-01 00:30:00", 103L, 9.0))
      .toDF("user_id", "ts_s", "event_id", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val trades = Seq(
      (1L, "2023-12-31 23:59:00", 200L, 0.0), // before any quote -> null
      (1L, "2024-01-01 00:10:00", 201L, 0.0), // equal ts -> inclusive
      (1L, "2024-01-01 00:20:00", 202L, 0.0),
      (2L, "2024-01-01 00:45:00", 203L, 0.0),
      (3L, "2024-01-01 00:45:00", 204L, 0.0)) // key with no quotes
      .toDF("user_id", "ts_s", "event_id", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

    val out = AsOf.asofJoin(trades, quotes, Seq("user_id"), "ts",
      pickCols = Seq("value"), ordCol = Some("event_id"))
      .orderBy("event_id")
      .select("event_id", "value_asof")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toSeq
    assert(out === Seq(
      200L -> None,        // no preceding quote
      201L -> Some(3.0),   // equal-ts quote visible; id 102 beats 101
      202L -> Some(3.0),
      203L -> Some(9.0),
      204L -> None))       // key never quoted
  }

  test("asofJoin is row-atomic: null picked values don't fall back") {
    val quotes = Seq(
      (1L, "2024-01-01 00:00:00", 100L, Some(5.0), Some("a")),
      (1L, "2024-01-01 00:10:00", 101L, None, Some("b")), // null value
      (1L, null.asInstanceOf[String], 102L, Some(99.0), Some("z")))
      .toDF("user_id", "ts_s", "event_id", "value", "tag")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val trades = Seq((1L, "2024-01-01 00:20:00", 200L))
      .toDF("user_id", "ts_s", "event_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

    val r = AsOf.asofJoin(trades, quotes, Seq("user_id"), "ts",
      pickCols = Seq("value", "tag"), ordCol = Some("event_id"))
      .select("value_asof", "tag_asof").collect().head
    // the 00:10 quote is the match: its null value must NOT fall back to
    // the older 5.0, and tag must come from the SAME row ("b")
    assert(r.isNullAt(0))
    assert(r.getString(1) === "b")
    // the null-ts quote (99.0/"z") never matches anything (SQL r.ts<=l.ts)
  }
}
