package graft

import graft.ops.{Scd2, TrackedCol}
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = lit(s).cast("timestamp")

  test("SCD2: versions open/close correctly and re-apply is a no-op") {
    val day1 = Seq(("P1", "Grocery", 10.0), ("P2", "Dairy", 5.0))
      .toDF("sku", "category", "price")
    val h1 = Scd2.init(day1, ts("2024-01-01 00:00:00"))

    // day 2: P1 price changes, P3 appears, P2 unchanged
    val day2 = Seq(("P1", "Grocery", 12.0), ("P2", "Dairy", 5.0),
      ("P3", "Snacks", 3.0)).toDF("sku", "category", "price")
    val tracked = Seq(TrackedCol("category"), TrackedCol("price", Some(0.01)))
    val h2 = Scd2.applyChanges(h1, day2, Seq("sku"), tracked,
      ts("2024-01-02 00:00:00"))

    val rows = h2.orderBy("sku", "scd_version")
      .select("sku", "price", "scd_version", "scd_current")
      .as[(String, Double, Long, Boolean)].collect().toSeq
    assert(rows === Seq(
      ("P1", 10.0, 1L, false),  // closed
      ("P1", 12.0, 2L, true),   // reopened at v2
      ("P2", 5.0, 1L, true),    // untouched
      ("P3", 3.0, 1L, true)))   // brand new
    // closed row's end == new row's start (contiguous tiling)
    val p1 = h2.filter(col("sku") === "P1").orderBy("scd_version")
      .select("scd_start", "scd_end").collect()
    assert(p1(0).getTimestamp(1) === p1(1).getTimestamp(0))

    // idempotence
    val h3 = Scd2.applyChanges(h2, day2, Seq("sku"), tracked,
      ts("2024-01-03 00:00:00"))
    assert(h3.count() === h2.count())
    assert(h3.filter(col("scd_start") === ts("2024-01-03 00:00:00"))
      .count() === 0)
  }

  test("SCD2: versionAt and as-of fact resolution pick the right version") {
    val day1 = Seq(("P1", 10.0)).toDF("sku", "price")
    val h1 = Scd2.init(day1, ts("2024-01-01 00:00:00"))
    val h2 = Scd2.applyChanges(h1, Seq(("P1", 12.0)).toDF("sku", "price"),
      Seq("sku"), Seq(TrackedCol("price", Some(0.01))),
      ts("2024-01-05 00:00:00"))

    assert(Scd2.versionAt(h2, ts("2024-01-03 00:00:00"))
      .select("price").as[Double].collect().toSeq === Seq(10.0))
    assert(Scd2.versionAt(h2, ts("2024-01-06 00:00:00"))
      .select("price").as[Double].collect().toSeq === Seq(12.0))

    val facts = Seq(
      ("P1", "2023-12-30 00:00:00", 1L),  // before history -> null
      ("P1", "2024-01-02 00:00:00", 2L),  // v1
      ("P1", "2024-01-05 00:00:00", 3L),  // boundary: new version applies
      ("P1", "2024-01-09 00:00:00", 4L))
      .toDF("sku", "fts_s", "fact_id")
      .withColumn("fts", col("fts_s").cast("timestamp")).drop("fts_s")
    val resolved = Scd2.resolveAtTime(facts, h2, Seq("sku"), "fts",
      attrs = Seq("price"))
      .orderBy("fact_id")
      .select("fact_id", "price_asof", "scd_version_asof")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(resolved.toSeq === Seq(
      (1L, None, None),
      (2L, Some(10.0), Some(1L)),
      (3L, Some(12.0), Some(2L)),
      (4L, Some(12.0), Some(2L))))
  }
}
