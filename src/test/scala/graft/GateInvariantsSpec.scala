package graft

import org.apache.spark.sql.functions._

/** The two no-oracle gates (DuckDB can't replay zlib or the trained
  * quantizer) carry self-verifying boolean columns instead; this spec
  * asserts they are all-true on the real sf0.001 tables, so a regression
  * flips a boolean in the digested driver artifact AND fails here. */
class GateInvariantsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t5_compression_signal booleans hold on sf0.001") {
    val out = SparkEntry.queries("t5_compression_signal")(spark, sf)
    val bad = out.filter(!col("ratio_in_bounds") ||
      !col("repetition_detected")).count()
    assert(bad === 0L)
    assert(out.count() > 0L)
  }

  test("d10b_containment_recall: exact recall on the monitored stratum") {
    // unlike t5/ann6 this gate IS oracle-replayed (portable md5 probe
    // hash), but the boolean is also asserted here so a recall
    // regression fails the suite even without the driver's compare
    val row = SparkEntry.queries("d10b_containment_recall")(spark, sf)
      .collect().head
    // n_true first: on an empty stratum the recall boolean is the less
    // informative failure
    assert(row.getAs[Long]("n_true") > 0L,
      "monitored stratum has no true pairs — the gate checks nothing")
    assert(row.getAs[Boolean]("recall_exact_ok"),
      s"index path missed ${row.getAs[Long]("n_missed")} of " +
        s"${row.getAs[Long]("n_true")} true pairs")
  }

  test("ann6_recall_monitor booleans hold on sf0.001") {
    val out = SparkEntry.queries("ann6_recall_monitor")(spark, sf)
      .cache()
    val bad = out.filter(!col("counts_consistent") ||
      !col("recall_in_bounds")).count()
    assert(bad === 0L)
    assert(out.count() === 2L) // base batch + b1
    out.unpersist()
  }
}
