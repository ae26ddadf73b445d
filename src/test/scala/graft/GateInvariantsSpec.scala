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

  // Telemetry TRIPWIRE (the r13 ask): the per-gate executor metrics in
  // the bench artifact were built for forensics; these invariants make
  // them fail the suite instead of waiting to be read. Reads the
  // repo's committed bench_full.json (the last full sf0.1 run) — the
  // suite cannot afford to re-run 240 gates at sf0.1 itself, but a
  // committed artifact that violates the invariants is exactly the
  // regression the tripwire exists to catch at review time.
  test("bench telemetry tripwire: zero spill and bounded task counts " +
      "per gate at sf0.1 (reads bench_full.json)") {
    val f = new java.io.File("bench_full.json")
    assume(f.exists, "no bench artifact at repo root")
    val txt = new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val start = txt.indexOf("\"gate_metrics\":")
    assume(start >= 0, "artifact predates gate_metrics")
    val ends = Seq("\"anchor_ratio\":", "\"warmup_failures\":")
      .map(k => txt.indexOf(k, start)).filter(_ > start)
    val gm = Some(txt.substring(start,
      if (ends.nonEmpty) ends.min else txt.length))
    val entry = ("\"([a-z0-9_]+)\":\\{[^}]*\"spill_mb\":([0-9.]+)" +
      "[^}]*\"tasks\":([0-9]+)\\}").r
    val rows = entry.findAllMatchIn(gm.get)
      .map(m => (m.group(1), m.group(2).toDouble, m.group(3).toLong))
      .toSeq
    assert(rows.size >= 200,
      s"parsed only ${rows.size} gate-metric rows — parser drifted?")
    val spilled = rows.filter(_._2 > 0)
    assert(spilled.isEmpty,
      s"gates spilled at sf0.1 (memory-pressure regression): " +
        spilled.map(r => s"${r._1}=${r._2}MB").mkString(", "))
    // declared ceiling: the committed max is ~1.2k tasks per gate
    // (ir1's store lifecycle across its 2-3 runs); 4000 is a genuine
    // runaway — e.g. a lost repartition or a default-200 shuffle
    // multiplying through an iterative operator
    val heavy = rows.filter(_._3 > 4000)
    assert(heavy.isEmpty,
      s"gates above the 4000-task ceiling: " +
        heavy.map(r => s"${r._1}=${r._3}").mkString(", "))
  }

  // The anchor_flags guard promoted from artifact to TRIPWIRE (the r14
  // stretch): wall-clock ratios flag machine windows as readily as
  // plan regressions, but executor run_ms is machine-window-resistant
  // (the r14 j1 forensics: run_ms flat at ~1.0 s while wall inflated
  // 16 s under contention). A shared gate whose committed run_ms
  // exceeds 3x its anchor run_ms is a REAL plan/work regression and
  // fails the suite at review time instead of waiting for a reader.
  // Gates under 500 ms of anchor executor time are exempt — the
  // scheduling floor dominates them.
  test("anchor run_ms tripwire: no shared gate's executor time " +
      "exceeds 3x its anchor (reads bench_full.json + " +
      "bench_anchor.json)") {
    val f = new java.io.File("bench_full.json")
    val a = new java.io.File("bench_anchor.json")
    assume(f.exists, "no bench artifact at repo root")
    assume(a.exists, "no bench anchor at repo root")
    val txt = new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val atxt = new String(
      java.nio.file.Files.readAllBytes(a.toPath), "UTF-8")
    val start = txt.indexOf("\"gate_metrics\":")
    assume(start >= 0, "artifact predates gate_metrics")
    val cur = ("\"([a-z0-9_]+)\":\\{\"run_ms\":([0-9]+)").r
      .findAllMatchIn(txt.substring(start))
      .map(m => m.group(1) -> m.group(2).toLong).toMap
    val aStart = atxt.indexOf("\"run_ms\":{")
    assume(aStart >= 0, "anchor predates run_ms")
    val aEnd = atxt.indexOf("}", aStart)
    val anchor = ("\"([a-z0-9_]+)\":([0-9]+)").r
      .findAllMatchIn(atxt.substring(aStart, aEnd))
      .map(m => m.group(1) -> m.group(2).toLong).toMap
    val shared = cur.keySet intersect anchor.keySet
    assume(shared.size >= 100,
      s"only ${shared.size} shared gates — parser drifted?")
    val regressed = shared.toSeq
      .filter(n => anchor(n) >= 500L)
      .filter(n => cur(n) > 3L * anchor(n))
      .sortBy(n => -cur(n).toDouble / anchor(n))
    assert(regressed.isEmpty,
      "gates whose executor run_ms regressed >3x vs the committed " +
        "anchor (machine-window-resistant — this is real work): " +
        regressed.map(n =>
          s"$n=${cur(n)}ms(anchor ${anchor(n)}ms)").mkString(", "))
  }
}
