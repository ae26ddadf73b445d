package graft

import graft.validate.Drift
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, mean over non-null, in-bound quantile " +
      "estimates, and null quantiles for an all-null column") {
    val df = Seq((100L, Some(10L)), (200L, None), (300L, Some(30L)))
      .toDF("a", "b")
    val p = Drift.profile(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = p("a")
    assert(a.getLong(1) === 3L && a.getLong(2) === 3L)
    assert(a.getDouble(3) === 200.0)
    val p50 = a.getLong(4)
    assert(p50 >= 200L && p50 - 200L <= (200L >> 7))
    val b = p("b")
    assert(b.getLong(1) === 3L && b.getLong(2) === 2L)
    assert(b.getDouble(3) === 20.0)

    val allNull = Seq[Option[Long]](None, None).toDF("c")
    val pc = Drift.profile(allNull, Seq("c")).collect().head
    assert(pc.isNullAt(3) && pc.isNullAt(4) && pc.isNullAt(5))
  }

  test("compare: identical batches are quiet; mean/tail shift, " +
      "null-rate jump, and one-sided metrics all flag") {
    val base = (1 to 1000).map(i =>
      (i.toLong * 100, Some(i.toLong), None: Option[Long]))
      .toDF("x", "y", "z")
    val cols = Seq("x", "y", "z")
    val pBase = Drift.profile(base, cols)

    val quiet = Drift.compare(pBase, pBase).collect()
    assert(quiet.length === 12)
    assert(quiet.forall(!_.getBoolean(4)))

    val cur = (1 to 1000).map { i =>
      (i.toLong * 200, // mean and tail doubled
        if (i % 5 == 0) None else Some(i.toLong), // 20% nulled
        Some(i.toLong)) // was all-null in base
    }.toDF("x", "y", "z")
    val rep = Drift.compare(Drift.profile(cur, cols), pBase).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(4))
      .toMap
    assert(rep(("x", "avg")) && rep(("x", "p50")) && rep(("x", "p99")))
    assert(!rep(("x", "null_ppm")))
    assert(rep(("y", "null_ppm"))) // 0 -> 200000 ppm
    assert(rep(("z", "avg")) && rep(("z", "p50")) && rep(("z", "null_ppm")))
    assert(rep.keys.map(_._1).toSet === Set("x", "y", "z"))
  }
}
