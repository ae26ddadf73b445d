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

  test("mergeable profile: folded disjoint deltas decode to exactly " +
      "the one-pass profile, including an all-null column") {
    val df = (1 to 900).map(i =>
      (i.toLong * 10, if (i % 7 == 0) None else Some(i.toLong),
        None: Option[Long])).toDF("x", "y", "z")
    val cols = Seq("x", "y", "z")
    val deltas = (0 until 3).map(k =>
      Drift.mergeableProfile(df.filter(pmod(hash(col("x")), lit(3)) === k),
        cols))
    val folded = deltas.reduce(Drift.foldProfiles)
    def rows(p: org.apache.spark.sql.DataFrame) =
      p.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]))).toSet
    assert(rows(Drift.profileOf(folded)) === rows(Drift.profile(df, cols)))

    val quiet = Drift.compare(Drift.profileOf(folded),
      Drift.profile(df, cols)).collect()
    assert(quiet.length === 12 && quiet.forall(!_.getBoolean(4)))
  }

  test("streamed profile maintenance: the versioned state equals the " +
      "one-pass profile and judges a drifted batch") {
    import graft.streaming.StreamingSummary
    val root = java.nio.file.Files.createTempDirectory("graft_sd").toString
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    def land(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      df.coalesce(1).write.parquet(s"$root/in/$tag")
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/in/$tag"))
        .filter(_.getPath.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, j) =>
          fs.rename(f.getPath,
            new org.apache.hadoop.fs.Path(s"$root/deltas/${tag}_$j.parquet"))
        }
    }
    val all = (1 to 600).map(i => (i.toLong * 100, Some(i.toLong)))
      .toDF("x", "y")
    (0 until 3).foreach(k =>
      land(all.filter(pmod(hash(col("y")), lit(3)) === k), s"b$k"))
    val cols = Seq("x", "y")
    val state = StreamingSummary.maintainProfileFromFiles(spark,
      s"$root/deltas", all.schema, s"$root/ckpt", s"$root/state", cols)
    val decoded = Drift.profileOf(state)
    val quiet = Drift.compare(decoded, Drift.profile(all, cols)).collect()
    assert(quiet.length === 8 && quiet.forall(!_.getBoolean(4)))

    val drifted = (1 to 600).map(i =>
      (i.toLong * 300, if (i % 4 == 0) None else Some(i.toLong)))
      .toDF("x", "y")
    val rep = Drift.compare(Drift.profile(drifted, cols), decoded)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getBoolean(4)).toMap
    assert(rep(("x", "avg")) && rep(("x", "p99")) &&
      rep(("y", "null_ppm")))
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
