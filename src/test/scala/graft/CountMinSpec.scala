package graft

import graft.ops.CountMin
import org.apache.spark.sql.functions._

/** Count-Min invariants: overcount-only estimates, exact values when
  * width is collision-free, disjoint-batch fold ≡ one-pass state, and
  * the loud width-mismatch guards. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def stream = Seq.fill(40)("a") ++ Seq.fill(15)("b") ++
    Seq.fill(5)("c") ++ Seq("d")

  test("estimates never undercount; generous width is exact") {
    val df = stream.toDF("item")
    val state = CountMin.sketch(df, "item", depth = 4, width = 4096)
    val probes = Seq("a", "b", "c", "d", "never-seen").toDF("item")
    val got = CountMin.estimate(state, probes, "item",
      depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 4096 buckets for 4 distinct items: collision-free w.h.p. for this
    // fixed md5-derived layout — estimates are exact, absent item is 0
    assert(got === Map("a" -> 40L, "b" -> 15L, "c" -> 5L, "d" -> 1L,
      "never-seen" -> 0L))
  }

  test("tiny width still only overcounts") {
    val df = stream.toDF("item")
    val state = CountMin.sketch(df, "item", depth = 3, width = 2)
    val truth = Map("a" -> 40L, "b" -> 15L, "c" -> 5L, "d" -> 1L)
    val got = CountMin.estimate(state, truth.keys.toSeq.toDF("item"),
      "item", depth = 3, width = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, t) => assert(got(k) >= t, s"undercount on $k") }
  }

  test("disjoint-batch fold equals the one-pass sketch exactly") {
    val (s1, s2) = stream.splitAt(23)
    val folded = CountMin.fold(
      CountMin.sketch(s1.toDF("item"), "item", depth = 4, width = 64),
      CountMin.sketch(s2.toDF("item"), "item", depth = 4, width = 64))
    val onePass = CountMin.sketch(stream.toDF("item"), "item",
      depth = 4, width = 64)
    assert(folded.exceptAll(onePass).isEmpty && onePass.exceptAll(folded)
      .isEmpty)
  }

  test("streamed maintenance equals the one-pass sketch, incl. a late " +
      "delta resumed from the checkpoint") {
    import graft.streaming.StreamingSummary
    val root = java.nio.file.Files.createTempDirectory("graft_cm").toString
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
    val all = stream.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("i", "item")
    (0 to 2).foreach(i => land(all.filter(pmod(col("i"), lit(3)) === i),
      s"b$i"))
    def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val got = StreamingSummary.maintainCountMinFromFiles(spark,
      s"$root/deltas", all.schema, s"$root/ckpt", s"$root/sketch",
      "item", depth = 4, width = 64)
    assert(cells(got) ===
      cells(CountMin.sketch(all, "item", depth = 4, width = 64)))

    land(all.limit(10), "b3") // late delta: only it folds on resume
    val got2 = StreamingSummary.maintainCountMinFromFiles(spark,
      s"$root/deltas", all.schema, s"$root/ckpt", s"$root/sketch",
      "item", depth = 4, width = 64)
    assert(cells(got2) === cells(CountMin.sketch(
      all.unionByName(all.limit(10)), "item", depth = 4, width = 64)))
  }

  test("width/depth mismatches fail loudly in fold and estimate") {
    val a = CountMin.sketch(stream.toDF("item"), "item", width = 64)
    val b = CountMin.sketch(stream.toDF("item"), "item", width = 128)
    val e1 = intercept[Exception] { CountMin.fold(a, b).collect() }
    assert(e1.getMessage.contains("folding incompatible"))
    val e2 = intercept[Exception] {
      CountMin.estimate(a, Seq("a").toDF("item"), "item", width = 128)
        .collect()
    }
    assert(e2.getMessage.contains("mismatched state"))
    // wrong DEPTH would silently estimate 0 for everything without the
    // n_rows guard (probe rows 4..7 find no cells, min coalesces to 0)
    val e3 = intercept[Exception] {
      CountMin.estimate(a, Seq("a").toDF("item"), "item",
        depth = 8, width = 64).collect()
    }
    assert(e3.getMessage.contains("mismatched state"))
    // the guard is GLOBAL: two sketches whose populated cells are
    // disjoint still raise (a per-cell check would never see both widths
    // in one group)
    val tiny64 = CountMin.sketch(Seq("only-a").toDF("item"), "item",
      depth = 1, width = 64)
    val tiny128 = CountMin.sketch(Seq("only-b").toDF("item"), "item",
      depth = 1, width = 128)
    val e4 = intercept[Exception] {
      CountMin.fold(tiny64, tiny128).collect()
    }
    assert(e4.getMessage.contains("folding incompatible"))
  }

  test("estimate against an EMPTY state raises instead of all-zero") {
    // min/max over zero rows are null; without the explicit isNull arm
    // the guard's when() condition nulls out and every estimate is
    // silently 0 — the exact failure mode the guard documents preventing
    val empty = CountMin.sketch(
      Seq.empty[String].toDF("item").filter(col("item").isNotNull),
      "item", depth = 4, width = 64)
    val e = intercept[Exception] {
      CountMin.estimate(empty, Seq("a").toDF("item"), "item",
        depth = 4, width = 64).collect()
    }
    assert(e.getMessage.contains("state has no rows"))
  }
}
