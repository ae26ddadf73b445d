package graft

import graft.expressions.FreqSketchExpr
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items sketch ([[graft.expressions.FreqSketch]]).
  * Counter values are merge-order dependent, so the invariant tests
  * assert the MG bounds (which hold under every merge order) rather
  * than exact counter values; the distinct<=k case IS exact and is
  * pinned value-for-value across partitionings. */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(items: Seq[String], k: Int, parts: Int)
      : Seq[(String, Long)] =
    items.toDF("item").repartition(parts)
      .agg(FreqSketchExpr.freqSketch(col("item"), k).as("sk"))
      .select(explode(col("sk")))
      .select(col("col.item"), col("col.est"))
      .as[(String, Long)].collect().toSeq

  test("distinct items <= k: exact counts on any partitioning") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    val want = Seq(("a", 40L), ("b", 25L), ("c", 3L))
    for (parts <- Seq(1, 7, 32)) {
      assert(sketchOf(scala.util.Random.shuffle(items), k = 8, parts) ===
        want, s"parts=$parts")
    }
  }

  test("output is sorted est DESC then item ASC") {
    val items = Seq.fill(10)("z") ++ Seq.fill(10)("a") ++ Seq.fill(4)("m")
    assert(sketchOf(items, k = 8, parts = 3) ===
      Seq(("a", 10L), ("z", 10L), ("m", 4L)))
  }

  test("MG bounds hold on a skewed stream under many merge orders") {
    // zipf-ish: item i appears ~ 3000/i times, 400 distinct, k = 16
    val r = new scala.util.Random(42)
    val items = r.shuffle((1 to 400).flatMap(i =>
      Seq.fill(3000 / i)(s"term$i")))
    val exact = items.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong
    }
    val n = items.size.toLong
    val k = 16
    for (parts <- Seq(1, 5, 32)) {
      val sk = sketchOf(items, k, parts)
      assert(sk.size <= k)
      val est = sk.toMap
      val retained = sk.map(_._2).sum
      val eps = (n - retained).toDouble / (k + 1)
      exact.foreach { case (t, truth) =>
        val e = est.getOrElse(t, 0L)
        assert(e <= truth, s"overcount of $t at parts=$parts")
        assert(truth - e <= eps,
          s"bound miss for $t: true=$truth est=$e eps=$eps parts=$parts")
      }
      // every guaranteed heavy hitter (true > eps) must be present
      exact.filter(_._2 > eps).keys.foreach { t =>
        assert(est.contains(t), s"lost heavy hitter $t at parts=$parts")
      }
    }
  }

  test("nulls are skipped; k must be positive; item must be string") {
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("item")
    val got = df.agg(FreqSketchExpr.freqSketch(col("item"), 4).as("sk"))
      .select(explode(col("sk"))).select("col.*")
      .collect().toSeq
    assert(got === Seq(Row("a", 2L), Row("b", 1L)))
    intercept[Exception] {
      df.agg(FreqSketchExpr.freqSketch(col("item"), 0)).collect()
    }
    intercept[Exception] {
      Seq(1L, 2L).toDF("item")
        .agg(FreqSketchExpr.freqSketch(col("item"), 4)).collect()
    }
  }
}
