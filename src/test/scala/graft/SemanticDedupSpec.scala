package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** semanticDedup semantics: cluster-local keep-first dedup, threshold
  * respected, cross-cell pairs untouched (the documented contract), and
  * the loud maxClusterSize guard. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vecDf(rows: Seq[(Long, Seq[Double])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def cents(rows: Seq[(Long, Seq[Double])]): DataFrame =
    rows.toDF("cell", "centroid")

  private def run(data: DataFrame, c: DataFrame, t: Double,
      cap: Int = 100000): Map[Long, (Long, Boolean)] =
    Dedup.semanticDedup(data, "vec_id", "embedding", c, threshold = t,
      maxClusterSize = cap)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap

  test("same-cell scaled copies collapse to the lowest id") {
    val data = vecDf(Seq(
      1L -> Seq(1.0, 0.0), // cell 0
      2L -> Seq(2.0, 0.0), // cosine 1.0 with id 1 -> dropped
      3L -> Seq(0.0, 1.0))) // cell 1, alone
    val c = cents(Seq(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0)))
    val got = run(data, c, 0.9)
    assert(got === Map(1L -> (0L, true), 2L -> (0L, false),
      3L -> (1L, true)))
  }

  test("below-threshold cluster-mates both survive") {
    // cos((1,0),(1,1)) = 0.707 < 0.9 but both land in cell 0
    val data = vecDf(Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(1.0, 1.0)))
    val c = cents(Seq(0L -> Seq(1.0, 0.2), 1L -> Seq(-1.0, 0.0)))
    val got = run(data, c, 0.9)
    assert(got(1L)._2 && got(2L)._2)
  }

  test("cross-cell near-dups are NOT dropped (cluster-local contract)") {
    // v1/v2 are cosine ~0.995 but straddle the centroid boundary
    val data = vecDf(Seq(1L -> Seq(1.0, 0.1), 2L -> Seq(1.0, 0.2)))
    val c = cents(Seq(0L -> Seq(1.0, 0.0), 1L -> Seq(1.0, 0.3)))
    val got = run(data, c, 0.9)
    assert(got(1L) === (0L, true))
    assert(got(2L) === (1L, true))
  }

  test("transitive chain: keep-first is pairwise, not greedy-sequential") {
    // 1~2 close, 2~3 close, 1~3 close: ids 2 and 3 each have a lower-id
    // close mate -> only id 1 survives
    val data = vecDf(Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(5.0, 0.0),
      3L -> Seq(0.25, 0.0)))
    val c = cents(Seq(0L -> Seq(1.0, 0.0)))
    val got = run(data, c, 0.9)
    assert(got.view.mapValues(_._2).toMap ===
      Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("oversized cluster raises loudly instead of a quadratic join") {
    val data = vecDf((1L to 5L).map(i => i -> Seq(1.0, i * 0.001)))
    val c = cents(Seq(0L -> Seq(1.0, 0.0)))
    val ex = intercept[Exception] {
      run(data, c, 0.99, cap = 3)
    }
    assert(ex.getMessage.contains("maxClusterSize"))
  }

  test("assignment matches assignCells' argmax/tie rules") {
    val data = vecDf(Seq(1L -> Seq(1.0, 1.0)))
    // equidistant centroids: tie breaks to the lowest cell
    val c = cents(Seq(0L -> Seq(0.0, 1.0), 1L -> Seq(1.0, 0.0)))
    assert(run(data, c, 0.9)(1L)._1 === 0L)
    val direct = Similarity.assignCells(data, "vec_id", "embedding", c)
      .select("cell").as[Long].head()
    assert(direct === 0L)
  }
}
