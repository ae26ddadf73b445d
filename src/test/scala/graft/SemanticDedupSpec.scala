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

  test("multi-probe recovers the boundary-straddling near-dup the " +
      "single-probe contract documents as missed") {
    // centroids at 0° and 22°; vectors at 10° and 12° sit on opposite
    // sides of the 11° bisector (cosine(a,b) = cos 2° ≈ 0.9994), so
    // nprobe=1 assigns them to DIFFERENT cells and keeps both —
    // while each one's runner-up cell is the other's primary
    def ang(deg: Double) =
      Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
    val data = vecDf(Seq(1L -> ang(10), 2L -> ang(12)))
    val c = cents(Seq(0L -> ang(0), 1L -> ang(22)))
    val single = run(data, c, 0.99)
    assert(single === Map(1L -> (0L, true), 2L -> (1L, true)),
      "precondition: single-probe must miss the boundary pair")
    val multi = Dedup.semanticDedup(data, "vec_id", "embedding", c,
        threshold = 0.99, nprobe = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    // primary cells unchanged; the higher id now loses to the pair
    assert(multi === Map(1L -> (0L, true), 2L -> (1L, false)))
  }

  test("nprobe=1 path is bit-identical to the original single-probe " +
      "output, and TopCells[0] equals ArgmaxCell on a random batch") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 200L).map(i =>
      i -> Seq.fill(8)(rnd.nextGaussian()))
    val data = vecDf(rows)
    val c = cents((0L to 15L).map(j =>
      j -> Seq.fill(8)(new scala.util.Random(j).nextGaussian())))
    val a = run(data, c, 0.95)
    val b = CacheScope.withScope { implicit s =>
      Dedup.semanticDedup(data, "vec_id", "embedding", c,
          threshold = 0.95, nprobe = 1)
        .collect().map(r => r.getLong(0) -> (r.getLong(1),
          r.getBoolean(2))).toMap
    }
    assert(a === b)
    // TopCells rank 1 == ArgmaxCell, and ranks follow the composed
    // (cosine DESC, cell ASC) window on every row
    val multi = Similarity.assignCellsMulti(data, "vec_id", "embedding",
      c, nprobe = 3)
    val top1 = multi.filter(col("crank") === 1)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val arg = Similarity.assignCells(data, "vec_id", "embedding", c)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top1 === arg)
    val composed = data.crossJoin(broadcast(
        c.select(col("cell"), col("centroid"))))
      .withColumn("crank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(Similarity.cosine(col("embedding"),
            col("centroid")).desc, col("cell"))))
      .filter(col("crank") <= 3)
      .select(col("vec_id"), col("crank"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val fused = multi.select(col("vec_id"), col("crank"), col("cell"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(fused === composed)
  }

  test("degenerate vectors keep their row at EVERY nprobe: the output " +
      "row universe does not change with the probe count") {
    // null, zero-norm, and wrong-dimension vectors next to one normal
    val rows = Seq(
      1L -> Seq(1.0, 0.0),
      2L -> null.asInstanceOf[Seq[Double]],
      3L -> Seq(0.0, 0.0),
      4L -> Seq(1.0, 0.0, 0.0))
    val data = vecDf(rows)
    val c = cents(Seq(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0)))
    def universe(nprobe: Int): Map[Long, (Option[Long], Boolean)] =
      CacheScope.withScope { implicit s =>
        Dedup.semanticDedup(data, "vec_id", "embedding", c,
            threshold = 0.9, nprobe = nprobe)
          .collect().map(r => r.getLong(0) ->
            ((if (r.isNullAt(1)) None else Some(r.getLong(1))),
              r.getBoolean(2))).toMap
      }
    val u1 = universe(1)
    val u2 = universe(2)
    assert(u1.keySet === Set(1L, 2L, 3L, 4L),
      "single-probe keeps degenerate rows with a null cell")
    assert(u2.keySet === u1.keySet,
      "multi-probe must not drop degenerate rows (keep-list joins " +
        "would silently lose those docs when nprobe changes)")
    Seq(2L, 3L, 4L).foreach { id =>
      assert(u1(id) === ((None, true)), s"id $id at nprobe=1")
      assert(u2(id) === ((None, true)), s"id $id at nprobe=2")
    }
    // and the membership frame itself carries crank 1 for them
    val m = Similarity.assignCellsMulti(data, "vec_id", "embedding",
      c, nprobe = 2)
    val deg = m.filter(col("vec_id").isin(2L, 3L, 4L))
      .select(col("vec_id"), col("cell"), col("crank")).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getInt(2))).toSeq
    assert(deg.toSet === Set((2L, None, 1), (3L, None, 1),
      (4L, None, 1)))
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
