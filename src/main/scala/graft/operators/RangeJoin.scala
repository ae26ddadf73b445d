package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: pair each left POINT with every right
  * INTERVAL `[lo, hi)` that contains it — price-band tagging, IP-range
  * lookup, numeric-bucket enrichment.
  *
  * Spark plans the theta spelling (`p >= lo AND p < hi`) as a
  * broadcast-nested-loop when one side is small and a cartesian when
  * neither is — O(points · intervals) compares either way, which does
  * not survive 100 TB. The scalable form bins the domain at
  * `bucketWidth`: every interval explodes to the buckets it covers
  * (span/width + 1 rows — bounded when spans are bounded), every point
  * computes its single bucket, and a (point, interval) pair co-occurs
  * in EXACTLY the point's bucket, so the bucket equi-join has per-pair
  * multiplicity one — no dedup pass — and the exact containment filter
  * runs only on co-bucketed candidates. Shuffle is keyed on the bucket;
  * pick `bucketWidth` near the median interval span so interval
  * replication stays ≈2×.
  */
object RangeJoin {

  /** Inner range join. Never-matching interval rows — null bounds,
    * empty (`lo > hi`), and NON-FINITE bounds (NaN/±Inf, whose bucket
    * arithmetic is meaningless: `cast(NaN as long)` is 0 and ±Inf
    * saturates to Long.Min/MaxValue) — are dropped up front; a NaN/Inf
    * POINT keeps SQL semantics through the containment filter (it can
    * satisfy `p < hi` for no finite hi). `maxBucketsPerInterval` fails
    * LOUDLY (raise_error) on an interval that would explode into more
    * buckets than that — a mis-sized bucketWidth against a wild
    * interval silently becoming a row-multiplication storm is the
    * failure mode this guards.
    *
    * The two inputs must not share column names (the output carries
    * both sides' columns), and neither may already contain the
    * internal `__bucket` column. A left-outer variant is
    * `points.join(result, keys, "left_anti")` unioned back — kept out
    * of the operator so the inner path stays one join. */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double,
      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidth > 0 && !bucketWidth.isInfinite,
      s"bucketWidth must be finite and > 0: $bucketWidth")
    val overlap = points.columns.toSet intersect intervals.columns.toSet
    require(overlap.isEmpty,
      s"rangeJoin: both inputs carry ${overlap.mkString(", ")} — the " +
        "output holds both sides' columns, rename before joining")
    require(!(points.columns ++ intervals.columns).contains("__bucket"),
      "rangeJoin: '__bucket' is reserved for the internal bucket key")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    // between(-MaxValue, MaxValue) is false for NaN and both infinities
    // under Spark's NaN-largest ordering — one predicate, three holes
    def finite(c: Column): Column =
      c.between(-Double.MaxValue, Double.MaxValue)
    val pb = points.filter(col(pointCol).isNotNull)
      .withColumn("__bucket", bucketOf(col(pointCol)))
    // the guard rides INSIDE the explode input (a dropped assert column
    // would be pruned away by the optimizer): intervals within the cap
    // take the sequence branch; one over it raises before exploding.
    // Post-filter, lo <= hi and both finite ⇒ nb >= 1, so the cap
    // check is the only branch condition needed.
    val nb = bucketOf(col(hiCol)) - bucketOf(col(loCol)) + 1L
    val guarded = when(nb <= maxBucketsPerInterval,
      sequence(bucketOf(col(loCol)), bucketOf(col(hiCol))))
      .otherwise(raise_error(concat(
        lit("rangeJoin: interval explodes into "), nb.cast("string"),
        lit(s" buckets (> $maxBucketsPerInterval) at bucketWidth=" +
          s"$bucketWidth — widen bucketWidth or raise the cap"))))
    val ib = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        finite(col(loCol)) && finite(col(hiCol)) &&
        col(loCol) <= col(hiCol))
      .withColumn("__bucket", explode(guarded))
    pb.join(ib, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join: pair every left interval `[aLo, aHi)` with
    * every right interval `[bLo, bHi)` they intersect — session
    * overlap, campaign attribution, downtime correlation.
    *
    * Both sides explode to their covered buckets like [[rangeJoin]],
    * but an overlapping pair co-occurs in EVERY shared bucket, so the
    * naive equi-join multiplies matches. The standard dedup-free trick:
    * a pair is counted only in the bucket of `max(aLo, bLo)` — the
    * overlap's left edge, which both sides provably cover — so the
    * equi-join plus that one extra predicate has multiplicity one and
    * no distinct pass. Same guards and non-finite semantics as
    * [[rangeJoin]]; overlap is the half-open `max(lo) < min(hi)`. */
  def overlapJoin(left: DataFrame, right: DataFrame,
      aLoCol: String, aHiCol: String, bLoCol: String, bHiCol: String,
      bucketWidth: Double,
      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidth > 0 && !bucketWidth.isInfinite,
      s"bucketWidth must be finite and > 0: $bucketWidth")
    val overlapCols = left.columns.toSet intersect right.columns.toSet
    require(overlapCols.isEmpty,
      s"overlapJoin: both inputs carry ${overlapCols.mkString(", ")} — " +
        "the output holds both sides' columns, rename before joining")
    require(!(left.columns ++ right.columns).contains("__bucket"),
      "overlapJoin: '__bucket' is reserved for the internal bucket key")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    def finite(c: Column): Column =
      c.between(-Double.MaxValue, Double.MaxValue)
    def exploded(df: DataFrame, lo: String, hi: String): DataFrame = {
      val nb = bucketOf(col(hi)) - bucketOf(col(lo)) + 1L
      val guarded = when(nb <= maxBucketsPerInterval,
        sequence(bucketOf(col(lo)), bucketOf(col(hi))))
        .otherwise(raise_error(concat(
          lit("overlapJoin: interval explodes into "), nb.cast("string"),
          lit(s" buckets (> $maxBucketsPerInterval) at bucketWidth=" +
            s"$bucketWidth — widen bucketWidth or raise the cap"))))
      df.filter(col(lo).isNotNull && col(hi).isNotNull &&
          finite(col(lo)) && finite(col(hi)) && col(lo) <= col(hi))
        .withColumn("__bucket", explode(guarded))
    }
    exploded(left, aLoCol, aHiCol)
      .join(exploded(right, bLoCol, bHiCol), Seq("__bucket"))
      .filter(greatest(col(aLoCol), col(bLoCol)) <
        least(col(aHiCol), col(bHiCol)))
      .filter(col("__bucket") ===
        bucketOf(greatest(col(aLoCol), col(bLoCol))))
      .drop("__bucket")
  }
}
