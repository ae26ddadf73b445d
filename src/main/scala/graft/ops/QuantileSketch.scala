package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mergeable quantile summaries on log-scaled integer
  * buckets — the missing quantile leg of [[IncrementalAgg]]'s
  * incremental-summary family (COUNT/SUM/MIN/MAX exact, DISTINCT via
  * HLL, quantiles here). "p99 price per month, maintained O(delta)"
  * cannot be answered by any exact decomposable aggregate, and the
  * usual sketches (KLL, t-digest) compact with random coin flips, so
  * their merged state depends on partitioning — impossible to oracle
  * hash-exactly and awkward to reconcile across engines.
  *
  * This uses the HdrHistogram bucketing scheme (public domain, hdrhistogram
  * .org): a non-negative long value below 2^m keeps its own exact
  * bucket; a larger value buckets by (floor(log2 v), top-m mantissa
  * bits). The mapping is a pure per-row integer expression — NO
  * randomness, no floating point — so
  *
  *  - sketches over disjoint deltas SUM to exactly the one-pass
  *    sketch (incremental ≡ recompute bit-identically, the same
  *    guarantee IncrementalAggSpec pins for the HLL path);
  *  - any engine replays it: the kq1 gate's DuckDB oracle re-derives
  *    bucket, rollup, and quantile selection from the same integer
  *    arithmetic and hash-matches;
  *  - a quantile estimate is the bucket's upper edge, so
  *    `exact ≤ est ≤ exact + (exact >> m)`: guaranteed relative error
  *    ≤ 2^-m (0.8% at the m=7 default), one-sided and deterministic.
  *
  * Summary rows are plain (keys…, bkt: long, cnt: long) — mergeable by
  * SUM, rollable day→month→quarter without re-touching fact rows, and
  * ~64·2^m rows per group worst case (values spanning the full long
  * range; real money/length columns occupy a few hundred buckets).
  * Values must be non-negative; scale doubles/decimals to integer
  * units first (cents, not dollars — `Tables.dec2(x) * 100` is exact).
  *
  * Reference summaries this extends: A2 pricing stats
  * (dynamic_etl/sql/transform.sql:34) keep AVG-family measures only;
  * the tail-latency/price percentile is the standard DW ask on top.
  */
object QuantileSketch {

  /** floor(log2 v) for v ≥ 1, via the minimal binary string — the
    * exact integer path. log2 on doubles is NOT portable: libm
    * rounding differs across builds, and ±1 ulp at a power of two
    * moves a value across buckets (graft memory: keep gated math off
    * libm). length(bin(v)) is exact in Spark and DuckDB alike. */
  private def log2floor(v: Column): Column =
    (length(bin(v)) - 1).cast("long")

  /** Bucket index of non-negative long `v`: monotone in v, identity
    * below 2^(m+1) (small values stay exact), then (level, sub-bucket)
    * packed as level·2^m + (v >> (e-m)) − 2^m. */
  def bucketOf(v: Column, m: Int): Column = {
    val base = lit(1L << m)
    val e = log2floor(v)
    val sub = call_function("shiftright", v, e - lit(m.toLong))
    when(v < base, v)
      .otherwise((e - lit(m.toLong) + lit(1L)) * base + (sub - base))
  }

  /** Upper edge of bucket `b` — the value [[quantiles]] reports. The
    * edge is the MAX value mapping to b, hence est ≥ exact and
    * est − exact < bucket width ≤ exact >> m. Column-valued `m` so the
    * decoder reads the resolution off the sketch rows themselves. */
  def bucketHi(b: Column, m: Column): Column = {
    val base = call_function("shiftleft", lit(1L), m)
    val level = call_function("shiftright", b, m)
    val sub = base + b.bitwiseAND(base - lit(1L))
    when(b < base, b)
      .otherwise(call_function("shiftleft", sub + lit(1L),
        level - lit(1L)) - lit(1L))
  }

  def bucketHi(b: Column, m: Int): Column = bucketHi(b, lit(m.toLong))

  /** Aggregate `rows` to per-group bucket counts: keys ++ (bkt, cnt, m).
    * One narrow shuffle on (keys, bkt); map-side combine does the
    * heavy lifting because bucket cardinality per group is tiny.
    * The resolution `m` rides along as a column so downstream readers
    * decode with the resolution the sketch was BUILT with — two
    * sketches of different m look bucket-compatible in the raw longs
    * but are not, so [[rollup]] refuses to merge them.
    * Null values are excluded (SQL aggregate convention); negative
    * values are a contract violation and fail loudly rather than
    * corrupting the monotone bucket order. */
  def summarize(rows: DataFrame, keys: Seq[String], valueCol: String,
      m: Int = 7): DataFrame = {
    val v = col(valueCol).cast("long")
    val guarded = when(v < 0, raise_error(concat(
        lit(s"QuantileSketch: negative $valueCol: "), v.cast("string"))))
      .otherwise(bucketOf(v, m))
    rows.filter(v.isNotNull)
      .groupBy((keys.map(col) :+ guarded.as("bkt")): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("m", lit(m.toLong))
  }

  /** Merge sketch rows up to a coarser grain (`keys` ⊂ the summarize
    * grain) — plain SUM, so day→month→quarter rollups chain and
    * disjoint deltas fold into exactly the one-pass sketch. Merging
    * sketches of different resolution would silently combine
    * incompatible bucket spaces, so it fails loudly instead. */
  def rollup(sketch: DataFrame, keys: Seq[String]): DataFrame =
    sketch.groupBy((keys.map(col) :+ col("bkt")): _*)
      .agg(sum(col("cnt")).as("cnt"),
        when(min(col("m")) =!= max(col("m")), raise_error(concat(
          lit("QuantileSketch: merging sketches of different m: "),
          min(col("m")).cast("string"), lit(" vs "),
          max(col("m")).cast("string"))))
          .otherwise(min(col("m"))).as("m"))

  /** Read-time quantile estimates from a sketch: one output row per
    * group with a column per requested quantile. Quantiles are exact
    * rationals (name, num, den) — e.g. ("p90", 9, 10) — because a
    * double 0.9 is not exactly representable and ceil(0.9·n) can land
    * on either side of the true rank depending on the engine. The
    * target rank is ceil(num·n/den) in pure integer math; the
    * estimate is the upper edge of the bucket where the cumulative
    * count first reaches it. Windows run over summary rows (a few
    * hundred per group), partitioned by the group keys. */
  def quantiles(sketch: DataFrame, keys: Seq[String],
      qs: Seq[(String, Int, Int)]): DataFrame = {
    val byGroup = Window.partitionBy(keys.map(col): _*)
    // decode with the resolution the sketch carries; a group mixing
    // resolutions (e.g. a streaming fold resumed with a different m)
    // has no consistent bucket space and fails loudly here, the read
    // path every consumer goes through
    val mOk = when(
      min(col("m")).over(byGroup) =!= max(col("m")).over(byGroup),
      raise_error(lit("QuantileSketch: group mixes sketch resolutions")))
      .otherwise(col("m"))
    val cum = sketch
      .withColumn("__cum", sum(col("cnt")).over(byGroup.orderBy(col("bkt"))))
      .withColumn("__total", sum(col("cnt")).over(byGroup))
      .withColumn("__m", mOk)
    val ests = qs.map { case (name, num, den) =>
      min(when(col("__cum") >= ceilRank(col("__total"), num, den),
        bucketHi(col("bkt"), col("__m")))).as(name)
    }
    cum.groupBy(keys.map(col): _*).agg(ests.head, ests.tail: _*)
  }

  /** Winsorize: clip `valueCol` into its own group's [lo, hi] quantile
    * band (each a num/den rational, e.g. (1,20)→p5, (19,20)→p95) —
    * the standard outlier cap before averaging or training on a
    * heavy-tailed measure (document lengths, token counts, prices).
    * Because the bounds come from the deterministic sketch, the
    * clipped output is bit-identical across runs, partitionings, and
    * engines — no sampled-percentile wobble. Appends `clip_lo` /
    * `clip_hi` so downstream can tell capped from organic values.
    *
    * Scale shape: one narrow sketch aggregation, then the per-group
    * bounds (one row per group) join back onto the facts — AQE
    * broadcasts them when the group count is small and falls back to
    * a key shuffle when it is not (the q20 lesson: a forced broadcast
    * hint scales with group cardinality, not data size). Null values
    * pass through unclipped (SQL convention). */
  def winsorize(rows: DataFrame, keys: Seq[String], valueCol: String,
      lo: (Int, Int), hi: (Int, Int), m: Int = 7): DataFrame = {
    val bounds = quantiles(summarize(rows, keys, valueCol, m), keys,
      Seq(("clip_lo", lo._1, lo._2), ("clip_hi", hi._1, hi._2)))
    rows.join(bounds, keys)
      .withColumn(valueCol,
        // explicit null branch: Spark's least/greatest IGNORE null
        // arguments (least(null, x) = x), so without it a null value
        // would silently clip to the lower cap instead of passing
        // through — the same null-semantics trap as DuckDB's least()
        when(col(valueCol).isNull, lit(null).cast("long"))
          .otherwise(least(greatest(col(valueCol).cast("long"),
            col("clip_lo")), col("clip_hi"))))
  }

  /** The rank a quantile num/den targets in a group of `n` rows:
    * ceil(num·n/den), computed as floor((num·n + den − 1)/den) in pure
    * long arithmetic — `div` because Column `/` is double division,
    * inexact past 2^53, and engines disagree on its rounding. Public
    * so gate oracles rank with LITERALLY the same expression the
    * sketch uses — a convention change can't drift them apart. */
  def ceilRank(n: Column, num: Int, den: Int): Column =
    call_function("div", n * num + (den - 1), lit(den.toLong))
}
