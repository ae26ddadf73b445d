package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as PLAIN aggregation —
  * the point-frequency complement to the Misra-Gries heavy-hitters
  * sketch (`freq_sketch`): MG answers "which items dominate" with
  * guaranteed-undercount estimates for the retained top-k only; CM
  * answers "how often does THIS item occur" for ANY item, with
  * guaranteed-OVERcount estimates (`est >= true` always;
  * `est <= true + 2N/width` with probability `1 - 2^-depth`). The
  * curation uses differ: MG drives stop-lists and domain caps, CM drives
  * per-token/per-URL frequency thresholds when the probe set isn't known
  * until later.
  *
  * Design: no custom aggregate. The sketch IS a DataFrame of at most
  * `depth * width` rows — (depth, bkt, cnt, width) — produced by one
  * groupBy over hashed buckets, so it inherits everything Spark gives a
  * plain aggregation: map-side partial combine (the shuffle carries
  * ≤ depth×width rows per task, never the term cardinality), pure-SUM
  * mergeability ([[fold]] unions two states — disjoint batches fold to
  * exactly the one-pass sketch, the [[graft.ops.QuantileSketch]]
  * maintenance pattern), parquet persistence, and cross-engine replay
  * (the bucket hash is md5-derived, so DuckDB recomputes the sketch
  * bit-identically — the cm1 gate hash-checks estimates end to end).
  *
  * The row hashes are the first 60 bits of md5("row|item") reduced
  * mod width — pairwise-independent enough in practice, portable
  * everywhere md5 exists, and deterministic across partitionings (the
  * same reason the sampling family uses md5 keys, Curation.scala).
  */
object CountMin {

  /** Bucket of `item` in sketch row `row`: first 15 md5 hex chars
    * (60 bits, fits a signed long) mod `width`. */
  def bucket(item: Column, row: Int, width: Int): Column =
    pmod(conv(substring(md5(concat_ws("|", lit(row), item)), 1, 15),
      16, 10).cast("long"), lit(width.toLong))

  /** Build the sketch state over `df`'s non-null `itemCol` values:
    * (depth, bkt, cnt, width, n_rows), ≤ depth*width rows — `depth` is
    * the cell's row index, `n_rows` the sketch's build depth (carried so
    * [[fold]]/[[estimate]] can detect a mismatched-depth state, which
    * would otherwise estimate 0 for everything: a probe row with no
    * matching cells coalesces to an empty bucket). One explode (factor
    * `depth`) + one narrow groupBy; the item payload never shuffles. */
  def sketch(df: DataFrame, itemCol: String, depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth > 0 && depth <= 16,
      s"CountMin: depth must be in [1,16], got $depth")
    require(width > 0, s"CountMin: width must be positive, got $width")
    df.filter(col(itemCol).isNotNull)
      .select(posexplode(array((0 until depth).map(i =>
        bucket(col(itemCol), i, width)): _*)))
      .select(col("pos").cast("long").as("depth"), col("col").as("bkt"))
      .groupBy(col("depth"), col("bkt"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("width", lit(width.toLong))
      .withColumn("n_rows", lit(depth.toLong))
  }

  /** A state written by a pre-depth-tracking build has no n_rows column;
    * fail with a named error instead of an unresolved-column analysis
    * exception deep inside fold/estimate. */
  private def requireStateSchema(state: DataFrame, what: String): Unit = {
    val missing = Seq("depth", "bkt", "cnt", "width", "n_rows")
      .filterNot(state.columns.contains)
    require(missing.isEmpty,
      s"CountMin.$what: state is missing column(s) ${missing.mkString(",")}" +
      " — persisted by an older build without depth tracking? Re-sketch" +
      " the source data to migrate.")
  }

  /** One-row frame carrying lit(1) when every row of `state` agrees with
    * the expected (width, n_rows), raise_error otherwise. Evaluated via a
    * filter on the consumer side, so it fires regardless of which cells
    * the inputs populate (a per-group check would miss two sketches
    * whose cells are disjoint). An EMPTY state raises too — min/max over
    * zero rows are null, which would otherwise null the whole condition
    * and slide through the otherwise() branch with __ok=1, making every
    * estimate silently 0 (the exact failure mode this guard exists to
    * prevent); a legitimate sketch always has ≥1 cell because building
    * over zero input rows is a caller bug, not a probe-miss. Costs one
    * extra traversal of `state` — cheap for a materialized state
    * (≤ depth×width rows), but persist first when passing a freshly
    * COMPOSED sketch plan. */
  private def paramsGuard(state: DataFrame, what: String,
      width: Option[Long], nRows: Option[Long]): DataFrame =
    state.agg(min(col("width")).as("w0"), max(col("width")).as("w1"),
        min(col("n_rows")).as("d0"), max(col("n_rows")).as("d1"))
      .select(when(col("w0").isNull,
        raise_error(lit(s"CountMin: $what — state has no rows; a sketch " +
          "built over an empty input has no cells, so width/depth cannot " +
          "be verified and every estimate would silently be 0")))
        .when(
        col("w0") =!= col("w1") || col("d0") =!= col("d1") ||
          width.map(w => col("w0") =!= w).getOrElse(lit(false)) ||
          nRows.map(d => col("d0") =!= d).getOrElse(lit(false)),
        raise_error(lit(s"CountMin: $what — mixed or unexpected " +
          s"width/depth (expected width=${width.getOrElse("any")}, " +
          s"depth=${nRows.getOrElse("any")})")))
        .otherwise(lit(1L)).as("__ok"))

  /** Merge two sketch states (pure SUM — disjoint inputs fold to exactly
    * the one-pass state). Mixed widths or depths fail loudly AND
    * globally: summing cells of a different modulus, or estimating
    * against rows one side never populated, would silently produce
    * garbage. The global check rides a whole-frame window over the
    * GROUPED cells — ≤ depth×width rows by construction, so the
    * single-partition window is bounded — rather than a second
    * aggregate over the union, which would recompute both input
    * subtrees (and any scan beneath a freshly built sketch) per action. */
  def fold(a: DataFrame, b: DataFrame): DataFrame = {
    requireStateSchema(a, "fold"); requireStateSchema(b, "fold")
    val g = a.unionByName(b).groupBy(col("depth"), col("bkt")).agg(
      sum(col("cnt")).as("cnt"),
      min(col("width")).as("w0"), max(col("width")).as("w1"),
      min(col("n_rows")).as("d0"), max(col("n_rows")).as("d1"))
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.withColumn("__bad",
        min(col("w0")).over(all) =!= max(col("w1")).over(all) ||
        min(col("d0")).over(all) =!= max(col("d1")).over(all))
      .select(col("depth"), col("bkt"),
        when(col("__bad"), raise_error(lit(
          "CountMin: folding incompatible sketches — mixed width/depth")))
          .otherwise(col("cnt")).as("cnt"),
        col("w0").as("width"), col("d0").as("n_rows"))
  }

  /** Point-frequency estimates for `probes`: one row per probe item with
    * `est = min over rows of the item's bucket count` (0 when every
    * bucket is empty). `depth`/`width` must match the state's build
    * parameters — a mismatch raises at execution rather than estimating
    * against the wrong modulus (wrong width) or against rows the state
    * never populated (wrong depth — every estimate would be 0). Probes
    * are expected to be small (broadcast side); the state is at most
    * depth*width rows. The guard costs one extra traversal of `state`
    * per action — negligible for a persisted/materialized state, but
    * callers estimating in a hot loop against a freshly COMPOSED sketch
    * plan should persist the state first so the guard pass doesn't
    * re-run the scan beneath it. */
  def estimate(state: DataFrame, probes: DataFrame, itemCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    requireStateSchema(state, "estimate")
    val wchk = paramsGuard(state, "estimate against mismatched state",
      Some(width.toLong), Some(depth.toLong))
    val exploded = probes.filter(col(itemCol).isNotNull)
      .select(col(itemCol), posexplode(array((0 until depth).map(i =>
        bucket(col(itemCol), i, width)): _*)))
      .select(col(itemCol), col("pos").cast("long").as("depth"),
        col("col").as("bkt"))
      // filter, not drop: a dropped check column would be pruned as dead
      // code and the raise_error with it
      .crossJoin(broadcast(wchk)).where(col("__ok") === 1L).drop("__ok")
    exploded
      .join(state.select(col("depth"), col("bkt"), col("cnt")),
        Seq("depth", "bkt"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
