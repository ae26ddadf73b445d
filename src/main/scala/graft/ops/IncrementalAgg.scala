package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an aggregate summary table — the DW
  * pattern behind "daily sales by store/category stays current without
  * re-scanning the fact": each load's delta is pre-aggregated to the
  * summary grain and MERGED into the stored summary, so maintenance
  * cost is O(delta), not O(fact).
  *
  * Only decomposable aggregates can be maintained this way; the
  * supported set mirrors the reference's summary queries (A2/A4/A7 —
  * COUNT/SUM and the AVG derived from them at read time):
  *
  *  - `n`     = COUNT(*)            (summable)
  *  - sums    = SUM(col)            (summable)
  *  - min/max = MIN/MAX(col)        (combinable for inserts-only deltas)
  *
  * AVG must be stored as (sum, count) and divided at read time —
  * storing the quotient would make the summary unmergeable. MIN/MAX
  * stay correct because loads only insert or increase: the reference's
  * fact MERGE updates measures within tolerance but never deletes
  * (SURVEY §2.4); deletions would need a full rebuild of the affected
  * groups.
  */
object IncrementalAgg {

  final case class Measure(name: String, col: String, agg: String) {
    def expr: Column = agg match {
      case "sum" => sum(functions_col(col)).as(name)
      case "min" => min(functions_col(col)).as(name)
      case "max" => max(functions_col(col)).as(name)
      case other => throw new IllegalArgumentException(
        s"unsupported incremental aggregate: $other")
    }
    def combine(a: Column, b: Column): Column = agg match {
      // SUM(all-null) is NULL in SQL: only coalesce when one side has a
      // real value, or the incremental result diverges from a recompute
      case "sum" => when(a.isNull && b.isNull, lit(null))
        .otherwise(coalesce(a, lit(0)) + coalesce(b, lit(0)))
      case "min" => least(a, b) // least/greatest skip nulls
      case "max" => greatest(a, b)
    }
    private def functions_col(c: String) = org.apache.spark.sql.functions.col(c)
  }

  /** Aggregate `rows` to the summary grain: keys ++ n ++ measures. */
  def summarize(rows: DataFrame, keys: Seq[String],
      measures: Seq[Measure]): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), measures.map(_.expr): _*)

  /** Fold a delta's summary into the stored summary: matching groups
    * combine, new groups insert. Both sides must be at the same grain
    * (i.e. produced by [[summarize]]). One join on the summary grain —
    * the (small) summary is the big side here, the delta summary tiny.
    */
  def maintain(summary: DataFrame, delta: DataFrame, keys: Seq[String],
      measures: Seq[Measure]): DataFrame = {
    val s = summary.alias("s")
    val d = delta.alias("d")
    // null-safe: groupBy keeps NULL as a real group, so the fold must
    // match it too or every maintain() adds another null-key row
    val cond = keys.map(k => col(s"s.$k") <=> col(s"d.$k")).reduce(_ && _)
    val joined = s.join(d, cond, "full_outer")
    val outKeys = keys.map(k => coalesce(col(s"s.$k"), col(s"d.$k")).as(k))
    val outN = (coalesce(col("s.n"), lit(0L)) +
      coalesce(col("d.n"), lit(0L))).as("n")
    val outMeasures = measures.map { m =>
      when(col("s.n").isNull, col(s"d.${m.name}"))
        .when(col("d.n").isNull, col(s"s.${m.name}"))
        .otherwise(m.combine(col(s"s.${m.name}"), col(s"d.${m.name}")))
        .as(m.name)
    }
    joined.select((outKeys :+ outN) ++ outMeasures: _*)
  }

  // ---- mergeable DISTINCT via HLL sketches --------------------------------
  // (mergeable QUANTILES live in QuantileSketch — same delta-fold
  // contract, deterministic log-histogram state instead of HLL registers)

  /** COUNT(DISTINCT) is the one summary aggregate the exact path cannot
    * maintain incrementally — it needs the full key domain re-shuffled
    * every refresh. Its HLL sketch IS decomposable: store one binary
    * sketch per summary-grain row and union sketches at read/maintain
    * time, so a rolling "distinct customers this quarter" stays
    * O(delta) at 100 TB. Estimate error ≈ 1.04/√2^lgK (~1.6% at the
    * lgK=12 default, 4 KB/row). Sketches over DISJOINT deltas union to
    * the same registers as one pass over the whole, so incremental ≡
    * recompute EXACTLY — the same estimate, not merely within error
    * (spec-pinned in IncrementalAggSpec). */
  def sketchSummarize(rows: DataFrame, keys: Seq[String],
      distinctCol: String, lgK: Int = 12): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(distinctCol), lit(lgK))
        .as(s"${distinctCol}_sketch"))

  /** Union sketch rows up to a coarser grain (`keys` ⊂ the summarize
    * grain). The output column keeps the sketch name, so rollups chain
    * (day → month → quarter) without re-touching fact rows. */
  def sketchRollup(sketches: DataFrame, keys: Seq[String],
      sketchCol: String): DataFrame =
    sketches.groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col(sketchCol), lit(false)).as(sketchCol))

  /** Read-time estimate of a sketch column. */
  def sketchEstimate(df: DataFrame, sketchCol: String,
      as: String): DataFrame =
    df.withColumn(as, hll_sketch_estimate(col(sketchCol)))
}
