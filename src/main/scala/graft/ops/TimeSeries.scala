package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Time-series regularization: per-group date spines and gap-filling.
  *
  * A daily summary table built by plain GROUP BY (e.g. the reference's
  * date-grain loads, dynamic_etl/sql/transform.sql:34) simply has no row
  * for a day with no facts — every downstream moving average, lag, or
  * day-over-day delta silently skips the gap instead of seeing a zero.
  * The standard DW fix is to join the summary onto a contiguous date
  * spine and fill: additive measures become 0, level measures carry the
  * last observation forward (LOCF).
  *
  * Scale shape: the spine is generated DISTRIBUTED — one groupBy to the
  * (group → min/max day) bounds (narrow, map-side combined), then
  * `explode(sequence(lo, hi))` multiplies each bounds row back out to
  * days, so no driver collect and no row count ever exceeds
  * groups × span. The fill join shuffles on (keys, day) — the summary's
  * own grain — and the LOCF window partitions by group keys, so one
  * group's full history sorts within one partition: the same per-group
  * constraint every ordered carry has (W2's SKU counter, sessionize).
  * Groups are the parallelism unit; spans are bounded by the calendar.
  */
object TimeSeries {

  /** One row per (group, day) for every calendar day in the group's
    * own [min(dateCol), max(dateCol)] span, inclusive. Null dates are
    * excluded (SQL aggregate convention). The output column keeps
    * `dateCol`'s name, typed DATE.
    *
    * `maxSpanDays` bounds each group's span: one corrupt outlier date
    * (an epoch-zero default, a fat-fingered year) would otherwise
    * silently multiply the group by its full span under the explode —
    * a contract violation fails loudly on the tiny bounds aggregate
    * instead. The default allows a century. */
  def dateSpine(df: DataFrame, keys: Seq[String], dateCol: String,
      maxSpanDays: Int = 36525): DataFrame = {
    val d = col(dateCol).cast(DateType)
    df.filter(d.isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(min(d).as("__lo"), max(d).as("__hi"))
      .withColumn("__span", datediff(col("__hi"), col("__lo")))
      .withColumn("__hi", when(col("__span") > maxSpanDays,
        raise_error(concat(lit("dateSpine: group span "),
          col("__span").cast("string"),
          lit(s" days exceeds maxSpanDays=$maxSpanDays at "),
          concat_ws(",", keys.map(col): _*))))
        .otherwise(col("__hi")))
      .select(keys.map(col) :+
        explode(sequence(col("__lo"), col("__hi"))).as(dateCol): _*)
  }

  /** Regularize a (keys, dateCol)-grain summary onto its per-group date
    * spine. `zeroCols` are additive measures (0 on gap days, keeping
    * their type); `locfCols` are level measures (last non-null
    * observation carried forward; leading gaps stay null). Appends a
    * BOOLEAN `is_gap` marking spine days with no input row.
    *
    * The input must already be at one-row-per-(keys, day) grain — a
    * duplicated day would make the fill double-count, and a null day
    * has no spine position — both fail loudly (raise_error) instead of
    * guessing or silently dropping rows. */
  def gapFill(summary: DataFrame, keys: Seq[String], dateCol: String,
      zeroCols: Seq[String], locfCols: Seq[String],
      maxSpanDays: Int = 36525): DataFrame = {
    // localCheckpoint: the spine bounds and the fill join are two
    // branches over the same (possibly expensive) summary plan, and
    // per-branch column pruning would defeat ReuseExchange (the q11
    // shape) — materialize the summary once. It is small by contract:
    // at most groups × span rows. Eager, so the null-day guard fires
    // at call time.
    val facts = summary.withColumn(dateCol,
      when(col(dateCol).isNull, raise_error(lit(
        s"gapFill: null $dateCol row in summary input")))
        .otherwise(col(dateCol).cast(DateType)))
      .localCheckpoint()
    val grain = Window.partitionBy((keys :+ dateCol).map(col): _*)
    val guarded = facts.withColumn("__present",
      when(count(lit(1)).over(grain) > 1, raise_error(concat(
        lit(s"gapFill: duplicate (${keys.mkString(",")}, $dateCol) row: "),
        concat_ws(",", (keys :+ dateCol).map(col): _*))))
        .otherwise(lit(true)))
    val joined = dateSpine(facts, keys, dateCol, maxSpanDays)
      .join(guarded, keys :+ dateCol, "left")
    val byKey = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(dateCol))
    val zeroed = zeroCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, coalesce(col(c), lit(0).cast(df.schema(c).dataType)))
    }
    val carried = locfCols.foldLeft(zeroed) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(byKey))
    }
    carried
      .withColumn("is_gap", col("__present").isNull)
      .drop("__present")
  }
}
