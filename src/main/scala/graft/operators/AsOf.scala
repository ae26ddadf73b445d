package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the most recent right row
  * with `right.ts <= left.ts` within the same key — the lookup every
  * event-to-state resolution needs (latest price at trade time, dim
  * version at fact time).
  *
  * Spark has no ASOF JOIN operator; the naive spelling (theta join on
  * `r.ts <= l.ts` + per-left max) is a broadcast-nested-loop at worst
  * and an exploded join at best. This is the scalable form: tag both
  * sides, union, ONE shuffle on the key, and a running
  * `last(value, ignoreNulls)` over (ts, side, tiebreak) — right rows
  * sort before left rows at equal ts, so the join is inclusive.
  * O(n log n) per key group, no candidate explosion, and AQE handles
  * skewed keys like any other window.
  */
object AsOf {

  /** Left rows enriched with `pickCols` from the as-of matching right
    * row (null when no right row precedes). `ordCol`, when given, breaks
    * ties among right rows sharing (key, ts) — highest wins, matching
    * `ORDER BY ts DESC, ord DESC LIMIT 1`.
    *
    * The picked columns travel as ONE struct per right row, so the match
    * is row-atomic: all picked values come from the same right row, and
    * a right row whose picked values are legitimately null still counts
    * as the match (no silent fallback to an older row). Right rows with
    * a null `tsCol` are excluded, mirroring SQL's `r.ts <= l.ts`
    * (null never satisfies the predicate). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, pickCols: Seq[String], ordCol: Option[String] = None,
      suffix: String = "_asof"): DataFrame = {
    require(pickCols.nonEmpty, "pickCols must name right-side columns")
    val leftPayload = left.columns.filterNot(c =>
      keys.contains(c) || c == tsCol)
    val asofType = org.apache.spark.sql.types.StructType(
      pickCols.map(c => right.schema(c).copy(name = c)))

    val lTagged = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__side"),
        lit(0L).as("__ord")) ++
        leftPayload.map(col) :+
        lit(null).cast(asofType).as("__asof"): _*)
    val rTagged = right.filter(col(tsCol).isNotNull).select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__side"),
        ordCol.map(col(_).cast("long")).getOrElse(lit(0L)).as("__ord")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType)
          .as(c)) :+
        struct(pickCols.map(col): _*).as("__asof"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("*") +:
        pickCols.map(c => col("__asof").getField(c).as(c + suffix)): _*)
      .drop("__side", "__ord", "__asof")
  }
}
