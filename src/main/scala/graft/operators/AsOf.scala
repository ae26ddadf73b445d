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
    * `ORDER BY ts DESC, ord DESC LIMIT 1`. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, pickCols: Seq[String], ordCol: Option[String] = None,
      suffix: String = "_asof"): DataFrame = {
    require(pickCols.nonEmpty, "pickCols must name right-side columns")
    val leftPayload = left.columns.filterNot(c =>
      keys.contains(c) || c == tsCol)
    val asofNames = pickCols.map(_ + suffix)

    val lTagged = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__side"),
        lit(0L).as("__ord")) ++
        leftPayload.map(col) ++
        asofNames.map(c => lit(null).as(c)): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__side"),
        ordCol.map(col(_).cast("long")).getOrElse(lit(0L)).as("__ord")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType)
          .as(c)) ++
        pickCols.zip(asofNames).map { case (c, a) => col(c).as(a) }: _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val enriched = asofNames.foldLeft(lTagged.unionByName(rTagged)) {
      case (df, c) => df.withColumn(c,
        last(col(c), ignoreNulls = true).over(w))
    }
    enriched.filter(col("__side") === 1).drop("__side", "__ord")
  }
}
