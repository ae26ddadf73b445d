package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** Slowly-changing-dimension Type 2 — versioned history with effective
  * ranges. The reference's DW is SCD1 (MERGE overwrites attributes,
  * losing history); Type 2 is the standard extension a real warehouse
  * asks for next, and it composes from the engine's own pieces:
  * change classification ([[ChangeClassifier]]) decides what versions
  * to open, and [[graft.operators.AsOf.asofJoin]] resolves the version
  * in effect at any fact timestamp.
  *
  * History schema = business key ++ tracked attrs ++
  * (scd_version, scd_start, scd_end, scd_current); the current version
  * has scd_end = null.
  *
  * Scale shape: applyChanges joins the (small) incoming snapshot against
  * only the CURRENT slice on the business key — the closed history is
  * untouched and unioned back by reference; at 100 TB store history
  * partitioned by scd_current so the current slice is a partition scan
  * and rewrites touch only it.
  */
object Scd2 {

  val metaCols = Seq("scd_version", "scd_start", "scd_end", "scd_current")

  /** Open version-1 history from an initial snapshot effective at `ts`. */
  def init(snapshot: DataFrame, ts: Column): DataFrame =
    snapshot.withColumn("scd_version", lit(1L))
      .withColumn("scd_start", ts.cast("timestamp"))
      .withColumn("scd_end", lit(null).cast("timestamp"))
      .withColumn("scd_current", lit(true))

  /** Apply a full snapshot effective at `ts`: changed business keys get
    * their current version closed (scd_end = ts) and a new one opened;
    * unseen keys open at version 1; unchanged and historical rows pass
    * through. Missing-from-snapshot keys stay open (the reference never
    * deletes dimension members). Idempotent: re-applying the same
    * snapshot changes nothing. */
  def applyChanges(history: DataFrame, incoming: DataFrame,
      bk: Seq[String], tracked: Seq[TrackedCol], ts: Column): DataFrame = {
    val attrs = incoming.columns.filterNot(bk.contains).toSeq
    val current = history.filter(col("scd_current"))
    val classified = ChangeClassifier.classifyChanges(
      incoming, current.select(incoming.columns.map(col).toIndexedSeq: _*),
      bk, tracked)
    val changedKeys = classified.filter(col("operation") === "UPDATE")
      .select(bk.map(col): _*)
    // close the superseded versions
    val closed = current.join(changedKeys, bk)
      .withColumn("scd_end", ts.cast("timestamp"))
      .withColumn("scd_current", lit(false))
    val unchanged = current.join(changedKeys, bk, "left_anti")
    // new version numbers continue each key's sequence
    val nextVersion = current.select(
      (bk.map(col) :+ (col("scd_version") + 1).as("__next")): _*)
    val reopened = classified.filter(col("operation") === "UPDATE")
      .join(nextVersion, bk)
      .select((bk ++ attrs).map(col) :+ col("__next").as("scd_version"): _*)
    val opened = classified.filter(col("operation") === "INSERT")
      .select((bk ++ attrs).map(col): _*)
      .withColumn("scd_version", lit(1L))
    val fresh = reopened.unionByName(opened)
      .withColumn("scd_start", ts.cast("timestamp"))
      .withColumn("scd_end", lit(null).cast("timestamp"))
      .withColumn("scd_current", lit(true))
    history.filter(!col("scd_current"))
      .unionByName(unchanged)
      .unionByName(closed)
      .unionByName(fresh.select(history.columns.map(col).toIndexedSeq: _*))
  }

  /** The slice of history in effect at `ts`. */
  def versionAt(history: DataFrame, ts: Column): DataFrame =
    history.filter(col("scd_start") <= ts &&
      (col("scd_end").isNull || ts < col("scd_end")))

  /** Attach the dim attributes in effect at each fact's `factTs` —
    * an as-of join on scd_start (valid because a key's versions tile
    * time contiguously). Facts dated before the first version get
    * nulls. */
  def resolveAtTime(facts: DataFrame, history: DataFrame, bk: Seq[String],
      factTs: String, attrs: Seq[String]): DataFrame = {
    val versions = history.select(
      (bk.map(col) :+ col("scd_start").as(factTs)) ++
        attrs.map(col) :+ col("scd_version"): _*)
    AsOf.asofJoin(facts, versions, bk, factTs,
      pickCols = attrs :+ "scd_version", ordCol = Some("scd_version"))
  }
}
