package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bucketed storage for the DW fact — the 100 TB path for the E3 loader.
  *
  * The parquet-path variant ([[Pipelines.dwLoad]]) re-shuffles the ENTIRE
  * target fact on `natural_key` twice per load (classify join + merge
  * join). At the reference's volumes that is irrelevant; at 100 TB the
  * target-side exchange dominates the whole pipeline. Storing the fact as
  * a table bucketed by `natural_key` makes the target's scan report
  * `HashPartitioning(natural_key, n)`, so every equi-join in the load —
  * classify left-anti, classify inner, fact-key re-attach, and the merge
  * full-outer — co-locates on the bucket layout and only the (small)
  * incoming delta is exchanged. The merge output is already partitioned
  * on `natural_key`, so the bucketed write-back needs no extra shuffle
  * either: total data moved per load is O(delta), not O(target).
  *
  * Mirrors the reference's staging+MERGE+commit re-runnability
  * (load_fact_sales_dw.py:390-418): the merged result lands in a staging
  * table first, then swaps in via DROP + RENAME.
  *
  * Bucket count: 32 here (matches local[32]); on a real cluster size it
  * so one bucket ≈ 100-500 MB at the target volume (100 TB → ~8192).
  */
object BucketedDw {

  val DefaultBuckets = 32

  /** Roll back an interrupted [[swapIn]]: if the table is missing but
    * its renamed-aside copy exists (crash between the two renames), put
    * the copy back. MUST run before [[ensureTable]], which would
    * otherwise create an empty table and a later swap would delete the
    * only surviving data. */
  def recover(spark: SparkSession, table: String): Unit = {
    val old = table + "__old"
    if (!spark.catalog.tableExists(table) &&
        spark.catalog.tableExists(old))
      spark.sql(s"ALTER TABLE `$old` RENAME TO `$table`")
  }

  /** Create an empty bucketed fact table if absent. */
  def ensureTable(spark: SparkSession, table: String, schema: StructType,
      nBuckets: Int = DefaultBuckets): Unit =
    if (!spark.catalog.tableExists(table)) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      writeBucketed(empty, table, nBuckets)
    }

  private def writeBucketed(df: DataFrame, table: String,
      nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, "natural_key").sortBy("natural_key")
      .saveAsTable(table)

  /** Atomic-ish swap: stage the merged fact as a new bucketed table,
    * rename old out, rename staging in, then drop the old data — a
    * failure at any step leaves either the original or the renamed
    * original recoverable (never a window with no table data). */
  def swapIn(spark: SparkSession, merged: DataFrame, table: String,
      nBuckets: Int = DefaultBuckets): Unit = {
    val stage = table + "__staging"
    val old = table + "__old"
    spark.sql(s"DROP TABLE IF EXISTS `$stage`")
    spark.sql(s"DROP TABLE IF EXISTS `$old`")
    writeBucketed(merged, stage, nBuckets)
    spark.sql(s"ALTER TABLE `$table` RENAME TO `$old`")
    spark.sql(s"ALTER TABLE `$stage` RENAME TO `$table`")
    spark.sql(s"DROP TABLE `$old`")
  }

  /** The E3 fact load against a bucketed target: same stages 4-9 as
    * [[Pipelines.dwLoad]], but `existing` comes from the bucketed table
    * and the merge result swaps back in bucketed. Returns
    * (newDwFacts, stats).
    */
  def dwLoad(spark: SparkSession, db: Pipelines.SourceDb,
      incomingPath: String, table: String = "fact_sales_dw",
      nBuckets: Int = DefaultBuckets): (DataFrame, Map[String, Long]) = {
    val (incoming0, misses) = Pipelines.prepareIncoming(spark, db,
      incomingPath)
    // four downstream actions (stats ×3 + the staged write) would each
    // re-run the CSV read + schema map + dim joins + dedup otherwise
    val incoming = incoming0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      recover(spark, table)
      ensureTable(spark, table, incoming.schema.add("fact_key", LongType),
        nBuckets)
      val existing = spark.table(table)
      val (merged, inserts, updates) = Pipelines.stageAndMerge(incoming,
        existing)
      val stats = Map(
        "incoming" -> incoming.count(),
        "inserts" -> inserts.count(), "updates" -> updates.count()) ++
        misses.map { case (k, v) => s"miss_$k" -> v }
      // stats are computed BEFORE the swap: they read `existing`, which
      // the swap below would invalidate mid-query otherwise.
      swapIn(spark, merged, table, nBuckets)
      (spark.table(table), stats)
    } finally incoming.unpersist()
  }
}
