package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layout for the 100 TB fact: hive-style date partitioning.
  *
  * The reference stores facts unpartitioned (Oracle heap + whole-file
  * CSVs) and every daily job touches everything. At scale the fact is
  * partitioned by a coarse date key so that (a) the daily load APPENDS
  * one partition instead of rewriting anything, and (b) any query with
  * a date predicate prunes to the partitions it needs — `.explain`
  * shows it as `PartitionFilters`, and pruned partitions are never
  * listed, opened, or scanned.
  *
  * The partition column is a derived `p_month` (yyyyMM int): daily
  * granularity would create 36k directories over a decade — month keeps
  * the partition count in the thousands and each partition
  * bucket-splittable by maxPartitionBytes.
  */
object Layout {

  /** yyyyMM partition key derived from a date/timestamp column. */
  def monthKey(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (year(c) * 100 + month(c)).cast("int")

  /** Write `df` partitioned by month of `dateCol`. */
  def writeMonthPartitioned(df: DataFrame, dateCol: String,
      path: String): Unit =
    df.withColumn("p_month", monthKey(col(dateCol)))
      .write.mode("overwrite").partitionBy("p_month").parquet(path)

  /** Append exactly one month's rows (the daily-load shape: touches one
    * directory, rewrites nothing). */
  def appendMonth(df: DataFrame, dateCol: String, path: String): Unit =
    df.withColumn("p_month", monthKey(col(dateCol)))
      .write.mode("append").partitionBy("p_month").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact one partition's small files — the maintenance job the
    * append-only layout needs: every [[appendMonth]] adds task-count
    * files, and at 100 TB unchecked file counts dominate planning time
    * (listing + footer reads) long before data size does. Rewrites the
    * partition into ceil(bytes / targetBytes) files via a staged
    * directory swap (readers of other partitions are unaffected).
    * Returns (filesBefore, filesAfter). */
  def compactPartition(spark: SparkSession, path: String,
      partition: String, targetBytes: Long = 128L * 1024 * 1024)
      : (Int, Int) = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/$partition")
    // the partition's own filesystem, not fs.defaultFS — they differ
    // when compacting e.g. an object-store path from an HDFS-default
    // cluster
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new org.apache.hadoop.fs.Path(
      s"$path/.${partition}__compact")
    val old = new org.apache.hadoop.fs.Path(s"$path/.${partition}__old")
    // crash recovery: renamed-out but never renamed-in → put it back;
    // stale staging/backup from completed or failed runs → remove
    if (!fs.exists(dir) && fs.exists(old) && !fs.rename(old, dir))
      throw new java.io.IOException(s"recovery rename $old -> $dir failed")
    if (fs.exists(staged)) fs.delete(staged, true)
    if (fs.exists(old)) fs.delete(old, true)

    val files = fs.listStatus(dir).filter(f =>
      f.getPath.getName.endsWith(".parquet"))
    val bytes = files.map(_.getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (files.length <= n) return (files.length, files.length)
    spark.read.parquet(dir.toString).repartition(n)
      .write.mode("overwrite").parquet(staged.toString)
    if (!fs.rename(dir, old))
      throw new java.io.IOException(s"rename $dir -> $old failed")
    if (!fs.rename(staged, dir))
      throw new java.io.IOException(s"rename $staged -> $dir failed")
    fs.delete(old, true)
    val after = fs.listStatus(dir).count(f =>
      f.getPath.getName.endsWith(".parquet"))
    (files.length, after)
  }
}
