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
}
