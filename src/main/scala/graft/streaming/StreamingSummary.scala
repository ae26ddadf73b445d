package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.ops.IncrementalAgg
import graft.ops.IncrementalAgg.Measure

/** Streaming incremental view maintenance: a file stream of fact deltas
  * keeps an aggregate summary table current via
  * [[graft.ops.IncrementalAgg]] inside `foreachBatch` — each micro-batch
  * is summarized to the grain and folded into the stored summary with
  * one join, so the summary is always O(groups) and each batch costs
  * O(delta). The checkpoint makes it exactly-once: a crashed batch
  * replays and the (deterministic) fold result is simply rewritten.
  *
  * This is the streaming shape of the reference's end-of-run summary
  * reconciliation queries (fact_sales_daily.py:226-262) — instead of
  * re-querying the DB after each load, the summary IS maintained by the
  * load.
  */
object StreamingSummary {

  /** Drain all pending parquet files under `inDir` (AvailableNow),
    * folding each batch into the summary at `summaryPath`. Returns the
    * final summary. */
  def maintainFromFiles(spark: SparkSession, inDir: String,
      schema: org.apache.spark.sql.types.StructType, checkpoint: String,
      summaryPath: String, keys: Seq[String],
      measures: Seq[Measure]): DataFrame = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = IncrementalAgg.summarize(batch, keys, measures)
        val fs = org.apache.hadoop.fs.FileSystem
          .get(spark.sparkContext.hadoopConfiguration)
        val cur = new org.apache.hadoop.fs.Path(summaryPath)
        val next =
          if (fs.exists(cur))
            IncrementalAgg.maintain(spark.read.parquet(summaryPath),
              delta, keys, measures)
          else delta
        // stage + swap so a mid-write crash never corrupts the summary
        val tmp = new org.apache.hadoop.fs.Path(summaryPath + "__stg")
        next.write.mode("overwrite").parquet(tmp.toString)
        if (fs.exists(cur)) fs.delete(cur, true)
        fs.rename(tmp, cur)
        ()
      }
      .start()
    q.awaitTermination()
    spark.read.parquet(summaryPath)
  }
}
