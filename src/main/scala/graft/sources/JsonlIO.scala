package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) — the de-facto corpus interchange
  * format for training-data pipelines (what most public text dumps and
  * dataset releases ship as).
  *
  * Scale contract mirrors [[CsvIO]]: the writer emits one part file per
  * partition (parallel, no coalesce); the reader REQUIRES an explicit
  * schema — `spark.read.json` without one runs a full inference pass
  * over the data first, which at 100 TB doubles the scan, and corpus
  * schemas are always known. Per-line parse failures surface under the
  * standard PERMISSIVE/columnNameOfCorruptRecord contract rather than
  * failing the job (a multi-TB crawl dump always has bad lines).
  */
object JsonlIO {

  /** Write as JSONL; `compression` e.g. "gzip"/"zstd"/"none". gzip'd
    * JSONL is NOT splittable — one file = one task on read — so at
    * scale prefer many medium part files (or zstd/none) over few large
    * gzip members. */
  def write(df: DataFrame, path: String,
      compression: String = "none"): Unit =
    df.write.mode("overwrite").option("compression", compression)
      .json(path)

  /** Read JSONL with a known schema (no inference pass). Lines that
    * fail to parse land as all-null rows with the raw line preserved
    * when the schema carries a `_corrupt_record` string column. */
  def read(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
