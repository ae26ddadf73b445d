package graft.pipelines

import org.apache.spark.sql.SparkSession

/** Driver-side memo for a store's TINY metadata tables (conf rows, PQ
  * codebooks, centroid tables, tokenizer models — all ≤ ~1 MB by the
  * stores' own contracts).
  *
  * Why it exists (r16 optimization round): every store-protocol step
  * re-read its metadata through `spark.read.parquet(...).collect()` —
  * a full Catalyst plan + one-task job per read, ~60-150 ms of pure
  * driver latency on a local FS. A single gate's lifecycle
  * (create → append×N → compact → query) paid that 4-10×: BenchOne
  * measured the ann/anq gates spending more wall in these one-row
  * metadata jobs and their scheduling gaps than in all distributed
  * compute combined. At production scale the same reads are object-
  * store round trips inside a driver-sequential protocol, so the memo
  * is not a local-bench trick — it removes serial driver latency the
  * guide (§7.3) calls out.
  *
  * Correctness: entries are keyed by the metadata DIRECTORY's content
  * fingerprint — every file's (name, length, mtime) from one
  * `listStatus` (these dirs are flat single-parquet-file tables by
  * construction). Any rewrite produces new part-file names (task
  * UUIDs), so a stale entry can never be returned: same fingerprint ⇒
  * byte-identical files ⇒ the decode would return the identical value.
  * This memoizes METADATA DECODING, not query results — all corpus-
  * sized work still computes from the parquet inputs every run; a
  * bench run that re-creates its store gets a fresh fingerprint and a
  * fresh decode.
  *
  * Writers may [[put]] the value they just wrote (they hold it in
  * driver memory already); the value must equal what [[load]]'s decode
  * would return from the written files — int/long/boolean/string/
  * double all round-trip parquet exactly, and the putters write the
  * exact rows they memoize.
  */
private[graft] object StoreMeta {

  private val MaxEntries = 256
  private val cache =
    new java.util.LinkedHashMap[String, (String, Any)](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, Any)]): Boolean =
        size() > MaxEntries
    }

  /** Content fingerprint of a flat metadata dir; None when absent.
    * One driver-side listStatus — microseconds on a local FS, one
    * round trip on an object store (vs a full Spark job per read). */
  private def fingerprint(spark: SparkSession,
      path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(fs.listStatus(p)
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString("|"))
  }

  /** Memoized decode of the metadata at `path`: returns the cached
    * value when the directory's fingerprint is unchanged, else runs
    * `decode` (which should read the parquet and collect) and caches
    * the result. `kind` namespaces different decodings of one path. */
  def load[T](spark: SparkSession, path: String, kind: String)(
      decode: => T): T = {
    val fp = fingerprint(spark, path).getOrElse {
      // absent dir: let the decoder raise its own (named) error
      return decode
    }
    val key = s"$path#$kind"
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null && hit._1 == fp)
        return hit._2.asInstanceOf[T]
    }
    val v = decode
    cache.synchronized { cache.put(key, (fp, v)); () }
    v
  }

  /** Seed the memo after a write with the value the writer already
    * holds. The fingerprint is taken AFTER the write completes, so the
    * entry matches exactly the files on disk. */
  def put[T](spark: SparkSession, path: String, kind: String,
      value: T): Unit =
    fingerprint(spark, path).foreach { fp =>
      cache.synchronized { cache.put(s"$path#$kind", (fp, value)); () }
    }

  /** Run a store WRITE action with AQE scoped off (restored after).
    *
    * Why: every store write repartitions with an EXPLICIT partition
    * count before partitionBy (the small-file-storm control), so AQE
    * has nothing to re-optimize — but it still materializes the
    * exchange as its own query-stage JOB, doubling the job count (and
    * the per-job driver latency + scheduling gap) of every batch
    * write, compact, and ledger step. Measured in BenchOne: each
    * store write ran as 2-3 jobs with ~100-200 ms of driver latency
    * apiece; a bench pass executes ~40 such writes. The written DATA
    * is identical — partitioning is pinned by the explicit count
    * either way. Driver-sequential by contract (the stores' writes
    * are protocol steps, never concurrent with other planning on the
    * same session). */
  def oneJobWrite[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }
}
