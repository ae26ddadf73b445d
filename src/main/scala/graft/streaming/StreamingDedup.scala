package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming deduplication for incremental corpus ingestion — the
  * continuous counterpart of [[graft.operators.Dedup.exactDedup]]: a
  * 100 TB training-data pipeline does not re-dedup the corpus per batch,
  * it drops duplicates as documents arrive.
  *
  * Two state regimes, both on the normalized content hash (so whitespace
  * and case variants collapse exactly like the batch operator):
  *
  *  - [[dedupStream]] — `dropDuplicates` on the hash: exactly-once
  *    forever, state grows with distinct documents. Right when the
  *    distinct-id universe is bounded (the reference's one-file-per-run
  *    loads: a natural key seen once is never re-inserted).
  *  - [[dedupStreamWithinWatermark]] — `dropDuplicatesWithinWatermark`:
  *    duplicates are only suppressed while they can still legally arrive
  *    (the event-time watermark), and state is EVICTED once the
  *    watermark passes — bounded memory at any corpus size. Right for
  *    near-real-time feeds where re-crawls land close to the original.
  *
  * Unlike the batch operator, "first one wins" here means first in
  * stream processing order (the micro-batch sequence), not min-id —
  * the streaming contract is arrival-order, which is what an ingestion
  * ledger preserves.
  */
object StreamingDedup {

  /** Content-hash column used for all streaming dedup state. */
  def withContentHash(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("content_hash", Dedup.contentHash(col(textCol)))

  /** Unbounded-state exact dedup: keep the first document per content
    * hash across the whole stream lifetime (checkpoint-backed). */
  def dedupStream(docs: DataFrame, textCol: String): DataFrame =
    withContentHash(docs, textCol).dropDuplicates("content_hash")

  /** Watermarked exact dedup: suppress re-arrivals of the same content
    * while they fall within `delay` of the max observed `tsCol`; state
    * for older hashes is evicted with the watermark. */
  def dedupStreamWithinWatermark(docs: DataFrame, textCol: String,
      tsCol: String, delay: String): DataFrame =
    withContentHash(docs, textCol)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")
}
