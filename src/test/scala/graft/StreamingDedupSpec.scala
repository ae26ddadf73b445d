package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dedupStream keeps first arrival per content hash across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingDedup.dedupStream(
      input.toDF().toDF("doc_id", "text"), "text")
    val q = out.writeStream.format("memory").queryName("sd1")
      .outputMode("append").start()

    input.addData((1L, "Hello  World"), (2L, "other doc"))
    q.processAllAvailable()
    // batch 2: a case/whitespace variant of doc 1 and a fresh doc
    input.addData((3L, "hello world"), (4L, "third doc"))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("sd1").select("doc_id").as[Long]
      .collect().sorted.toSeq
    assert(ids === Seq(1L, 2L, 4L)) // 3 suppressed as dup of 1
  }

  test("watermarked dedup suppresses near re-arrivals, evicts old state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingDedup.dedupStreamWithinWatermark(
      input.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sd2")
      .outputMode("append").start()

    // batch 1: original + an in-window re-crawl (suppressed)
    input.addData(
      (1L, "same content", ts("2024-01-01 00:00:00")),
      (2L, "same content", ts("2024-01-01 00:05:00")),
      (3L, "unique", ts("2024-01-01 00:06:00")))
    q.processAllAvailable()
    // batch 2: watermark has advanced far past the old hash state —
    // the same content arriving much later is treated as new
    input.addData((4L, "advance", ts("2024-01-01 02:00:00")))
    q.processAllAvailable()
    input.addData((5L, "same content", ts("2024-01-01 02:01:00")))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("sd2").select("doc_id").as[Long]
      .collect().sorted.toSeq
    assert(ids.contains(1L) && !ids.contains(2L)) // in-window dup dropped
    assert(ids.contains(5L)) // state evicted -> late re-arrival passes
  }
}
