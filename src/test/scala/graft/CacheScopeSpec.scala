package graft

import graft.operators.Dedup
import org.apache.spark.storage.StorageLevel

/** The dedup operators persist internal signature frames; the default
  * scope leaves them to session LRU, while withScope releases them
  * deterministically when the caller's actions finish. */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog today"),
    (3L, "completely different text about spark execution plans"))
    .toDF("doc_id", "text")

  test("withScope releases internal signature caches after the action") {
    var captured: Seq[org.apache.spark.sql.DataFrame] = Nil
    val pairs = CacheScope.withScope { scope =>
      val out = Dedup.minhashDupPairs(corpus, "doc_id", "text",
        threshold = 0.5)(scope).collect()
      captured = scope.registered
      assert(captured.nonEmpty)
      // persisted while the bracket is live
      assert(captured.forall(_.storageLevel == StorageLevel.MEMORY_AND_DISK))
      out
    }
    assert(pairs.nonEmpty) // docs 1 and 2 are near-dups
    // released on exit
    assert(captured.forall(_.storageLevel == StorageLevel.NONE))
  }

  test("withScope releases on exception too") {
    var captured: Seq[org.apache.spark.sql.DataFrame] = Nil
    intercept[IllegalStateException] {
      CacheScope.withScope { scope =>
        Dedup.simhashDupPairs(corpus, "doc_id", "text")(scope).count()
        captured = scope.registered
        throw new IllegalStateException("boom")
      }
    }
    assert(captured.nonEmpty)
    assert(captured.forall(_.storageLevel == StorageLevel.NONE))
  }

  test("default session scope keeps caches live (LRU policy)") {
    val df = Dedup.minhashDupPairs(corpus, "doc_id", "text", threshold = 0.5)
    assert(df.count() >= 1)
    // the session scope tracks nothing — nothing to leak references to
    assert(CacheScope.session.registered.isEmpty)
  }
}
