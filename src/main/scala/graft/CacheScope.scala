package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Deterministic lifetime management for the signature/bucket frames the
  * dedup and text operators persist internally (MinHash signatures, SimHash
  * signatures, LSH buckets, TF-IDF term frequencies).
  *
  * Those persists are load-bearing — both sides of each candidate self-join
  * branch from the cached frame, and without it the signature scan runs per
  * branch — but a library function returning a LAZY frame cannot unpersist
  * before the caller's action runs. The default policy is therefore
  * session-LRU ([[CacheScope.session]]): caches live until Spark evicts
  * them. At 100 TB an un-released signature cache per corpus is a real
  * executor-memory tax, so callers cycling many corpora should bracket each
  * one instead:
  *
  * {{{
  * val pairs = CacheScope.withScope { implicit scope =>
  *   Dedup.minhashDupPairs(docs, "doc_id", "text").collect()
  * } // internal signature caches released here
  * }}}
  *
  * The body must run its ACTIONS inside the bracket (return materialized
  * results, not lazy frames) — release() drops the caches the returned
  * plan would otherwise still want.
  */
final class CacheScope private[graft] (releaseOnExit: Boolean) {
  private val frames = scala.collection.mutable.ArrayBuffer[DataFrame]()

  /** Persist `df` at the operator-standard level and track it for release
    * (tracking only when this scope releases; the session scope stays
    * stateless so it never accumulates references). */
  private[graft] def cache(df: DataFrame): DataFrame = {
    // idempotent: composed operators re-cache shared frames (a pipeline
    // caches the survivor frame, then hands it to a scorer that caches
    // its model input — same normalized plan). A second persist() of an
    // already-cached plan is a CacheManager WARN and wasted plan
    // normalization, never a second copy; skip it. The frame is still
    // TRACKED so a releasing scope drops it — release() on a shared
    // plan is correct (unpersist is by plan, refcount-free) and matches
    // the previous behavior.
    val p =
      if (org.apache.spark.sql.graft.ColumnBridge.isCached(df)) df
      else df.persist(StorageLevel.MEMORY_AND_DISK)
    if (releaseOnExit) synchronized { frames += p }
    p
  }

  /** [[cache]] + immediate materialization. Use when the cached frame
    * feeds MULTIPLE subtrees of one action that execute concurrently —
    * above all broadcast exchanges: Spark builds each broadcast side on
    * its own thread, and two broadcast jobs hitting a not-yet-
    * materialized InMemoryRelation each recompute its WHOLE lineage
    * (measured on bm25TopK at sf0.1: the tokenize+agg ran 4× — once
    * per broadcast build, once per main job — 83 s of executor time
    * for a 12 s pass). The count() here pays one pass that the first
    * consumer would have paid anyway; every concurrent consumer then
    * reads the materialized cache. */
  private[graft] def cacheEager(df: DataFrame): DataFrame = {
    val p = cache(df)
    p.count()
    p
  }

  private[graft] def registered: Seq[DataFrame] = synchronized(frames.toSeq)

  /** Unpersist every tracked frame (non-blocking) and forget them. */
  def release(): Unit = synchronized {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
  }
}

object CacheScope {
  private val lru = new CacheScope(releaseOnExit = false)
  // Implicit-resolution happens at the OPERATOR call site, which for a
  // library caller is usually code that never mentions scopes — so the
  // default implicit delegates to a thread-local "current" scope. Inside
  // a withScope bracket the current scope is the releasing one, which
  // means the bracket also captures caches made by operators that were
  // called WITHOUT an explicit scope argument (e.g. a query lambda built
  // long before the bracket existed). Plan construction is driver-side
  // and single-threaded per caller, so a thread-local is the right
  // granularity; threads outside any bracket get the LRU scope.
  private val current: ThreadLocal[CacheScope] =
    ThreadLocal.withInitial(() => lru)

  /** Default policy: the thread's active scope — the enclosing
    * [[withScope]] bracket if one is live on this thread, else
    * session-LRU (reclamation via eviction or an explicit
    * `spark.catalog.clearCache()`). */
  implicit def session: CacheScope = current.get()

  /** Bracket: run `body` with a releasing scope; every frame an operator
    * cached inside is unpersisted on the way out, exception or not.
    * The scope is also installed as the thread's current scope, so
    * operators invoked inside the bracket without an explicit scope
    * argument are captured too. */
  def withScope[T](body: CacheScope => T): T = {
    val scope = new CacheScope(releaseOnExit = true)
    val prev = current.get()
    current.set(scope)
    try body(scope)
    finally { current.set(prev); scope.release() }
  }
}
