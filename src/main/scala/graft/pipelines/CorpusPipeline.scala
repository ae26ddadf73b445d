package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis => TA}

/** Composed training-data preparation pipeline — the end-to-end shape a
  * 100 TB corpus clean actually runs, built from the engine's operators:
  *
  *   annotate (lang, quality, token counts — one codegen'd scan)
  *     → language filter
  *     → quality threshold
  *     → exact dedup (normalized-hash, keep lowest id)
  *     → near-dup removal (MinHash-LSH pairs → drop the higher id of
  *       each verified pair — a cheap union-find approximation that is
  *       exact for pairwise clusters and conservative for larger ones)
  *     → corpus stats.
  *
  * Every stage is a narrow transformation or a bounded bucket-join; the
  * only full shuffles move narrow keys — the exact-dedup (hash, id)
  * pairs and the LSH band join — document payloads never enter an
  * exchange.
  */
object CorpusPipeline {

  final case class Config(
      langs: Seq[String] = Seq("en"),
      minQuality: Double = 0.5,
      minhashThreshold: Double = 0.8,
      shingleK: Int = 3,
      /** LSH bands (numHashes=64 fixed). 16 (r=4) is the throughput
        * default; 32 (r=2) trades more candidates for near-certain
        * recall at threshold — the gate uses 32 so its DuckDB
        * brute-force oracle is a stable ground truth. */
      lshBands: Int = 16)

  /** One-scan annotation: metadata every later stage filters on. The
    * fused TextStats struct is materialized ONCE in its own projection
    * (CollapseProject keeps a multi-referenced non-cheap alias), so the
    * document is tokenized exactly once per row; the lambda-composed
    * alternative re-walks the token array per annotation column,
    * interpreted. Outputs are bit-identical (LlmOpsSpec pins it). */
  def annotate(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.withColumn("__st", TA.textStats(t))
      .withColumn("lang_id", TA.langIdS(t, col("__st")))
      .withColumn("quality", TA.qualityScoreS(t, col("__st")))
      .withColumn("n_tokens", TA.tokenCountWsS(t, col("__st")))
      .withColumn("fingerprint", TA.fingerprint(t))
      .drop("__st")
  }

  /** Full clean: returns (cleanCorpus, statsRow). The filtered+annotated
    * frame is persisted — it feeds the dedup winner agg, the dedup probe
    * side, the MinHash pass, and the final anti-join, and the per-stage
    * counts would otherwise recompute the regex-heavy annotation per
    * action. Exact dedup is the narrow (no-payload-shuffle) variant. */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): (DataFrame, Map[String, Long]) = {
    // the input count rides the SAME job as the kept count via an
    // Observation metric on the pre-filter scan — no separate n0 pass
    val obs = org.apache.spark.sql.Observation()
    val annotated = annotate(docs.observe(obs, count(lit(1)).as("n0")),
      textCol)
    // persist the filtered, annotated corpus: the regex-heavy annotation
    // runs ONCE, and every later stage (dedup winner agg, dedup probe,
    // MinHash, final anti-join) reads the cache instead of re-scanning
    val kept = annotated
      .filter(col("lang_id").isin(cfg.langs: _*))
      .filter(col("quality") >= cfg.minQuality)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n1 = kept.count()
    val n0 = obs.get("n0").asInstanceOf[Long]
    // narrow exact dedup: only (hash, id) pairs move; the loser-id set is
    // tiny (persisted) and the corpus is never re-materialized — each
    // stage is the cached corpus + a broadcast anti-join
    val exactLosers = Dedup.exactDupIds(kept, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDups = exactLosers.count()
    val survivors = kept.join(exactLosers, Seq(idCol), "left_anti")
    // the near-dup loser set is materialized EAGERLY inside its own
    // CacheScope bracket: (a) the MinHash signature cache the pair
    // pipeline persists internally is released the moment the (small)
    // loser-id set exists, instead of lingering in session LRU across
    // calls; (b) the final anti-join's plan references a checkpointed
    // id set, so no later action can ever re-run the LSH pass — each
    // stage of the clean executes exactly once per call, eviction or not
    val losers = graft.CacheScope.withScope { implicit scope =>
      Dedup.minhashDupPairs(survivors, idCol, textCol,
        k = cfg.shingleK, bands = cfg.lshBands,
        threshold = cfg.minhashThreshold)
        .select(col("id_b").as(idCol)).distinct()
        .localCheckpoint(eager = true)
    }
    // localCheckpoint severs lineage to the cached frame so it can be
    // released here instead of leaking across calls; lazy so the
    // materialization and the count share one action
    val cleaned = survivors.join(losers, Seq(idCol), "left_anti")
      .localCheckpoint(eager = false)
    val n3 = cleaned.count()
    exactLosers.unpersist()
    kept.unpersist()
    (cleaned, Map(
      "input" -> n0, "after_lang_quality" -> n1,
      "after_exact_dedup" -> (n1 - nDups), "after_near_dedup" -> n3))
  }
}
