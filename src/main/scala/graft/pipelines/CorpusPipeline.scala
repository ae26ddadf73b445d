package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, TextAnalysis => TA}

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
    // fanout before the regex-heavy annotation: a few-files corpus
    // otherwise plans the whole annotate pass into ONE scan task
    // (measured: a 1-task ~1 s job with 31 cores idle at sf0.1).
    // The shuffle carries whatever columns the CALLER passed —
    // deliberate (r15 ADVICE noted it): clean() must return every
    // input column, the text payload dominates the row either way,
    // and projecting here would change the operator's contract.
    // Callers cycling wide frames should pre-project themselves.
    val annotated = annotate(graft.Tables.fanout(docs, col(idCol))
      .observe(obs, count(lit(1)).as("n0")), textCol)
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

  /** The modern heuristic quality stack, composed from the engine's
    * per-row operators plus one LM scoring join — the pre-dedup filter
    * sequence of the C4/Gopher/CCNet lineage:
    *
    *   C4 line clean (page keep + text replaced by surviving lines)
    *     → Gopher rule set on the CLEANED text
    *     → bigram-LM fluency threshold against a reference corpus
    *       (CCNet's "perplexity vs a clean LM" — `lmRef` plays the
    *       Wikipedia role; docs with avg NLL above `maxAvgNll`, or with
    *       no transitions at all, drop).
    *
    * Returns (survivors with `textCol` replaced by the cleaned text,
    * plus n_transitions / avg_nll, ordered by nothing), and per-stage
    * counts. Scale shape: the first two stages are map-only per-row
    * expressions; only the LM stage shuffles, and it moves narrow
    * (id, prev, cur) count rows — never the document payload (the
    * scored ids semi-join back to the cached survivor frame). The
    * gopher survivors are cached under the caller's scope: they feed
    * the LM doc side AND the final join. Per-stage counts ride
    * Observation metrics on the frames that already flow, so the
    * C4 scan is never re-run for counting. */
  /** Raw-web front: HTML → text extraction plus the URL/lexicon
    * blocklist — the two steps that turn a crawl into [[qualityGate]]
    * input. Both are map-only (per-row regexps and literal-array
    * membership), so the front adds NO shuffle to the pipeline; at
    * 100 TB it runs at parquet-scan speed ahead of the first exchange.
    * Returns the surviving docs with the extracted text as `textCol`
    * and the blocklist evidence columns dropped; funnel counts ride an
    * `observe` on the verdict column (read them from the returned
    * Observation after the caller's first action — no extra pass).
    * Caveat: read the counts after a single-pass action (a count, an
    * unsorted write); a global sort's range-partition SAMPLING pass
    * evaluates the observe again and doubles them (spec-pinned). */
  def webFront(raw: DataFrame, idCol: String, htmlCol: String,
      urlCol: String, textCol: String, blockedDomains: Seq[String],
      lexicon: Seq[String], maxBadFrac: Double)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val extracted = raw
      .withColumn(textCol, Curation.htmlToText(col(htmlCol)))
      .drop(htmlCol)
    val kept = Curation.blocklistReport(extracted, urlCol, textCol,
        blockedDomains, lexicon, maxBadFrac)
      .observe(obs, count(lit(1)).as("n_in"),
        sum(when(col("domain_blocked"), 1L).otherwise(0L))
          .as("n_domain_blocked"),
        sum(when(col("blocked") && !col("domain_blocked"), 1L)
          .otherwise(0L)).as("n_lexicon_blocked"))
      .filter(!col("blocked"))
      .drop("domain", "domain_blocked", "bad_hits", "word_count",
        "bad_frac", "blocked")
    (kept, obs)
  }

  def qualityGate(docs: DataFrame, idCol: String, textCol: String,
      lmRef: DataFrame, refTextCol: String, maxAvgNll: Double = 20.0,
      minLineWords: Int = 3, minLines: Int = 5, alpha: Double = 0.5)(
      implicit scope: graft.CacheScope): (DataFrame, Map[String, Long]) = {
    val obs0 = org.apache.spark.sql.Observation()
    val obs1 = org.apache.spark.sql.Observation()
    val c4 = docs.observe(obs0, count(lit(1)).as("n0"))
      .withColumn("__c",
        Curation.c4LineClean(col(textCol), minLineWords, minLines))
    // CACHE the c4 projection before the gopher filter: gopherReport is
    // interpreted higher-order functions (no codegen, no common-subexpr
    // reuse), and CollapseProject would inline the whole c4 expression
    // into EVERY one of its ~90 references to the text column — measured
    // 34 s vs 0.9 s on the c2 corpus. The cache is a projection barrier:
    // clean_text evaluates once per row, the folds read the materialized
    // value.
    val afterC4 = scope.cache(c4.filter(col("__c").getField("is_kept"))
      .withColumn(textCol, col("__c").getField("clean_text"))
      .drop("__c")
      .observe(obs1, count(lit(1)).as("n1")))
    val afterGopher = scope.cache(afterC4.filter(
      Curation.gopherPass(Curation.gopherReportFused(col(textCol)))))
    val n2 = afterGopher.count()
    val n0 = obs0.get("n0").asInstanceOf[Long]
    val n1 = obs1.get("n1").asInstanceOf[Long]
    val lm = TA.bigramLm(lmRef, refTextCol)
    // lazy localCheckpoint: the LM pass runs ONCE (materialized by the
    // n3 count below); the caller's final action re-reads the
    // checkpointed narrow score set instead of re-training the model
    val scored = TA.bigramLogProb(afterGopher, idCol, textCol, lm, alpha)
      .filter(col("n_transitions") > 0L && col("avg_nll") <= maxAvgNll)
      .localCheckpoint(eager = false)
    val survivors = afterGopher.join(scored, Seq(idCol))
    val n3 = survivors.count()
    (survivors, Map("input" -> n0, "after_c4" -> n1,
      "after_gopher" -> n2, "after_lm" -> n3))
  }
}
