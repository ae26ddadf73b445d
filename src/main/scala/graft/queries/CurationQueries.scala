package graft.queries

import graft.Tables
import graft.expressions.FreqSketchExpr
import graft.expressions.ByteMap
import graft.operators.{ByteBpe, Curation, Dedup, TextAnalysis, Unigram, WordPiece}
import graft.ops.CountMin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate coverage for the curation operator family ([[graft.operators.
  * Curation]]): duplicate-cluster resolution, deterministic sampling,
  * per-source quota caps, sequence packing, PII redaction, benchmark
  * decontamination. Every entry is fully oracle-checked — the DuckDB
  * SQL recomputes the result from first principles (recursive-CTE
  * transitive closure for the clusters, window cumsum for packing,
  * the same md5/regex/n-gram math for the rest).
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  /** d7's corpus: the documents plus, for every 25th doc, one exact
    * copy and one near-copy (3 appended words keep 3-shingle Jaccard
    * ≈ 0.95) — guaranteeing clusters of size ≥ 3 whose transitive
    * closure the clustering must produce. */
  private def d7Corpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val copies = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 30000L).as("doc_id"), col("text"))
    val nears = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 40000L).as("doc_id"),
        concat(col("text"), lit(" graft curation tail")).as("text"))
    docs.unionByName(copies).unionByName(nears)
  }

  private val d7CorpusSql =
    """alldocs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 30000, text FROM documents WHERE doc_id % 25 = 0
      |  UNION ALL
      |  SELECT doc_id + 40000, text || ' graft curation tail'
      |  FROM documents WHERE doc_id % 25 = 0)""".stripMargin

  /** t18 word universe: corpus words ∪ md5-derived hex words (length
    * 4..24) — mirrored token for token by
    * [[OracleFragments.unigramCtes]]'s `t18w`. */
  private def t18WordFreq(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tw = docs.select(explode(filter(TextAnalysis.tokens(col("text")),
      w => w =!= "")).as("word"))
    val hw = docs.select(expr("substring(md5(cast(doc_id as string)), " +
      "1, 4 + cast(doc_id % 21 as int))").as("word"))
    tw.unionByName(hw).groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
  }

  /** The frozen t18 model: seed costs collected (bounded — singles +
    * 200 multis) for the encode gates. */
  private def t18Vocab(s: SparkSession, d: String): Seq[(String, Long)] =
    Unigram.seedVocab(t18WordFreq(s, d), vocabSize = 200, maxPieceLen = 8)
      .select(col("piece"), col("cost_mu")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toIndexedSeq

  /** The frozen t20 WordPiece vocabulary over the same word universe
    * (bounded — singles of both forms + 200 multis). */
  private def t20Vocab(s: SparkSession, d: String): Seq[String] =
    WordPiece.vocab(t18WordFreq(s, d), vocabSize = 200, maxPieceLen = 8)
      .select(col("piece")).collect().map(_.getString(0)).toIndexedSeq

  /** Shared t20c/sql10 DuckDB composition over the wordpieceCtes chain
    * (`wppieces`/`wpdone`): corpus words per doc, FULL-MODEL UTF8
    * ranking (every `wpv` piece plus [UNK], which ranks like any
    * symbol — ids are a pure function of the model, the
    * TokenizerStore shard-stability contract), per-word id strings,
    * and the per-doc aggregation `t20agg(doc_id, n_tok, n_unk,
    * token_str)`. */
  private val wpCorpusComposition: String =
    """t20dwx AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(coalesce(text,
      |      ''))), '\s+'), x -> x <> '') AS __ws
      |  FROM documents),
      |t20dw AS (
      |  SELECT doc_id, i AS wpos, __ws[i] AS word
      |  FROM t20dwx, unnest(generate_series(1, len(__ws))) t(i)),
      |t20w AS (SELECT DISTINCT word FROM t20dw),
      |t20wp AS (
      |  SELECT p.word, p.k, p.piece, 0 AS unk
      |  FROM wppieces p JOIN wpdone d ON d.word = p.word
      |  JOIN t20w c ON c.word = p.word
      |  UNION ALL
      |  SELECT c.word, 1 AS k, '[UNK]' AS piece, 1 AS unk
      |  FROM t20w c LEFT JOIN wpdone d ON d.word = c.word
      |  WHERE d.word IS NULL),
      |t20sym AS (
      |  SELECT piece, row_number() OVER (ORDER BY piece) - 1
      |    AS token_id
      |  FROM (SELECT DISTINCT piece FROM (
      |    SELECT piece FROM wpv UNION ALL SELECT '[UNK]' AS piece))),
      |t20wid AS (
      |  SELECT wp.word,
      |    string_agg(CAST(s.token_id AS VARCHAR), ' ' ORDER BY wp.k)
      |      AS idstr,
      |    count(*) AS ntok, max(wp.unk) AS wunk
      |  FROM t20wp wp JOIN t20sym s ON s.piece = wp.piece
      |  GROUP BY 1),
      |t20agg AS (
      |  SELECT d.doc_id, CAST(sum(w.ntok) AS INTEGER) AS n_tok,
      |    CAST(sum(w.wunk) AS INTEGER) AS n_unk,
      |    string_agg(w.idstr, ' ' ORDER BY d.wpos) AS token_str
      |  FROM t20dw d JOIN t20wid w ON w.word = d.word GROUP BY 1)"""
      .stripMargin

  /** t21 planted corpus: every doc gains a multibyte suffix (Latin-1
    * accents, CJK, Cyrillic, a 4-byte emoji) chosen by doc_id so the
    * byte-level tokenizer exercises 2-, 3-, and 4-byte UTF-8
    * sequences, not just ASCII. The oracle rebuilds the identical
    * construction. */
  private val t21Suffixes = Seq(" café crème", " 世界 模型",
    " naïve façade", " данные модели", " ok 😀")
  private def t21Docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      concat(coalesce(col("text"), lit("")),
        element_at(array(t21Suffixes.map(lit): _*),
          (col("doc_id") % 5 + 1).cast("int"))).as("text"))

  /** t25 planted corpus: the t21 multibyte suffixes PLUS hostile
    * whitespace — leading runs, tabs, newline runs, double spaces,
    * trailing whitespace — the cases a space-carrying byte tokenizer
    * must round-trip exactly and a separator-convention one cannot.
    * The oracle rebuilds the identical construction with chr(). */
  private val t25Pre = Seq("  ", "\t", "\n ", "", " \n")
  private val t25Suf = Seq(" café\tcrème\n", " 世界  模型",
    "\nnaïve façade ", "\t данные\n\nмодели", " ok 😀\t")
  private def t25Docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      concat(
        element_at(array(t25Pre.map(lit): _*),
          (col("doc_id") % 5 + 1).cast("int")),
        coalesce(col("text"), lit("")),
        element_at(array(t25Suf.map(lit): _*),
          (col("doc_id") % 5 + 1).cast("int"))).as("text"))

  /** The t25 oracle's replay of [[t25Docs]]. */
  private def t25DocsSql: String =
    s"""pd AS (
       |  SELECT doc_id, concat(
       |    CASE CAST(doc_id % 5 AS INTEGER)
       |      WHEN 0 THEN '  ' WHEN 1 THEN chr(9)
       |      WHEN 2 THEN chr(10) || ' ' WHEN 3 THEN ''
       |      ELSE ' ' || chr(10) END, coalesce(text, ''),
       |    CASE CAST(doc_id % 5 AS INTEGER)
       |      WHEN 0 THEN ' café' || chr(9) || 'crème' || chr(10)
       |      WHEN 1 THEN ' 世界  模型'
       |      WHEN 2 THEN chr(10) || 'naïve façade '
       |      WHEN 3 THEN chr(9) || ' данные' || chr(10) ||
       |        chr(10) || 'модели'
       |      ELSE ' ok 😀' || chr(9) END) AS text
       |  FROM documents)""".stripMargin

  /** The t21 oracle's replay of [[t21Docs]]. */
  private def t21DocsSql: String =
    s"""pd AS (
       |  SELECT doc_id, concat(coalesce(text, ''),
       |    CASE CAST(doc_id % 5 AS INTEGER)
       |      WHEN 0 THEN ' café crème' WHEN 1 THEN ' 世界 模型'
       |      WHEN 2 THEN ' naïve façade'
       |      WHEN 3 THEN ' данные модели'
       |      ELSE ' ok 😀' END) AS text
       |  FROM documents)""".stripMargin

  /** Shared tail of the byte-level corpus-tokens oracles: the 30-merge
    * chain over whatever `lead` CTEs provide (`bw`/`bmapped`), then
    * byte-order symbol ids + ordered per-word and per-doc
    * aggregation — the t14e contract on the byte alphabet. */
  private def byteCorpusTokensOracle(lead: String): String =
    s"""WITH $lead,
       |${OracleFragments.bpeCtesFromWfreq(OracleFragments
            .byteWfreqBody, 30)},
       |t21vocab AS (
       |  SELECT sym, row_number() OVER (ORDER BY sym) - 1 AS token_id
       |  FROM (
       |    SELECT chr(CAST(CASE WHEN (b BETWEEN 33 AND 126)
       |          OR (b BETWEEN 161 AND 172)
       |          OR (b BETWEEN 174 AND 255) THEN b
       |        WHEN b <= 32 THEN 256 + b
       |        WHEN b BETWEEN 127 AND 160 THEN 289 + (b - 127)
       |        ELSE 323 END AS INTEGER)) AS sym
       |    FROM generate_series(0, 255) t(b)
       |    UNION
       |    SELECT lhs || rhs AS sym FROM (
       |${(1 to 30).map(k =>
            s"      SELECT lhs, rhs FROM mg_$k")
            .mkString("\n      UNION ALL\n")}) m)),
       |t21wseg AS (
       |  SELECT s.word,
       |    string_agg(CAST(v.token_id AS VARCHAR), ' ' ORDER BY s.pos)
       |      AS idstr,
       |    count(*) AS nsym
       |  FROM syms30 s JOIN t21vocab v USING (sym) GROUP BY s.word),
       |t21dw AS (
       |  SELECT b.doc_id, b.wpos, m.bword AS mword
       |  FROM bw b JOIN bmapped m USING (word)),
       |t21agg AS (
       |  SELECT d.doc_id, CAST(sum(w.nsym) AS INTEGER) AS n_tok,
       |    string_agg(w.idstr, ' ' ORDER BY d.wpos) AS token_str
       |  FROM t21dw d JOIN t21wseg w ON w.word = d.mword
       |  GROUP BY d.doc_id)
       |SELECT x.doc_id, coalesce(a.n_tok, 0) AS n_tok,
       |  coalesce(a.token_str, '') AS token_str
       |FROM documents x LEFT JOIN t21agg a USING (doc_id)
       |ORDER BY x.doc_id""".stripMargin

  def queries: Map[String, Q] = Map(
    // ---- near-dup CLUSTERS (transitive closure over pair output) ------
    // Pairs come from the d3-proven exact LSH setting (bands=32, r=2:
    // per-pair miss probability < 1e-9, emitted set == true Jaccard≥0.7
    // set); dupClusters then min-label-propagates them into components.
    // The oracle recomputes brute-force Jaccard pairs and closes them
    // with a recursive CTE — clustering correctness is checked end to
    // end, not against our own pair output.
    "d7_dup_clusters" -> ((s, d) => {
      val all = d7Corpus(s, d)
      val pairs = Dedup.minhashDupPairs(all, "doc_id", "text",
        k = 3, numHashes = 64, bands = 32, threshold = 0.7)
      Curation.clusterAssign(all, "doc_id", pairs, "id_a", "id_b")
        .orderBy(col("doc_id"))
    }),

    // ---- quality-argmax representative per cluster ----------------------
    // Same corpus/pairs as d7, but the survivor is the member with the
    // most whitespace tokens (ties → smaller id), not the min id — the
    // "keep the best copy" dedup. The oracle recomputes closure AND
    // election independently (recursive CTE + argmax window).
    "cr1_cluster_reps" -> ((s, d) => {
      val all = d7Corpus(s, d)
      val pairs = Dedup.minhashDupPairs(all, "doc_id", "text",
        k = 3, numHashes = 64, bands = 32, threshold = 0.7)
      Curation.clusterRepresentatives(all, "doc_id", pairs, "id_a", "id_b",
          size(split(lower(trim(col("text"))), "\\s+")))
        .orderBy(col("doc_id"))
    }),

    // ---- deterministic hash sample ------------------------------------
    "cu1_hash_sample" -> ((s, d) => {
      Curation.hashSample(Tables.documents(s, d), "doc_id",
          Curation.rateBound(0.1))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // ---- per-source quota cap (top-5 by n_chars, skew-free) ------------
    "cu2_source_cap" -> ((s, d) => {
      Curation.perGroupCap(Tables.documents(s, d), "source", "doc_id",
          col("n_chars"), k = 5)
        .select(col("source"), col("rank"), col("doc_id"),
          col("__ord").cast("long").as("n_chars"))
        .orderBy(col("source"), col("rank"))
    }),

    // ---- sequence packing (token-budget offsets) ------------------------
    "cu3_pack_sequences" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long")
          .as("n_tok"))
      Curation.packSequences(toks, "doc_id", "n_tok", budget = 2048L)
        .select(col("doc_id"), col("n_tok"), col("start_off"),
          col("first_seq"), col("last_seq"))
        .orderBy(col("doc_id"))
    }),

    // ---- PII redaction (planted emails/phones) --------------------------
    "cu4_pii_redact" -> ((s, d) => {
      val withPii = Tables.documents(s, d).select(col("doc_id"),
        when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or +1-555-01"), col("doc_id") % 100,
            lit("2 today")))
          .otherwise(col("text")).as("text"))
      withPii.select(col("doc_id"),
          Curation.countEmails(col("text")).as("n_emails"),
          Curation.countPhones(col("text")).as("n_phones"),
          Curation.redactPii(col("text")).as("clean"))
        .orderBy(col("doc_id"))
    }),

    // ---- deterministic k-way split (train/val/test) ----------------------
    "cu6_hash_split" -> ((s, d) => {
      Tables.documents(s, d).select(col("doc_id"),
          Curation.hashSplit(col("doc_id"),
            Seq("val" -> Curation.rateBound(0.05),
              "test" -> Curation.rateBound(0.1)), "train").as("split"))
        .orderBy(col("doc_id"))
    }),

    // ---- stratified per-language sampling --------------------------------
    // Downsample dominant en, keep half of de, 20% elsewhere — the
    // target-mix reweighting step of corpus assembly.
    "cu7_stratified_sample" -> ((s, d) => {
      Curation.stratifiedHashSample(Tables.documents(s, d), "doc_id",
          "lang", Map("en" -> 0.05, "de" -> 0.5), defaultRate = 0.2)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // ---- intra-document repetition (Gopher-style quality signal) ---------
    // Every 31st doc gets itself appended — a repetitive planted row
    // whose duplicate-2-gram fraction must land near 0.5.
    "t3_repetition" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val rep = docs.filter(col("doc_id") % 31 === 0)
        .select((col("doc_id") + 60000L).as("doc_id"),
          concat(col("text"), lit(" "), col("text")).as("text"))
      docs.unionByName(rep).select(col("doc_id"),
          Curation.dupNgramFrac(col("text"), 2).as("dup_2gram_frac"),
          Curation.dupNgramFrac(col("text"), 3).as("dup_3gram_frac"))
        .withColumn("is_repetitive", col("dup_2gram_frac") > 0.1)
        .orderBy(col("doc_id"))
    }),

    // ---- token-window chunking (embedding prep) ---------------------------
    "cu8_chunking" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(Curation.chunkTokens(col("text"), chunkSize = 32,
            overlap = 8)))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
          col("col").as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // ---- corpus term statistics (top-k by frequency) ----------------------
    // Deterministic tie-break (count DESC, term ASC) so the top-20 cut
    // is unique; TakeOrderedAndProject keeps the global sort bounded.
    "t4_top_terms" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term")).limit(20)
    }),

    // ---- per-document TF-IDF top-k (oracle recomputes tf/df/ln) -----------
    // Complements t4: distinctive-per-document terms, not corpus-global
    // frequency. The oracle rebuilds tf, df, N and the smoothed-idf
    // score independently; ln is cross-engine hash-validated (cu13
    // replays the A-ES ln key) and round(6) absorbs ulp drift.
    "t7_tfidf_terms" -> ((s, d) => {
      TextAnalysis.tfIdfTopTerms(Tables.documents(s, d), "doc_id", "text",
          k = 3)
        .orderBy(col("doc_id"), col("rank"))
    }),

    // ---- mergeable heavy-hitters sketch (Misra–Gries) ---------------------
    // Exact top-10 terms (hash-checked vs DuckDB) joined against a
    // k=64 freq_sketch of the same stream; the booleans assert the MG
    // bound est <= true <= est + (N - M)/(k+1), which holds under
    // EVERY partial-merge order — the same self-verifying gate shape
    // as hll1. A sketch that overcounts, loses a guaranteed heavy
    // hitter, or mis-merges flips a boolean and breaks the hash.
    "t6_heavy_hitters" -> ((s, d) => {
      val terms = Tables.documents(s, d)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      val sk = terms.agg(
        FreqSketchExpr.freqSketch(col("term"), 64).as("sk"),
        count(lit(1)).as("n_total"))
      val exact = terms.groupBy(col("term")).agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("term")).limit(10)
      exact.crossJoin(broadcast(sk))
        .withColumn("est", coalesce(
          element_at(map_from_entries(col("sk")), col("term")), lit(0L)))
        .withColumn("retained", aggregate(col("sk"), lit(0L),
          (acc, e) => acc + e.getField("est")))
        .select(col("term"), col("n_exact"),
          (col("est") <= col("n_exact")).as("under_est"),
          ((col("n_exact") - col("est")).cast("double") <=
            (col("n_total") - col("retained")).cast("double") / 65.0)
            .as("in_bound"))
        .orderBy(col("n_exact").desc, col("term"))
    }),

    // ---- DSIR importance weights (oracle: full replay) --------------------
    // Target distribution = the English docs; every doc in the corpus is
    // scored by the hashed-uni+bigram log-likelihood ratio. The md5
    // bucket hash and the integer-micros per-bucket ratios are DuckDB-
    // replayable end to end (the cm1/t8 disciplines), so the hash pins
    // featurization, both count tables, the smoothed ratio table, and
    // every per-doc sum.
    "dsir1_importance_weights" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.dsirWeights(docs, "doc_id", "text",
        docs.filter(col("lang") === "en"), "text", buckets = 1024)
        .orderBy(col("doc_id"))
    }),

    // ---- incremental DSIR: folded batch counts ≡ one-shot weights ---------
    // The corpus arrives as two halves; their bucket-count tables fold
    // by SUM and every doc is scored against the maintained state. The
    // oracle is the SAME full-recompute SQL as dsir1: integer counts
    // are associative, so the incremental path must reproduce the
    // one-shot weights bit for bit — a fold or state-naming regression
    // breaks the hash.
    "dsir2_incremental_weights" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val rawCounts = Curation.foldBucketCounts(
        Curation.ngramBucketCounts(
          docs.filter(col("doc_id") % 2 === 0), "text", 1024),
        Curation.ngramBucketCounts(
          docs.filter(col("doc_id") % 2 === 1), "text", 1024))
      Curation.dsirWeightsFromCounts(docs, "doc_id", "text",
        Curation.ngramBucketCounts(
          docs.filter(col("lang") === "en"), "text", 1024),
        rawCounts, 1024)
        .orderBy(col("doc_id"))
    }),

    // ---- per-source distinctive terms (group-level TF-IDF) ----------------
    // Each source's pooled text is a pseudo-document: tf by (source,
    // term), df = sources containing the term, N = source count. The
    // oracle rebuilds all four from scratch — no text concatenation on
    // either side.
    "t9_domain_terms" -> ((s, d) => {
      TextAnalysis.tfIdfTopTermsByGroup(Tables.documents(s, d), "source",
        "text", k = 5)
        .orderBy(col("source"), col("rank"))
    }),

    // ---- BM25 top-k retrieval ---------------------------------------------
    // Queries are the first 5 tokens of docs 0-2; the oracle rebuilds
    // tf/df/dl/avgdl and the full Okapi formula (identical IEEE
    // expression tree, derived constants interpolated as exact doubles)
    // and re-ranks with ROW_NUMBER over the same integer-micros scores,
    // so ranking, saturation, and length normalization all hash-compare.
    "t8_bm25_search" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val queries = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"),
          concat_ws(" ", slice(split(lower(trim(col("text"))), "\\s+"),
            1, 5)).as("qtext"))
      TextAnalysis.bm25TopK(docs, "doc_id", "text", queries, "qid",
        "qtext", k = 5)
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- SQL surface: retrieval through SQL TEXT --------------------------
    // The bm25_topk TABLE function injected by GraftExtensions, driven
    // end-to-end as SQL: parse → TVF resolution (splices the operator's
    // logical plan) → Catalyst → the same integer-micros scores. The
    // DuckDB oracle replays the full Okapi math for the literal query,
    // so the SQL surface is hash-checked exactly like the Scala API
    // (t8), not just smoke-tested.
    "sql2_sql_retrieval" -> ((s, d) => {
      s.sql(s"""
        SELECT rank, doc_id, score
        FROM bm25_topk('$d/documents.parquet', 'doc_id', 'text',
          'spark hash join window', 10)
        ORDER BY rank""")
    }),

    // ---- persisted inverted-index store (incremental BM25) ----------------
    // The retrieval leg of the incremental-corpus story: index even
    // doc_ids as the seed, append odd doc_ids as batch b1 WITHOUT
    // re-reading the seed, then answer t8's exact queries from the
    // persisted postings (bucket-pruned, df read exactly from the
    // pruned scan). Scoring shares bm25ContribMicros with the one-shot
    // path, so the oracle — the SAME from-scratch DuckDB replay t8
    // uses, over the union of both batches — hash-checks that
    // incremental index ≡ full rebuild, rank for rank, micro for micro.
    "ir1_index_store" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val dir = GateTmp.dir("graft_idxstore", d)
      graft.pipelines.IndexStore.create(s, dir,
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      graft.pipelines.IndexStore.append(s, dir,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", "b1")
      val queries = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"),
          concat_ws(" ", slice(split(lower(trim(col("text"))), "\\s+"),
            1, 5)).as("qtext"))
      graft.pipelines.IndexStore.bm25TopK(s, dir, queries, "qid",
        "qtext", k = 5)
        .select(col("qid"), col("rank"), col("id").as("doc_id"),
          col("score"))
        .orderBy(col("qid"), col("rank"))
    }),

    // ---- Count-Min point-frequency sketch ---------------------------------
    // The overcount-only complement to t6's Misra-Gries: the sketch state
    // is a plain (depth, bkt, cnt) aggregate over md5-derived buckets, so
    // DuckDB rebuilds the ENTIRE sketch bit-identically and the estimates
    // (top-10 exact terms + one never-seen probe) hash-compare exactly —
    // bucket hash, collision pattern, min-over-rows and all. The
    // overcount_ok booleans additionally pin the CM guarantee est >= true.
    "cm1_countmin_freq" -> ((s, d) => {
      import s.implicits._
      // terms feeds the sketch AND the exact counts; probes feed
      // estimate's explode AND the final join — cache both or the
      // documents scan+tokenize runs four times per action
      val terms = graft.CacheScope.session.cache(Tables.documents(s, d)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("term")))
      val state = CountMin.sketch(terms, "term", depth = 4, width = 512)
      val probes = graft.CacheScope.session.cache(terms
        .groupBy(col("term"))
        .agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("term")).limit(10)
        .unionByName(Seq(("__absent_probe__", 0L)).toDF("term", "n_exact")))
      CountMin.estimate(state, probes, "term", depth = 4, width = 512)
        .join(probes, Seq("term"))
        .select(col("term"), col("n_exact"), col("est"),
          (col("est") >= col("n_exact")).as("overcount_ok"))
        .orderBy(col("term"))
    }),

    // ---- long-diameter components via large-star/small-star --------------
    // A chain of consecutive doc_ids broken at every multiple of 100 —
    // diameter ~100 components where per-round label propagation needs
    // ~100 shuffles but the star alternation converges in ~a dozen.
    // The oracle is the closed-form component min (floor(id/100)*100).
    "d8_star_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val pairs = docs.filter((col("doc_id") + 1) % 100 =!= 0)
        .select(col("doc_id").as("id_a"),
          (col("doc_id") + 1).as("id_b"))
        .join(docs.select(col("doc_id").as("id_b")), Seq("id_b"))
      Curation.dupClustersStar(pairs, "id_a", "id_b")
        .orderBy(col("id"))
    }),

    // ---- exact-k uniform per-group sample ---------------------------------
    // 7 docs per source, selected by smallest md5 draw — the oracle
    // replays the identical draw and ranking in DuckDB.
    "cu11_group_sample" -> ((s, d) => {
      Curation.uniformGroupSample(Tables.documents(s, d), "source",
          "doc_id", k = 7)
        .orderBy(col("source"), col("rank"))
    }),

    // ---- weighted per-group sample (A-ES) ---------------------------------
    // 5 docs per source, selection probability ∝ UTF-8 byte length —
    // the oracle replays the exact A-ES key ln((draw+0.5)/2^32)/w and
    // ranking in DuckDB (strlen = Spark octet_length = UTF-8 bytes).
    "cu13_weighted_sample" -> ((s, d) => {
      Curation.weightedGroupSample(Tables.documents(s, d), "source",
          "doc_id", octet_length(col("text")), k = 5)
        .orderBy(col("source"), col("rank"))
    }),

    // ---- cross-document boilerplate removal ------------------------------
    // Every even doc gets a shared newsletter footer (corpus-hot: gone),
    // every 5th doc a 2-char "ok" line (below minChars: stays). The
    // oracle re-derives hot lines by COUNT(DISTINCT doc) in DuckDB, so
    // a per-occurrence (vs per-doc) counting bug, a lost short-line
    // exemption, or a reassembly-order slip breaks the hash.
    "cu9_boilerplate" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 2 === 0,
            lit("\nsubscribe to our newsletter for updates"))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit("\nok")).otherwise(lit("")))
          .as("text"))
      Curation.removeBoilerplate(docs, "doc_id", "text", maxDocs = 50)
        .orderBy(col("doc_id"))
    }),

    // ---- domain mixture reweighting ---------------------------------------
    // Water-filling to 1:3:2 char-mass proportions over three sources;
    // the oracle recomputes availability, the feasible total, per-source
    // rates, and the 12-bit hash bounds from scratch in DuckDB.
    "cu10_domain_mix" -> ((s, d) => {
      Curation.mixDomains(Tables.documents(s, d), "doc_id", "source",
          col("n_chars"),
          Map("src0" -> 1.0, "src1" -> 3.0, "src2" -> 2.0))
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // ---- temperature-flattened domain mixture ----------------------------
    // Targets derived from the corpus itself at T=2 (∝ sqrt(mass) —
    // exactly IEEE-replayable, unlike general pow), then the same
    // water-filling downsample as cu10. The oracle recomputes per-source
    // mass, the sqrt targets, the binding group, every keep-rate, and
    // the 4096-bucket md5 bounds — so the whole derive→mix composition
    // is hash-pinned, not just the mix step.
    "cu17_temperature_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val targets = Curation.temperatureTargets(docs, "source",
        col("n_chars"), temperature = 2.0)
      Curation.mixDomains(docs, "doc_id", "source", col("n_chars"),
          targets)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // ---- benchmark decontamination (5-gram overlap vs held-out set) -----
    "cu5_decontam" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") % 97 === 0).select(col("text"))
      val planted = docs.filter(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 50000L).as("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), col("text")).unionByName(planted)
      Curation.decontaminate(corpus, "doc_id", "text", bench, "text",
          n = 5, minMatches = 3)
        .orderBy(col("doc_id"))
    }),

    // ---- semantic decontamination (embedding-space benchmark leaks) ------
    // The paraphrase leg of cu5: a benchmark of 20 SCALED copies of every
    // 25th corpus vector (identical direction ⟹ identical hyperplane
    // signs ⟹ deterministic LSH recall, the d5 argument) at cosine ~1.0;
    // random 64-dim pairs never reach 0.999, so the LSH output equals
    // the brute-force truth and the DuckDB oracle recomputes every
    // (match-count, max-cosine, flag) row from all 500×20 exact cosines.
    "cu15_semantic_decontam" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>")
          .as("embedding"))
      val bench = emb.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 20000L).as("bench_id"),
          transform(col("embedding"), x => x * 1.001).as("embedding"))
      Curation.semanticDecontaminate(emb, "vec_id", "embedding",
          bench, "bench_id", "embedding", threshold = 0.999, planes = 8)
        .orderBy(col("vec_id"))
    }),

    // ---- Gopher quality-rule report (Rae et al. 2021 §A1.1) ---------------
    // Three planted variants stress rule families the word-soup corpus
    // cannot: doubled text (dup-gram char fractions), bullet multi-line
    // docs (line rules), symbol-spiked docs (symbol ratio). The oracle
    // recomputes every metric via unnest + GROUP BY — a completely
    // different shape from the engine's per-row sorted run folds, so a
    // fold bug cannot self-confirm.
    "t10_gopher_quality" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val doubled = docs.filter(col("doc_id") % 31 === 0)
        .select((col("doc_id") + 60000L).as("doc_id"),
          concat(col("text"), lit(" "), col("text")).as("text"))
      val bulleted = docs.filter(col("doc_id") % 41 === 0)
        .select((col("doc_id") + 70000L).as("doc_id"),
          replace(col("text"), lit(" table "), lit("\n- ")).as("text"))
      val spiked = docs.filter(col("doc_id") % 53 === 0)
        .select((col("doc_id") + 80000L).as("doc_id"),
          concat(col("text"), lit(" # # # # # # # #")).as("text"))
      val fields = Seq("word_count", "mean_word_len", "symbol_word_ratio",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
        "stopword_hits", "dup_line_frac", "dup_line_char_frac",
        "top_2gram_char_frac", "top_3gram_char_frac",
        "top_4gram_char_frac", "dup_5gram_char_frac",
        "dup_10gram_char_frac")
      docs.unionByName(doubled).unionByName(bulleted).unionByName(spiked)
        .withColumn("__g", Curation.gopherReportFused(col("text")))
        .select(col("doc_id") +:
          fields.map(f => col("__g").getField(f).as(f)) :+
          Curation.gopherPass(col("__g")).as("gopher_pass"): _*)
        .orderBy(col("doc_id"))
    }),

    // ---- C4 line-level cleaning (Raffel et al. 2020 §2.2) -----------------
    // The base corpus (no newlines, no punctuation) exercises the
    // drop-everything path; planted variants exercise each rule: docs
    // sentence-ized by replacing ' value ' with '.\n' (kept lines), a
    // javascript line (line dropped), a lorem-ipsum line (page
    // dropped), a curly-brace suffix (page dropped).
    "cu14_line_clean" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      def sentenceized = replace(col("text"), lit(" value "), lit(".\n"))
      val sent = docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 90000L).as("doc_id"),
          concat(sentenceized, lit(".")).as("text"))
      val js = docs.filter(col("doc_id") % 29 === 0)
        .select((col("doc_id") + 95000L).as("doc_id"),
          concat(sentenceized,
            lit(".\nenable javascript to continue.")).as("text"))
      val lorem = docs.filter(col("doc_id") % 37 === 0)
        .select((col("doc_id") + 97000L).as("doc_id"),
          concat(sentenceized,
            lit(".\nlorem ipsum dolor sit amet.")).as("text"))
      val brace = docs.filter(col("doc_id") % 43 === 0)
        .select((col("doc_id") + 98000L).as("doc_id"),
          concat(sentenceized, lit(". {")).as("text"))
      docs.unionByName(sent).unionByName(js).unionByName(lorem)
        .unionByName(brace)
        .withColumn("__c", Curation.c4LineClean(col("text")))
        .select(col("doc_id"),
          col("__c").getField("clean_text").as("clean_text"),
          col("__c").getField("n_lines_kept").as("n_lines_kept"),
          col("__c").getField("n_lines_dropped").as("n_lines_dropped"),
          col("__c").getField("is_kept").as("is_kept"))
        .orderBy(col("doc_id"))
    }),

    // ---- bigram LM fluency scoring (CCNet-style) --------------------------
    // Train on the src0 slice, score every document. The oracle
    // rebuilds the whole model (bigram counts, context totals, V) and
    // replays the smoothed ln to the same integer micros, so training,
    // smoothing, OOV handling, and the per-doc fold all hash-compare.
    "t11_bigram_lm" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        col("source"), col("text"))
      val lm = TextAnalysis.bigramLm(
        docs.filter(col("source") === "src0"), "text")
      TextAnalysis.bigramLogProb(docs, "doc_id", "text", lm, alpha = 0.5)
        .orderBy(col("doc_id"))
    }),

    // ---- incremental bigram LM: folded batch counts ≡ one-shot model ------
    // The training slice arrives as two halves; their count tables fold
    // by SUM and every doc is scored against the maintained state. The
    // oracle is the SAME full-recompute SQL as t11: integer counts are
    // associative, so the incremental path must reproduce the one-shot
    // scores bit for bit (the dsir2 discipline).
    "t11b_incremental_lm" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        col("source"), col("text"))
      val train = docs.filter(col("source") === "src0")
      val lm = TextAnalysis.foldBigramLm(
        TextAnalysis.bigramLm(train.filter(col("doc_id") % 2 === 0), "text"),
        TextAnalysis.bigramLm(train.filter(col("doc_id") % 2 === 1), "text"))
      TextAnalysis.bigramLogProb(docs, "doc_id", "text", lm, alpha = 0.5)
        .orderBy(col("doc_id"))
    }),

    // ---- trigram LM fluency scoring (interpolated, CCNet-grade) ----------
    // CCNet's published filter is a 5-gram KenLM; this is the same
    // machinery one order up from t11's bigram: train the (w1,w2,w3)
    // count table on the src0 slice, score every document with
    // Jelinek-Mercer interpolation over trigram/bigram/unigram levels
    // — all marginals derived from the ONE count table. The oracle
    // rebuilds the model and replays the interpolated ln to the same
    // integer micros, so training, every marginal, the interpolation
    // weights, OOV handling, and the per-doc fold all hash-compare.
    "t16_trigram_lm" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        col("source"), col("text"))
      val lm = TextAnalysis.trigramLm(
        docs.filter(col("source") === "src0"), "text")
      TextAnalysis.trigramLogProb(docs, "doc_id", "text", lm,
        alpha = 0.5, lambda3 = 0.6, lambda2 = 0.3, lambda1 = 0.1)
        .orderBy(col("doc_id"))
    }),

    // ---- incremental trigram LM: folded batch counts ≡ one-shot model ----
    // Same discipline as t11b/nb2: the training slice arrives as two
    // halves, their count tables fold by SUM, and the oracle is the
    // SAME full-recompute SQL as t16 — integer counts are associative,
    // so the incremental path must reproduce the one-shot scores bit
    // for bit.
    "t16b_incremental_lm3" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        col("source"), col("text"))
      val train = docs.filter(col("source") === "src0")
      val lm = TextAnalysis.foldTrigramLm(
        TextAnalysis.trigramLm(
          train.filter(col("doc_id") % 2 === 0), "text"),
        TextAnalysis.trigramLm(
          train.filter(col("doc_id") % 2 === 1), "text"))
      TextAnalysis.trigramLogProb(docs, "doc_id", "text", lm,
        alpha = 0.5, lambda3 = 0.6, lambda2 = 0.3, lambda1 = 0.1)
        .orderBy(col("doc_id"))
    }),

    // ---- hashed 5-gram LM, stupid backoff (the full CCNet order) ----------
    // CCNet's published filter is a 5-gram KenLM; t16's trigram
    // stopped at the order where marginal derivation is tractable.
    // This is the order-5 path: ONE (n, h, c) count table over
    // md5-hashed 1..5-grams (KenLM itself keys n-grams by hash),
    // scored with Brants-2007 stupid backoff (fixed 0.4 factor per
    // dropped order, add-alpha floor at the unigram). The oracle
    // rebuilds the hashed table and replays every backoff branch to
    // the same integer micros — training counts, the hash, the branch
    // order, the backoff constants, and the per-doc fold all
    // hash-compare.
    "t17_hashed5gram_lm" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        col("source"), col("text"))
      val lm = TextAnalysis.hashedNgramLm(
        docs.filter(col("source") === "src0"), "text")
      TextAnalysis.hashed5gramLogProb(docs, "doc_id", "text", lm,
        alpha = 0.5, backoff = 0.4)
        .orderBy(col("doc_id"))
    }),

    // ---- incremental hashed 5-gram LM: folded counts ≡ one-shot -----------
    // The t11b/t16b discipline one order up: the training slice
    // arrives as two halves, the hashed count tables fold by SUM, and
    // the oracle is the SAME full-recompute SQL as t17 — integer
    // counts are associative, so the incremental path must reproduce
    // the one-shot scores bit for bit.
    "t17b_incremental_lm5" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        col("source"), col("text"))
      val train = docs.filter(col("source") === "src0")
      val lm = TextAnalysis.foldHashedLm(
        TextAnalysis.hashedNgramLm(
          train.filter(col("doc_id") % 2 === 0), "text"),
        TextAnalysis.hashedNgramLm(
          train.filter(col("doc_id") % 2 === 1), "text"))
      TextAnalysis.hashed5gramLogProb(docs, "doc_id", "text", lm,
        alpha = 0.5, backoff = 0.4)
        .orderBy(col("doc_id"))
    }),

    // ---- CCNet head/middle/tail perplexity buckets -------------------------
    // Integer rank-split per language over the t11 scores; the oracle
    // replays the same ROW_NUMBER + integer-division split, so the rank
    // order, tie-break, and bucket boundaries are all hash-pinned.
    "t12_ccnet_buckets" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        col("lang"), col("source"), col("text"))
      val lm = TextAnalysis.bigramLm(
        docs.filter(col("source") === "src0"), "text")
      val scored = TextAnalysis
        .bigramLogProb(docs, "doc_id", "text", lm, alpha = 0.5)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      TextAnalysis.nllRankBuckets(scored, "doc_id", "lang")
        .select(col("doc_id"), col("lang"), col("avg_nll"),
          col("bucket"), col("bucket_label"))
        .orderBy(col("doc_id"))
    }),

    // ---- CCNet buckets re-based on the TRIGRAM LM --------------------------
    // t12's rank-split semantics, driven by the higher-order fluency
    // signal (CCNet's published filter is a 5-gram KenLM; the
    // interpolated trigram is the same machinery one order up from
    // t12's bigram). Same exact integer rank split; the oracle replays
    // trigram training + interpolated scoring + the window split.
    "t12b_trigram_buckets" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        col("lang"), col("source"), col("text"))
      val lm = TextAnalysis.trigramLm(
        docs.filter(col("source") === "src0"), "text")
      val scored = TextAnalysis
        .trigramLogProb(docs, "doc_id", "text", lm,
          alpha = 0.5, lambda3 = 0.6, lambda2 = 0.3, lambda1 = 0.1)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      TextAnalysis.nllRankBuckets(scored, "doc_id", "lang")
        .select(col("doc_id"), col("lang"), col("avg_nll"),
          col("bucket"), col("bucket_label"))
        .orderBy(col("doc_id"))
    }),

    // ---- dataset card (one-call corpus summary) ----------------------------
    // The topline report a curation run publishes: volume, token mass,
    // exact-dup rate, Gopher pass rate, length quantiles, dominant
    // language — ONE output row, every number replayed by the oracle
    // from the shared Gopher/md5/sketch fragments. A drift in any
    // consolidated statistic (a changed stopword list, a hash recipe,
    // a sketch edge) breaks this hash even if the per-operator gates
    // somehow missed it.
    "cd1_dataset_card" -> ((s, d) => {
      Curation.datasetCard(Tables.documents(s, d), "text", "lang")
    }),

    // the same report driven through SQL TEXT (the dataset_card TVF):
    // a SQL-only user gets the one-row corpus summary with zero Scala;
    // shares cd1's oracle, so the TVF argument plumbing and the
    // operator plan both stay pinned
    "sql4_dataset_card" -> ((s, d) => {
      // SQL-escape the spliced dataset path — a quote in a directory
      // name must not become a parse error only in THIS gate
      val p = s"$d/documents.parquet".replace("'", "''")
      s.sql(s"SELECT * FROM dataset_card('$p', 'text', 'lang')")
    }),

    // ---- the order-5 fluency scorer from SQL text --------------------------
    // t17's operator driven through the hashed5_lm_score TABLE
    // function (trained here on the full corpus — the TVF takes a
    // path, not a predicate); the oracle is the same full hashed-table
    // replay with an all-rows training slice, so the SQL surface and
    // the DataFrame surface are pinned to the same micros.
    "sql5_sql_lm5" -> ((s, d) => {
      val p = s"$d/documents.parquet".replace("'", "''")
      s.sql(s"SELECT * FROM hashed5_lm_score('$p', 'doc_id', 'text', " +
        s"'$p', 'text') ORDER BY doc_id")
    }),

    // ---- shard assignment from SQL text ------------------------------------
    // cu20's draws through the shuffle_shards TABLE function; the
    // md5 order key itself is in the output, so the oracle pins the
    // exact draw strings, not just the derived rank.
    "sql6_sql_shards" -> ((s, d) => {
      val p = s"$d/documents.parquet".replace("'", "''")
      s.sql("SELECT doc_id, shard, ord_key FROM shuffle_shards(" +
        s"'$p', 'doc_id', 8) ORDER BY doc_id")
    }),

    // ---- CCNet buckets on the NO-SORT sketch path --------------------------
    // The 100 TB form of t12: per-language thresholds from the
    // deterministic HdrHistogram-bucket quantile sketch (one narrow
    // bucket-count shuffle, no per-group global sort — the step that
    // goes hot when one language is half the corpus), then a monotone
    // threshold-compare assignment. Everything is exact integer
    // arithmetic (micros-per-transition by truncating division, bucket
    // edges by bit ops), so the oracle replays the sketch build, the
    // ceil-rank threshold pick, AND every document's bucket — the full
    // assignment is hash-pinned, not just the histogram.
    "t12c_sketch_buckets" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        col("lang"), col("source"), col("text"))
      val lm = TextAnalysis.bigramLm(
        docs.filter(col("source") === "src0"), "text")
      val scored = TextAnalysis
        .bigramLogProb(docs, "doc_id", "text", lm, alpha = 0.5)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      TextAnalysis.nllSketchBuckets(scored, "doc_id", "lang",
          nBuckets = 3, m = 9)
        .select(col("doc_id"), col("lang"), col("n_transitions"),
          col("nll_micros"), col("bucket"), col("bucket_label"))
        .orderBy(col("doc_id"))
    }),

    // ---- CCNet bucketed SAMPLING (the buckets' end use) --------------------
    // t12c's sketch buckets driven through Wenzek et al.'s selection
    // rule: keep head, hash-sample middle at 50%, drop tail. The
    // oracle replays the whole chain — LM scoring, sketch thresholds,
    // bucket assignment, AND the md5 sampling predicate — so the gate
    // pins the complete scored-corpus → training-mix step.
    "t12d_ccnet_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        col("lang"), col("source"), col("text"))
      val lm = TextAnalysis.bigramLm(
        docs.filter(col("source") === "src0"), "text")
      val scored = TextAnalysis
        .bigramLogProb(docs, "doc_id", "text", lm, alpha = 0.5)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      val bucketed = TextAnalysis.nllSketchBuckets(scored, "doc_id",
        "lang", nBuckets = 3, m = 9)
      Curation.ccnetSample(bucketed, "doc_id", middleRate = 0.5)
        .select(col("doc_id"), col("lang"), col("bucket_label"))
        .orderBy(col("doc_id"))
    }),

    // ---- deterministic shuffle + shard assignment (training shards) -------
    // The last hop of a training-data build: examples reach the
    // trainer in pseudo-random order, balanced across shards, and the
    // SAME id lands at the same position on every run/engine — two
    // domain-separated md5 draws (shard; within-shard order), no
    // global sort. The oracle replays both draws and the rank, so a
    // hash-domain change, a modulo slip, or an order-key collision
    // regression breaks the hash. The writer leg (one file per shard,
    // rows in draw order) is CurationSpec's.
    "cu20_shuffle_shards" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      Curation.shuffleShards(docs, "doc_id", nShards = 8)
        .withColumn("shard_rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("shard"))
            .orderBy(col("__ord"), col("doc_id"))))
        .select(col("doc_id"), col("shard"), col("shard_rank"))
        .orderBy(col("doc_id"))
    }),

    // ---- CCNet buckets over the FULL-ORDER LM (t17 × t12c) ----------------
    // The published CCNet filter is a 5-gram KenLM feeding the
    // head/middle/tail split; t12c proved the sketch-bucket machinery
    // on bigram scores, t17 proved the order-5 scorer — this composes
    // them: hashed 5-gram stupid-backoff scores, bucketed per
    // language via the no-sort sketch path. One oracle replays the
    // hashed table, every backoff branch, the log-bucket sketch, the
    // 1/3-2/3 thresholds, and the assignment.
    "t12e_hashed5_buckets" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        col("lang"), col("source"), col("text"))
      val lm = TextAnalysis.hashedNgramLm(
        docs.filter(col("source") === "src0"), "text")
      // CACHED: the sketch path consumes the scored frame twice
      // (threshold derivation + assignment join), and at order 5 each
      // pass is the full nine-join scorer — materialize once
      val scored = graft.CacheScope.session.cache(TextAnalysis
        .hashed5gramLogProb(docs, "doc_id", "text", lm,
          alpha = 0.5, backoff = 0.4)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")))
      TextAnalysis.nllSketchBuckets(scored, "doc_id", "lang",
          nBuckets = 3, m = 9)
        .select(col("doc_id"), col("lang"), col("n_transitions"),
          col("nll_micros"), col("bucket"), col("bucket_label"))
        .orderBy(col("doc_id"))
    }),

    // ---- per-source quality report (corpus health by domain) --------------
    // Gopher metrics aggregated per source as INTEGER sums and ratios
    // of integer sums — immune to float summation order on both
    // engines. A planted 'srcq' slice (sentence-ized + stopword-rich
    // suffix) makes pass_rate vary across sources.
    "t13_source_quality" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        col("source"), col("text"))
      val planted = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 85000L).as("doc_id"),
          lit("srcq").as("source"),
          concat(replace(col("text"), lit(" value "), lit(".\n")),
            lit(".\nof the data and that batch have with be to end."))
            .as("text"))
      docs.unionByName(planted)
        .withColumn("__g", Curation.gopherReportFused(col("text")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(Curation.gopherPass(col("__g")), 1L).otherwise(0L))
            .as("n_pass"),
          sum(col("__g").getField("word_count")).as("n_words"),
          sum(col("__g").getField("stopword_hits")).as("n_stop_hits"),
          sum(when(col("__g").getField("dup_5gram_char_frac") > 0.15, 1L)
            .otherwise(0L)).as("n_repetitive"))
        .withColumn("pass_rate",
          round(col("n_pass").cast("double") / col("n_docs"), 6))
        .orderBy(col("source"))
    }),

    // ---- BPE tokenizer training: 5 merges over the corpus vocab ----------
    // The corpus collapses to a word-frequency table once; each merge
    // iteration counts adjacent symbol pairs weighted by word freq,
    // fuses the (cnt DESC, lhs, rhs) argmax greedily left-to-right, and
    // recounts. The oracle replays all 5 iterations in pure SQL — the
    // greedy apply via the run-parity window rule — so pair counting,
    // tie-breaks, and the overlap semantics of repeated symbols are
    // hash-pinned iteration by iteration.
    "t14_bpe_merges" -> ((s, d) => {
      val wf = TextAnalysis.bpeWordFreq(
        Tables.documents(s, d).select(col("text")), "text")
      TextAnalysis.bpeTrain(wf, nMerges = 5)(graft.CacheScope.session)
        .orderBy(col("iter"))
    }),

    // ---- BPE encode: segment the vocabulary with the trained merges ------
    // The encoder contract: apply merges in training order. Exported as
    // each word's segmentation + symbol count; the oracle's syms5 CTE
    // (the same chain that trained the merges) IS the expectation, so
    // train→encode consistency is pinned, not just train.
    "t14b_bpe_encode" -> ((s, d) => {
      val wf = TextAnalysis.bpeWordFreq(
        Tables.documents(s, d).select(col("text")), "text")
      val merges = TextAnalysis.bpeTrain(wf, nMerges = 5)(
          graft.CacheScope.session)
        .orderBy(col("iter")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeSegmentWords(wf.select(col("word")), "word", merges)
        .select(col("word"), size(col("syms")).as("n_syms"),
          array_join(col("syms"), " ").as("segmented"))
        .orderBy(col("word"))
    }),

    // ---- production BPE trainer: 30 merges, zero Spark jobs per merge ----
    // bpeTrainLocal is the path that reaches production merge counts:
    // the corpus collapses to the word-frequency table (the only
    // distributed step), then the classic incremental algorithm
    // (inverted pair index + delta-maintained counts) trains on the
    // collapsed vocabulary driver-side. The oracle replays all 30
    // sequential iterations in pure SQL — the same CTE chain as t14 —
    // so the local trainer's counts, argmax order, byte-order
    // tie-breaks, and greedy-apply semantics are hash-pinned at 6x the
    // merge depth of t14.
    "t14c_bpe_train_local" -> ((s, d) => {
      val wf = TextAnalysis.bpeWordFreq(
        Tables.documents(s, d).select(col("text")), "text")
      TextAnalysis.bpeTrainLocal(wf, nMerges = 30)
        .orderBy(col("iter"))
    }),

    // ---- production BPE encoder: imperative rank-ordered segmentation ----
    // bpeEncodeWords (the mapPartitions path bpeSegmentWords dispatches
    // to past 64 merges) segments the corpus vocabulary with the 30
    // local-trained merges. The oracle's syms30 — the same chain that
    // trained the merges — is the expectation, so the rank-heap
    // candidate machinery is hash-pinned against the sequential fold
    // semantics it must reproduce.
    "t14d_bpe_encode_prod" -> ((s, d) => {
      // scope-cached (not manually persisted/unpersisted) for the same
      // reason as t21b: the encode plan executes AFTER construction
      val wf = graft.CacheScope.session.cache(TextAnalysis.bpeWordFreq(
        Tables.documents(s, d).select(col("text")), "text"))
      val merges = TextAnalysis.bpeTrainLocal(wf, nMerges = 30)
        .orderBy(col("iter")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeEncodeWords(wf.select(col("word")),
          "word", merges)
        .select(col("word"), size(col("syms")).as("n_syms"),
          array_join(col("syms"), " ").as("segmented"))
        .orderBy(col("word"))
    }),

    // ---- sentence-snapping chunker (RAG/pretraining chunk prep) ----------
    // Texts get planted sentence boundaries (" value " → ". "), then
    // whole sentences pack greedily into ≤ 12-token chunks — never
    // splitting mid-sentence; an oversized sentence becomes its own
    // chunk. The oracle replays the sentence regex, per-sentence token
    // counts, and the greedy fold via a recursive CTE (packing is
    // prefix-dependent — no window can express it), so boundaries,
    // the budget rule, and chunk text all hash-compare.
    "cu19_sentence_chunks" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        replace(coalesce(col("text"), lit("")), lit(" value "),
          lit(". ")).as("ptext"))
      docs.select(col("doc_id"),
          posexplode(Curation.chunkSentences(col("ptext"),
            maxTokens = 12)).as(Seq("chunk_idx", "chunk")))
        .withColumn("n_tok", size(filter(
          TextAnalysis.tokens(col("chunk")), w => w =!= "")))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // ---- corpus → token-ID sequences (the tokenizer's terminal step) -----
    // Train 30 merges (local trainer), segment the vocabulary, assign
    // byte-order symbol ids, and emit each document's ordered token-ID
    // sequence — what a training-data writer ships. The oracle rebuilds
    // the merge chain, re-ranks the symbol table, and re-derives every
    // document's sequence via ordered string aggregation, so id
    // assignment, per-word symbol order, AND per-doc word order are
    // hash-pinned end to end.
    "t14e_corpus_tokens" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val wf = TextAnalysis.bpeWordFreq(docs, "text")
      val merges = TextAnalysis.bpeTrainLocal(wf, nMerges = 30)
        .orderBy(col("iter")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val (_, perDoc) = TextAnalysis.bpeEncodeCorpus(docs, "doc_id",
        "text", merges)(graft.CacheScope.session)
      perDoc.select(col("doc_id"), col("n_tok"),
          concat_ws(" ", transform(col("token_ids"),
            i => i.cast("string"))).as("token_str"))
        .orderBy(col("doc_id"))
    }),

    // ---- unigram-LM tokenizer (the SentencePiece family, next to BPE) ----
    // Word universe: corpus words plus md5-derived hex words of length
    // 4..24 (the text corpus alone has 31 distinct words — the hex tail
    // makes seed selection, tie-breaks, and the DP chain earn their
    // keep). t18 pins seed-vocabulary selection (substring counts,
    // top-K ties, ln-micro costs); t18b pins the integer Viterbi per
    // word — the oracle REPLAYS the whole DP as a pieces-indexed CTE
    // chain and must land on the same (score_mu, n_pieces); t18c pins
    // the corpus composition (per-doc token counts + exact corpus NLL).
    // EM training (`Unigram.trainLocal`) is spec-pinned in UnigramSpec
    // (likelihood monotonicity, prune protection, determinism) — the
    // bpeTrainLocal contract.
    "t18_unigram_seed" -> ((s, d) => {
      Unigram.seedVocab(t18WordFreq(s, d), vocabSize = 200,
        maxPieceLen = 8).orderBy(col("piece"))
    }),

    "t18b_unigram_segment" -> ((s, d) => {
      Unigram.encodeWords(t18WordFreq(s, d).select(col("word")), "word",
          t18Vocab(s, d))
        .select(col("word"), col("n_pieces"), col("score_mu"))
        .orderBy(col("word"))
    }),

    "t18c_unigram_corpus" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val (_, perDoc) = Unigram.encodeCorpus(docs, "doc_id", "text",
        t18Vocab(s, d))(graft.CacheScope.session)
      perDoc.select(col("doc_id"), col("n_tok"), col("score_mu"))
        .orderBy(col("doc_id"))
    }),

    // ---- WordPiece: the third subword family (BERT's tokenizer) ---------
    // t20 pins vocabulary selection (positional-form substring counts,
    // both-form single coverage, top-K ties); t20b pins the greedy
    // longest-match-first encode per word — the oracle replays every
    // match step as an unrolled CTE chain, so a wrong match length, a
    // kept partial segmentation, or a mis-formed continuation piece is
    // a hash miss; t20c pins the corpus composition (UTF8-ranked token
    // ids, per-doc order, [UNK] accounting).
    "t20_wordpiece_vocab" -> ((s, d) => {
      WordPiece.vocab(t18WordFreq(s, d), vocabSize = 200,
        maxPieceLen = 8).orderBy(col("piece"))
    }),

    "t20b_wordpiece_encode" -> ((s, d) => {
      WordPiece.encodeWords(t18WordFreq(s, d).select(col("word")),
          "word", t20Vocab(s, d))
        .select(col("word"), col("n_pieces"),
          concat_ws(" ", col("pieces")).as("segmented"),
          col("is_unk").cast("int").as("is_unk"))
        .orderBy(col("word"))
    }),

    "t20c_wordpiece_corpus" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val (_, perDoc) = WordPiece.encodeCorpus(docs, "doc_id", "text",
        t20Vocab(s, d))(graft.CacheScope.session)
      perDoc.select(col("doc_id"), col("n_tok"), col("n_unk"),
          concat_ws(" ", transform(col("token_ids"),
            i => i.cast("string"))).as("token_str"))
        .orderBy(col("doc_id"))
    }),

    // ---- fertility over the WordPiece tokenizer -------------------------
    // tokenFertility's tokenizer-agnostic contract in a gate: the SAME
    // report operator over a different (id, n_tok) frame — greedy
    // WordPiece counts instead of the unigram Viterbi's — with the
    // whole alternate chain (positional vocab, greedy encode, per-doc
    // composition, counters, ratios) re-derived in DuckDB.
    "t19b_wordpiece_fertility" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"))
      val wf = TextAnalysis.bpeWordFreq(docs, "text")
      val pieces = graft.CacheScope.withScope { implicit sc =>
        WordPiece.vocab(wf, vocabSize = 200, maxPieceLen = 8)
          .select(col("piece")).collect().map(_.getString(0)).toIndexedSeq
      }
      val (_, perDoc) = WordPiece.encodeCorpus(docs, "doc_id", "text",
        pieces)(graft.CacheScope.session)
      TextAnalysis.tokenFertility(docs, "doc_id", "text", "lang", perDoc)
        .orderBy(col("lang"))
    }),

    // ---- tokenizer comparison card: all four families, one corpus --------
    // The artifact a pipeline team reads when picking a tokenizer:
    // per family (char-BPE 30 merges, byte-BPE 30 merges, unigram-200,
    // WordPiece-200, all trained on THIS corpus — the sql8/sql10
    // one-call posture), vocab size, token totals, unk words,
    // fertility, bytes/token. The oracle re-trains all four models
    // from first principles in ONE query — both 30-step merge chains
    // (prefix-separated), the unigram DP, the greedy WordPiece chain —
    // and replays every per-family stats join, so a drift in ANY
    // family's training, encoding, or the card arithmetic flips the
    // hash.
    "t24_tokenizer_card" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val scope = graft.CacheScope.session
      val wf = TextAnalysis.bpeWordFreq(docs, "text")
      val merges = TextAnalysis.bpeTrainLocal(wf, nMerges = 30)
        .orderBy(col("iter")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val (cv, cp) = TextAnalysis.bpeEncodeCorpus(docs, "doc_id",
        "text", merges)(scope)
      val bmerges = graft.operators.ByteBpe.train(
          graft.operators.ByteBpe.byteWordFreq(docs, "text"), 30)
        .orderBy(col("iter")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val (yv, yp) = graft.operators.ByteBpe.encodeCorpus(docs,
        "doc_id", "text", bmerges)(scope)
      val uvocab = graft.CacheScope.withScope { implicit sc =>
        Unigram.seedVocab(wf, vocabSize = 200, maxPieceLen = 8)
          .select(col("piece"), col("cost_mu")).collect()
          .map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
      }
      val (uv, up) = Unigram.encodeCorpus(docs, "doc_id", "text",
        uvocab)(scope)
      val pieces = graft.CacheScope.withScope { implicit sc =>
        WordPiece.vocab(wf, vocabSize = 200, maxPieceLen = 8)
          .select(col("piece")).collect().map(_.getString(0)).toIndexedSeq
      }
      val (wv, wp) = WordPiece.encodeCorpus(docs, "doc_id", "text",
        pieces)(scope)
      TextAnalysis.tokenizerCard(docs, "doc_id", "text", Seq(
          ("bpe-char", cv.count(), cp),
          ("bpe-byte", yv.count(), yp),
          ("unigram", uv.count(), up),
          ("wordpiece", wv.count(), wp)))
        .orderBy(col("family"))
    }),

    // ---- WordPiece tokenization driven through SQL TEXT (the TVF) -------
    // wordpiece_tokens seeds its vocabulary from the corpus itself (the
    // sql8 posture — the one-call path a SQL user takes), so the oracle
    // rebuilds the positional vocabulary + greedy chain + per-doc
    // composition over text words alone.
    "sql10_sql_wordpiece" -> ((s, d) => {
      val path = GateTmp.dir("graft_wp_docs", d)
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(path)
      s.sql("SELECT doc_id, n_tok, n_unk, concat_ws(' ', " +
        "transform(token_ids, x -> cast(x AS string))) AS token_str " +
        s"FROM wordpiece_tokens('$path', 'doc_id', 'text', 200, 8) " +
        "ORDER BY doc_id")
    }),

    // ---- tokenizer fertility / compression profile per language ---------
    // The tokenizer-evaluation report: per-lang fertility (subword
    // tokens per whitespace word) and bytes-per-token over the
    // corpus-seeded unigram vocabulary. The oracle re-derives the whole
    // chain — seed selection, the Viterbi DP, the per-doc composition,
    // AND the word/byte counters — so the ratios hash-match as exact
    // IEEE divisions of exact long sums.
    "t19_token_fertility" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"))
      val wf = TextAnalysis.bpeWordFreq(docs, "text")
      val vocab = graft.CacheScope.withScope { implicit sc =>
        Unigram.seedVocab(wf, vocabSize = 200, maxPieceLen = 8)
          .select(col("piece"), col("cost_mu")).collect()
          .map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
      }
      val (_, perDoc) = Unigram.encodeCorpus(docs, "doc_id", "text",
        vocab)(graft.CacheScope.session)
      TextAnalysis.tokenFertility(docs, "doc_id", "text", "lang", perDoc)
        .orderBy(col("lang"))
    }),

    // ---- the same tokenize-a-corpus story driven through SQL TEXT -------
    // unigram_tokens seeds its vocabulary from the corpus ITSELF (no
    // hex-word universe here — the TVF is the one-call path a SQL user
    // takes), so the oracle rebuilds seed + DP + per-doc aggregation
    // over text words alone.
    "sql8_sql_unigram" -> ((s, d) => {
      val path = GateTmp.dir("graft_uni_docs", d)
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(path)
      s.sql(s"SELECT doc_id, n_tok, score_mu FROM unigram_tokens(" +
        s"'$path', 'doc_id', 'text', 200, 8) ORDER BY doc_id")
    }),

    // ---- tokenizer-aware packing: pack by BPE token counts ---------------
    // The real training-prep composition: train the tokenizer (t14),
    // segment the VOCABULARY once, join per-word symbol counts back to
    // the corpus word occurrences (never re-segment per occurrence),
    // and pack the per-doc BPE token totals into 2048-token sequences
    // with cu3's two-pass offset machinery. The oracle re-derives the
    // merges, the segmentation, every per-doc count, and the global
    // running offsets.
    "cu18_bpe_pack" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val wf = TextAnalysis.bpeWordFreq(docs, "text")
      val merges = TextAnalysis.bpeTrain(wf, nMerges = 5)(
          graft.CacheScope.session)
        .orderBy(col("iter")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val seg = TextAnalysis.bpeSegmentWords(wf.select(col("word")),
          "word", merges)
        .select(col("word"), size(col("syms")).cast("long").as("n_syms"))
      val docTok = docs
        .select(col("doc_id"), explode_outer(filter(TextAnalysis.tokens(
          coalesce(col("text"), lit(""))), w => w =!= "")).as("word"))
        .join(seg, Seq("word"), "left")
        .groupBy(col("doc_id"))
        .agg(coalesce(sum(col("n_syms")), lit(0L)).as("n_tok"))
      Curation.packSequences(docTok, "doc_id", "n_tok", budget = 2048L)
        .select(col("doc_id"), col("n_tok"), col("start_off"),
          col("first_seq"), col("last_seq"))
        .orderBy(col("doc_id"))
    }),

    // ---- HTML → text extraction (the raw-web front step) -----------------
    // Each doc is wrapped in deterministic HTML (title/style/script
    // head, entity-encoded body, conditional comment block, footer
    // div) and extracted back. The oracle rebuilds the same HTML and
    // replays the strip chain regex by regex, so tag stripping, block
    // newlines, entity decode ORDER (&amp; last), and whitespace
    // normalization are all hash-pinned.
    "cu16_html_extract" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><style>p{color:red}</style>" +
          "<script>var x = 1 < 2;</script></head><body>"),
        when(col("doc_id") % 5 === 0,
          lit("<!-- hidden --><p>&quot;quoted&#39; start</p>"))
          .otherwise(lit("")),
        lit("<p>"),
        replace(coalesce(col("text"), lit("")), lit(" value "),
          lit(" &amp; value &lt;tag&gt; ")),
        lit("</p><div>footer &nbsp;menu</div></body></html>"))
      docs.select(col("doc_id"), Curation.htmlToText(html).as("clean"))
        .orderBy(col("doc_id"))
    }),

    // ---- Moore-Lewis cross-entropy difference selection -------------------
    // In-domain LM on the src0 slice, general LM on everything else;
    // every doc scored under both via ONE tokenize pass. The oracle
    // trains both models and replays both smoothed-ln folds to the
    // same integer micros, so the difference — and the selection
    // decision itself — is hash-pinned.
    "t15_moore_lewis" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        col("source"), col("text"))
      val inLm = TextAnalysis.bigramLm(
        docs.filter(col("source") === "src0"), "text")
      val genLm = TextAnalysis.bigramLm(
        docs.filter(col("source") =!= "src0"), "text")
      TextAnalysis.crossEntropyDiff(docs, "doc_id", "text",
          inLm, genLm, alpha = 0.5)
        .orderBy(col("doc_id"))
    }),

    // ---- byte-level BPE: the GPT-2 family (fourth tokenizer family) -------
    // The byte-map bijection turns ANY UTF-8 text into a 256-char
    // alphabet; the planted multibyte suffixes (Latin-1 accents, CJK,
    // Cyrillic, a 4-byte emoji) force real 2-/3-/4-byte sequences
    // through it. t21 pins 30 training merges over the byte alphabet —
    // the oracle re-derives the byte map from FIRST PRINCIPLES
    // (unicode() code points → UTF-8 encoding arithmetic → the
    // printable/shifted CASE) and replays the sequential merge chain,
    // so the mapping table itself, case preservation, and byte-order
    // tie-breaks are all hash-pinned.
    "t21_bytebpe_train" -> ((s, d) => {
      ByteBpe.train(ByteBpe.byteWordFreq(t21Docs(s, d), "text"),
        nMerges = 30).orderBy(col("iter"))
    }),

    // vocabulary segmentation + the decode leg: `decoded` must equal
    // the ORIGINAL word — the oracle derives it from the pre-map side
    // of its own bmapped table (never touching an inverse map), so a
    // drift anywhere in the encode/decode bijection flips the hash.
    "t21b_bytebpe_encode" -> ((s, d) => {
      // scope-cached so the word-frequency aggregation feeds BOTH the
      // trainer's collect and the returned encode plan (a manual
      // persist/unpersist pair here released the cache before the
      // gate framework ever executed the encode — review finding)
      val wf = graft.CacheScope.session.cache(
        ByteBpe.byteWordFreq(t21Docs(s, d), "text"))
      val merges = ByteBpe.train(wf, nMerges = 30)
        .orderBy(col("iter")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeEncodeWords(wf.select(col("word")),
          "word", merges)
        .select(col("word"),
          ByteMap.byteMapDecode(col("word")).as("decoded"),
          size(col("syms")).as("n_syms"),
          array_join(col("syms"), " ").as("segmented"))
        .orderBy(col("word"))
    }),

    // corpus → token-ID sequences through the byte-level model: id
    // assignment (byte-order symbol ranks), per-word symbol order, and
    // per-doc word order replayed end to end — the t14e contract on
    // the byte alphabet, case-preserving.
    "t21c_bytebpe_corpus" -> ((s, d) => {
      val docs = t21Docs(s, d)
      val wf = ByteBpe.byteWordFreq(docs, "text")
      val merges = ByteBpe.train(wf, nMerges = 30)
        .orderBy(col("iter")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val (_, perDoc) = ByteBpe.encodeCorpus(docs, "doc_id", "text",
        merges)(graft.CacheScope.session)
      perDoc.select(col("doc_id"), col("n_tok"),
          concat_ws(" ", transform(col("token_ids"),
            i => i.cast("string"))).as("token_str"))
        .orderBy(col("doc_id"))
    }),

    // ---- byte-level BPE driven through SQL TEXT (the TVF) -----------------
    // byte_bpe_tokens trains its merges on the corpus itself — the
    // one-call path a SQL user takes; the oracle rebuilds the byte
    // map, the 30-merge chain, and the per-doc composition over the
    // documents table directly.
    "sql12_sql_bytebpe" -> ((s, d) => {
      val path = GateTmp.dir("graft_bb_docs", d)
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(path)
      s.sql("SELECT doc_id, n_tok, concat_ws(' ', " +
        "transform(token_ids, x -> cast(x AS string))) AS token_str " +
        s"FROM byte_bpe_tokens('$path', 'doc_id', 'text', 30) " +
        "ORDER BY doc_id")
    }),

    // ---- stored-model tokenization from SQL (the TVF scale path) --------
    // The loop the training TVFs' cost note points at, closed: train
    // byte-BPE once, persist it through TokenizerStore, and encode via
    // `tokenizer_encode(storeDir, …)` — resolution reads a model-sized
    // table instead of re-training, and ids are the store's frozen
    // ids. Shares sql12's first-principles replay verbatim: the stored
    // model driven through SQL must land on the same tokens as the
    // train-in-the-builder TVF.
    "sql14_sql_store_encode" -> ((s, d) => {
      val path = GateTmp.dir("graft_se_docs", d)
      val store = GateTmp.dir("graft_se_store", d)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      docs.write.mode("overwrite").parquet(path)
      val model = graft.operators.ByteBpe.train(
        graft.operators.ByteBpe.byteWordFreq(docs, "text"), nMerges = 30)
      graft.pipelines.TokenizerStore.save(s, store, "bpe-byte", model)
      s.sql("SELECT doc_id, n_tok, concat_ws(' ', " +
        "transform(token_ids, x -> cast(x AS string))) AS token_str " +
        s"FROM tokenizer_encode('$store', '$path', 'doc_id', 'text') " +
        "ORDER BY doc_id")
    }),

    // ---- the decode TVF: the full roundtrip driven from SQL TEXT ---------
    // A SQL user's inverse path: the space-carrying byte model is
    // persisted, the corpus encodes through tokenizer_encode, the id
    // frame lands in parquet, and tokenizer_decode brings the text
    // back — the oracle is the identity on the planted corpus, so the
    // whole SQL-surface chain carries the same byte-exact contract as
    // t25.
    "sql15_sql_decode" -> ((s, d) => {
      val docs = t25Docs(s, d)
      val store = GateTmp.dir("graft_sd_store", d)
      val docsPath = GateTmp.dir("graft_sd_docs", d)
      val idsPath = GateTmp.dir("graft_sd_ids", d)
      docs.write.mode("overwrite").parquet(docsPath)
      val model = ByteBpe.train(ByteBpe.byteWordFreqSp(docs, "text"),
        nMerges = 30)
      graft.pipelines.TokenizerStore.save(s, store, "bpe-byte-sp",
        model)
      s.sql(s"SELECT doc_id, token_ids FROM tokenizer_encode(" +
          s"'$store', '$docsPath', 'doc_id', 'text')")
        .write.mode("overwrite").parquet(idsPath)
      s.sql(s"SELECT doc_id, decoded FROM tokenizer_decode('$store', " +
        s"'$idsPath', 'doc_id', 'token_ids') ORDER BY doc_id")
    }),

    // ---- persisted tokenizer model: save → load → encode ≡ in-memory ----
    // The store path must reproduce t21c exactly: train the byte-level
    // merges, persist them (model first, format marker last), then
    // encode the corpus THROUGH the store's family dispatch. The
    // oracle is t21c's replay verbatim — a drift anywhere in
    // save/load/dispatch flips the hash against the already-trusted
    // first-principles chain.
    "t23_tokenizer_store" -> ((s, d) => {
      val docs = t21Docs(s, d)
      val wf = ByteBpe.byteWordFreq(docs, "text")
      val merges = ByteBpe.train(wf, nMerges = 30)
      val dir = GateTmp.dir("graft_tok_store", d)
      graft.pipelines.TokenizerStore.save(s, dir, "bpe-byte", merges)
      val (_, perDoc) = graft.pipelines.TokenizerStore.encodeCorpus(
        s, dir, docs, "doc_id", "text")(graft.CacheScope.session)
      perDoc.select(col("doc_id"), col("n_tok"),
          concat_ws(" ", transform(col("token_ids"),
            i => i.cast("string"))).as("token_str"))
        .orderBy(col("doc_id"))
    }),

    // ---- char-BPE store with an ALPHABET SNAPSHOT: frozen ids ------------
    // The last id-drift hole closed: char-BPE's base alphabet is the
    // corpus's script inventory, which the merge list cannot bound —
    // so the store snapshots the TRAINING alphabet and ids become the
    // UTF8 rank in (alphabet ∪ merge outputs), a pure function of the
    // model (the byte family's posture brought to the char family).
    // The oracle re-derives the alphabet from first principles (the
    // distinct base symbols of the word decomposition), re-runs the 30
    // merges, and ranks the FROZEN table — so id assignment drifting
    // back to corpus-used ranking is a hash miss.
    "t23b_store_frozen_char" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val wf = TextAnalysis.bpeWordFreq(docs, "text")
      val model = TextAnalysis.bpeTrainLocal(wf, nMerges = 30)
      val dir = GateTmp.dir("graft_tok_store_c", d)
      import s.implicits._
      graft.pipelines.TokenizerStore.save(s, dir, "bpe", model,
        alphabet = Some(TextAnalysis.bpeAlphabet(wf).toDF("sym")))
      val (_, perDoc) = graft.pipelines.TokenizerStore.encodeCorpus(
        s, dir, docs, "doc_id", "text")(graft.CacheScope.session)
      perDoc.select(col("doc_id"), col("n_tok"),
          concat_ws(" ", transform(col("token_ids"),
            i => i.cast("string"))).as("token_str"))
        .orderBy(col("doc_id"))
    }),

    // ---- tokenizer DECODE: the lossless roundtrip contract ---------------
    // The inverse leg the tokenizer stack was missing: train a
    // SPACE-CARRYING byte-level model (the GPT-2 pre-tokenizer proper
    // — each token keeps its leading whitespace, so the id stream
    // PARTITIONS the text), persist it, encode the planted multibyte
    // corpus through the store, decode through the store — and the
    // output must be the input text byte-for-byte, across 2-, 3-, and
    // 4-byte UTF-8. The oracle is the identity on the planted text:
    // decode(encode(text)) == text IS the check, end to end — any
    // drift anywhere in pre-tokenize / merge-apply / id-assign /
    // id-invert / byte-unmap flips the hash.
    "t25_decode_roundtrip" -> ((s, d) => {
      val docs = t25Docs(s, d)
      val wf = ByteBpe.byteWordFreqSp(docs, "text")
      val merges = ByteBpe.train(wf, nMerges = 30)
      val dir = GateTmp.dir("graft_tok_store_sp", d)
      graft.pipelines.TokenizerStore.save(s, dir, "bpe-byte-sp", merges)
      val (_, perDoc) = graft.pipelines.TokenizerStore.encodeCorpus(
        s, dir, docs, "doc_id", "text")(graft.CacheScope.session)
      graft.pipelines.TokenizerStore.decodeCorpus(s, dir, perDoc,
          "token_ids")
        .select(col("doc_id"), col("decoded"))
        .orderBy(col("doc_id"))
    }),

    // ---- WordPiece decode: boundary-marked reconstruction ----------------
    // The one family whose flat id stream still carries word
    // boundaries (BERT's ## convention) decodes back to the
    // space-joined lowercased word form, unencodable words as [UNK].
    // The oracle replays the DECODE ITSELF piece by piece (the
    // ##-strip / space-insert walk over the replayed segmentation in
    // (wpos, k) order), not a word-level shortcut — so the marker
    // convention, [UNK] substitution, and word-order composition are
    // all hash-pinned against the already-trusted t20 chain.
    "t25b_wordpiece_decode" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val vocab = t20Vocab(s, d)
      val (_, perDoc) = WordPiece.encodeCorpus(docs, "doc_id", "text",
        vocab)(graft.CacheScope.session)
      WordPiece.decodeCorpus(perDoc, "token_ids", vocab)
        .select(col("doc_id"), col("decoded"))
        .orderBy(col("doc_id"))
    }),

    // ---- span corruption: T5-style denoising example construction --------
    // Token ids are hashed word ids (md5-32bit % 50000 — keeps the
    // oracle focused on the corruption algorithm, not a tokenizer
    // chain); window=8/span=2 gives several spans per template doc.
    // The oracle re-derives every hashed token id, every per-window
    // md5 offset draw, the keep/sentinel/drop disposition per
    // position, and both output sequences via ordered aggregation —
    // sentinel numbering, span boundaries, and the ragged-tail rule
    // are all hash-pinned.
    "cu21_span_corrupt" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        transform(
          filter(TextAnalysis.tokens(coalesce(col("text"), lit(""))),
            w => w =!= ""),
          w => pmod(conv(substring(md5(concat(lit("tok|"), w)), 1, 8),
            16, 10).cast("long"), lit(50000L))).as("tok_ids"))
      Curation.spanCorrupt(docs, "doc_id", "tok_ids", window = 8,
          span = 2, sentinelBase = 50000L, seed = "t5",
          validateIds = true)
        .select(col("doc_id"), col("n_tok"), col("n_spans"),
          col("n_masked"),
          concat_ws(" ", transform(col("inputs"),
            x => x.cast("string"))).as("input_str"),
          concat_ws(" ", transform(col("targets"),
            x => x.cast("string"))).as("target_str"))
        .orderBy(col("doc_id"))
    }),
  )

  /** dsir1/dsir2 oracle: full-recompute of the DSIR weight path —
    * featurization, both bucket-count tables, smoothed integer-micros
    * ratios, per-doc sums. dsir2 scores against FOLDED incremental
    * counts; additive integers make that bit-identical to this one-shot
    * expectation. */
  private def dsirOracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
      |  FROM documents WHERE text IS NOT NULL),
      |feats AS (
      |  SELECT doc_id, f FROM (
      |    SELECT doc_id, unnest(ws) AS f FROM toks
      |    UNION ALL
      |    SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS f
      |    FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)) u
      |  WHERE f <> ''),
      |fb AS (
      |  SELECT doc_id,
      |    CAST('0x' || substr(md5(f), 1, 15) AS BIGINT) % 1024 AS b
      |  FROM feats),
      |tc AS (
      |  SELECT b, count(*) AS t_ct FROM fb
      |  JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY b),
      |rc AS (SELECT b, count(*) AS r_ct FROM fb GROUP BY b),
      |tot AS (
      |  SELECT (SELECT COALESCE(SUM(t_ct), 0) FROM tc) AS t_n,
      |         (SELECT COALESCE(SUM(r_ct), 0) FROM rc) AS r_n),
      |ratios AS (
      |  SELECT sp.b,
      |    CAST(round((ln((COALESCE(tc.t_ct, 0) + 1.0)
      |        / (tot.t_n + 1024.0))
      |      - ln((COALESCE(rc.r_ct, 0) + 1.0) / (tot.r_n + 1024.0)))
      |      * 1000000.0) AS BIGINT) AS lr_micros
      |  FROM range(0, 1024) sp(b)
      |  LEFT JOIN tc ON sp.b = tc.b LEFT JOIN rc ON sp.b = rc.b
      |  CROSS JOIN tot),
      |sc AS (
      |  SELECT doc_id, count(*) AS n_feats, SUM(lr_micros) AS w_micros
      |  FROM fb JOIN ratios ON fb.b = ratios.b GROUP BY doc_id)
      |SELECT d.doc_id, COALESCE(sc.n_feats, 0) AS n_feats,
      |  COALESCE(sc.w_micros, 0) / 1000000.0 AS weight
      |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
      |ORDER BY d.doc_id""".stripMargin

  def oracles: Map[String, String] = Map(
    "d7_dup_clusters" ->
      s"""WITH RECURSIVE $d7CorpusSql,
         |${LlmQueries.shinglesCte("alldocs")},
         |pairs AS (
         |  ${LlmQueries.jaccardPairsSql(0.7)}),
         |edges AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs WHERE jaccard >= 0.7
         |  UNION
         |  SELECT id_b, id_a FROM pairs WHERE jaccard >= 0.7),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
         |labels AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
         |SELECT d.doc_id,
         |  COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
         |  COALESCE(l.cluster_id, d.doc_id) = d.doc_id AS is_kept
         |FROM alldocs d LEFT JOIN labels l ON l.id = d.doc_id
         |ORDER BY doc_id""".stripMargin,

    "cr1_cluster_reps" ->
      s"""WITH RECURSIVE $d7CorpusSql,
         |${LlmQueries.shinglesCte("alldocs")},
         |pairs AS (
         |  ${LlmQueries.jaccardPairsSql(0.7)}),
         |edges AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs WHERE jaccard >= 0.7
         |  UNION
         |  SELECT id_b, id_a FROM pairs WHERE jaccard >= 0.7),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
         |labels AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |cl AS (
         |  SELECT d.doc_id,
         |    COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
         |    len(string_split_regex(lower(trim(d.text)), '\\s+')) AS ord
         |  FROM alldocs d LEFT JOIN labels l ON l.id = d.doc_id),
         |rep AS (
         |  SELECT cluster_id, doc_id AS rep_id FROM (
         |    SELECT cluster_id, doc_id,
         |      ROW_NUMBER() OVER (PARTITION BY cluster_id
         |        ORDER BY ord DESC, doc_id) AS rk
         |    FROM cl) t
         |  WHERE rk = 1)
         |SELECT cl.doc_id, cl.cluster_id, rep.rep_id,
         |  cl.doc_id = rep.rep_id AS is_rep
         |FROM cl JOIN rep USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,

    "cu1_hash_sample" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE md5(CAST(doc_id AS VARCHAR)) < '19a'
        |ORDER BY doc_id""".stripMargin,

    "cu2_source_cap" ->
      """SELECT source, CAST(rank AS INTEGER) AS rank, doc_id, n_chars
        |FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents) t
        |WHERE rank <= 5 ORDER BY source, rank""".stripMargin,

    "cu3_pack_sequences" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(lower(trim(text)), '\s+'))
        |      AS BIGINT) AS n_tok
        |  FROM documents),
        |off AS (
        |  SELECT doc_id, n_tok,
        |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS start_off
        |  FROM tok)
        |SELECT doc_id, n_tok, start_off,
        |  CAST(FLOOR(start_off / 2048) AS BIGINT) AS first_seq,
        |  GREATEST(CAST(FLOOR(start_off / 2048) AS BIGINT),
        |    CAST(FLOOR((start_off + n_tok - 1) / 2048) AS BIGINT))
        |    AS last_seq
        |FROM off ORDER BY doc_id""".stripMargin,

    "cu4_pii_redact" -> {
      val em = Curation.emailRe
      val ph = Curation.phoneRe
      s"""WITH pii AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 11 = 0
         |      THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
         |        || '@example.com or +1-555-01'
         |        || CAST(doc_id % 100 AS VARCHAR) || '2 today'
         |      ELSE text END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$em')) AS INTEGER)
         |    AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$ph')) AS INTEGER)
         |    AS n_phones,
         |  regexp_replace(regexp_replace(text, '$em', '<EMAIL>', 'g'),
         |    '$ph', '<PHONE>', 'g') AS clean
         |FROM pii ORDER BY doc_id""".stripMargin
    },

    "cu6_hash_split" -> {
      val v = Curation.rateBound(0.05)
      val t = Curation.rateBound(0.1)
      s"""SELECT doc_id,
         |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '$v' THEN 'val'
         |       WHEN md5(CAST(doc_id AS VARCHAR)) < '$t' THEN 'test'
         |       ELSE 'train' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "d8_star_clusters" ->
      """SELECT doc_id AS id,
        |  CAST((doc_id // 100) * 100 AS BIGINT) AS cluster_id
        |FROM documents ORDER BY id""".stripMargin,

    "cu11_group_sample" ->
      """SELECT source, rank, doc_id FROM (
        |  SELECT source, doc_id, CAST(row_number() OVER (
        |    PARTITION BY source ORDER BY
        |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |        AS UBIGINT), doc_id) AS INT) AS rank
        |  FROM documents)
        |WHERE rank <= 7
        |ORDER BY source, rank""".stripMargin,

    "cu13_weighted_sample" ->
      """SELECT source, rank, doc_id FROM (
        |  SELECT source, doc_id, CAST(row_number() OVER (
        |    PARTITION BY source ORDER BY
        |      ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |        AS UBIGINT) + 0.5) / 4294967296.0)
        |      / strlen(text) DESC, doc_id) AS INT) AS rank
        |  FROM documents WHERE strlen(text) > 0)
        |WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin,

    "cu9_boilerplate" ->
      """WITH docs AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN chr(10) || 'subscribe to our newsletter for updates'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'ok' ELSE '' END
        |    AS text
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, unnest(sl) AS line,
        |    unnest(range(1, len(sl) + 1)) AS pos
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS sl
        |        FROM docs)),
        |n AS (SELECT doc_id, pos, line, lower(trim(line)) AS norm FROM l),
        |hot AS (
        |  SELECT norm FROM (
        |    SELECT norm, COUNT(DISTINCT doc_id) AS nd FROM n
        |    WHERE length(norm) >= 10 GROUP BY norm)
        |  WHERE nd > 50),
        |kept AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
        |    COUNT(*) AS k
        |  FROM n WHERE norm NOT IN (SELECT norm FROM hot)
        |  GROUP BY doc_id),
        |tot AS (SELECT doc_id,
        |  len(string_split(text, chr(10))) AS t FROM docs)
        |SELECT tot.doc_id, COALESCE(kept.text, '') AS text,
        |  CAST(tot.t - COALESCE(kept.k, 0) AS BIGINT) AS n_removed
        |FROM tot LEFT JOIN kept USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "cu10_domain_mix" ->
      """WITH w(source, tw) AS (
        |  VALUES ('src0', CAST(1.0 AS DOUBLE)),
        |         ('src1', CAST(3.0 AS DOUBLE)),
        |         ('src2', CAST(2.0 AS DOUBLE))),
        |avail AS (
        |  SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS a
        |  FROM documents JOIN w USING (source) GROUP BY source),
        |tt AS (SELECT MIN(a / tw) AS t FROM avail JOIN w USING (source)),
        |r AS (
        |  SELECT w.source,
        |    LEAST(CAST(1.0 AS DOUBLE), tw * tt.t / a) AS rate
        |  FROM w JOIN avail USING (source), tt),
        |b AS (
        |  SELECT source,
        |    CASE WHEN round(rate * 4096) >= 4096 THEN 'g'
        |         ELSE printf('%03x', CAST(round(rate * 4096) AS INT)) END
        |      AS bound
        |  FROM r)
        |SELECT doc_id, source, n_chars
        |FROM documents JOIN b USING (source)
        |WHERE md5(CAST(doc_id AS VARCHAR)) < bound
        |ORDER BY doc_id""".stripMargin,

    // cu10's water-filling replay with the targets themselves derived
    // in SQL: tw = sqrt(per-source mass), T = 2
    "cu17_temperature_mix" ->
      """WITH avail AS (
        |  SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS a
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, sqrt(a) AS tw, a FROM avail),
        |tt AS (SELECT MIN(a / tw) AS t FROM w),
        |r AS (
        |  SELECT source,
        |    LEAST(CAST(1.0 AS DOUBLE), tw * tt.t / a) AS rate
        |  FROM w, tt),
        |b AS (
        |  SELECT source,
        |    CASE WHEN round(rate * 4096) >= 4096 THEN 'g'
        |         ELSE printf('%03x', CAST(round(rate * 4096) AS INT)) END
        |      AS bound
        |  FROM r)
        |SELECT doc_id, source, n_chars
        |FROM documents JOIN b USING (source)
        |WHERE md5(CAST(doc_id AS VARCHAR)) < bound
        |ORDER BY doc_id""".stripMargin,

    "cu7_stratified_sample" -> {
      val en = Curation.rateBound(0.05)
      val de = Curation.rateBound(0.5)
      val other = Curation.rateBound(0.2)
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE md5(CAST(doc_id AS VARCHAR)) <
         |  CASE WHEN lang = 'en' THEN '$en'
         |       WHEN lang = 'de' THEN '$de' ELSE '$other' END
         |ORDER BY doc_id""".stripMargin
    },

    "t3_repetition" ->
      """WITH rdocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 60000, text || ' ' || text
        |  FROM documents WHERE doc_id % 31 = 0),
        |w AS (
        |  SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS ws
        |  FROM rdocs),
        |g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(ws)),
        |      i -> ws[i] || ' ' || ws[i+1]) AS g2,
        |    list_transform(range(1, len(ws) - 1),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g3
        |  FROM w),
        |f AS (
        |  SELECT doc_id,
        |    CASE WHEN len(g2) > 0 THEN round(1.0 -
        |      CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6)
        |      ELSE 0.0 END AS dup_2gram_frac,
        |    CASE WHEN len(g3) > 0 THEN round(1.0 -
        |      CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 6)
        |      ELSE 0.0 END AS dup_3gram_frac
        |  FROM g)
        |SELECT doc_id, dup_2gram_frac, dup_3gram_frac,
        |  dup_2gram_frac > 0.1 AS is_repetitive
        |FROM f ORDER BY doc_id""".stripMargin,

    "cu8_chunking" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, ws,
        |    list_filter(range(0, len(ws), 24),
        |      st -> st = 0 OR st + 8 < len(ws)) AS starts
        |  FROM w)
        |SELECT doc_id, i - 1 AS chunk_idx,
        |  array_to_string(ws[starts[i] + 1 : starts[i] + 32], ' ')
        |    AS chunk_text
        |FROM c, unnest(generate_series(1, len(starts))) AS t(i)
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "t4_top_terms" ->
      """SELECT term, count(*) AS n FROM (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
        |    AS term
        |  FROM documents) t
        |GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin,

    "t7_tfidf_terms" ->
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |    FROM documents) t
        |  WHERE term <> ''
        |  GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (
        |  SELECT tf.doc_id, tf.term,
        |    round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6)
        |      AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, score FROM (
        |  SELECT doc_id, term, score,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term) AS rank
        |  FROM sc)
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "dsir1_importance_weights" -> dsirOracleSql,
    // identical full-recompute expectation: folded incremental counts
    // must reproduce the one-shot weights exactly
    "dsir2_incremental_weights" -> dsirOracleSql,

    "t9_domain_terms" ->
      """WITH tf AS (
        |  SELECT source, term, count(*) AS tf FROM (
        |    SELECT source,
        |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |    FROM documents) t
        |  WHERE term <> ''
        |  GROUP BY source, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(DISTINCT source) AS n_groups FROM documents),
        |sc AS (
        |  SELECT tf.source, tf.term,
        |    round(tf.tf * (ln((n.n_groups + 1.0) / (df.df + 1.0)) + 1.0), 6)
        |      AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT source, CAST(rank AS INTEGER) AS rank, term, score FROM (
        |  SELECT source, term, score,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY score DESC, term) AS rank
        |  FROM sc)
        |WHERE rank <= 5 ORDER BY source, rank""".stripMargin,

    "t8_bm25_search" -> {
      // derived constants interpolated from the SAME Scala doubles the
      // engine folds into its plan — "k1 + 1.0" re-typed in SQL could
      // parse to a different double than the computed sum
      val k1 = 1.2; val b = 0.75
      val c1 = (k1 + 1.0).toString; val c2 = k1.toString
      val c3 = (1.0 - b).toString; val c4 = b.toString
      s"""WITH tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM (
         |    SELECT doc_id,
         |      unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
         |    FROM documents) t
         |  WHERE term <> '' GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
         |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |g AS (SELECT
         |  (SELECT CAST(SUM(dl) AS DOUBLE) FROM dl)
         |    / (SELECT count(*) FROM documents) AS avgdl,
         |  (SELECT count(*) FROM documents) AS n_docs),
         |q AS (
         |  SELECT doc_id AS qid,
         |    array_to_string(
         |      string_split_regex(lower(trim(text)), '\\s+')[1:5], ' ')
         |      AS qtext
         |  FROM documents WHERE doc_id < 3),
         |qt AS (
         |  SELECT DISTINCT qid, term FROM (
         |    SELECT qid,
         |      unnest(string_split_regex(lower(trim(qtext)), '\\s+')) AS term
         |    FROM q) t
         |  WHERE term <> ''),
         |sc AS (
         |  SELECT qt.qid, tf.doc_id,
         |    SUM(CAST(round(
         |      ln((g.n_docs - dfx.df + CAST(0.5 AS DOUBLE))
         |         / (dfx.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
         |      * (tf.tf * CAST($c1 AS DOUBLE))
         |      / (tf.tf + CAST($c2 AS DOUBLE) * (CAST($c3 AS DOUBLE)
         |         + CAST($c4 AS DOUBLE) * dl.dl / g.avgdl))
         |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT)) AS score_micros
         |  FROM qt JOIN tf USING (term) JOIN dfx USING (term)
         |    JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN g
         |  GROUP BY 1, 2)
         |SELECT qid, CAST(rank AS INTEGER) AS rank, doc_id,
         |  score_micros / CAST(1000000.0 AS DOUBLE) AS score
         |FROM (SELECT qid, doc_id, score_micros,
         |  ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY score_micros DESC, doc_id) AS rank FROM sc)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
    },

    // identical replay: the store answers t8's queries from persisted
    // postings; ground truth is the same from-scratch BM25 over ALL
    // documents (seed ∪ b1 = the whole table)
    "ir1_index_store" -> {
      val k1 = 1.2; val b = 0.75
      val c1 = (k1 + 1.0).toString; val c2 = k1.toString
      val c3 = (1.0 - b).toString; val c4 = b.toString
      s"""WITH tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM (
         |    SELECT doc_id,
         |      unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
         |    FROM documents) t
         |  WHERE term <> '' GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
         |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |g AS (SELECT
         |  (SELECT CAST(SUM(dl) AS DOUBLE) FROM dl)
         |    / (SELECT count(*) FROM documents) AS avgdl,
         |  (SELECT count(*) FROM documents) AS n_docs),
         |q AS (
         |  SELECT doc_id AS qid,
         |    array_to_string(
         |      string_split_regex(lower(trim(text)), '\\s+')[1:5], ' ')
         |      AS qtext
         |  FROM documents WHERE doc_id < 3),
         |qt AS (
         |  SELECT DISTINCT qid, term FROM (
         |    SELECT qid,
         |      unnest(string_split_regex(lower(trim(qtext)), '\\s+')) AS term
         |    FROM q) t
         |  WHERE term <> ''),
         |sc AS (
         |  SELECT qt.qid, tf.doc_id,
         |    SUM(CAST(round(
         |      ln((g.n_docs - dfx.df + CAST(0.5 AS DOUBLE))
         |         / (dfx.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
         |      * (tf.tf * CAST($c1 AS DOUBLE))
         |      / (tf.tf + CAST($c2 AS DOUBLE) * (CAST($c3 AS DOUBLE)
         |         + CAST($c4 AS DOUBLE) * dl.dl / g.avgdl))
         |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT)) AS score_micros
         |  FROM qt JOIN tf USING (term) JOIN dfx USING (term)
         |    JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN g
         |  GROUP BY 1, 2)
         |SELECT qid, CAST(rank AS INTEGER) AS rank, doc_id,
         |  score_micros / CAST(1000000.0 AS DOUBLE) AS score
         |FROM (SELECT qid, doc_id, score_micros,
         |  ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY score_micros DESC, doc_id) AS rank FROM sc)
         |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
    },

    "sql2_sql_retrieval" -> {
      // same derived-constant discipline as t8: interpolate the exact
      // Scala doubles the engine folds
      val k1 = 1.2; val b = 0.75
      val c1 = (k1 + 1.0).toString; val c2 = k1.toString
      val c3 = (1.0 - b).toString; val c4 = b.toString
      s"""WITH tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM (
         |    SELECT doc_id,
         |      unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
         |    FROM documents) t
         |  WHERE term <> '' GROUP BY doc_id, term),
         |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
         |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |g AS (SELECT
         |  (SELECT CAST(SUM(dl) AS DOUBLE) FROM dl)
         |    / (SELECT count(*) FROM documents) AS avgdl,
         |  (SELECT count(*) FROM documents) AS n_docs),
         |qt AS (
         |  SELECT DISTINCT term FROM (
         |    SELECT unnest(string_split_regex(
         |      'spark hash join window', '\\s+')) AS term) t
         |  WHERE term <> ''),
         |sc AS (
         |  SELECT tf.doc_id,
         |    SUM(CAST(round(
         |      ln((g.n_docs - dfx.df + CAST(0.5 AS DOUBLE))
         |         / (dfx.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
         |      * (tf.tf * CAST($c1 AS DOUBLE))
         |      / (tf.tf + CAST($c2 AS DOUBLE) * (CAST($c3 AS DOUBLE)
         |         + CAST($c4 AS DOUBLE) * dl.dl / g.avgdl))
         |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT)) AS score_micros
         |  FROM qt JOIN tf USING (term) JOIN dfx USING (term)
         |    JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN g
         |  GROUP BY 1)
         |SELECT CAST(rank AS INTEGER) AS rank, doc_id,
         |  score_micros / CAST(1000000.0 AS DOUBLE) AS score
         |FROM (SELECT doc_id, score_micros,
         |  ROW_NUMBER() OVER (
         |    ORDER BY score_micros DESC, doc_id) AS rank FROM sc)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin
    },

    "cm1_countmin_freq" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
        |    AS term
        |  FROM documents),
        |cells AS (
        |  SELECT r AS depth,
        |    CAST('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || term),
        |      1, 15) AS BIGINT) % 512 AS bkt,
        |    count(*) AS cnt
        |  FROM toks, unnest([0, 1, 2, 3]) AS t(r)
        |  GROUP BY 1, 2),
        |probes AS (
        |  SELECT term, n_exact FROM (
        |    SELECT term, count(*) AS n_exact FROM toks GROUP BY term
        |    ORDER BY n_exact DESC, term LIMIT 10)
        |  UNION ALL SELECT '__absent_probe__', 0),
        |pe AS (
        |  SELECT p.term, p.n_exact, r AS depth,
        |    CAST('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || p.term),
        |      1, 15) AS BIGINT) % 512 AS bkt
        |  FROM probes p, unnest([0, 1, 2, 3]) AS t(r)),
        |est AS (
        |  SELECT pe.term, pe.n_exact, min(coalesce(c.cnt, 0)) AS est
        |  FROM pe LEFT JOIN cells c
        |    ON c.depth = pe.depth AND c.bkt = pe.bkt
        |  GROUP BY 1, 2)
        |SELECT term, n_exact, est, est >= n_exact AS overcount_ok
        |FROM est ORDER BY term""".stripMargin,

    "t6_heavy_hitters" ->
      """SELECT term, n_exact, true AS under_est, true AS in_bound FROM (
        |  SELECT term, count(*) AS n_exact FROM (
        |    SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
        |      AS term
        |    FROM documents) t
        |  GROUP BY term ORDER BY n_exact DESC, term LIMIT 10)
        |ORDER BY n_exact DESC, term""".stripMargin,

    "cu5_decontam" ->
      """WITH bench AS (
        |  SELECT text FROM documents WHERE doc_id % 97 = 0),
        |corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
        |  UNION ALL
        |  SELECT doc_id + 50000, text FROM documents WHERE doc_id % 97 = 0),
        |bw AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS w
        |       FROM bench),
        |bg AS (SELECT DISTINCT unnest(list_transform(range(1, len(w) - 3),
        |         i -> array_to_string(w[i:i+4], ' '))) AS g
        |       FROM bw),
        |cw AS (SELECT doc_id,
        |         string_split_regex(lower(trim(text)), '\s+') AS w
        |       FROM corpus),
        |cg AS (SELECT DISTINCT doc_id, g FROM (
        |         SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
        |           i -> array_to_string(w[i:i+4], ' '))) AS g
        |         FROM cw) t),
        |hits AS (SELECT doc_id, count(*) AS n
        |         FROM cg JOIN bg USING (g) GROUP BY doc_id)
        |SELECT c.doc_id,
        |  COALESCE(h.n, 0) AS n_contaminated_grams,
        |  COALESCE(h.n, 0) >= 3 AS is_contaminated
        |FROM corpus c LEFT JOIN hits h USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // brute-force replay: every corpus×bench cosine in doubles (the d5
    // sequential list_sum pattern), thresholded, aggregated per row
    "cu15_semantic_decontam" ->
      """WITH corp AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
        |    AS v
        |  FROM embeddings),
        |bench AS (
        |  SELECT vec_id + 20000 AS bench_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.001) AS v
        |  FROM embeddings WHERE vec_id % 25 = 0),
        |cn AS (
        |  SELECT vec_id, v,
        |    sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))
        |      AS nv
        |  FROM corp),
        |bn AS (
        |  SELECT bench_id, v,
        |    sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))
        |      AS nv
        |  FROM bench),
        |hits AS (
        |  SELECT c.vec_id, count(*) AS n_benchmark_matches,
        |    max(list_sum(list_transform(range(1, 65),
        |      i -> c.v[i] * b.v[i])) / (c.nv * b.nv)) AS max_cosine
        |  FROM cn c, bn b
        |  WHERE list_sum(list_transform(range(1, 65),
        |      i -> c.v[i] * b.v[i])) / (c.nv * b.nv) >= 0.999
        |  GROUP BY c.vec_id)
        |SELECT c.vec_id,
        |  COALESCE(h.n_benchmark_matches, 0) AS n_benchmark_matches,
        |  h.max_cosine,
        |  COALESCE(h.n_benchmark_matches, 0) > 0 AS is_contaminated
        |FROM corp c LEFT JOIN hits h USING (vec_id)
        |ORDER BY vec_id""".stripMargin,

    // Full first-principles recompute of the Gopher report: per-doc
    // scalars from list lambdas, line/gram duplicate-char masses from
    // unnest + GROUP BY (the engine uses per-row sorted run folds —
    // deliberately different shape), top-gram argmax pinned to the same
    // (count DESC, gram ASC) tie-break the fold's sorted-first-wins
    // implements. The metric chain is the shared OracleFragments copy
    // (also gating t13 and c2).
    "t10_gopher_quality" ->
      s"""WITH rdocs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 60000, text || ' ' || text
         |  FROM documents WHERE doc_id % 31 = 0
         |  UNION ALL
         |  SELECT doc_id + 70000, replace(text, ' table ', chr(10) || '- ')
         |  FROM documents WHERE doc_id % 41 = 0
         |  UNION ALL
         |  SELECT doc_id + 80000, text || ' # # # # # # # #'
         |  FROM documents WHERE doc_id % 53 = 0),
         |${OracleFragments.gopherCtes("rdocs", "text")}
         |SELECT * FROM gfp ORDER BY doc_id""".stripMargin,

    // Line-rule recompute: same list-lambda split/trim/filter chain,
    // page rules from the raw text.
    "cu14_line_clean" ->
      """WITH rdocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 90000,
        |    replace(text, ' value ', '.' || chr(10)) || '.'
        |  FROM documents WHERE doc_id % 13 = 0
        |  UNION ALL
        |  SELECT doc_id + 95000,
        |    replace(text, ' value ', '.' || chr(10)) || '.' || chr(10)
        |      || 'enable javascript to continue.'
        |  FROM documents WHERE doc_id % 29 = 0
        |  UNION ALL
        |  SELECT doc_id + 97000,
        |    replace(text, ' value ', '.' || chr(10)) || '.' || chr(10)
        |      || 'lorem ipsum dolor sit amet.'
        |  FROM documents WHERE doc_id % 37 = 0
        |  UNION ALL
        |  SELECT doc_id + 98000,
        |    replace(text, ' value ', '.' || chr(10)) || '. {'
        |  FROM documents WHERE doc_id % 43 = 0),
        |l AS (
        |  SELECT doc_id, coalesce(text, '') AS t,
        |    list_filter(list_transform(
        |      string_split(coalesce(text, ''), chr(10)), x -> trim(x)),
        |      x -> x <> '') AS ls
        |  FROM rdocs),
        |k AS (
        |  SELECT doc_id, t, ls,
        |    list_filter(ls, x ->
        |      (x LIKE '%.' OR x LIKE '%!' OR x LIKE '%?'
        |        OR x LIKE '%"')
        |      AND len(list_filter(string_split_regex(x, '\s+'),
        |        w -> w <> '')) >= 3
        |      AND NOT contains(lower(x), 'javascript')) AS ks
        |  FROM l)
        |SELECT doc_id,
        |  coalesce(array_to_string(ks, chr(10)), '') AS clean_text,
        |  CAST(len(ks) AS BIGINT) AS n_lines_kept,
        |  CAST(len(ls) - len(ks) AS BIGINT) AS n_lines_dropped,
        |  len(ks) >= 5 AND NOT contains(lower(t), 'lorem ipsum')
        |    AND NOT contains(t, '{') AS is_kept
        |FROM k ORDER BY doc_id""".stripMargin,

    // Full LM rebuild: bigram counts from the src0 slice, context
    // totals, distinct-target vocabulary, then the same add-alpha
    // smoothed ln per transition rounded to integer micros before the
    // per-doc sum (the t8 determinism pattern). t11b scores against
    // FOLDED incremental counts; additive integers make that
    // bit-identical to this one-shot expectation.
    "t11_bigram_lm" -> bigramLmOracleSql,
    "t11b_incremental_lm" -> bigramLmOracleSql,
    "t16_trigram_lm" -> trigramLmOracleSql,
    "t16b_incremental_lm3" -> trigramLmOracleSql,
    // both md5 draws + the rank replayed; doc_id is BIGINT so the
    // VARCHAR renderings agree between engines
    "cu20_shuffle_shards" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    CAST(CAST('0x' || substr(md5('shard:'
        |      || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 8
        |      AS INTEGER) AS shard,
        |    md5('ord:' || CAST(doc_id AS VARCHAR)) AS ok
        |  FROM documents)
        |SELECT doc_id, shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY shard
        |    ORDER BY ok, doc_id) AS INTEGER) AS shard_rank
        |FROM a ORDER BY doc_id""".stripMargin,

    // the TVF legs: same replays, different training slice / columns
    "sql5_sql_lm5" -> hashed5LmOracleSql(trainPred = "1 = 1"),
    "sql6_sql_shards" ->
      """SELECT doc_id,
        |  CAST(CAST('0x' || substr(md5('shard:'
        |    || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 8
        |    AS INTEGER) AS shard,
        |  md5('ord:' || CAST(doc_id AS VARCHAR)) AS ord_key
        |FROM documents ORDER BY doc_id""".stripMargin,

    // one full-recompute SQL for both the one-shot and the folded
    // path (the t11/t11b discipline): integer counts are associative
    "t17_hashed5gram_lm" -> hashed5LmOracleSql(),
    "t17b_incremental_lm5" -> hashed5LmOracleSql(),

    // Two full LM rebuilds (in-domain = src0, general = the rest) and
    // two smoothed-ln score folds in the same integer micros; the
    // difference, the per-token average, and the selection boolean
    // are all pure arithmetic on those exact integers.
    "t15_moore_lewis" ->
      s"""WITH ${OracleFragments.lmTrainCtes("documents", "text",
              "source = 'src0'", "i")},
         |${OracleFragments.lmTrainCtes("documents", "text",
              "source <> 'src0'", "g")},
         |${OracleFragments.lmScoreCtes("documents", "text", 0.5,
              "i", "i")},
         |${OracleFragments.lmScoreCtes("documents", "text", 0.5,
              "g", "g")},
         |ced AS (
         |  SELECT d.doc_id,
         |    coalesce(si.n_transitions, 0) AS n_transitions,
         |    coalesce(si.nll_micros, 0) AS nll_in_micros,
         |    coalesce(sg.nll_micros, 0) AS nll_gen_micros,
         |    coalesce(si.nll_micros, 0) - coalesce(sg.nll_micros, 0)
         |      AS ced_micros
         |  FROM documents d
         |    LEFT JOIN ilmsc si USING (doc_id)
         |    LEFT JOIN glmsc sg USING (doc_id)),
         |avgd AS (
         |  SELECT *,
         |    CASE WHEN n_transitions = 0 THEN 0.0
         |      ELSE ced_micros / CAST(1000000.0 AS DOUBLE)
         |        / n_transitions END AS avg_ced
         |  FROM ced)
         |SELECT doc_id, n_transitions, nll_in_micros, nll_gen_micros,
         |  ced_micros, avg_ced,
         |  n_transitions > 0 AND avg_ced < 0.0 AS selected
         |FROM avgd ORDER BY doc_id""".stripMargin,

    // Same LM rebuild, then the same rank arithmetic: ROW_NUMBER per
    // language over (avg_nll, doc_id), bucket = (r-1)*3 // n.
    "t12_ccnet_buckets" ->
      s"""WITH ${OracleFragments.lmTrainCtes("documents", "text",
              "source = 'src0'")},
         |${OracleFragments.lmScoreCtes("documents", "text", 0.5)},
         |sc2 AS (
         |  SELECT d.doc_id, d.lang,
         |    CASE WHEN coalesce(s.n_transitions, 0) = 0 THEN 0.0
         |      ELSE s.nll_micros / CAST(1000000.0 AS DOUBLE)
         |        / s.n_transitions END AS avg_nll
         |  FROM documents d LEFT JOIN lmsc s USING (doc_id)),
         |rk AS (
         |  SELECT doc_id, lang, avg_nll,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY avg_nll, doc_id) AS r,
         |    count(*) OVER (PARTITION BY lang) AS n
         |  FROM sc2)
         |SELECT doc_id, lang, avg_nll,
         |  CAST(((r - 1) * 3) // n AS INT) AS bucket,
         |  CASE WHEN ((r - 1) * 3) // n = 0 THEN 'head'
         |    WHEN ((r - 1) * 3) // n = 2 THEN 'tail'
         |    ELSE 'middle' END AS bucket_label
         |FROM rk ORDER BY doc_id""".stripMargin,

    // t12's window split over the trigram scorer's avg_nll
    "t12b_trigram_buckets" ->
      s"""WITH ${OracleFragments.tgTrainCtes("documents", "text",
              "source = 'src0'")},
         |${OracleFragments.tgScoreCtes("documents", "text", 0.5,
              0.6, 0.3, 0.1)},
         |sc2 AS (
         |  SELECT d.doc_id, d.lang,
         |    CASE WHEN coalesce(s.n_transitions, 0) = 0 THEN 0.0
         |      ELSE s.nll_micros / CAST(1000000.0 AS DOUBLE)
         |        / s.n_transitions END AS avg_nll
         |  FROM documents d LEFT JOIN tgsc s USING (doc_id)),
         |rk AS (
         |  SELECT doc_id, lang, avg_nll,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY avg_nll, doc_id) AS r,
         |    count(*) OVER (PARTITION BY lang) AS n
         |  FROM sc2)
         |SELECT doc_id, lang, avg_nll,
         |  CAST(((r - 1) * 3) // n AS INT) AS bucket,
         |  CASE WHEN ((r - 1) * 3) // n = 0 THEN 'head'
         |    WHEN ((r - 1) * 3) // n = 2 THEN 'tail'
         |    ELSE 'middle' END AS bucket_label
         |FROM rk ORDER BY doc_id""".stripMargin,

    // cd1: every consolidated statistic recomputed from the shared
    // fragments — gopher chain for words/pass, the d1 md5 recipe for
    // dups, kq1's m=7 bucket math for the length quantiles, and the
    // deterministic (count DESC, lang) argmax for the dominant
    // language; sql4 drives the same operator through the SQL TVF, so
    // it shares this oracle verbatim
    "cd1_dataset_card" -> datasetCardOracleSql,
    "sql4_dataset_card" -> datasetCardOracleSql,
  ) ++ oraclesTail

  private lazy val datasetCardOracleSql: String =
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    coalesce(CAST(lang AS VARCHAR), 'und') AS lang
         |  FROM documents),
         |${OracleFragments.gopherCtes("base", "text")},
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(word_count) AS BIGINT) AS n_words,
         |    CAST(SUM(CASE WHEN gopher_pass THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_gopher_pass
         |  FROM gfp),
         |dp AS (
         |  SELECT CAST(COUNT(text) - COUNT(DISTINCT
         |      md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
         |    AS BIGINT) AS n_exact_dups
         |  FROM base),
         |lb AS (
         |  SELECT CAST(length(text) AS BIGINT) AS len FROM base
         |  WHERE text IS NOT NULL),
         |bk AS (
         |  SELECT CASE WHEN len < 128 THEN len
         |           ELSE (length(bin(len)) - 7) * 128
         |                + (len >> (length(bin(len)) - 8)) - 128
         |         END AS bkt, COUNT(*) AS cnt
         |  FROM lb GROUP BY 1),
         |cum AS (
         |  SELECT bkt, cnt,
         |    SUM(cnt) OVER (ORDER BY bkt) AS cum,
         |    SUM(cnt) OVER () AS total,
         |    CASE WHEN bkt < 128 THEN bkt
         |         ELSE ((128 + (bkt & 127) + 1)
         |               << CAST((bkt >> 7) - 1 AS INT)) - 1
         |    END AS hi
         |  FROM bk),
         |q AS (
         |  SELECT
         |    CAST(MIN(CASE WHEN cum >= (total + 1) // 2 THEN hi END)
         |      AS BIGINT) AS p50_chars,
         |    CAST(MIN(CASE WHEN cum >= (total * 99 + 99) // 100 THEN hi
         |      END) AS BIGINT) AS p99_chars
         |  FROM cum),
         |tl AS (
         |  SELECT lang AS top_lang, c FROM (
         |    SELECT lang, COUNT(*) AS c FROM base GROUP BY 1)
         |  ORDER BY c DESC, lang LIMIT 1)
         |SELECT m.n_docs, m.n_words, dp.n_exact_dups,
         |  round(CAST(dp.n_exact_dups AS DOUBLE) / m.n_docs, 6)
         |    AS dup_rate,
         |  m.n_gopher_pass,
         |  round(CAST(m.n_gopher_pass AS DOUBLE) / m.n_docs, 6)
         |    AS gopher_pass_rate,
         |  q.p50_chars, q.p99_chars, tl.top_lang,
         |  round(CAST(tl.c AS DOUBLE) / m.n_docs, 6) AS top_lang_frac
         |FROM m, dp, q, tl""".stripMargin

  // continuation of `oracles` (split around the shared dataset-card
  // SQL so cd1 and sql4 reference one definition)
  private def oraclesTail: Map[String, String] = Map(
    // The sketch-bucket path: same LM scoring, then the HdrHistogram
    // m=9 bucket replay (kq1's integer bit-math at base 512), ceil-rank
    // threshold pick at 1/3 and 2/3, and the monotone > comparisons.
    // anm = nll_micros // n_transitions is truncating division of two
    // non-negative BIGINTs, identical in Spark's DIV and DuckDB's //.
    "t12c_sketch_buckets" ->
      s"""WITH ${OracleFragments.lmTrainCtes("documents", "text",
              "source = 'src0'")},
         |${OracleFragments.lmScoreCtes("documents", "text", 0.5)},
         |${bucketReplayCtes("lmsc", withCounts = true)}
         |$bucketFinalSelect""".stripMargin,

    // t12d: the t12c replay + the selection rule (head, or middle with
    // md5(doc_id) under rateBound(0.5) = '800')
    "t12d_ccnet_sample" ->
      s"""WITH ${OracleFragments.lmTrainCtes("documents", "text",
              "source = 'src0'")},
         |${OracleFragments.lmScoreCtes("documents", "text", 0.5)},
         |${bucketReplayCtes("lmsc", withCounts = false)},
         |lab AS (
         |  SELECT s.doc_id, s.lang,
         |    CASE WHEN s.anm <= t.t1 THEN 'head'
         |         WHEN s.anm > t.t2 THEN 'tail'
         |         ELSE 'middle' END AS bucket_label
         |  FROM sc2 s JOIN th t ON s.lang IS NOT DISTINCT FROM t.lang)
         |SELECT doc_id, lang, bucket_label FROM lab
         |WHERE bucket_label = 'head'
         |   OR (bucket_label = 'middle'
         |       AND md5(CAST(doc_id AS VARCHAR)) < '800')
         |ORDER BY doc_id""".stripMargin,

    // t12e: the t12c bucket machinery re-based on the hashed 5-gram
    // stupid-backoff scores (t17) — CCNet's published filter order,
    // end to end: hashed table rebuild, every backoff branch, the
    // sketch thresholds, and the bucket assignment all hash-compare
    "t12e_hashed5_buckets" ->
      s"""WITH ${OracleFragments.h5TrainCtes("documents", "text",
              "source = 'src0'")},
         |${OracleFragments.h5ScoreCtes("documents", "text", 0.5, 0.4)},
         |${bucketReplayCtes("h5sc", withCounts = true)}
         |$bucketFinalSelect""".stripMargin,

    // Gopher chain over base + planted srcq, aggregated per source with
    // integer sums only.
    "t13_source_quality" ->
      s"""WITH rdocs AS (
         |  SELECT doc_id, source, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 85000, 'srcq',
         |    replace(text, ' value ', '.' || chr(10)) || '.' || chr(10)
         |      || 'of the data and that batch have with be to end.'
         |  FROM documents WHERE doc_id % 7 = 0),
         |${OracleFragments.gopherCtes("rdocs", "text")}
         |SELECT r.source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN g.gopher_pass THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_pass,
         |  CAST(sum(g.word_count) AS BIGINT) AS n_words,
         |  CAST(sum(g.stopword_hits) AS BIGINT) AS n_stop_hits,
         |  CAST(sum(CASE WHEN g.dup_5gram_char_frac > 0.15 THEN 1 ELSE 0
         |    END) AS BIGINT) AS n_repetitive,
         |  round(CAST(sum(CASE WHEN g.gopher_pass THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 6) AS pass_rate
         |FROM gfp g JOIN rdocs r USING (doc_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // full 5-iteration training replay: pair counts, argmax with the
    // (cnt DESC, lhs, rhs) tie-break, greedy apply via the run-parity
    // window rule
    "t14_bpe_merges" ->
      s"""WITH ${OracleFragments.bpeCtes("documents", "text", 5)}
         |SELECT * FROM (
         |  SELECT 1 AS iter, lhs, rhs, CAST(cnt AS BIGINT) AS cnt
         |  FROM mg_1
         |  UNION ALL SELECT 2, lhs, rhs, CAST(cnt AS BIGINT) FROM mg_2
         |  UNION ALL SELECT 3, lhs, rhs, CAST(cnt AS BIGINT) FROM mg_3
         |  UNION ALL SELECT 4, lhs, rhs, CAST(cnt AS BIGINT) FROM mg_4
         |  UNION ALL SELECT 5, lhs, rhs, CAST(cnt AS BIGINT) FROM mg_5)
         |ORDER BY iter""".stripMargin,

    // the t14 merge chain, the syms5 segmentation, per-doc counts via
    // the word join, then cu3's running-offset window
    "cu18_bpe_pack" ->
      s"""WITH ${OracleFragments.bpeCtes("documents", "text", 5)},
         |ns AS MATERIALIZED (
         |  SELECT word, CAST(count(*) AS BIGINT) AS n_syms
         |  FROM syms5 GROUP BY word),
         |dw AS (
         |  SELECT doc_id, word FROM (
         |    SELECT doc_id, unnest(string_split_regex(
         |      lower(trim(coalesce(text, ''))), '\\s+')) AS word
         |    FROM documents) t
         |  WHERE word <> ''),
         |dt AS (
         |  SELECT d.doc_id,
         |    CAST(coalesce(SUM(ns.n_syms), 0) AS BIGINT) AS n_tok
         |  FROM documents d
         |    LEFT JOIN dw ON dw.doc_id = d.doc_id
         |    LEFT JOIN ns ON ns.word = dw.word
         |  GROUP BY d.doc_id),
         |off AS (
         |  SELECT doc_id, n_tok,
         |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS start_off
         |  FROM dt)
         |SELECT doc_id, n_tok, start_off,
         |  CAST(FLOOR(start_off / 2048) AS BIGINT) AS first_seq,
         |  GREATEST(CAST(FLOOR(start_off / 2048) AS BIGINT),
         |    CAST(FLOOR((start_off + n_tok - 1) / 2048) AS BIGINT))
         |    AS last_seq
         |FROM off ORDER BY doc_id""".stripMargin,

    // the same HTML construction, then the strip chain replayed regex
    // by regex in the same order (the shared htmlStripCtes fragment)
    "cu16_html_extract" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
         |    || '</title><style>p{color:red}</style>'
         |    || '<script>var x = 1 < 2;</script></head><body>'
         |    || CASE WHEN doc_id % 5 = 0
         |         THEN '<!-- hidden --><p>&quot;quoted&#39; start</p>'
         |         ELSE '' END
         |    || '<p>'
         |    || replace(coalesce(text, ''), ' value ',
         |         ' &amp; value &lt;tag&gt; ')
         |    || '</p><div>footer &nbsp;menu</div></body></html>' AS html
         |  FROM documents),
         |${OracleFragments.htmlStripCtes("h", "html")}
         |SELECT doc_id, clean FROM hclean ORDER BY doc_id""".stripMargin,

    // full 30-iteration replay of the LOCAL trainer — the same CTE
    // chain as t14, 6x deeper
    "t14c_bpe_train_local" ->
      s"""WITH ${OracleFragments.bpeCtes("documents", "text", 30)}
         |SELECT * FROM (
         |${(1 to 30).map(k =>
              s"  SELECT $k AS iter, lhs, rhs, CAST(cnt AS BIGINT) " +
                s"AS cnt FROM mg_$k").mkString("\n  UNION ALL\n")})
         |ORDER BY iter""".stripMargin,

    // the 30-merge vocabulary segmentation IS syms30 — pins the
    // imperative rank-ordered encoder against the sequential chain
    "t14d_bpe_encode_prod" ->
      s"""WITH ${OracleFragments.bpeCtes("documents", "text", 30)}
         |SELECT word, CAST(count(*) AS INTEGER) AS n_syms,
         |  string_agg(sym, ' ' ORDER BY pos) AS segmented
         |FROM syms30 GROUP BY word ORDER BY word""".stripMargin,

    // sentence regex, per-sentence token counts, and the greedy
    // prefix-dependent packing via a recursive CTE
    "cu19_sentence_chunks" ->
      """WITH RECURSIVE p AS (
        |  SELECT doc_id, replace(coalesce(text, ''), ' value ', '. ')
        |    AS ptext
        |  FROM documents),
        |sen0 AS (
        |  SELECT doc_id, list_filter(string_split(
        |    regexp_replace(trim(ptext), '([.!?])\s+', '\1' || chr(31),
        |      'g'), chr(31)), x -> x <> '') AS ss
        |  FROM p),
        |sen AS (
        |  SELECT doc_id, i AS sidx, ss[i] AS sent,
        |    len(list_filter(string_split_regex(ss[i], '\s+'),
        |      x -> x <> '')) AS stok
        |  FROM sen0, unnest(generate_series(1, len(ss))) t(i)),
        |pack AS (
        |  SELECT doc_id, sidx, sent, stok, 1 AS chunk_id, stok AS cnt
        |  FROM sen WHERE sidx = 1
        |  UNION ALL
        |  SELECT s.doc_id, s.sidx, s.sent, s.stok,
        |    CASE WHEN pk.cnt + s.stok <= 12 THEN pk.chunk_id
        |      ELSE pk.chunk_id + 1 END,
        |    CASE WHEN pk.cnt + s.stok <= 12 THEN pk.cnt + s.stok
        |      ELSE s.stok END
        |  FROM pack pk JOIN sen s
        |    ON s.doc_id = pk.doc_id AND s.sidx = pk.sidx + 1)
        |SELECT doc_id, CAST(chunk_id - 1 AS INTEGER) AS chunk_idx,
        |  string_agg(sent, ' ' ORDER BY sidx) AS chunk,
        |  CAST(sum(stok) AS INTEGER) AS n_tok
        |FROM pack GROUP BY doc_id, chunk_id
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    // the 30-merge chain + byte-order symbol ids + ordered per-word and
    // per-doc aggregation — the full corpus→token-ids replay
    "t14e_corpus_tokens" ->
      s"""WITH ${OracleFragments.bpeCtes("documents", "text", 30)},
         |vocab AS (
         |  SELECT sym, row_number() OVER (ORDER BY sym) - 1 AS token_id
         |  FROM (SELECT DISTINCT sym FROM syms30)),
         |wseg AS (
         |  SELECT s.word,
         |    string_agg(CAST(v.token_id AS VARCHAR), ' ' ORDER BY s.pos)
         |      AS idstr,
         |    count(*) AS nsym
         |  FROM syms30 s JOIN vocab v USING (sym) GROUP BY s.word),
         |dwx AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(coalesce(text,
         |      ''))), '\\s+'), x -> x <> '') AS __ws
         |  FROM documents),
         |dw AS (
         |  SELECT doc_id, i AS wpos, __ws[i] AS word
         |  FROM dwx, unnest(generate_series(1, len(__ws))) t(i)),
         |agg AS (
         |  SELECT d.doc_id,
         |    CAST(sum(w.nsym) AS INTEGER) AS n_tok,
         |    string_agg(w.idstr, ' ' ORDER BY d.wpos) AS token_str
         |  FROM dw d JOIN wseg w USING (word) GROUP BY d.doc_id)
         |SELECT x.doc_id, coalesce(a.n_tok, 0) AS n_tok,
         |  coalesce(a.token_str, '') AS token_str
         |FROM documents x LEFT JOIN agg a USING (doc_id)
         |ORDER BY x.doc_id""".stripMargin,

    // seed selection replayed from first principles: substring counts,
    // (cnt DESC, piece ASC) top-K, ln-micro costs over the kept mass
    "t18_unigram_seed" ->
      s"""WITH ${OracleFragments.unigramCtes("documents", "text", 200, 8,
            24, withDp = false)}
         |SELECT piece, cnt, cost_mu FROM t18v ORDER BY piece""".stripMargin,

    // the integer Viterbi replayed as a pieces-indexed DP chain: min
    // score across k, then min k at that score — the engine's
    // lexicographic (score, pieces) objective, hash for hash
    "t18b_unigram_segment" ->
      s"""WITH ${OracleFragments.unigramCtes("documents", "text", 200, 8,
            24, withDp = true)}
         |SELECT word, score_mu, n_pieces FROM t18seg
         |ORDER BY word""".stripMargin,

    // corpus composition: per-doc token counts + exact corpus NLL from
    // the per-word DP values, re-aggregated per document
    "t18c_unigram_corpus" ->
      s"""WITH ${OracleFragments.unigramCtes("documents", "text", 200, 8,
            24, withDp = true)},
         |t18dw AS (
         |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(
         |    trim(coalesce(text, ''))), '\\s+'), x -> x <> '')) AS word
         |  FROM documents),
         |t18agg AS (
         |  SELECT dw.doc_id, CAST(sum(g.n_pieces) AS INT) AS n_tok,
         |    CAST(sum(g.score_mu) AS BIGINT) AS score_mu
         |  FROM t18dw dw JOIN t18seg g USING (word) GROUP BY 1)
         |SELECT d.doc_id, coalesce(a.n_tok, 0) AS n_tok,
         |  coalesce(a.score_mu, CAST(0 AS BIGINT)) AS score_mu
         |FROM documents d LEFT JOIN t18agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // vocabulary selection replayed from first principles: positional
    // substring counts (initial vs ##-continuation forms), both-form
    // single-char coverage, (cnt DESC, piece ASC) top-K
    "t20_wordpiece_vocab" ->
      s"""WITH ${OracleFragments.wordpieceCtes("documents", "text", 200,
            8, 24, withChain = false)}
         |SELECT piece, cnt FROM wpv ORDER BY piece""".stripMargin,

    // the greedy longest-match-first encode, every step replayed: a
    // word reaches wpseg only by matching through its END; stalled
    // words surface as [UNK] via the LEFT JOIN — partial matches
    // discarded, exactly the engine's contract
    "t20b_wordpiece_encode" ->
      s"""WITH ${OracleFragments.wordpieceCtes("documents", "text", 200,
            8, 24, withChain = true)}
         |SELECT w.word,
         |  CAST(coalesce(s.n_pieces, 1) AS INTEGER) AS n_pieces,
         |  coalesce(s.segmented, '[UNK]') AS segmented,
         |  CAST(CASE WHEN s.word IS NULL THEN 1 ELSE 0 END AS INTEGER)
         |    AS is_unk
         |FROM wpwords w LEFT JOIN wpseg s ON s.word = w.word
         |ORDER BY w.word""".stripMargin,

    // corpus composition: FULL-MODEL symbol ranking (every wpv piece
    // plus [UNK], which ranks like any symbol — ids are a pure
    // function of the model), per-word id strings, per-doc
    // concatenation in word order, [UNK] occurrence counts — the
    // t14e replay pattern over the greedy segmentation
    "t20c_wordpiece_corpus" ->
      s"""WITH ${OracleFragments.wordpieceCtes("documents", "text", 200,
            8, 24, withChain = true)},
         |$wpCorpusComposition
         |SELECT x.doc_id, coalesce(a.n_tok, 0) AS n_tok,
         |  coalesce(a.n_unk, 0) AS n_unk,
         |  coalesce(a.token_str, '') AS token_str
         |FROM documents x LEFT JOIN t20agg a ON a.doc_id = x.doc_id
         |ORDER BY x.doc_id""".stripMargin,

    // the decode walk replayed piece by piece over the t20 chain's
    // segmentation: ## pieces contribute their marker-stripped body,
    // word-start pieces a space + body, concatenated in (wpos, k)
    // order with the artificial leading space stripped — the engine's
    // WordPiece.decodeCorpus semantics from first principles
    "t25b_wordpiece_decode" ->
      s"""WITH ${OracleFragments.wordpieceCtes("documents", "text", 200,
            8, 24, withChain = true)},
         |$wpCorpusComposition,
         |t25p AS (
         |  SELECT d.doc_id, d.wpos, p.k, p.piece
         |  FROM t20dw d JOIN t20wp p ON p.word = d.word),
         |t25d AS (
         |  SELECT doc_id,
         |    string_agg(CASE WHEN piece LIKE '##%'
         |        THEN substring(piece, 3)
         |        ELSE ' ' || piece END, ''
         |      ORDER BY wpos, k) AS d0
         |  FROM t25p GROUP BY 1)
         |SELECT x.doc_id,
         |  coalesce(CASE WHEN t.d0 LIKE ' %' THEN substring(t.d0, 2)
         |    ELSE t.d0 END, '') AS decoded
         |FROM documents x LEFT JOIN t25d t ON t.doc_id = x.doc_id
         |ORDER BY x.doc_id""".stripMargin,

    // fertility over the greedy family: the t19 counters joined to the
    // WordPiece per-doc composition instead of the unigram DP's
    // byte-level BPE train: planted corpus → first-principles byte map
    // → byte-mapped word frequencies → the shared 30-iteration
    // sequential merge-chain replay
    "t21_bytebpe_train" ->
      s"""WITH ${t21DocsSql},
         |${OracleFragments.byteMapCtes("pd", "text")},
         |${OracleFragments.bpeCtesFromWfreq(OracleFragments
              .byteWfreqBody, 30)}
         |SELECT * FROM (
         |${(1 to 30).map(k =>
              s"  SELECT $k AS iter, lhs, rhs, CAST(cnt AS BIGINT) " +
                s"AS cnt FROM mg_$k").mkString("\n  UNION ALL\n")})
         |ORDER BY iter""".stripMargin,

    // byte-level vocabulary segmentation IS syms30 over the mapped
    // words; `decoded` comes from the PRE-map side of bmapped — the
    // bijection is pinned without ever consulting an inverse table
    "t21b_bytebpe_encode" ->
      s"""WITH ${t21DocsSql},
         |${OracleFragments.byteMapCtes("pd", "text")},
         |${OracleFragments.bpeCtesFromWfreq(OracleFragments
              .byteWfreqBody, 30)},
         |t21sel AS (
         |  SELECT word, CAST(count(*) AS INTEGER) AS n_syms,
         |    string_agg(sym, ' ' ORDER BY pos) AS segmented
         |  FROM syms30 GROUP BY word)
         |SELECT t.word, m.word AS decoded, t.n_syms, t.segmented
         |FROM t21sel t JOIN bmapped m ON m.bword = t.word
         |ORDER BY t.word""".stripMargin,

    // byte-level corpus tokens: the t14e replay (byte-order symbol
    // ids + ordered per-word and per-doc aggregation) over the
    // case-preserving mapped word positions
    "t21c_bytebpe_corpus" -> byteCorpusTokensOracle(
      s"${t21DocsSql},\n${OracleFragments.byteMapCtes("pd", "text")}"),

    // the TVF path: same replay over the documents table directly
    // (the one-call posture a SQL user takes — no planted suffixes)
    "sql12_sql_bytebpe" -> byteCorpusTokensOracle(
      OracleFragments.byteMapCtes("documents", "text")),

    // the stored-model TVF shares sql12's replay verbatim: same
    // corpus, same 30 merges, same frozen byte-order ids
    "sql14_sql_store_encode" -> byteCorpusTokensOracle(
      OracleFragments.byteMapCtes("documents", "text")),

    // the persisted-model path shares t21c's replay verbatim: the
    // stored model must reproduce the in-memory chain bit for bit
    "t23_tokenizer_store" -> byteCorpusTokensOracle(
      s"${t21DocsSql},\n${OracleFragments.byteMapCtes("pd", "text")}"),

    // the SQL-driven roundtrip shares t25's identity oracle verbatim
    "sql15_sql_decode" ->
      s"""WITH ${t25DocsSql}
         |SELECT doc_id, text AS decoded FROM pd ORDER BY doc_id"""
        .stripMargin,

    // the roundtrip contract IS the oracle: the space-carrying byte
    // family partitions the text into its tokens, so the engine's
    // store-save → encode → decode chain must land on the planted
    // text VERBATIM — the oracle recomputes only the plant, and any
    // drift anywhere in the six-step chain flips the hash
    "t25_decode_roundtrip" ->
      s"""WITH ${t25DocsSql}
         |SELECT doc_id, text AS decoded FROM pd ORDER BY doc_id"""
        .stripMargin,

    // the t14e replay with the vocab ranked over the FROZEN table —
    // the training alphabet (distinct base symbols of the word
    // decomposition, = syms0's sym set) plus every merge output —
    // instead of the corpus-used symbols
    "t23b_store_frozen_char" ->
      s"""WITH ${OracleFragments.bpeCtes("documents", "text", 30)},
         |vocab AS (
         |  SELECT sym, row_number() OVER (ORDER BY sym) - 1 AS token_id
         |  FROM (SELECT DISTINCT sym FROM (
         |    SELECT sym FROM syms0
         |${(1 to 30).map(k =>
              s"    UNION ALL SELECT lhs || rhs AS sym FROM mg_$k")
              .mkString("\n")}))),
         |wseg AS (
         |  SELECT s.word,
         |    string_agg(CAST(v.token_id AS VARCHAR), ' ' ORDER BY s.pos)
         |      AS idstr,
         |    count(*) AS nsym
         |  FROM syms30 s JOIN vocab v USING (sym) GROUP BY s.word),
         |dwx AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(coalesce(text,
         |      ''))), '\\s+'), x -> x <> '') AS __ws
         |  FROM documents),
         |dw AS (
         |  SELECT doc_id, i AS wpos, __ws[i] AS word
         |  FROM dwx, unnest(generate_series(1, len(__ws))) t(i)),
         |agg AS (
         |  SELECT d.doc_id,
         |    CAST(sum(w.nsym) AS INTEGER) AS n_tok,
         |    string_agg(w.idstr, ' ' ORDER BY d.wpos) AS token_str
         |  FROM dw d JOIN wseg w USING (word) GROUP BY d.doc_id)
         |SELECT x.doc_id, coalesce(a.n_tok, 0) AS n_tok,
         |  coalesce(a.token_str, '') AS token_str
         |FROM documents x LEFT JOIN agg a USING (doc_id)
         |ORDER BY x.doc_id""".stripMargin,

    // span corruption: hashed token ids, per-window offset draws, the
    // position disposition CASE, and ordered string aggregation for
    // both sequences — all from first principles
    "cu21_span_corrupt" ->
      s"""WITH dx AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(trim(
         |    coalesce(text, ''))), '\\s+'), x -> x <> '') AS ws
         |  FROM documents),
         |tok AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    CAST('0x' || substr(md5('tok|' || ws[i]), 1, 8) AS BIGINT)
         |      % 50000 AS tid
         |  FROM dx, unnest(generate_series(1, len(ws))) t(i)),
         |cnt AS (SELECT doc_id, len(ws) AS n_tok FROM dx),
         |win AS (
         |  SELECT c.doc_id, j,
         |    CAST('0x' || substr(md5('t5|' || CAST(c.doc_id AS VARCHAR)
         |      || '|' || CAST(j AS VARCHAR)), 1, 8) AS BIGINT) % 7
         |      AS off
         |  FROM cnt c, unnest(generate_series(0,
         |    CAST(n_tok // 8 AS INTEGER) - 1)) t(j)),
         |mk AS (
         |  SELECT t.doc_id, t.pos, t.tid, w.j, w.off,
         |    CASE WHEN (t.pos % 8) = w.off THEN 1
         |         WHEN (t.pos % 8) > w.off AND (t.pos % 8) < w.off + 2
         |           THEN 2
         |         ELSE 0 END AS m
         |  FROM tok t LEFT JOIN win w
         |    ON w.doc_id = t.doc_id AND w.j = t.pos // 8),
         |inp AS (
         |  SELECT doc_id, string_agg(
         |    CASE WHEN m = 1 THEN CAST(50000 + j AS VARCHAR)
         |         ELSE CAST(tid AS VARCHAR) END, ' ' ORDER BY pos)
         |    AS input_str
         |  FROM mk WHERE m <> 2 GROUP BY doc_id),
         |tgt AS (
         |  SELECT doc_id, string_agg(v, ' ' ORDER BY j, k, pos)
         |    AS target_str
         |  FROM (
         |    SELECT doc_id, j, 0 AS k, -1 AS pos,
         |      CAST(50000 + j AS VARCHAR) AS v
         |    FROM win
         |    UNION ALL
         |    SELECT doc_id, j, 1 AS k, pos, CAST(tid AS VARCHAR) AS v
         |    FROM mk WHERE m IN (1, 2)) u
         |  GROUP BY doc_id),
         |nsp AS (SELECT doc_id, count(*) AS n_spans FROM win
         |  GROUP BY doc_id)
         |SELECT c.doc_id, CAST(c.n_tok AS INTEGER) AS n_tok,
         |  CAST(coalesce(s.n_spans, 0) AS INTEGER) AS n_spans,
         |  CAST(coalesce(s.n_spans, 0) * 2 AS INTEGER) AS n_masked,
         |  coalesce(i.input_str, '') AS input_str,
         |  coalesce(g.target_str, '') AS target_str
         |FROM cnt c LEFT JOIN inp i USING (doc_id)
         |  LEFT JOIN nsp s USING (doc_id)
         |  LEFT JOIN tgt g USING (doc_id)
         |ORDER BY c.doc_id""".stripMargin,

    "t19b_wordpiece_fertility" ->
      s"""WITH ${OracleFragments.wordpieceCtes("documents", "text", 200,
            8, 8, withChain = true, withHex = false)},
         |$wpCorpusComposition,
         |t19wb AS (
         |  SELECT doc_id, coalesce(lang, 'und') AS lang,
         |    CAST(length(list_filter(string_split_regex(lower(trim(
         |      coalesce(text, ''))), '\\s+'), x -> x <> '')) AS BIGINT)
         |      AS n_words,
         |    CAST(strlen(coalesce(text, '')) AS BIGINT) AS n_bytes
         |  FROM documents),
         |t19wa AS (
         |  SELECT b.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(b.n_words) AS BIGINT) AS n_words,
         |    CAST(sum(coalesce(a.n_tok, 0)) AS BIGINT) AS n_tokens,
         |    CAST(sum(b.n_bytes) AS BIGINT) AS n_bytes
         |  FROM t19wb b LEFT JOIN t20agg a USING (doc_id) GROUP BY 1)
         |SELECT lang, n_docs, n_words, n_tokens, n_bytes,
         |  CASE WHEN n_words = 0 THEN CAST(0.0 AS DOUBLE)
         |    ELSE CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE) END
         |    AS fertility,
         |  CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
         |    ELSE CAST(n_bytes AS DOUBLE) / CAST(n_tokens AS DOUBLE) END
         |    AS bytes_per_token
         |FROM t19wa ORDER BY lang""".stripMargin,

    // the card: all four families re-trained from first principles in
    // one query — both 30-step merge chains (byte chain y-prefixed),
    // the unigram DP, the greedy WordPiece chain — then the per-family
    // stats joins and the single-division ratios
    "t24_tokenizer_card" ->
      s"""WITH ${OracleFragments.unigramCtes("documents", "text", 200, 8,
            8, withDp = true, withHex = false)},
         |${OracleFragments.wordpieceCtes("documents", "text", 200, 8,
            8, withChain = true, withHex = false)},
         |${OracleFragments.bpeCtes("documents", "text", 30)},
         |${OracleFragments.byteMapCtes("documents", "text")},
         |${OracleFragments.bpeCtesFromWfreq(OracleFragments
            .byteWfreqBody, 30, prefix = "y")},
         |t24corpus AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(coalesce(sum(len(list_filter(string_split_regex(
         |      lower(trim(coalesce(text, ''))), '\\s+'),
         |      x -> x <> ''))), 0) AS BIGINT) AS n_words,
         |    CAST(coalesce(sum(strlen(coalesce(text, ''))), 0)
         |      AS BIGINT) AS n_bytes
         |  FROM documents),
         |t24cw AS (
         |  SELECT unnest(list_filter(string_split_regex(lower(trim(
         |    coalesce(text, ''))), '\\s+'), x -> x <> '')) AS word
         |  FROM documents),
         |t24cb AS (
         |  SELECT 'bpe-char' AS family,
         |    (SELECT CAST(count(DISTINCT sym) AS BIGINT) FROM syms30)
         |      AS vocab_size,
         |    (SELECT CAST(coalesce(sum(b.n), 0) AS BIGINT)
         |     FROM t24cw w JOIN (SELECT word, count(*) AS n FROM syms30
         |       GROUP BY 1) b USING (word)) AS n_tokens,
         |    CAST(0 AS BIGINT) AS n_unk_words),
         |t24yb AS (
         |  SELECT 'bpe-byte' AS family,
         |    CAST(256 + (SELECT count(DISTINCT lhs || rhs) FROM (
         |${(1 to 30).map(k => s"      SELECT lhs, rhs FROM ymg_$k")
            .mkString("\n      UNION ALL\n")})) AS BIGINT)
         |      AS vocab_size,
         |    (SELECT CAST(coalesce(sum(b.n), 0) AS BIGINT)
         |     FROM (SELECT m.bword AS word FROM bw JOIN bmapped m
         |       USING (word)) w
         |     JOIN (SELECT word, count(*) AS n FROM ysyms30
         |       GROUP BY 1) b USING (word)) AS n_tokens,
         |    CAST(0 AS BIGINT) AS n_unk_words),
         |t24un AS (
         |  SELECT 'unigram' AS family,
         |    (SELECT CAST(count(*) AS BIGINT) FROM t18v) AS vocab_size,
         |    (SELECT CAST(coalesce(sum(g.n_pieces), 0) AS BIGINT)
         |     FROM t24cw w JOIN t18seg g USING (word)) AS n_tokens,
         |    CAST(0 AS BIGINT) AS n_unk_words),
         |t24wp AS (
         |  SELECT 'wordpiece' AS family,
         |    (SELECT CAST(count(*) + 1 AS BIGINT) FROM wpv)
         |      AS vocab_size,
         |    (SELECT CAST(coalesce(sum(coalesce(d.n_pieces, 1)), 0)
         |       AS BIGINT)
         |     FROM t24cw w LEFT JOIN wpdone d ON d.word = w.word)
         |      AS n_tokens,
         |    (SELECT CAST(coalesce(sum(CASE WHEN d.word IS NULL
         |         THEN 1 ELSE 0 END), 0) AS BIGINT)
         |     FROM t24cw w LEFT JOIN wpdone d ON d.word = w.word)
         |      AS n_unk_words),
         |t24fam AS (
         |  SELECT * FROM t24cb UNION ALL SELECT * FROM t24yb
         |  UNION ALL SELECT * FROM t24un UNION ALL SELECT * FROM t24wp)
         |SELECT f.family, f.vocab_size, c.n_docs, c.n_words, c.n_bytes,
         |  f.n_tokens, f.n_unk_words,
         |  CASE WHEN c.n_words = 0 THEN CAST(0.0 AS DOUBLE)
         |    ELSE CAST(f.n_unk_words AS DOUBLE)
         |      / CAST(c.n_words AS DOUBLE) END AS unk_rate,
         |  CASE WHEN c.n_words = 0 THEN CAST(0.0 AS DOUBLE)
         |    ELSE CAST(f.n_tokens AS DOUBLE)
         |      / CAST(c.n_words AS DOUBLE) END AS fertility,
         |  CASE WHEN f.n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
         |    ELSE CAST(c.n_bytes AS DOUBLE)
         |      / CAST(f.n_tokens AS DOUBLE) END AS bytes_per_token
         |FROM t24fam f, t24corpus c
         |ORDER BY f.family""".stripMargin,

    // the TVF path: same greedy replay, text-word universe only.
    // maxSteps = 8 is the sql8 posture: the corpus's longest text word
    // is 8 chars, and greedy consumes >= 1 char per step, so 8 rounds
    // complete every word (the hex-word universe that needs 24 is the
    // t20 family's, not this one's)
    "sql10_sql_wordpiece" ->
      s"""WITH ${OracleFragments.wordpieceCtes("documents", "text", 200,
            8, 8, withChain = true, withHex = false)},
         |$wpCorpusComposition
         |SELECT x.doc_id, coalesce(a.n_tok, 0) AS n_tok,
         |  coalesce(a.n_unk, 0) AS n_unk,
         |  coalesce(a.token_str, '') AS token_str
         |FROM documents x LEFT JOIN t20agg a ON a.doc_id = x.doc_id
         |ORDER BY x.doc_id""".stripMargin,

    // fertility: the sql8 chain (corpus-word universe, full DP replay)
    // composed with independently-derived word/byte counters; ratios
    // are single IEEE divisions of exact long sums — cross-engine
    // stable without any rounding protocol
    "t19_token_fertility" ->
      s"""WITH ${OracleFragments.unigramCtes("documents", "text", 200, 8,
            8, withDp = true, withHex = false)},
         |t18dw AS (
         |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(
         |    trim(coalesce(text, ''))), '\\s+'), x -> x <> '')) AS word
         |  FROM documents),
         |t18agg AS (
         |  SELECT dw.doc_id, CAST(sum(g.n_pieces) AS BIGINT) AS n_tok
         |  FROM t18dw dw JOIN t18seg g USING (word) GROUP BY 1),
         |t19b AS (
         |  SELECT doc_id, coalesce(lang, 'und') AS lang,
         |    CAST(length(list_filter(string_split_regex(lower(trim(
         |      coalesce(text, ''))), '\\s+'), x -> x <> '')) AS BIGINT)
         |      AS n_words,
         |    CAST(strlen(coalesce(text, '')) AS BIGINT) AS n_bytes
         |  FROM documents),
         |t19a AS (
         |  SELECT b.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(b.n_words) AS BIGINT) AS n_words,
         |    CAST(sum(coalesce(a.n_tok, 0)) AS BIGINT) AS n_tokens,
         |    CAST(sum(b.n_bytes) AS BIGINT) AS n_bytes
         |  FROM t19b b LEFT JOIN t18agg a USING (doc_id) GROUP BY 1)
         |SELECT lang, n_docs, n_words, n_tokens, n_bytes,
         |  CASE WHEN n_words = 0 THEN CAST(0.0 AS DOUBLE)
         |    ELSE CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE) END
         |    AS fertility,
         |  CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
         |    ELSE CAST(n_bytes AS DOUBLE) / CAST(n_tokens AS DOUBLE) END
         |    AS bytes_per_token
         |FROM t19a ORDER BY lang""".stripMargin,

    // the TVF path: same DP replay, text-word universe only
    "sql8_sql_unigram" ->
      s"""WITH ${OracleFragments.unigramCtes("documents", "text", 200, 8,
            8, withDp = true, withHex = false)},
         |t18dw AS (
         |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(
         |    trim(coalesce(text, ''))), '\\s+'), x -> x <> '')) AS word
         |  FROM documents),
         |t18agg AS (
         |  SELECT dw.doc_id, CAST(sum(g.n_pieces) AS INT) AS n_tok,
         |    CAST(sum(g.score_mu) AS BIGINT) AS score_mu
         |  FROM t18dw dw JOIN t18seg g USING (word) GROUP BY 1)
         |SELECT d.doc_id, coalesce(a.n_tok, 0) AS n_tok,
         |  coalesce(a.score_mu, CAST(0 AS BIGINT)) AS score_mu
         |FROM documents d LEFT JOIN t18agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // the post-merge vocabulary segmentation IS syms5 — the chain that
    // trained the merges doubles as the encode expectation
    "t14b_bpe_encode" ->
      s"""WITH ${OracleFragments.bpeCtes("documents", "text", 5)}
         |SELECT word, CAST(count(*) AS INTEGER) AS n_syms,
         |  string_agg(sym, ' ' ORDER BY pos) AS segmented
         |FROM syms5 GROUP BY word ORDER BY word""".stripMargin,
  )

  private def trigramLmOracleSql: String =
    s"""WITH ${OracleFragments.tgTrainCtes("documents", "text",
            "source = 'src0'")},
       |${OracleFragments.tgScoreCtes("documents", "text", 0.5,
            0.6, 0.3, 0.1)}
       |SELECT d.doc_id,
       |  coalesce(s.n_transitions, 0) AS n_transitions,
       |  coalesce(s.nll_micros, 0) AS nll_micros,
       |  CASE WHEN coalesce(s.n_transitions, 0) = 0 THEN 0.0
       |    ELSE s.nll_micros / CAST(1000000.0 AS DOUBLE)
       |      / s.n_transitions END AS avg_nll
       |FROM documents d LEFT JOIN tgsc s USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin


  /** Shared sketch-bucket replay (t12c/t12d/t12e): per-group integer
    * micros-per-transition, the deterministic log-bucket sketch,
    * cumulative thresholds at 1/3 and 2/3, emitted as CTEs
    * sc2/bk/cum/th over score CTE `scoreCte(doc_id, n_transitions,
    * nll_micros)`. `withCounts` keeps the raw counters in sc2 for
    * gates that output them. */
  private def bucketReplayCtes(scoreCte: String,
      withCounts: Boolean): String = {
    val counts =
      if (!withCounts) ""
      else s"""
         |    CAST(coalesce(s.n_transitions, 0) AS BIGINT)
         |      AS n_transitions,
         |    CAST(coalesce(s.nll_micros, 0) AS BIGINT) AS nll_micros,"""
          .stripMargin
    s"""sc2 AS (
       |  SELECT d.doc_id, d.lang,$counts
       |    CASE WHEN coalesce(s.n_transitions, 0) = 0 THEN 0
       |      ELSE s.nll_micros // s.n_transitions END AS anm
       |  FROM documents d LEFT JOIN $scoreCte s USING (doc_id)),
       |bk AS (
       |  SELECT lang,
       |    CASE WHEN anm < 512 THEN anm
       |         ELSE (length(bin(anm)) - 9) * 512
       |              + (anm >> (length(bin(anm)) - 10)) - 512
       |    END AS bkt, count(*) AS cnt
       |  FROM sc2 GROUP BY 1, 2),
       |cum AS (
       |  SELECT lang, bkt, cnt,
       |    SUM(cnt) OVER (PARTITION BY lang ORDER BY bkt) AS cum,
       |    SUM(cnt) OVER (PARTITION BY lang) AS total,
       |    CASE WHEN bkt < 512 THEN bkt
       |         ELSE ((512 + (bkt & 511) + 1)
       |               << CAST((bkt >> 9) - 1 AS INT)) - 1
       |    END AS hi
       |  FROM bk),
       |th AS (
       |  SELECT lang,
       |    MIN(CASE WHEN cum >= (total + 2) // 3 THEN hi END) AS t1,
       |    MIN(CASE WHEN cum >= (total * 2 + 2) // 3 THEN hi END)
       |      AS t2
       |  FROM cum GROUP BY 1)"""
      .stripMargin
  }

  private val bucketFinalSelect: String =
    """SELECT s.doc_id, s.lang, s.n_transitions, s.nll_micros,
      |  CAST((CASE WHEN s.anm > t.t1 THEN 1 ELSE 0 END)
      |     + (CASE WHEN s.anm > t.t2 THEN 1 ELSE 0 END) AS INT)
      |    AS bucket,
      |  CASE WHEN s.anm <= t.t1 THEN 'head'
      |       WHEN s.anm > t.t2 THEN 'tail'
      |       ELSE 'middle' END AS bucket_label
      |FROM sc2 s JOIN th t ON s.lang IS NOT DISTINCT FROM t.lang
      |ORDER BY s.doc_id""".stripMargin

  /** Parameterized on the training slice only — t17/t17b train on the
    * src0 slice, sql5 (the TVF leg) on the whole corpus; ONE scoring
    * tail so the replays cannot drift. */
  private def hashed5LmOracleSql(
      trainPred: String = "source = 'src0'"): String =
    s"""WITH ${OracleFragments.h5TrainCtes("documents", "text",
            trainPred)},
       |${OracleFragments.h5ScoreCtes("documents", "text", 0.5, 0.4)}
       |SELECT d.doc_id,
       |  coalesce(s.n_transitions, 0) AS n_transitions,
       |  coalesce(s.nll_micros, 0) AS nll_micros,
       |  CASE WHEN coalesce(s.n_transitions, 0) = 0 THEN 0.0
       |    ELSE s.nll_micros / CAST(1000000.0 AS DOUBLE)
       |      / s.n_transitions END AS avg_nll
       |FROM documents d LEFT JOIN h5sc s USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  private def bigramLmOracleSql: String =
    s"""WITH ${OracleFragments.lmTrainCtes("documents", "text",
            "source = 'src0'")},
       |${OracleFragments.lmScoreCtes("documents", "text", 0.5)}
       |SELECT d.doc_id,
       |  coalesce(s.n_transitions, 0) AS n_transitions,
       |  coalesce(s.nll_micros, 0) AS nll_micros,
       |  CASE WHEN coalesce(s.n_transitions, 0) = 0 THEN 0.0
       |    ELSE s.nll_micros / CAST(1000000.0 AS DOUBLE)
       |      / s.n_transitions END AS avg_nll
       |FROM documents d LEFT JOIN lmsc s USING (doc_id)
       |ORDER BY doc_id""".stripMargin
}
