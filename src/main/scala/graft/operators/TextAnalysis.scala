package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (BASELINE.json north star): language id, quality scoring, token
  * counting, fingerprinting. All pure Column expressions — codegen'd,
  * shuffle-free, linear scans; at 100 TB these run at parquet-read speed.
  */
object TextAnalysis {

  /** Whitespace tokens (lowercased). */
  def tokens(c: Column): Column =
    split(lower(trim(c)), "\\s+")

  /** Whitespace token count; 0 for null/blank. */
  def tokenCountWs(c: Column): Column = tokenCountWsT(c, tokens(c))

  /** Variant over a pre-materialized token array. Higher-order functions
    * evaluate interpreted (no whole-stage codegen), so the regex split
    * inside `tokens` is NOT subexpression-eliminated across the lambda
    * expressions that use it — an annotate projection computing lang id,
    * quality, and counts re-splits the text ~6x per row. Materializing
    * the array once in its own projection (CollapseProject keeps a
    * multi-referenced non-cheap alias) makes every downstream op read it.
    */
  def tokenCountWsT(raw: Column, toks: Column): Column =
    when(raw.isNull || trim(raw) === "", 0).otherwise(size(toks))

  /** BPE-ish token count: word pieces + standalone punctuation — the
    * standard cheap proxy for LLM token counts (~= GPT-ish tokens for
    * ASCII text). */
  def tokenCountBpe(c: Column): Column =
    when(c.isNull, 0).otherwise(
      regexp_count(c, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]")))

  /** Character-class ratios (over total length, 6-decimal rounded so the
    * DuckDB oracle matches bit-for-bit). */
  def punctRatio(c: Column): Column = classRatio(c, "[^A-Za-z0-9\\s]")
  def digitRatio(c: Column): Column = classRatio(c, "[0-9]")
  private def classRatio(c: Column, cls: String): Column =
    when(c.isNull || length(c) === 0, 0.0).otherwise(
      round(regexp_count(c, lit(cls)).cast("double") / length(c), 6))

  /** Mean whitespace-token length, 6-decimal rounded. */
  def meanTokenLen(c: Column): Column = meanTokenLenT(c, tokens(c))

  def meanTokenLenT(raw: Column, toks: Column): Column =
    when(tokenCountWsT(raw, toks) === 0, 0.0).otherwise(
      round(aggregate(toks, lit(0L),
        (acc, t) => acc + length(t)).cast("double") / size(toks), 6))

  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that", "be")

  /** Fraction of tokens that are stopwords (quality signal: natural prose
    * sits around 0.3-0.5; keyword spam near 0). */
  def stopwordRatio(c: Column,
      stopwords: Seq[String] = englishStopwords): Column =
    stopwordRatioT(c, tokens(c), stopwords)

  def stopwordRatioT(raw: Column, toks: Column,
      stopwords: Seq[String] = englishStopwords): Column = {
    val sw = typedLit(stopwords)
    when(tokenCountWsT(raw, toks) === 0, 0.0).otherwise(
      round(size(filter(toks, t => array_contains(sw, t)))
        .cast("double") / size(toks), 6))
  }

  /** Composite quality score in [0,1]: long enough, prose-like
    * punctuation/digit profile, sane word lengths. The exact recipe is
    * a heuristic; what matters operationally is that it is deterministic,
    * cheap, and monotone in the obvious junk signals. */
  def qualityScore(c: Column): Column = qualityScoreT(c, tokens(c))

  def qualityScoreT(c: Column, toks: Column): Column = {
    val lenScore = least(length(c).cast("double") / 200.0, lit(1.0))
    val punctOk = lit(1.0) - least(punctRatio(c) * 5.0, lit(1.0))
    val digitOk = lit(1.0) - least(digitRatio(c) * 5.0, lit(1.0))
    val wordOk = when(meanTokenLenT(c, toks).between(3.0, 10.0), 1.0)
      .otherwise(0.5)
    // explicit null guard: least() SKIPS nulls, so without it a NULL text
    // would score lenScore=1.0 and rank as high-quality junk
    when(c.isNull, 0.0).otherwise(
      round((lenScore * 0.4 + punctOk * 0.25 + digitOk * 0.25
        + wordOk * 0.1), 6))
  }

  /** Marker-word profiles for the n-gram-heuristic language id. Small by
    * design (a real deployment swaps in bigger profiles as data). */
  val defaultLangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "una"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "une", "dans"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "den", "mit",
      "ein"))

  /** Language id by stopword voting: argmax of marker hits, ties and
    * zero-hit rows → "und" (undetermined). */
  def langId(c: Column,
      profiles: Seq[(String, Seq[String])] = defaultLangProfiles): Column =
    langIdT(c, tokens(c), profiles)

  def langIdT(c: Column, toks: Column,
      profiles: Seq[(String, Seq[String])] = defaultLangProfiles): Column = {
    val scores = profiles.map { case (lang, markers) =>
      lang -> size(filter(toks, t => array_contains(typedLit(markers), t)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (profile order) achieving the max, if any hits
    val ladder = scores.foldLeft(when(best <= 0, "und")) {
      case (acc, (lang, sc)) => acc.when(sc === best, lang)
    }
    when(c.isNull, "und").otherwise(ladder.otherwise("und"))
  }

  // ---- fused single-pass stats (native expression) ----------------------
  // One tokenization pass per row instead of ~7 interpreted lambda walks;
  // every derived column below is bit-identical to its composed
  // counterpart (pinned by LlmOpsSpec's equivalence test and the t1
  // DuckDB oracle).

  /** struct<n_tok, sum_len, n_stop, scores> — materialize ONCE per row
    * (its own projection) and derive everything from it. */
  def textStats(c: Column,
      stopwords: Seq[String] = englishStopwords,
      profiles: Seq[(String, Seq[String])] = defaultLangProfiles): Column =
    graft.expressions.TextStatsExpr.textStats(c, stopwords,
      profiles.map(_._2))

  def tokenCountWsS(raw: Column, st: Column): Column =
    when(raw.isNull || trim(raw) === "", 0).otherwise(st.getField("n_tok"))

  def meanTokenLenS(raw: Column, st: Column): Column =
    when(tokenCountWsS(raw, st) === 0, 0.0).otherwise(
      round(st.getField("sum_len").cast("double")
        / st.getField("n_tok"), 6))

  def stopwordRatioS(raw: Column, st: Column): Column =
    when(tokenCountWsS(raw, st) === 0, 0.0).otherwise(
      round(st.getField("n_stop").cast("double")
        / st.getField("n_tok"), 6))

  def qualityScoreS(c: Column, st: Column): Column = {
    val lenScore = least(length(c).cast("double") / 200.0, lit(1.0))
    val punctOk = lit(1.0) - least(punctRatio(c) * 5.0, lit(1.0))
    val digitOk = lit(1.0) - least(digitRatio(c) * 5.0, lit(1.0))
    val wordOk = when(meanTokenLenS(c, st).between(3.0, 10.0), 1.0)
      .otherwise(0.5)
    when(c.isNull, 0.0).otherwise(
      round((lenScore * 0.4 + punctOk * 0.25 + digitOk * 0.25
        + wordOk * 0.1), 6))
  }

  def langIdS(c: Column, st: Column,
      profiles: Seq[(String, Seq[String])] = defaultLangProfiles): Column = {
    val scores = profiles.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(st.getField("scores"), i + 1)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val ladder = scores.foldLeft(when(best <= 0, "und")) {
      case (acc, (lang, sc)) => acc.when(sc === best, lang)
    }
    when(c.isNull, "und").otherwise(ladder.otherwise("und"))
  }

  /** 64-bit content fingerprint of whitespace-normalized lowercase text
    * (document identity under trivial reformatting). */
  def fingerprint(c: Column): Column =
    xxhash64(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** Character n-grams (n in [nMin, nMax]) of the whitespace-normalized
    * lowercase text — the fastText-style feature set for learned
    * language ID (character statistics discriminate languages far more
    * robustly than word lists: they fire on inflected forms, partial
    * words, and scripts alike). Null → empty-string normalization →
    * only grams from the literal text. The normalized string binds
    * ONCE per row (the [[bindOnce]] discipline — a lambda referencing
    * the regexp_replace directly would re-normalize per gram). */
  def charNgrams(c: Column, nMin: Int, nMax: Int): Column = {
    require(nMin >= 1 && nMax >= nMin,
      s"charNgrams: need 1 <= nMin <= nMax, got ($nMin, $nMax)")
    bindOnce(regexp_replace(lower(trim(coalesce(c, lit("")))),
        "\\s+", " ")) { s =>
      concat((nMin to nMax).map { n =>
        when(length(s) >= n,
          transform(sequence(lit(1), length(s) - (n - 1)),
            i => s.substr(i, lit(n))))
          .otherwise(array().cast("array<string>"))
      }: _*)
    }
  }

  /** Evaluate `arr` ONCE and hand it to `f` as a lambda-bound value.
    *
    * Higher-order-function lambdas evaluate INTERPRETED, and an outer
    * expression referenced inside the lambda body re-evaluates on
    * EVERY element — `slice(tokens(c), i, k)` inside a transform
    * re-tokenizes the document once per window, O(n²) per doc
    * (measured as the dominant cost of the LM scoring stage before
    * [[bigramPairs]] got its projection fix). A single-element
    * transform binds the value to a lambda variable instead: the
    * argument array evaluates once, every inner reference is a cheap
    * bound read. */
  private[graft] def bindOnce(arr: Column)(f: Column => Column): Column =
    element_at(transform(array(arr), f), 1)

  /** Word k-shingles (the unit for MinHash / Jaccard). */
  def shingles(c: Column, k: Int): Column =
    bindOnce(tokens(c)) { t =>
      when(size(t) < k, array(concat_ws(" ", t)))
        .otherwise(transform(sequence(lit(0), size(t) - k),
          i => concat_ws(" ", slice(t, i + 1, lit(k)))))
    }

  /** Character-bigram entropy per document, in EXACT INTEGER MICROS —
    * the PORTABLE member of the compression-signal family. zlib
    * ([[compressionRatio]]) is the measured signal but has no SQL
    * mirror; this one computes in fixed point with the house rounding
    * discipline (one `round(ln·1e6)` per distinct bigram — the
    * [[graft.operators.Unigram]] `cost_mu` pattern — then integer-only
    * multiply/sum/divide), so a DuckDB oracle replays it bit for bit.
    * Repetitive, machine-generated text has few distinct bigrams and
    * low entropy; natural prose is high; both signals order documents
    * the same way on the extremes (spec-pinned against zlib).
    *
    * Per doc over its overlapping code-point bigrams (counts c_g,
    * total T = chars − 1):
    * {{{
    *   entropy_mu       = (Σ_g c_g · round(ln(T/c_g)·1e6)) div T
    *   distinct_ratio_ppm = distinct_bigrams · 1e6 div T
    * }}}
    * Docs with < 2 characters have no bigrams — all outputs 0.
    *
    * Scale shape: one explode (O(corpus chars)), one narrow
    * (id, bigram) shuffle with map-side combine, one per-doc agg —
    * the n-gram LM spine; no UDF, no driver work. */
  def bigramEntropy(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val grams = df.select(col(idCol),
        explode(expr(
          s"CASE WHEN length(coalesce($textCol, '')) >= 2 THEN " +
            s"transform(sequence(1, length(coalesce($textCol, '')) - 1), " +
            s"i -> substring(coalesce($textCol, ''), i, 2)) " +
            "ELSE cast(array() as array<string>) END")).as("g"))
    val counts = grams.groupBy(col(idCol), col("g"))
      .agg(count(lit(1)).as("c"))
    val tot = counts.groupBy(col(idCol))
      .agg(sum(col("c")).as("T"),
        count(lit(1)).as("distinct_bigrams"))
    val agg = counts.join(tot, Seq(idCol))
      .withColumn("term_mu", col("c") *
        expr("cast(round(ln(cast(T as double) / cast(c as double)) " +
          "* 1e6) as bigint)"))
      .groupBy(col(idCol))
      .agg(max(col("T")).as("n_bigrams"),
        max(col("distinct_bigrams")).as("distinct_bigrams"),
        expr("sum(term_mu) div max(T)").as("entropy_mu"),
        expr("max(distinct_bigrams) * 1000000L div max(T)")
          .as("distinct_ratio_ppm"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("distinct_bigrams"), lit(0L))
          .as("distinct_bigrams"),
        coalesce(col("entropy_mu"), lit(0L)).as("entropy_mu"),
        coalesce(col("distinct_ratio_ppm"), lit(0L))
          .as("distinct_ratio_ppm"))
  }

  /** Deflate compression ratio per document — the entropy-style quality
    * signal (Gopher-family filters): machine-generated / repetitive /
    * low-entropy text compresses far better than natural prose, binary
    * junk pasted into text barely compresses at all. Ratio =
    * compressed_bytes / utf8_bytes, 6-dec rounded; null text → null.
    *
    * zlib is imperative, so this runs as a mapPartitions pass with one
    * Deflater per PARTITION (construction is the fixed cost), reset
    * between rows — the same shape as [[Multimodal.decodeBatched]]: no
    * UDF-per-row allocation churn, results independent of partitioning
    * (each row compresses alone), payload never shuffles. Level 6 is
    * the zlib default — stable across JDKs for a given input, and the
    * SIGNAL (relative ordering) is what curation thresholds use. */
  def compressionRatio(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("compression_ratio", DoubleType, nullable = true)))
    val rows = df.select(col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("t")).rdd
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        // zlib state is NATIVE memory — GC pressure never reclaims it;
        // release on task completion (also covers early termination,
        // e.g. a limit() that abandons the iterator mid-partition)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](64 * 1024)
        it.map { r =>
          require(!r.isNullAt(0),
            s"compressionRatio: '$idCol' must be non-null and castable " +
              "to long")
          val ratio: java.lang.Double =
            if (r.isNullAt(1)) null
            else {
              val bytes = r.getString(1)
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)
              if (bytes.isEmpty) java.lang.Double.valueOf(1.0)
              else {
                deflater.reset()
                deflater.setInput(bytes)
                deflater.finish()
                var n = 0L
                while (!deflater.finished())
                  n += deflater.deflate(buf)
                java.lang.Double.valueOf(
                  math.rint(n.toDouble / bytes.length * 1e6) / 1e6)
              }
            }
          Row(r.getLong(0), ratio)
        }
      }
    spark.createDataFrame(rows, outSchema)
      .withColumnRenamed("id", idCol)
  }

  /** Corpus TF-IDF: the k most distinctive terms per document, scored
    * `tf * (ln((N+1)/(df+1)) + 1)` (the smoothed sklearn-style idf — never
    * negative, defined even for df = N). The standard keyword / topic
    * signal a curation pipeline feeds into domain tagging and
    * near-topic sampling, complementing [[langId]] (what language) and
    * the raw frequency top-k (t4: corpus-global terms): tf-idf surfaces
    * what is distinctive PER DOCUMENT.
    *
    * Scale shape: tf is one (doc, term) aggregation — O(corpus tokens)
    * shuffle, the floor for any term statistic; df re-aggregates the
    * (doc, term) DISTINCT pairs by term (vocabulary-sized); N is a
    * broadcast scalar. df joins back on term as a plain shuffle join
    * (the vocabulary of a 100 TB corpus does not fit a broadcast). The
    * final per-doc top-k is a row_number window: unlike the ANN case
    * (where topk_by replaces a |data|x|queries| gather) the windowed
    * relation here IS the tf relation — O(corpus) rows, one more
    * key-shuffle of what was already shuffled — and per-group size is
    * bounded by a single document's vocabulary, so there is no
    * single-reducer hazard. Ties break (score DESC, term ASC);
    * round(6) absorbs engine ulp differences in ln. The tf relation is
    * persisted (caller's CacheScope): it feeds both the join input and
    * the df aggregation, and without the persist the tokenize+explode+agg
    * over the whole corpus executes twice per action. */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int)(implicit scope: graft.CacheScope): DataFrame =
    tfIdfTopK(docs, idCol, textCol, k, count(lit(1)), "tfIdfTopTerms")

  /** Shared tf/df/score/rank machinery for the per-document and
    * per-group TF-IDF forms — they differ only in the key column and in
    * what N counts (rows vs distinct groups), and their DuckDB oracles
    * replay the same math, so one copy keeps the two forms (and their
    * oracles) from diverging. */
  private def tfIdfTopK(docs: DataFrame, keyCol: String, textCol: String,
      k: Int, nExpr: Column, caller: String)(
      implicit scope: graft.CacheScope): DataFrame = {
    require(k > 0, s"$caller: k must be positive, got $k")
    val tf = scope.cache(docs
      .select(col(keyCol), explode(tokens(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .groupBy(col(keyCol), col("term")).agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(nExpr.as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("score").desc, col("term"))
    tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") *
        (log((col("__n") + lit(1.0)) / (col("df") + lit(1.0))) +
          lit(1.0)), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(keyCol), col("rank"), col("term"), col("score"))
  }

  /** Group-level TF-IDF: the k most DISTINCTIVE terms per group (source,
    * domain, language bucket…), treating each group's pooled text as one
    * pseudo-document — `tf` is the group's term count, `df` the number
    * of groups containing the term, `N` the number of groups. The
    * corpus-composition analysis tool ("what characterizes this
    * source?") complementing [[tfIdfTopTerms]]'s per-document form.
    *
    * No text is ever concatenated: tf aggregates (group, term) counts
    * straight off the token explode, so the scale shape is identical to
    * [[tfIdfTopTerms]] — O(corpus tokens) floor, vocabulary-sized df
    * join, windowed top-k bounded by a group's vocabulary. N rides a
    * broadcast one-row count-distinct. Same smoothed idf, tie-break,
    * and round(6) as the per-doc form. */
  def tfIdfTopTermsByGroup(docs: DataFrame, groupCol: String,
      textCol: String, k: Int)(
      implicit scope: graft.CacheScope): DataFrame =
    tfIdfTopK(docs, groupCol, textCol, k, countDistinct(col(groupCol)),
      "tfIdfTopTermsByGroup")

  /** BM25 top-k retrieval: for each query string, the k best-matching
    * documents under Okapi BM25 with the Lucene-style non-negative idf
    * `ln((N - df + 0.5)/(df + 0.5) + 1)`. The corpus-exploration
    * primitive a curation pipeline uses to pull topic exemplars and
    * audit near-topic contamination — tf-idf ranks terms WITHIN a doc
    * (t7); BM25 ranks DOCS for a query, with tf saturation (k1) and
    * length normalization (b).
    *
    * Scale shape: scoring rides the inverted index — query terms
    * (broadcast; queries are few) join the (doc, term, tf) relation, so
    * only documents containing ≥1 query term are ever touched, never
    * all (query, doc) pairs. df joins by term (vocabulary-sized, plain
    * shuffle join — a 100 TB vocabulary doesn't broadcast), doc length
    * by id, and the final per-query top-k is the bounded topk_by
    * aggregate (k rows per partition per query reach the shuffle). The
    * tf relation is computed once and persisted under the caller's
    * [[graft.CacheScope]] — it feeds tf, df, AND dl.
    *
    * Determinism: per-term contributions are identical IEEE expression
    * trees in any engine; each is rounded to integer MICROS before the
    * per-document sum, so the sum is exact integer arithmetic —
    * immune to float summation order across partitions and engines
    * (ulp differences in ln are absorbed by the micro rounding). Ties
    * break (score DESC, id ASC).
    *
    * `maxDfFrac` drops query terms whose document frequency exceeds
    * that fraction of the corpus BEFORE scoring — the stop-term lever
    * that cut the 5M-doc stress run 104 s → 27.8 s at 0.01 (a term in
    * every doc contributes near-zero idf but corpus-sized join
    * traffic). Same knob, same filter expression, as the persisted
    * [[graft.pipelines.IndexStore.bm25TopK]]. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75, maxDfFrac: Double = 1.0)(
      implicit scope: graft.CacheScope): DataFrame = {
    require(k > 0, s"bm25TopK: k must be positive, got $k")
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    // cacheEager: tf feeds the `global` and `qtKept` BROADCAST builds
    // plus the main scoring job — concurrent broadcast threads over an
    // uncached tf each re-ran the tokenize+agg (4× at sf0.1, measured
    // 83 s -> ~30 s of executor time with the eager materialize).
    // fanout: tokenize is the per-row hot kernel; a few-files corpus
    // otherwise plans it into 1-3 scan tasks.
    val tf = scope.cacheEager(graft.Tables.fanout(docs, col(idCol))
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val global = broadcast(dl.agg(sum(col("dl")).as("dl_sum"))
      .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
      .select(col("n_docs"),
        (col("dl_sum").cast("double") / col("n_docs")).as("avgdl")))
    val qt = broadcast(queries
      .select(col(qidCol),
        explode(array_distinct(tokens(col(qtextCol)))).as("term"))
      .where(col("term") =!= ""))
    // stop-term cut BEFORE the (doc, term, tf) join — the df filter
    // applied afterwards would still ship every posting of an
    // every-doc term through the shuffle; cutting the term list first
    // is what turns the knob into a traffic lever, not a score tweak
    val qtKept = broadcast(
      if (maxDfFrac >= 1.0) qt.join(dfT, "term")
      else qt.join(dfT.crossJoin(global.select(col("n_docs")))
          .filter(col("df").cast("double") <=
            lit(maxDfFrac) * col("n_docs").cast("double"))
          .select(col("term"), col("df")), "term"))
    val scored = qtKept.join(tf, "term")
      .join(dl, idCol).crossJoin(global)
      .withColumn("c_micros", bm25ContribMicros(col("tf"), col("df"),
        col("dl"), col("n_docs"), col("avgdl"), k1, b))
      .groupBy(col(qidCol), col(idCol))
      .agg(sum(col("c_micros")).as("score_micros"))
    bm25Rank(scored, qidCol, idCol, k)
  }

  /** The Okapi per-(query-term, doc) contribution, rounded to integer
    * MICROS — the single definition both the one-shot [[bm25TopK]] and
    * the persisted [[graft.pipelines.IndexStore]] score with, so the
    * two retrieval paths cannot drift mathematically. Identical IEEE
    * expression tree in any engine; micro rounding absorbs libm ln ulp
    * differences and makes the per-document sum exact integer
    * arithmetic (partition-order-immune). */
  private[graft] def bm25ContribMicros(tf: Column, df: Column,
      dl: Column, nDocs: Column, avgdl: Column, k1: Double,
      b: Double): Column = {
    val idf = log((nDocs - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
    val contrib = idf * (tf * lit(k1 + 1.0)) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl))
    round(contrib * lit(1e6)).cast("long")
  }

  /** Shared final ranking: bounded topk_by per query over integer-micro
    * scores, ties (score DESC, id ASC), rank 1-based. */
  private[graft] def bm25Rank(scored: DataFrame, qidCol: String,
      idCol: String, k: Int): DataFrame =
    scored.groupBy(col(qidCol))
      .agg(graft.expressions.TopKByExpr.topkBy(
        col("score_micros").cast("double"), col(idCol).cast("long"), k)
        .as("__tk"))
      .select(col(qidCol), posexplode(col("__tk")))
      .select(col(qidCol), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(idCol), (col("col.ord") / lit(1e6)).as("score"))

  // ---- bigram language-model scoring (CCNet-style fluency filter) -------

  /** Per-document (prev, cur) bigram pairs as narrow rows — the shared
    * explode of [[bigramLm]] (training) and [[bigramLogProb]]
    * (scoring). The pair array is built per row from one tokenization
    * (no self-join on position), then exploded.
    *
    * The token array is projected as its OWN column first: the
    * transform lambda's `element_at(ws, i)` references evaluate
    * interpreted, and with `ws` inlined as the full
    * filter(split(lower(trim))) expression each of the 2(n−1) element
    * reads would RE-TOKENIZE the document — O(n²) per doc, measured as
    * the dominant cost of the LM stage. As a multi-referenced
    * non-cheap alias the projection survives CollapseProject, so the
    * lambda reads a per-row attribute instead. */
  private def bigramPairs(docs: DataFrame, keep: Seq[Column],
      textCol: String): DataFrame = {
    val withWs = docs.select(
      keep :+ filter(tokens(col(textCol)), w => w =!= "").as("__ws"): _*)
    val ws = col("__ws")
    val prs = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => struct(element_at(ws, i).as("prev"),
          element_at(ws, i + 1).as("cur"))))
      .otherwise(array().cast("array<struct<prev:string,cur:string>>"))
    withWs.select(keep :+ explode(prs).as("b"): _*)
      .select(keep :+ col("b.prev") :+ col("b.cur"): _*)
  }

  /** Train a bigram language model: the (prev, cur, c) count table over
    * the lowercased whitespace tokens of `docs`. This IS the model —
    * a mergeable DataFrame state (pure additive counts: maintain
    * incrementally by unioning batch counts and re-summing, the same
    * contract as the Count-Min and HLL states). Context totals and the
    * vocabulary are DERIVED from it at scoring time, so nothing else
    * needs persisting. O(corpus tokens) explode, one narrow
    * (prev, cur) shuffle with map-side combine. */
  def bigramLm(docs: DataFrame, textCol: String): DataFrame =
    bigramPairs(docs, Seq.empty, textCol)
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c"))

  /** Fold two [[bigramLm]] count tables (pure SUM — associative and
    * commutative, so a streamed corpus maintains the model at
    * O(delta)/batch via
    * [[graft.streaming.StreamingSummary.maintainBigramLmFromFiles]]
    * and the folded table is bit-identical to the one-shot count of
    * the union — integer counts, no float drift). */
  def foldBigramLm(prev: DataFrame, delta: DataFrame): DataFrame =
    prev.unionByName(delta).groupBy(col("prev"), col("cur"))
      .agg(sum(col("c")).as("c"))

  /** Score documents under a [[bigramLm]] model — the CCNet-style
    * fluency/quality signal (Wenzek et al. 2019, arXiv:1911.00359,
    * public literature: rank web text by LM perplexity against a clean
    * reference corpus; low perplexity ≈ fluent prose, high ≈ soup).
    *
    * Per transition: add-alpha smoothed conditional
    * `ln((c(prev,cur) + a) / (ctx(prev) + a·V))` with `ctx(prev)` the
    * model's context total (Σ over cur) and `V` its distinct-target
    * vocabulary — both derived from the count table. Returns per doc:
    * n_transitions, nll_micros (negated integer-micros sum — exact
    * integer arithmetic, so partition- and engine-order immune, the
    * BM25 pattern), and avg_nll (nll_micros / 1e6 / n_transitions; the
    * monotone stand-in for perplexity — `exp` of it would add libm
    * ULP drift and cannot change a threshold decision). Docs with < 2
    * tokens score (0, 0, 0.0), never null.
    *
    * Scale shape: the doc side collapses to per-doc (prev, cur, nk)
    * counts before joining; the model joins by (prev, cur) then prev —
    * vocabulary-sized shuffle joins (a 100 TB vocabulary doesn't
    * broadcast); V rides a broadcast one-row aggregate. O(corpus
    * tokens) floor, no all-pairs, no collect. */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      lmCounts: DataFrame, alpha: Double = 0.5)(
      implicit scope: graft.CacheScope): DataFrame = {
    require(alpha > 0, s"bigramLogProb: alpha must be > 0, got $alpha")
    val dp = bigramPairs(docs, Seq(col(idCol)), textCol)
      .groupBy(col(idCol), col("prev"), col("cur"))
      .agg(count(lit(1)).as("nk"))
    val scored = scoreDp(dp, idCol, lmCounts, alpha)
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_transitions"), lit(0L)).as("n_transitions"),
        coalesce(col("nll_micros"), lit(0L)).as("nll_micros"),
        when(coalesce(col("n_transitions"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("nll_micros") / lit(1e6) /
            col("n_transitions")).as("avg_nll"))
  }

  /** Score a per-doc (id, prev, cur, nk) transition-count frame against
    * one [[bigramLm]] model: (id, n_transitions, nll_micros). Factored
    * out so two-model scorers ([[crossEntropyDiff]]) tokenize the
    * corpus ONCE and reuse the same dp frame per model. */
  private def scoreDp(dp: DataFrame, idCol: String, lmCounts: DataFrame,
      alpha: Double)(implicit scope: graft.CacheScope): DataFrame = {
    // three consumers (ctx, vocab, the pair join) — cache or the
    // training explode re-runs per consumer
    val lm = scope.cache(lmCounts)
    val ctx = lm.groupBy(col("prev")).agg(sum(col("c")).as("ctx"))
    val vocab = broadcast(lm.agg(countDistinct(col("cur")).as("v")))
    val lp = log((coalesce(col("c"), lit(0L)) + lit(alpha)) /
      (coalesce(col("ctx"), lit(0L)) + lit(alpha) * col("v")))
    dp
      .join(lm, Seq("prev", "cur"), "left")
      .join(ctx, Seq("prev"), "left")
      .crossJoin(vocab)
      .withColumn("lp_micros",
        round(lp * lit(1e6)).cast("long") * col("nk"))
      .groupBy(col(idCol))
      .agg(sum(col("nk")).as("n_transitions"),
        (-sum(col("lp_micros"))).as("nll_micros"))
  }

  // ---- trigram language model (interpolated, CCNet-grade) ---------------

  /** Per-document (w1, w2, w3) trigram rows — the shared explode of
    * [[trigramLm]] and [[trigramLogProb]]. Same projection discipline
    * as [[bigramPairs]]: the token array materializes once as its own
    * column, the transform lambda reads the per-row attribute. */
  private def trigramTriples(docs: DataFrame, keep: Seq[Column],
      textCol: String): DataFrame = {
    val withWs = docs.select(
      keep :+ filter(tokens(col(textCol)), w => w =!= "").as("__ws"): _*)
    val ws = col("__ws")
    val trs = when(size(ws) >= 3,
      transform(sequence(lit(1), size(ws) - 2),
        i => struct(element_at(ws, i).as("w1"),
          element_at(ws, i + 1).as("w2"),
          element_at(ws, i + 2).as("w3"))))
      .otherwise(array()
        .cast("array<struct<w1:string,w2:string,w3:string>>"))
    withWs.select(keep :+ explode(trs).as("t"): _*)
      .select(keep :+ col("t.w1") :+ col("t.w2") :+ col("t.w3"): _*)
  }

  /** Train a trigram language model: the (w1, w2, w3, c) count table
    * over the lowercased whitespace tokens of `docs`. Like
    * [[bigramLm]], this single additive count table IS the model —
    * every lower-order statistic the interpolated scorer needs
    * (bigram/unigram marginals, context totals, vocabulary, corpus
    * total) is DERIVED from it at scoring time, so one mergeable state
    * maintains incrementally via [[foldTrigramLm]] with nothing
    * derived to go stale. O(corpus tokens) explode, one narrow
    * (w1, w2, w3) shuffle with map-side combine. */
  def trigramLm(docs: DataFrame, textCol: String): DataFrame =
    trigramTriples(docs, Seq.empty, textCol)
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c"))

  /** Fold two [[trigramLm]] count tables (pure SUM — associative and
    * commutative; the folded table is bit-identical to the one-shot
    * count of the union: integer counts, no float drift). */
  def foldTrigramLm(prev: DataFrame, delta: DataFrame): DataFrame =
    prev.unionByName(delta).groupBy(col("w1"), col("w2"), col("w3"))
      .agg(sum(col("c")).as("c"))

  /** Score documents under a [[trigramLm]] model with Jelinek-Mercer
    * interpolation (Jelinek & Mercer 1980; the standard fixed-weight
    * smoothing, and the shape of CCNet's KenLM-backed fluency signal —
    * Wenzek et al. 2019 filter by a 5-gram LM; trigram-with-backoff is
    * the same machinery one order up from [[bigramLogProb]]'s bigram):
    *
    *   p(w3 | w1 w2) = λ3·(c123+α)/(c12+αV) + λ2·(c23+α)/(c2+αV)
    *                 + λ1·(c3+α)/(T+αV)
    *
    * with every count a MARGINAL of the trigram table (c12 = Σ_w3 c123,
    * c23 = Σ_w1 c123, c2 = Σ_{w1,w3}, c3 = Σ_{w1,w2}, T = Σ all) and V
    * its distinct-w3 vocabulary. Interpolation (not stupid backoff)
    * keeps the scorer a single smooth expression: no zero-probability
    * branches, one ln per transition. ln rounds to integer MICROS
    * before the per-document sum (the BM25/bigram pattern) — exact
    * integer arithmetic, partition- and engine-order immune. Returns
    * per doc: n_transitions, nll_micros, avg_nll; docs with < 3 tokens
    * score (0, 0, 0.0), never null.
    *
    * Scale shape: the doc side collapses to per-doc (w1, w2, w3, nk)
    * counts; the model and its four marginals join by their n-gram
    * keys — vocabulary-sized shuffle joins, never broadcast; T and V
    * ride a broadcast one-row aggregate. O(corpus tokens) floor, no
    * collect. */
  def trigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      lmCounts: DataFrame, alpha: Double = 0.5, lambda3: Double = 0.6,
      lambda2: Double = 0.3, lambda1: Double = 0.1)(
      implicit scope: graft.CacheScope): DataFrame = {
    require(alpha > 0, s"trigramLogProb: alpha must be > 0, got $alpha")
    require(lambda3 > 0 && lambda2 >= 0 && lambda1 >= 0,
      s"trigramLogProb: weights must be non-negative (lambda3 > 0), " +
        s"got ($lambda3, $lambda2, $lambda1)")
    // five consumers (four marginals + the trigram join) — cache or the
    // training explode re-runs per consumer
    val lm = scope.cache(lmCounts)
    val ctx12 = lm.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c")).as("c12"))
    val m23 = lm.groupBy(col("w2"), col("w3"))
      .agg(sum(col("c")).as("c23"))
    val m2 = lm.groupBy(col("w2")).agg(sum(col("c")).as("c2"))
    val m3 = lm.groupBy(col("w3")).agg(sum(col("c")).as("c3"))
    val glob = broadcast(lm.agg(sum(col("c")).as("t_all"),
      countDistinct(col("w3")).as("v")))
    val dp = trigramTriples(docs, Seq(col(idCol)), textCol)
      .groupBy(col(idCol), col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("nk"))
    val p3 = (coalesce(col("c"), lit(0L)) + lit(alpha)) /
      (coalesce(col("c12"), lit(0L)) + lit(alpha) * col("v"))
    val p2 = (coalesce(col("c23"), lit(0L)) + lit(alpha)) /
      (coalesce(col("c2"), lit(0L)) + lit(alpha) * col("v"))
    val p1 = (coalesce(col("c3"), lit(0L)) + lit(alpha)) /
      (col("t_all") + lit(alpha) * col("v"))
    val lp = log(lit(lambda3) * p3 + lit(lambda2) * p2 +
      lit(lambda1) * p1)
    val scored = dp
      .join(lm, Seq("w1", "w2", "w3"), "left")
      .join(ctx12, Seq("w1", "w2"), "left")
      .join(m23, Seq("w2", "w3"), "left")
      .join(m2, Seq("w2"), "left")
      .join(m3, Seq("w3"), "left")
      .crossJoin(glob)
      .withColumn("lp_micros",
        round(lp * lit(1e6)).cast("long") * col("nk"))
      .groupBy(col(idCol))
      .agg(sum(col("nk")).as("n_transitions"),
        (-sum(col("lp_micros"))).as("nll_micros"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_transitions"), lit(0L)).as("n_transitions"),
        coalesce(col("nll_micros"), lit(0L)).as("nll_micros"),
        when(coalesce(col("n_transitions"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("nll_micros") / lit(1e6) /
            col("n_transitions")).as("avg_nll"))
  }

  // ---- hashed 5-gram language model (KenLM-shape stupid backoff) --------

  /** The portable n-gram hash: the 60-bit md5 prefix of the
    * space-joined tokens as a non-negative long — the same
    * DuckDB-replayable hash the shingle index and Count-Min use. */
  private def ngHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Train a hashed n-gram language model up to order `maxN`
    * (default 5 — the order of CCNet's published KenLM filter, Wenzek
    * et al. 2019, arXiv:1911.00359): the (n, h, c) count table over
    * md5-hashed space-joined token n-grams, ALL orders in one
    * additive table.
    *
    * Hashing is what makes order 5 hold at corpus scale (KenLM itself
    * keys n-grams by 64-bit hash — Heafield 2011, "KenLM: Faster and
    * Smaller Language Model Queries", WMT, public literature): a raw
    * 5-gram string key drags ~5 words of payload through the count
    * shuffle and the model state, where the hash fixes every key at 8
    * bytes — the shuffle rows are (int, long) with map-side combine,
    * and the stored model is O(distinct n-grams) longs, not strings.
    * A 60-bit collision (≈2⁻⁶⁰ per pair) merges two counts
    * deterministically; the oracle replays the identical hash, so
    * both engines see the identical table.
    *
    * Like [[bigramLm]]/[[trigramLm]], the table IS the model: backoff
    * context counts are simply the order-(n−1) rows (every n-gram
    * occurrence contributes its prefix's (n−1)-gram occurrence at the
    * same position), the unigram total and vocabulary derive at
    * scoring time, and the state maintains incrementally via
    * [[foldHashedLm]] — pure integer SUM, so a folded stream of batch
    * counts is bit-identical to the one-shot count. O(maxN · corpus
    * tokens) explode, one narrow (n, h) shuffle. */
  def hashedNgramLm(docs: DataFrame, textCol: String,
      maxN: Int = 5): DataFrame = {
    require(maxN >= 1 && maxN <= 8,
      s"hashedNgramLm: maxN must be in [1, 8], got $maxN")
    val withWs = docs.select(
      filter(tokens(col(textCol)), w => w =!= "").as("__ws"))
    val ws = col("__ws")
    val emptyG = array().cast("array<struct<n:int,h:bigint>>")
    val grams = (1 to maxN).map { n =>
      when(size(ws) >= n,
        transform(sequence(lit(1), size(ws) - (n - 1)),
          i => struct(lit(n).as("n"),
            ngHash(concat_ws(" ", slice(ws, i, lit(n)))).as("h"))))
        .otherwise(emptyG)
    }
    withWs.select(explode(concat(grams: _*)).as("g"))
      .select(col("g.n").as("n"), col("g.h").as("h"))
      .groupBy(col("n"), col("h")).agg(count(lit(1)).as("c"))
  }

  /** Fold two [[hashedNgramLm]] count tables (pure SUM — associative
    * and commutative; the folded table is bit-identical to the
    * one-shot count of the union: integer counts, no float drift). */
  def foldHashedLm(prev: DataFrame, delta: DataFrame): DataFrame =
    prev.unionByName(delta).groupBy(col("n"), col("h"))
      .agg(sum(col("c")).as("c"))

  /** Score documents under a [[hashedNgramLm]] model with STUPID
    * BACKOFF at order 5 (Brants et al. 2007, "Large Language Models
    * in Machine Translation", EMNLP, public literature: score
    * S(w|ctx) = c(ngram)/c(ctx) at the longest order with a nonzero
    * count, backing off with a fixed 0.4 factor per dropped order —
    * the un-normalized score Google used at web scale precisely
    * because it needs NO discount statistics, so the additive count
    * table remains the entire state):
    *
    *   S = c₅/c₄ᶜᵗˣ                   if c₅ > 0
    *     | b · c₄/c₃ᶜᵗˣ               if c₄ > 0
    *     | b² · c₃/c₂ᶜᵗˣ              if c₃ > 0
    *     | b³ · c₂/c₁ᶜᵗˣ              if c₂ > 0
    *     | b⁴ · (c₁+α)/(T+αV)         otherwise (add-alpha floor, so
    *                                   OOV words score finite like the
    *                                   bigram/trigram scorers)
    *
    * Every count is one lookup in the (n, h) table: the n-gram of
    * order k ending at the scored word, and its context the
    * (k−1)-gram directly before it. A context count can never be zero
    * when its n-gram count is positive (prefix property, see
    * [[hashedNgramLm]]). ln rounds to integer MICROS per transition
    * before the per-document sum (the BM25/t11/t16 pattern) — exact
    * integer arithmetic, partition- and engine-order immune. Docs
    * with < 5 tokens score (0, 0, 0.0), never null (matching the
    * bigram/trigram edge convention one order up).
    *
    * Scale shape: the doc side collapses to per-doc distinct
    * 5-windows (the 9 hashes + nk); the model joins NINE times, each
    * a shuffle join on one 8-byte hash key — vocabulary-sized, never
    * broadcast, no array payloads in any shuffle; T and V ride a
    * broadcast one-row aggregate. O(corpus tokens) floor, no
    * collect. */
  def hashed5gramLogProb(docs: DataFrame, idCol: String,
      textCol: String, lmCounts: DataFrame, alpha: Double = 0.5,
      backoff: Double = 0.4)(
      implicit scope: graft.CacheScope): DataFrame = {
    require(alpha > 0, s"hashed5gramLogProb: alpha must be > 0, got $alpha")
    require(backoff > 0 && backoff <= 1,
      s"hashed5gramLogProb: backoff must be in (0, 1], got $backoff")
    // ten consumers (nine order-filtered joins + the glob aggregate) —
    // cache or the training explode re-runs per consumer
    val lm = scope.cache(lmCounts)
    val glob = broadcast(lm.filter(col("n") === 1)
      .agg(sum(col("c")).as("t_all"), count(lit(1)).as("v")))
    def orderCounts(n: Int, hAs: String, cAs: String): DataFrame =
      lm.filter(col("n") === n)
        .select(col("h").as(hAs), col("c").as(cAs))
    val withWs = docs.select(col(idCol),
      filter(tokens(col(textCol)), w => w =!= "").as("__ws"))
    val ws = col("__ws")
    def g(i: Column, n: Int): Column =
      ngHash(concat_ws(" ", slice(ws, i, lit(n))))
    // window at i covers tokens w1..w5 = ws[i..i+4]; 9 lookups:
    // the order-k suffix gram ending at w5 and its order-(k-1) context
    val winT = "array<struct<h5:bigint,h4c:bigint,h4:bigint," +
      "h3c:bigint,h3:bigint,h2c:bigint,h2:bigint,h1c:bigint,h1:bigint>>"
    val wins = when(size(ws) >= 5,
      transform(sequence(lit(1), size(ws) - 4),
        i => struct(
          g(i, 5).as("h5"), g(i, 4).as("h4c"),
          g(i + 1, 4).as("h4"), g(i + 1, 3).as("h3c"),
          g(i + 2, 3).as("h3"), g(i + 2, 2).as("h2c"),
          g(i + 3, 2).as("h2"), g(i + 3, 1).as("h1c"),
          g(i + 4, 1).as("h1"))))
      .otherwise(array().cast(winT))
    val hs = Seq("h5", "h4c", "h4", "h3c", "h3", "h2c", "h2",
      "h1c", "h1")
    val dp = withWs.select(col(idCol) +: explode(wins).as("w") +: Nil: _*)
      .select(col(idCol) +: hs.map(h => col(s"w.$h").as(h)): _*)
      .groupBy(col(idCol) +: hs.map(col): _*)
      .agg(count(lit(1)).as("nk"))
    val b2 = backoff * backoff
    val b3 = b2 * backoff
    val b4 = b3 * backoff
    def cnt(s: String) = coalesce(col(s), lit(0L))
    val score =
      when(cnt("c5") > 0, col("c5").cast("double") / col("c4c"))
        .when(cnt("c4") > 0,
          lit(backoff) * (col("c4").cast("double") / col("c3c")))
        .when(cnt("c3") > 0,
          lit(b2) * (col("c3").cast("double") / col("c2c")))
        .when(cnt("c2") > 0,
          lit(b3) * (col("c2").cast("double") / col("c1c")))
        .otherwise(lit(b4) * ((cnt("c1") + lit(alpha)) /
          (col("t_all") + lit(alpha) * col("v"))))
    val scored = dp
      .join(orderCounts(5, "h5", "c5"), Seq("h5"), "left")
      .join(orderCounts(4, "h4c", "c4c"), Seq("h4c"), "left")
      .join(orderCounts(4, "h4", "c4"), Seq("h4"), "left")
      .join(orderCounts(3, "h3c", "c3c"), Seq("h3c"), "left")
      .join(orderCounts(3, "h3", "c3"), Seq("h3"), "left")
      .join(orderCounts(2, "h2c", "c2c"), Seq("h2c"), "left")
      .join(orderCounts(2, "h2", "c2"), Seq("h2"), "left")
      .join(orderCounts(1, "h1c", "c1c"), Seq("h1c"), "left")
      .join(orderCounts(1, "h1", "c1"), Seq("h1"), "left")
      .crossJoin(glob)
      .withColumn("lp_micros",
        round(log(score) * lit(1e6)).cast("long") * col("nk"))
      .groupBy(col(idCol))
      .agg(sum(col("nk")).as("n_transitions"),
        (-sum(col("lp_micros"))).as("nll_micros"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_transitions"), lit(0L)).as("n_transitions"),
        coalesce(col("nll_micros"), lit(0L)).as("nll_micros"),
        when(coalesce(col("n_transitions"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("nll_micros") / lit(1e6) /
            col("n_transitions")).as("avg_nll"))
  }

  /** Moore-Lewis cross-entropy difference data selection (Moore &
    * Lewis 2010, ACL, public literature: score each candidate sentence
    * by `H_in(s) − H_gen(s)` — its cross-entropy under an in-domain LM
    * minus under a general-corpus LM — and keep the lowest-scoring
    * candidates; a document that an in-domain model finds easier than
    * a general model reads like the target domain).
    *
    * Both cross-entropies come from the SAME add-alpha bigram machinery
    * as [[bigramLogProb]], in the same exact integer micros, and the
    * difference stays in integer micros — so the score, and therefore
    * the selection decision, is partition- and engine-order immune.
    * Per doc: n_transitions, nll_in_micros, nll_gen_micros,
    * ced_micros (= in − gen; negative ⇒ more in-domain-like),
    * avg_ced (ced_micros / 1e6 / n — exact IEEE from exact integers),
    * and selected (avg_ced < maxAvgCed over docs WITH transitions;
    * token-poor docs carry no evidence and are not selected).
    *
    * Scale shape: the corpus tokenizes ONCE into per-doc (prev, cur,
    * nk) counts; each model joins by (prev, cur) then prev —
    * vocabulary-sized shuffle joins, V on a broadcast one-row
    * aggregate. O(corpus tokens) floor, no all-pairs, no collect. */
  def crossEntropyDiff(docs: DataFrame, idCol: String, textCol: String,
      inDomainLm: DataFrame, generalLm: DataFrame, alpha: Double = 0.5,
      maxAvgCed: Double = 0.0)(
      implicit scope: graft.CacheScope): DataFrame = {
    require(alpha > 0, s"crossEntropyDiff: alpha must be > 0, got $alpha")
    // two consumers (one score pass per model) — cache or the corpus
    // tokenize-explode runs twice
    val dp = scope.cache(
      bigramPairs(docs, Seq(col(idCol)), textCol)
        .groupBy(col(idCol), col("prev"), col("cur"))
        .agg(count(lit(1)).as("nk")))
    val sIn = scoreDp(dp, idCol, inDomainLm, alpha)
      .withColumnRenamed("nll_micros", "nll_in_micros")
    val sGen = scoreDp(dp, idCol, generalLm, alpha)
      .select(col(idCol), col("nll_micros").as("nll_gen_micros"))
    docs.select(col(idCol))
      .join(sIn, Seq(idCol), "left")
      .join(sGen, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_transitions"), lit(0L)).as("n_transitions"),
        coalesce(col("nll_in_micros"), lit(0L)).as("nll_in_micros"),
        coalesce(col("nll_gen_micros"), lit(0L)).as("nll_gen_micros"))
      .withColumn("ced_micros",
        col("nll_in_micros") - col("nll_gen_micros"))
      .withColumn("avg_ced",
        when(col("n_transitions") === 0L, lit(0.0))
          .otherwise(col("ced_micros") / lit(1e6) / col("n_transitions")))
      .withColumn("selected",
        col("n_transitions") > 0L && col("avg_ced") < lit(maxAvgCed))
  }

  /** CCNet-style head/middle/tail assignment (Wenzek et al. 2019 §4.3:
    * split each language's corpus into thirds by LM perplexity; train
    * preferentially on the head). Ranks the scored docs within each
    * `groupCol` partition by (nll_micros·n⁻¹ order ≡ avg_nll, id
    * tie-break) and assigns `bucket = (rank−1)·nBuckets div n` — pure
    * integer arithmetic, so the split is exact, deterministic, and
    * engine-portable (no interpolated quantiles, whose float math
    * differs between engines). Labels: bucket 0 = "head",
    * last = "tail", everything between = "middle".
    *
    * Scale shape: one narrow (id, group, score) shuffle per group for
    * the ranking window — the document payload must NOT be in `scored`
    * (project it away first; [[bigramLogProb]]'s output already is).
    * Ranking is exact order statistics; at 100 TB prefer the
    * [[graft.ops.QuantileSketch]] thresholds and a broadcast-join
    * assignment if a per-group sort is too hot — the bucket SEMANTICS
    * here are the exact ground truth that path approximates. */
  def nllRankBuckets(scored: DataFrame, idCol: String, groupCol: String,
      nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"nllRankBuckets: need >= 2 buckets, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    // avg_nll derives from integer micros by IEEE divisions, which are
    // exactly specified — every engine computes the identical double,
    // so the (avg_nll, id) order is engine-exact. Docs with no
    // transitions (avg_nll 0.0) sort into the head by construction.
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("avg_nll"), col(idCol))
    val wn = Window.partitionBy(col(groupCol))
    scored
      .withColumn("__r", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn("bucket",
        expr(s"CAST((__r - 1) * $nBuckets DIV __n AS INT)"))
      .withColumn("bucket_label",
        when(col("bucket") === 0, "head")
          .when(col("bucket") === nBuckets - 1, "tail")
          .otherwise("middle"))
      .drop("__r", "__n")
  }

  /** The 100 TB form of [[nllRankBuckets]]: per-group quantile
    * THRESHOLDS from the deterministic [[graft.ops.QuantileSketch]]
    * (one narrow bucket-count shuffle), then a threshold-compare
    * assignment joined back per group (one row per group — AQE
    * broadcasts it) — no per-group global sort anywhere, which is the
    * step that goes hot when one language is half the corpus.
    *
    * Semantics: buckets approximate [[nllRankBuckets]]'s exact rank
    * split (boundaries land on sketch bucket edges — ~2⁻ᵐ relative
    * resolution), but assignment is MONOTONE in the score by
    * construction (a doc with lower avg NLL never lands in a later
    * bucket — spec-pinned, with agreement vs the exact split). The
    * measure is integer micros-per-transition (truncating division of
    * two exact integers), so the whole path is deterministic on any
    * engine/partitioning. */
  def nllSketchBuckets(scored: DataFrame, idCol: String,
      groupCol: String, nBuckets: Int = 3, m: Int = 9): DataFrame = {
    require(nBuckets >= 2,
      s"nllSketchBuckets: need >= 2 buckets, got $nBuckets")
    val measured = scored.withColumn("__anm",
      when(col("n_transitions") === 0L, lit(0L))
        .otherwise(expr("nll_micros DIV n_transitions")))
    val sketch = graft.ops.QuantileSketch.summarize(
      measured.select(col(groupCol), col("__anm")), Seq(groupCol),
      "__anm", m)
    val qs = (1 until nBuckets).map(i => (s"__t$i", i, nBuckets))
    val thresholds = graft.ops.QuantileSketch.quantiles(
      sketch, Seq(groupCol), qs)
    val bucket = qs.map { case (name, _, _) =>
      when(col("__anm") > col(name), 1).otherwise(0)
    }.reduce(_ + _)
    // NULL-SAFE threshold join: a null group key (missing language ID
    // is routine web data) gets its own sketch group and its own
    // thresholds, and [[nllRankBuckets]]'s window partitions bucket it
    // too — an inner equi-join would silently DROP every null-group
    // row and the two paths would disagree on row count, not just
    // boundary placement. The rename breaks the self-derived lineage
    // so the <=> condition can't be ambiguous.
    val th = thresholds.withColumnRenamed(groupCol, "__tg")
    measured.join(th, col(groupCol) <=> col("__tg")).drop("__tg")
      .withColumn("bucket", bucket)
      .withColumn("bucket_label",
        when(col("bucket") === 0, "head")
          .when(col("bucket") === nBuckets - 1, "tail")
          .otherwise("middle"))
      .drop(qs.map(_._1) :+ "__anm": _*)
  }

  // ---- BPE tokenizer training (byte-pair-encoding merges) ---------------

  /** Corpus word-frequency table — the ONLY corpus-sized step of BPE
    * training (one O(corpus tokens) explode + one narrow word
    * shuffle). Every merge iteration after it works on this
    * vocabulary-sized table, which is the property that makes BPE
    * trainable at 100 TB: the corpus is scanned once, the iterations
    * never touch it again. */
  def bpeWordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(
      explode(filter(tokens(col(textCol)), w => w =!= "")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Character symbols of a word. The between-chars lookahead split
    * also matches at end-of-string (Spark's split keeps trailing
    * empties, limit = -1), so the empty tail is filtered. */
  private def charSyms(word: Column): Column =
    filter(split(word, "(?!^)"), s => s =!= "")

  /** One greedy left-to-right merge pass of pair (lhs, rhs) over a
    * symbol array — the BPE apply step. The fold either fuses `x`
    * into the accumulator's last element (when that element is `lhs`
    * and `x` is `rhs`) or appends; because a fused element equals
    * `lhs+rhs` ≠ `lhs` (rhs is non-empty), a freshly fused element
    * can never fuse again, which is exactly greedy left-to-right
    * semantics — including the overlapping-run case (lhs == rhs in
    * "aaaa" gives [aa, aa], not [aa, a, a]). */
  private def mergeOnce(syms: Column, lhs: String, rhs: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(lhs) && x === lit(rhs),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
        .otherwise(concat(acc, array(x))))

  /** Train `nMerges` BPE merges (Sennrich/Haddow/Birch 2016,
    * arXiv:1508.07909, public literature: start from characters,
    * repeatedly fuse the most frequent adjacent symbol pair): returns
    * (iter, lhs, rhs, cnt) — the ordered merge table that IS the
    * tokenizer model. Ties break (cnt DESC, lhs ASC, rhs ASC), so
    * training is deterministic and engine-replayable.
    *
    * Scale shape: every iteration is a pair-explode + narrow
    * (lhs, rhs) count shuffle over the VOCABULARY table (not the
    * corpus), one single-row collect (the argmax — bounded
    * control-plane), and one per-row merge fold. Real tokenizer
    * trainers run thousands of merges; each added merge is O(vocab)
    * here, the same asymptotic contract. */
  def bpeTrain(wordFreq: DataFrame, nMerges: Int)(
      implicit scope: graft.CacheScope): DataFrame = {
    require(nMerges >= 1, s"bpeTrain: nMerges must be >= 1, got $nMerges")
    // runtime steer to the fast path: past a few dozen merges the
    // one-Spark-job-per-merge cost dominates (~seconds/merge) while
    // [[bpeTrainLocal]] trains the identical model (spec-pinned) from
    // ONE corpus-sized job + an O(vocab) driver index — use this path
    // only when the collapsed vocabulary cannot fit the driver.
    if (nMerges > 50) System.err.println(
      s"[graft] bpeTrain: $nMerges merges on the one-job-per-merge " +
        "path; bpeTrainLocal trains the same model with one corpus " +
        "pass (use it unless the vocabulary exceeds driver memory)")
    val spark = wordFreq.sparkSession
    var vocab = wordFreq.select(col("word"), col("freq"),
      charSyms(col("word")).as("syms"))
    // Each iteration materializes the vocab state behind a persisted-RDD
    // boundary (LogicalRDD) and releases the PREDECESSOR's blocks once
    // the current state is computed. Two reasons this is an RDD persist
    // and not scope.cache: (1) holding every iteration's frame leaked
    // one MEMORY_AND_DISK copy per merge — a memory tax shaped like the
    // merge count; (2) unpersisting a SQL-cache entry mid-loop triggers
    // CacheManager's dependent-cache recompile, which re-plans every
    // later iteration's entry WITHOUT the predecessor's InMemoryRelation
    // — inlining the whole merge chain into one Catalyst tree (measured:
    // an 8 GB heap OOM at 25 merges, in plan-string generation). The
    // RDD boundary keeps each iteration's plan two nodes deep forever.
    var prevRdd: org.apache.spark.rdd.RDD[Row] = null
    var rdd: org.apache.spark.rdd.RDD[Row] = null
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var k = 1
    var exhausted = false
    try while (k <= nMerges && !exhausted) {
      val schema = vocab.schema
      rdd = vocab.rdd.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val frame = spark.createDataFrame(rdd, schema)
      val pairs = frame.select(col("freq"), explode(
        when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("lhs"),
              element_at(col("syms"), i + 1).as("rhs"))))
          .otherwise(array()
            .cast("array<struct<lhs:string,rhs:string>>"))).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("freq")).as("cnt"))
      val top = pairs
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      // the collect computed (and persisted) the current state — the
      // predecessor's blocks are no longer reachable from any plan
      if (prevRdd ne null) prevRdd.unpersist(blocking = false)
      prevRdd = rdd
      if (top.isEmpty) exhausted = true // every word is one symbol
      else {
        val lhs = top(0).getString(0); val rhs = top(0).getString(1)
        merges += ((k, lhs, rhs, top(0).getLong(2)))
        vocab = frame.select(col("word"), col("freq"),
          mergeOnce(col("syms"), lhs, rhs).as("syms"))
        k += 1
      }
    } finally {
      // a job failure mid-loop (or a collect throw) must not leak this
      // session's persisted blocks — release BOTH live handles; after a
      // clean last iteration prevRdd eq rdd and unpersist is idempotent
      if (prevRdd ne null) prevRdd.unpersist(blocking = false)
      if ((rdd ne null) && (rdd ne prevRdd)) rdd.unpersist(blocking = false)
    }
    import spark.implicits._
    merges.toSeq.toDF("iter", "lhs", "rhs", "cnt")
  }

  /** Segment words with a trained merge list (the encode step):
    * applies each merge in training order — the standard BPE encoder
    * contract — and returns (`wordCol`, syms). Encode a corpus by
    * segmenting its VOCABULARY (this) and joining counts back by
    * word; never re-segment per occurrence.
    *
    * Two physical plans, one semantics (equivalence spec-pinned):
    * short merge lists fold into a Catalyst expression (codegen'd,
    * DuckDB-replayable — the gate path); past `exprMax` merges that
    * single-expression fold is a Catalyst-tree cliff (analysis and
    * codegen scale with the fold depth, and a 32k-merge production
    * tokenizer would blow both long before data size matters), so the
    * encode switches to [[bpeEncodeWords]] — an imperative
    * rank-ordered encoder over a broadcast merge table whose per-word
    * cost scales with the merges that APPLY to that word, not the
    * merge-table length. */
  def bpeSegmentWords(words: DataFrame, wordCol: String,
      merges: Seq[(String, String)], exprMax: Int = 64): DataFrame =
    if (merges.size > exprMax) bpeEncodeWords(words, wordCol, merges)
    else words.select(col(wordCol), merges.foldLeft(
      charSyms(col(wordCol))) {
        case (c, (l, r)) => mergeOnce(c, l, r)
      }.as("syms"))

  // ---- production-scale BPE: local trainer + imperative encoder ---------

  /** Unsigned byte-wise UTF-8 comparison — the ONE string order every
    * BPE tie-break uses: it is exactly Spark's UTF8String binary
    * ordering (what `orderBy(col("lhs"))` compares in [[bpeTrain]]) and
    * DuckDB's string ordering, so the local trainer, the distributed
    * trainer, and the SQL oracle all rank ties identically. Java's
    * `String.compareTo` (UTF-16 code-unit order) differs for
    * supplementary characters and must not leak in here. */
  private[operators] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Code-point symbols of a word — the imperative mirror of
    * [[charSyms]] (Java regex split at `(?!^)` advances by code point,
    * so both produce whole characters, never surrogate halves). */
  private def charSymsLocal(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** One greedy left-to-right merge pass — the imperative mirror of
    * [[mergeOnce]] (a freshly fused element never fuses again within
    * the pass; lhs==rhs runs keep every other match). */
  private def mergePass(syms: Array[String], lhs: String,
      rhs: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      val x = syms(i)
      if (out.nonEmpty && out(out.length - 1) == lhs && x == rhs)
        out(out.length - 1) = lhs + rhs
      else out += x
      i += 1
    }
    out.toArray
  }

  /** Train BPE merges at production merge counts (thousands), exactly
    * reproducing [[bpeTrain]]'s sequential merge table (same counts,
    * same (cnt DESC, lhs, rhs) byte-order tie-break — spec-pinned and
    * oracle-gated).
    *
    * The 100 TB shape: the corpus-sized work is [[bpeWordFreq]] — one
    * distributed explode + narrow word shuffle, done BEFORE this call.
    * Training then runs on the collapsed vocabulary, which is how
    * production tokenizer trainers work (HuggingFace/SentencePiece
    * train single-node over word counts): the classic incremental
    * algorithm — an inverted pair→words index plus delta-maintained
    * pair counts in a tie-ordered TreeSet — makes each merge cost
    * O(words containing the merged pair), NOT O(vocab), and needs
    * zero Spark jobs per merge. [[bpeTrain]]'s one-job-per-merge loop
    * (5.8 s/merge measured) is the unbounded-vocab fallback; this is
    * the path that reaches 32k merges (measured in `Stress`: >1000
    * merges, per-merge cost microseconds-to-milliseconds).
    *
    * `maxVocab` bounds the driver collect (the d10 postings-cap
    * discipline: bounded default, loud raise): the top `maxVocab`
    * words by (freq DESC, word) are kept — at 1M words ≈ tens of MB,
    * control-plane sized. A capped train is a deliberately coarser
    * model (the dropped tail is the rare-word fringe whose pair mass
    * is negligible), not an error — but it is reported loudly because
    * the merge table can differ from the uncapped one. */
  def bpeTrainLocal(wordFreq: DataFrame, nMerges: Int,
      maxVocab: Int = 1 << 20): DataFrame = {
    require(nMerges >= 1,
      s"bpeTrainLocal: nMerges must be >= 1, got $nMerges")
    require(maxVocab >= 1,
      s"bpeTrainLocal: maxVocab must be >= 1, got $maxVocab")
    val spark = wordFreq.sparkSession
    val collected = wordFreq
      .select(col("word").cast("string"), col("freq").cast("long"))
      .orderBy(col("freq").desc, col("word"))
      .limit(maxVocab + 1).collect()
    if (collected.length > maxVocab)
      System.err.println(s"[graft] bpeTrainLocal: vocabulary exceeds " +
        s"maxVocab=$maxVocab — training on the top $maxVocab words by " +
        "(freq DESC, word); the merge table may differ from an " +
        "uncapped train. Raise maxVocab to train on the full " +
        "vocabulary.")
    val words: Array[Array[String]] = new Array(
      math.min(collected.length, maxVocab))
    val freqs: Array[Long] = new Array(words.length)
    var wi = 0
    while (wi < words.length) {
      words(wi) = charSymsLocal(collected(wi).getString(0))
      freqs(wi) = collected(wi).getLong(1)
      wi += 1
    }

    type Pair = (String, String)
    val counts = new scala.collection.mutable.HashMap[Pair, Long]()
    val occ = new scala.collection.mutable
      .HashMap[Pair, scala.collection.mutable.HashSet[Int]]()
    // (cnt DESC, lhs, rhs) — the sequential argmax order, kept sorted
    // so each merge's argmax is an O(log P) peek instead of an
    // O(P) scan per iteration
    val order = new java.util.TreeSet[(Long, String, String)](
      new java.util.Comparator[(Long, String, String)] {
        def compare(a: (Long, String, String),
            b: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(b._1, a._1)
          if (c != 0) return c
          val l = utf8Compare(a._2, b._2)
          if (l != 0) return l
          utf8Compare(a._3, b._3)
        }
      })

    def wordPairs(syms: Array[String]): scala.collection.mutable
        .HashMap[Pair, Int] = {
      val m = new scala.collection.mutable.HashMap[Pair, Int]()
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        m.update(p, m.getOrElse(p, 0) + 1)
        i += 1
      }
      m
    }
    def bump(p: Pair, delta: Long): Unit = {
      val old = counts.getOrElse(p, 0L)
      if (old != 0L) order.remove((old, p._1, p._2))
      val nu = old + delta
      if (nu != 0L) {
        counts(p) = nu
        order.add((nu, p._1, p._2))
      } else counts.remove(p)
    }

    wi = 0
    while (wi < words.length) {
      wordPairs(words(wi)).foreach { case (p, n) =>
        bump(p, n.toLong * freqs(wi))
        occ.getOrElseUpdate(p,
          new scala.collection.mutable.HashSet[Int]()) += wi
      }
      wi += 1
    }

    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var k = 1
    while (k <= nMerges && !order.isEmpty) {
      val best = order.first()
      val (cnt, lhs, rhs) = best
      merges += ((k, lhs, rhs, cnt))
      val affected = occ.getOrElse((lhs, rhs),
        scala.collection.mutable.HashSet.empty[Int]).toArray
      var a = 0
      while (a < affected.length) {
        val w = affected(a)
        val oldPairs = wordPairs(words(w))
        words(w) = mergePass(words(w), lhs, rhs)
        val newPairs = wordPairs(words(w))
        oldPairs.foreach { case (p, n) =>
          val nn = newPairs.getOrElse(p, 0)
          if (nn != n) bump(p, (nn - n).toLong * freqs(w))
          if (nn == 0) occ.get(p).foreach(_ -= w)
        }
        newPairs.foreach { case (p, n) =>
          if (!oldPairs.contains(p)) {
            bump(p, n.toLong * freqs(w))
            occ.getOrElseUpdate(p,
              new scala.collection.mutable.HashSet[Int]()) += w
          }
        }
        a += 1
      }
      occ.remove((lhs, rhs))
      k += 1
    }
    import spark.implicits._
    merges.toSeq.toDF("iter", "lhs", "rhs", "cnt")
  }

  /** Imperative BPE encode: segment `wordCol` with a trained merge
    * list of ANY length — bit-identical to the [[bpeSegmentWords]]
    * expression fold (apply each merge in training order, one greedy
    * left-to-right pass each; spec-pinned equivalence), but with cost
    * per word proportional to the merges that actually APPLY to it.
    *
    * How: the merge table broadcasts once with a symbol→ranks index.
    * Per word, a min-rank heap holds candidate merges whose symbols
    * are currently present; candidates enter at initialization and
    * whenever a fusion creates their missing symbol (only ranks ABOVE
    * the fusing rank — training order is never revisited, exactly the
    * fold's semantics), each rank at most once, re-validated at pop.
    * Since pops are rank-ordered, the word's state at a merge's pop
    * equals its state at that merge's position in the sequential fold,
    * so the segmentation is identical. A raw word of L characters
    * applies at most L−1 merges, so the per-word cost is O(applied ×
    * (wordLen + log candidates)) — independent of the 32k-row merge
    * table.
    *
    * mapPartitions (not a UDF): one broadcast deref per partition, no
    * per-row closure allocation; each row segments alone, so results
    * are partitioning-independent. */
  def bpeEncodeWords(words: DataFrame, wordCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StringType,
      StructField, StructType}
    val spark = words.sparkSession
    val mArr = merges.toArray
    val symIdx: Map[String, Array[Int]] = mArr.zipWithIndex
      .flatMap { case ((l, r), i) => Seq(l -> i, r -> i) }
      .groupBy(_._1).map { case (s, xs) =>
        s -> xs.map(_._2).distinct.sorted
      }
    val bc = spark.sparkContext.broadcast((mArr, symIdx))
    val outSchema = StructType(Seq(
      StructField(wordCol, StringType, nullable = true),
      StructField("syms", ArrayType(StringType, containsNull = true),
        nullable = true)))
    val rows = words.select(col(wordCol).cast("string")).rdd
      .mapPartitions { it =>
        val (m, idx) = bc.value
        it.map { r =>
          if (r.isNullAt(0)) Row(null, null)
          else {
            val w = r.getString(0)
            Row(w, encodeOne(w, m, idx))
          }
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** Per-word rank-ordered encode (see [[bpeEncodeWords]]). */
  private def encodeOne(w: String, merges: Array[(String, String)],
      idx: Map[String, Array[Int]]): Array[String] = {
    var syms = charSymsLocal(w)
    if (syms.length < 2) return syms
    val present = new scala.collection.mutable.HashSet[String]()
    syms.foreach(present += _)
    val enq = new java.util.BitSet(merges.length)
    val pq = new scala.collection.mutable.PriorityQueue[Int]()(
      Ordering.Int.reverse)
    def tryEnq(r: Int): Unit = if (!enq.get(r)) {
      val (l, rr) = merges(r)
      if (present.contains(l) && present.contains(rr)) {
        enq.set(r); pq += r
      }
    }
    present.foreach(s => idx.getOrElse(s, Array.empty).foreach(tryEnq))
    while (pq.nonEmpty) {
      val r = pq.dequeue()
      val (l, rr) = merges(r)
      // re-validate: symbols may have been consumed since enqueue
      if (present.contains(l) && present.contains(rr)) {
        val ns = mergePass(syms, l, rr)
        if (ns.length != syms.length) {
          syms = ns
          present.clear()
          syms.foreach(present += _)
          val fused = l + rr
          idx.getOrElse(fused, Array.empty)
            .foreach(r2 => if (r2 > r) tryEnq(r2))
        }
      }
    }
    syms
  }

  /** Tokenize a corpus into per-document token-ID sequences — the
    * terminal step of the tokenizer pipeline (train → segment → IDS):
    * what a training-data writer actually emits. Returns
    * (vocab (token_id, sym), perDoc (idCol, n_tok, token_ids)).
    *
    * IDs are the byte-order rank of each symbol over the symbols THIS
    * corpus emits — deterministic and engine-replayable, but NOT
    * stable across corpus shards: a shard containing a character the
    * other shards lack adds a base symbol and shifts every rank above
    * it (the char family's base alphabet is the corpus's script
    * inventory, which the merge list alone cannot bound — unlike the
    * byte family's closed 256). For cross-shard-stable ids, snapshot
    * the TRAINING alphabet ([[bpeAlphabet]]) and encode with
    * [[bpeEncodeCorpusFrozen]] — the posture
    * [[graft.pipelines.TokenizerStore]] persists.
    *
    * Scale shape: the corpus contributes one distinct-word pass; the
    * VOCABULARY segments once ([[bpeSegmentWords]] — the imperative
    * encoder past 64 merges); the symbol table is MODEL-sized
    * (≤ alphabet + nMerges) so the sym→id join broadcasts; per-doc
    * sequences regroup by document with order carried as data
    * (positions sort inside the row), so no global ordering step
    * exists anywhere. Documents never re-segment per occurrence. */
  def bpeEncodeCorpus(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)])(
      implicit scope: graft.CacheScope): (DataFrame, DataFrame) =
    encodeCorpusWith(docs, idCol,
      filter(tokens(coalesce(col(textCol), lit(""))), w => w =!= ""),
      merges, fixedSyms = None)

  /** The char family's TRAINING alphabet: the distinct base symbols
    * segmentation emits over the collapsed word table — derived
    * through [[bpeSegmentWords]] itself (with zero merges), so the
    * snapshot is definitionally the encoder's own character
    * decomposition. Bounded by the corpus's script inventory (a
    * control-plane collect); persist it next to the merges and ids
    * become a pure function of the model. */
  def bpeAlphabet(wordFreq: DataFrame): Seq[String] =
    bpeSegmentWords(wordFreq.select(col("word")), "word", Seq.empty)
      .select(explode(col("syms")).as("sym")).distinct()
      .collect().map(_.getString(0)).toSeq
      .sortWith(utf8Compare(_, _) < 0)

  /** [[bpeEncodeCorpus]] with SHARD-STABLE ids: the symbol table is
    * the frozen (training alphabet ∪ merge outputs), so two disjoint
    * corpus shards encoded with the same stored model agree on every
    * id — the byte family's posture brought to the char family, with
    * one addition the closed byte alphabet never needs: a character
    * OUTSIDE the training alphabet (new script in a later crawl) maps
    * to the one reserved id `|table|` (the unigram `<unk>` posture)
    * instead of silently perturbing the id space. */
  def bpeEncodeCorpusFrozen(docs: DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)],
      alphabet: Seq[String])(
      implicit scope: graft.CacheScope): (DataFrame, DataFrame) = {
    require(alphabet.nonEmpty,
      "bpeEncodeCorpusFrozen: alphabet must be non-empty")
    val fixed = (alphabet ++ merges.map { case (l, r) => l + r }).distinct
    encodeCorpusWith(docs, idCol,
      filter(tokens(coalesce(col(textCol), lit(""))), w => w =!= ""),
      merges, fixedSyms = Some(fixed), oovToReservedId = true)
  }

  /** Per-doc FROZEN char-BPE token ids → the SPACE-JOINED SYMBOL
    * form — the char family's honest decode (the [[Unigram
    * .decodeCorpus]] posture): its words are lowercased and
    * whitespace-separated with no boundary marker, so the flat stream
    * cannot reconstruct word boundaries; the symbol form is the
    * deterministic inspection surface. The reserved OOV id `|table|`
    * ([[bpeEncodeCorpusFrozen]]'s contract) decodes to the literal
    * `<unk>`; other out-of-table ids raise loudly. Map-only. */
  def bpeDecodeCorpusFrozen(perDoc: DataFrame, idsCol: String,
      merges: Seq[(String, String)], alphabet: Seq[String]): DataFrame = {
    val fixed = (alphabet ++ merges.map { case (l, r) => l + r }).distinct
      .sortWith(utf8Compare(_, _) < 0)
    val table = typedLit(fixed :+ "<unk>")
    val mapped = transform(col(idsCol), id =>
      coalesce(try_element_at(table, id.cast("int") + 1),
        raise_error(concat(
          lit("TextAnalysis.bpeDecodeCorpusFrozen: token id "),
          id.cast("string"),
          lit(s" outside the model table (|table|=${fixed.length}, " +
            s"reserved OOV id=${fixed.length}) — ids and model do " +
            "not match")).cast("string"))))
    perDoc.withColumn("decoded", array_join(mapped, " "))
  }

  /** The shared encode tail behind [[bpeEncodeCorpus]] (char family,
    * lowercased words, corpus-occurring symbol ids),
    * [[bpeEncodeCorpusFrozen]] (char family, alphabet-snapshot ids),
    * and [[graft.operators.ByteBpe.encodeCorpus]] (byte family,
    * case-preserving mapped words, MODEL-derived symbol ids).
    * `fixedSyms`, when given, bounds the id table by the MODEL;
    * `oovToReservedId` maps symbols outside it to the one reserved id
    * `|fixedSyms|` (callers whose symbol universe is closed — the
    * byte family — leave it false and keep the inner join: an OOV
    * there is impossible by construction). */
  private[operators] def encodeCorpusWith(docs: DataFrame,
      idCol: String, wordsArr: Column, merges: Seq[(String, String)],
      fixedSyms: Option[Seq[String]],
      oovToReservedId: Boolean = false)(
      implicit scope: graft.CacheScope): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val words = docs.select(explode(wordsArr).as("word")).distinct()
    val seg = scope.cache(bpeSegmentWords(words, "word", merges))
    // the symbol table is bounded by the MODEL (alphabet + merges) —
    // a bounded control-plane collect, broadcast back as the id map
    val syms = fixedSyms
      .getOrElse(seg.select(explode(col("syms")).as("sym")).distinct()
        .collect().map(_.getString(0)).toSeq)
      .sortWith(utf8Compare(_, _) < 0)
    import spark.implicits._
    val vocab = syms.zipWithIndex
      .map { case (s, i) => (i, s) }.toSeq.toDF("token_id", "sym")
    val exploded = seg
      .select(col("word"), posexplode(col("syms")).as(Seq("spos", "sym")))
    val withIds =
      if (!oovToReservedId) exploded.join(broadcast(vocab), Seq("sym"))
      else exploded.join(broadcast(vocab), Seq("sym"), "left")
        .withColumn("token_id",
          coalesce(col("token_id"), lit(syms.length)))
    val segIds = withIds
      .groupBy(col("word"))
      .agg(transform(
        array_sort(collect_list(struct(col("spos"), col("token_id")))),
        p => p.getField("token_id")).as("ids"))
    val perDoc = docs
      .select(col(idCol),
        posexplode(wordsArr).as(Seq("wpos", "word")))
      .join(segIds, Seq("word"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("wpos"), col("ids")))),
        p => p.getField("ids"))).as("token_ids"))
    val out = docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("token_ids"), array().cast("array<int>"))
          .as("token_ids"))
      .withColumn("n_tok", size(col("token_ids")))
    (vocab, out)
  }

  // ---- multinomial Naive Bayes text classifier ---------------------------

  /** A trained [[nbTrain]] model: two pure-count DataFrames, both
    * mergeable states (associative/commutative integer SUMs, the same
    * contract as [[bigramLm]]/Count-Min/HLL — maintain incrementally
    * with [[nbFold]], bit-identical to retraining on the union).
    *
    * `termCounts`: (label, term, c) token counts. `docCounts`:
    * (label, n_docs) — the prior's numerator. Everything else a scorer
    * needs (per-label token totals, vocabulary size, priors) derives
    * from these at scoring time, so nothing derived is persisted to go
    * stale. */
  final case class NbModel(termCounts: DataFrame, docCounts: DataFrame)

  /** Train a multinomial Naive Bayes classifier over the lowercased
    * whitespace tokens of `docs` — the fastText-style corpus-quality /
    * source classifier of the LLM-data stack (public technique: count
    * per-class token frequencies, score by summed log-likelihoods; the
    * GPT-3 and LLaMA pipelines both filter CommonCrawl with exactly
    * such a linear classifier trained on a trusted-reference positive
    * class). One O(corpus tokens) explode, one narrow (label, term)
    * shuffle with map-side combine, one (label) shuffle for the doc
    * counts. */
  def nbTrain(docs: DataFrame, labelCol: String, textCol: String)
      : NbModel =
    nbTrainFeats(docs, labelCol,
      filter(tokens(col(textCol)), w => w =!= ""))

  /** [[nbTrain]] over an arbitrary feature-array Column (word tokens,
    * [[charNgrams]], shingles …) — the classifier machinery is
    * feature-agnostic; only the extractor varies. `feats` must never
    * produce the empty string (reserved by [[nbModelToCounts]]). */
  def nbTrainFeats(docs: DataFrame, labelCol: String,
      feats: Column): NbModel = {
    val toks = docs.select(col(labelCol).as("label"),
      explode(feats).as("term"))
    NbModel(
      toks.groupBy(col("label"), col("term")).agg(count(lit(1)).as("c")),
      docs.groupBy(col(labelCol).as("label"))
        .agg(count(lit(1)).as("n_docs")))
  }

  /** Fold a delta model into an existing one (pure SUMs — a streamed
    * corpus maintains the classifier at O(delta)/batch, and the folded
    * model is bit-identical to the one-shot train over the union:
    * integer counts, no float drift). */
  def nbFold(prev: NbModel, delta: NbModel): NbModel = NbModel(
    prev.termCounts.unionByName(delta.termCounts)
      .groupBy(col("label"), col("term")).agg(sum(col("c")).as("c")),
    prev.docCounts.unionByName(delta.docCounts)
      .groupBy(col("label")).agg(sum(col("n_docs")).as("n_docs")))

  /** Single-frame encoding of an [[NbModel]] — what a persisted or
    * streamed state store holds: the term rows plus one reserved
    * `term = ""` row per label carrying its doc count. The empty term
    * cannot collide with a real count (the tokenizer filters empties),
    * and the encoded frame folds by the SAME (label, term) SUM as the
    * term table itself — one versioned state, one fold rule. */
  def nbModelToCounts(m: NbModel): DataFrame =
    m.termCounts.unionByName(m.docCounts.select(col("label"),
      lit("").as("term"), col("n_docs").as("c")))

  /** Inverse of [[nbModelToCounts]]. */
  def nbModelFromCounts(counts: DataFrame): NbModel = NbModel(
    counts.filter(col("term") =!= ""),
    counts.filter(col("term") === "")
      .select(col("label"), col("c").as("n_docs")))

  /** Score documents under an [[NbModel]]: per (doc, label),
    * `ln P(label) + Σ_term n(term)·ln P(term|label)` with add-alpha
    * smoothing `P(term|label) = (c + α) / (tot_label + α·V)` (V = the
    * model's distinct-term vocabulary; a term unseen for EVERY label
    * still discriminates through the per-label denominators). Returns
    * one row per doc: `pred` (argmax label), `score_micros` (winning
    * log-score) and `margin_micros` (winner minus runner-up — the
    * confidence signal a downstream quality gate thresholds on; 0 when
    * the model has one label).
    *
    * Determinism: each log term is rounded to integer micros BEFORE
    * the per-document sum (the BM25/bigram-LM pattern), so scores are
    * exact integer arithmetic — partition- and engine-order immune —
    * and the argmax ties break (score DESC, label ASC).
    *
    * Scale shape: the doc side collapses to per-doc (term, nk) counts
    * before anything multiplies; the ×L label expansion rides a
    * broadcast of the label set (labels are few; the VOCABULARY is the
    * big side and joins by (term, label) — a vocabulary-sized shuffle,
    * never a broadcast). Priors and V are broadcast one-row/L-row
    * aggregates. The final argmax is a per-doc window over L rows.
    * O(corpus tokens · L) floor, no collect. */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
      model: NbModel, alpha: Double = 1.0)(
      implicit scope: graft.CacheScope): DataFrame =
    nbScoreFeats(docs, idCol,
      filter(tokens(col(textCol)), w => w =!= ""), model, alpha)

  /** [[nbScore]] over an arbitrary feature-array Column — pairs with
    * [[nbTrainFeats]]; the extractor must match the one the model was
    * trained with.
    *
    * Scale shape (the r10→r11 restructure): scoring used to expand
    * every per-doc (term, nk) row by L labels before the per-(doc,
    * label) sum — corpus-tokens × L aggregate input (330M rows / 6.9
    * GB heap measured at 5M docs, L = 4). Now the ×L dimension rides
    * INSIDE the row: the model pre-collapses to one L-long
    * lp_micros VECTOR per term (vocabulary-sized, built once), each
    * (doc, term) row joins that vector 1:1, and a native elementwise
    * [[graft.expressions.VecSumAggExpr.vecSumLong]] aggregate sums
    * label vectors per doc — aggregate input stays corpus-tokens
    * rows, per-group state is one L-long array. All arithmetic stays
    * exact integer micros, vectors are ordered by the byte-order
    * label sort, the argmax takes the FIRST maximal position, and the
    * runner-up is the second-largest value — so pred/score/margin are
    * bit-identical to the row-expanded formulation (the nb1/nb2/lang1
    * oracles still replay that shape in SQL and hash-match). The
    * label list, totals, priors, and OOV vector are bounded
    * control-plane collects/broadcasts (L rows each). */
  def nbScoreFeats(docs: DataFrame, idCol: String, feats: Column,
      model: NbModel, alpha: Double = 1.0)(
      implicit scope: graft.CacheScope): DataFrame = {
    require(alpha > 0, s"nbScoreFeats: alpha must be > 0, got $alpha")
    // two consumers (label totals + the grid's term spine)
    val tc = scope.cache(model.termCounts)
    val labels: Seq[String] = model.docCounts
      .select(col("label").cast("string")).collect()
      .map(_.getString(0)).toSeq
      .sortWith(utf8Compare(_, _) < 0)
    require(labels.nonEmpty, "nbScoreFeats: model has no labels")
    val labelArr = array(labels.map(lit): _*)
    def toVec(m: Column): Column =
      transform(labelArr, l => element_at(m, l))
    val ltot = tc.groupBy(col("label")).agg(sum(col("c")).as("tot"))
    val vocab = broadcast(tc.agg(countDistinct(col("term")).as("v")))
    // the label spine comes from docCounts (the authoritative label
    // set), not from termCounts: a label whose training docs all
    // produced EMPTY feature arrays exists in docCounts only, and a
    // grid keyed on termCounts labels would leave its map entry
    // absent — element_at(map, label) nulls that element of every
    // lps/oov vector and VecSumAgg aborts the whole scoring job.
    // coalesce(tot, 0) keeps the row-expanded formulation's behavior:
    // such a label scores through its prior + pure-smoothing
    // likelihoods, never an error.
    val ltv = model.docCounts.select(col("label"))
      .join(ltot, Seq("label"), "left")
      .select(col("label"), coalesce(col("tot"), lit(0L)).as("tot"))
      .crossJoin(vocab)
    val lpMicros = round(log(
      (coalesce(col("c"), lit(0L)) + lit(alpha)) /
        (col("tot") + lit(alpha) * col("v"))) * lit(1e6)).cast("long")
    // per-term label vector over the FULL (term × label) grid — the
    // vocabulary-sized model image the doc side joins 1:1 by term
    val tcl = tc.select(col("term")).distinct()
      .crossJoin(broadcast(ltv))
      .join(tc, Seq("term", "label"), "left")
      .withColumn("__lp", lpMicros)
      .groupBy(col("term"))
      .agg(map_from_entries(
        collect_list(struct(col("label"), col("__lp")))).as("__m"))
      .select(col("term"), toVec(col("__m")).as("lps"))
    // OOV vector (term in no label): c = 0 against every label
    val oov = broadcast(ltv
      .withColumn("__lp", round(log(lit(alpha) /
        (col("tot") + lit(alpha) * col("v"))) * lit(1e6)).cast("long"))
      .groupBy()
      .agg(map_from_entries(
        collect_list(struct(col("label"), col("__lp")))).as("__om"))
      .select(toVec(col("__om")).as("oov_lps")))
    val nTotal = broadcast(model.docCounts
      .agg(sum(col("n_docs")).as("n_total")))
    val priArr = broadcast(model.docCounts.crossJoin(nTotal)
      .withColumn("__pm",
        round(log(col("n_docs").cast("double") / col("n_total")) *
          lit(1e6)).cast("long"))
      .groupBy()
      .agg(map_from_entries(
        collect_list(struct(col("label"), col("__pm")))).as("__pm"))
      .select(toVec(col("__pm")).as("pri_lps")))
    val dt = docs
      .select(col(idCol), explode(feats).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("nk"))
    val contrib = dt.join(tcl, Seq("term"), "left").crossJoin(oov)
      .select(col(idCol),
        transform(coalesce(col("lps"), col("oov_lps")),
          x => x * col("nk")).as("__vec"))
    val sums = contrib.groupBy(col(idCol))
      .agg(graft.expressions.VecSumAggExpr.vecSumLong(col("__vec"))
        .as("__ll"))
    // empty/null-feature docs score prior-only (no __ll row)
    val total = docs.select(col(idCol))
      .join(sums, Seq(idCol), "left")
      .crossJoin(priArr)
      .withColumn("__tot", when(col("__ll").isNull, col("pri_lps"))
        .otherwise(zip_with(col("__ll"), col("pri_lps"),
          (a, b) => a + b)))
    total
      .withColumn("score_micros", array_max(col("__tot")))
      .withColumn("pred", element_at(labelArr,
        array_position(col("__tot"), col("score_micros")).cast("int")))
      .withColumn("margin_micros",
        when(size(col("__tot")) < 2, lit(0L))
          .otherwise(col("score_micros") -
            element_at(array_sort(col("__tot")), -2)))
      .select(col(idCol), col("pred"), col("score_micros"),
        col("margin_micros"))
  }

  /** Tokenizer fertility / compression profile per group (typically per
    * language) — the standard tokenizer-evaluation report: FERTILITY
    * (subword tokens per whitespace word; Ács 2019 popularized the
    * metric, SentencePiece/XLM-style multilingual work reports it per
    * language because a vocabulary trained on one language fragments
    * the others) and BYTES PER TOKEN (the compression the token budget
    * actually buys — what "how many tokens is 100 TB?" divides by).
    *
    * Tokenizer-agnostic: `perDocTokens` is any `(idCol, n_tok)` frame —
    * [[graft.operators.Unigram.encodeCorpus]], [[bpeEncodeCorpus]], or
    * a WordPiece pass all fit. Word and byte counts come from the raw
    * text (whitespace words over lower/trim — the same word definition
    * every tokenizer here segments; bytes = UTF-8 octets of the
    * untrimmed text). Null group keys report as 'und', the dataset-card
    * convention.
    *
    * Scale shape: one narrow projection over the corpus (id, group,
    * two counters), one equi-join on the id against the per-doc token
    * counts (both sides already partitioned by the id if the tokenizer
    * output was), and one partial-agged groupBy on the group key —
    * group cardinality is languages, so the final shuffle is bounded.
    * Ratios divide exact long sums as doubles at the very end —
    * IEEE-identical cross-engine, no accumulation drift. */
  def tokenFertility(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, perDocTokens: DataFrame): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    val base = docs.select(col(idCol),
      coalesce(col(groupCol).cast("string"), lit("und")).as("__grp"),
      size(filter(split(lower(trim(txt)), "\\s+"), w => w =!= ""))
        .cast("long").as("__words"),
      octet_length(txt).cast("long").as("__bytes"))
    base
      .join(perDocTokens.select(col(idCol),
        col("n_tok").cast("long").as("__tok")), Seq(idCol), "left")
      .groupBy(col("__grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__words")).as("n_words"),
        sum(coalesce(col("__tok"), lit(0L))).as("n_tokens"),
        sum(col("__bytes")).as("n_bytes"))
      .select(col("__grp").as(groupCol), col("n_docs"), col("n_words"),
        col("n_tokens"), col("n_bytes"),
        when(col("n_words") === 0L, lit(0.0))
          .otherwise(col("n_tokens").cast("double") /
            col("n_words").cast("double")).as("fertility"),
        when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(col("n_bytes").cast("double") /
            col("n_tokens").cast("double")).as("bytes_per_token"))
  }

  /** Tokenizer comparison card: one row PER FAMILY over the same
    * corpus — vocab size, token totals, unk-word counts, fertility
    * (tokens/word) and bytes/token — the artifact a data-pipeline team
    * reads when picking a tokenizer, with every number derived from
    * the families' own `perDoc` outputs so the card can never disagree
    * with the encoders it summarizes.
    *
    * `families` entries are (family, vocabSize, perDoc): `perDoc` must
    * carry `n_tok` (every encodeCorpus does) and MAY carry `n_unk`
    * (WordPiece's per-occurrence [UNK] word count); families without
    * it report 0 unk words — honest for byte-BPE (no-UNK by
    * construction), char-BPE and same-corpus unigram (the training
    * corpus's own characters are always segmentable).
    *
    * Ratios are single IEEE divisions of exact long sums (the t19
    * cross-engine posture). Scale shape: one corpus pass for the
    * word/byte counters + one 1-row aggregate per family, unioned —
    * nothing here rescans text per family. */
  def tokenizerCard(docs: DataFrame, idCol: String, textCol: String,
      families: Seq[(String, Long, DataFrame)]): DataFrame = {
    require(families.nonEmpty, "tokenizerCard: families must be non-empty")
    val txt = coalesce(col(textCol), lit(""))
    val corpus = docs.select(
      size(filter(split(lower(trim(txt)), "\\s+"), w => w =!= ""))
        .cast("long").as("__words"),
      octet_length(txt).cast("long").as("__bytes"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("__words")), lit(0L)).as("n_words"),
        coalesce(sum(col("__bytes")), lit(0L)).as("n_bytes"))
    val perFam = families.map { case (fam, vsize, perDoc) =>
      val unk =
        if (perDoc.columns.contains("n_unk"))
          coalesce(sum(col("n_unk").cast("long")), lit(0L))
        else lit(0L)
      perDoc.agg(
        coalesce(sum(col("n_tok").cast("long")), lit(0L)).as("n_tokens"),
        unk.as("n_unk_words"))
        .select(lit(fam).as("family"), lit(vsize).as("vocab_size"),
          col("n_tokens"), col("n_unk_words"))
    }.reduce(_ unionByName _)
    perFam.crossJoin(broadcast(corpus))
      .select(col("family"), col("vocab_size"), col("n_docs"),
        col("n_words"), col("n_bytes"), col("n_tokens"),
        col("n_unk_words"),
        when(col("n_words") === 0L, lit(0.0))
          .otherwise(col("n_unk_words").cast("double") /
            col("n_words").cast("double")).as("unk_rate"),
        when(col("n_words") === 0L, lit(0.0))
          .otherwise(col("n_tokens").cast("double") /
            col("n_words").cast("double")).as("fertility"),
        when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(col("n_bytes").cast("double") /
            col("n_tokens").cast("double")).as("bytes_per_token"))
  }

  // ---- PMI collocations (phrase mining) -----------------------------------

  /** Pointwise-mutual-information collocations over adjacent token
    * pairs (Church & Hanks 1990, "Word Association Norms, Mutual
    * Information, and Lexicography"; the word2phrase step of Mikolov
    * et al. 2013 scores the same adjacent-pair statistic) — the phrase
    * miner a tokenizer/vocabulary pipeline runs to find units like
    * "new york" that word-level counting splits apart.
    *
    * PMI(w1, w2) = ln(c12·N / (c1·c2)), reported as integer micros
    * (the codebase's cross-engine float discipline: exact long counts
    * in, ONE IEEE ln + ONE round at the end). `minCount` drops
    * low-support pairs BEFORE the ln — PMI's known pathology is that
    * hapax pairs of hapax words score highest (c12=c1=c2=1 gives
    * ln N), so unfiltered PMI is a typo detector, not a phrase miner.
    *
    * Scale shape: two O(corpus tokens) explodes into narrow count
    * shuffles with map-side combine ((w1,w2) pairs and unigrams), a
    * 1-row total broadcast, and a vocabulary-sized pair←unigram join —
    * the corpus is scanned twice and never shuffled as text. Pairs
    * never cross document boundaries. */
  def collocations(docs: DataFrame, textCol: String,
      minCount: Long = 5L): DataFrame =
    collocationsFrom(collocCounts(docs, textCol), minCount)

  /** The collocation model: two pure-count tables — `pairCounts`
    * (w1, w2, c12) over within-doc adjacent pairs and `uniCounts`
    * (w, c) unigrams. Both are mergeable states (associative integer
    * SUMs — the [[bigramLm]]/Count-Min/HLL contract): maintain them
    * incrementally with [[foldColloc]], bit-identical to recounting
    * the union. The corpus total derives from `uniCounts` at scoring
    * time, so nothing derived is persisted to go stale. */
  final case class CollocModel(pairCounts: DataFrame,
      uniCounts: DataFrame)

  /** Count pass over one corpus (or one delta batch). */
  def collocCounts(docs: DataFrame, textCol: String): CollocModel = {
    val toks = docs.select(
      filter(tokens(coalesce(col(textCol), lit(""))), w => w =!= "")
        .as("ws"))
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val pairs = toks.select(explode(
      when(size(col("ws")) >= 2,
        transform(sequence(lit(1), size(col("ws")) - 1),
          i => struct(element_at(col("ws"), i).as("w1"),
            element_at(col("ws"), i + 1).as("w2"))))
        .otherwise(array()
          .cast("array<struct<w1:string,w2:string>>"))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
    CollocModel(pairs, uni)
  }

  /** Merge two collocation models — additive integer sums, so folding
    * disjoint deltas reproduces the one-shot count tables exactly. */
  def foldColloc(a: CollocModel, b: CollocModel): CollocModel =
    CollocModel(
      a.pairCounts.unionByName(b.pairCounts)
        .groupBy(col("w1"), col("w2"))
        .agg(sum(col("c12")).as("c12")),
      a.uniCounts.unionByName(b.uniCounts)
        .groupBy(col("w")).agg(sum(col("c")).as("c")))

  /** The PMI scoring tail over a (possibly folded) model. */
  def collocationsFrom(model: CollocModel,
      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1,
      s"collocations: minCount must be >= 1, got $minCount")
    val uni = model.uniCounts
    val total = uni.agg(coalesce(sum(col("c")), lit(0L)).as("n"))
    model.pairCounts
      .filter(col("c12") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c12"),
        round(log((col("c12").cast("double") * col("n").cast("double"))
          / (col("c1").cast("double") * col("c2").cast("double")))
          * lit(1e6)).cast("long").as("pmi_micros"))
  }
}
