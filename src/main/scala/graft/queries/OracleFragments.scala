package graft.queries

/** Shared DuckDB-oracle CTE fragments. The Gopher metric chain and the
  * bigram-LM rebuild each gate several queries (t10/t13/c2 and
  * t11/t11b/t12/c2 respectively); one literal copy per oracle was the
  * divergence risk — a threshold fixed in one copy and not the others
  * would silently weaken a gate. Each fragment is a comma-terminated
  * run of CTEs with a documented output contract; callers splice them
  * after their own input CTEs.
  *
  * Naming: gopher CTEs are g-prefixed (gtok…gf), LM CTEs lm-prefixed
  * (lmw…lmsc) — disjoint by construction so one oracle can splice both.
  */
object OracleFragments {

  /** Gopher metric chain over CTE `input(doc_id, <textCol>)`.
    * Emits CTEs `gtok…ggm` and the terminal `gf` with one row per input
    * doc: doc_id, the 14 metrics (word_count … dup_10gram_char_frac),
    * and the `gopher_pass` boolean at the published thresholds. */
  def gopherCtes(input: String, textCol: String): String =
    s"""gtok AS (
       |  SELECT doc_id, coalesce($textCol, '') AS t,
       |    list_filter(string_split_regex(trim(coalesce($textCol, '')),
       |      '\\s+'), x -> x <> '') AS wsr
       |  FROM $input),
       |gtok2 AS (
       |  SELECT doc_id, t, wsr,
       |    list_transform(wsr, x -> lower(x)) AS ws,
       |    len(wsr) AS wc,
       |    list_filter(list_transform(string_split(t, chr(10)),
       |      x -> trim(x)), x -> x <> '') AS ls
       |  FROM gtok),
       |gscal AS (
       |  SELECT doc_id, ws, wc, ls,
       |    CASE WHEN wc = 0 THEN 0
       |      ELSE length(array_to_string(ws, ' ')) END AS dg,
       |    CASE WHEN wc = 0 THEN 0.0 ELSE round(CAST(
       |      coalesce(list_sum(list_transform(wsr, x -> length(x))), 0)
       |      AS DOUBLE) / wc, 6) END AS mean_word_len,
       |    CASE WHEN wc = 0 THEN 0.0 ELSE round(CAST(
       |      (length(t) - length(replace(t, '#', '')))
       |      + CAST((length(t) - length(replace(t, '...', ''))) / 3
       |          AS BIGINT)
       |      + (length(t) - length(replace(t, '…', '')))
       |      AS DOUBLE) / wc, 6) END AS symbol_word_ratio,
       |    CASE WHEN len(ls) = 0 THEN 0.0 ELSE round(CAST(
       |      len(list_filter(ls, x -> x LIKE '-%' OR x LIKE '*%'
       |        OR x LIKE '•%')) AS DOUBLE) / len(ls), 6)
       |      END AS bullet_line_frac,
       |    CASE WHEN len(ls) = 0 THEN 0.0 ELSE round(CAST(
       |      len(list_filter(ls, x -> x LIKE '%...' OR x LIKE '%…'))
       |      AS DOUBLE) / len(ls), 6) END AS ellipsis_line_frac,
       |    CASE WHEN wc = 0 THEN 0.0 ELSE round(CAST(
       |      len(list_filter(wsr, x -> regexp_matches(x, '[A-Za-z]')))
       |      AS DOUBLE) / wc, 6) END AS alpha_word_frac,
       |    CAST(len(list_filter(
       |      ['the','be','to','of','and','that','have','with'],
       |      s -> list_contains(ws, s))) AS BIGINT) AS stopword_hits,
       |    CASE WHEN len(ls) = 0 THEN 0.0 ELSE round(1.0 -
       |      CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls), 6)
       |      END AS dup_line_frac
       |  FROM gtok2),
       |glx AS (SELECT doc_id, unnest(ls) AS line FROM gtok2),
       |glc AS (SELECT doc_id, line, count(*) AS c, length(line) AS ll
       |        FROM glx GROUP BY 1, 2),
       |glm AS (SELECT doc_id, sum(c * ll) AS lchars,
       |          sum(CASE WHEN c >= 2 THEN c * ll ELSE 0 END) AS dchars
       |        FROM glc GROUP BY 1),
       |gns AS (SELECT unnest([2, 3, 4, 5, 10]) AS n),
       |ggx AS (SELECT doc_id, n,
       |    unnest(list_transform(range(1, len(ws) - n + 2),
       |      i -> array_to_string(ws[i:i+n-1], ' '))) AS gram
       |  FROM gtok2 CROSS JOIN gns WHERE len(ws) >= n),
       |ggc AS (SELECT doc_id, n, gram, count(*) AS c, length(gram) AS gl
       |        FROM ggx GROUP BY 1, 2, 3),
       |ggtop AS (SELECT doc_id, n, c * gl AS top_chars FROM (
       |    SELECT doc_id, n, c, gl, row_number() OVER (
       |      PARTITION BY doc_id, n ORDER BY c DESC, gram) AS rn
       |    FROM ggc) WHERE rn = 1),
       |ggdup AS (SELECT doc_id, n,
       |    sum(CASE WHEN c >= 2 THEN c * gl ELSE 0 END) AS dup_chars
       |  FROM ggc GROUP BY 1, 2),
       |ggm AS (SELECT doc_id,
       |    max(CASE WHEN n = 2 THEN top_chars END) AS t2,
       |    max(CASE WHEN n = 3 THEN top_chars END) AS t3,
       |    max(CASE WHEN n = 4 THEN top_chars END) AS t4,
       |    max(CASE WHEN n = 5 THEN dup_chars END) AS d5,
       |    max(CASE WHEN n = 10 THEN dup_chars END) AS d10
       |  FROM ggtop FULL JOIN ggdup USING (doc_id, n) GROUP BY 1),
       |gf AS (
       |  SELECT s.doc_id, CAST(s.wc AS BIGINT) AS word_count,
       |    s.mean_word_len, s.symbol_word_ratio, s.bullet_line_frac,
       |    s.ellipsis_line_frac, s.alpha_word_frac, s.stopword_hits,
       |    s.dup_line_frac,
       |    CASE WHEN coalesce(glm.lchars, 0) = 0 THEN 0.0 ELSE
       |      round(CAST(glm.dchars AS DOUBLE) / glm.lchars, 6)
       |      END AS dup_line_char_frac,
       |    CASE WHEN s.dg = 0 THEN 0.0 ELSE round(
       |      CAST(coalesce(ggm.t2, 0) AS DOUBLE) / s.dg, 6)
       |      END AS top_2gram_char_frac,
       |    CASE WHEN s.dg = 0 THEN 0.0 ELSE round(
       |      CAST(coalesce(ggm.t3, 0) AS DOUBLE) / s.dg, 6)
       |      END AS top_3gram_char_frac,
       |    CASE WHEN s.dg = 0 THEN 0.0 ELSE round(
       |      CAST(coalesce(ggm.t4, 0) AS DOUBLE) / s.dg, 6)
       |      END AS top_4gram_char_frac,
       |    CASE WHEN s.dg = 0 THEN 0.0 ELSE round(
       |      CAST(coalesce(ggm.d5, 0) AS DOUBLE) / s.dg, 6)
       |      END AS dup_5gram_char_frac,
       |    CASE WHEN s.dg = 0 THEN 0.0 ELSE round(
       |      CAST(coalesce(ggm.d10, 0) AS DOUBLE) / s.dg, 6)
       |      END AS dup_10gram_char_frac
       |  FROM gscal s LEFT JOIN glm USING (doc_id)
       |    LEFT JOIN ggm USING (doc_id)),
       |gfp AS (
       |  SELECT *,
       |    word_count BETWEEN 50 AND 100000
       |    AND mean_word_len BETWEEN 3.0 AND 10.0
       |    AND symbol_word_ratio <= 0.1 AND bullet_line_frac <= 0.9
       |    AND ellipsis_line_frac <= 0.3 AND alpha_word_frac >= 0.8
       |    AND stopword_hits >= 2 AND dup_line_frac <= 0.3
       |    AND dup_line_char_frac <= 0.2 AND top_2gram_char_frac <= 0.2
       |    AND top_3gram_char_frac <= 0.18
       |    AND top_4gram_char_frac <= 0.16
       |    AND dup_5gram_char_frac <= 0.15
       |    AND dup_10gram_char_frac <= 0.10 AS gopher_pass
       |  FROM gf)""".stripMargin

  /** Bigram-LM rebuild over CTE `corpus(doc_id, <textCol>, …)` with the
    * training slice selected by `trainPred`. Emits `lmw/lmp/lmc/lctx/
    * lv`: the (prev, cur, c) counts, context totals, and vocabulary.
    * `prefix` renames every emitted CTE (`<p>lmc` …) so two models can
    * coexist in one query (the Moore-Lewis oracle trains two). */
  def lmTrainCtes(corpus: String, textCol: String,
      trainPred: String, prefix: String = ""): String =
    s"""${prefix}lmw AS (
       |  SELECT *,
       |    list_filter(string_split_regex(lower(trim($textCol)), '\\s+'),
       |      x -> x <> '') AS __ws
       |  FROM $corpus),
       |${prefix}lmp AS (
       |  SELECT doc_id, __ws[i] AS prev, __ws[i+1] AS cur
       |  FROM ${prefix}lmw, unnest(generate_series(1, len(__ws) - 1)) AS t(i)
       |  WHERE len(__ws) >= 2 AND ($trainPred)),
       |${prefix}lmc AS (SELECT prev, cur, count(*) AS c
       |  FROM ${prefix}lmp GROUP BY 1, 2),
       |${prefix}lctx AS (SELECT prev, sum(c) AS ctx
       |  FROM ${prefix}lmc GROUP BY 1),
       |${prefix}lv AS (SELECT count(DISTINCT cur) AS v
       |  FROM ${prefix}lmc)""".stripMargin

  /** Add-alpha scoring of CTE `docs(doc_id, <textCol>)` against the
    * `lmc/lctx/lv` model CTEs (from [[lmTrainCtes]]). Emits `lmdw/lmdp/
    * lmdpc` and the terminal `lmsc(doc_id, n_transitions, nll_micros)`
    * — docs with < 2 tokens are ABSENT (callers LEFT JOIN + coalesce,
    * mirroring the engine). `alpha` must be the same Scala double the
    * engine folds. `prefix` renames the emitted CTEs (`<p>lmsc` …);
    * `modelPrefix` points the joins at a [[lmTrainCtes]] emitted with
    * that prefix — so one doc tokenization can't be shared across
    * models in SQL, but two (model, score) pairs can coexist. */
  def lmScoreCtes(docs: String, textCol: String, alpha: Double,
      prefix: String = "", modelPrefix: String = ""): String = {
    val m = modelPrefix
    s"""${prefix}lmdw AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(trim($textCol)), '\\s+'),
       |      x -> x <> '') AS __ws
       |  FROM $docs),
       |${prefix}lmdp AS (
       |  SELECT doc_id, __ws[i] AS prev, __ws[i+1] AS cur
       |  FROM ${prefix}lmdw, unnest(generate_series(1, len(__ws) - 1)) AS t(i)
       |  WHERE len(__ws) >= 2),
       |${prefix}lmdpc AS (SELECT doc_id, prev, cur, count(*) AS nk
       |          FROM ${prefix}lmdp GROUP BY 1, 2, 3),
       |${prefix}lmsc AS (
       |  SELECT ${prefix}lmdpc.doc_id,
       |    CAST(SUM(${prefix}lmdpc.nk) AS BIGINT) AS n_transitions,
       |    CAST(-SUM(CAST(round(ln(
       |        (coalesce(${m}lmc.c, 0) + CAST($alpha AS DOUBLE))
       |        / (coalesce(${m}lctx.ctx, 0)
       |           + CAST($alpha AS DOUBLE) * ${m}lv.v))
       |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT) * ${prefix}lmdpc.nk)
       |      AS BIGINT)
       |      AS nll_micros
       |  FROM ${prefix}lmdpc LEFT JOIN ${m}lmc USING (prev, cur)
       |    LEFT JOIN ${m}lctx USING (prev) CROSS JOIN ${m}lv
       |  GROUP BY 1)""".stripMargin
  }

  /** Trigram-LM rebuild over CTE `corpus(doc_id, <textCol>, …)` with
    * the training slice selected by `trainPred`. Emits `tgc` (the
    * (w1, w2, w3, c) counts), the four marginals `tg12/tg23/tg2/tg3`,
    * and `tgv` (corpus total + distinct-w3 vocabulary) — every derived
    * statistic recomputed from the ONE count table, exactly like the
    * engine's scorer. */
  def tgTrainCtes(corpus: String, textCol: String,
      trainPred: String): String =
    s"""tgw AS (
       |  SELECT *,
       |    list_filter(string_split_regex(lower(trim($textCol)), '\\s+'),
       |      x -> x <> '') AS __ws
       |  FROM $corpus),
       |tgp AS (
       |  SELECT doc_id, __ws[i] AS w1, __ws[i+1] AS w2, __ws[i+2] AS w3
       |  FROM tgw, unnest(generate_series(1, len(__ws) - 2)) AS t(i)
       |  WHERE len(__ws) >= 3 AND ($trainPred)),
       |tgc AS (SELECT w1, w2, w3, count(*) AS c
       |  FROM tgp GROUP BY 1, 2, 3),
       |tg12 AS (SELECT w1, w2, sum(c) AS c12 FROM tgc GROUP BY 1, 2),
       |tg23 AS (SELECT w2, w3, sum(c) AS c23 FROM tgc GROUP BY 1, 2),
       |tg2 AS (SELECT w2, sum(c) AS c2 FROM tgc GROUP BY 1),
       |tg3 AS (SELECT w3, sum(c) AS c3 FROM tgc GROUP BY 1),
       |tgv AS (SELECT sum(c) AS t_all, count(DISTINCT w3) AS v
       |  FROM tgc)""".stripMargin

  /** Interpolated trigram scoring of CTE `docs(doc_id, <textCol>)`
    * against the [[tgTrainCtes]] model CTEs: per transition
    * `ln(λ3·p3 + λ2·p2 + λ1·p1)` with the same add-alpha levels, each
    * probability and the interpolation in the exact IEEE expression
    * shape the engine folds, micro-rounded per transition before the
    * integer per-doc sum. Emits `tgsc(doc_id, n_transitions,
    * nll_micros)` — docs with < 3 tokens are ABSENT (callers LEFT
    * JOIN + coalesce). `alpha`/`lambda*` must be the same Scala
    * doubles the engine folds. */
  def tgScoreCtes(docs: String, textCol: String, alpha: Double,
      lambda3: Double, lambda2: Double, lambda1: Double): String = {
    val a = s"CAST($alpha AS DOUBLE)"
    s"""tgdw AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(trim($textCol)), '\\s+'),
       |      x -> x <> '') AS __ws
       |  FROM $docs),
       |tgdp AS (
       |  SELECT doc_id, __ws[i] AS w1, __ws[i+1] AS w2, __ws[i+2] AS w3
       |  FROM tgdw, unnest(generate_series(1, len(__ws) - 2)) AS t(i)
       |  WHERE len(__ws) >= 3),
       |tgdpc AS (SELECT doc_id, w1, w2, w3, count(*) AS nk
       |          FROM tgdp GROUP BY 1, 2, 3, 4),
       |tgsc AS (
       |  SELECT d.doc_id,
       |    CAST(SUM(d.nk) AS BIGINT) AS n_transitions,
       |    CAST(-SUM(CAST(round(ln(
       |        CAST($lambda3 AS DOUBLE) *
       |          ((coalesce(tgc.c, 0) + $a)
       |           / (coalesce(tg12.c12, 0) + $a * tgv.v))
       |        + CAST($lambda2 AS DOUBLE) *
       |          ((coalesce(tg23.c23, 0) + $a)
       |           / (coalesce(tg2.c2, 0) + $a * tgv.v))
       |        + CAST($lambda1 AS DOUBLE) *
       |          ((coalesce(tg3.c3, 0) + $a)
       |           / (tgv.t_all + $a * tgv.v)))
       |      * CAST(1000000.0 AS DOUBLE)) AS BIGINT) * d.nk) AS BIGINT)
       |      AS nll_micros
       |  FROM tgdpc d
       |    LEFT JOIN tgc USING (w1, w2, w3)
       |    LEFT JOIN tg12 USING (w1, w2)
       |    LEFT JOIN tg23 USING (w2, w3)
       |    LEFT JOIN tg2 USING (w2)
       |    LEFT JOIN tg3 USING (w3)
       |    CROSS JOIN tgv
       |  GROUP BY 1)""".stripMargin
  }

  /** Hashed 5-gram LM rebuild over CTE `corpus(doc_id, <textCol>, …)`
    * with the training slice selected by `trainPred`: the ONE
    * (n, h, c) count table over md5-60bit-hashed space-joined
    * 1..5-grams (`h5c`), plus `h5glob` (unigram total + vocabulary) —
    * replays [[graft.operators.TextAnalysis.hashedNgramLm]] hash for
    * hash (the `CAST('0x'||substr(md5(x),1,15) AS BIGINT)` spelling
    * of Spark's `conv(substring(md5(x),1,15),16,10)`). */
  def h5TrainCtes(corpus: String, textCol: String,
      trainPred: String): String = {
    val branches = (1 to 5).map { n =>
      s"""  SELECT $n AS n,
         |    CAST('0x' || substr(md5(array_to_string(
         |      __ws[i:i+${n - 1}], ' ')), 1, 15) AS BIGINT) AS h
         |  FROM h5tw, unnest(generate_series(1, len(__ws) - ${n - 1}))
         |    t(i)
         |  WHERE len(__ws) >= $n""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""h5tw AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(trim($textCol)), '\\s+'),
       |      x -> x <> '') AS __ws
       |  FROM $corpus WHERE ($trainPred)),
       |h5p AS (
       |$branches),
       |h5c AS (SELECT n, h, count(*) AS c FROM h5p GROUP BY 1, 2),
       |h5glob AS (SELECT sum(c) AS t_all, count(*) AS v
       |  FROM h5c WHERE n = 1)""".stripMargin
  }

  /** Stupid-backoff 5-gram scoring of CTE `docs(doc_id, <textCol>)`
    * against the [[h5TrainCtes]] model: per window the nine hash
    * lookups (order-k suffix gram ending at the scored word + its
    * order-(k−1) context), the CASE backoff chain with the SAME
    * Scala-folded constants, ln micro-rounded per transition before
    * the integer per-doc sum. Emits `h5sc(doc_id, n_transitions,
    * nll_micros)` — docs with < 5 tokens are ABSENT (callers LEFT
    * JOIN + coalesce). `alpha`/`backoff` must be the same Scala
    * doubles the engine folds. */
  def h5ScoreCtes(docs: String, textCol: String, alpha: Double,
      backoff: Double): String = {
    val a = s"CAST($alpha AS DOUBLE)"
    val b2 = backoff * backoff
    val b3 = b2 * backoff
    val b4 = b3 * backoff
    def hh(start: String, n: Int): String =
      s"CAST('0x' || substr(md5(array_to_string(" +
        s"__ws[$start:$start+${n - 1}], ' ')), 1, 15) AS BIGINT)"
    s"""h5dw AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(trim($textCol)), '\\s+'),
       |      x -> x <> '') AS __ws
       |  FROM $docs),
       |h5dp AS (
       |  SELECT doc_id,
       |    ${hh("i", 5)} AS k5, ${hh("i", 4)} AS k4c,
       |    ${hh("(i+1)", 4)} AS k4, ${hh("(i+1)", 3)} AS k3c,
       |    ${hh("(i+2)", 3)} AS k3, ${hh("(i+2)", 2)} AS k2c,
       |    ${hh("(i+3)", 2)} AS k2, ${hh("(i+3)", 1)} AS k1c,
       |    ${hh("(i+4)", 1)} AS k1
       |  FROM h5dw, unnest(generate_series(1, len(__ws) - 4)) t(i)
       |  WHERE len(__ws) >= 5),
       |h5dpc AS (
       |  SELECT doc_id, k5, k4c, k4, k3c, k3, k2c, k2, k1c, k1,
       |    count(*) AS nk
       |  FROM h5dp GROUP BY ALL),
       |h5sc AS (
       |  SELECT d.doc_id,
       |    CAST(SUM(d.nk) AS BIGINT) AS n_transitions,
       |    CAST(-SUM(CAST(round(ln(
       |      CASE
       |        WHEN coalesce(x5.c, 0) > 0
       |          THEN CAST(x5.c AS DOUBLE) / x4c.c
       |        WHEN coalesce(x4.c, 0) > 0
       |          THEN CAST($backoff AS DOUBLE)
       |            * (CAST(x4.c AS DOUBLE) / x3c.c)
       |        WHEN coalesce(x3.c, 0) > 0
       |          THEN CAST($b2 AS DOUBLE)
       |            * (CAST(x3.c AS DOUBLE) / x2c.c)
       |        WHEN coalesce(x2.c, 0) > 0
       |          THEN CAST($b3 AS DOUBLE)
       |            * (CAST(x2.c AS DOUBLE) / x1c.c)
       |        ELSE CAST($b4 AS DOUBLE)
       |          * ((coalesce(x1.c, 0) + $a)
       |             / (g.t_all + $a * g.v))
       |      END) * CAST(1000000.0 AS DOUBLE)) AS BIGINT) * d.nk)
       |      AS BIGINT) AS nll_micros
       |  FROM h5dpc d
       |    LEFT JOIN h5c x5 ON x5.n = 5 AND x5.h = d.k5
       |    LEFT JOIN h5c x4c ON x4c.n = 4 AND x4c.h = d.k4c
       |    LEFT JOIN h5c x4 ON x4.n = 4 AND x4.h = d.k4
       |    LEFT JOIN h5c x3c ON x3c.n = 3 AND x3c.h = d.k3c
       |    LEFT JOIN h5c x3 ON x3.n = 3 AND x3.h = d.k3
       |    LEFT JOIN h5c x2c ON x2c.n = 2 AND x2c.h = d.k2c
       |    LEFT JOIN h5c x2 ON x2.n = 2 AND x2.h = d.k2
       |    LEFT JOIN h5c x1c ON x1c.n = 1 AND x1c.h = d.k1c
       |    LEFT JOIN h5c x1 ON x1.n = 1 AND x1.h = d.k1
       |    CROSS JOIN h5glob g
       |  GROUP BY 1)""".stripMargin
  }

  /** HTML→text strip-chain replay (cu16/c3): mirrors
    * [[graft.operators.Curation.htmlToText]] regex by regex, in the
    * same order, over CTE `input(doc_id, <extras...>, <htmlCol>)`.
    * Emits CTEs `hs1…hs8` and the terminal
    * `hclean(doc_id, <extras...>, clean)`. */
  def htmlStripCtes(input: String, htmlCol: String,
      extras: Seq[String] = Seq.empty): String = {
    val ex = extras.map(_ + ", ").mkString
    s"""hs1 AS (SELECT doc_id, $ex regexp_replace($htmlCol,
       |  '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g')
       |  AS t FROM $input),
       |hs2 AS (SELECT doc_id, $ex
       |  regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM hs1),
       |hs3 AS (SELECT doc_id, $ex regexp_replace(t,
       |  '(?i)<(br|hr)[^>]*>|</(p|div|li|tr|h[1-6]|title)>', chr(10),
       |  'g') AS t FROM hs2),
       |hs4 AS (SELECT doc_id, $ex
       |  regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM hs3),
       |hs5 AS (SELECT doc_id, $ex
       |  replace(replace(replace(replace(replace(replace(t,
       |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
       |    '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS t
       |  FROM hs4),
       |hs6 AS (SELECT doc_id, $ex
       |  regexp_replace(t, '[ \\t]+', ' ', 'g') AS t FROM hs5),
       |hs7 AS (SELECT doc_id, $ex
       |  regexp_replace(t, ' ?\\n ?', chr(10), 'g') AS t FROM hs6),
       |hs8 AS (SELECT doc_id, $ex regexp_replace(t, '\\n{3,}',
       |  chr(10) || chr(10), 'g') AS t FROM hs7),
       |hclean AS (SELECT doc_id, $ex
       |  regexp_replace(t, '^\\s+|\\s+$$', '', 'g') AS clean FROM hs8)"""
      .stripMargin
  }

  /** BPE training replay (t14/t14b): word-frequency table, character
    * symbol rows, then `n` merge iterations. Each iteration k defines
    * `mg_k` (the argmax pair with count, ties (cnt DESC, lhs, rhs))
    * and `syms{k}` (the vocabulary re-segmented after applying that
    * merge greedily left-to-right).
    *
    * Greedy-apply is replayed WITHOUT a sequential fold: a matching
    * position is applied iff no overlapping match to its left was
    * applied. Overlapping matches only arise in runs of a repeated
    * symbol (lhs == rhs), where greedy keeps every other match — so
    * "applied" = even offset from its contiguous-run start, which is
    * pure window SQL (`ap_k`). */
  def bpeCtes(rel: String, textCol: String, n: Int): String =
    bpeCtesFromWfreq(
      s"""  SELECT word, count(*) AS freq FROM (
         |    SELECT unnest(string_split_regex(lower(trim($textCol)),
         |      '\\s+')) AS word
         |    FROM $rel) t
         |  WHERE word <> '' GROUP BY 1""".stripMargin, n)

  /** [[bpeCtes]] with a caller-supplied `wfreq(word, freq)` body — the
    * byte-level family feeds its byte-mapped (case-PRESERVING) word
    * table here; the merge-iteration chain is shared verbatim. DuckDB's
    * `word[pos]` indexing is per CHARACTER, and every byte-mapped
    * symbol is exactly one char, so `syms0` is the byte decomposition
    * for mapped words just as it is the char decomposition for plain
    * ones. `prefix` renames every emitted CTE (`<p>wfreq`, `<p>syms0`,
    * `<p>mg_1` …) so two merge chains — e.g. t24's char and byte
    * families — coexist in one query. */
  def bpeCtesFromWfreq(wfreqBody: String, n: Int,
      prefix: String = ""): String = {
    val x = prefix
    val base =
      s"""${x}wfreq AS MATERIALIZED (
         |$wfreqBody),
         |${x}syms0 AS MATERIALIZED (
         |  SELECT word, freq, pos, word[pos] AS sym FROM (
         |    SELECT word, freq,
         |      unnest(generate_series(1, len(word))) AS pos
         |    FROM ${x}wfreq) t)""".stripMargin
    val iters = (1 to n).map { k =>
      val p = s"${x}syms${k - 1}"
      s"""${x}pc_$k AS MATERIALIZED (
         |  SELECT a.sym AS lhs, b.sym AS rhs, SUM(a.freq) AS cnt
         |  FROM $p a JOIN $p b ON a.word = b.word AND b.pos = a.pos + 1
         |  GROUP BY 1, 2),
         |${x}mg_$k AS MATERIALIZED (
         |  SELECT lhs, rhs, cnt FROM ${x}pc_$k
         |  ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |${x}mt_$k AS MATERIALIZED (
         |  SELECT a.word, a.pos
         |  FROM $p a JOIN $p b ON a.word = b.word AND b.pos = a.pos + 1
         |    CROSS JOIN ${x}mg_$k m
         |  WHERE a.sym = m.lhs AND b.sym = m.rhs),
         |${x}ap_$k AS MATERIALIZED (
         |  SELECT word, pos FROM (
         |    SELECT word, pos,
         |      MIN(pos) OVER (PARTITION BY word, grp) AS rstart
         |    FROM (SELECT word, pos,
         |        pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos)
         |          AS grp
         |      FROM ${x}mt_$k) g) h
         |  WHERE (pos - rstart) % 2 = 0),
         |${x}syms$k AS MATERIALIZED (
         |  SELECT word, freq,
         |    ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos,
         |    sym
         |  FROM (
         |    SELECT s.word, s.freq, s.pos,
         |      CASE WHEN a1.pos IS NOT NULL THEN s.sym || m.rhs
         |           ELSE s.sym END AS sym
         |    FROM $p s CROSS JOIN ${x}mg_$k m
         |      LEFT JOIN ${x}ap_$k a1 ON a1.word = s.word AND a1.pos = s.pos
         |      LEFT JOIN ${x}ap_$k a2
         |        ON a2.word = s.word AND a2.pos = s.pos - 1
         |    WHERE a2.pos IS NULL) t)""".stripMargin
    }
    (base +: iters).mkString(",\n")
  }

  /** Byte-map rebuild over `rel(doc_id, <textCol>)` — replays
    * [[graft.expressions.ByteMap]] (the GPT-2 bytes_to_unicode
    * bijection) from FIRST PRINCIPLES: per-char code points via
    * `unicode()`, UTF-8 byte derivation via the public encoding
    * arithmetic (1-4 bytes by code-point range), then the printable /
    * shifted mapping as a CASE — no table literal copied from the
    * engine, so a drift in the engine's map breaks the hash. Produces:
    * `bw(doc_id, wpos, word)` — case-preserving whitespace words with
    * positions — and `bmapped(word, bword)` — each distinct word's
    * byte-mapped form. */
  def byteMapCtes(rel: String, textCol: String): String =
    s"""bwx AS MATERIALIZED (
       |  SELECT doc_id, list_filter(string_split_regex(
       |    trim(coalesce($textCol, '')), '\\s+'), x -> x <> '') AS __ws
       |  FROM $rel),
       |bw AS MATERIALIZED (
       |  SELECT doc_id, i AS wpos, __ws[i] AS word
       |  FROM bwx, unnest(generate_series(1, len(__ws))) t(i)),
       |bdist AS (SELECT DISTINCT word FROM bw),
       |bchars AS (
       |  SELECT word, i, unicode(word[i]) AS p
       |  FROM bdist, unnest(generate_series(1, len(word))) t(i)),
       |bnb AS (
       |  SELECT word, i, p,
       |    CASE WHEN p < 128 THEN 1 WHEN p < 2048 THEN 2
       |         WHEN p < 65536 THEN 3 ELSE 4 END AS nb
       |  FROM bchars),
       |bbytes AS (
       |  SELECT word, i, j,
       |    CASE WHEN nb = 1 THEN p
       |         WHEN j = 1 THEN (256 - CASE nb WHEN 2 THEN 64
       |             WHEN 3 THEN 32 ELSE 16 END)
       |           + (p // CASE nb WHEN 2 THEN 64 WHEN 3 THEN 4096
       |               ELSE 262144 END)
       |         ELSE 128 + ((p // CASE (nb - j) WHEN 0 THEN 1
       |             WHEN 1 THEN 64 WHEN 2 THEN 4096 ELSE 262144 END)
       |           % 64)
       |    END AS b
       |  FROM bnb, unnest(generate_series(1, nb)) t(j)),
       |bmapped AS MATERIALIZED (
       |  SELECT word, string_agg(chr(
       |    CASE WHEN (b BETWEEN 33 AND 126) OR (b BETWEEN 161 AND 172)
       |           OR (b BETWEEN 174 AND 255) THEN b
       |         WHEN b <= 32 THEN 256 + b
       |         WHEN b BETWEEN 127 AND 160 THEN 289 + (b - 127)
       |         ELSE 323 END), '' ORDER BY i, j) AS bword
       |  FROM bbytes GROUP BY word)""".stripMargin

  /** The byte-level wfreq body for [[bpeCtesFromWfreq]]: word
    * frequencies over the byte-MAPPED (case-preserving) words that
    * [[byteMapCtes]]' `bw`/`bmapped` provide. */
  def byteWfreqBody: String =
    s"""  SELECT m.bword AS word, count(*) AS freq
       |  FROM bw JOIN bmapped m USING (word)
       |  GROUP BY 1""".stripMargin

  /** WordPiece rebuild over `corpus(doc_id, <textCol>)` — mirrors
    * [[graft.operators.WordPiece]] step for step. The seed CTEs
    * (`wpw(word, freq)` → `wpsubs` positional substring counts →
    * `wpv(piece, cnt)` the kept vocabulary: all single-char pieces of
    * both forms + top-`vocabSize` multis by (cnt DESC, piece ASC))
    * replay [[graft.operators.WordPiece.vocab]]; when `withChain`, the
    * greedy longest-match-first encode unrolls as one CTE pair per
    * consumed piece — `wpm{k}` is step k's longest match per in-flight
    * word (`row_number` by match length DESC; at a fixed position only
    * one piece per length can match, so the ordering is total), `wps{k}`
    * the words still unfinished — terminating in `wpdone(word,
    * n_pieces)` for words that reached their end and `wpseg(word,
    * n_pieces, segmented)` with the emitted pieces in order. Words
    * absent from `wpdone` stalled at some position: they are `[UNK]`
    * (the caller's LEFT JOIN supplies that row — partial matches are
    * discarded, the BERT contract). `maxSteps` must be ≥ the longest
    * word (each step consumes ≥ 1 char). Match probes run to
    * `maxPieceLen + 2` — the full string length of a `##`-form entry —
    * so a word literally beginning `##` can match such an entry
    * word-initially, the engine's form-blind lookup contract; probes
    * past a branch's real maximum simply never match. Every chain CTE
    * is MATERIALIZED (the wg2 inlining lesson). */
  def wordpieceCtes(corpus: String, textCol: String, vocabSize: Int,
      maxPieceLen: Int, maxSteps: Int, withChain: Boolean,
      withHex: Boolean = true): String = {
    val hexBranch = if (withHex)
      s"""
         |    UNION ALL
         |    SELECT substring(md5(CAST(doc_id AS VARCHAR)), 1,
         |      CAST(4 + doc_id % 21 AS INT)) AS word FROM $corpus"""
        .stripMargin
    else ""
    val span = "CASE WHEN piece LIKE '##%' THEN length(piece) - 2 " +
      "ELSE length(piece) END"
    val seed =
      s"""wpw AS MATERIALIZED (
         |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(list_filter(string_split_regex(lower(trim(
         |      $textCol)), '\\s+'), x -> x <> '')) AS word
         |    FROM $corpus$hexBranch)
         |  GROUP BY 1),
         |wpsubs AS MATERIALIZED (
         |  SELECT CASE WHEN i = 1 THEN substring(word, i, n)
         |         ELSE '##' || substring(word, i, n) END AS piece,
         |    CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM wpw,
         |    unnest(generate_series(1, length(word))) t(i),
         |    unnest(generate_series(1,
         |      least($maxPieceLen, length(word) - i + 1))) u(n)
         |  GROUP BY 1),
         |wpmult AS MATERIALIZED (
         |  SELECT piece, cnt FROM wpsubs WHERE ($span) >= 2
         |  ORDER BY cnt DESC, piece LIMIT $vocabSize),
         |wpv AS MATERIALIZED (
         |  SELECT piece, cnt FROM wpsubs WHERE ($span) = 1
         |  UNION ALL SELECT piece, cnt FROM wpmult)""".stripMargin
    if (!withChain) return seed
    val chain = (1 to maxSteps).map { k =>
      val p = k - 1
      s"""wpm$k AS MATERIALIZED (
         |  SELECT word, pos, n, piece FROM (
         |    SELECT s.word, s.pos, t.n, v.piece,
         |      row_number() OVER (PARTITION BY s.word
         |        ORDER BY t.n DESC) AS rk
         |    FROM wps$p s, wpwords w,
         |      unnest(generate_series(1, ${maxPieceLen + 2})) t(n), wpv v
         |    WHERE w.word = s.word AND t.n <= w.len - s.pos + 1
         |      AND v.piece = CASE WHEN s.pos = 1
         |        THEN substring(s.word, s.pos, t.n)
         |        ELSE '##' || substring(s.word, s.pos, t.n) END) z
         |  WHERE rk = 1),
         |wps$k AS MATERIALIZED (
         |  SELECT m.word, m.pos + m.n AS pos
         |  FROM wpm$k m JOIN wpwords w ON w.word = m.word
         |  WHERE m.pos + m.n <= w.len)""".stripMargin
    }.mkString(",\n")
    val pieceUnion = (1 to maxSteps).map { k =>
      s"  SELECT word, $k AS k, pos, n, piece FROM wpm$k"
    }.mkString("\n  UNION ALL\n")
    s"""$seed,
       |wpwords AS MATERIALIZED (
       |  SELECT word, length(word) AS len FROM wpw),
       |wps0 AS MATERIALIZED (SELECT word, 1 AS pos FROM wpwords),
       |$chain,
       |wppieces AS MATERIALIZED (
       |$pieceUnion),
       |wpdone AS MATERIALIZED (
       |  SELECT p.word, p.k AS n_pieces
       |  FROM wppieces p JOIN wpwords w ON w.word = p.word
       |  WHERE p.pos + p.n = w.len + 1),
       |wpseg AS MATERIALIZED (
       |  SELECT p.word, d.n_pieces,
       |    string_agg(p.piece, ' ' ORDER BY p.k) AS segmented
       |  FROM wppieces p JOIN wpdone d ON d.word = p.word
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** Unigram-tokenizer rebuild over `corpus(doc_id, <textCol>)`: the
    * t18 word universe (corpus words ∪ md5-derived hex words of length
    * 4..24), [[graft.operators.Unigram.seedVocab]]'s substring counts +
    * top-`vocabSize` selection + ln-micro costs (CTE `t18v(piece, cnt,
    * cost_mu)`), and — when `withDp` — the full Viterbi replay as a
    * pieces-indexed DP chain: `t18b{k}(word, j, s)` is the best score
    * reaching prefix length j in exactly k pieces, and the terminal
    * `t18seg(word, score_mu, n_pieces)` takes the min score across k
    * then the min k achieving it — exactly the engine's lexicographic
    * (score, pieces) Viterbi objective. Every rank CTE is MATERIALIZED
    * (each is referenced twice; plain-CTE inlining would expand the
    * chain exponentially — the wg2 lesson). `maxPieces` must be ≥ the
    * longest word in the universe (a word of length L needs at most L
    * pieces). */
  def unigramCtes(corpus: String, textCol: String, vocabSize: Int,
      maxPieceLen: Int, maxPieces: Int, withDp: Boolean,
      withHex: Boolean = true): String = {
    val hexBranch = if (withHex)
      s"""
         |    UNION ALL
         |    SELECT substring(md5(CAST(doc_id AS VARCHAR)), 1,
         |      CAST(4 + doc_id % 21 AS INT)) AS word FROM $corpus"""
        .stripMargin
    else ""
    val seed =
      s"""t18w AS MATERIALIZED (
         |  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(list_filter(string_split_regex(lower(trim(
         |      $textCol)), '\\s+'), x -> x <> '')) AS word
         |    FROM $corpus$hexBranch)
         |  GROUP BY 1),
         |t18subs AS MATERIALIZED (
         |  SELECT substring(word, i, n) AS piece,
         |    CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM t18w,
         |    unnest(generate_series(1, length(word))) t(i),
         |    unnest(generate_series(1,
         |      least($maxPieceLen, length(word) - i + 1))) u(n)
         |  GROUP BY 1),
         |t18mult AS MATERIALIZED (
         |  SELECT piece, cnt FROM t18subs WHERE length(piece) >= 2
         |  ORDER BY cnt DESC, piece LIMIT $vocabSize),
         |t18kept AS MATERIALIZED (
         |  SELECT piece, cnt FROM t18subs WHERE length(piece) = 1
         |  UNION ALL SELECT piece, cnt FROM t18mult),
         |t18tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM t18kept),
         |t18v AS MATERIALIZED (
         |  SELECT piece, cnt,
         |    CAST(round(ln(CAST((SELECT t FROM t18tot) AS DOUBLE)
         |      / CAST(cnt AS DOUBLE)) * 1e6) AS BIGINT) AS cost_mu
         |  FROM t18kept)""".stripMargin
    if (!withDp) return seed
    val chain = (1 to maxPieces).map { k =>
      val p = k - 1
      s"""t18b$k AS MATERIALIZED (
         |  SELECT sp.word, sp.j, CAST(min(b.s + sp.cost_mu) AS BIGINT)
         |    AS s
         |  FROM t18b$p b JOIN t18sp sp
         |    ON sp.word = b.word AND sp.i0 = b.j
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val ends = (1 to maxPieces).map { k =>
      s"  SELECT b.word, $k AS k, b.s FROM t18b$k b\n" +
        s"  JOIN t18words w ON w.word = b.word AND b.j = w.len"
    }.mkString("\n  UNION ALL\n")
    s"""$seed,
       |t18words AS MATERIALIZED (
       |  SELECT word, length(word) AS len FROM t18w),
       |t18sp AS MATERIALIZED (
       |  SELECT w.word, i - 1 AS i0, i - 1 + n AS j, v.cost_mu
       |  FROM t18words w,
       |    unnest(generate_series(1, w.len)) t(i),
       |    unnest(generate_series(1,
       |      least($maxPieceLen, w.len - i + 1))) u(n),
       |    t18v v
       |  WHERE substring(w.word, i, n) = v.piece),
       |t18b0 AS (
       |  SELECT word, 0 AS j, CAST(0 AS BIGINT) AS s FROM t18words),
       |$chain,
       |t18ends AS MATERIALIZED (
       |$ends),
       |t18best AS MATERIALIZED (
       |  SELECT word, min(s) AS score_mu FROM t18ends GROUP BY 1),
       |t18seg AS MATERIALIZED (
       |  SELECT b.word, CAST(b.score_mu AS BIGINT) AS score_mu,
       |    CAST(min(e.k) AS INT) AS n_pieces
       |  FROM t18best b JOIN t18ends e
       |    ON e.word = b.word AND e.s = b.score_mu
       |  GROUP BY 1, 2)""".stripMargin
  }
}
