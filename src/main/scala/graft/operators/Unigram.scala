package graft.operators

import graft.CacheScope
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece unigram model; public literature), engineered like
  * this engine's BPE family:
  *
  *  - corpus-sized work happens exactly TWICE (the word-frequency
  *    collapse feeding seed/training, and the final distinct-word
  *    encode + per-doc regroup) — never per candidate or per EM step;
  *  - seed selection is a vocabulary-sized substring count + a
  *    distributed top-K ([[seedVocab]] — `TakeOrdered`, no global
  *    window);
  *  - EM re-estimation and pruning run driver-local over the collapsed
  *    word table ([[trainLocal]] — the `bpeTrainLocal` contract: zero
  *    Spark jobs per iteration, bounded by the model, spec-pinned);
  *  - the encoder is an integer-micros Viterbi ([[encodeWords]]):
  *    piece costs are fixed-point longs and the DP minimizes the
  *    lexicographic pair (score, n_pieces), so every decision is
  *    partition-order immune and engine-replayable — the t18b gate
  *    replays the whole DP in DuckDB as a pieces-indexed CTE chain and
  *    hash-compares (score_mu, n_pieces) per word.
  */
object Unigram {

  /** Seed candidate vocabulary: every substring of length 1..
    * `maxPieceLen` of every corpus word, weighted by word frequency;
    * kept = ALL single characters (the coverage guarantee — any word
    * stays encodable) plus the top `vocabSize` multi-character pieces
    * by (count DESC, piece ASC — UTF8 binary, both engines' default).
    * `cost_mu` = round(ln(total/cnt)·1e6) over the kept mass: the
    * fixed-point -log prob the Viterbi consumes.
    *
    * Scale shape: one explode over the VOCABULARY table (distinct
    * words × ≤ maxPieceLen·len substrings — model-sized, not
    * corpus-sized), one partial-agg count shuffle, and a distributed
    * top-K (`orderBy.limit` plans TakeOrdered — per-partition heaps +
    * a driver merge of vocabSize rows, never a single-partition sort).
    */
  def seedVocab(wordFreq: DataFrame, vocabSize: Int, maxPieceLen: Int = 8)(
      implicit scope: CacheScope = CacheScope.session): DataFrame = {
    require(vocabSize >= 1, s"seedVocab: vocabSize must be >= 1, got $vocabSize")
    require(maxPieceLen >= 1,
      s"seedVocab: maxPieceLen must be >= 1, got $maxPieceLen")
    val subs = scope.cache(wordFreq
      .select(col("word").cast("string").as("word"),
        col("freq").cast("long").as("freq"))
      .filter(col("word").isNotNull && col("word") =!= "")
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("freq"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("i") + lit(1))))
          .as("n"))
      .select(expr("substring(word, i, n)").as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt")))
    val singles = subs.filter(length(col("piece")) === 1)
    val multis = subs.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
    val kept = singles.unionByName(multis)
    val tot = kept.agg(sum(col("cnt")).as("tot"))
    kept.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        expr("cast(round(ln(cast(tot as double) / cast(cnt as double)) " +
          "* 1e6) as bigint)").as("cost_mu"))
  }

  /** A trained unigram model: (piece, prob, cost_mu) with cost_mu =
    * round(-ln(prob)·1e6) — the integer form every consumer encodes
    * against. */
  final case class UnigramModel(pieces: Seq[(String, Double, Long)]) {
    def costs: Seq[(String, Long)] = pieces.map(p => (p._1, p._3))
  }

  /** Driver-local EM training over the collapsed (word, freq) table —
    * the SentencePiece reduction: seed a large candidate set from
    * substring counts, iterate {EM re-estimate piece probabilities via
    * forward-backward over each word's segmentation lattice; prune the
    * weakest pieces} until `vocabSize` survives, single characters
    * protected throughout. Like [[TextAnalysis.bpeTrainLocal]], the
    * ONLY corpus-sized step is the word-frequency collapse the caller
    * already did; everything here is bounded by (distinct words ×
    * word length × maxPieceLen) per EM pass and runs zero Spark jobs.
    *
    * Deterministic: words and candidates are processed in UTF8 order,
    * selection ties break (expected count DESC, piece ASC), and the
    * arithmetic is sequential driver-side doubles — same input, same
    * model, every run (spec-pinned, with EM likelihood monotonicity).
    */
  def trainLocal(wordFreq: DataFrame, vocabSize: Int, maxPieceLen: Int = 8,
      emIters: Int = 2, shrink: Double = 0.75, seedSize: Int = 0,
      maxWords: Int = 2000000): UnigramModel = {
    require(vocabSize >= 1,
      s"trainLocal: vocabSize must be >= 1, got $vocabSize")
    require(shrink > 0 && shrink < 1,
      s"trainLocal: shrink must be in (0,1), got $shrink")
    require(maxWords > 0 && maxWords < Int.MaxValue,
      s"trainLocal: maxWords out of range: $maxWords")
    // bounded probe: the guard must fire BEFORE an unbounded collect
    // materializes the word table on the driver, not after
    val wf = wordFreq
      .select(col("word").cast("string"), col("freq").cast("long"))
      .filter(col("word").isNotNull && col("word") =!= "")
      .limit(maxWords + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortWith((a, b) => TextAnalysis.utf8Compare(a._1, b._1) < 0)
    require(wf.length <= maxWords,
      s"trainLocal: distinct words exceed maxWords=$maxWords — raise " +
        "it deliberately (driver-memory bound)")

    // seed candidates: substring counts (weighted), singles protected —
    // in CODE-POINT space, like the distributed seedVocab
    val cnt = new scala.collection.mutable.HashMap[String, Long]()
    wf.foreach { case (w, f) =>
      val off = cpOffsets(w)
      val L = off.length - 1
      var i = 0
      while (i < L) {
        var n = 1
        val nMax = math.min(maxPieceLen, L - i)
        while (n <= nMax) {
          val p = w.substring(off(i), off(i + n))
          cnt.updateWith(p) {
            case Some(v) => Some(v + f)
            case None => Some(f)
          }
          n += 1
        }
        i += 1
      }
    }
    val all = cnt.iterator.map { case (k, v) => (k, v) }.toArray
    val singles = all.filter(_._1.length == 1)
    val seedN = if (seedSize > 0) seedSize else vocabSize * 4
    val multis = all.filter(_._1.length >= 2)
      .sortWith { (a, b) =>
        if (a._2 != b._2) a._2 > b._2
        else TextAnalysis.utf8Compare(a._1, b._1) < 0
      }.take(seedN)

    var pieces: Array[String] =
      (singles.map(_._1) ++ multis.map(_._1))
        .sortWith(TextAnalysis.utf8Compare(_, _) < 0)
    val seedMass = (singles.map(_._2).sum + multis.map(_._2).sum).toDouble
    var prob: collection.Map[String, Double] = {
      val m = new scala.collection.mutable.HashMap[String, Double]()
      (singles ++ multis).foreach { case (p, c) => m(p) = c / seedMass }
      m
    }

    // forward-backward expected counts of one word under `prob`;
    // accumulates f-weighted counts into `e`, returns ln P(word)
    def accumulate(w: String, f: Long, p: collection.Map[String, Double],
        e: scala.collection.mutable.HashMap[String, Double]): Double = {
      val off = cpOffsets(w)
      val L = off.length - 1
      val alpha = new Array[Double](L + 1); alpha(0) = 1.0
      var j = 1
      while (j <= L) {
        var s = 0.0; var n = 1; val nMax = math.min(maxPieceLen, j)
        while (n <= nMax) {
          val pc = p.getOrElse(w.substring(off(j - n), off(j)), 0.0)
          if (pc > 0) s += alpha(j - n) * pc
          n += 1
        }
        alpha(j) = s; j += 1
      }
      if (alpha(L) <= 0) return 0.0 // unreachable: singles are protected
      val beta = new Array[Double](L + 1); beta(L) = 1.0
      var i = L - 1
      while (i >= 0) {
        var s = 0.0; var n = 1; val nMax = math.min(maxPieceLen, L - i)
        while (n <= nMax) {
          val pc = p.getOrElse(w.substring(off(i), off(i + n)), 0.0)
          if (pc > 0) s += pc * beta(i + n)
          n += 1
        }
        beta(i) = s; i -= 1
      }
      i = 0
      while (i < L) {
        var n = 1; val nMax = math.min(maxPieceLen, L - i)
        while (n <= nMax) {
          val piece = w.substring(off(i), off(i + n))
          val pc = p.getOrElse(piece, 0.0)
          if (pc > 0) {
            val post = alpha(i) * pc * beta(i + n) / alpha(L)
            if (post > 0) e.updateWith(piece) {
              case Some(v) => Some(v + f * post)
              case None => Some(f * post)
            }
          }
          n += 1
        }
        i += 1
      }
      math.log(alpha(L)) * f
    }

    def emPass(): scala.collection.mutable.HashMap[String, Double] = {
      val e = new scala.collection.mutable.HashMap[String, Double]()
      wf.foreach { case (w, f) => accumulate(w, f, prob, e) }
      val tot = e.valuesIterator.sum
      val next = new scala.collection.mutable.HashMap[String, Double]()
      pieces.foreach { p =>
        val c = e.getOrElse(p, 0.0)
        if (c > 0) next(p) = c / tot
      }
      prob = next
      e
    }

    val singleSet = singles.map(_._1).toSet
    var done = false
    while (!done) {
      var lastE: scala.collection.mutable.HashMap[String, Double] = null
      var it = 0
      while (it < emIters) { lastE = emPass(); it += 1 }
      val multisNow = pieces.filter(p => !singleSet.contains(p))
      if (multisNow.length <= vocabSize) done = true
      else {
        // prune: keep the strongest by expected count (the SentencePiece
        // loss proxy — a piece EM stopped using has e ≈ 0 and goes first)
        val keepN = math.max(vocabSize, (multisNow.length * shrink).toInt)
        val kept = multisNow
          .map(p => (p, lastE.getOrElse(p, 0.0)))
          .sortWith { (a, b) =>
            if (a._2 != b._2) a._2 > b._2
            else TextAnalysis.utf8Compare(a._1, b._1) < 0
          }.take(keepN).map(_._1)
        pieces = (singleSet.toArray ++ kept)
          .sortWith(TextAnalysis.utf8Compare(_, _) < 0)
        val mass = pieces.iterator.map(p => prob.getOrElse(p, 0.0)).sum
        val m = new scala.collection.mutable.HashMap[String, Double]()
        pieces.foreach { p =>
          val v = prob.getOrElse(p, 0.0)
          if (v > 0) m(p) = v / mass
        }
        prob = m
      }
    }
    // a piece EM zeroed entirely still needs a finite cost if it is a
    // protected single: floor at one expected count over the seed mass
    val floor = 1.0 / seedMass
    UnigramModel(pieces.toIndexedSeq.map { p =>
      val pr = math.max(prob.getOrElse(p, 0.0), floor)
      (p, pr, math.round(-math.log(pr) * 1e6))
    })
  }

  /** Integer-micros Viterbi segmentation of each word against a
    * broadcast (piece → cost_mu) table: minimizes the LEXICOGRAPHIC
    * pair (total cost, piece count) — additive pairs under
    * lexicographic order form a total-order semiring, so the DP is
    * globally optimal in it, and (score_mu, n_pieces) is unique even
    * when several segmentations tie on raw cost. Path ties beyond the
    * pair prefer the longest final piece at each cell (deterministic,
    * spec-pinned; the pair itself is what the t18b gate hashes).
    * Characters outside the vocabulary cost `unkCostMu` each —
    * segmentation never fails.
    *
    * Same shape as [[TextAnalysis.bpeEncodeWords]]: broadcast model,
    * one mapPartitions pass, no shuffle. */
  def encodeWords(words: DataFrame, wordCol: String,
      vocab: Seq[(String, Long)],
      unkCostMu: Long = 50000000L): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType,
      StringType, StructField, StructType}
    require(vocab.nonEmpty, "encodeWords: vocab must be non-empty")
    val spark = words.sparkSession
    val maxLen = vocab.iterator
      .map(p => p._1.codePointCount(0, p._1.length)).max
    val vmap = new java.util.HashMap[String, java.lang.Long](
      vocab.size * 2)
    vocab.foreach { case (p, c) => vmap.put(p, c) }
    val bc = spark.sparkContext.broadcast((vmap, maxLen))
    val outSchema = StructType(Seq(
      StructField(wordCol, StringType, nullable = true),
      StructField("pieces", ArrayType(StringType, containsNull = false),
        nullable = true),
      StructField("n_pieces", IntegerType, nullable = true),
      StructField("score_mu", LongType, nullable = true)))
    val rows = words.select(col(wordCol).cast("string")).rdd
      .mapPartitions { it =>
        val (m, ml) = bc.value
        it.map { r =>
          if (r.isNullAt(0)) Row(null, null, null, null)
          else {
            val w = r.getString(0)
            val (ps, np, s) = viterbiOne(w, m, ml, unkCostMu)
            Row(w, ps.toIndexedSeq, np, s)
          }
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** Code-point boundaries of `w`: `off(k)` is the UTF-16 offset of
    * the k-th code point and `off(last) = w.length`, so the
    * code-point-space substring [i, j) is `w.substring(off(i),
    * off(j))`. Everything here measures pieces in CODE POINTS — the
    * distributed [[seedVocab]] (Spark `substring`) and the DuckDB DP
    * replay (DuckDB `substring`) both do; indexing by UTF-16 units
    * would split a supplementary character into two lone surrogates
    * and double-charge it. */
  private[operators] def cpOffsets(w: String): Array[Int] = {
    val out = new Array[Int](w.codePointCount(0, w.length) + 1)
    var i = 0
    var k = 0
    while (i < w.length) {
      out(k) = i
      k += 1
      i += Character.charCount(w.codePointAt(i))
    }
    out(k) = w.length
    out
  }

  private def viterbiOne(w: String,
      vocab: java.util.HashMap[String, java.lang.Long], maxLen: Int,
      unk: Long): (Array[String], Int, Long) = {
    val off = cpOffsets(w)
    val L = off.length - 1
    if (L == 0) return (Array.empty, 0, 0L)
    val inf = Long.MaxValue / 4
    val score = new Array[Long](L + 1)
    val npc = new Array[Int](L + 1)
    val back = new Array[Int](L + 1)
    var j = 1
    while (j <= L) { score(j) = inf; npc(j) = Int.MaxValue; j = j + 1 }
    j = 1
    while (j <= L) {
      var n = 1
      val nMax = math.min(maxLen, j)
      while (n <= nMax) {
        val i = j - n
        if (score(i) < inf) {
          val c = vocab.get(w.substring(off(i), off(j)))
          val cost: Long =
            if (c != null) c.longValue() else if (n == 1) unk else -1L
          if (cost >= 0) {
            val s = score(i) + cost
            val p = npc(i) + 1
            // lexicographic (score, pieces); equal pair replaces —
            // n ascends, so the survivor has the LONGEST final piece
            if (s < score(j) || (s == score(j) && p <= npc(j))) {
              score(j) = s; npc(j) = p; back(j) = i
            }
          }
        }
        n += 1
      }
      j += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[String](npc(L))
    var k = L
    while (k > 0) { out += w.substring(off(back(k)), off(k)); k = back(k) }
    (out.reverseIterator.toArray, npc(L), score(L))
  }

  /** Corpus → token ids under a unigram model: the [[TextAnalysis.
    * bpeEncodeCorpus]] shape — the corpus collapses to DISTINCT words,
    * each word Viterbi-encodes once, token ids come from the UTF8-
    * sorted FULL MODEL piece table, and per-doc sequences regroup by
    * word position. Ids are a pure function of the model — two
    * disjoint corpus shards encoded with the same vocabulary get the
    * identical piece→id mapping, the
    * [[graft.pipelines.TokenizerStore]] shard-stability contract.
    * Unlike WordPiece, the Viterbi's unk-char fallback can emit
    * single characters OUTSIDE the model; every such piece maps to
    * the one reserved id `|model|` (the SentencePiece `<unk>`
    * posture — also model-stable), so `token_ids` never carries a
    * corpus-dependent id. Returns (vocabDf (token_id, piece), perDoc
    * (id, token_ids, n_tok, score_mu)) — `score_mu` the exact integer
    * corpus NLL of the doc under the model, summing per-occurrence
    * word scores. */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Long)], unkCostMu: Long = 50000000L)(
      implicit scope: CacheScope = CacheScope.session)
      : (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      w => w =!= "")
    val words = docs.select(explode(toks).as("word")).distinct()
    val seg = scope.cache(encodeWords(words, "word", vocab, unkCostMu))
    val syms = vocab.map(_._1).distinct
      .sortWith(TextAnalysis.utf8Compare(_, _) < 0)
    val unkId = syms.length
    import spark.implicits._
    val vocabDf = syms.zipWithIndex
      .map { case (s, i) => (i, s) }.toSeq.toDF("token_id", "piece")
    val segIds = seg
      .select(col("word"), col("n_pieces"), col("score_mu"),
        posexplode(col("pieces")).as(Seq("spos", "piece")))
      .join(broadcast(vocabDf), Seq("piece"), "left")
      .withColumn("token_id",
        coalesce(col("token_id"), lit(unkId)))
      .groupBy(col("word"))
      .agg(max(col("score_mu")).as("w_score"),
        transform(
          array_sort(collect_list(struct(col("spos"), col("token_id")))),
          p => p.getField("token_id")).as("ids"))
    val perDoc = docs
      .select(col(idCol), posexplode(
        filter(split(lower(trim(coalesce(col(textCol), lit("")))),
          "\\s+"), w => w =!= "")).as(Seq("wpos", "word")))
      .join(segIds, Seq("word"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
          array_sort(collect_list(struct(col("wpos"), col("ids")))),
          p => p.getField("ids"))).as("token_ids"),
        sum(col("w_score")).as("score_mu"))
    val out = docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("token_ids"), array().cast("array<int>"))
          .as("token_ids"),
        coalesce(col("score_mu"), lit(0L)).as("score_mu"))
      .withColumn("n_tok", size(col("token_ids")))
    (vocabDf, out)
  }

  /** Per-doc token ids → the SPACE-JOINED PIECE form — the honest
    * decode for this family: unigram pieces are raw word substrings
    * with no boundary marker (no SentencePiece `▁` in this trainer),
    * so word boundaries are unrecoverable from the flat stream and
    * reassembling without separators would invent words that never
    * existed. The piece form is the standard inspection surface
    * (`hel lo wor ld`), deterministic, and exactly invertible back to
    * ids through the same model table. The reserved unk id `|model|`
    * decodes to the literal `<unk>` (the fallen-back character is
    * lost by construction); any OTHER out-of-table id raises loudly.
    * One model-sized array literal, map-only at any scale. */
  def decodeCorpus(perDoc: DataFrame, idsCol: String,
      vocab: Seq[(String, Long)]): DataFrame = {
    val syms = vocab.map(_._1).distinct
      .sortWith(TextAnalysis.utf8Compare(_, _) < 0)
    val table = typedLit(syms :+ "<unk>")
    val mapped = transform(col(idsCol), id =>
      coalesce(try_element_at(table, id.cast("int") + 1),
        raise_error(concat(lit("Unigram.decodeCorpus: token id "),
          id.cast("string"),
          lit(s" outside the model table (|model|=${syms.length}, " +
            s"unk id=${syms.length}) — ids and model do not match"))
          .cast("string"))))
    perDoc.withColumn("decoded", array_join(mapped, " "))
  }
}
