package graft.operators

import graft.CacheScope
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** WordPiece subword tokenizer (Schuster & Nakajima 2012, "Japanese and
  * Korean voice search", ICASSP; the greedy longest-match-first runtime
  * is the BERT tokenizer of Devlin et al. 2018 §A — public literature).
  * The THIRD subword family next to [[TextAnalysis]]'s BPE and
  * [[Unigram]]'s SentencePiece model, and the one whose runtime
  * dominates in practice: most pipelines never train WordPiece, they
  * apply a shipped vocabulary with the greedy matcher — which is why
  * the encoder here is the contract-pinned piece.
  *
  * Conventions (BERT's): a piece either starts a word or continues one;
  * continuation pieces carry the `##` prefix as part of their vocabulary
  * identity. A word with NO match at some position encodes as a single
  * `[UNK]` token — partial segmentations are discarded, never emitted.
  * (A corpus word that itself begins with the literal characters `##`
  * is ambiguous against the marker, exactly as in BERT's vocab format;
  * both the engine and the oracle resolve it identically — as a
  * continuation-form piece — so determinism is unaffected.)
  *
  * All piece lengths are measured in CODE POINTS (the [[Unigram]]
  * posture: Spark's and DuckDB's `substring` both index code points;
  * UTF-16 units would split supplementary characters).
  *
  * Engineering shape mirrors the other two tokenizers:
  *  - [[vocab]] is one substring explode over the collapsed (word,
  *    freq) table + a partial-agg count + a distributed top-K —
  *    vocabulary-sized work, never corpus-sized;
  *  - [[encodeWords]] broadcasts the piece set and greedy-matches each
  *    DISTINCT word once in a single mapPartitions pass — no shuffle,
  *    no UDF registry, bounded by the word universe;
  *  - [[encodeCorpus]] is the [[Unigram.encodeCorpus]] composition:
  *    distinct-word encode, MODEL-derived token ids (UTF8 rank in the
  *    full piece table + `[UNK]`), per-doc regroup.
  */
object WordPiece {

  /** Positional-substring vocabulary: every substring of length 1..
    * `maxPieceLen` of every word, weighted by word frequency, tagged by
    * FORM — word-initial occurrences (i = 1) count toward the plain
    * piece, interior ones toward the `##`-prefixed continuation piece
    * (so e.g. `able` the prefix and `##able` the suffix are separate
    * vocabulary entries with separate counts, as in a real WordPiece
    * vocab). Kept: ALL single-character pieces of both forms (the
    * coverage guarantee — any word over the training alphabet stays
    * encodable) plus the top `vocabSize` multi-character pieces by
    * (count DESC, piece ASC — UTF8 binary, both engines' default).
    *
    * Scale shape: the explode runs over the collapsed word table
    * (model-sized), one count shuffle, and `orderBy.limit` plans
    * TakeOrdered — per-partition heaps, never a global sort. */
  def vocab(wordFreq: DataFrame, vocabSize: Int, maxPieceLen: Int = 8)(
      implicit scope: CacheScope = CacheScope.session): DataFrame = {
    require(vocabSize >= 1,
      s"vocab: vocabSize must be >= 1, got $vocabSize")
    require(maxPieceLen >= 1,
      s"vocab: maxPieceLen must be >= 1, got $maxPieceLen")
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
      .select(when(col("i") === 1, expr("substring(word, i, n)"))
          .otherwise(concat(lit("##"), expr("substring(word, i, n)")))
          .as("piece"),
        col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt")))
    // character span of a piece = its length minus the ## marker
    val span = when(col("piece").startsWith("##"),
      length(col("piece")) - 2).otherwise(length(col("piece")))
    val singles = subs.filter(span === 1)
    val multis = subs.filter(span >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
    singles.unionByName(multis)
  }

  /** Greedy longest-match-first encode of each word against a piece
    * set: at every position take the LONGEST vocabulary piece of the
    * position-appropriate form (plain at the word start, `##`-prefixed
    * after); any position with no match collapses the whole word to
    * one `[UNK]`. Deterministic by construction — at a given position
    * only one piece of each length can match, so there is nothing to
    * tie-break.
    *
    * Same shape as [[Unigram.encodeWords]]: broadcast piece set, one
    * mapPartitions pass over (distinct) words, no shuffle. Returns
    * `(wordCol, pieces, n_pieces, is_unk)` — for `[UNK]` words,
    * `pieces = ["[UNK]"]` and `n_pieces = 1` (the token the sequence
    * actually carries, BERT's counting). */
  def encodeWords(words: DataFrame, wordCol: String,
      pieces: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, BooleanType,
      IntegerType, StringType, StructField, StructType}
    require(pieces.nonEmpty, "encodeWords: pieces must be non-empty")
    val spark = words.sparkSession
    // probe bound = the longest piece's FULL code-point length (marker
    // included): at a word start the candidate is the raw substring, and
    // a word that itself begins with the literal characters `##` can
    // legitimately match a `##`-form vocabulary entry there (the
    // form-blind string lookup of the published WordPiece runtime) — a
    // body-only bound would make those entries unreachable word-
    // initially. Continuation probes past the longest body simply never
    // match; correctness over a wasted hash probe.
    val maxLen = pieces.iterator
      .map(p => p.codePointCount(0, p.length)).max
    val pset = new java.util.HashSet[String](pieces.size * 2)
    pieces.foreach(pset.add)
    val bc = spark.sparkContext.broadcast((pset, maxLen))
    val outSchema = StructType(Seq(
      StructField(wordCol, StringType, nullable = true),
      StructField("pieces", ArrayType(StringType, containsNull = false),
        nullable = true),
      StructField("n_pieces", IntegerType, nullable = true),
      StructField("is_unk", BooleanType, nullable = true)))
    val rows = words.select(col(wordCol).cast("string")).rdd
      .mapPartitions { it =>
        val (ps, ml) = bc.value
        it.map { r =>
          if (r.isNullAt(0)) Row(null, null, null, null)
          else {
            val (out, unk) = greedyOne(r.getString(0), ps, ml)
            Row(r.getString(0), out.toIndexedSeq, out.length, unk)
          }
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  private def greedyOne(w: String, pset: java.util.HashSet[String],
      maxLen: Int): (Array[String], Boolean) = {
    val off = Unigram.cpOffsets(w)
    val L = off.length - 1
    if (L == 0) return (Array.empty, false)
    val out = new scala.collection.mutable.ArrayBuffer[String](4)
    var i = 0
    while (i < L) {
      var n = math.min(maxLen, L - i)
      var hit: String = null
      while (n >= 1 && hit == null) {
        val body = w.substring(off(i), off(i + n))
        val cand = if (i == 0) body else "##" + body
        if (pset.contains(cand)) hit = cand else n -= 1
      }
      if (hit == null) return (Array("[UNK]"), true)
      out += hit
      i += n
    }
    (out.toArray, false)
  }

  /** Corpus → WordPiece token ids: the [[Unigram.encodeCorpus]]
    * composition — the corpus collapses to DISTINCT words, each word
    * greedy-encodes once, token ids come from the UTF8-sorted FULL
    * MODEL piece table plus `[UNK]` (which ranks like any other
    * symbol), and per-doc sequences regroup by word position. Ids are
    * a pure function of the model — two disjoint corpus shards encoded
    * with the same vocabulary get the identical piece→id mapping, the
    * [[graft.pipelines.TokenizerStore]] shard-stability contract the
    * byte-BPE family already honors (greedy encode can only emit
    * model pieces or `[UNK]`, so the model bounds the symbol set).
    * Returns (vocabDf (token_id, piece), perDoc (id, token_ids,
    * n_tok, n_unk)) — `n_unk` counts `[UNK]` words per document, the
    * vocabulary-coverage signal a tokenizer report tracks next to
    * fertility. */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
      pieces: Seq[String])(
      implicit scope: CacheScope = CacheScope.session)
      : (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      w => w =!= "")
    val words = docs.select(explode(toks).as("word")).distinct()
    val seg = scope.cache(encodeWords(words, "word", pieces))
    val syms = (pieces :+ "[UNK]").distinct
      .sortWith(TextAnalysis.utf8Compare(_, _) < 0)
    import spark.implicits._
    val vocabDf = syms.zipWithIndex
      .map { case (s, i) => (i, s) }.toSeq.toDF("token_id", "piece")
    val segIds = seg
      .select(col("word"), col("is_unk"),
        posexplode(col("pieces")).as(Seq("spos", "piece")))
      .join(broadcast(vocabDf), Seq("piece"))
      .groupBy(col("word"))
      .agg(max(col("is_unk").cast("int")).as("w_unk"),
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
        sum(col("w_unk")).cast("int").as("n_unk"))
    val out = docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("token_ids"), array().cast("array<int>"))
          .as("token_ids"),
        coalesce(col("n_unk"), lit(0)).as("n_unk"))
      .withColumn("n_tok", size(col("token_ids")))
    (vocabDf, out)
  }

  /** Per-doc token ids → the space-joined WORD form — WordPiece is
    * the one family whose flat id stream still carries word
    * boundaries (the BERT `##` convention: a piece without the marker
    * STARTS a word, a `##` piece continues it), so decode
    * reconstructs words exactly: continuation markers strip, pieces
    * concatenate, words join with single spaces. The result is
    * [[encodeCorpus]]'s input normal form — `lower`-cased, `\s+`
    * collapsed — with every unencodable word as the literal `[UNK]`
    * (its characters are unrecoverable by construction). One
    * model-sized array literal + per-row aggregate walk: map-only at
    * any scale, the [[ByteBpe.decodeCorpus]] shape.
    *
    * `pieces` must be the same model [[encodeCorpus]] ran with (ids
    * are UTF8 ranks over pieces + `[UNK]`); an out-of-table id raises
    * loudly. A corpus word that itself begins with literal `##`
    * decodes into its neighbor (the documented vocab-format
    * ambiguity both engines share at encode time). */
  def decodeCorpus(perDoc: DataFrame, idsCol: String,
      pieces: Seq[String]): DataFrame = {
    val syms = (pieces :+ "[UNK]").distinct
      .sortWith(TextAnalysis.utf8Compare(_, _) < 0)
    val table = typedLit(syms)
    val mapped = transform(col(idsCol), id =>
      coalesce(try_element_at(table, id.cast("int") + 1),
        raise_error(concat(lit("WordPiece.decodeCorpus: token id "),
          id.cast("string"),
          lit(s" outside the model table (|table|=${syms.length}) — " +
            "ids and model do not match")).cast("string"))))
    // linear join (not a fold with string concat, which is quadratic
    // in doc length): continuation pieces contribute their
    // marker-stripped body, word-start pieces a leading space + body;
    // one array_join then strip the artificial leading space
    val joined = array_join(transform(mapped, p =>
      when(p.startsWith("##"), substring(p, 3, 1 << 24))
        .otherwise(concat(lit(" "), p))), "")
    perDoc.withColumn("decoded",
      when(joined.startsWith(" "), substring(joined, 2, 1 << 24))
        .otherwise(joined))
  }
}
