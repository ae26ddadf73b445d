package graft.operators

import graft.expressions.ByteMap
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-level BPE — the GPT-2 tokenizer family (Radford et al. 2019),
  * the fourth subword family next to char-BPE ([[TextAnalysis]]),
  * unigram-LM ([[graft.operators.Unigram]]) and WordPiece
  * ([[graft.operators.WordPiece]]). The reference (an Oracle/pandas
  * retail ETL, no NLP surface) has nothing comparable; this is
  * engine-own LLM-pipeline capability.
  *
  * The whole trick is the [[graft.expressions.ByteMap]] bijection:
  * UTF-8 bytes → 256 printable chars, applied per whitespace word.
  * After that hop the EXISTING char-level machinery — `bpeTrainLocal`'s
  * incremental trainer, `bpeEncodeWords`' rank-heap encoder — runs
  * unchanged over the byte alphabet, and three properties fall out
  * that the char-level family can't offer:
  *
  *  - **no [UNK], ever**: the base alphabet is all 256 bytes, so any
  *    input — any script, emoji, mojibake, binary-ish junk — segments;
  *  - **bounded base vocabulary**: 256 symbols regardless of how many
  *    distinct unicode chars the corpus contains (char-BPE's alphabet
  *    grows with the corpus's script inventory);
  *  - **exact round-trip**: decode(encode(x)) == x byte for byte —
  *    [[decodeSyms]] inverts any complete symbol sequence.
  *
  * Contract differences from [[TextAnalysis.bpeWordFreq]], both
  * deliberate and both the GPT-2 convention: case-PRESERVING (byte
  * tokenizers never lowercase — "The" and "the" are different byte
  * strings) and whitespace is a pure separator (words carry no space
  * marker; the per-doc word order is kept by position, as in
  * `bpeEncodeCorpus`).
  *
  * Scale shape: identical to the char family — the corpus collapses to
  * a word-frequency table in one O(corpus tokens) explode + one narrow
  * word shuffle; training never touches the corpus again; encoding
  * pays one distinct-word pass and a model-sized broadcast join.
  */
object ByteBpe {

  /** Case-preserving whitespace words of `text`, each byte-mapped —
    * the byte-level pre-tokenizer (map-only; empty/null text → []). */
  def byteWords(text: Column): Column =
    transform(
      filter(split(trim(coalesce(text, lit(""))), "\\s+"), w => w =!= ""),
      w => ByteMap.byteMapEncode(w))

  /** Corpus word-frequency table over byte-mapped words — the ONLY
    * corpus-sized step of byte-level BPE training (the
    * [[TextAnalysis.bpeWordFreq]] scale contract, byte alphabet). */
  def byteWordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(byteWords(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** SPACE-CARRYING byte-level pre-tokenizer — the GPT-2 convention
    * proper (Radford et al. 2019: the regex pre-tokenizer keeps each
    * word's LEADING whitespace attached, so the token stream is a
    * partition of the text and nothing is ever thrown away). Each
    * array element is a maximal `\s*\S+` run (leading whitespace +
    * word) or a trailing `\s+` run, byte-mapped; concatenating the
    * raw elements reproduces `text` byte-for-byte. This is what makes
    * [[decodeCorpus]] over an sp-trained model EXACTLY lossless at
    * the CORPUS level: word boundaries live inside the tokens, so the
    * flat per-doc id sequence needs no separator convention.
    * [[byteWords]] (whitespace as pure separator) remains the
    * word-statistics variant; this is the training-data variant. */
  def byteWordsSp(text: Column): Column =
    transform(
      regexp_extract_all(coalesce(text, lit("")),
        lit("\\s*\\S+|\\s+"), lit(0)),
      w => ByteMap.byteMapEncode(w))

  /** [[byteWordFreq]] over the space-carrying pre-tokenizer. */
  def byteWordFreqSp(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(byteWordsSp(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Train `nMerges` byte-level merges: [[TextAnalysis.bpeTrainLocal]]
    * over the byte-mapped word-frequency table. The merge table's
    * symbols are byte-mapped strings; decode any of them with
    * [[decodeSyms]] for display. */
  def train(wordFreq: DataFrame, nMerges: Int,
      maxVocab: Int = 1 << 20): DataFrame =
    TextAnalysis.bpeTrainLocal(wordFreq, nMerges, maxVocab)

  /** Decode a complete symbol sequence (array of byte-mapped symbol
    * strings) back to the original text — concatenation then the
    * inverse byte map. Exact inverse of encoding a whole word (or any
    * concatenation of whole words). */
  def decodeSyms(syms: Column): Column =
    ByteMap.byteMapDecode(array_join(syms, ""))

  /** The model's FULL symbol table: all 256 byte-alphabet chars ∪
    * every merge output — derivable from the MODEL alone (this is the
    * byte family's structural advantage: the base alphabet is closed,
    * where char-level BPE's grows with the corpus's script inventory).
    * Segmentation can only emit base chars or merge outputs, so this
    * is a superset of any corpus's symbols. */
  def modelSymbols(merges: Seq[(String, String)]): Seq[String] = {
    val base = (0 until 256).map(b =>
      new String(Character.toChars(
        graft.expressions.ByteMap.byteToChar(b))))
    (base ++ merges.map { case (l, r) => l + r }).distinct
  }

  /** Corpus → token-ID sequences through the byte-level model — the
    * [[TextAnalysis.bpeEncodeCorpus]] shape (shared tail: distinct-word
    * encode, model-sized broadcast id map, per-doc regroup with
    * positions as data) over case-preserving byte-mapped words.
    * Returns (vocab(token_id, sym), perDoc(id, token_ids, n_tok)).
    * Token ids are byte-order ranks over [[modelSymbols]] — derived
    * from the model ALONE, so they are corpus-INDEPENDENT: two shard
    * jobs encoding different corpora through the same frozen model
    * agree on every id (the TokenizerStore cross-shard contract,
    * spec-pinned). */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)])(
      implicit scope: graft.CacheScope): (DataFrame, DataFrame) =
    TextAnalysis.encodeCorpusWith(docs, idCol, byteWords(col(textCol)),
      merges, fixedSyms = Some(modelSymbols(merges)))

  /** [[encodeCorpus]] over the SPACE-CARRYING pre-tokenizer
    * ([[byteWordsSp]]) — same shared tail, same closed model-derived
    * id table (whitespace bytes are inside the 256 base alphabet, so
    * the no-OOV property is untouched). `merges` must come from a
    * model TRAINED on [[byteWordFreqSp]]: an sp corpus encoded under
    * plain-trained merges still segments (closed alphabet) but never
    * fires the space-adjacent merges the sp trainer learns. */
  def encodeCorpusSp(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)])(
      implicit scope: graft.CacheScope): (DataFrame, DataFrame) =
    TextAnalysis.encodeCorpusWith(docs, idCol, byteWordsSp(col(textCol)),
      merges, fixedSyms = Some(modelSymbols(merges)))

  /** Per-doc token ids → text: join each id to its model symbol
    * (ids are byte-order ranks over [[modelSymbols]] — the
    * [[encodeCorpus]]/[[encodeCorpusSp]] contract), concatenate, and
    * invert the byte map. One `element_at` against a single
    * model-sized array LITERAL per row — map-only, no shuffle, no
    * join: decode at 100 TB is a pure scan, the same shape as encode's
    * broadcast id map but without even the broadcast.
    *
    * Exactness is a property of the PRE-TOKENIZER, not the decoder:
    * over an sp-trained model ([[byteWordsSp]]) the id sequence
    * partitions the original bytes, so `decode(encode(text)) == text`
    * byte-for-byte — any script, emoji, newline runs, trailing
    * whitespace. Over the separator variant ([[byteWords]]) words
    * decode exactly but the stream carries no whitespace, so the
    * corpus decode returns the words CONCATENATED — a documented
    * inspection form, not a reconstruction. An id outside the model
    * table (impossible from our encoders; possible from corrupted
    * input) raises loudly rather than decoding garbage. */
  def decodeCorpus(perDoc: DataFrame, idsCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val syms = modelSymbols(merges)
      .sortWith(TextAnalysis.utf8Compare(_, _) < 0)
    val table = typedLit(syms)
    val mapped = transform(col(idsCol), id =>
      coalesce(try_element_at(table, id.cast("int") + 1),
        raise_error(concat(lit("ByteBpe.decodeCorpus: token id "),
          id.cast("string"),
          lit(s" outside the model table (|table|=${syms.length}) — " +
            "ids and model do not match")).cast("string"))))
    perDoc.withColumn("decoded",
      ByteMap.byteMapDecode(array_join(mapped, "")))
  }
}
