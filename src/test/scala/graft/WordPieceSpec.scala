package graft

import graft.operators.WordPiece
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("vocab: positional forms count separately; singles of both forms always kept; top-K ties break on piece") {
    // "abab" x3, "bab" x1: initial substrings of abab -> a, ab, aba,
    // abab; interior -> ##b, ##ba, ##bab, ##a, ##ab, ##b(2nd) ...
    val wf = Seq(("abab", 3L), ("bab", 1L)).toDF("word", "freq")
    val v = CacheScope.withScope { implicit s =>
      WordPiece.vocab(wf, vocabSize = 3, maxPieceLen = 4)
        .orderBy("piece").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq
    }
    val m = v.toMap
    // singles survive regardless of K, in both forms, with positional
    // counts: 'a' starts abab x3; '##a' is interior in abab x3 + bab
    // x1; '##b' interior twice per abab (x3 words) + once in bab = 7
    assert(m("a") === 3L && m("b") === 1L)
    assert(m("##a") === 4L && m("##b") === 7L)
    // K=3 multis by (cnt desc, piece asc): ##ab=4 first, then the
    // cnt=3 tie resolves UTF8 ('#' < 'a'): ##ba, ##bab beat ab/aba/abab
    val multis = v.filter { case (p, _) =>
      (if (p.startsWith("##")) p.length - 2 else p.length) >= 2 }
    assert(multis.toSet === Set("##ab" -> 4L, "##ba" -> 3L,
      "##bab" -> 3L))
    assert(v.size === 7)
  }

  test("encodeWords: greedy longest-match-first with ## continuation; no-match collapses to [UNK]") {
    val pieces = Seq("un", "##aff", "##able", "##ffable", "a", "##a",
      "##b", "b")
    val out = WordPiece.encodeWords(
        Seq("unaffable", "unz", "ab", "", "aaa").toDF("word"), "word",
        pieces)
      .collect().map(r => r.getString(0) ->
        (r.getSeq[String](1), r.getInt(2), r.getBoolean(3))).toMap
    // BERT's canonical example: un ##aff ##able (greedy takes ##aff
    // over ##a at position 2 — longest wins; ##ffable can never fire
    // because ##aff consumed through position 4)
    assert(out("unaffable") === ((Seq("un", "##aff", "##able"), 3, false)))
    // z has no continuation piece -> the WHOLE word is [UNK], the
    // matched "un" prefix is discarded
    assert(out("unz") === ((Seq("[UNK]"), 1, true)))
    assert(out("ab") === ((Seq("a", "##b"), 2, false)))
    assert(out("") === ((Seq(), 0, false)))
    assert(out("aaa") === ((Seq("a", "##a", "##a"), 3, false)))
  }

  test("encodeWords: code-point matching — supplementary chars never split into surrogates") {
    // U+1D400 MATHEMATICAL BOLD CAPITAL A (2 UTF-16 units)
    val g = new String(Character.toChars(0x1D400))
    val pieces = Seq(g, s"##$g", "x", "##x")
    val out = WordPiece.encodeWords(
        Seq(s"${g}x$g").toDF("word"), "word", pieces)
      .collect().map(r => (r.getSeq[String](1), r.getBoolean(3)))
    assert(out.head === ((Seq(g, "##x", s"##$g"), false)))
  }

  test("encodeCorpus: per-doc token ids in word order; [UNK] ranks as a symbol; n_unk counts occurrences") {
    val docs = Seq(
      (1L, "ab zz ab"), // zz -> [UNK] twice at the doc grain? no — 2 occurrences of zz
      (2L, "AB\tab"), // case-folded, whitespace-immune
      (3L, ""), (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val pieces = Seq("a", "##b")
    val (vdf, perDoc) = CacheScope.withScope { implicit s =>
      val (v, o) = WordPiece.encodeCorpus(docs, "doc_id", "text", pieces)
      (v.collect().map(r => r.getInt(0) -> r.getString(1)).toMap,
        o.orderBy("doc_id").collect())
    }
    // used symbols UTF8-sorted: '#' (0x23) < '[' (0x5B) < 'a'
    assert(vdf === Map(0 -> "##b", 1 -> "[UNK]", 2 -> "a"))
    val byId = perDoc.map(r => r.getLong(0) ->
      (r.getSeq[Int](1), r.getInt(2), r.getInt(3))).toMap
    // doc 1: ab=[a,##b] zz=[UNK] ab=[a,##b] -> ids 2,0,1,2,0; n_unk=1
    // occurrence... zz occurs once in doc 1 (text "ab zz ab")
    assert(byId(1L) === ((Seq(2, 0, 1, 2, 0), 1, 5)))
    assert(byId(2L) === ((Seq(2, 0, 2, 0), 0, 4)))
    assert(byId(3L) === ((Seq(), 0, 0)))
    assert(byId(4L) === ((Seq(), 0, 0)))
  }

  test("encodeCorpus: duplicate [UNK] occurrences count per occurrence") {
    val docs = Seq((1L, "zz yy zz")).toDF("doc_id", "text")
    val (_, perDoc) = CacheScope.withScope { implicit s =>
      val (v, o) = WordPiece.encodeCorpus(docs, "doc_id", "text",
        Seq("a"))
      (v, o.collect())
    }
    val r = perDoc.head
    // three [UNK] tokens (zz, yy, zz), n_unk counts all three
    assert(r.getSeq[Int](1) === Seq(0, 0, 0))
    assert(r.getInt(2) === 3)
    assert(r.getInt(3) === 3)
  }

  test("encodeWords is bit-identical across partition layouts") {
    val pieces = Seq("a", "b", "ab", "##a", "##b", "##ab")
    val words = (0 until 300).map(i => ("ab" * (i % 6 + 1)) +
      (if (i % 11 == 0) "z" else ""))
    def run(parts: Int) =
      WordPiece.encodeWords(words.toDF("word").repartition(parts),
          "word", pieces)
        .orderBy("word").collect()
        .map(r => (r.getString(0), r.getSeq[String](1), r.getInt(2),
          r.getBoolean(3))).toSeq
    assert(run(1) === run(7))
  }
}
