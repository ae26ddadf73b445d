package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def wf(pairs: (String, Long)*) =
    pairs.toSeq.toDF("word", "freq")

  test("seedVocab: singles always kept, multi top-K by (cnt desc, piece asc), cost from kept mass") {
    val v = Unigram.seedVocab(wf(("abab", 10L), ("abc", 5L)), vocabSize = 2,
      maxPieceLen = 3).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // singles: a: 10*2+5=25, b: 25, c: 5; multis: ab: 10*2+5=25,
    // ba: 10, bc: 5, abc: 5, aba: 10, bab: 10, abc 5 -> top2 by
    // (cnt, piece): ab(25), aba(10) beats ba/bab on the piece tie rule
    assert(v.keySet === Set("a", "b", "c", "ab", "aba"))
    assert(v("ab")._1 === 25L && v("aba")._1 === 10L)
    val tot = v.values.map(_._1).sum.toDouble
    v.foreach { case (p, (c, mu)) =>
      assert(mu === math.round(math.log(tot / c) * 1e6), s"cost of $p")
    }
  }

  test("viterbi matches brute-force lexicographic (score, pieces) minimum") {
    val vocab = Seq("a" -> 900000L, "b" -> 1200000L, "c" -> 1500000L,
      "ab" -> 1400000L, "bc" -> 1600000L, "abc" -> 2700000L,
      "cc" -> 2000000L, "abab" -> 2300000L)
    val vm = vocab.toMap
    def brute(w: String): (Long, Int) = {
      def segs(s: String): Seq[Seq[String]] =
        if (s.isEmpty) Seq(Seq.empty)
        else (1 to math.min(4, s.length)).flatMap { n =>
          val h = s.substring(0, n)
          if (vm.contains(h)) segs(s.substring(n)).map(h +: _) else Seq.empty
        }
      segs(w).map(ps => (ps.map(vm).sum, ps.length)).min
    }
    val words = Seq("a", "abc", "ababc", "abababab", "ccc", "cabcab",
      "bcbc", "aabbcc")
    val got = Unigram.encodeWords(words.toDF("word"), "word", vocab)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getInt(2)), r.getSeq[String](1))).toMap
    words.foreach { w =>
      assert(got(w)._1 === brute(w), s"word $w")
      assert(got(w)._2.mkString === w, s"cover $w")
    }
  }

  test("unknown characters segment at unkCostMu; empty and null words survive") {
    val vocab = Seq("a" -> 1000000L, "xy" -> 500000L)
    val out = Unigram.encodeWords(
      Seq[String]("axya", "zz", null, "").toDF("word"), "word", vocab,
      unkCostMu = 7000000L).collect()
      .map(r => Option(r.getString(0)) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(Some("axya"))._3 === Some(2500000L)) // a + xy + a
    assert(out(Some("zz"))._3 === Some(14000000L))  // two unk chars
    assert(out(Some(""))._2 === Some(0))
    assert(out(None) === ((None, None, None)))
  }

  test("code-point semantics: supplementary characters stay whole on every path") {
    val emoji = new String(Character.toChars(0x1F600)) // 2 UTF-16 units
    // unknown emoji = ONE code point = one unk charge, piece intact
    val out1 = Unigram.encodeWords(Seq("a" + emoji + "a").toDF("word"),
        "word", Seq("a" -> 1000000L), unkCostMu = 7000000L)
      .collect().head
    assert(out1.getLong(3) === 2000000L + 7000000L)
    assert(out1.getSeq[String](1) === Seq("a", emoji, "a"))
    // a vocab piece CONTAINING an emoji matches as one 2-code-point
    // piece (maxLen measured in code points, not UTF-16 units)
    val piece = emoji + "x"
    val out2 = Unigram.encodeWords(Seq(piece).toDF("word"), "word",
        Seq(piece -> 500000L, "x" -> 1000000L), unkCostMu = 7000000L)
      .collect().head
    assert(out2.getInt(2) === 1 && out2.getLong(3) === 500000L)
    // trainLocal counts seed substrings in code points too: the
    // 2-unit emoji is one candidate character, protected as a single
    val m = Unigram.trainLocal(wf((emoji + "b", 5L)), vocabSize = 2,
      maxPieceLen = 2)
    assert(m.pieces.map(_._1).contains(emoji))
    assert(!m.pieces.map(_._1).exists(p =>
      p.length == 1 && Character.isSurrogate(p.charAt(0))))
  }

  test("trainLocal: EM likelihood is non-decreasing and training is deterministic") {
    val corpus = wf(("abab", 50L), ("ab", 30L), ("abc", 20L),
      ("cab", 10L), ("bc", 5L))
    def likelihood(m: Unigram.UnigramModel): Double = {
      val p = m.pieces.map(x => x._1 -> x._2).toMap
      def pw(w: String): Double = {
        val a = new Array[Double](w.length + 1); a(0) = 1.0
        for (j <- 1 to w.length; n <- 1 to math.min(8, j))
          a(j) += a(j - n) * p.getOrElse(w.substring(j - n, j), 0.0)
        a(w.length)
      }
      Seq(("abab", 50L), ("ab", 30L), ("abc", 20L), ("cab", 10L),
        ("bc", 5L)).map { case (w, f) => f * math.log(pw(w)) }.sum
    }
    // vocabSize large enough that no prune happens: pure EM steps
    val ls = (1 to 4).map(k =>
      likelihood(Unigram.trainLocal(corpus, vocabSize = 50, emIters = k)))
    ls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"EM likelihood decreased: $ls")
    }
    val m1 = Unigram.trainLocal(corpus, vocabSize = 4, emIters = 2)
    val m2 = Unigram.trainLocal(corpus, vocabSize = 4, emIters = 2)
    assert(m1 === m2)
  }

  test("trainLocal: prune hits vocabSize, keeps all singles, concentrates on real pieces") {
    val corpus = wf(("abab", 100L), ("ababab", 60L), ("cdcd", 40L),
      ("xq", 1L))
    val m = Unigram.trainLocal(corpus, vocabSize = 3, emIters = 2)
    val pieces = m.pieces.map(_._1)
    val singles = pieces.filter(_.length == 1)
    assert(Set("a", "b", "c", "d", "x", "q").subsetOf(singles.toSet))
    assert(pieces.count(_.length >= 2) <= 3)
    // the dominant bigram survives pruning with high probability
    val probs = m.pieces.map(x => x._1 -> x._2).toMap
    assert(probs.contains("ab") || probs.contains("abab"),
      s"expected an ab-family piece in ${pieces}")
    val best = probs.filter(_._1.length >= 2)
    assert(best.values.max > probs.getOrElse("x", 1.0),
      "multi-char mass should beat rare singles")
  }

  test("encodeCorpus: ids decode back to the corpus words; n_tok and score are additive") {
    val docs = Seq((1L, "abab abc"), (2L, "ABC  abab"), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val vocab = Seq("a" -> 900000L, "b" -> 1200000L, "c" -> 1500000L,
      "ab" -> 1400000L, "abab" -> 2300000L)
    val (vdf, out) = CacheScope.withScope { implicit s =>
      val (v, o) = Unigram.encodeCorpus(docs, "doc_id", "text", vocab)
      (v.collect().map(r => r.getInt(0) -> r.getString(1)).toMap,
        o.orderBy("doc_id").collect())
    }
    val byId = out.map(r => r.getLong(0) ->
      (r.getSeq[Int](1).map(vdf), r.getLong(2), r.getInt(3))).toMap
    assert(byId(1L)._1.mkString === "abababc")
    // abab = 2.3e6 as ONE piece beats ab+ab = 2.8e6; abc = ab + c
    assert(byId(1L)._2 === 2300000L + 1400000L + 1500000L)
    assert(byId(1L)._3 === 3)
    // case-folded, whitespace-immune; word order differs so the token
    // sequence reverses at the word grain, but mass and score match
    assert(byId(2L)._1.mkString === "abcabab")
    assert(byId(2L)._2 === byId(1L)._2 && byId(2L)._3 === byId(1L)._3)
    assert(byId(3L) === ((Seq.empty, 0L, 0)))
    assert(byId(4L) === ((Seq.empty, 0L, 0)))
  }

  test("encodeWords is bit-identical across partition layouts") {
    val vocab = Seq("a" -> 900000L, "b" -> 1200000L, "ab" -> 1400000L)
    val words = (0 until 200).map(i => "ab" * (i % 7 + 1))
    def run(parts: Int) =
      Unigram.encodeWords(words.toDF("word").repartition(parts), "word",
        vocab).orderBy("word", "score_mu").collect()
        .map(r => (r.getString(0), r.getSeq[String](1), r.getInt(2),
          r.getLong(3))).toSeq
    assert(run(1) === run(7))
  }

  test("tokenFertility: per-group word/byte/token counters, 'und' fallback, zero-word guard") {
    import graft.operators.TextAnalysis
    // doc 1 (en): 2 words, doc 2 (en): 1 word, doc 3 (null lang): 1
    // word, doc 4 (de): null text -> 0 words 0 bytes; "é" is 2 UTF-8
    // bytes so byte counting is octet- not char-based
    val docs = Seq(
      (1L, Some("ab ab"), Some("en")),
      (2L, Some("abé"), Some("en")),
      (3L, Some("b"), None),
      (4L, None, Some("de"))).toDF("doc_id", "text", "lang")
    val perTok = Seq((1L, 4), (2L, 2), (3L, 1), (4L, 0))
      .toDF("doc_id", "n_tok")
    val out = TextAnalysis.tokenFertility(docs, "doc_id", "text",
        "lang", perTok)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // de: the null-text doc -> all-zero counters, 0.0 ratios (guards)
    assert(out(0) === (("de", 1L, 0L, 0L, 0L, 0.0, 0.0)))
    // en: 3 words, 6 tokens, bytes = 5 + 4 ("abé" = 4 octets)
    assert(out(1) === (("en", 2L, 3L, 6L, 9L, 2.0, 1.5)))
    // null lang reports as 'und'
    assert(out(2) === (("und", 1L, 1L, 1L, 1L, 1.0, 1.0)))
    // a doc missing from the token frame counts 0 tokens, not a drop
    val sparse = TextAnalysis.tokenFertility(docs, "doc_id", "text",
        "lang", perTok.filter($"doc_id" =!= 2L))
      .filter($"lang" === "en").collect().head
    assert(sparse.getLong(3) === 4L)
    assert(sparse.getLong(1) === 2L)
  }
}
