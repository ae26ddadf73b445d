package graft

import graft.operators.{TextAnalysis => TA}
import org.apache.spark.sql.functions._

/** BPE tokenizer training (t14/t14b): greedy-apply semantics —
  * especially the overlapping-run case the run-parity oracle rule
  * replays — merge ordering, tie-breaks, and the encoder contract. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def seg(words: Seq[String],
      merges: Seq[(String, String)]): Map[String, Seq[String]] =
    TA.bpeSegmentWords(words.toDF("word"), "word", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap

  test("greedy left-to-right merge: overlapping repeated-symbol runs " +
      "keep every other match") {
    // "aaaa" under (a,a): greedy fuses (1,2) and (3,4) -> [aa, aa];
    // "aaa" -> [aa, a]; a fused symbol never immediately re-fuses
    val m = Seq(("a", "a"))
    val got = seg(Seq("aaaa", "aaa", "a", "baab"), m)
    assert(got("aaaa") === Seq("aa", "aa"))
    assert(got("aaa") === Seq("aa", "a"))
    assert(got("a") === Seq("a"))
    assert(got("baab") === Seq("b", "aa", "b"))
  }

  test("merges apply in training order and chain onto fused symbols") {
    // (a,b) then (ab,c): "abc" -> [ab, c] -> [abc]
    val got = seg(Seq("abc", "cab", "abab"),
      Seq(("a", "b"), ("ab", "c")))
    assert(got("abc") === Seq("abc"))
    assert(got("cab") === Seq("c", "ab"))
    assert(got("abab") === Seq("ab", "ab"))
  }

  test("bpeTrain learns the frequency-ordered merges with " +
      "deterministic tie-breaks") {
    // corpus: "low" x5, "lower" x2 -> 'l o w' dominates: (l,o)=7 is
    // the top pair (ties with (o,w) broken lhs ASC), then (lo,w)=7
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower"))
      .toDF("text")
    val wf = TA.bpeWordFreq(docs, "text")
    val merges = TA.bpeTrain(wf, nMerges = 3)(CacheScope.session)
      .orderBy("iter").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(merges(0) === ((1, "l", "o", 7L)))
    assert(merges(1) === ((2, "lo", "w", 7L)))
    // after [low] fuses, remaining adjacencies are low-e, e-r (2 each);
    // tie breaks (lhs, rhs) ASC -> (e, r)
    assert(merges(2) === ((3, "e", "r", 2L)))
    // encode with the learned merges: training words reach their
    // trained segmentations
    val got = seg(Seq("low", "lower", "slow"),
      merges.map(m => (m._2, m._3)).toSeq)
    assert(got("low") === Seq("low"))
    assert(got("lower") === Seq("low", "er"))
    assert(got("slow") === Seq("s", "low"))
  }

  test("bpeTrain stops early when every word is a single symbol") {
    val wf = Seq(("a", 3L), ("b", 2L)).toDF("word", "freq")
    val merges = TA.bpeTrain(wf, nMerges = 4)(CacheScope.session)
    assert(merges.count() === 0)
  }

  // ---- production paths: local trainer + imperative encoder -------------

  /** Deterministic synthetic corpus with repeated-symbol runs, chained
    * fusions, ties, and a Zipf-ish head — the shapes that distinguish
    * greedy/tie-break implementations. */
  private def randomCorpus(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    val alpha = "abcde"
    (0 until n).map { _ =>
      val len = 1 + rnd.nextInt(8)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
  }

  test("bpeTrainLocal reproduces bpeTrain's sequential merge table " +
      "exactly (counts, order, tie-breaks)") {
    val docs = randomCorpus(400).toDF("text")
    val wf = TA.bpeWordFreq(docs, "text")
    wf.cache()
    val dist = TA.bpeTrain(wf, nMerges = 25)(CacheScope.session)
      .orderBy("iter").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val local = TA.bpeTrainLocal(wf, nMerges = 25)
      .orderBy("iter").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(local.toSeq === dist.toSeq)
    wf.unpersist()
  }

  test("bpeTrainLocal stops early when pairs are exhausted") {
    val wf = Seq(("ab", 3L), ("cd", 2L)).toDF("word", "freq")
    // only 2 mergeable pairs exist; ask for 10
    val merges = TA.bpeTrainLocal(wf, nMerges = 10)
      .orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(merges.toSeq === Seq(("a", "b"), ("c", "d")))
  }

  test("bpeTrainLocal maxVocab cap trains on the top words by " +
      "(freq DESC, word) deterministically") {
    val wf = Seq(("xy", 5L), ("xz", 5L), ("rare", 1L))
      .toDF("word", "freq")
    val capped = TA.bpeTrainLocal(wf, nMerges = 2, maxVocab = 2)
      .orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    // cap keeps ("xy", "xz"): ties on freq break word ASC; "rare" drops
    val manual = TA.bpeTrainLocal(
      Seq(("xy", 5L), ("xz", 5L)).toDF("word", "freq"), nMerges = 2)
      .orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(capped.toSeq === manual.toSeq)
  }

  test("bpeEncodeWords is bit-identical to the expression fold, " +
      "including unicode and null words") {
    val docs = randomCorpus(400).toDF("text")
    val wf = TA.bpeWordFreq(docs, "text")
    wf.cache()
    val merges = TA.bpeTrainLocal(wf, nMerges = 25)
      .orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocabPlus = wf.select(col("word"))
      .unionByName(strDf(
        Seq("héllo", "ééabc", "日本語ab", null, "", "a"),
        "word"))
    val fold = TA.bpeSegmentWords(vocabPlus, "word", merges,
        exprMax = Int.MaxValue)
      .collect().map(r => (Option(r.getString(0)),
        Option(r.getSeq[String](1)).map(_.toList))).toSet
    val imp = TA.bpeEncodeWords(vocabPlus, "word", merges)
      .collect().map(r => (Option(r.getString(0)),
        Option(r.getSeq[String](1)).map(_.toList))).toSet
    assert(imp === fold)
    // and the dispatch picks the imperative path above exprMax with
    // the same results
    val viaDispatch = TA.bpeSegmentWords(vocabPlus, "word", merges,
        exprMax = 4)
      .collect().map(r => (Option(r.getString(0)),
        Option(r.getSeq[String](1)).map(_.toList))).toSet
    assert(viaDispatch === fold)
    wf.unpersist()
  }

  test("bpeEncodeWords applies chained merges in training order " +
      "(rank-heap candidates match the sequential fold)") {
    // (a,b) -> ab; (c,d) -> cd; (ab,cd) -> abcd: the third merge's
    // symbols only exist after the first two fuse — the candidate heap
    // must pick it up from the fusion events, in order
    val merges = Seq(("a", "b"), ("c", "d"), ("ab", "cd"))
    val got = TA.bpeEncodeWords(
      Seq("abcd", "cdab", "abc").toDF("word"), "word", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("abcd") === Seq("abcd"))
    assert(got("cdab") === Seq("cd", "ab"))
    assert(got("abc") === Seq("ab", "c"))
  }
}
