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
}
