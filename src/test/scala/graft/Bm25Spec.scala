package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** BM25 semantics on a corpus small enough to reason about by hand:
  * inverted-index scoping, idf ordering, tf saturation, and length
  * normalization direction. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark catalyst optimizer rules"),
    (2L, "spark spark spark spark spark spark spark spark"),
    (3L, "catalyst"),
    (4L, "unrelated words entirely different topic here"),
    (5L, "spark catalyst"))
    .toDF("doc_id", "text")

  private def search(q: String, k: Int = 10) =
    TextAnalysis.bm25TopK(docs, "doc_id", "text",
      Seq((100L, q)).toDF("qid", "qtext"), "qid", "qtext", k)
      .orderBy("rank")
      .collect().map(r => (r.getLong(2), r.getDouble(3)))

  test("only docs containing a query term are scored") {
    val got = search("catalyst")
    assert(got.map(_._1).toSet === Set(1L, 3L, 5L))
  }

  test("shorter matching docs rank above longer ones (length norm)") {
    // doc 3 is a pure one-term match; doc 5 two terms; doc 1 four terms
    val got = search("catalyst").map(_._1).toSeq
    assert(got === Seq(3L, 5L, 1L))
  }

  test("tf saturates: 8x spam term cannot dominate a two-term match") {
    val got = search("spark catalyst")
    // doc 5 matches BOTH terms in two tokens — beats the 8x 'spark' spam
    assert(got.head._1 === 5L)
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L, 5L))
  }

  test("k bounds the result and scores are rank-ordered") {
    val got = search("spark catalyst", k = 2)
    assert(got.length === 2)
    assert(got.map(_._2).sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true })
  }
}
