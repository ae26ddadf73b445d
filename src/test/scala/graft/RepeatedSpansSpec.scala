package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** repeatedSpans / removeRepeatedSpans semantics: cross-doc repeated
  * passages found in every holder, overlapping windows merge into one
  * maximal span, within-doc repetition counts toward minOcc, the cut
  * removes exactly the spanned tokens, and untouched docs pass through
  * byte-identical. */
class RepeatedSpansSpec extends SparkSpec {
  import spark.implicits._

  private val passage = (1 to 12).map(i => s"p$i").mkString(" ")

  test("shared passage yields one merged span in each holding doc") {
    val a = ((1 to 5).map(i => s"a$i") :+ passage).mkString(" ") +
      " " + (6 to 10).map(i => s"a$i").mkString(" ")
    val b = ((1 to 3).map(i => s"b$i") :+ passage).mkString(" ")
    val c = "entirely unique words never repeated anywhere in this corpus"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(df, "doc_id", "text", k = 8)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3)))
    // doc 1: passage tokens at 5..16 -> windows 5..9 (5 of them), one
    // span [5,16]; doc 2: passage at 3..14 -> span [3,14]; doc 3: none
    assert(got.toSeq === Seq((1L, 5, 16, 5L), (2L, 3, 14, 5L)))
  }

  test("within-doc repetition alone reaches minOcc") {
    val df = Seq((1L, s"$passage x y z $passage"),
      (2L, "nothing shared here at all beyond vocabulary"))
      .toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(df, "doc_id", "text", k = 8)
      .filter(col("doc_id") === 1L).count()
    assert(spans >= 1L)
  }

  test("minOcc above the corpus count suppresses the span") {
    val a = s"intro $passage outro"
    val b = s"other $passage tail"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(df, "doc_id", "text", k = 8,
      minOcc = 3).count() === 0L)
    assert(Dedup.repeatedSpans(df, "doc_id", "text", k = 8,
      minOcc = 2).count() === 2L)
  }

  test("removeRepeatedSpans cuts exactly the spanned tokens") {
    // doc 1 carries UPPERCASE surround tokens: matching is case-folded
    // but the rebuilt text must keep the original case
    val a = ((1 to 5).map(i => s"A$i") :+ passage).mkString(" ") +
      " " + (6 to 10).map(i => s"A$i").mkString(" ")
    val untouched = "entirely  unique   text with odd spacing kept as-is"
    val df = Seq((1L, a), (2L, s"pre $passage post"), (3L, untouched))
      .toDF("doc_id", "text")
    val got = Dedup.removeRepeatedSpans(df, "doc_id", "text", k = 8)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got(0) === ((1L,
      (1 to 5).map(i => s"A$i").mkString(" ") + " " +
        (6 to 10).map(i => s"A$i").mkString(" "), 12L)))
    assert(got(1) === ((2L, "pre post", 12L)))
    // no span -> ORIGINAL text, double spaces and all
    assert(got(2) === ((3L, untouched, 0L)))
  }
}
