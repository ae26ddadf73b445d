package graft

import graft.operators.{TextAnalysis => TA}

/** PMI collocations (t22): hand-computed PMI, document-boundary
  * handling, the minCount support filter, and the hapax pathology the
  * filter exists for. */
class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  private def colloc(docs: Seq[String], minCount: Long)
      : Map[(String, String), (Long, Long)] =
    TA.collocations(docs.toDF("text"), "text", minCount)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap

  test("PMI matches the hand computation to the micro") {
    // tokens: doc1 = [new york new york], doc2 = [in new york]; N = 7
    // unigrams: new=3 york=3 in=1; pairs: (new,york)=3 (york,new)=1
    // (in,new)=1. minCount=2 keeps only (new,york):
    // PMI = ln(3*7 / (3*3)) = ln(7/3) = 0.84729786... -> 847298 micros
    val got = colloc(Seq("new york new york", "in new york"), 2L)
    assert(got.keySet === Set(("new", "york")))
    assert(got(("new", "york")) === ((3L, 847298L)))
  }

  test("pairs never cross document boundaries") {
    // doc1 ends in 'b', doc2 starts with 'b' — (b,b) must not exist
    val got = colloc(Seq("a b", "b a"), 1L)
    assert(got.keySet === Set(("a", "b"), ("b", "a")))
  }

  test("minCount drops low-support pairs; the unfiltered hapax-of-" +
      "hapax pair scores ln N (the pathology the filter exists for)") {
    // 'qq zz' appears once, both words hapax -> PMI = ln(N)
    val docs = Seq("common common common common", "qq zz",
      "common common")
    val all = colloc(docs, 1L)
    val n = 8L // 4 + 2 + 2 tokens
    assert(all(("qq", "zz"))._2 ===
      math.round(math.log(n.toDouble) * 1e6))
    // it outranks the high-support pair...
    assert(all(("qq", "zz"))._2 > all(("common", "common"))._2)
    // ...and minCount=2 removes it
    assert(!colloc(docs, 2L).contains(("qq", "zz")))
  }

  test("null and empty docs contribute nothing and do not crash") {
    // pairs: (x,y) twice, (y,x) once — minCount=2 keeps only (x,y)
    val got = TA.collocations(
      Seq(Some("x y x y"), None, Some(""), Some("   "))
        .toDF("text"), "text", 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("x", "y")))
  }

  test("folded disjoint deltas reproduce the one-shot scores value " +
      "for value") {
    import org.apache.spark.sql.functions._
    val docs = Seq((0L, "a b a b c"), (1L, "b c b c"),
      (2L, "a c a c a"), (3L, "c a b"), (4L, "")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("w1", "w2").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSeq
    val one = rows(TA.collocations(docs, "text", 1L))
    val folded = rows(TA.collocationsFrom(TA.foldColloc(
      TA.collocCounts(docs.filter(col("doc_id") % 2 === 0), "text"),
      TA.collocCounts(docs.filter(col("doc_id") % 2 =!= 0), "text")),
      1L))
    assert(folded === one)
    assert(one.nonEmpty)
  }

  test("validation fails loudly") {
    intercept[IllegalArgumentException] {
      TA.collocations(Seq("a b").toDF("text"), "text", 0L)
    }
  }
}
