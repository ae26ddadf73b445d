package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** containmentPairs semantics: directed quote-in-article detection that
  * symmetric Jaccard misses, exact recall at full containment, the
  * size-asymmetry direction rules, and the maxPostings skew lever. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private val article = (1 to 100).map(i => s"tok$i").mkString(" ")
  private val quote = (10 to 25).map(i => s"tok$i").mkString(" ")

  test("quote inside article: directed pair found, jaccard would miss it") {
    val df = Seq((1L, article), (2L, quote),
      (3L, "entirely unrelated words about spark catalyst planning here"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // only quote-in-article; never the reverse (article isn't in quote),
    // never the unrelated doc
    assert(got.toSeq === Seq((2L, 1L, 1.0)))
    // and symmetric jaccard on the same pair is hopeless (14/98 shingles)
    val j = Dedup.minhashDupPairs(df, "doc_id", "text", threshold = 0.7)
      .count()
    assert(j === 0L)
  }

  test("mutual containment for exact dups, both directions") {
    val df = Seq((1L, article), (2L, article)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got === Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }

  test("partial overlap below threshold is excluded, above is kept") {
    // 30-token doc sharing its last 20 tokens with the probe: the probe's
    // 28 shingles include 18 shared ones -> containment ~0.64 < 0.9
    val partial = ((80 to 89).map(i => s"x$i") ++
      (1 to 20).map(i => s"tok$i")).mkString(" ")
    val df = Seq((1L, article), (2L, partial)).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(df, "doc_id", "text",
      threshold = 0.9).count() === 0L)
    val loose = Dedup.containmentPairs(df, "doc_id", "text",
      threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(loose === Seq((2L, 1L)))
  }

  test("maxPostings drops stop-shingle postings but exact dups survive") {
    // every doc shares a hot 3-token prefix; pairs must still surface via
    // their rarer shingles once the hot posting list is dropped
    val hot = "the quick brown"
    val docs = (1 to 30).map(i => (i.toLong, s"$hot body$i word$i tail$i"))
    val df = (docs :+ (99L, s"$hot body7 word7 tail7")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text",
      threshold = 0.9, maxPostings = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((7L, 99L), (99L, 7L)))
  }
}
