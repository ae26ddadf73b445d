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

  test("probe sampling dodges hot shingles: recall survives a bottom-k " +
      "of hot hashes") {
    // docs share a LONG hot boilerplate (many hot shingles, likely to
    // dominate any doc's bottom-k) plus a distinctive tail; with probes
    // sampled from NON-hot shingles only, the planted dup pair must
    // surface regardless of where the hot hashes sort
    val boiler = (1 to 20).map(i => s"boiler$i").mkString(" ")
    val docs = (1 to 40).map(i => (i.toLong, s"$boiler unique$i tail$i"))
    val df = (docs :+ (99L, s"$boiler unique3 tail3")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text",
      threshold = 0.9, probeK = 2, maxPostings = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((3L, 99L), (99L, 3L)))
  }

  test("a pure-boilerplate doc raises loudly by default, is skippable " +
      "by opt-in") {
    // doc 50 consists ENTIRELY of hot shingles: with probes restricted
    // to non-hot hashes it would silently get no candidates as id_a
    val hot = "the quick brown fox jumps"
    val docs = (1 to 30).map(i => (i.toLong, s"$hot body$i word$i"))
    val df = (docs :+ (50L, hot)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.containmentPairs(df, "doc_id", "text",
        threshold = 0.9, maxPostings = 5).collect()
    }
    assert(e.getMessage.contains("no shingle with DF <= maxPostings"))
    assert(e.getMessage.contains("id=50"))
    // opt-in drop: same corpus completes; doc 50 emits no probes but the
    // planted non-boilerplate pair is unaffected
    val df2 = df.unionByName(Seq((99L, s"$hot body7 word7"))
      .toDF("doc_id", "text"))
    val got = Dedup.containmentPairs(df2, "doc_id", "text",
      threshold = 0.9, maxPostings = 5, skipAllHotDocs = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((7L, 99L), (99L, 7L)))
  }

  test("pluggable shingle hash: md5-portable hash finds the same pairs") {
    // the recall-monitor gate swaps xxhash64 for an md5-derived hash so
    // DuckDB can replay the candidate path; pair OUTPUT must be
    // hash-family-independent (only probe ordering changes)
    val df = Seq((1L, article), (2L, quote),
      (3L, "entirely unrelated words about spark catalyst planning here"))
      .toDF("doc_id", "text")
    val md5Hash = (s: org.apache.spark.sql.Column) =>
      conv(substring(md5(s), 1, 15), 16, 10).cast("long")
    val got = Dedup.containmentPairs(df, "doc_id", "text",
      threshold = 0.9, shingleHash = md5Hash)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((2L, 1L, 1.0)))
  }
}
