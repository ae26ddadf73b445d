package graft

import graft.pipelines.CorpusPipeline
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("corpus clean: monotone stage counts, dups removed, survivors clean") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang")
    // plant exact + near duplicates
    val exactCopies = docs.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 20000L).as("doc_id"),
        upper(col("text")).as("text"), col("lang"))
    val nearCopies = docs.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 30000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text"), col("lang"))
    val all = docs.unionByName(exactCopies).unionByName(nearCopies)

    val (cleaned, stats) = CorpusPipeline.clean(all, "doc_id", "text",
      CorpusPipeline.Config(langs = Seq("en", "und"), minQuality = 0.3,
        minhashThreshold = 0.8))
    // stage counts are monotone non-increasing
    assert(stats("input") >= stats("after_lang_quality"))
    assert(stats("after_lang_quality") >= stats("after_exact_dedup"))
    assert(stats("after_exact_dedup") >= stats("after_near_dedup"))
    // every planted exact copy that survived filtering was removed
    val survivors = cleaned.select("doc_id").as[Long].collect().toSet
    assert(!survivors.exists(_ >= 20000L && survivors.size > 0))
    // near-dup copies: losers (higher ids) removed when their original
    // also survived the quality gate
    val originals = survivors.filter(_ < 10000L)
    val nearSurvivors = survivors.filter(id => id >= 30000L)
    nearSurvivors.foreach { id =>
      assert(!originals.contains(id - 30000L),
        s"near-dup pair ($id, ${id - 30000L}) both survived")
    }
    // survivors really are clean: re-running removes nothing
    val (again, stats2) = CorpusPipeline.clean(cleaned, "doc_id", "text",
      CorpusPipeline.Config(langs = Seq("en", "und"), minQuality = 0.3,
        minhashThreshold = 0.8))
    assert(stats2("input") === stats2("after_near_dedup"))
    assert(again.count() === cleaned.count())
  }

  test("clean releases every cache it creates and severs loser lineage") {
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang")
    val (cleaned, stats) = CorpusPipeline.clean(docs, "doc_id", "text",
      CorpusPipeline.Config(langs = Seq("en", "und"), minQuality = 0.3))
    assert(stats("after_near_dedup") === cleaned.count())
    // no internal frame (kept corpus, exact-loser set, MinHash
    // signatures) may outlive the call — at 148 bench gates the
    // accumulated MEMORY_AND_DISK frames are real eviction pressure
    assert(spark.sharedState.cacheManager.isEmpty,
      "clean leaked cached frames into the session")
    // the returned frame's plan is a checkpointed RDD scan: later
    // actions can never re-run the annotation or LSH stages
    val planStr = cleaned.queryExecution.optimizedPlan.toString
    assert(!planStr.contains("Join"),
      s"cleaned plan still carries pipeline stages:\n$planStr")
  }

  test("webFront: extracts, blocklists by domain and lexicon, counts " +
      "each drop reason once, adds no shuffle") {
    import spark.implicits._
    val raw = Seq(
      (1L, "https://ok.org/a", "<p>fine text entirely here.</p>"),
      (2L, "https://www.Bad.example.com/x", "<p>fine text too.</p>"),
      (3L, "https://ok.org/b", "<p>spam spam spam word.</p>"))
      .toDF("doc_id", "url", "html")
    val (kept, obs) = CorpusPipeline.webFront(raw, "doc_id", "html",
      "url", "text", blockedDomains = Seq("example.com"),
      lexicon = Seq("spam"), maxBadFrac = 0.5)
    // collect UNSORTED: an orderBy's range-partition sampling pass
    // would evaluate the observe a second time and double the counts
    val rows = kept.collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L))
    assert(rows.head.getAs[String]("text") === "fine text entirely here.")
    val m = obs.get
    assert(m("n_in") === 3L && m("n_domain_blocked") === 1L &&
      m("n_lexicon_blocked") === 1L)
    // map-only: the front contributes zero exchanges
    val exchanges = kept.queryExecution.executedPlan.collectWithSubqueries {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        => e }
    assert(exchanges.isEmpty, s"webFront must not shuffle:\n$exchanges")
  }
}
