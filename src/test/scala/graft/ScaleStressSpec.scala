package graft

import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.functions._

/** Scale-shape stress at 16x the sf0.1 gate corpus, with the skew the
  * gate corpus lacks: 4 boilerplate templates shared by 20k docs each
  * put every template shingle's DF (20000) ABOVE the containment cap
  * (maxPostings=10000) — the hot-posting-list regime a web corpus lives
  * in (at 200k docs/20 templates the DF sits exactly AT the cap and the
  * uncapped join was measured producing ~2.3e9 candidate rows; the cap
  * is what keeps candidates linear). Asserts the operators COMPLETE
  * under the forked JVM's capped heap with linear candidate volume and
  * full planted-pair recall. The 5M-doc run of the same harness
  * (graft.Stress) is recorded in README §scale.
  */
class ScaleStressSpec extends SparkSpec {

  private val n = 80000L
  private lazy val docs = {
    val d = Stress.corpus(spark, n, nTemplates = 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    d.count()
    d
  }

  test("containment at 80k docs: cap engages, candidates linear, " +
      "planted quotes all recovered") {
    CacheScope.withScope { implicit scope =>
      // telemetry join mirrors the operator's candidate construction
      val sh = scope.cache(docs.select(col("doc_id"),
        array_distinct(graft.operators.TextAnalysis
          .shingles(col("text"), 3)).as("shs"))
        .withColumn("shh", array_distinct(transform(col("shs"),
          s => xxhash64(s)))))
      val postings = sh.select(col("doc_id"), explode(col("shh")).as("h"))
      val dfh = postings.groupBy(col("h")).agg(count(lit(1)).as("df"))
      val nHot = dfh.filter(col("df") > 10000).count()
      // the 4 templates x 3 pure-template shingles must be hot — if not,
      // this spec is no longer exercising the capped regime
      assert(nHot >= 12L, s"expected >=12 hot shingles, got $nHot")

      val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.9, probeK = 8, maxPostings = 10000)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nPairs = pairs.count()
      // linear candidate volume: with hot postings dropped, pairs come
      // from tails (near-unique) — a quadratic blow-up would be O(n^2/4)
      assert(nPairs < 10L * n, s"containment pairs super-linear: $nPairs")

      val planted = docs.filter(col("doc_id") % 101 === 0 &&
        col("doc_id") + 1 < n && (col("doc_id") + 1) % 101 =!= 0 &&
        (col("doc_id") + 1) % 97 =!= 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      val nPlanted = planted.count()
      val nFound = planted.join(pairs, Seq("id_a", "id_b"), "left_semi")
        .count()
      // containment 1.0 → bottom-k probes cannot miss (exact recall)
      assert(nPlanted > 700L)
      assert(nFound === nPlanted,
        s"quote recall ${nFound}/$nPlanted — index path lost full-" +
          "containment pairs")
      pairs.unpersist()
    }
  }

  test("minhash LSH at 80k docs: hot-bucket candidates stay linear, " +
      "planted dups all recovered, clusters complete") {
    CacheScope.withScope { implicit scope =>
      val prepared = scope.cache(docs.select(col("doc_id"),
        graft.expressions.MinHash.minhashSig(col("text"), 3, 64)
          .as("sig")))
      val nCands = Dedup.lshCandidatePairs(
        Dedup.lshBands(prepared, "doc_id", "sig", 16), "doc_id").count()
      // shared-template docs agree on a band only when all 4 of its
      // minhashes land on the 3 shared template shingles (~(3/21)^4) —
      // buckets stay ~10 docs, candidates linear, never template^2/2
      assert(nCands < 10L * n, s"LSH candidates super-linear: $nCands")

      val pairs = Dedup.minhashDupPairs(docs, "doc_id", "text",
        k = 3, numHashes = 64, bands = 16, threshold = 0.7)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nPairs = pairs.count()
      val planted = docs.filter(col("doc_id") % 97 === 0 &&
        col("doc_id") + 1 < n && col("doc_id") % 101 =!= 0 &&
        (col("doc_id") + 1) % 101 =!= 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      val nPlanted = planted.count()
      val nFound = planted.join(pairs, Seq("id_a", "id_b"), "left_semi")
        .count()
      // planted jaccard = 21/23 ≈ 0.913: per-pair band-miss probability
      // is (1-0.913^4)^16 ≈ 5.6e-9 — deterministic hashes, so this
      // either always holds or names a permanent tuning problem
      assert(nPlanted > 700L)
      assert(nFound === nPlanted,
        s"dup recall ${nFound}/$nPlanted at jaccard 0.913")

      // connected components over the found pairs complete and every
      // pair member lands in a cluster
      val nInClusters = Curation.dupClusters(
        pairs.select("id_a", "id_b"), "id_a", "id_b")
        .select(col("id")).distinct().count()
      val nMembers = pairs.select(col("id_a").as("id"))
        .unionByName(pairs.select(col("id_b").as("id"))).distinct()
        .count()
      assert(nInClusters === nMembers)
      pairs.unpersist()
    }
  }

  test("simhash at 80k docs with density-sized chunks completes with " +
      "bounded candidates") {
    // 16-bit chunks (2^16 buckets) per the Dedup density note — the
    // 8-chunk default's 256 buckets would be O(n²/256) at this n
    CacheScope.withScope { implicit scope =>
      val pairs = Dedup.simhashDupPairs(docs, "doc_id", "text",
        maxHamming = 3, chunks = 4)
      val n = pairs.count()
      // pigeonhole-exact: every returned pair really is hamming <= 3;
      // volume must stay far below quadratic
      assert(n < 100000L, s"simhash pairs super-linear: $n")
    }
  }

  test("embedding near-dup at 80k vectors: planted rescaled copies all " +
      "recovered, candidates bounded") {
    val vecs = {
      val v = Stress.vectors(spark, 80000L)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      v.count(); v
    }
    CacheScope.withScope { implicit scope =>
      val pairs = Dedup.embeddingDupPairs(vecs, "vec_id", "embedding",
        threshold = 0.999, planes = 12, probes = 2, dim = 64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nPairs = pairs.count()
      assert(nPairs < 10L * 80000L, s"embedding pairs super-linear: $nPairs")
      val planted = vecs.filter(col("vec_id") % 89 === 0 &&
        col("vec_id") + 1 < 80000L)
        .select(col("vec_id").as("id_a"), (col("vec_id") + 1).as("id_b"))
      val nPlanted = planted.count()
      // a rescaled copy has the identical direction: same buckets, so
      // recall is structural, not probabilistic
      val nFound = planted.join(pairs, Seq("id_a", "id_b"), "left_semi")
        .count()
      assert(nPlanted > 800L)
      assert(nFound === nPlanted, s"embedding recall $nFound/$nPlanted")
      pairs.unpersist()
    }
    vecs.unpersist()
  }

  test("repeated spans at 80k docs: planted quotes fully spanned, span " +
      "volume linear") {
    CacheScope.withScope { implicit scope =>
      val spans = Dedup.repeatedSpans(docs, "doc_id", "text",
        k = 8, minOcc = 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nSpans = spans.count()
      // only the planted structures repeat (template prefixes mix with
      // unique tails inside every window): span count stays linear in
      // the planted count, never corpus-quadratic
      assert(nSpans < n / 10, s"span volume super-linear: $nSpans")
      val quotes = docs.filter(col("doc_id") % 101 === 0 &&
        col("doc_id") + 1 < n && (col("doc_id") + 1) % 101 =!= 0 &&
        (col("doc_id") + 1) % 97 =!= 0)
        .select(col("doc_id"))
      val nQuotes = quotes.count()
      val covered = quotes.join(spans.filter(col("span_start") === 0),
        Seq("doc_id"), "left_semi").count()
      assert(nQuotes > 700L)
      assert(covered === nQuotes, s"span recall $covered/$nQuotes")
      spans.unpersist()
    }
  }

  test("semantic dedup at 80k vectors / 256 cells: planted copies " +
      "collapse keep-first, cells bounded") {
    val vecs = {
      val v = Stress.vectors(spark, 80000L)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      v.count(); v
    }
    CacheScope.withScope { implicit scope =>
      val index = graft.operators.Similarity.ivfBuild(vecs, "vec_id",
        "embedding", nCells = 256, iters = 2)
      val out = Dedup.semanticDedup(vecs, "vec_id", "embedding",
        index.centroids, threshold = 0.999, maxClusterSize = 10000)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val planted = vecs.filter(col("vec_id") % 89 === 0 &&
        col("vec_id") + 1 < 80000L)
        .select((col("vec_id") + 1).as("vec_id"))
      val nPlanted = planted.count()
      // identical direction ⟹ same argmax cell ⟹ the higher id of
      // each planted pair is provably dropped
      val nCaught = planted.join(
        out.filter(!col("keep")).select(col("vec_id")),
        Seq("vec_id"), "left_semi").count()
      assert(nPlanted > 800L)
      assert(nCaught === nPlanted, s"collapse recall $nCaught/$nPlanted")
      out.unpersist()
    }
    vecs.unpersist()
  }

  test("bigram LM at 80k docs: NLL separates training templates from " +
      "the rest under the capped heap") {
    CacheScope.withScope { implicit scope =>
      val train = docs.filter(pmod(col("doc_id"), lit(20)) < 5)
      val lm = graft.operators.TextAnalysis.bigramLm(train, "text")
      val scored = graft.operators.TextAnalysis.bigramLogProb(
        docs, "doc_id", "text", lm)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      assert(scored.count() === n)
      val sep = scored.join(docs.select(col("doc_id"),
          (pmod(col("doc_id"), lit(20)) < 5).as("t")), "doc_id")
        .groupBy(col("t")).agg(avg(col("avg_nll")).as("m"))
        .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
      assert(sep(true) < sep(false),
        s"LM does not separate: target ${sep(true)} vs rest ${sep(false)}")
      scored.unpersist()
    }
  }

  test("Naive Bayes at 80k docs: template-derived labels classified " +
      ">0.9 under a label-independent hash split") {
    CacheScope.withScope { implicit scope =>
      val labeled = docs.withColumn("label",
        concat(lit("c"), pmod(pmod(col("doc_id"), lit(20)), lit(4))))
      // the split must be independent of the label: a modulus split
      // correlates with the template id (both ride doc_id) and starves
      // training of most templates — the 5M-run lesson, now pinned
      val isTrain = pmod(xxhash64(lit("nbsplit"), col("doc_id")),
        lit(10)) < 3
      val mdl = graft.operators.TextAnalysis.nbTrain(
        labeled.filter(isTrain), "label", "text")
      val acc = graft.operators.TextAnalysis.nbScore(
          labeled.filter(!isTrain), "doc_id", "text", mdl)
        .join(labeled.select(col("doc_id"), col("label")), "doc_id")
        .agg(avg(when(col("pred") === col("label"), 1.0).otherwise(0.0)))
        .collect().head.getDouble(0)
      assert(acc > 0.9, s"NB accuracy $acc; the ~1% near-dups carry a " +
        "copied template under their own label (noise floor), the " +
        "quote docs have no template — anything near chance means a " +
        "confounded split or a scoring regression")
    }
  }

  test("BPE at 80k docs: merges come from template/tail char mass, " +
      "per-iteration work is vocabulary-sized") {
    CacheScope.withScope { implicit scope =>
      val wf = scope.cache(graft.operators.TextAnalysis
        .bpeWordFreq(docs, "text"))
      val merges = graft.operators.TextAnalysis.bpeTrain(wf, nMerges = 5)
        .collect()
      assert(merges.length === 5)
      // every tail token is "w<digits>" over 300k values and every
      // template token starts "bp" — the first merges must fuse the
      // hottest character pairs, which both families seed with digits
      // or the bp/w prefixes; all five merge counts are corpus-scale
      assert(merges.forall(_.getLong(3) > n),
        s"merge counts must be corpus-scale: ${merges.mkString(";")}")
    }
  }

  test("BPE production paths at 80k docs: bpeTrainLocal reaches 1000 " +
      "merges with zero Spark jobs per merge; the imperative encoder " +
      "segments the full vocabulary") {
    CacheScope.withScope { implicit scope =>
      val wf = scope.cache(graft.operators.TextAnalysis
        .bpeWordFreq(docs, "text"))
      val vocab = wf.count()
      val table = graft.operators.TextAnalysis
        .bpeTrainLocal(wf, nMerges = 1000)
        .orderBy(col("iter")).collect()
      assert(table.length === 1000,
        s"expected 1000 merges, trained ${table.length} — the " +
          "template/tail char mass should support far more")
      // counts are non-increasing-ish only per state, but the FIRST
      // merge must be corpus-scale and the table strictly ordered
      assert(table.head.getLong(3) > n)
      assert(table.map(_.getInt(0)).toSeq === (1 to 1000))
      val merges = table.map(r => (r.getString(1), r.getString(2))).toSeq
      val enc = graft.operators.TextAnalysis
        .bpeEncodeWords(wf.select(col("word")), "word", merges)
        .agg(count(lit(1)), sum(size(col("syms"))))
        .collect().head
      assert(enc.getLong(0) === vocab)
      // 1000 merges over "w<6 digits>"-shaped words compress hard:
      // far fewer symbols than characters, at least one per word
      assert(enc.getLong(1) >= vocab)
      assert(enc.getLong(1) < vocab * 7)
    }
  }

  test("quality reports at 80k docs: one map-only pass covers every doc") {
    val r = docs
      .withColumn("__g", Curation.gopherReport(col("text")))
      .withColumn("__c", Curation.c4LineClean(col("text")))
      .agg(count(lit(1)).as("n"),
        sum(col("__g").getField("word_count")).as("n_words"),
        sum(col("__c").getField("n_lines_dropped")).as("n_dropped"))
      .collect().head
    assert(r.getLong(0) === n)
    assert(r.getLong(1) > n * 10) // every doc tokenized, not nulled out
    assert(r.getLong(2) === n)    // one unpunctuated line per doc dropped
  }

  test("mega-bucket cap: mass-identical docs cannot detonate the band " +
      "join; unique near-dups are unaffected") {
    import spark.implicits._
    // 300 exact copies share EVERY band value → one 300-doc bucket per
    // band → 300²/2 pairs per band uncapped (the 5M stress corpus hit
    // this shape through one unlucky template band: >10 GB spill in a
    // single task). With the cap the bucket is dropped entirely —
    // mass-identical text is exact-dedup's job, which CorpusPipeline
    // runs first.
    CacheScope.withScope { implicit scope =>
      val copies = (1 to 300).map(i =>
        (i.toLong, "the same boilerplate text repeated in every doc " +
          "of this synthetic shard"))
      val unique = Seq(
        (900L, "genuinely distinctive content about catalyst planning"),
        (901L, "genuinely distinctive content about catalyst planning " +
          "extra"))
      val df = (copies ++ unique).toDF("doc_id", "text")
      val capped = Dedup.minhashDupPairs(df, "doc_id", "text",
        threshold = 0.7, maxBucket = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the identical-copy pairs are gone (their buckets exceed the
      // cap on every band) but the unique near-dup pair survives —
      // its band values come from its own content
      assert(capped === Set((900L, 901L)))
      // uncapped opt-out still returns the full quadratic pair set
      val uncapped = Dedup.minhashDupPairs(df, "doc_id", "text",
        threshold = 0.7, maxBucket = Int.MaxValue).count()
      assert(uncapped === 300L * 299 / 2 + 1)
    }
  }
}
