package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Hand-computed cases for the bigram LM trainer and scorer. */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  // training corpus: "a b a b" -> (a,b),(b,a),(a,b); "a c" -> (a,c)
  private def lm = TextAnalysis.bigramLm(
    Seq("a b a b", "a c").toDF("text"), "text")

  test("bigramLm: counts per (prev, cur) pair") {
    val got = lm.as[(String, String, Long)].collect().toSet
    assert(got === Set(("a", "b", 2L), ("b", "a", 1L), ("a", "c", 1L)))
  }

  test("bigramLogProb: smoothed transition math to the micro") {
    // model: c(a,b)=2, c(b,a)=1, c(a,c)=1; ctx(a)=3, ctx(b)=1; V=3
    val docs = Seq((1L, "a b"), (2L, "z q"), (3L, "a"), (4L, "b a b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis
      .bigramLogProb(docs, "doc_id", "text", lm, alpha = 0.5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    // doc 1: ln((2+.5)/(3+.5*3)) = ln(2.5/4.5) -> micros -587787
    val m1 = math.rint(math.log(2.5 / 4.5) * 1e6).toLong
    assert(got(0) === ((1L, 1L, -m1, -m1 / 1e6 / 1)))
    // doc 2: both words unseen: ln(.5/(0+1.5)) = ln(1/3) -> -1098612
    val m2 = math.rint(math.log(0.5 / 1.5) * 1e6).toLong
    assert(got(1) === ((2L, 1L, -m2, -m2 / 1e6 / 1)))
    // doc 3: single token -> no transitions, all-zero not null
    assert(got(2) === ((3L, 0L, 0L, 0.0)))
    // doc 4: (b,a): ln((1+.5)/(1+1.5)); (a,b): ln(2.5/4.5)
    val m4 = math.rint(math.log(1.5 / 2.5) * 1e6).toLong + m1
    assert(got(3) === ((4L, 2L, -m4, -m4 / 1e6 / 2)))
  }

  test("bigramLogProb: counts are mergeable (additive union rebuild)") {
    val half1 = TextAnalysis.bigramLm(Seq("a b a b").toDF("text"), "text")
    val half2 = TextAnalysis.bigramLm(Seq("a c").toDF("text"), "text")
    val merged = half1.unionByName(half2)
      .groupBy("prev", "cur").agg(sum("c").as("c"))
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val a = TextAnalysis.bigramLogProb(docs, "doc_id", "text", lm)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val b = TextAnalysis.bigramLogProb(docs, "doc_id", "text", merged)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(a === b)
  }

  test("nllRankBuckets: exact integer split, id tie-break, labels") {
    // 7 docs in one group: ranks 1..7 -> buckets 0,0,0,1,1,2,2
    val scored = Seq(
      (1L, "en", 5L, 5000000L, 1.0), (2L, "en", 5L, 5000000L, 1.0),
      (3L, "en", 5L, 10000000L, 2.0), (4L, "en", 5L, 15000000L, 3.0),
      (5L, "en", 5L, 20000000L, 4.0), (6L, "en", 5L, 25000000L, 5.0),
      (7L, "en", 5L, 30000000L, 6.0),
      (10L, "de", 1L, 3000000L, 3.0), (11L, "de", 1L, 1000000L, 1.0))
      .toDF("doc_id", "lang", "n_transitions", "nll_micros", "avg_nll")
    val got = TextAnalysis.nllRankBuckets(scored, "doc_id", "lang")
      .select("doc_id", "bucket", "bucket_label")
      .as[(Long, Int, String)].collect()
      .map { case (k, b, l) => k -> ((b, l)) }.toMap
    // ties on avg_nll (docs 1, 2) break by doc_id: 1 before 2
    assert(got(1L) === ((0, "head")) && got(2L) === ((0, "head")))
    assert(got(3L) === ((0, "head")))
    assert(got(4L) === ((1, "middle")) && got(5L) === ((1, "middle")))
    assert(got(6L) === ((2, "tail")) && got(7L) === ((2, "tail")))
    // 2-doc group: rank 1 -> bucket 0, rank 2 -> bucket (1*3)//2 = 1
    assert(got(11L) === ((0, "head")) && got(10L) === ((1, "middle")))
  }

  test("crossEntropyDiff: two-model micros and the selection decision") {
    // in-domain: "x y x y x y" -> c(x,y)=3, c(y,x)=2; ctx(x)=3, ctx(y)=2; V=2
    // general:   "p q r s"     -> three pairs, ctx each 1; V=3
    val inLm = TextAnalysis.bigramLm(Seq("x y x y x y").toDF("text"), "text")
    val genLm = TextAnalysis.bigramLm(Seq("p q r s").toDF("text"), "text")
    val docs = Seq((1L, "x y"), (2L, "p q"), (3L, "z"))
      .toDF("doc_id", "text")
    val got = TextAnalysis
      .crossEntropyDiff(docs, "doc_id", "text", inLm, genLm, alpha = 0.5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Double, Boolean)].collect()
    // doc 1 "x y": in ln(3.5/4.0); gen unseen ln(0.5/1.5) -> in < gen
    val in1 = -math.rint(math.log(3.5 / 4.0) * 1e6).toLong
    val gen1 = -math.rint(math.log(0.5 / 1.5) * 1e6).toLong
    assert(got(0) === ((1L, 1L, in1, gen1, in1 - gen1,
      (in1 - gen1) / 1e6 / 1, true)))
    // doc 2 "p q": in unseen ln(0.5/1.0); gen ln(1.5/2.5) -> in > gen
    val in2 = -math.rint(math.log(0.5 / 1.0) * 1e6).toLong
    val gen2 = -math.rint(math.log(1.5 / 2.5) * 1e6).toLong
    assert(got(1) === ((2L, 1L, in2, gen2, in2 - gen2,
      (in2 - gen2) / 1e6 / 1, false)))
    // doc 3: single token -> no transitions, no evidence, not selected
    assert(got(2) === ((3L, 0L, 0L, 0L, 0L, 0.0, false)))
  }

  test("nllSketchBuckets: monotone in the score, head/tail agree with " +
      "the exact rank split on real data") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val lm = TextAnalysis.bigramLm(
      docs.filter(col("source") === "src0"), "text")
    val scored = TextAnalysis
      .bigramLogProb(docs, "doc_id", "text", lm, alpha = 0.5)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val exact = TextAnalysis.nllRankBuckets(scored, "doc_id", "lang")
      .select(col("doc_id"), col("bucket").as("b_exact"))
    val approx = TextAnalysis.nllSketchBuckets(scored, "doc_id", "lang")
      .select(col("doc_id"), col("lang"), col("avg_nll"),
        col("bucket").as("b_approx"))
    // monotone: within a group, a lower avg_nll never gets a LATER
    // bucket (threshold assignment guarantees it; pin anyway)
    val rows = approx.collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1)
    rows.values.foreach { g =>
      val sorted = g.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 <= b._3,
          s"bucket reversed against score order: $a vs $b")
        case _ =>
      }
    }
    // agreement with the exact split: boundaries may differ by sketch
    // resolution, but the bulk must match
    val joined = exact.join(approx, Seq("doc_id"))
    val n = joined.count()
    val agree = joined.filter(col("b_exact") === col("b_approx")).count()
    assert(agree.toDouble / n > 0.8,
      s"sketch buckets agree on only $agree/$n docs")
    // every group still has a head and a tail
    val spread = approx.groupBy(col("lang"))
      .agg(countDistinct(col("b_approx")).as("nb")).collect()
    assert(spread.forall(_.getLong(1) >= 2))
    // null group keys (missing language ID is routine web data) form
    // their own group and are BUCKETED, not dropped — the inner-join
    // formulation silently lost them (r12 review finding)
    val withNull = scored.withColumn("lang",
      when(col("doc_id") % 5 === 0, lit(null).cast("string"))
        .otherwise(col("lang")))
    val nullBucketed = TextAnalysis.nllSketchBuckets(
      withNull, "doc_id", "lang")
    assert(nullBucketed.count() === withNull.count())
    assert(nullBucketed.filter(col("lang").isNull).count() ===
      withNull.filter(col("lang").isNull).count())
  }

  test("streamed LM state equals the one-shot model over all deltas") {
    val raw = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("graft_blm").toString
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    Seq(0, 1).foreach { i =>
      raw.filter(col("doc_id") % 2 === i)
        .coalesce(1).write.parquet(s"$root/in/batch_$i")
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/in/batch_$i"))
        .filter(_.getPath.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, j) =>
          fs.rename(f.getPath,
            new org.apache.hadoop.fs.Path(s"$root/deltas/b${i}_$j.parquet"))
        }
    }
    val state = graft.streaming.StreamingSummary.maintainBigramLmFromFiles(
      spark, s"$root/deltas", raw.schema, s"$root/ckpt", s"$root/state",
      "text")
    val full = TextAnalysis.bigramLm(raw, "text")
    assert(state.orderBy("prev", "cur").collect().toSeq ===
      full.orderBy("prev", "cur").collect().toSeq)
    // trigram: same contract one order up, same deltas
    val state3 = graft.streaming.StreamingSummary
      .maintainTrigramLmFromFiles(spark, s"$root/deltas", raw.schema,
        s"$root/ckpt3", s"$root/state3", "text")
    val full3 = TextAnalysis.trigramLm(raw, "text")
    assert(state3.orderBy("w1", "w2", "w3").collect().toSeq ===
      full3.orderBy("w1", "w2", "w3").collect().toSeq)
    // hashed 5-gram: same contract at the full CCNet order
    val state5 = graft.streaming.StreamingSummary
      .maintainHashedLmFromFiles(spark, s"$root/deltas", raw.schema,
        s"$root/ckpt5", s"$root/state5", "text")
    val full5 = TextAnalysis.hashedNgramLm(raw, "text")
    assert(state5.orderBy("n", "h").collect().toSeq ===
      full5.orderBy("n", "h").collect().toSeq)
  }

  // hashed 5-gram training corpus: "a b c d e a b c d e" (10 tokens)
  // 5-grams: abcde x2, bcdea, cdeab, deabc, eabcd
  // 4-grams: abcd x2, bcde x2, cdea, deab, eabc
  // 3-grams: abc x2, bcd x2, cde x2, dea, eab
  // unigram total T = 10, vocabulary V = 5
  private def h5lm = TextAnalysis.hashedNgramLm(
    Seq("a b c d e a b c d e").toDF("text"), "text")

  test("hashedNgramLm: per-order counts land under the portable hash") {
    import org.apache.spark.sql.Row
    val lm = h5lm
    // order-1 rows: 5 distinct tokens, 2 occurrences each
    assert(lm.filter(col("n") === 1).count() === 5L)
    assert(lm.filter(col("n") === 1).agg(sum("c")).head.getLong(0)
      === 10L)
    // the hash is the md5-60bit of the space-joined gram — check one
    val h = spark.sql(
      "SELECT CAST(conv(substring(md5('a b c d e'), 1, 15), 16, 10)" +
        " AS BIGINT) AS h").head.getLong(0)
    assert(lm.filter(col("n") === 5 && col("h") === h)
      .head.getAs[Long]("c") === 2L)
  }

  test("hashed5gramLogProb: every backoff branch to the micro") {
    val docs = Seq(
      (1L, "a b c d e"),   // c5=2, ctx c4(abcd)=2 -> S = 2/2 = 1, lp 0
      (2L, "z b c d e"),   // c5=0; c4(bcde)=2, ctx c3(bcd)=2 -> 0.4*1
      (3L, "z z c d e"),   // back to 3-gram: c3(cde)=2, ctx c2(cd)=2
      (4L, "z z z d e"),   // back to 2-gram: c2(de)=2, ctx c1(d)=2
      (5L, "z z z z q"),   // full OOV -> b^4 * (0+a)/(T+aV)
      (6L, "a b c d"))     // < 5 tokens -> (0, 0, 0.0)
      .toDF("doc_id", "text")
    val got = TextAnalysis
      .hashed5gramLogProb(docs, "doc_id", "text", h5lm,
        alpha = 0.5, backoff = 0.4)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    val b = 0.4; val b2 = b * b; val b3 = b2 * b; val b4 = b3 * b
    def micros(s: Double) = math.rint(math.log(s) * 1e6).toLong
    assert(got(0) === ((1L, 1L, 0L, 0.0)))
    assert(got(1) === ((2L, 1L, -micros(b * (2.0 / 2)),
      -micros(b * (2.0 / 2)) / 1e6 / 1)))
    assert(got(2) === ((3L, 1L, -micros(b2 * (2.0 / 2)),
      -micros(b2 * (2.0 / 2)) / 1e6 / 1)))
    assert(got(3) === ((4L, 1L, -micros(b3 * (2.0 / 2)),
      -micros(b3 * (2.0 / 2)) / 1e6 / 1)))
    val oov = micros(b4 * ((0 + 0.5) / (10 + 0.5 * 5)))
    assert(got(4) === ((5L, 1L, -oov, -oov / 1e6 / 1)))
    assert(got(5) === ((6L, 0L, 0L, 0.0)))
  }

  test("hashed5gramLogProb: folded halves ≡ one-shot; in-model text " +
      "scores far below OOV soup") {
    val raw = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val oneShot = TextAnalysis.hashedNgramLm(raw, "text")
    val folded = TextAnalysis.foldHashedLm(
      TextAnalysis.hashedNgramLm(
        raw.filter(col("doc_id") % 2 === 0), "text"),
      TextAnalysis.hashedNgramLm(
        raw.filter(col("doc_id") % 2 === 1), "text"))
    val probe = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.hashed5gramLogProb(probe, "doc_id", "text",
      oneShot).as[(Long, Long, Long, Double)].collect().toSeq
    val bres = TextAnalysis.hashed5gramLogProb(probe, "doc_id", "text",
      folded).as[(Long, Long, Long, Double)].collect().toSeq
    assert(a === bres)
    // fluency separation on real corpus text: a doc drawn from the
    // training data must score lower avg_nll than hash soup
    val inModel = raw.filter(col("text").isNotNull)
      .orderBy("doc_id").limit(1)
      .select(lit(100L).as("doc_id"), col("text"))
    val soup = Seq((200L, (1 to 40)
      .map(i => s"qx${i}zv${i * 7 % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    val scored = TextAnalysis.hashed5gramLogProb(
      inModel.unionByName(soup), "doc_id", "text", oneShot)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(scored(0)._4 < scored(1)._4,
      s"in-model ${scored(0)._4} should beat soup ${scored(1)._4}")
  }
}
