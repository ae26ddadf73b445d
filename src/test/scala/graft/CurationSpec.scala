package graft

import graft.operators.Curation
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- dup clusters -----------------------------------------------------

  test("dupClusters: transitive closure over a chain, stars, singletons") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), // chain -> one cluster
      (10L, 11L), (10L, 12L), (10L, 13L),         // star
      (20L, 21L))
      .toDF("id_a", "id_b")
    val got = Curation.dupClusters(pairs, "id_a", "id_b")
      .orderBy("id").as[(Long, Long)].collect()
    assert(got.toSeq === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("dupClusters: long path needs diameter rounds, still converges") {
    val n = 24
    val pairs = (1 until n).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val got = Curation.dupClusters(pairs, "id_a", "id_b")
    assert(got.select("cluster_id").distinct().as[Long].collect()
      .toSeq === Seq(1L))
    assert(got.count() === n)
  }

  test("dupClusters: maxIters guard throws instead of partial clustering") {
    val pairs = (1 until 10).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Curation.dupClusters(pairs, "id_a", "id_b", maxIters = 2)
    }
  }

  test("clusterAssign: universe rows outside any pair keep themselves") {
    val pairs = Seq((2L, 5L)).toDF("id_a", "id_b")
    val uni = Seq(1L, 2L, 5L, 9L).toDF("doc_id")
    val got = Curation.clusterAssign(uni, "doc_id", pairs, "id_a", "id_b")
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(got === Seq((1L, 1L, true), (2L, 2L, true), (5L, 2L, false),
      (9L, 9L, true)))
  }

  test("clusterRepresentatives: argmax election, ties and singletons") {
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val uni = Seq((1L, 10), (2L, 30), (3L, 20), (4L, 7), (5L, 7), (6L, 1))
      .toDF("doc_id", "quality")
    val got = Curation.clusterRepresentatives(uni, "doc_id", pairs,
        "id_a", "id_b", col("quality"))
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 2L, false),   // cluster {1,2,3}: 2 has the best quality
      (2L, 1L, 2L, true),
      (3L, 1L, 2L, false),
      (4L, 4L, 4L, true),    // tie 4 vs 5 -> smaller id
      (5L, 4L, 4L, false),
      (6L, 6L, 6L, true)))   // singleton represents itself
    // partitioning-independent election
    val re = Curation.clusterRepresentatives(uni.repartition(5), "doc_id",
        pairs.repartition(3), "id_a", "id_b", col("quality"))
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(re === got)
  }

  // ---- hash sampling ----------------------------------------------------

  test("hashSample: deterministic, subset-stable, near the target rate") {
    val df = (0L until 4000L).toDF("id")
    val s1 = Curation.hashSample(df, "id", Curation.rateBound(0.1))
      .as[Long].collect().toSet
    val s2 = Curation.hashSample(df, "id", Curation.rateBound(0.1))
      .as[Long].collect().toSet
    assert(s1 === s2)                       // rerun-stable
    assert(math.abs(s1.size - 400) < 80)    // ~10% of 4000
    // a larger rate strictly contains the smaller one (same key order)
    val s3 = Curation.hashSample(df, "id", Curation.rateBound(0.25))
      .as[Long].collect().toSet
    assert(s1.subsetOf(s3))
  }

  test("rateBound endpoints and resolution") {
    assert(Curation.rateBound(0.0) === "000")
    // rate 1.0 must sort above EVERY md5 hex string ("1000" would only
    // admit hashes starting '0' — the 16×-downsample trap)
    assert(Curation.rateBound(1.0) === "g")
    assert(Curation.rateBound(0.99999) === "g")
    assert("ffffffffffffffffffffffffffffffff" < Curation.rateBound(1.0))
    intercept[IllegalArgumentException](Curation.rateBound(1.5))
  }

  test("rateBound(1.0) keeps every row; strict cut bounds enforced") {
    val df = (0L until 500L).toDF("id")
    assert(Curation.hashSample(df, "id", Curation.rateBound(1.0)).count() === 500L)
    // stratified "keep all of a rare group" actually keeps all of it
    val strat = (0L until 600L).map(i => (i, if (i % 100 == 0) "rare" else "big"))
      .toDF("id", "lang")
    val kept = Curation.stratifiedHashSample(strat, "id", "lang",
      Map("rare" -> 1.0), 0.2)
    assert(kept.filter(col("lang") === "rare").count() === 6L)
    intercept[IllegalArgumentException] {
      Curation.hashSplit(col("id"), Seq("a" -> "100", "b" -> "100"), "z")
    }
  }

  test("hashSplit: exhaustive, deterministic, rate-proportioned") {
    val df = (0L until 4000L).toDF("id")
    val cuts = Seq("val" -> Curation.rateBound(0.05),
      "test" -> Curation.rateBound(0.1))
    val got = df.select(col("id"),
        Curation.hashSplit(col("id"), cuts, "train").as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(got.values.sum === 4000L)
    assert(math.abs(got("val") - 200) < 60)
    assert(math.abs(got("test") - 200) < 60)   // [0.05, 0.1) band
    // split assignment agrees with hashSample membership (same keys)
    val sampled = Curation.hashSample(df, "id", Curation.rateBound(0.1))
      .as[Long].collect().toSet
    val nonTrain = df.select(col("id"),
        Curation.hashSplit(col("id"), cuts, "train").as("s"))
      .filter(col("s") =!= "train").select("id").as[Long].collect().toSet
    assert(nonTrain === sampled)
    intercept[IllegalArgumentException] {
      Curation.hashSplit(col("id"), Seq("a" -> "800", "b" -> "0cd"), "z")
    }
  }

  test("stratifiedHashSample: per-group rates honored") {
    val df = (0L until 3000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("id", "lang")
    val got = Curation.stratifiedHashSample(df, "id", "lang",
        Map("en" -> 0.5), defaultRate = 0.05)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(got("en") - 500) < 90)            // 50% of 1000
    assert(math.abs(got.getOrElse("de", 0L) - 100) < 50) // 5% of 2000
  }

  // ---- per-group cap ----------------------------------------------------

  test("perGroupCap: equals the row_number window form, skew-free path") {
    val df = (1L to 200L).map(i => (s"g${i % 7}", i, (i * 37 % 101).toDouble))
      .toDF("grp", "id", "score")
    val got = Curation.perGroupCap(df, "grp", "id", col("score"), 5)
      .select("grp", "rank", "id")
      .as[(String, Int, Long)].collect().toSet
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5).select("grp", "rank", "id")
      .as[(String, Int, Long)].collect().toSet
    assert(got === want)
    assert(got.size === 35)
  }

  // ---- sequence packing ---------------------------------------------------

  test("packSequences: offsets are the exclusive prefix sum in id order") {
    val df = Seq((1L, 100L), (2L, 2000L), (3L, 50L), (4L, 5000L), (5L, 1L))
      .toDF("id", "n_tok").repartition(3)
    val got = Curation.packSequences(df, "id", "n_tok", budget = 2048L)
      .orderBy("id")
      .select("id", "start_off", "first_seq", "last_seq")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, 0L, 0L),        // [0, 100)
      (2L, 100L, 0L, 1L),      // [100, 2100) straddles seq 0->1
      (3L, 2100L, 1L, 1L),
      (4L, 2150L, 1L, 3L),     // [2150, 7150) spans seqs 1..3
      (5L, 7150L, 3L, 3L)))
  }

  test("packSequences: matches the single-reducer window form at scale shape") {
    val df = (1L to 500L).map(i => (i, i % 97 + 1)).toDF("id", "n_tok")
      .repartition(7)
    val got = Curation.packSequences(df, "id", "n_tok", 256L)
      .select("id", "start_off").as[(Long, Long)].collect().toMap
    val w = Window.orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("start_off",
        coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select("id", "start_off").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("packSequences: identical output across reruns and partitionings") {
    // The cu3 gate hashes every (id, start_off, first_seq, last_seq)
    // tuple — any drift between the two internal passes (range-exchange
    // boundaries re-sampled between the sums pass and the offset pass)
    // corrupts offsets silently. Run the operator repeatedly, from
    // differently-partitioned inputs and from a fresh session, and
    // require byte-identical results each time.
    def run(s: org.apache.spark.sql.SparkSession, parts: Int): Seq[(Long, Long, Long, Long)] = {
      import s.implicits._
      val df = (1L to 800L).map(i => (i, (i * 31) % 113)).toDF("id", "n_tok")
        .repartition(parts)
      Curation.packSequences(df, "id", "n_tok", 512L)
        .select("id", "start_off", "first_seq", "last_seq")
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    }
    val base = run(spark, 1)
    assert(run(spark, 7) === base)
    assert(run(spark, 32) === base)
    assert(run(spark.newSession(), 13) === base)
  }

  test("packSequences: zero-token rows get first_seq == last_seq") {
    val df = Seq((1L, 10L), (2L, 0L), (3L, 5L)).toDF("id", "n_tok")
    val got = Curation.packSequences(df, "id", "n_tok", 4L)
      .orderBy("id").select("id", "first_seq", "last_seq")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L, 2L), (2L, 2L, 2L), (3L, 2L, 3L)))
  }

  test("dupClustersStar: equals dupClusters on star/chain/singleton mixes") {
    val pairs = Seq((2L, 5L), (5L, 9L), (9L, 2L), (11L, 12L), (20L, 3L),
      (3L, 1L), (30L, 31L), (31L, 32L), (32L, 33L)).toDF("a", "b")
    val want = Curation.dupClusters(pairs, "a", "b")
      .as[(Long, Long)].collect().toSet
    val got = Curation.dupClustersStar(pairs, "a", "b")
      .as[(Long, Long)].collect().toSet
    assert(got === want)
  }

  test("dupClustersStar: 300-link chain converges in bounded rounds") {
    // a diameter-300 component: label propagation needs ~300 rounds
    // (dupClusters' default bound throws); the star form must converge
    // inside its 50-round bound and label every node with the chain min
    val pairs = (1L until 300L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Curation.dupClustersStar(pairs, "a", "b")
      .as[(Long, Long)].collect().toSet
    assert(got === (1L to 300L).map(i => (i, 1L)).toSet)
    intercept[IllegalStateException] {
      Curation.dupClusters(pairs, "a", "b", maxIters = 8)
    }
  }

  test("uniformGroupSample: exactly k per group, window-form identical") {
    val df = ((1L to 300L).map(i => (i, "a")) ++
      (301L to 310L).map(i => (i, "b"))).toDF("id", "grp")
    val got = Curation.uniformGroupSample(df, "grp", "id", k = 5)
      .as[(String, Int, Long)].collect().toSet
    assert(got.count(_._1 == "a") === 5)
    assert(got.count(_._1 == "b") === 5)
    // identical to the row_number window form (same draw, same ties)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      .orderBy(Curation.hashDraw(col("id")).asc, col("id").asc)
    val want = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("grp"), col("rank"), col("id"))
      .as[(String, Int, Long)].collect().toSet
    assert(got === want)
    // k larger than the group: the whole group, no padding
    val all = Curation.uniformGroupSample(df, "grp", "id", k = 50)
    assert(all.filter(col("grp") === "b").count() === 10L)
  }

  test("weightedGroupSample: exact k, window-form identical, " +
      "non-positive weights excluded, heavy row selected") {
    val df = ((1L to 200L).map(i => (i, "a", if (i == 7L) 1000000L else 1L))
      ++ (201L to 210L).map(i => (i, "b", i))
      ++ Seq((301L, "c", 0L), (302L, "c", -4L), (303L, "c", 9L)))
      .toDF("id", "grp", "w")
    // null weight never samples (covered via an expression weight)
    val weight = when(col("id") === 303L, col("w"))
      .otherwise(when(col("grp") === "c", lit(null)).otherwise(col("w")))
    val got = Curation.weightedGroupSample(df, "grp", "id", col("w"), k = 5)
      .as[(String, Int, Long)].collect().toSet
    assert(got.count(_._1 == "a") === 5)
    assert(got.count(_._1 == "b") === 5)
    // zero/negative weights have no A-ES key: only 303 survives in c
    assert(got.filter(_._1 == "c").map(_._3) === Set(303L))
    // the single 10^6-weight row is (deterministically) in the sample
    assert(got.exists(t => t._1 == "a" && t._3 == 7L))
    // identical to the row_number window form over the same A-ES key
    val u = (Curation.hashDraw(col("id")).cast("double") + 0.5) /
      4294967296.0
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      .orderBy((log(u) / col("w").cast("double")).desc, col("id").asc)
    val want = df.filter(col("w") > 0)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("grp"), col("rank"), col("id"))
      .as[(String, Int, Long)].collect().toSet
    assert(got === want)
    // null-weight rows are dropped, not errored
    val nulled = Curation.weightedGroupSample(df, "grp", "id", weight, k = 5)
      .filter(col("grp") === "c").as[(String, Int, Long)].collect().toSet
    assert(nulled.map(_._3) === Set(303L))
  }

  // ---- boilerplate line removal -------------------------------------------

  test("removeBoilerplate: hot lines go, short lines and order survive") {
    val docs = Seq(
      (1L, "alpha beta gamma\nSHARED FOOTER LINE HERE\nok"),
      (2L, "delta\nSHARED FOOTER LINE HERE\nok"),
      (3L, "SHARED FOOTER LINE HERE"),
      (4L, "unique line that stays\nanother unique one"),
      (5L, null: String)
    ).toDF("doc_id", "text")
    val got = Curation.removeBoilerplate(docs, "doc_id", "text",
        maxDocs = 2, minChars = 10)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "alpha beta gamma\nok", 1L),   // footer in 3 docs > 2: gone
      (2L, "delta\nok", 1L),              // "ok" < minChars: never hot
      (3L, "", 1L),                       // all-boilerplate doc survives
      (4L, "unique line that stays\nanother unique one", 0L),
      (5L, "", 0L)))                      // null text: 0 lines, not -1
  }

  test("removeBoilerplate: counting is per-DISTINCT-doc, not per-line") {
    // one doc repeating a line 10 times must not make it corpus-hot
    val docs = Seq(
      (1L, Seq.fill(10)("repeated inside one doc").mkString("\n")),
      (2L, "something else entirely here")
    ).toDF("doc_id", "text")
    val got = Curation.removeBoilerplate(docs, "doc_id", "text",
        maxDocs = 1, minChars = 10)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got.head._3 === 0L)
    assert(got.head._2.linesIterator.size === 10)
  }

  // ---- linear model scoring -----------------------------------------------

  test("linearScore: exact left-to-right logit, threshold semantics") {
    val df = Seq(
      (1L, Seq(1.0, 0.0, 2.0)),
      (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(0.5, 0.5, 0.5))).toDF("id", "f")
    val got = df.select(col("id"),
        Curation.linearScore(col("f"), Seq(2.0, -1.0, 0.25), 0.5)
          .as("logit"))
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 0.5 + 1.0 * 2.0 + 0.0 * -1.0 + 2.0 * 0.25),
      (2L, 0.5 + 0.0 * 2.0 + 1.0 * -1.0 + 0.0 * 0.25),
      (3L, 0.5 + 0.5 * 2.0 + 0.5 * -1.0 + 0.5 * 0.25)))
    intercept[IllegalArgumentException] {
      Curation.linearScore(col("f"), Seq.empty, 0.0)
    }
  }

  // ---- domain mixture -----------------------------------------------------

  test("mixDomains: water-filling keeps the binding group whole") {
    val df = ((1L to 200L).map(i => (i, "a", 10L)) ++
      (201L to 250L).map(i => (i, "b", 10L)) ++
      (251L to 260L).map(i => (i, "c", 10L)))
      .toDF("id", "src", "mass")
    val kept = Curation.mixDomains(df, "id", "src", col("mass"),
      Map("a" -> 1.0, "b" -> 1.0))
    val bySrc = kept.groupBy("src").count()
      .as[(String, Long)].collect().toMap
    // T = min(2000/1, 500/1) = 500: b (binding) keeps all 50 rows,
    // a samples at 500/2000 = 0.25, c (no target) is dropped
    assert(bySrc.getOrElse("b", 0L) === 50L)
    assert(!bySrc.contains("c"))
    assert(math.abs(bySrc("a") - 50L) < 25L)
    // deterministic: rerun keeps the same rows
    val k2 = Curation.mixDomains(df, "id", "src", col("mass"),
      Map("a" -> 1.0, "b" -> 1.0))
    assert(kept.select("id").as[Long].collect().toSet ===
      k2.select("id").as[Long].collect().toSet)
    // a requested group with no corpus rows must fail loudly — silently
    // excluding it would return a mixture missing a component
    intercept[IllegalArgumentException] {
      Curation.mixDomains(df, "id", "src", col("mass"),
        Map("a" -> 1.0, "nosuch" -> 1.0))
    }
  }

  // ---- PII redaction ------------------------------------------------------

  test("redactPii: emails and phones scrubbed, counts match") {
    val df = Seq(
      (1L, "reach me at jane.doe+spam@corp-mail.example.org thanks"),
      (2L, "call +1-555-012-3456 or (022) 4567 8901 today"),
      (3L, "no pii here at all"),
      (4L, "a@b.io then 555-123-4567 mixed")).toDF("id", "text")
    val got = df.select(col("id"),
        Curation.countEmails(col("text")).as("ne"),
        Curation.countPhones(col("text")).as("np"),
        Curation.redactPii(col("text")).as("clean"))
      .orderBy("id").collect()
    assert(got(0).getAs[Int]("ne") === 1 && got(0).getAs[Int]("np") === 0)
    assert(got(0).getAs[String]("clean") === "reach me at <EMAIL> thanks")
    assert(got(1).getAs[Int]("np") >= 1)
    assert(!got(1).getAs[String]("clean").contains("555"))
    assert(got(2).getAs[String]("clean") === "no pii here at all")
    assert(got(3).getAs[Int]("ne") === 1 && got(3).getAs[Int]("np") === 1)
    assert(got(3).getAs[String]("clean") === "<EMAIL> then <PHONE> mixed")
  }

  // ---- chunking -----------------------------------------------------------

  test("chunkTokens: coverage, overlap, and tail-suffix suppression") {
    val words = (1 to 100).map(i => s"w$i")
    val df = Seq(words.mkString(" ")).toDF("text")
    val chunks = df.select(Curation.chunkTokens(col("text"), 32, 8))
      .as[Seq[String]].collect().head
    // starts 0,24,48,72 — start 96 would add only already-seen tokens
    assert(chunks.size === 4)
    assert(chunks.head === words.take(32).mkString(" "))
    assert(chunks(1).startsWith("w25 "))            // 8-token overlap
    // every token appears in some chunk
    val covered = chunks.flatMap(_.split(" ")).toSet
    assert(covered === words.toSet)
    // short doc -> single chunk, verbatim
    val one = Seq("a b c").toDF("text")
      .select(Curation.chunkTokens(col("text"), 32, 8))
      .as[Seq[String]].collect().head
    assert(one === Seq("a b c"))
    intercept[IllegalArgumentException] {
      Curation.chunkTokens(col("text"), 8, 8)
    }
  }

  test("chunkSentences: packs whole sentences to the budget, oversize " +
      "sentences become their own chunk, boundaries never split") {
    val text = "one two three. four five. " +
      "six seven eight nine ten eleven twelve! thirteen?"
    val chunks = Seq(text).toDF("text")
      .select(Curation.chunkSentences(col("text"), maxTokens = 5))
      .as[Seq[String]].collect().head
    // s1(3 tok)+s2(2 tok)=5 fits; s3 (7 tok) oversize alone; s4 (1)
    assert(chunks === Seq(
      "one two three. four five.",
      "six seven eight nine ten eleven twelve!",
      "thirteen?"))
    // no terminal punctuation at all -> one sentence -> one chunk
    val flat = Seq("a b c d e f g").toDF("text")
      .select(Curation.chunkSentences(col("text"), maxTokens = 3))
      .as[Seq[String]].collect().head
    assert(flat === Seq("a b c d e f g"))
    // empty / null text -> no chunks
    val empty = strDf(Seq("", null), "text")
      .select(Curation.chunkSentences(col("text"), maxTokens = 3))
      .collect().map(r => Option(r.getSeq[String](0)))
    assert(empty(0) === Some(Seq()))
    assert(empty(1) === None)
    intercept[IllegalArgumentException] {
      Curation.chunkSentences(col("text"), 0)
    }
  }

  // ---- repetition ---------------------------------------------------------

  test("dupNgramFrac: doubled text scores ~0.5, unique text scores 0") {
    val df = Seq(
      (1L, "a b c d e f g h"),                       // all 2-grams unique
      (2L, "a b c d a b c d"),                       // doubled
      (3L, "x"),                                     // too short -> 0.0
      (4L, "w w w w w w")).toDF("id", "text")        // one gram repeated
    val got = df.select(col("id"),
        Curation.dupNgramFrac(col("text"), 2).as("f"))
      .orderBy("id").as[(Long, Double)].collect().toMap
    assert(got(1L) === 0.0)
    assert(got(2L) > 0.35 && got(2L) < 0.6)
    assert(got(3L) === 0.0)
    assert(got(4L) === 0.8)                          // 5 grams, 1 distinct
  }

  // ---- decontamination -----------------------------------------------------

  test("wordNgrams: boundary sizes") {
    val df = Seq("one two three four", "one two", "  ").toDF("t")
    val got = df.select(size(Curation.wordNgrams(col("t"), 3)).as("n"))
      .as[Int].collect().toSeq
    assert(got === Seq(2, 0, 0))
  }

  test("decontaminate: verbatim benchmark quotes are flagged, clean docs are not") {
    val bench = Seq(
      "what is the capital of france paris is the answer here",
      "solve for x when two x plus three equals eleven")
      .toDF("text")
    val corpus = Seq(
      (1L, "totally unrelated words about cooking pasta with garlic and oil"),
      // quotes benchmark doc 0 verbatim inside other text
      (2L, "blog post what is the capital of france paris is the answer here end"),
      // shares fewer than minMatches grams (only a 5-word overlap -> 1 gram)
      (3L, "what is the capital of germany berlin obviously"))
      .toDF("doc_id", "text")
    val got = Curation.decontaminate(corpus, "doc_id", "text",
        bench, "text", n = 5, minMatches = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got(0) === ((1L, 0L, false)))
    assert(got(1)._2 >= 3 && got(1)._3)
    assert(!got(2)._3)
  }

  test("semanticDecontaminate: scaled leak flagged once (multi-probe " +
      "dedup), orthogonal vector clean, every corpus row returned") {
    import org.apache.spark.sql.functions._
    val corpus = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0)),
      (2L, Array(0.0, 1.0, 0.0, 0.0)),
      (3L, Array(0.0, 0.0, 1.0, 0.0)))
      .toDF("id", "vec")
    // bench: a scaled copy of corpus vec 1 (cosine 1.0) + an unrelated
    // direction far from every corpus vector
    val bench = Seq(
      (100L, Array(2.5, 0.0, 0.0, 0.0)),
      (101L, Array(0.0, 0.0, 0.0, 1.0)))
      .toDF("bid", "vec")
    val got = Curation.semanticDecontaminate(corpus, "id", "vec",
        bench, "bid", "vec", threshold = 0.99, planes = 6, probes = 4)
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    assert(got.length === 3, "every corpus row must come back")
    // vec 1 matches bench 100 exactly ONCE despite 4 probe buckets
    assert(got(0) === ((1L, 1L, true)), s"got ${got.toSeq}")
    assert(got(1) === ((2L, 0L, false)))
    assert(got(2) === ((3L, 0L, false)))
    // max_cosine is null for clean rows, ~1.0 for the leak
    val mc = Curation.semanticDecontaminate(corpus, "id", "vec",
        bench, "bid", "vec", threshold = 0.99, planes = 6, probes = 4)
      .orderBy(col("id")).collect()
    assert(math.abs(mc(0).getDouble(2) - 1.0) < 1e-9)
    assert(mc(1).isNullAt(2) && mc(2).isNullAt(2))
  }

  test("htmlToText: strips blocks/tags, decodes entities once, " +
      "normalizes whitespace, nulls clean to empty") {
    import spark.implicits._
    val got = Seq(
      "<html><head><style a=b>x{}</style><SCRIPT>if (1<2) alert('&')" +
        "</SCRIPT></head><body><p>Hello  <b>world</b></p>" +
        "<p>line two</p></body></html>",
      "pre &amp;lt; mid &lt;b&gt; &quot;q&quot; &#39;s&#39; &nbsp;end",
      "a<br>b<BR/>c<!-- zap\nmultiline -->d",
      null.asInstanceOf[String])
      .toDF("h").select(Curation.htmlToText(col("h")).as("t"))
      .collect().map(_.getString(0))
    assert(got(0) === "Hello world\nline two")
    // &amp;lt; decodes ONCE to &lt; (amp is decoded last), not to <
    assert(got(1) === "pre &lt; mid <b> \"q\" 's' end")
    assert(got(2) === "a\nb\nc d")
    assert(got(3) === "")
  }

  test("blocklistReport: domain leg via the real host chain, lexicon " +
      "fraction leg, OR verdict") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://www.Bad.example.com:443/p/1", "fine text here"),
      (2L, "https://ok.org/x", "spam spam spam one"),
      (3L, "https://ok.org/y", "one spam in eight ordinary words here"),
      (4L, "https://ok.org/z", ""))
      .toDF("id", "url", "text")
    val r = Curation.blocklistReport(docs, "url", "text",
        blockedDomains = Seq("example.com"), lexicon = Seq("spam"),
        maxBadFrac = 0.5)
      .orderBy("id").collect()
    // host chain lowercases + strips www/port before the PSL fold
    assert(r(0).getAs[String]("domain") === "example.com" &&
      r(0).getAs[Boolean]("blocked"))
    assert(r(1).getAs[Double]("bad_frac") === 0.75 &&
      r(1).getAs[Boolean]("blocked"))
    assert(r(2).getAs[Int]("bad_hits") === 1 &&
      !r(2).getAs[Boolean]("blocked"))
    // empty text: zero words, zero frac, clean
    assert(r(3).getAs[Int]("word_count") === 0 &&
      r(3).getAs[Double]("bad_frac") === 0.0 &&
      !r(3).getAs[Boolean]("blocked"))
  }

  test("datasetCard: exact dup counting, dominant language, and the " +
      "ALWAYS-one-row contract (incl. an empty corpus)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "THE CAT   SAT on the mat", "en"),   // exact dup after norm
      (3L, "a completely different document", "en"),
      (4L, "noch ein deutsches dokument", "de"))
      .toDF("doc_id", "text", "lang")
    val card = Curation.datasetCard(docs, "text", "lang").collect()
    assert(card.length === 1)
    val r = card.head
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Long]("n_exact_dups") === 1L)
    assert(r.getAs[Double]("dup_rate") === 0.25)
    assert(r.getAs[String]("top_lang") === "en")
    assert(r.getAs[Double]("top_lang_frac") === 0.75)
    assert(r.getAs[Long]("p50_chars") >= 22L) // shortest doc is 22 chars
    // empty corpus: STILL one row — zero counts, null rates/quantiles
    val empty = Curation.datasetCard(
      docs.filter(col("doc_id") < 0), "text", "lang").collect()
    assert(empty.length === 1)
    assert(empty.head.getAs[Long]("n_docs") === 0L)
    assert(empty.head.isNullAt(empty.head.fieldIndex("dup_rate")))
    assert(empty.head.isNullAt(empty.head.fieldIndex("p50_chars")))
    assert(empty.head.isNullAt(empty.head.fieldIndex("top_lang")))
  }

  test("shuffleShards/writeShards: deterministic membership + order, " +
      "one file per shard, rows stream back in draw order") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val nShards = 6
    val sharded = Curation.shuffleShards(docs, "doc_id", nShards)
    // membership: every doc in exactly one shard, within range
    assert(sharded.count() === docs.count())
    assert(sharded.filter(col("shard") < 0 ||
      col("shard") >= nShards).count() === 0L)
    // rough balance (md5 uniformity): no shard more than 2x the mean
    val sizes = sharded.groupBy("shard").count()
      .collect().map(_.getLong(1))
    assert(sizes.length === nShards)
    assert(sizes.max <= 2 * (sizes.sum / nShards),
      s"skewed shards: ${sizes.mkString(",")}")
    // determinism: a re-derivation on a different partitioning is
    // bit-identical
    val again = Curation.shuffleShards(
      docs.repartition(7), "doc_id", nShards)
      .select("doc_id", "shard", "__ord")
    assert(again.orderBy("doc_id").collect().toSeq ===
      sharded.select("doc_id", "shard", "__ord")
        .orderBy("doc_id").collect().toSeq)
    // writer: one file per shard dir, rows stream back in draw order
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Curation.writeShards(sharded, "doc_id", dir)
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    (0 until nShards).foreach { k =>
      val files = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/shard=$k"))
        .filter(_.getPath.getName.endsWith(".parquet"))
      assert(files.length === 1,
        s"shard $k has ${files.length} files — the one-task-per-shard" +
          " write broke")
      val back = spark.read.parquet(s"$dir/shard=$k")
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      val expected = sharded.filter(col("shard") === k)
        .orderBy(col("__ord"), col("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(back === expected,
        s"shard $k rows not in draw order")
    }
  }
}
