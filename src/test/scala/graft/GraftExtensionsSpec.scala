package graft

import org.apache.spark.sql.functions._

/** The session fixture builds with
  * `spark.sql.extensions=graft.sql.GraftExtensions`, so these tests prove
  * the library-level injection path end-to-end: no per-session
  * registration calls anywhere in this spec.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("injected SQL functions work with zero registration calls") {
    val cos = spark.sql(
      "SELECT cosine_sim(array(3.0F, 4.0F), array(3.0F, 4.0F)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    val sig = spark.sql(
      "SELECT minhash_sig('the quick brown fox', 3, 16) AS mh")
      .collect().head.getSeq[Long](0)
    assert(sig.size === 16)

    val sh = spark.sql("SELECT simhash_sig('hello world') AS sh")
      .collect().head.getLong(0)
    // deterministic: same input → same signature
    val sh2 = spark.sql("SELECT simhash_sig('hello world') AS sh")
      .collect().head.getLong(0)
    assert(sh === sh2)

    val ts = spark.sql(
      "SELECT text_stats('the quick brown fox and le chat') AS s")
      .select(col("s.n_tok"), col("s.n_stop"), col("s.scores"))
      .collect().head
    assert(ts.getInt(0) === 7)
    assert(ts.getInt(1) === 2) // 'the', 'and'
    assert(ts.getSeq[Int](2).head === 2) // en markers: the, and

    val hb = spark.sql(
      "SELECT hyperplane_buckets(array(1.0D, -2.0D, 0.5D, 3.0D), " +
        "4, 6, 42L, 2) AS b").collect().head.getSeq[Long](0)
    assert(hb.size === 3 && hb.distinct.size === 3) // base + 2 distinct flips

    val ps = spark.sql("SELECT portable_simhash_sig('hello world') AS p")
      .collect().head.getLong(0)
    assert(ps >= 0L) // 63-bit: the sign bit is never set

    val tk = spark.sql(
      "SELECT g, topk_by(o, i, 2) AS tk FROM VALUES " +
        "(1, 0.5D, 10L), (1, 0.9D, 11L), (1, 0.9D, 7L), (1, 0.1D, 2L) " +
        "AS t(g, o, i) GROUP BY g")
      .select(expr("tk.id")).collect().head.getSeq[Long](0)
    assert(tk === Seq(7L, 11L)) // 0.9 twice: lower id wins rank 1

    // distinct <= k, so the MG sketch is exact and deterministic
    val fs = spark.sql(
      "SELECT freq_sketch(t, 4) AS fs FROM VALUES " +
        "('a'), ('b'), ('a'), ('a'), ('c'), ('b') AS v(t)")
      .select(expr("fs.item"), expr("fs.est")).collect().head
    assert(fs.getSeq[String](0) === Seq("a", "b", "c"))
    assert(fs.getSeq[Long](1) === Seq(3L, 2L, 1L))
    intercept[Exception] {
      spark.sql("SELECT freq_sketch(t, 1 + 1) FROM VALUES ('a') v(t)")
        .collect()
    }
  }

  test("curation SQL functions: bridged Column compositions") {
    val clean = spark.sql(
      "SELECT redact_pii('mail a@b.io or +1-555-012-3456') AS c")
      .collect().head.getString(0)
    assert(clean === "mail <EMAIL> or <PHONE>")

    val key = spark.sql("SELECT sample_key(42L) AS k")
      .collect().head.getString(0)
    assert(key === spark.sql("SELECT md5('42') AS k")
      .collect().head.getString(0))

    val frac = spark.sql(
      "SELECT dup_ngram_frac('a b a b a b', 2) AS f")
      .collect().head.getDouble(0)
    assert(frac === 0.6)  // 5 grams, 2 distinct

    val grams = spark.sql("SELECT word_ngrams('x y z w', 3) AS g")
      .collect().head.getSeq[String](0)
    assert(grams === Seq("x y z", "y z w"))

    val chunks = spark.sql(
      "SELECT chunk_tokens('a b c d e f', 4, 1) AS ch")
      .collect().head.getSeq[String](0)
    assert(chunks === Seq("a b c d", "d e f"))

    intercept[Exception] {
      spark.sql("SELECT dup_ngram_frac('a b', 1 + 1)").collect()
    }

    val draw = spark.sql("SELECT hash_draw(42L) AS d")
      .collect().head.getLong(0)
    assert(draw >= 0L && draw < (1L << 32))

    val logit = spark.sql(
      "SELECT linear_score(array(1.0D, 2.0D), array(0.5D, -1.0D), 0.25D)" +
        " AS s").collect().head.getDouble(0)
    assert(logit === 0.25 + 1.0 * 0.5 + 2.0 * -1.0)
    intercept[Exception] {
      spark.sql("SELECT linear_score(array(1.0D), array(rand()), 0.0D)")
        .collect()
    }

    // quality-rule functions: struct report, boolean decision, line clean
    val gr = spark.sql(
      "SELECT gopher_report('p q r p q r').word_count AS wc, " +
        "gopher_report('p q r p q r').top_2gram_char_frac AS t2")
      .collect().head
    assert(gr.getLong(0) === 6L)
    assert(gr.getDouble(1) === 0.545455) // "p q"=2, len 3, denom 11
    assert(spark.sql("SELECT gopher_pass('a b c') AS p")
      .collect().head.getBoolean(0) === false) // fails word count
    val c4 = spark.sql(
      "SELECT c4_line_clean('keep this line here.\nno punct').n_lines_kept" +
        " AS k").collect().head.getLong(0)
    assert(c4 === 1L)
    val c4b = spark.sql(
      "SELECT c4_line_clean('one two.\nthree four.', 2, 2).is_kept AS k")
      .collect().head.getBoolean(0)
    assert(c4b === true)
    val ht = spark.sql("SELECT html_to_text(" +
      "'<p>Hi <b>there</b></p><script>x<1</script>&amp; done') AS t")
      .collect().head.getString(0)
    assert(ht === "Hi there\n& done")
  }

  test("log_bucket / log_bucket_hi: SQL-built sketches match the " +
      "Scala bucket math exactly") {
    val rows = spark.sql(
      """SELECT id AS v, log_bucket(id, 7) AS b,
        |  log_bucket_hi(log_bucket(id, 7), 7) AS hi
        |FROM range(0, 5000, 37)""".stripMargin).collect()
    rows.foreach { r =>
      val (v, b, hi) = (r.getLong(0), r.getLong(1), r.getLong(2))
      if (v < 256L) assert(b === v && hi === v)
      assert(hi >= v && hi - v <= (v >> 7))
    }
    // identical to the Column-API expression tree on the same input
    import graft.ops.QuantileSketch
    import org.apache.spark.sql.functions.col
    val api = spark.range(0, 5000, 37)
      .select(QuantileSketch.bucketOf(col("id"), 7)).collect().map(_.getLong(0))
    assert(rows.map(_.getLong(1)).toSeq === api.toSeq)
    intercept[Exception] {
      spark.sql("SELECT log_bucket(5, 1 + 6)").collect()
    }
  }

  test("cm_bucket: SQL-built CM sketches match the Scala bucket math") {
    import spark.implicits._
    val sql = spark.sql(
      """SELECT CAST(id AS STRING) AS item,
        |  cm_bucket(CAST(id AS STRING), 0, 512) AS b0,
        |  cm_bucket(CAST(id AS STRING), 3, 512) AS b3
        |FROM range(0, 200)""".stripMargin).collect()
    sql.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) < 512L)
      assert(r.getLong(2) >= 0L && r.getLong(2) < 512L)
    }
    import org.apache.spark.sql.functions.col
    val api = spark.range(0, 200)
      .select(graft.ops.CountMin.bucket(col("id").cast("string"), 0, 512))
      .collect().map(_.getLong(0))
    assert(sql.map(_.getLong(1)).toSeq === api.toSeq)
    intercept[Exception] {
      spark.sql("SELECT cm_bucket('x', 0, 256 + 256)").collect()
    }
  }

  test("vector_topk table function queries a persisted store from SQL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vsql").toString
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    graft.pipelines.VectorStore.create(spark, dir, emb, "vec_id",
      "embedding", nCells = 4, m = 4, ksub = 8, ivfIters = 2, pqIters = 2)
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").as[Seq[Double]].head()
    val vecSql = qv.map(v => s"${v}D").mkString("array(", ", ", ")")
    val got = spark.sql(
      s"SELECT rank, vec_id, cosine FROM vector_topk('$dir', $vecSql, 3, 4)")
      .collect().toSeq
    // probing every cell makes the SQL result the exact top-3; the
    // query vector itself must come back at rank 1 with cosine 1
    assert(got.size === 3)
    assert(got.head.getInt(0) === 1 && got.head.getLong(1) === 0L &&
      math.abs(got.head.getDouble(2) - 1.0) < 1e-12)
    // equivalent Scala-API call returns the identical relation
    val want = graft.pipelines.VectorStore.topK(spark, dir,
        Seq((0L, qv)).toDF("qid", "qv"), "qid", "qv", k = 3, nprobe = 4)
      .select("rank", "vec_id", "cosine").collect().toSeq
    assert(got === want)
    // non-literal config args are rejected with the documented message
    intercept[Exception] {
      spark.sql(s"SELECT * FROM vector_topk('$dir', $vecSql, 3, 1 + 1)")
        .collect()
    }
  }

  test("graph_pagerank table function matches the Scala API bit for bit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prsql").toString
    Seq(("a", "b", 1L), ("a", "c", 2L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "weight").write.mode("overwrite").parquet(dir)
    val got = spark.sql(
      s"SELECT node, rank_fp FROM graph_pagerank('$dir', 5, 0.85D) " +
        "ORDER BY node").collect().toSeq
    val want = graft.operators.WebGraph.pageRank(
        spark.read.parquet(dir), iters = 5, damping = 0.85)
      .select("node", "rank_fp").orderBy("node").collect().toSeq
    assert(got === want)
    // default damping is 0.85 — the two-arg form is the same relation
    val dflt = spark.sql(
      s"SELECT node, rank_fp FROM graph_pagerank('$dir', 5) " +
        "ORDER BY node").collect().toSeq
    assert(dflt === want)
    // non-literal args are rejected with the documented message
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graph_pagerank('$dir', 2 + 3)").collect()
    }
  }

  test("graph_hits table function matches the Scala API bit for bit") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hitssql").toString
    Seq(("a", "b", 1L), ("a", "c", 2L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "weight").write.mode("overwrite").parquet(dir)
    val got = spark.sql(
      s"SELECT node, auth_fp, hub_fp FROM graph_hits('$dir', 4) " +
        "ORDER BY node").collect().toSeq
    val want = graft.operators.WebGraph.hits(
        spark.read.parquet(dir), iters = 4)
      .select("node", "auth_fp", "hub_fp").orderBy("node").collect().toSeq
    assert(got === want)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graph_hits('$dir', 2 + 2)").collect()
    }
  }

  test("wordpiece_tokens table function matches the Scala composition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wpsql").toString
    Seq((1L, "abab abc abab"), (2L, "cc abc"), (3L, ""))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val got = spark.sql("SELECT doc_id, n_tok, n_unk FROM " +
        s"wordpiece_tokens('$dir', 'doc_id', 'text', 50, 4) " +
        "ORDER BY doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    val docs = spark.read.parquet(dir)
    val wf = graft.operators.TextAnalysis.bpeWordFreq(docs, "text")
    val pieces = CacheScope.withScope { implicit s =>
      graft.operators.WordPiece.vocab(wf, 50, 4)
        .select(col("piece")).collect().map(_.getString(0)).toIndexedSeq
    }
    val (_, perDoc) = graft.operators.WordPiece.encodeCorpus(
      docs, "doc_id", "text", pieces)
    val want = perDoc.select("doc_id", "n_tok", "n_unk")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got === want)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM wordpiece_tokens('$dir', 'doc_id', " +
        "'text', 50, 2 + 2)").collect()
    }
  }

  test("byte_bpe_tokens table function matches the Scala composition " +
      "and never emits [UNK] on multibyte input") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bbsql").toString
    Seq((1L, "abab abc 世界"), (2L, "Cc abc café"), (3L, ""))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val got = spark.sql("SELECT doc_id, n_tok FROM " +
        s"byte_bpe_tokens('$dir', 'doc_id', 'text', 4) " +
        "ORDER BY doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    val docs = spark.read.parquet(dir)
    val wf = graft.operators.ByteBpe.byteWordFreq(docs, "text")
    val merges = graft.operators.ByteBpe.train(wf, 4)
      .orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val (_, perDoc) = CacheScope.withScope { implicit s =>
      val r = graft.operators.ByteBpe.encodeCorpus(
        docs, "doc_id", "text", merges)
      (r._1.count(), r._2.select("doc_id", "n_tok").orderBy("doc_id")
        .collect().map(x => (x.getLong(0), x.getInt(1))).toSeq)
    }
    assert(got === perDoc)
    assert(got.find(_._1 === 1L).exists(_._2 > 0),
      "multibyte doc must tokenize (no [UNK] path exists)")
    intercept[Exception] {
      spark.sql(s"SELECT * FROM byte_bpe_tokens('$dir', 'doc_id', " +
        "'text', 2 + 2)").collect()
    }
  }

  test("tokenizer_encode table function encodes through a stored " +
      "model and matches the in-memory composition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tesql").toString
    val store = java.nio.file.Files.createTempDirectory("tesqls").toString
    Seq((1L, "abab abc 世界"), (2L, "Cc abc café"), (3L, ""))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val model = graft.operators.ByteBpe.train(
      graft.operators.ByteBpe.byteWordFreq(docs, "text"), 4)
    graft.pipelines.TokenizerStore.save(spark, store, "bpe-byte", model)
    val got = spark.sql("SELECT doc_id, n_tok, token_ids FROM " +
        s"tokenizer_encode('$store', '$dir', 'doc_id', 'text') " +
        "ORDER BY doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSeq
    val merges = model.orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val want = CacheScope.withScope { implicit s =>
      graft.operators.ByteBpe.encodeCorpus(docs, "doc_id", "text",
          merges)._2
        .select("doc_id", "n_tok", "token_ids").orderBy("doc_id")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSeq
    }
    assert(got === want)
    // a non-store dir fails loudly at resolution, not with a silent
    // empty result; wrong arity is a loud contract error
    intercept[Exception] {
      spark.sql(s"SELECT * FROM tokenizer_encode('$dir', '$dir', " +
        "'doc_id', 'text')").collect()
    }
    intercept[Exception] {
      spark.sql(s"SELECT * FROM tokenizer_encode('$store', '$dir', " +
        "'doc_id')").collect()
    }
  }

  test("unigram_tokens table function matches the Scala composition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("unisql").toString
    Seq((1L, "abab abc abab"), (2L, "cc abc"), (3L, ""))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val got = spark.sql("SELECT doc_id, n_tok, score_mu FROM " +
        s"unigram_tokens('$dir', 'doc_id', 'text', 50, 4) " +
        "ORDER BY doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val docs = spark.read.parquet(dir)
    val vocab = graft.operators.Unigram.seedVocab(
        graft.operators.TextAnalysis.bpeWordFreq(docs, "text"), 50, 4)
      .select("piece", "cost_mu").collect()
      .map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
    val want = CacheScope.withScope { implicit s =>
      graft.operators.Unigram.encodeCorpus(docs, "doc_id", "text",
          vocab)._2
        .select(col("doc_id"), col("n_tok"), col("score_mu"))
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    }
    assert(got === want)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM unigram_tokens('$dir', 'doc_id', " +
        "'text', 50, 2 + 2)").collect()
    }
  }

  test("embedding SQL functions: random_project / int8 round trip; " +
      "vector_topk reads an int8 store transparently") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    emb.createOrReplaceTempView("gx_emb")
    // SQL projection ≡ the Scala API, element for element
    val gotP = spark.sql(
      "SELECT vec_id, random_project(embedding, 64, 16, 'sq') AS p " +
        "FROM gx_emb ORDER BY vec_id LIMIT 3")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    val wantP = emb.select(col("vec_id"),
        graft.operators.Similarity.randomProject(
          col("embedding"), 64, 16, "sq").as("p"))
      .orderBy("vec_id").limit(3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(gotP.toSeq === wantP.toSeq)
    // int8 quantize/dequantize compose from SQL; codes are tinyint
    val rt = spark.sql(
      "SELECT int8_quantize(embedding).scale AS s, " +
        "int8_dequantize(int8_quantize(embedding)) AS dv " +
        "FROM gx_emb ORDER BY vec_id LIMIT 1").collect().head
    assert(rt.getDouble(0) > 0.0)
    assert(rt.getSeq[Double](1).size === 64)
    // nfc_normalize rejects non-string args at ANALYSIS time (a
    // ClassCastException in the executor otherwise) — but a bare NULL
    // (NullType) still evaluates to NULL like the built-in string fns
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT nfc_normalize(vec_id) FROM gx_emb").collect()
    }
    assert(spark.sql("SELECT nfc_normalize(NULL) AS n")
      .collect().head.isNullAt(0))
    // (Spark's chr() is mod-256 ASCII — build the decomposed literal
    // from the code point instead)
    val dec = "cafe" + new String(Character.toChars(0x301))
    assert(spark.sql(s"SELECT nfc_normalize('$dec') AS n")
      .collect().head.getString(0) === "caf" +
        new String(Character.toChars(0xe9)))
    // the vector_topk TVF reads an int8-format store with no syntax
    // change — format transparency at the SQL surface
    val dir = java.nio.file.Files.createTempDirectory("vsql_i8").toString
    graft.pipelines.VectorStore.create(spark, dir, emb, "vec_id",
      "embedding", nCells = 4, m = 4, ksub = 8, ivfIters = 2,
      pqIters = 2, int8 = true)
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").as[Seq[Double]].head()
    val vecSql = qv.map(v => s"${v}D").mkString("array(", ", ", ")")
    val got = spark.sql(
      s"SELECT rank, vec_id, cosine FROM vector_topk('$dir', $vecSql, 3, 4)")
      .collect().toSeq
    assert(got.size === 3)
    // the query vector is IN the store (quantized); its dequantized
    // self-cosine is within quantization error of 1 and still rank 1
    assert(got.head.getInt(0) === 1 && got.head.getLong(1) === 0L &&
      got.head.getDouble(2) > 0.999)
  }

  test("text-retrieval table functions: bm25_topk / containment_pairs / " +
      "tfidf_by_group from SQL text") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tretr").toString
    Seq(
      (1L, "spark joins hash tables fast", "a"),
      (2L, "spark joins hash tables fast today always", "a"),
      (3L, "window functions rank rows", "b"),
      (4L, "unrelated prose about gardens and rain", "b"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(dir)
    // BM25: doc 1 contains every query term and is shorter than doc 2
    val bm = spark.sql(s"SELECT rank, doc_id, score FROM bm25_topk(" +
      s"'$dir', 'doc_id', 'text', 'spark hash joins', 2) ORDER BY rank")
      .collect()
    assert(bm.length === 2)
    assert(bm(0).getLong(1) === 1L && bm(1).getLong(1) === 2L)
    // the SQL relation must equal the Scala-API relation exactly
    val want = graft.operators.TextAnalysis.bm25TopK(
      spark.read.parquet(dir), "doc_id", "text",
      Seq((0L, "spark hash joins")).toDF("qid", "qtext"), "qid", "qtext",
      k = 2).select("rank", "doc_id", "score").orderBy("rank").collect()
    assert(bm.toSeq === want.toSeq)
    // maxDfFrac (optional 6th argument) drops query terms by document
    // frequency BEFORE scoring: every query term here has df=2 of
    // N=4 docs, so 0.5 keeps them all (identical result) and 0.4
    // drops them all (empty result)
    val bmKeep = spark.sql(s"SELECT rank, doc_id, score FROM bm25_topk(" +
      s"'$dir', 'doc_id', 'text', 'spark hash joins', 2, 0.5) " +
      "ORDER BY rank").collect()
    assert(bmKeep.toSeq === bm.toSeq)
    val bmCut = spark.sql(s"SELECT * FROM bm25_topk(" +
      s"'$dir', 'doc_id', 'text', 'spark hash joins', 2, 0.4)").collect()
    assert(bmCut.isEmpty)
    // containment: doc 1's shingles are all inside doc 2
    val cp = spark.sql(s"SELECT id_a, id_b, containment FROM " +
      s"containment_pairs('$dir', 'doc_id', 'text', 3, 0.9, 8)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cp === Set((1L, 2L)))
    // group TF-IDF: each source's most distinctive term
    val tg = spark.sql(s"SELECT source, rank, term, score FROM " +
      s"tfidf_by_group('$dir', 'source', 'text', 1) ORDER BY source")
      .collect()
    assert(tg.map(_.getString(0)).toSeq === Seq("a", "b"))
    // bigram LM scoring: train on the same corpus, score it; the SQL
    // relation must equal the Scala-API relation exactly
    val lmGot = spark.sql(s"SELECT doc_id, n_transitions, nll_micros, " +
      s"avg_nll FROM bigram_lm_score('$dir', 'doc_id', 'text', '$dir', " +
      "'text') ORDER BY doc_id").collect()
    val lmWant = graft.operators.TextAnalysis.bigramLogProb(
      spark.read.parquet(dir), "doc_id", "text",
      graft.operators.TextAnalysis.bigramLm(spark.read.parquet(dir),
        "text")).orderBy("doc_id").collect()
    assert(lmGot.toSeq === lmWant.toSeq)
    // NB classify: train on the corpus labeled by source, score it;
    // the SQL relation must equal the Scala-API relation exactly
    val nbGot = spark.sql(s"SELECT doc_id, pred, score_micros, " +
      s"margin_micros FROM nb_classify('$dir', 'doc_id', 'text', " +
      s"'$dir', 'source', 'text') ORDER BY doc_id").collect()
    val nbWant = graft.operators.TextAnalysis.nbScore(
      spark.read.parquet(dir), "doc_id", "text",
      graft.operators.TextAnalysis.nbTrain(spark.read.parquet(dir),
        "source", "text")).orderBy("doc_id").collect()
    assert(nbGot.toSeq === nbWant.toSeq && nbGot.nonEmpty)
    // BPE training: the SQL relation must equal the Scala API's merges
    val bpeGot = spark.sql(s"SELECT iter, lhs, rhs, cnt FROM " +
      s"bpe_merges('$dir', 'text', 3) ORDER BY iter").collect()
    val bpeWant = graft.operators.TextAnalysis.bpeTrain(
        graft.operators.TextAnalysis.bpeWordFreq(
          spark.read.parquet(dir), "text"), 3)(CacheScope.session)
      .orderBy("iter").collect()
    assert(bpeGot.toSeq === bpeWant.toSeq && bpeGot.length === 3)
    // production trainer TVF: same contract, same merges
    val bpeLocalGot = spark.sql(s"SELECT iter, lhs, rhs, cnt FROM " +
      s"bpe_merges_local('$dir', 'text', 3) ORDER BY iter").collect()
    assert(bpeLocalGot.toSeq === bpeWant.toSeq)
    // char n-grams: SQL expression equals the Scala API
    val cgGot = spark.sql(
      "SELECT char_ngrams('Ab  cd', 2, 3) AS g").collect().head
      .getSeq[String](0)
    assert(cgGot === Seq("ab", "b ", " c", "cd", "ab ", "b c", " cd"))
    // non-literal arguments are rejected with the documented message
    intercept[Exception] {
      spark.sql(s"SELECT * FROM bm25_topk('$dir', 'doc_id', 'text', " +
        "'q', 1 + 1)").collect()
    }
    // the all-hot-doc raise's advice (skipAllHotDocs=true) is reachable
    // from the SQL surface as the optional 8th argument
    val hotDir = java.nio.file.Files.createTempDirectory("tretrh").toString
    val hot = "the quick brown fox jumps"
    ((1 to 30).map(i => (i.toLong, s"$hot body$i word$i")) :+
      (50L, hot)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(hotDir)
    val eh = intercept[Exception] {
      spark.sql(s"SELECT * FROM containment_pairs('$hotDir', 'doc_id', " +
        "'text', 3, 0.9, 8, 5)").collect()
    }
    assert(eh.getMessage.contains("skipAllHotDocs"))
    val skipped = spark.sql(s"SELECT * FROM containment_pairs(" +
      s"'$hotDir', 'doc_id', 'text', 3, 0.9, 8, 5, true)").collect()
    assert(skipped.isEmpty)
  }

  test("curation table functions: dsir_weights / semantic_dedup from SQL") {
    import spark.implicits._
    // dsir: target corpus is the alpha-family docs; the alpha doc in raw
    // must outscore the zebra doc
    val rawDir = java.nio.file.Files.createTempDirectory("dsirr").toString
    val tgtDir = java.nio.file.Files.createTempDirectory("dsirt").toString
    Seq((1L, "alpha beta gamma"), (2L, "zebra yankee xray"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(rawDir)
    Seq((9L, "alpha beta delta"), (10L, "beta alpha"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(tgtDir)
    val w = spark.sql("SELECT doc_id, weight FROM dsir_weights(" +
      s"'$rawDir', 'doc_id', 'text', '$tgtDir', 'text', 256) " +
      "ORDER BY doc_id").collect()
    assert(w.length === 2)
    assert(w(0).getDouble(1) > w(1).getDouble(1))
    val want = graft.operators.Curation.dsirWeights(
      spark.read.parquet(rawDir), "doc_id", "text",
      spark.read.parquet(tgtDir), "text", buckets = 256)
      .select("doc_id", "weight").orderBy("doc_id").collect()
    assert(w.toSeq === want.toSeq)
    // semantic dedup: two colinear vectors in cell 0 collapse keep-first
    val vecDir = java.nio.file.Files.createTempDirectory("sdv").toString
    val cenDir = java.nio.file.Files.createTempDirectory("sdc").toString
    Seq((1L, Seq(1.0, 0.0)), (2L, Seq(2.0, 0.0)), (3L, Seq(3.0, 0.0)),
      (4L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding").write.mode("overwrite").parquet(vecDir)
    Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("cell", "centroid").write.mode("overwrite").parquet(cenDir)
    val sd = spark.sql("SELECT vec_id, cell, keep FROM semantic_dedup(" +
      s"'$vecDir', 'vec_id', 'embedding', '$cenDir', 0.9) " +
      "ORDER BY vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(sd === Seq((1L, 0L, true), (2L, 0L, false), (3L, 0L, false),
      (4L, 1L, true)))
    // the loud maxClusterSize guard (cell 0 holds 3 > 2) is reachable
    // as the optional 6th argument
    val eh = intercept[Exception] {
      spark.sql("SELECT * FROM semantic_dedup(" +
        s"'$vecDir', 'vec_id', 'embedding', '$cenDir', 0.9, 2)").collect()
    }
    assert(eh.getMessage.contains("maxClusterSize"))
    // repeated_spans: the shared 8-token passage surfaces from SQL text
    val spDir = java.nio.file.Files.createTempDirectory("rsp").toString
    val pass = (1 to 10).map(i => s"p$i").mkString(" ")
    Seq((1L, s"one two three $pass"), (2L, s"alpha $pass omega"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(spDir)
    val sp = spark.sql("SELECT doc_id, span_start, span_end FROM " +
      s"repeated_spans('$spDir', 'doc_id', 'text', 8, 2) " +
      "ORDER BY doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(sp === Seq((1L, 3, 12), (2L, 1, 10)))
  }

  test("redundant normalization chains collapse in the optimized plan") {
    def uppers(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Int = {
      var n = 0
      plan.foreach(_.expressions.foreach(_.foreach {
        case _: org.apache.spark.sql.catalyst.expressions.Upper => n += 1
        case _ => ()
      }))
      n
    }

    // parquet-backed input so ConvertToLocalRelation can't pre-evaluate
    val cust = Tables.load(spark, "/root/testdata/sf0.001", "customer")
    // upper(trim(upper(trim(x)))) — the double-cleaned join-key shape
    val q = cust.select(
      upper(trim(upper(trim(col("c_name"))))).as("k"))
    assert(uppers(q.queryExecution.optimizedPlan) === 1,
      q.queryExecution.optimizedPlan.toString)

    // semantics preserved: collapsed plan ≡ single normalization
    val viaOnce = cust.select(upper(trim(col("c_name"))).as("k"))
      .orderBy("k").collect().toSeq
    assert(q.orderBy("k").collect().toSeq === viaOnce)
  }

  test("collapse leaves single normalizations and non-default trims alone") {
    import spark.implicits._
    val df = Seq("xax").toDF("v")
    // trim with an explicit trim-string is NOT idempotent-composable with
    // the default trim — must survive untouched
    val r = df.select(trim(trim($"v", "x")).as("t")).collect().head.getString(0)
    assert(r === "a")
  }
}
