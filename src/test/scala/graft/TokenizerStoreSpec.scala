package graft

import graft.operators.{ByteBpe, TextAnalysis, Unigram, WordPiece}
import graft.pipelines.TokenizerStore
import org.apache.spark.sql.functions._

/** TokenizerStore (t23): save → load → encode must equal in-memory
  * encoding for all four tokenizer families; a dir without the format
  * marker (a crashed save) is rejected loudly. */
class TokenizerStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("tokstore").toString

  private val corpus = Seq(
    (1L, "abab abc abab low lower"),
    (2L, "cc abc lowest 世界"),
    (3L, "low low lower abab"),
    (4L, ""))

  private def docs = corpus.toDF("doc_id", "text")

  private def perDocRows(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Int, String)] =
    df.select(col("doc_id"), col("n_tok"),
        concat_ws(" ", transform(col("token_ids"),
          (i: org.apache.spark.sql.Column) => i.cast("string"))))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq

  test("bpe: stored merges encode identically to in-memory merges") {
    val wf = TextAnalysis.bpeWordFreq(docs, "text")
    val model = TextAnalysis.bpeTrainLocal(wf, nMerges = 6)
    val merges = model.orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val dir = tmp()
    TokenizerStore.save(spark, dir, "bpe", model)
    assert(TokenizerStore.family(spark, dir) === "bpe")
    assert(TokenizerStore.loadMerges(spark, dir) === merges)
    CacheScope.withScope { implicit s =>
      val mem = TextAnalysis.bpeEncodeCorpus(docs, "doc_id", "text",
        merges)._2
      val stored = TokenizerStore.encodeCorpus(spark, dir, docs,
        "doc_id", "text")._2
      assert(perDocRows(stored) === perDocRows(mem))
    }
  }

  test("bpe-byte: stored model dispatches to the byte encoder and " +
      "reproduces multibyte tokenization") {
    val wf = ByteBpe.byteWordFreq(docs, "text")
    val model = ByteBpe.train(wf, nMerges = 5)
    val merges = model.orderBy("iter").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val dir = tmp()
    TokenizerStore.save(spark, dir, "bpe-byte", model)
    CacheScope.withScope { implicit s =>
      val mem = ByteBpe.encodeCorpus(docs, "doc_id", "text", merges)._2
      val stored = TokenizerStore.encodeCorpus(spark, dir, docs,
        "doc_id", "text")._2
      assert(perDocRows(stored) === perDocRows(mem))
    }
  }

  test("unigram: stored (piece, cost_mu) table reproduces the Viterbi") {
    val wf = TextAnalysis.bpeWordFreq(docs, "text")
    val vocab = CacheScope.withScope { implicit s =>
      Unigram.seedVocab(wf, vocabSize = 40, maxPieceLen = 4)
        .select(col("piece"), col("cost_mu")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
    }
    val dir = tmp()
    TokenizerStore.save(spark, dir, "unigram",
      vocab.toDF("piece", "cost_mu"))
    CacheScope.withScope { implicit s =>
      val mem = Unigram.encodeCorpus(docs, "doc_id", "text", vocab)._2
        .select("doc_id", "n_tok", "score_mu").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      val stored = TokenizerStore.encodeCorpus(spark, dir, docs,
          "doc_id", "text")._2
        .select("doc_id", "n_tok", "score_mu").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(stored.toSeq === mem.toSeq)
    }
  }

  test("wordpiece: stored vocabulary reproduces the greedy encode") {
    val wf = TextAnalysis.bpeWordFreq(docs, "text")
    val pieces = CacheScope.withScope { implicit s =>
      WordPiece.vocab(wf, vocabSize = 40, maxPieceLen = 4)
        .select(col("piece")).collect().map(_.getString(0)).toIndexedSeq
    }
    val dir = tmp()
    TokenizerStore.save(spark, dir, "wordpiece", pieces.toDF("piece"))
    CacheScope.withScope { implicit s =>
      val mem = WordPiece.encodeCorpus(docs, "doc_id", "text",
        pieces)._2
      val stored = TokenizerStore.encodeCorpus(spark, dir, docs,
        "doc_id", "text")._2
      assert(perDocRows(stored) === perDocRows(mem))
    }
  }

  test("a crashed save (model without format marker) is rejected " +
      "loudly; unknown families fail at save time") {
    val wf = TextAnalysis.bpeWordFreq(docs, "text")
    val model = TextAnalysis.bpeTrainLocal(wf, nMerges = 2)
    val dir = tmp()
    TokenizerStore.save(spark, dir, "bpe", model)
    // simulate the crash window: model committed, format not
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    rmrf(new java.io.File(s"$dir/format"))
    val e = intercept[IllegalArgumentException] {
      TokenizerStore.family(spark, dir)
    }
    assert(e.getMessage.contains("format marker"))
    intercept[IllegalArgumentException] {
      TokenizerStore.save(spark, tmp(), "sentencepiece-xl", model)
    }
  }
}
