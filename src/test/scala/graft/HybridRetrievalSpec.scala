package graft

import graft.operators.HybridRetrieval
import org.apache.spark.sql.functions._

class HybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse computes exact integer-micro RRF sums with (score " +
      "DESC, id ASC) ties") {
    // ranker A: doc 1,2,3 — ranker B: doc 3,2,9
    val a = Seq((0L, 1, 1L), (0L, 2, 2L), (0L, 3, 3L))
      .toDF("qid", "rank", "id")
    val b = Seq((0L, 1, 3L), (0L, 2, 2L), (0L, 3, 9L))
      .toDF("qid", "rank", "id")
    val got = HybridRetrieval.rrfFuse(Seq(a, b), "qid", "id", k = 4)
      .orderBy($"rank")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    def c(rank: Int): Long = math.round(1e6 / (60 + rank))
    // doc2: ranks 2+2; doc3: ranks 3+1 — identical sums (16129+16129
    // vs 15873+16393 = 32258 vs 32266) → doc3 wins; doc1 = rank1 only
    val exp = Seq(
      (3L, (c(3) + c(1)).toDouble / 1e6),
      (2L, (c(2) + c(2)).toDouble / 1e6),
      (1L, c(1).toDouble / 1e6),
      (9L, c(3).toDouble / 1e6))
    assert(got.map(_._2).toSeq === exp.map(_._1))
    assert(got.map(_._3).toSeq === exp.map(_._2))
    assert(got.map(_._1).toSeq === Seq(1, 2, 3, 4))
  }

  test("a doc ranked well by both legs beats a doc ranked best by one") {
    val a = Seq((0L, 1, 10L), (0L, 2, 7L)).toDF("qid", "rank", "id")
    val b = Seq((0L, 1, 11L), (0L, 2, 7L)).toDF("qid", "rank", "id")
    val top = HybridRetrieval.rrfFuse(Seq(a, b), "qid", "id", k = 1)
      .collect()(0).getLong(2)
    assert(top === 7L) // two rank-2s beat one rank-1
  }

  test("hybridTopK end-to-end: text-only match and vector-only match " +
      "both surface; a doc matching both ranks first") {
    val docs = Seq(
      (1L, "alpha beta gamma"),   // lexical + vector match
      (2L, "alpha beta delta"),   // lexical match, orthogonal vector
      (3L, "zeta eta theta"),     // vector match only
      (4L, "iota kappa lambda"))  // matches nothing
      .toDF("id", "text")
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("id", "embedding")
    val q = Seq((0L, "alpha beta", Array(1.0f, 0.0f, 0.0f)))
      .toDF("qid", "qtext", "qv")
    val got = HybridRetrieval.hybridTopK(docs, vecs, "id", "text",
        "embedding", q, "qid", "qtext", "qv", k = 4, depth = 4)
      .orderBy($"rank").collect().map(_.getLong(2)).toSeq
    assert(got.head === 1L, s"expected doc 1 first, got $got")
    assert(got.toSet.contains(3L) && got.toSet.contains(2L))
  }

  test("hybrid_topk TVF: SQL text equals the Scala API") {
    val root = java.nio.file.Files.createTempDirectory("hytvf").toString
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha delta"),
      (3L, "zeta eta")).toDF("id", "text")
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.9f, 0.1f))).toDF("vid", "emb")
    docs.write.mode("overwrite").parquet(s"$root/docs")
    vecs.write.mode("overwrite").parquet(s"$root/vecs")
    val got = spark.sql("SELECT rank, id, score FROM hybrid_topk(" +
      s"'$root/docs', 'id', 'text', '$root/vecs', 'vid', 'emb', " +
      "'alpha beta', array(1.0, 0.0), 3, 3) ORDER BY rank")
      .collect().toSeq
    val q = Seq((0L, "alpha beta", Array(1.0f, 0.0f)))
      .toDF("qid", "qtext", "qv")
    val want = HybridRetrieval.hybridTopK(docs,
        vecs.withColumnRenamed("vid", "id"), "id", "text", "emb", q,
        "qid", "qtext", "qv", k = 3, depth = 3)
      .select($"rank", $"id", $"score").orderBy($"rank").collect().toSeq
    assert(got === want && got.nonEmpty)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM hybrid_topk('$root/docs', 'id', 'text'," +
        s" '$root/vecs', 'vid', 'emb', 'q', array(1.0, 0.0), 3, 1 + 2)")
        .collect()
    }
  }

  test("depth < k is rejected loudly") {
    val docs = Seq((1L, "a")).toDF("id", "text")
    val vecs = Seq((1L, Array(1.0f))).toDF("id", "embedding")
    val q = Seq((0L, "a", Array(1.0f))).toDF("qid", "qtext", "qv")
    val e = intercept[IllegalArgumentException] {
      HybridRetrieval.hybridTopK(docs, vecs, "id", "text", "embedding",
        q, "qid", "qtext", "qv", k = 5, depth = 3)
    }
    assert(e.getMessage.contains("depth"))
  }
}
