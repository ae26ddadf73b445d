package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Hashed text embeddings (emb1): unit norm, zero-vector contract,
  * determinism, and the multiset-similarity property that makes the
  * construction useful. */
class HashEmbedSpec extends SparkSpec {
  import spark.implicits._

  private def embed(rows: Seq[(Long, String)], dim: Int = 16)
      : Map[Long, Seq[Double]] =
    Similarity.hashEmbed(rows.toDF("doc_id", "text"), "doc_id", "text",
        dim = dim, seed = "he")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

  test("vectors are unit-norm for non-empty text; empty/null text " +
      "gives the zero vector, not a missing row") {
    val got = embed(Seq((1L, "the quick brown fox"), (2L, ""),
      (3L, null.asInstanceOf[String]), (4L, "x")))
    def norm(v: Seq[Double]) = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm(got(1L)) - 1.0) < 1e-12)
    assert(math.abs(norm(got(4L)) - 1.0) < 1e-12)
    assert(got(2L).forall(_ === 0.0) && got(2L).length === 16)
    assert(got(3L).forall(_ === 0.0))
  }

  test("embedding depends on the token MULTISET: order-invariant, " +
      "count-sensitive, case-folded") {
    val got = embed(Seq(
      (1L, "alpha beta gamma"), (2L, "gamma alpha beta"),
      (3L, "alpha alpha beta gamma"), (4L, "ALPHA Beta GAMMA")))
    assert(got(1L) === got(2L), "order must not matter")
    assert(got(1L) !== got(3L), "token counts must matter")
    assert(got(1L) === got(4L), "tokens are lowercased")
  }

  test("deterministic across partitionings; dim is respected") {
    val rows = (0L until 40L).map(i => (i, s"tok$i shared common " +
      s"word${i % 5}")).toSeq
    val a = Similarity.hashEmbed(rows.toDF("doc_id", "text"),
        "doc_id", "text", dim = 8, seed = "he")
      .orderBy("doc_id").collect().map(_.getSeq[Double](1))
    val b = Similarity.hashEmbed(rows.toDF("doc_id", "text")
        .repartition(7), "doc_id", "text", dim = 8, seed = "he")
      .orderBy("doc_id").collect().map(_.getSeq[Double](1))
    assert(a.toSeq === b.toSeq)
    assert(a.forall(_.length === 8))
  }

  test("fused expression ≡ composed Column formulation, bit for bit, " +
      "on adversarial inputs") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "plain ascii tokens here"),
      (2L, "DUP dup DUP dup"), // case folding + multiplicity
      (3L, "  tabs\tand\nnewlinesvt\ffeeds\rcr  "),
      (4L, "unicode 世界 café née 😀"),
      (5L, ""), (6L, null.asInstanceOf[String]),
      (7L, "x"), (8L, "x x x x x x x x")) // single-bucket vectors
    val df = rows.toDF("doc_id", "text")
    for (dim <- Seq(2, 16, 64)) {
      val fused = Similarity.hashEmbed(df, "doc_id", "text", dim)
        .orderBy("doc_id").collect().map(_.getSeq[Double](1))
      val composed = Similarity
        .hashEmbedComposed(df, "doc_id", "text", dim)
        .orderBy("doc_id").collect().map(_.getSeq[Double](1))
      fused.zip(composed).zipWithIndex.foreach { case ((f, c), i) =>
        assert(f === c, s"dim=$dim doc=${rows(i)._1}")
      }
    }
  }

  test("hash embeddings feed the IVF stack directly: text → embed → " +
      "ivfBuild → cell-pruned top-k self-retrieves") {
    import org.apache.spark.sql.functions._
    val rows = (0L until 120L).map(i =>
      (i, s"theme${i % 6} body${i % 6} shared corpus token$i " +
        s"filler${i % 6} extra${(i * 7) % 6}")).toSeq
    val emb = Similarity.hashEmbed(rows.toDF("doc_id", "text"),
      "doc_id", "text", dim = 32)
    val index = graft.CacheScope.withScope { implicit s =>
      Similarity.ivfBuild(emb, "doc_id", "embedding",
        nCells = 4, iters = 2)
    }
    val queries = emb.filter(col("doc_id") < 10)
      .select(col("doc_id").as("qid"), col("embedding").as("qv"))
    val top1 = Similarity.ivfTopK(index, "doc_id", "embedding",
        queries, "qid", "qv", k = 1, nprobe = 2)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0L until 10L).foreach { q =>
      assert(top1(q) === q, s"query $q must self-retrieve at rank 1")
    }
  }

  test("hash_embed is callable from SQL with literal dim and seed") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    df.createOrReplaceTempView("he_docs")
    val viaSql = spark.sql(
      "SELECT hash_embed(text, 16) AS e FROM he_docs")
      .collect().head.getSeq[Double](0)
    val viaApi = Similarity.hashEmbed(df, "doc_id", "text", dim = 16)
      .collect().head.getSeq[Double](1)
    assert(viaSql === viaApi)
    // a different literal seed changes the vector
    val other = spark.sql(
      "SELECT hash_embed(text, 16, 'zz') AS e FROM he_docs")
      .collect().head.getSeq[Double](0)
    assert(other !== viaApi)
    intercept[Exception] {
      spark.sql("SELECT hash_embed(text, 8 + 8) FROM he_docs").collect()
    }
  }

  test("cosine on hash embeddings tracks token overlap: shared-word " +
      "pairs score above disjoint pairs") {
    val got = embed(Seq(
      (1L, "data pipeline quality filter dedup"),
      (2L, "data pipeline quality filter tokens"),
      (3L, "orthogonal unrelated vocabulary entirely different")),
      dim = 64)
    def cos(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(cos(got(1L), got(2L)) > 0.5)
    assert(cos(got(1L), got(2L)) > cos(got(1L), got(3L)))
  }
}
