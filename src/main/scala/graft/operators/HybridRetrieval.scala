package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid lexical + semantic retrieval via reciprocal-rank fusion — the
  * standard RAG-corpus move: BM25 catches exact-term matches embeddings
  * smear out (identifiers, rare names, code tokens), embeddings catch
  * paraphrases BM25 cannot see, and RRF fuses the two WITHOUT score
  * calibration (ranks are scale-free, so no per-ranker normalization
  * constant to tune): score(d) = Σ_r 1/(rrfK + rank_r(d)) over the
  * rankers that returned d (Cormack/Clarke/Büttcher, SIGIR'09).
  *
  * Scale shape: nothing new moves — the lexical leg is
  * [[TextAnalysis.bm25TopK]] (inverted-index scoring, bounded topk_by),
  * the semantic leg is [[Similarity.bruteForceTopK]] (broadcast
  * queries, map-side scoring, bounded topk_by; swap in the IVF/LSH path
  * for a 100 TB store — any (qid, rank, id) frame fuses). Fusion itself
  * is a union of two |queries| × depth frames — control-plane sized —
  * and one narrow groupBy.
  *
  * Determinism: each contribution is round(1e6 / (rrfK + rank))
  * — integer micros, so the fused sum is exact integer arithmetic and
  * both input ranks are themselves hash-verified paths (t8's BM25
  * replay, ann1's cosine replay). Final ties break (score DESC,
  * id ASC). The id spaces of `docs` and `vectors` must coincide (the
  * embedding of doc i carries id i).
  */
object HybridRetrieval {

  /** Fuse pre-computed rankings: each input is (qidCol, rankCol, idCol)
    * — one row per (query, ranked doc). Exposed separately so callers
    * can fuse ANY rankers (IVF instead of brute force, a re-ranker,
    * 3+ legs). */
  def rrfFuse(rankings: Seq[DataFrame], qidCol: String, idCol: String,
      k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    require(k > 0 && rrfK > 0, s"rrfFuse: k=$k rrfK=$rrfK must be positive")
    val contribs = rankings
      .map(_.select(col(qidCol), col(idCol).cast("long").as("id"),
        round(lit(1e6) / (lit(rrfK) + col("rank"))).cast("long")
          .as("c_micros")))
      .reduce(_ unionByName _)
    val scored = contribs.groupBy(col(qidCol), col("id"))
      .agg(sum(col("c_micros")).as("score_micros"))
    TextAnalysis.bm25Rank(scored, qidCol, "id", k)
  }

  /** End-to-end hybrid top-k: BM25 over (idCol, textCol) fused with
    * exact cosine over (idCol, vecCol), both cut at `depth` before
    * fusion (depth ≥ k; deeper = more fusion evidence, more rows). */
  def hybridTopK(docs: DataFrame, vectors: DataFrame, idCol: String,
      textCol: String, vecCol: String, queries: DataFrame,
      qidCol: String, qtextCol: String, qvecCol: String, k: Int,
      depth: Int, rrfK: Int = 60)(
      implicit scope: graft.CacheScope): DataFrame = {
    require(depth >= k, s"hybridTopK: depth=$depth must be >= k=$k")
    val lex = TextAnalysis.bm25TopK(docs, idCol, textCol, queries,
      qidCol, qtextCol, depth)
    val sem = Similarity.bruteForceTopK(vectors, idCol, vecCol, queries,
      qidCol, qvecCol, depth)
    rrfFuse(Seq(
        lex.select(col(qidCol), col("rank"), col(idCol).as("id")),
        sem.select(col(qidCol), col("rank"), col(idCol).as("id"))),
      qidCol, "id", k, rrfK)
  }
}
