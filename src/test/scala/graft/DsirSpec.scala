package graft

import graft.operators.Curation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dsirWeights semantics: target-like docs outscore off-target docs,
  * featureless docs score zero, the weight is partitioning-independent
  * (integer-micros determinism), and the feature space is uni+bigram
  * occurrences in-bucket-range. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq(
    (100L, "alpha beta gamma delta"),
    (101L, "alpha beta epsilon"),
    (102L, "beta gamma alpha")).toDF("doc_id", "text")

  private val raw = Seq(
    (1L, "alpha beta gamma"),          // on-target
    (2L, "zebra yankee xray whiskey"), // off-target
    (3L, "alpha zebra"),               // mixed
    (4L, null.asInstanceOf[String]),   // featureless
    (5L, "   ")).toDF("doc_id", "text")

  private def weights(df: DataFrame = raw): Map[Long, (Long, Double)] =
    Curation.dsirWeights(df, "doc_id", "text", target, "text",
      buckets = 512)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  test("target-like doc outscores off-target; mixed sits between") {
    val w = weights()
    assert(w(1L)._2 > w(3L)._2)
    assert(w(3L)._2 > w(2L)._2)
    assert(w(1L)._2 > 0.0) // looks like the target distribution
    assert(w(2L)._2 < 0.0) // looks like generic raw text
  }

  test("featureless docs score 0 with 0 features, and stay in the output") {
    val w = weights()
    assert(w(4L) === (0L, 0.0))
    assert(w(5L)._1 === 0L)
    assert(w.keySet === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("n_feats counts unigram + bigram OCCURRENCES") {
    // "alpha beta gamma": 3 unigrams + 2 bigrams
    assert(weights()(1L)._1 === 5L)
    // repetition counts: bag-of-ngrams, not a set
    val rep = Seq((9L, "alpha alpha alpha")).toDF("doc_id", "text")
    assert(weights(rep)(9L)._1 === 5L)
  }

  test("weights are partitioning-independent (integer-micros sum)") {
    val base = weights()
    val shuffled = weights(raw.repartition(7))
    assert(shuffled === base)
  }

  test("folded incremental counts reproduce the one-shot weights exactly") {
    val rawCounts = Curation.foldBucketCounts(
      Curation.ngramBucketCounts(raw.filter(col("doc_id") % 2 === 0),
        "text", 512),
      Curation.ngramBucketCounts(raw.filter(col("doc_id") % 2 === 1),
        "text", 512))
    val inc = Curation.dsirWeightsFromCounts(raw, "doc_id", "text",
      Curation.ngramBucketCounts(target, "text", 512), rawCounts, 512)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(inc === weights())
  }

  test("streamed ngram-count state equals the one-shot count table") {
    val root = java.nio.file.Files.createTempDirectory("graft_dsir").toString
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
    val state = graft.streaming.StreamingSummary.maintainNgramCountsFromFiles(
      spark, s"$root/deltas", raw.schema, s"$root/ckpt", s"$root/state",
      "text", buckets = 512)
    val full = Curation.ngramBucketCounts(raw, "text", 512)
    assert(state.orderBy("b").collect().toSeq ===
      full.orderBy("b").collect().toSeq)
  }

  test("ngramBuckets stays in [0, buckets) and hashes deterministically") {
    val got = Seq(("a b c d e f g h i j k l m n o p q r s t u v w x y z"))
      .toDF("text")
      .select(explode(Curation.ngramBuckets(col("text"), 64)).as("b"))
      .as[Long].collect()
    assert(got.length === 51) // 26 unigrams + 25 bigrams
    assert(got.forall(b => b >= 0 && b < 64))
    val again = Seq(("a b c d e f g h i j k l m n o p q r s t u v w x y z"))
      .toDF("text")
      .select(explode(Curation.ngramBuckets(col("text"), 64)).as("b"))
      .as[Long].collect()
    assert(again.toSeq === got.toSeq)
  }
}
