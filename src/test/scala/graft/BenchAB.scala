package graft
import graft.operators.Dedup

/** A/B: d3 minhash pairing at bands=16 vs 32, and the d4 portable vs
  * native simhash signature cost, at sf0.1 under bench-like settings. */
object BenchAB {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag: n=$n time=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // warm
    Tables.documents(spark, sf).count()
    time("d3 bands=16") { Dedup.minhashDupPairs(
      Tables.documents(spark, sf), "doc_id", "text", 3, 64, 16, 0.7).count() }
    time("d3 bands=32") { Dedup.minhashDupPairs(
      Tables.documents(spark, sf), "doc_id", "text", 3, 64, 32, 0.7).count() }
    time("d3 bands=32 (again)") { Dedup.minhashDupPairs(
      Tables.documents(spark, sf), "doc_id", "text", 3, 64, 32, 0.7).count() }
    time("d4 gate query sf0.1") {
      graft.SparkEntry.queries("d4_simhash_pairs")(spark, sf).count() }
    time("d4 native maxH=7") { Dedup.simhashDupPairs(
      Tables.documents(spark, sf), "doc_id", "text", 7, 8).count() }
    spark.stop()
  }
}
