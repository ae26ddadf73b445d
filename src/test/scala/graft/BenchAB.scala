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
    locally {
      import org.apache.spark.sql.functions._
      val li = Tables.lineitem(spark, sf)
      li.count()
      val cols = Seq("l_extendedprice", "l_partkey", "l_quantity")
      time("v8b basic min/max/count") { li.agg(
        min(col("l_extendedprice")), max(col("l_extendedprice")),
        count(col("l_extendedprice"))).collect(); 0L }
      time("v8b approx_count_distinct x3") { li.agg(
        approx_count_distinct(col(cols(0)), 0.05),
        approx_count_distinct(col(cols(1)), 0.05),
        approx_count_distinct(col(cols(2)), 0.05)).collect(); 0L }
      time("v8b percentile_approx x3") { li.agg(
        percentile_approx(col(cols(0)).cast("double"), lit(0.5), lit(1000)),
        percentile_approx(col(cols(1)).cast("double"), lit(0.5), lit(1000)),
        percentile_approx(col(cols(2)).cast("double"), lit(0.5), lit(1000)))
        .collect(); 0L }
      time("v8b countDistinct x3") { li.agg(
        countDistinct(col(cols(0))), countDistinct(col(cols(1))),
        countDistinct(col(cols(2)))).collect(); 0L }
      time("v8b rank pass") { li.agg(
        sum(when(col(cols(0)).cast("double") < 100.0, 1L).otherwise(0L)),
        sum(when(col(cols(1)).cast("double") <= 100.0, 1L).otherwise(0L)))
        .collect(); 0L }
      time("v8b full approxProfileChecked") {
        graft.validate.Validator.approxProfileChecked(li, cols).count() }
    }
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
