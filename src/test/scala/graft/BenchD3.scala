package graft
import graft.operators.Dedup
object BenchD3 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = Dedup.minhashDupPairs(
      Tables.documents(spark, "/root/testdata/sf0.1"), "doc_id", "text",
      3, 64, 16, 0.7).count()
    println(f"D3 pairs=$n time=${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
