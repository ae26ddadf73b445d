package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object WgProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val edges = (0 until 400).map { i =>
      (s"n${i % 37}", s"n${(i * 7 + 3) % 37}", (i % 5 + 1).toLong)
    }.filter(t => t._1 != t._2).toDF("src", "dst", "weight")
    edges.cache().count()
    for (round <- 1 to 2; iters <- Seq(1, 5, 10)) {
      val t0 = System.nanoTime()
      graft.CacheScope.withScope { implicit s =>
        graft.operators.WebGraph.pageRank(edges, iters = iters)
          .select("node", "rank_fp").collect()
      }
      println(f"PROF pagerank iters=$iters round=$round ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
