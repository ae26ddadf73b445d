package graft
import org.apache.spark.sql.SparkSession
object QBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val q = SparkEntry.queries(args(0))
    // warm
    q(spark, d).collect()
    val times = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); q(spark, d).collect(); (System.nanoTime()-t0)/1e9
    }
    println(f"QBENCH ${args(0)} min=${times.min}%.2f med=${times.sorted.apply(2)}%.2f")
    spark.stop()
  }
}
