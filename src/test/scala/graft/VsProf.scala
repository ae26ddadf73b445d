package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off phase profiler for the ann5 store lifecycle. */
object VsProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[vsprof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>")
        .as("embedding"))
    val dir = "/tmp/vsprof_store"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (round <- 1 to 2) {
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      println(s"-- round $round");
      t("create")(graft.pipelines.VectorStore.create(spark, dir,
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        nCells = 8, m = 8, ksub = 16, ivfIters = 2, pqIters = 3))
      t("append")(graft.pipelines.VectorStore.append(spark, dir,
        emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
        batchTag = "b1"))
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      t("topK")(graft.pipelines.VectorStore.topK(spark, dir, queries,
        "qid", "qv", k = 5, nprobe = 3).collect())
    }
    spark.stop()
  }
}
