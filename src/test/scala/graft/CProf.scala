package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis => TA}
object CProf {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"CPROF $label ${(System.nanoTime()-t0)/1e9}%.2f"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, d, "documents")
    docs.count() // warm page cache
    (1 to 2).foreach { i =>
      println(s"CPROF --- iter $i")
      val n0 = t("count0")(docs.count())
      val annotated = CorpusStages.annotate(docs)
      val kept = annotated.filter(col("lang_id").isin("en")).filter(col("quality") >= 0.5)
      val keptP = t("keptPersist")(
        { val k = kept.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          k.count(); k })
      val exact = Dedup.exactDedupNarrow(keptP, "text", "doc_id")
      val nDups = t("dupCount")(exact.filter(col("is_duplicate")).count())
      val survivors = exact.filter(!col("is_duplicate"))
        .drop("content_hash", "is_duplicate")
      val pairs = t("minhashPairs")(
        { val p = Dedup.minhashDupPairs(survivors, "doc_id", "text", k=3, threshold=0.8)
          p.count(); p })
      val losers = pairs.select(col("id_b").as("doc_id")).distinct()
      val n3 = t("antijoin+ckpt+count")(
        survivors.join(losers, Seq("doc_id"), "left_anti").localCheckpoint().count())
      keptP.unpersist()
    }
    spark.stop()
  }
}
object CorpusStages {
  def annotate(docs: org.apache.spark.sql.DataFrame) =
    graft.pipelines.CorpusPipeline.annotate(docs, "text")
}
