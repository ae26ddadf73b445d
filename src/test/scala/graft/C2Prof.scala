package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Curation, TextAnalysis => TA}

/** Throwaway profiler for the c2 quality-gate stages. */
object C2Prof {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[c2prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t("gate path (qualityGate)") {
      CacheScope.withScope { _ =>
        SparkEntry.queries("c2_quality_gate")(spark, d).count()
      }
    }
    t("gate path again") {
      CacheScope.withScope { _ =>
        SparkEntry.queries("c2_quality_gate")(spark, d).count()
      }
    }
    implicit val scope: CacheScope = CacheScope.session
    val planted = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"),
        concat(replace(col("text"), lit(" value "), lit(".\n")),
          lit(".\nof the data and that batch have with be to end."))
          .as("text"))
    t("planted count")(planted.count())
    val c4 = planted.withColumn("__c", Curation.c4LineClean(col("text")))
      .filter(col("__c").getField("is_kept"))
      .withColumn("text", col("__c").getField("clean_text")).drop("__c")
      .persist()
    t("c4 count (cached)")(c4.count())
    val g = c4.filter(Curation.gopherPass(Curation.gopherReport(col("text"))))
      .persist()
    t("gopher count on cached input")(g.count())
    val rep = c4.select(Curation.gopherReport(col("text")).as("r"))
    t("gopher report only on cached input")(rep.count())
    val lm = TA.bigramLm(planted.filter(col("source") === "src0"), "text")
    t("lm count")(lm.count())
    val scored = TA.bigramLogProb(g, "doc_id", "text", lm, 0.5)
      .filter(col("n_transitions") > 0L && col("avg_nll") <= 12.0)
    t("score count")(scored.count())
    val joined = g.join(scored, Seq("doc_id"))
    t("join count")(joined.count())
    t("final collect")(joined.orderBy(col("doc_id")).collect().length)
    spark.stop()
  }
}
