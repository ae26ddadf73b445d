package graft

import graft.pipelines.CorpusStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Incremental corpus ingest with O(delta) dedup: the corpus is bucketed
  * on content_hash, so a batch dedups against it without the corpus side
  * ever entering an exchange. */
class CorpusStoreSpec extends SparkSpec {

  private val table = "corpus_store_test"

  private def dropTable(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(s"spark-warehouse/$table")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
  }

  override def afterAll(): Unit = { dropTable(); super.afterAll() }

  test("ingest dedups within batch and against the corpus; idempotent") {
    dropTable()
    CorpusStore.ensure(spark, table, "doc_id", "text")
    val day1 = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 100)
    val (a1, n1) = CorpusStore.ingest(spark, table, day1, "doc_id", "text")
    assert(n1 === 100)
    assert(a1 > 0 && a1 <= 100) // corpus has organic exact dups
    assert(spark.table(table).count() === a1)

    // re-ingesting the same batch is a no-op (corpus-level dedup)
    val (a2, _) = CorpusStore.ingest(spark, table, day1, "doc_id", "text")
    assert(a2 === 0)
    assert(spark.table(table).count() === a1)

    // a mixed batch: 50 known (different ids, same text) + genuinely new
    val day2 = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") >= 100 && col("doc_id") < 200)
      .unionByName(day1.limit(50)
        .select((col("doc_id") + 90000).as("doc_id"), col("text")))
    val (a3, n3) = CorpusStore.ingest(spark, table, day2, "doc_id", "text")
    assert(n3 === 150)
    val total = spark.table(table).count()
    assert(total === a1 + a3)
    // nothing already present re-entered
    assert(spark.table(table).select("content_hash").distinct().count()
      === total)
    // whitespace/case mangles of stored docs are also rejected
    val mangled = day1.limit(20).select(
      (col("doc_id") + 95000).as("doc_id"),
      concat(lit("  "), upper(col("text"))).as("text"))
    val (a4, _) = CorpusStore.ingest(spark, table, mangled, "doc_id", "text")
    assert(a4 === 0)

    // exact duplicate ROWS within one batch collapse to one appended row,
    // and null text is rejected (content-free), not silently lost
    import spark.implicits._
    val noisy = Seq((500001L, "zz unique alpha"), (500001L, "zz unique alpha"),
      (500002L, "zz unique beta"), (500003L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val before = spark.table(table).count()
    val (a5, n5) = CorpusStore.ingest(spark, table, noisy, "doc_id", "text")
    assert(n5 === 4 && a5 === 2)
    assert(spark.table(table).count() === before + 2)
    assert(spark.table(table).select("content_hash").distinct().count()
      === before + 2)
  }

  test("dedup anti-join never exchanges the corpus side") {
    // self-contained: ensure the table exists and holds at least one
    // batch even when this test runs in isolation
    CorpusStore.ensure(spark, table, "doc_id", "text")
    if (spark.table(table).isEmpty) {
      CorpusStore.ingest(spark, table,
        Tables.documents(spark, "/root/testdata/sf0.001")
          .select(col("doc_id"), col("text")).filter(col("doc_id") < 100),
        "doc_id", "text")
    }
    val batch = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 30)
      .withColumn("content_hash",
        graft.operators.Dedup.contentHash(col("text")))
    val anti = batch.join(spark.table(table).select("content_hash"),
      Seq("content_hash"), "left_anti")
    anti.count()
    def strip(p: org.apache.spark.sql.execution.SparkPlan)
        : org.apache.spark.sql.execution.SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    var n = 0
    strip(anti.queryExecution.executedPlan).foreach {
      case _: ShuffleExchangeExec => n += 1
      case a: AdaptiveSparkPlanExec => strip(a).foreach {
        case _: ShuffleExchangeExec => n += 1
        case _ => ()
      }
      case _ => ()
    }
    assert(n <= 1, s"expected <=1 exchange (batch side only), got $n:\n" +
      s"${anti.queryExecution.executedPlan}")
  }
}
