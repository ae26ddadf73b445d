package graft

import graft.pipelines.{BucketedDw, Pipelines}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import java.nio.file.Files

/** The 100 TB path for the E3 loader: the DW fact lives in a bucketed
  * table, so classify + merge never exchange the target side. */
class BucketedDwSpec extends SparkSpec {

  private val table = "fact_sales_dw_test"

  private def dropTables(): Unit =
    Seq(table, table + "__staging", table + "__old").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }

  override def afterAll(): Unit = { dropTables(); super.afterAll() }

  test("bucketed dwLoad: same results as the parquet path, idempotent") {
    dropTables()
    val root = Files.createTempDirectory("graft_bdw").toString
    val db = Pipelines.sourceLoad(spark, root, nFacts = 300,
      dateId = 20240115)
    Pipelines.extract(spark, db, root)
    val incoming = s"$root/incoming/sales_snapshot"

    val (dw1, stats1) = BucketedDw.dwLoad(spark, db, incoming, table)
    assert(stats1("updates") === 0)
    val n1 = dw1.count()
    assert(n1 === stats1("inserts") && n1 > 0)
    // surrogate keys dense 1..N, same as the parquet path
    val keys = dw1.select("fact_key").collect().map(_.getLong(0)).sorted
    assert(keys.toSeq === (1L to keys.length))

    // idempotent re-run: no inserts, no updates, same rows
    val (dw2, stats2) = BucketedDw.dwLoad(spark, db, incoming, table)
    assert(stats2("inserts") === 0 && stats2("updates") === 0)
    assert(dw2.count() === n1)

    // produces the same fact content as the parquet-path loader
    val (dwP, _) = Pipelines.dwLoad(spark, db, root, incoming)
    val cols = dwP.columns.sorted.map(col).toIndexedSeq
    assert(dw2.select(cols: _*).orderBy("natural_key").collect().toSeq
      === dwP.select(cols: _*).orderBy("natural_key").collect().toSeq)
  }

  test("recover rolls back a crash between swapIn's two renames") {
    val root = Files.createTempDirectory("graft_bdw3").toString
    val db = Pipelines.sourceLoad(spark, root, nFacts = 100,
      dateId = 20240115)
    Pipelines.extract(spark, db, root)
    val incoming = s"$root/incoming/sales_snapshot"
    val (dw1, _) = BucketedDw.dwLoad(spark, db, incoming, table)
    val n1 = dw1.count()
    // simulate the crash window: table renamed aside, new one not yet in
    spark.sql(s"ALTER TABLE `$table` RENAME TO `${table}__old`")
    // next load must restore the data, not rebuild from an empty table
    val (dw2, stats2) = BucketedDw.dwLoad(spark, db, incoming, table)
    assert(stats2("inserts") === 0 && stats2("updates") === 0)
    assert(dw2.count() === n1)
  }

  test("bucketed target joins without exchanging the target side") {
    // table exists from the previous test (re-ensure for isolation)
    if (!spark.catalog.tableExists(table)) {
      val root = Files.createTempDirectory("graft_bdw2").toString
      val db = Pipelines.sourceLoad(spark, root, nFacts = 300,
        dateId = 20240115)
      Pipelines.extract(spark, db, root)
      BucketedDw.dwLoad(spark, db, s"$root/incoming/sales_snapshot", table)
    }
    val existing = spark.table(table)
    // a same-shaped delta joined on the bucket key (filter, not limit —
    // GlobalLimit would add its own single-partition exchange)
    val delta = existing.filter(col("fact_key") <= 50).drop("fact_key")

    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.count() // let AQE finalize the plan
      def strip(p: org.apache.spark.sql.execution.SparkPlan)
          : org.apache.spark.sql.execution.SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      var n = 0
      strip(df.queryExecution.executedPlan).foreach {
        case _: ShuffleExchangeExec => n += 1
        case a: AdaptiveSparkPlanExec => strip(a).foreach {
          case _: ShuffleExchangeExec => n += 1
          case _ => ()
        }
        case _ => ()
      }
      n
    }

    // merge-shaped full-outer join on plain equality (the production
    // setting for the non-null natural_key — `<=>` would repartition on
    // coalesce(k,'')/isnull(k) and defeat the bucket layout): only the
    // delta side may exchange
    val merge = existing.alias("t").join(delta.alias("s"),
      col("t.natural_key") === col("s.natural_key"), "full_outer")
    val nMerge = exchanges(merge)
    assert(nMerge <= 1, s"expected <=1 exchange (delta side only), " +
      s"got $nMerge:\n${merge.queryExecution.executedPlan}")

    // classify-shaped left-anti: same property
    val anti = delta.alias("s").join(existing.alias("t"),
      col("s.natural_key") === col("t.natural_key"), "left_anti")
    val nAnti = exchanges(anti)
    assert(nAnti <= 1, s"expected <=1 exchange, got $nAnti:\n" +
      s"${anti.queryExecution.executedPlan}")

    // and the target scan really is bucketed in the merge plan (the
    // full-outer join can't broadcast, so the bucket layout is what
    // saves the target-side exchange; a small inner join would instead
    // pick broadcast and rightly skip the bucketed scan)
    val plan = merge.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), plan)
  }
}
