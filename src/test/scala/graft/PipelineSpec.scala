package graft

import graft.pipelines.Pipelines
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The SURVEY §7.2 minimum end-to-end slice: generate → extract →
  * snapshot → dw-load → validate, plus the idempotence contract (§5:
  * re-running the same file is a no-op). */
class PipelineSpec extends SparkSpec {

  test("E1→E2→E3→V10 end-to-end, then idempotent re-run") {
    val root = Files.createTempDirectory("graft_pipe").toString
    // E1: source load
    val db = Pipelines.sourceLoad(spark, root, nFacts = 500,
      dateId = 20240115)
    assert(db.facts.count() === 500) // generator honors n exactly
    assert(db.products.count() === 50)

    // E2: extract + snapshot (star join, ordered, pipe CSV)
    val snapshot = Pipelines.extract(spark, db, root)
    assert(snapshot.count() === db.facts.count())
    assert(new java.io.File(s"$root/incoming/sales_snapshot").exists())

    // E3: DW load from the incoming file
    val (dw1, stats1) = Pipelines.dwLoad(spark, db, root,
      s"$root/incoming/sales_snapshot")
    assert(stats1("inserts") > 0)
    assert(stats1("updates") === 0)           // first load: all inserts
    assert(stats1("miss_STORE_KEY") === 0)    // every key resolves
    val dw1Count = dw1.count() // materialize before the overwrite-by-swap
    assert(dw1Count === stats1("inserts"))
    // surrogate keys are dense 1..N
    val keys = dw1.select("fact_key").collect().map(_.getLong(0)).sorted
    assert(keys.toSeq === (1L to keys.length))

    // idempotence: same file again → zero inserts, zero updates
    val (dw2, stats2) = Pipelines.dwLoad(spark, db, root,
      s"$root/incoming/sales_snapshot")
    assert(stats2("inserts") === 0 && stats2("updates") === 0)
    assert(dw2.count() === dw1Count)

    // V10: the whole suite passes
    val results = Pipelines.validationSuite(db, dw2, 20240115)
    val failed = results.filter(col("passed") === false).collect()
    assert(failed.isEmpty, failed.mkString("; "))

    // rotation: a second extract moves the previous dump to Archive/
    Pipelines.extract(spark, db, root)
    assert(new java.io.File(s"$root/extract/Archive").list().nonEmpty)
  }

  test("FIXTURES §6: poison, retry, and snowflake-dim maintenance") {
    val root = Files.createTempDirectory("graft_pipe2").toString
    val db = Pipelines.sourceLoad(spark, root, nFacts = 200,
      dateId = 20240115)
    val snapshot = Pipelines.extract(spark, db, root)

    // (b) empty CSV -> Poison
    val emptyDir = s"$root/incoming/empty"
    graft.sources.CsvIO.write(snapshot.limit(0)
      .select(snapshot.columns.map(c => col(c).cast("string")): _*),
      emptyDir)
    Pipelines.loadIncoming(spark, db, root, emptyDir) match {
      case Pipelines.Poison(r) => assert(r.contains("empty file"))
      case other => fail(s"expected Poison, got $other")
    }

    // (c) missing required columns -> Poison naming them
    val badDir = s"$root/incoming/bad"
    graft.sources.CsvIO.write(
      snapshot.select(col("sales_id").cast("string")), badDir)
    Pipelines.loadIncoming(spark, db, root, badDir) match {
      case Pipelines.Poison(r) =>
        assert(r.contains("STORE_NAME") && r.contains("NET_AMOUNT"))
      case other => fail(s"expected Poison, got $other")
    }

    // (d) valid file but empty dims -> Retry (file stays consumable)
    val emptyDims = db.copy(stores = db.stores.limit(0))
    Pipelines.loadIncoming(spark, emptyDims, root,
      s"$root/incoming/sales_snapshot") match {
      case Pipelines.Retry(r) => assert(r.contains("stores"))
      case other => fail(s"expected Retry, got $other")
    }

    // happy path through the outcome API
    Pipelines.loadIncoming(spark, db, root,
      s"$root/incoming/sales_snapshot") match {
      case Pipelines.Loaded(_, stats) => assert(stats("inserts") > 0)
      case other => fail(s"expected Loaded, got $other")
    }

    // snowflake dims: first run inserts, second run adds nothing
    val n1 = Pipelines.maintainSnowflakeDims(spark, root, snapshot)
    assert(n1("category") > 0 && n1("manufacturer") > 0)
    val n2 = Pipelines.maintainSnowflakeDims(spark, root, snapshot)
    assert(n2.values.forall(_ === 0L))
    val cats = spark.read.parquet(s"$root/dw/dim_category")
    assert(cats.count() === n1("category"))
    // keys are dense 1..N
    assert(cats.select("key").collect().map(_.getLong(0)).sorted.toSeq
      === (1L to n1("category")))
  }
}
