package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Proves the partition layout does what the 100 TB design claims:
  * date predicates become PartitionFilters (pruned before any file is
  * opened) and appends touch a single partition directory. */
class LayoutSpec extends SparkSpec {

  test("month-partitioned fact: predicate prunes partitions in the plan") {
    val root = Files.createTempDirectory("graft_layout").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    Layout.writeMonthPartitioned(li, "l_shipdate", s"$root/fact")

    val dirs = new java.io.File(s"$root/fact").list()
      .filter(_.startsWith("p_month=")).sorted
    assert(dirs.length > 12) // multiple years of months

    val q = Layout.read(spark, s"$root/fact")
      .filter(col("p_month") === 199506)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    q.count()
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(p_month"), scan)
    // row parity vs the unpartitioned source
    val expect = li.filter(year(col("l_shipdate")) === 1995
      && month(col("l_shipdate")) === 6).count()
    assert(Layout.read(spark, s"$root/fact")
      .filter(col("p_month") === 199506).count() === expect)
  }

  test("compactPartition shrinks file count, preserves rows and pruning") {
    val root = Files.createTempDirectory("graft_layout3").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val jan95 = li.filter(year(col("l_shipdate")) === 1995
      && month(col("l_shipdate")) === 6)
    Layout.writeMonthPartitioned(jan95, "l_shipdate", s"$root/fact")
    // simulate many tiny appends
    (1 to 5).foreach { _ =>
      Layout.appendMonth(jan95.limit(10), "l_shipdate", s"$root/fact")
    }
    val expect = Layout.read(spark, s"$root/fact")
      .filter(col("p_month") === 199506).count()

    val (before, after) = Layout.compactPartition(spark, s"$root/fact",
      "p_month=199506")
    assert(before > after && after === 1) // tiny data -> one file
    val q = Layout.read(spark, s"$root/fact")
      .filter(col("p_month") === 199506)
    assert(q.count() === expect)
    q.count()
    assert(q.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(p_month"))
  }

  test("zorderKey equals a reference bit-interleave; loud on bad input") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    val rows = Seq.fill(200)((r.nextInt(256).toLong, r.nextInt(256).toLong))
    val got = rows.toDF("x", "y")
      .select(Layout.zorderKey(Seq(col("x"), col("y")), bits = 8))
      .collect().map(_.getLong(0)).toSeq
    def ref(x: Long, y: Long): Long = (0 until 8).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    assert(got === rows.map { case (x, y) => ref(x, y) })
    // out-of-range value fails loudly instead of interleaving garbage
    intercept[Exception] {
      Seq((256L, 0L)).toDF("x", "y")
        .select(Layout.zorderKey(Seq(col("x"), col("y")), bits = 8))
        .collect()
    }
    // key must fit one signed 64-bit long
    intercept[IllegalArgumentException] {
      Layout.zorderKey(Seq(col("x"), col("y")), bits = 32)
    }
  }

  test("zorderWrite: row-group stats prune scans on BOTH z dimensions") {
    val root = Files.createTempDirectory("graft_zorder").toString
    val n = 40000L
    // two independent uniform dimensions: a plain linear sort could
    // cluster only one of them
    val df = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(4096L)).as("x"),
      pmod(xxhash64(col("id") + 1000000L), lit(4096L)).as("y"),
      col("id"))
    Layout.zorderWrite(df, s"$root/z", Seq(col("x"), col("y")),
      bits = 12, maxRecordsPerFile = 1000L)
    df.repartition(4).write.mode("overwrite")
      .option("maxRecordsPerFile", 1000L).parquet(s"$root/plain")

    // rows the parquet reader actually surfaces after row-group
    // (min/max stat) pruning of the pushed predicate
    def scanRows(path: String, pred: org.apache.spark.sql.Column)
        : (Long, Set[Long]) = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val q = spark.read.parquet(path).filter(pred).select("id")
        val ids = q.collect().map(_.getLong(0)).toSet
        val scanned = q.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numOutputRows").value
        }.sum
        (scanned, ids)
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    for (dim <- Seq("x", "y")) {
      val (zScan, zIds) = scanRows(s"$root/z", col(dim) < 128)
      val (pScan, pIds) = scanRows(s"$root/plain", col(dim) < 128)
      assert(zIds === pIds, s"result parity broke on $dim")
      // unclustered layout: every row group straddles the predicate
      assert(pScan === n, s"plain layout unexpectedly pruned on $dim")
      assert(zScan < n / 2,
        s"z layout pruned nothing on $dim: scanned $zScan of $n")
    }
  }

  test("appendMonth adds one directory and leaves the others untouched") {
    val root = Files.createTempDirectory("graft_layout2").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    Layout.writeMonthPartitioned(
      li.filter(year(col("l_shipdate")) === 1995), "l_shipdate",
      s"$root/fact")
    val before = new java.io.File(s"$root/fact").list()
      .filter(_.startsWith("p_month=")).toSet
    val mtimes = before.map(d =>
      d -> new java.io.File(s"$root/fact/$d").lastModified()).toMap

    Layout.appendMonth(
      li.filter(year(col("l_shipdate")) === 1996
        && month(col("l_shipdate")) === 1), "l_shipdate", s"$root/fact")
    val after = new java.io.File(s"$root/fact").list()
      .filter(_.startsWith("p_month=")).toSet
    assert((after -- before) === Set("p_month=199601"))
    // existing partition directories were not rewritten
    before.foreach { d =>
      assert(new java.io.File(s"$root/fact/$d").lastModified()
        === mtimes(d), s"$d was touched")
    }
  }
}
