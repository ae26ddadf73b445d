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
