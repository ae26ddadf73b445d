package graft

import graft.ops.IncrementalAgg
import graft.ops.IncrementalAgg.Measure
import org.apache.spark.sql.functions._

/** Incremental summary maintenance must equal the full recompute —
  * pinned on real data split into arbitrary "load batches". */
class IncrementalAggSpec extends SparkSpec {

  test("maintain(delta) over batches equals full recompute") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val keys = Seq("l_returnflag", "l_linestatus")
    val measures = Seq(
      Measure("sum_qty", "l_quantity", "sum"),
      Measure("min_price", "l_extendedprice", "min"),
      Measure("max_price", "l_extendedprice", "max"))

    // three "daily loads" by orderkey ranges
    val batches = Seq(
      li.filter(col("l_orderkey") % 3 === 0),
      li.filter(col("l_orderkey") % 3 === 1),
      li.filter(col("l_orderkey") % 3 === 2))

    val incremental = batches.tail.foldLeft(
      IncrementalAgg.summarize(batches.head, keys, measures)) {
      case (summary, batch) =>
        IncrementalAgg.maintain(summary,
          IncrementalAgg.summarize(batch, keys, measures), keys, measures)
    }
    val full = IncrementalAgg.summarize(li, keys, measures)

    val cols = (keys ++ Seq("n", "sum_qty", "min_price", "max_price"))
      .map(col)
    assert(incremental.select(cols: _*).orderBy(keys.map(col): _*)
      .collect().toSeq ===
      full.select(cols: _*).orderBy(keys.map(col): _*).collect().toSeq)
  }

  test("new groups insert, absent groups pass through") {
    import spark.implicits._
    val measures = Seq(Measure("sum_v", "v", "sum"))
    val s0 = IncrementalAgg.summarize(
      Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v"),
      Seq("k"), measures)
    val s1 = IncrementalAgg.maintain(s0,
      IncrementalAgg.summarize(Seq(("b", 1.0), ("c", 9.0)).toDF("k", "v"),
        Seq("k"), measures),
      Seq("k"), measures)
    val got = s1.orderBy("k").select("k", "n", "sum_v")
      .as[(String, Long, Double)].collect().toSeq
    assert(got === Seq(("a", 2L, 3.0), ("b", 2L, 6.0), ("c", 1L, 9.0)))
  }

  test("sketch distinct: union of disjoint deltas ≡ one-pass sketch " +
      "exactly; estimate lands in bound") {
    import spark.implicits._
    val o = Tables.orders(spark, "/root/testdata/sf0.001").select(
      (col("o_orderkey") % 5).as("batch"), lit("all").as("grain"),
      col("o_custkey"))
    // five disjoint "daily" sketches rolled up to one grain
    val daily = IncrementalAgg.sketchSummarize(o, Seq("batch", "grain"),
      "o_custkey")
    val rolled = IncrementalAgg.sketchEstimate(
      IncrementalAgg.sketchRollup(daily, Seq("grain"), "o_custkey_sketch"),
      "o_custkey_sketch", "est")
      .select("est").as[Long].head()
    // one pass over the whole input — must be the SAME estimate, not
    // merely close: disjoint-delta union reproduces identical registers
    val whole = IncrementalAgg.sketchEstimate(
      IncrementalAgg.sketchSummarize(o, Seq("grain"), "o_custkey"),
      "o_custkey_sketch", "est")
      .select("est").as[Long].head()
    assert(rolled === whole)
    val exact = o.select("o_custkey").distinct().count()
    assert(math.abs(rolled - exact) <= exact * 0.05 + 1,
      s"estimate $rolled vs exact $exact")
  }
}
