package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bucketed range join must equal the theta join for every input with
  * finite interval bounds — bucketing is an execution strategy, never a
  * semantics change. (Non-finite bounds are dropped up front as
  * never-matching: their bucket arithmetic is meaningless.) */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  test("equals the theta join on seeded random points and intervals") {
    val r = new scala.util.Random(11)
    val points = (1L to 300L).map(i => (i, r.nextDouble() * 1000 - 100))
      .toDF("pid", "p")
    val intervals = (1L to 40L).map { i =>
      val lo = r.nextDouble() * 900 - 100
      (i, lo, lo + r.nextDouble() * 120)
    }.toDF("iid", "lo", "hi")
    for (width <- Seq(7.0, 50.0, 1000.0)) {
      val got = RangeJoin.rangeJoin(points, intervals, "p", "lo", "hi",
          bucketWidth = width)
        .select("pid", "iid").as[(Long, Long)].collect()
      val want = points.join(intervals,
          col("p") >= col("lo") && col("p") < col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect()
      // exact multiset equality: a bucket-overlap bug would duplicate
      // pairs, which a Set compare could not see
      assert(got.sorted.toSeq === want.sorted.toSeq, s"width=$width")
    }
  }

  test("null, empty, and non-finite intervals never match; [lo, hi)") {
    val points = Seq((1L, 10.0), (2L, 20.0), (3L, Double.NaN))
      .toDF("pid", "p")
    val intervals = Seq(
      (1L, Some(10.0), Some(20.0)),             // [10,20): p=10 only
      (2L, Some(30.0), Some(5.0)),              // empty (lo > hi)
      (3L, None, Some(50.0)),                   // null lo
      (4L, Some(0.0), None),                    // null hi
      (5L, Some(0.0), Some(Double.NaN)),        // NaN bound: bucket
      (6L, Some(Double.NegativeInfinity),       //   arithmetic is
        Some(50.0)),                            //   meaningless —
      (7L, Some(0.0),                           //   dropped up front,
        Some(Double.PositiveInfinity))          //   never exploded
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.rangeJoin(points, intervals, "p", "lo", "hi", 5.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L)))
  }

  test("overlapJoin equals the theta overlap join on seeded random " +
      "intervals — multiset equality (multiplicity one)") {
    val r = new scala.util.Random(13)
    def mk(n: Int, prefix: String) = (1L to n.toLong).map { i =>
      val lo = r.nextDouble() * 800 - 100
      (i, lo, lo + r.nextDouble() * 90)
    }.toDF(s"${prefix}id", s"${prefix}lo", s"${prefix}hi")
    val a = mk(80, "a")
    val b = mk(60, "b")
    for (width <- Seq(11.0, 100.0, 2000.0)) {
      val got = RangeJoin.overlapJoin(a, b, "alo", "ahi", "blo", "bhi",
          bucketWidth = width)
        .select("aid", "bid").as[(Long, Long)].collect()
      val want = a.join(b,
          greatest(col("alo"), col("blo")) <
            least(col("ahi"), col("bhi")))
        .select("aid", "bid").as[(Long, Long)].collect()
      assert(got.sorted.toSeq === want.sorted.toSeq, s"width=$width")
    }
  }

  test("shared column names and reserved __bucket are rejected up front") {
    val points = Seq((1L, 5.0)).toDF("id", "p")
    val sameName = Seq((1L, 0.0, 10.0)).toDF("id", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(points, sameName, "p", "lo", "hi", 5.0)
    }
    assert(e.getMessage.contains("rename before joining"))
    val reserved = Seq((1L, 0.0, 10.0, 0L)).toDF("iid", "lo", "hi",
      "__bucket")
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(points, reserved, "p", "lo", "hi", 5.0)
    }
    assert(e2.getMessage.contains("__bucket"))
  }

  test("an interval over the bucket cap fails loudly, not by explosion") {
    val points = Seq((1L, 5.0)).toDF("pid", "p")
    val wild = Seq((1L, 0.0, 1e9)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.rangeJoin(points, wild, "p", "lo", "hi",
        bucketWidth = 1.0, maxBucketsPerInterval = 100).count()
    }
    assert(e.getMessage != null)
  }
}
