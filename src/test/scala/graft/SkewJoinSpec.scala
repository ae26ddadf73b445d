package graft

import graft.ops.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // one key ("hot") carries 80% of the fact rows
  private def skewedFact = ((1 to 400).map(i => (7L, s"h$i")) ++
    (1 to 100).map(i => (i.toLong % 20 + 100L, s"c$i")))
    .toDF("k", "payload")

  private def dim = ((Seq(7L) ++ (100L to 119L)).map(k => (k, s"dim$k")) :+
    (999L, "unmatched")).toDF("k", "attr")

  test("saltedJoin: result set identical to plain join") {
    val plain = skewedFact.join(dim, Seq("k"))
      .select("k", "payload", "attr").as[(Long, String, String)]
      .collect().toSet
    val salted = SkewJoin.saltedJoin(skewedFact, dim, "k", "payload", 8)
      .select("k", "payload", "attr").as[(Long, String, String)]
      .collect().toSet
    assert(salted === plain)
    assert(plain.size === 500)
  }

  test("saltedJoin: scatter actually spreads the hot key over buckets") {
    val buckets = skewedFact.filter(col("k") === 7L)
      .select(pmod(xxhash64(col("payload")), lit(8L)))
      .distinct().count()
    assert(buckets === 8)
  }

  test("skewAwareJoin: result identical to plain join, both slices hit") {
    val plain = skewedFact.join(dim, Seq("k"))
      .select("k", "payload", "attr").as[(Long, String, String)]
      .collect().toSet
    val split = SkewJoin.skewAwareJoin(skewedFact, dim, "k",
      hotThreshold = 50L)
    val got = split.select("k", "payload", "attr")
      .as[(Long, String, String)].collect().toSet
    assert(got === plain)
    // the hot slice must be a broadcast join (no shuffle for hot rows)
    val physical = split.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"))
  }

  test("skewAwareJoin: no hot keys falls back to the plain join") {
    val got = SkewJoin.skewAwareJoin(skewedFact, dim, "k",
        hotThreshold = 10000L)
      .select("k", "payload", "attr").as[(Long, String, String)]
      .collect().toSet
    assert(got === skewedFact.join(dim, Seq("k"))
      .select("k", "payload", "attr").as[(Long, String, String)]
      .collect().toSet)
  }

  test("bloomPrunedJoin: identical to plain join; filter reaches the plan") {
    val fact = (1L to 1000L).map(k => (k, s"f$k")).toDF("k", "payload")
    val dim = (1L to 1000L by 100).map(k => (k, s"d$k")).toDF("k", "attr")
    val plain = fact.join(dim, Seq("k"))
      .select("k", "payload", "attr").as[(Long, String, String)]
      .collect().toSet
    val pruned = SkewJoin.bloomPrunedJoin(fact, dim, "k",
      expectedDimKeys = 100L)
    val got = pruned.select("k", "payload", "attr")
      .as[(Long, String, String)].collect().toSet
    assert(got === plain)
    assert(plain.size === 10)
    // plan assert needs a real file scan — over a LocalRelation the
    // optimizer folds the filter into the local table itself
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val filePlan = SkewJoin.bloomPrunedJoin(li, o, "l_orderkey", 1000L)
      .queryExecution.executedPlan.toString
    assert(filePlan.contains("might_contain"),
      "bloom membership test did not reach the physical plan")
  }

  test("bloomPrunedJoin: null fact keys are dropped, like the inner join") {
    val fact = Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"))
      .toDF("k", "payload")
    val dim = Seq((1L, "d1"), (2L, "d2")).toDF("k", "attr")
    val got = SkewJoin.bloomPrunedJoin(fact, dim, "k", 10L)
      .select("payload").as[String].collect().toSet
    assert(got === Set("a", "c"))
  }

  test("skewAwareJoin: maxHotKeys guard rejects an unbroadcastable hot set") {
    intercept[IllegalArgumentException] {
      SkewJoin.skewAwareJoin(skewedFact, dim, "k", hotThreshold = 0L,
        maxHotKeys = 2L)
    }
  }
}
