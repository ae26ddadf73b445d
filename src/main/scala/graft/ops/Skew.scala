package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Skew-mitigation joins. At 100 TB the single biggest shuffle-join
  * failure mode is a handful of heavy-hitter keys (one popular order,
  * one dominant domain) pinning a reducer while 999 executors idle.
  * AQE's skew-join split handles many cases at runtime; these operators
  * are the PLAN-level mitigations for when the skew is known or must be
  * handled deterministically — and both are provably result-identical
  * to the plain join (the gate hashes them against a plain-SQL oracle).
  */
object SkewJoin {

  /** Salted inner equi-join: every dim row is replicated `salt` times,
    * every fact row is scattered deterministically (hash of
    * `scatterCol`, NOT rand() — reruns must land identically) into one
    * of the `salt` buckets, and the join key becomes (key, bucket).
    * A key with N fact rows now spreads over min(N, salt) reducers
    * instead of one. Cost: the dim side shuffles salt× its size — use
    * for medium dims too big to broadcast but far smaller than the
    * fact. Result set is EXACTLY the plain join's: each fact row meets
    * exactly the one replica of its dim match that shares its bucket.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      scatterCol: String, salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1: $salt")
    val f = fact.withColumn("__salt",
      pmod(xxhash64(col(scatterCol)), lit(salt.toLong)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }

  /** Hot/cold split join: count fact rows per key (safe even on the
    * skewed key — partial aggregation collapses each hot key to one row
    * per map task before the shuffle), keep the keys above
    * `hotThreshold` as a small hot-key table (guarded by `maxHotKeys`:
    * a "hot" set too large to broadcast means the threshold is wrong),
    * then broadcast-join the hot slice and shuffle-join the cold slice.
    * Hot/cold routing is broadcast semi/anti joins — never a literal
    * IN-list, which stops planning well past a few hundred keys — so
    * the hot rows never hit a shuffle reducer and the cold shuffle is
    * skew-free by construction. Union of the two slices is exactly the
    * plain inner join (every fact row routes to exactly one slice and
    * meets the full dim row set for its key).
    */
  def skewAwareJoin(fact: DataFrame, dim: DataFrame, key: String,
      hotThreshold: Long, maxHotKeys: Long = 1000000): DataFrame = {
    // Hot set is broadcast-sized by contract (maxHotKeys), so collect it
    // to the driver as a LocalRelation: bounded (limit maxHotKeys+1, so a
    // wrong threshold fails fast instead of OOMing the driver), one job,
    // and — unlike persist() — nothing left pinned in executor storage
    // after the call (a persist here leaks for the application lifetime
    // since the caller never sees the handle to unpersist).
    val keyDf = fact.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(col(key))
    val collected = keyDf.limit(math.min(maxHotKeys, Int.MaxValue - 1).toInt + 1)
      .collect()
    require(collected.length <= maxHotKeys,
      s"more than $maxHotKeys hot keys — raise hotThreshold (a 'hot' " +
        "set this large will not broadcast)")
    if (collected.isEmpty) fact.join(dim, Seq(key))
    else {
      import scala.jdk.CollectionConverters._
      val hk = broadcast(
        fact.sparkSession.createDataFrame(collected.toSeq.asJava, keyDf.schema))
      val hot = fact.join(hk, Seq(key), "left_semi")
        .join(broadcast(dim.join(hk, Seq(key), "left_semi")), Seq(key))
      val cold = fact.join(hk, Seq(key), "left_anti")
        .join(dim.join(hk, Seq(key), "left_anti"), Seq(key))
      hot.unionByName(cold)
    }
  }

  /** Bloom-pruned join for a SELECTIVE dim side: build a bloom filter
    * over the dim's (long) join keys, scan-stage-filter the fact with
    * `might_contain` BEFORE the shuffle, then join. When the dim keeps
    * 10% of keys, ~90% of the 100 TB fact never enters the exchange —
    * the same idea as AQE's runtime row-level filters, but explicit,
    * deterministic, and available when the dim side is computed outside
    * the query (a key ledger, yesterday's delta). False positives only
    * admit extra rows that the join itself drops, so the result is
    * EXACTLY the plain inner join; `fpp` trades filter size for wasted
    * shuffle, never correctness. The filter rides into the scan as a
    * codegen'd expression against a broadcast-sized binary literal
    * (`expectedDimKeys` at fpp=0.01 ≈ 1.2 bytes/key). */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, key: String,
      expectedDimKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(key, expectedDimKeys, fpp)
    val bytes = {
      val bos = new ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      ColumnBridge.expression(col(key).cast("long"))))
    fact.filter(mightContain).join(dim, Seq(key))
  }
}
