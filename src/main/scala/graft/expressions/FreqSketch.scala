package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable frequent-items (heavy-hitters) sketch: `freq_sketch(item,
  * k)` summarizes an item stream with at most k Misra–Gries counters —
  * "which tokens / domains / URLs dominate this 100 TB corpus" without
  * the full-cardinality `groupBy(term).count()` shuffle, whose state is
  * the DISTINCT-term count (billions for web text), not k.
  *
  * Guarantees (Misra–Gries 1982; merge per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): with N the stream length and M the sum of
  * retained counter values, every item satisfies
  * `est <= true <= est + (N - M) / (k + 1)` — estimates only ever
  * undercount, and any item with true count > (N - M) / (k + 1) is
  * GUARANTEED present in the sketch. Counter VALUES depend on Spark's
  * partial-aggregation merge order (nondeterministic), but these bound
  * properties hold under every merge order — so gates assert the
  * bounds (deterministically true) plus exact counts from a small-SF
  * reference, the same self-verifying shape as the HLL gate
  * (`hll1_sketch_distinct`).
  *
  * Scale shape: same TypedImperativeAggregate → ObjectHashAggregate
  * class as [[TopKBy]]; each map task forwards one <= k-entry buffer,
  * merges are associative, and the reduce side touches k×partitions
  * entries total. The decrement step makes update O(k) worst case per
  * element — k is a few hundred at most by design.
  */
object FreqSketchExpr {
  /** Column API: array<struct<item:string, est:bigint>> of length <= k,
    * sorted est DESC, item ASC (binary order) — deterministic GIVEN the
    * final counter multiset. */
  def freqSketch(item: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(FreqSketch(ColumnBridge.expression(item), k)
      .toAggregateExpression())
  }
}

/** Mutable Misra–Gries counter set, capped at k entries. Keys are
  * defensively-copied UTF8Strings (Spark reuses the backing buffers of
  * values handed to `update`). */
final class FreqBuffer(val k: Int) {
  val counts = new mutable.HashMap[UTF8String, Long]

  /** Classic MG point update: increment if tracked or room remains,
    * otherwise decrement every counter by one and drop the zeros. */
  def addOne(item: UTF8String): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < k => counts.update(item.clone(), 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        counts.mapValuesInPlace((_, c) => c - 1)
        counts.foreach { case (key, c) => if (c <= 0) dead += key }
        dead.foreach(counts.remove)
    }
  }

  /** Mergeable-summaries merge: sum counters pairwise, then if more
    * than k remain, subtract the (k+1)-th largest value from all and
    * keep the strictly-positive ones (<= k survive by construction). */
  def mergeFrom(other: FreqBuffer): Unit = {
    other.counts.foreach { case (key, c) =>
      // `other` came from deserialize, so its keys are already owned
      counts.update(key, counts.getOrElse(key, 0L) + c)
    }
    if (counts.size > k) {
      val vals = counts.values.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      counts.mapValuesInPlace((_, c) => c - cut)
      counts.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(counts.remove)
    }
  }
}

case class FreqSketch(item: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqBuffer] {

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    else if (item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName item must be string, got ${item.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(k)

  override def update(b: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = item.eval(input)
    if (v != null) b.addOne(v.asInstanceOf[UTF8String])
    b
  }

  override def merge(b: FreqBuffer, o: FreqBuffer): FreqBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: FreqBuffer): Any = {
    val entries = b.counts.toArray
    java.util.Arrays.sort(entries,
      (a: (UTF8String, Long), c: (UTF8String, Long)) => {
        val d = java.lang.Long.compare(c._2, a._2) // est DESC
        if (d != 0) d else a._1.compareTo(c._1)    // item ASC
      })
    new GenericArrayData(entries.map { case (key, c) =>
      InternalRow(key, c): Any
    })
  }

  override def serialize(b: FreqBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (key, c) =>
      val bytes = key.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new FreqBuffer(k)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      b.counts.update(UTF8String.fromBytes(arr), in.readLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(item = newChildren(0))
}
