package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded top-k aggregate: `topk_by(ord, id, k)` keeps the k
  * best (ord DESC, id ASC) pairs per group WITH map-side partial
  * aggregation.
  *
  * This is the scale shape for exact top-k-per-query ANN: the
  * row_number()-window formulation shuffles EVERY scored row to its
  * query's reducer — a full gather per query, the one 100 TB caveat the
  * brute-force path carried. With this aggregate each map task forwards
  * at most k rows per (partition, query): shuffle volume drops from
  * |data|×|queries| rows to k×partitions×|queries|, and the merge is
  * associative/commutative. (ord, id) is a TOTAL order — NaN sorts
  * above every double exactly like the window's DESC ordering, ties
  * break toward the smaller id — so the result is independent of
  * partitioning and merge order, and identical to the window version.
  *
  * Same integration class as Spark's own percentile_approx
  * (TypedImperativeAggregate → ObjectHashAggregate); the buffer is a
  * size-capped sorted array, serialized as plain (double, long) pairs.
  * Null ord or id rows are skipped (the window form ranks nulls last in
  * DESC order, so they can only appear when a group has fewer than k
  * non-null rows — a corner no caller feeds).
  */
object TopKByExpr {
  /** Column API: array<struct<ord:double, id:bigint>> of length ≤ k,
    * best-first. */
  def topkBy(ord: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(TopKBy(ColumnBridge.expression(ord),
      ColumnBridge.expression(id), k).toAggregateExpression())
  }
}

/** Mutable bounded buffer: entries sorted best-first; insertion keeps
  * the cap. k is small (top-k queries), so array insertion beats heap
  * constant factors. */
final class TopKBuffer(val k: Int) {
  val ords = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** better(a, b): ord DESC with NaN greatest (java compare), id ASC. */
  private def beats(o1: Double, i1: Long, o2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(o1, o2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def insert(o: Double, id: Long): Unit = {
    if (size == k && !beats(o, id, ords(size - 1), ids(size - 1))) return
    var pos = if (size == k) size - 1 else size
    if (size < k) size += 1
    while (pos > 0 && beats(o, id, ords(pos - 1), ids(pos - 1))) {
      ords(pos) = ords(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    ords(pos) = o; ids(pos) = id
  }
}

case class TopKBy(ord: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    else if (ord.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName ord must be double, got ${ord.dataType.catalogString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName id must be bigint, got ${id.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null)
      b.insert(o.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < o.size) { b.insert(o.ords(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(Array.tabulate[Any](b.size)(i =>
      InternalRow(b.ords(i), b.ids(i))))

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    var i = 0
    while (i < b.size) {
      out.writeDouble(b.ords(i)); out.writeLong(b.ids(i)); i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new TopKBuffer(k)
    var i = 0
    // entries arrive best-first and pre-capped, so inserts are cheap
    while (i < n) { b.insert(in.readDouble(), in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKBy =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKBy =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(ord = newChildren(0), id = newChildren(1))
}
