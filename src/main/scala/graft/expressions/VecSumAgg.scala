package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native elementwise long-vector sum: `vec_sum_long(arr)` adds
  * fixed-length `array<bigint>` rows per group WITH map-side partial
  * aggregation.
  *
  * This is the scale shape for "score L alternatives per key without
  * exploding L rows per input": the Naive Bayes scorer's per-document
  * label vector is the motivating case — the (doc, label) row
  * expansion fed the hash aggregate corpus-tokens × L rows (330M at
  * 5M docs / 4 labels, measured 6.9 GB heap peak); summing an L-long
  * array per (doc, term) row instead keeps the aggregate input at
  * corpus-tokens rows and the per-group state at one small array.
  * Exact integer arithmetic, so the result is independent of
  * partitioning and merge order — the same determinism contract as
  * the micro-rounded scores it carries.
  *
  * Null rows and null elements are rejected loudly (the callers
  * substitute explicit OOV vectors before aggregation — a silent
  * skip would mis-score, not just mis-count); mixed lengths within a
  * group are a caller bug and also fail loudly.
  */
object VecSumAggExpr {
  /** Column API: array<bigint> elementwise sum over the group. Empty
    * groups (all-filtered) evaluate to null. */
  def vecSumLong(arr: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(VecSumAgg(ColumnBridge.expression(arr))
      .toAggregateExpression())
  }
}

/** Mutable buffer: allocated at first input, length-checked after. */
final class VecSumBuffer {
  var sums: Array[Long] = null

  def add(a: ArrayData): Unit = {
    val n = a.numElements()
    if (sums == null) sums = new Array[Long](n)
    require(sums.length == n,
      s"vec_sum_long: mixed vector lengths in one group " +
        s"(${sums.length} vs $n)")
    var i = 0
    while (i < n) {
      require(!a.isNullAt(i),
        "vec_sum_long: null element — substitute explicit values " +
          "before aggregating")
      sums(i) += a.getLong(i)
      i += 1
    }
  }

  def mergeFrom(o: VecSumBuffer): Unit = {
    if (o.sums == null) return
    if (sums == null) { sums = o.sums.clone(); return }
    require(sums.length == o.sums.length,
      s"vec_sum_long: mixed vector lengths across partitions " +
        s"(${sums.length} vs ${o.sums.length})")
    var i = 0
    while (i < sums.length) { sums(i) += o.sums(i); i += 1 }
  }
}

case class VecSumAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecSumBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum_long"
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<bigint>, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(b: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    require(v != null,
      "vec_sum_long: null vector — substitute an explicit vector " +
        "before aggregating")
    b.add(v.asInstanceOf[ArrayData])
    b
  }

  override def merge(b: VecSumBuffer, o: VecSumBuffer): VecSumBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: VecSumBuffer): Any =
    if (b.sums == null) null else new GenericArrayData(b.sums)

  override def serialize(b: VecSumBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (b.sums == null) out.writeInt(-1)
    else {
      out.writeInt(b.sums.length)
      var i = 0
      while (i < b.sums.length) { out.writeLong(b.sums(i)); i += 1 }
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new VecSumBuffer
    if (n >= 0) {
      b.sums = new Array[Long](n)
      var i = 0
      while (i < n) { b.sums(i) = in.readLong(); i += 1 }
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSumAgg =
    copy(child = newChildren(0))
}
