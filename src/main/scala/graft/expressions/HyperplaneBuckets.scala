package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native multi-probe hyperplane-LSH bucketing — all plane projections in
  * ONE pass over the vector.
  *
  * The composed formulation (Similarity.multiProbeBucketsComposed)
  * evaluates `aggregate(zip_with(vec, w_p, …))` per plane, interpreted:
  * `planes` boxed walks of the vector per row plus an array_sort over
  * margin structs — measured as the dominant cost of embedding near-dup
  * bucketing. This expression accumulates every plane's dot product in a
  * single fused loop (per-plane accumulation stays in index order, so
  * each dot is bit-identical to the composed aggregate()), then derives
  * the base bucket and the `probes` lowest-|margin| single-bit flips.
  *
  * Output: array<bigint> of length probes+1 — [base, flip1, …]; flips
  * are ordered by ascending |margin| with ties broken by plane index,
  * exactly like the composed array_sort(struct(m, p)).
  * Null vector → null. Null elements contribute 0 to every projection
  * (the synthetic and any sane embedding column has containsNull=false;
  * the composed form nulls the whole dot in that corner instead).
  * A vector whose length differs from the hyperplane dim RAISES —
  * truncating would assign a plausible-but-wrong bucket (silent recall
  * loss); mis-dimensioned embeddings are a data bug to surface.
  */
object HyperplaneBucketsExpr {
  def multiProbeBuckets(vec: Column, weights: Seq[Seq[Double]],
      probes: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(HyperplaneBuckets(
      ColumnBridge.expression(vec), weights.map(_.toArray).toArray, probes))
  }
}

case class HyperplaneBuckets(child: Expression,
    weights: Array[Array[Double]], probes: Int) extends UnaryExpression {

  private def planes: Int = weights.length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  /** SQL-reachable (GraftExtensions), so malformed inputs must fail at
    * analysis, not per-row: only float/double arrays project correctly
    * (getDouble on int-packed ArrayData would read garbage), and a
    * negative probe count would blow up the output allocation. */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        if (probes < 0)
          TypeCheckResult.TypeCheckFailure(
            s"probes must be >= 0, got $probes")
        else TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double> input, " +
          s"got ${other.catalogString}")
    }
  }

  /** Reference-object doGenCode keeps the surrounding projection in one
    * whole-stage-codegen span (CodegenFallback would split it). */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneExpr", this,
      classOf[HyperplaneBuckets].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.nullSafeEval($c);"
    })
  }

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    // A ragged/mis-dimensioned vector must FAIL, not truncate: silently
    // projecting a prefix buckets the row plausibly-but-wrong, and a
    // wrong bucket is an invisible recall hole. (Type/probe validation
    // happens at analysis in checkInputDataTypes; length is per-row.)
    val n = if (planes > 0) weights(0).length else 0
    if (planes > 0 && a.numElements() != n)
      throw new IllegalArgumentException(
        s"hyperplane_buckets: vector length ${a.numElements()} != " +
          s"hyperplane dim $n — ragged or mis-dimensioned embedding")
    val dots = new Array[Double](planes)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
        var p = 0
        while (p < planes) { dots(p) += x * weights(p)(i); p += 1 }
      }
      i += 1
    }
    var base = 0L
    var p = 0
    while (p < planes) {
      // NaN sets the bit: Spark SQL orders NaN above every double, so
      // the composed `when(dp >= 0, …)` is TRUE for NaN — mirror it
      // (Java's `NaN >= 0` alone is false)
      if (dots(p) >= 0 || dots(p).isNaN) base |= (1L << p)
      p += 1
    }
    val order = Array.range(0, planes)
      .sortBy(p => (math.abs(dots(p)), p))
    val nProbes = math.min(probes, planes)
    val out = new Array[Long](nProbes + 1)
    out(0) = base
    var f = 0
    while (f < nProbes) {
      out(f + 1) = base ^ (1L << order(f))
      f += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression)
      : HyperplaneBuckets = copy(child = c)
}
