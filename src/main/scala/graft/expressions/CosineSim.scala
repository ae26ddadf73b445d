package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two numeric arrays (float or double),
  * one fused pass per row. The composed zip_with/aggregate formulation
  * evaluates interpreted lambdas per element ×3 (dot + both norms);
  * this loop reads each array once.
  *
  * Accumulation is sequential left-to-right in double, exactly like the
  * aggregate() formulation AND DuckDB's list_sum — bit-identical results
  * (pinned by the ann1 oracle and an equivalence spec). Null/length
  * mismatches yield null.
  */
object Cosine {
  def cosineSim(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
  }
}

case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  /** Real doGenCode (not CodegenFallback): calls back into this
    * instance via a reference object, so the surrounding projection
    * stays inside one whole-stage-codegen span instead of being split
    * at a fallback boundary. */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineSimExpr", this,
      classOf[CosineSim].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |Object cosR = $ref.nullSafeEval($a, $b);
         |if (cosR == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) cosR).doubleValue(); }
       """.stripMargin
    })
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Null on: length mismatch, any null element, or a zero-norm side.
    * The zero-norm case matters operationally: NaN sorts ABOVE all
    * doubles in Spark, so a NaN cosine would rank a dead all-zeros
    * vector first in every top-k and pass every >= threshold filter. */
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) return null
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(newLeft, newRight)
}
