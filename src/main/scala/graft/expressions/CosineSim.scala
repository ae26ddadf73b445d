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

  /** Nullable even when both children are non-nullable: length
    * mismatch, a null element, and a zero-norm side all yield null.
    * Without this override, non-nullable inputs route nullSafeCodeGen
    * through its never-null branch, which drops ev.isNull's
    * DECLARATION while the fused loop below still assigns it — janino
    * rejects the stage ("isNull_N is not an rvalue") and every plan
    * containing the expression silently falls back to interpreted
    * execution (r9's 14 compile failures in the vector-path stress
    * tests). It is also the truthful null contract for the optimizer:
    * IsNotNull(cosine_sim(..)) must not constant-fold away. */
  override def nullable: Boolean = true

  /** Fully inlined doGenCode: emits the fused loop directly into the
    * whole-stage-codegen function — no reference-object call, no Double
    * boxing per row. This is the hot path of brute-force/IVF ANN where
    * the expression runs once per (vector, query) PAIR; at cluster scale
    * that is billions of invocations. Logic mirrors nullSafeEval
    * exactly (same accumulation order → same bits). */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    def get(arr: String, i: String, isFloat: Boolean): String =
      if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    double $x = ${get(a, i, af)};
         |    double $y = ${get(b, i, bf)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if ($bad || $na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |  else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na)
         |      * java.lang.Math.sqrt($nb));
         |  }
         |}
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
