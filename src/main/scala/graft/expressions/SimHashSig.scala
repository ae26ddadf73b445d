package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash: whitespace tokens vote ±1 per bit of their
  * XXH64 hash; the sign of each bit's vote sum sets the signature bit.
  *
  * The composed formulation (explode tokens → groupBy doc → 64 sum
  * aggregates) pays a full shuffle keyed by doc id; SimHash is a
  * PER-ROW computation, so this expression does it in one pass with two
  * small loops and no shuffle at all. Semantics identical to
  * graft.operators.Dedup.simhash64 (tokens = split(lower(trim(text)),
  * "\\s+"), xxhash64 seed 42, bit j votes +1 iff (h>>j)&1 == 1, sig bit
  * set iff vote sum > 0).
  */
object SimHash {
  def simhashSig(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(text)))
  }
}

case class SimHashSig(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  /** Reference-object doGenCode keeps the surrounding projection in one
    * whole-stage-codegen span (CodegenFallback would split it). */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this,
      classOf[SimHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = ((java.lang.Long) $ref.nullSafeEval($c))" +
        s".longValue();"
    })
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val tokens = text.split("\\s+", -1)
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = XxHash64Function.hash(
        UTF8String.fromString(tokens(t)), StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): SimHashSig =
    copy(child = c)
}
