package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native PORTABLE SimHash — the engine-independent signature the d4
  * gate uses so DuckDB can recompute it from first principles (the
  * production [[SimHashSig]] hashes tokens with xxhash64, which no other
  * engine reproduces).
  *
  * Definition (mirrored exactly by the generated oracle SQL in
  * graft.queries.LlmQueries):
  *  - tokens = split(lower(trim(text)), "\\s+")  — same as [[SimHashSig]]
  *  - token hash h = fold over the token's UNICODE CODE POINTS:
  *    acc := (acc * 131 + cp) mod P, acc0 = 7, P = 1e9+7 (the same fold
  *    the t2 fingerprint pins cross-engine, applied per token)
  *  - bit j (j < 63) votes +1 iff (h * Aj + Bj) mod P is odd, else -1;
  *    signature bit j is set iff the vote sum is strictly positive.
  *  - 63 bits: bit 63 stays 0 so neither engine needs a signed 1L<<63
  *    literal; chunked pairing over the containing long is unaffected
  *    (bit 63 simply never differs).
  *
  * The first composed formulation of this (63 interpreted list_filter
  * passes over a per-token hash array) cost ~7.4 s at sf0.1; this
  * expression is one tight loop per row (~1.8 s, on par with the native
  * production signature).
  */
object PortableSimHash {
  val P: Long = 1000000007L
  val Bits: Int = 63

  /** Affine rehash constants for bit j — ONE source of truth shared with
    * the DuckDB oracle generator. Everything stays < 2^31 so h*Aj+Bj
    * never overflows a signed 64-bit in either engine. */
  def bitConsts(j: Int): (Long, Long) =
    ((2654435761L * (j + 1)) % P, (40503L * (j + 7)) % P)

  def portableSimhashSig(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(PortableSimHashSig(ColumnBridge.expression(text)))
  }
}

case class PortableSimHashSig(child: Expression) extends UnaryExpression {
  import PortableSimHash._

  override def dataType: DataType = LongType
  override def prettyName: String = "portable_simhash_sig"

  private lazy val as: Array[Long] =
    Array.tabulate(Bits)(j => bitConsts(j)._1)
  private lazy val bs: Array[Long] =
    Array.tabulate(Bits)(j => bitConsts(j)._2)

  /** Reference-object doGenCode keeps the surrounding projection in one
    * whole-stage-codegen span (CodegenFallback would split it). */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("portableSimhashExpr", this,
      classOf[PortableSimHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = ((java.lang.Long) $ref.nullSafeEval($c))" +
        s".longValue();"
    })
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val tokens = text.split("\\s+", -1)
    val votes = new Array[Int](Bits)
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      var h = 7L
      var i = 0
      while (i < tok.length) {
        val cp = tok.codePointAt(i)
        h = (h * 131L + cp) % P
        i += Character.charCount(cp)
      }
      var j = 0
      while (j < Bits) {
        if ((((h * as(j) + bs(j)) % P) & 1L) == 1L) votes(j) += 1
        else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression)
      : PortableSimHashSig = copy(child = c)
}
