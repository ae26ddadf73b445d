package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text statistics — one tokenization pass per document.
  *
  * The composed formulation (graft.operators.TextAnalysis) expresses
  * token count, mean token length, stopword ratio, and per-language
  * marker scores as separate higher-order-function expressions. Those
  * lambdas evaluate INTERPRETED (no whole-stage codegen for
  * ArrayFilter/ArrayAggregate), so annotating a corpus walks every
  * token array ~7 times per row with per-element boxing — measured as
  * the dominant cost of the corpus-clean annotate stage. This
  * expression makes ONE pass: tokenize exactly like
  * `split(lower(trim(text)), "\\s+")` (UTF8String lower/trim — Spark's
  * own, locale-independent), then accumulate everything into primitive
  * counters.
  *
  * Output struct (null iff the input text is null):
  *   n_tok     INT    — token count (blank text tokenizes to [""] → 1,
  *                      matching split(); callers apply the same blank
  *                      guard the composed form uses)
  *   sum_len   BIGINT — total token chars (Spark length() semantics:
  *                      UTF8String.numChars per token)
  *   n_stop    INT    — tokens found in the stopword set
  *   scores    ARRAY<INT> — marker hits per language profile, in the
  *                      profile order supplied
  *
  * Derived columns (ratios, rounding, lang-id ladder, quality recipe)
  * stay cheap scalar expressions over this struct so every output is
  * bit-identical to the composed form — pinned by LlmOpsSpec.
  */
object TextStatsExpr {
  def textStats(text: Column, stopwords: Seq[String],
      profiles: Seq[Seq[String]]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      TextStats(ColumnBridge.expression(text), stopwords, profiles))
  }
}

case class TextStats(child: Expression, stopwords: Seq[String],
    profiles: Seq[Seq[String]]) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("scores", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  override def prettyName: String = "text_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }
  @transient private lazy val profileSets
      : Array[java.util.HashSet[String]] =
    profiles.map { m =>
      val s = new java.util.HashSet[String]()
      m.foreach(s.add)
      s
    }.toArray

  /** Reference-object doGenCode keeps the surrounding projection in one
    * whole-stage-codegen span (CodegenFallback would split it). */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textStatsExpr", this,
      classOf[TextStats].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)" +
        s" $ref.nullSafeEval($c);"
    })
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val tokens = text.split("\\s+", -1)
    var sumLen = 0L
    var nStop = 0
    val scores = new Array[Int](profileSets.length)
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      // code points, matching Spark length() (UTF8String.numChars) —
      // computed allocation-free instead of re-encoding to UTF8String
      sumLen += t.codePointCount(0, t.length)
      if (stopSet.contains(t)) nStop += 1
      var p = 0
      while (p < scores.length) {
        if (profileSets(p).contains(t)) scores(p) += 1
        p += 1
      }
      i += 1
    }
    InternalRow(tokens.length, sumLen, nStop,
      new GenericArrayData(scores.map(Integer.valueOf)): ArrayData)
  }

  override protected def withNewChildInternal(c: Expression): TextStats =
    copy(child = c)
}
