package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization — the canonical-composition pass a
  * multilingual ingest runs before ANY hash-keyed operator touches the
  * text. The same visible string has multiple byte encodings ("é" as
  * U+00E9 vs "e" + combining U+0301); exact dedup, MinHash shingles,
  * token counts, and dictionary joins all key on BYTES, so a corpus
  * mixing encodings silently splits identical documents apart. NFC is
  * the W3C-recommended storage form; both the JDK (java.text.Normalizer,
  * Unicode UAX #15) and DuckDB (nfc_normalize) implement the identical
  * public algorithm, which is what makes the f29 gate hash-pinnable
  * cross-engine.
  *
  * Fast path: isNormalized (a scan, no allocation) short-circuits the
  * common already-NFC case and returns the INPUT UTF8String untouched.
  */
object NfcNormalize {
  def nfcNormalize(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(text)))
  }
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  // analysis-time type check: without it the SQL-injected function
  // accepts any argument and dies in the executor with a
  // ClassCastException instead of a clear AnalysisException.
  // (ExpectsInputTypes would be idiomatic, but AbstractDataType is
  // private[sql] at the Scala level — inaccessible to a library.)
  override def checkInputDataTypes(): TypeCheckResult =
    // NullType stays accepted: nfc_normalize(NULL) evaluates to NULL
    // through the null-safe path, matching Spark's built-in string
    // functions (which implicitly cast NullType)
    if (child.dataType.isInstanceOf[StringType] ||
        child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType}")
  override def prettyName: String = "nfc_normalize"

  /** Reference-object doGenCode keeps the surrounding projection in one
    * whole-stage-codegen span (the [[PortableSimHashSig]] pattern). */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalizeExpr", this,
      classOf[NfcNormalizeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) " +
        s"$ref.nullSafeEval($c);"
    })
  }

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s,
        java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression)
      : NfcNormalizeExpr = copy(child = c)
}
