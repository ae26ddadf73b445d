package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The GPT-2 byte↔unicode bijection (Radford et al. 2019; the
  * `bytes_to_unicode` table every byte-level BPE tokenizer ships —
  * GPT-2/3/4, RoBERTa, LLaMA). Each of the 256 byte values maps to one
  * printable BMP code point: bytes that are already printable Latin-1
  * ([33,126] ∪ [161,172] ∪ [174,255]) map to themselves; the 68
  * remaining bytes (controls, space, DEL, soft hyphen) shift to
  * 256+n in ascending byte order. The map makes ARBITRARY bytes — any
  * UTF-8 text, in any language, with no [UNK] escape hatch — look like
  * a plain string of 256 distinct characters, which is exactly what
  * lets the existing char-level BPE trainer/encoder run unchanged over
  * the byte alphabet ([[graft.operators.ByteBpe]]).
  *
  * `byte_map_encode` is the pre-tokenizer hop (UTF-8 bytes → mapped
  * chars, output length = byte count of the input); `byte_map_decode`
  * is its exact inverse (mapped chars → original bytes). Both are
  * codegen'd scalar expressions — map-only, shuffle-free, linear in
  * the input, so at 100 TB they run at parquet-read speed inside the
  * same whole-stage-codegen span as the surrounding projection.
  */
object ByteMap {
  /** byteToChar(b) = the mapped code point for byte value b ∈ [0,255].
    * Printable Latin-1 bytes keep their value; the rest take 256+n in
    * ascending byte order — the public GPT-2 assignment. */
  private[graft] val byteToChar: Array[Int] = {
    val out = new Array[Int](256)
    var shift = 0
    var b = 0
    while (b < 256) {
      val printable = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) ||
        (b >= 174 && b <= 255)
      if (printable) out(b) = b
      else { out(b) = 256 + shift; shift += 1 }
      b += 1
    }
    out
  }

  /** charToByte(cp) = the byte for mapped code point cp, or -1 when cp
    * is not in the map's image (an input that was never produced by
    * [[byteToChar]] — a contract violation decode fails loudly on).
    * Image ⊆ [0, 324), so a flat array lookup suffices. */
  private[graft] val charToByte: Array[Int] = {
    val out = Array.fill(324)(-1)
    var b = 0
    while (b < 256) { out(byteToChar(b)) = b; b += 1 }
    out
  }

  def byteMapEncode(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ByteMapEncodeExpr(ColumnBridge.expression(text)))
  }

  def byteMapDecode(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ByteMapDecodeExpr(ColumnBridge.expression(text)))
  }
}

sealed trait ByteMapLike extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    // NullType accepted: NULL evaluates to NULL through the null-safe
    // path, matching Spark's built-in string functions
    if (child.dataType.isInstanceOf[StringType] ||
        child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  /** Reference-object doGenCode keeps the surrounding projection in one
    * whole-stage-codegen span (the [[NfcNormalizeExpr]] pattern). */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteMapExpr", this,
      getClass.getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) " +
        s"$ref.nullSafeEval($c);"
    })
  }
}

/** UTF-8 bytes of the input → one mapped char per byte. Output length
  * (in chars) = input length in bytes; pure ASCII-printable input maps
  * to itself. */
case class ByteMapEncodeExpr(child: Expression) extends ByteMapLike {
  override def prettyName: String = "byte_map_encode"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // every mapped code point is < 0x144 so the output is 1-2 UTF-8
    // bytes per input byte; build via char array (all BMP, no surrogates)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(ByteMap.byteToChar(bytes(i) & 0xff).toChar)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression)
      : ByteMapEncodeExpr = copy(child = c)
}

/** Exact inverse of [[ByteMapEncodeExpr]]: each mapped char → its
  * original byte; the byte sequence is returned as a string. Decoding a
  * COMPLETE encoded word (or any concatenation of complete words)
  * always yields valid UTF-8; decoding a fragment that splits a
  * multi-byte character mid-sequence is the caller's contract to avoid
  * (same as every byte-level tokenizer's detokenizer). A code point
  * outside the map's image means the input was never byte-mapped —
  * that is corruption, and it fails loudly rather than guessing. */
case class ByteMapDecodeExpr(child: Expression) extends ByteMapLike {
  override def prettyName: String = "byte_map_decode"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.charAt(i).toInt
      val b = if (cp < 324) ByteMap.charToByte(cp) else -1
      if (b < 0) throw new IllegalArgumentException(
        s"byte_map_decode: code point U+${cp.toHexString.toUpperCase} " +
          "is not in the byte-map image — the input is not a " +
          "byte_map_encode output")
      out(i) = b.toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def withNewChildInternal(c: Expression)
      : ByteMapDecodeExpr = copy(child = c)
}
