package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused signed-feature-hash embedding — one compiled pass per row:
  * tokenize, two md5 draws per token, bucket-sum into a local long[dim],
  * L2-normalize. Semantics are EXACTLY the composed Column formulation
  * in [[graft.operators.Similarity.hashEmbedComposed]] (explode → two
  * narrow shuffles → map rebuild → normalize fold) — spec-pinned
  * bit-for-bit — but the plan is MAP-ONLY: no explode, no shuffle, no
  * interpreted lambda walk. Measured at 5M docs / 114M tokens, the
  * composed path spent 408 s and 32 GB of spill shuffling (id, bucket)
  * rows; the scan this replaces it with is bounded by md5 throughput.
  * The [[GopherStatsExpr]] lesson, applied to embeddings.
  *
  * Arithmetic parity contract (what the emb1 oracle replays):
  * tokens = split(lower(trim(text)), "\\s+") minus empties — evaluated
  * here via UTF8String.trim/toLowerCase (the same kernels Spark's
  * `trim`/`lower` call); bucket = md5("heb|<seed>|" + w)[0,8) as
  * unsigned32 mod dim; sign = md5("hes|<seed>|" + w)[0,8) even → +1
  * else −1; cells accumulate as exact longs; norm = left fold of
  * x*x in index order; each element divides by sqrt(norm); all-zero
  * stays all-zero. */
object HashEmbed {
  def hashEmbedVec(text: Column, dim: Int, seed: String): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      HashEmbedExpr(ColumnBridge.expression(text), dim, seed))
  }
}

case class HashEmbedExpr(child: Expression, dim: Int, seed: String)
    extends UnaryExpression {
  require(dim >= 1, s"hash_embed: dim must be >= 1, got $dim")

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] ||
        child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash_embed requires a string argument, got ${child.dataType}")

  override def prettyName: String = "hash_embed"

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  @transient private lazy val bucketPrefix =
    s"heb|$seed|".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  @transient private lazy val signPrefix =
    s"hes|$seed|".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** First 8 md5 hex chars of (prefix ++ token) as an unsigned 32-bit
    * value — the exact `conv(substring(md5(concat(...)), 1, 8), 16,
    * 10)` the composed path computes. */
  private def draw32(prefix: Array[Byte], token: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    d.update(prefix)
    d.update(token)
    val h = d.digest()
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  override def nullSafeEval(input: Any): Any = {
    // UTF8String.trim strips 0x20 only and toLowerCase is the kernel
    // Spark's lower() calls — byte-for-byte the composed tokenization
    val s = input.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val cells = new Array[Long](dim)
    var any = false
    var start = 0
    val n = s.length
    while (start < n) {
      // manual \s+ scan: Java regex \s = [ \t\n\x0B\f\r]
      def isWs(c: Char): Boolean =
        c == ' ' || c == '\t' || c == '\n' || c.toInt == 0x0B ||
          c == '\f' || c == '\r'
      while (start < n && isWs(s.charAt(start))) start += 1
      var end = start
      while (end < n && !isWs(s.charAt(end))) end += 1
      if (end > start) {
        val tok = s.substring(start, end)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val b = (draw32(bucketPrefix, tok) % dim).toInt
        val sign = if (draw32(signPrefix, tok) % 2 == 0) 1L else -1L
        cells(b) += sign
        any = true
      }
      start = end
    }
    val out = new Array[Double](dim)
    if (any) {
      var i = 0
      var ss = 0.0
      while (i < dim) {
        val x = cells(i).toDouble
        out(i) = x
        ss += x * x
        i += 1
      }
      val nrm = math.sqrt(ss)
      if (nrm > 0.0) {
        i = 0
        while (i < dim) { out(i) = out(i) / nrm; i += 1 }
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashEmbedExpr", this,
      classOf[HashEmbedExpr].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$ref.nullSafeEval($c);"
    })
  }

  override protected def withNewChildInternal(c: Expression)
      : HashEmbedExpr = copy(child = c)
}
