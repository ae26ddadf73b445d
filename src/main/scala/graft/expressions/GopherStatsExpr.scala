package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused Gopher quality report — the compiled form of
  * [[graft.operators.Curation.gopherReport]]'s nine sorted-fold
  * composition.
  *
  * The composed form's `aggregate` folds evaluate INTERPRETED (no
  * whole-stage codegen for higher-order functions): ~10 µs per fold
  * step with per-element struct allocation, measured ~3.5 ms/row on
  * multi-line documents — the dominant cost of the composed quality
  * gate (c2). This expression computes the identical 14 metrics in one
  * compiled pass with primitive counters and hash-map run counting
  * (grouping needs no sort; the top-gram tie-break compares UTF-8
  * bytes, the same binary order `array_sort` and DuckDB use).
  *
  * Exact-parity notes (every value must hash-match the composed form
  * and the t10 DuckDB oracle):
  *  - tokenization: `split(trim(t), "\\s+")` on the space-trimmed
  *    (0x20-only, UTF8String.trim) text, empties dropped; word lengths
  *    in CODE POINTS of the UNlowered token (alpha check also on the
  *    unlowered token — Kelvin sign lowercases to ASCII 'k');
  *    stopwords/grams over per-token UTF8String.toLowerCase.
  *  - '#'/'…' counts are code-point counts over the untrimmed text;
  *    '...' counts non-overlapping occurrences (the replace() diff).
  *  - lines: split on '\n', each space-trimmed, empties dropped.
  *  - fractions: round(·, 6) replicating Spark's Round (HALF_UP over
  *    BigDecimal.valueOf), 0.0 (never null) on empty denominators.
  */
object GopherStatsExpr {
  def gopherStats(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    // the composed form coalesces first; doing it OUTSIDE the native
    // expression keeps the child non-null so nullSafeEval suffices
    ColumnBridge.column(
      GopherStats(ColumnBridge.expression(coalesce(text, lit("")))))
  }
}

case class GopherStats(child: Expression, stopwords: Seq[String] =
    graft.operators.Curation.gopherStopwords) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("word_count", LongType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("symbol_word_ratio", DoubleType, nullable = false),
    StructField("bullet_line_frac", DoubleType, nullable = false),
    StructField("ellipsis_line_frac", DoubleType, nullable = false),
    StructField("alpha_word_frac", DoubleType, nullable = false),
    StructField("stopword_hits", LongType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("top_2gram_char_frac", DoubleType, nullable = false),
    StructField("top_3gram_char_frac", DoubleType, nullable = false),
    StructField("top_4gram_char_frac", DoubleType, nullable = false),
    StructField("dup_5gram_char_frac", DoubleType, nullable = false),
    StructField("dup_10gram_char_frac", DoubleType, nullable = false)))

  override def prettyName: String = "gopher_stats"

  @transient private lazy val stopArr: Array[String] = stopwords.toArray

  /** Reference-object doGenCode keeps the surrounding projection in one
    * whole-stage-codegen span (CodegenFallback would split it). */
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherStatsExpr", this,
      classOf[GopherStats].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)" +
        s" $ref.nullSafeEval($c);"
    })
  }

  // Spark Round semantics for doubles (RoundBase, HALF_UP)
  private def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def frac(num: Double, den: Long): Double =
    if (den == 0L) 0.0 else round6(num / den)

  /** UTF-8 byte order — what array_sort/DuckDB compare strings by;
    * differs from String.compareTo for supplementary characters. */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** (dup_chars, top_cnt * numChars(top_item)) over a gram multiset:
    * dup = Σ count·len for grams occurring ≥ 2×; top ties break to the
    * UTF-8-smallest gram — identical to the composed sortedRunStats
    * over a binary-sorted array. */
  private def gramStats(counts: java.util.HashMap[String, Int])
      : (Long, Long) = {
    var dup = 0L
    var topCnt = 0
    var topItem: String = null
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val g = e.getKey; val c = e.getValue
      val len = g.codePointCount(0, g.length).toLong
      if (c >= 2) dup += c * len
      if (c > topCnt || (c == topCnt &&
          (topItem == null || utf8Less(g, topItem)))) {
        topCnt = c; topItem = g
      }
    }
    if (topItem == null) (0L, 0L)
    else (dup,
      topCnt.toLong * topItem.codePointCount(0, topItem.length))
  }

  private def countOccurrences(s: String, sub: String): Long = {
    var n = 0L; var i = s.indexOf(sub)
    while (i >= 0) { n += 1; i = s.indexOf(sub, i + sub.length) }
    n
  }

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String]
    val t = raw.toString
    // ---- words (composed: split(trim(t), "\\s+") minus empties) ----
    val trimmed = raw.trim().toString
    val split0 = trimmed.split("\\s+", -1)
    var wc = 0L; var sumLen = 0L; var nAlpha = 0L
    val lowered = new java.util.ArrayList[String](split0.length)
    var i = 0
    while (i < split0.length) {
      val w = split0(i)
      if (w.nonEmpty) {
        wc += 1
        sumLen += w.codePointCount(0, w.length)
        var hasAlpha = false
        var j = 0
        while (!hasAlpha && j < w.length) {
          val ch = w.charAt(j)
          if ((ch >= 'A' && ch <= 'Z') || (ch >= 'a' && ch <= 'z'))
            hasAlpha = true
          j += 1
        }
        if (hasAlpha) nAlpha += 1
        lowered.add(UTF8String.fromString(w).toLowerCase.toString)
      }
      i += 1
    }
    val meanLen = frac(sumLen.toDouble, wc)
    // ---- symbols over the UNtrimmed text ----
    val nHash = countOccurrences(t, "#")
    val nEll3 = countOccurrences(t, "...")
    val nEllU = countOccurrences(t, "…")
    val symbolRatio = frac((nHash + nEll3 + nEllU).toDouble, wc)
    // ---- lines ----
    val lines0 = t.split("\n", -1)
    var nl = 0L; var nBullet = 0L; var nEllLine = 0L; var lineChars = 0L
    val lineCounts = new java.util.HashMap[String, Int]()
    i = 0
    while (i < lines0.length) {
      val l = UTF8String.fromString(lines0(i)).trim().toString
      if (l.nonEmpty) {
        nl += 1
        if (l.startsWith("-") || l.startsWith("*") || l.startsWith("•"))
          nBullet += 1
        if (l.endsWith("...") || l.endsWith("…")) nEllLine += 1
        lineChars += l.codePointCount(0, l.length)
        lineCounts.merge(l, 1, Integer.sum)
      }
      i += 1
    }
    val bulletFrac = frac(nBullet.toDouble, nl)
    val ellipsisFrac = frac(nEllLine.toDouble, nl)
    val alphaFrac = frac(nAlpha.toDouble, wc)
    val dupLineFrac =
      if (nl == 0L) 0.0 else round6(1.0 - lineCounts.size().toDouble / nl)
    val (dupLineChars, _) = gramStats(lineCounts)
    val dupLineCharFrac = frac(dupLineChars.toDouble, lineChars)
    // ---- stopword hits (distinct membership over lowered words) ----
    var stopHits = 0L
    var s = 0
    while (s < stopArr.length) {
      if (lowered.contains(stopArr(s))) stopHits += 1
      s += 1
    }
    // ---- n-gram stats over the lowered words ----
    // denomG = numChars(join(ws, " ")) = Σ numChars + (wc-1), when wc>0
    var denomG = 0L
    i = 0
    while (i < lowered.size()) {
      val w = lowered.get(i)
      denomG += w.codePointCount(0, w.length)
      i += 1
    }
    if (wc > 0L) denomG += wc - 1
    def gramFracs(n: Int): (Double, Double) = {
      val m = lowered.size() - n + 1
      if (m <= 0) (0.0, 0.0)
      else {
        val counts = new java.util.HashMap[String, Int](m * 2)
        val sb = new java.lang.StringBuilder()
        var a = 0
        while (a < m) {
          sb.setLength(0)
          var b = 0
          while (b < n) {
            if (b > 0) sb.append(' ')
            sb.append(lowered.get(a + b))
            b += 1
          }
          counts.merge(sb.toString, 1, Integer.sum)
          a += 1
        }
        val (dup, topMass) = gramStats(counts)
        (frac(topMass.toDouble, denomG), frac(dup.toDouble, denomG))
      }
    }
    val (top2, _) = gramFracs(2)
    val (top3, _) = gramFracs(3)
    val (top4, _) = gramFracs(4)
    val (_, dup5) = gramFracs(5)
    val (_, dup10) = gramFracs(10)
    InternalRow(wc, meanLen, symbolRatio, bulletFrac, ellipsisFrac,
      alphaFrac, stopHits, dupLineFrac, dupLineCharFrac, top2, top3,
      top4, dup5, dup10)
  }

  override protected def withNewChildInternal(c: Expression): GopherStats =
    copy(child = c)
}
