package graft

import graft.functions.{Cleansing => C}
import org.apache.spark.sql.functions._

/** Seeded fuzz over the coerce-style cleaners (SURVEY §5: parse
  * robustness for F10/F12): arbitrary garbage must never throw, must
  * yield null-or-valid, and canonical inputs must round-trip. */
class FuzzSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260812L)
  private def randString(n: Int): String = {
    val alphabet = "0123456789abcXYZ ₹$,.-/:% \t" + "Rs"
    (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
  }

  test("cleanNumeric/cleanPrice: never throw, null-or-valid on garbage") {
    val inputs = (1 to 500).map(_ => randString(rnd.nextInt(14))) ++
      Seq(null, "", "₹", "-", ".", "--5", "1.2.3", "1e5", "  12,34.50  ")
    val out = strDf(inputs)
      .select(C.cleanNumeric(col("v")).cast("double").as("n"),
        C.cleanPrice(col("v")).cast("double").as("p"))
      .collect()
    out.foreach { r =>
      if (!r.isNullAt(0)) assert(r.getDouble(0) >= 0) // negatives rejected
      if (!r.isNullAt(1)) {
        assert(r.getDouble(1) > 0 && r.getDouble(1) <= 100000)
      }
    }
    // canonical decimal strings parse exactly
    val canon = strDf(Seq("1234.56", "₹1,234.56", "$ 0.01"))
      .select(C.cleanNumeric(col("v")).cast("double").as("n")).collect()
    assert(canon.map(_.getDouble(0)).toSeq === Seq(1234.56, 1234.56, 0.01))
  }

  test("parseDateMulti: garbage -> null; every supported format round-trips") {
    val garbage = (1 to 300).map(_ => randString(rnd.nextInt(12)))
    val g = strDf(garbage)
      .select(C.parseDateMulti(col("v")).as("d")).collect()
    g.foreach { r =>
      if (!r.isNullAt(0)) {
        val y = r.getDate(0).toLocalDate.getYear
        assert(y >= 0 && y <= 9999) // parsed => a sane date, no throw
      }
    }
    // round-trip: format a known date through each supported pattern
    val date = java.time.LocalDate.of(2024, 3, 7)
    val javaPatterns = Seq("yyyy-MM-dd", "yyyy/MM/dd", "dd-MM-yyyy",
      "dd/MM/yyyy", "yyyyMMdd")
    val formatted = javaPatterns.map(p =>
      date.format(java.time.format.DateTimeFormatter.ofPattern(p)))
    val rt = strDf(formatted)
      .select(C.parseDateMulti(col("v")).cast("string").as("d")).collect()
    assert(rt.map(_.getString(0)).toSeq ===
      Seq.fill(javaPatterns.size)("2024-03-07"))
  }

  test("TextStats fused ≡ composed on random text incl unicode edges") {
    import graft.operators.{TextAnalysis => TA}
    val alphabet = "ab cd the le der 09!?\t\né中  "
    def randText(): String =
      (0 until rnd.nextInt(60)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    val inputs = (1 to 400).map(_ => randText()) ++
      Seq(null, "", " ", "\t\n", "the", "中文 été")
    val docs = strDf(inputs).withColumn("id",
      monotonically_increasing_id())
    val t = col("v")
    val composed = docs.select(col("id"),
      TA.tokenCountWs(t).as("n"), TA.meanTokenLen(t).as("ml"),
      TA.stopwordRatio(t).as("sr"), TA.langId(t).as("l"))
      .orderBy("id").collect()
    val fused = docs.withColumn("__st", TA.textStats(t))
      .select(col("id"),
        TA.tokenCountWsS(t, col("__st")).as("n"),
        TA.meanTokenLenS(t, col("__st")).as("ml"),
        TA.stopwordRatioS(t, col("__st")).as("sr"),
        TA.langIdS(t, col("__st")).as("l"))
      .orderBy("id").collect()
    assert(composed.toSeq === fused.toSeq)
  }

  test("HyperplaneBuckets fused ≡ composed on random vectors incl zeros") {
    import graft.operators.Similarity
    import spark.implicits._
    val vecs: Seq[Seq[Double]] =
      (1 to 200).map(_ => Seq.fill(16)(rnd.nextDouble() * 2 - 1)) ++
        Seq(Seq.fill(16)(0.0), Seq.fill(16)(1e-300), Seq.fill(16)(-1.0))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")
    val both = df.select(col("id"),
      Similarity.multiProbeBuckets(col("vec"), 16, 10, 7L, 4).as("n"),
      Similarity.multiProbeBucketsComposed(col("vec"), 16, 10, 7L, 4)
        .as("c"))
    assert(both.filter(not(col("n") === col("c"))).count() === 0)
  }

  test("extractHrefs/anchorTexts: arbitrary tag soup never throws, outputs stay well-formed") {
    import graft.operators.WebGraph
    import spark.implicits._
    val soup = "<a> href = \" ' </a><A HREF='>\"<ahref<<>> =”中🙂"
    val htmls = (1 to 300).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => soup(rnd.nextInt(soup.length)))
        .mkString
    } ++ Seq(null, "", "<a href=", "<a href=\"unterminated",
      "<a href=''></a>", "<a\thref='x'>t</a>")
    val df = htmls.zipWithIndex.map { case (h, i) =>
      (s"https://h$i.com/p", h) }.toDF("url", "html")
    // no throw, and every emitted href/anchor obeys its charset rule
    val hrefs = df.select(explode(WebGraph.extractHrefs(col("html")))
      .as("h")).collect().map(_.getString(0))
    hrefs.foreach(h => assert(!h.contains("\"") || !h.contains("'")))
    val anchors = WebGraph.anchorTexts(df, "url", "html").collect()
    anchors.foreach { r =>
      assert(r.getString(1).nonEmpty && !r.getString(1).contains("<"))
      assert(r.getLong(2) >= 1)
    }
  }

  test("unigram Viterbi: random unicode words always cover the word exactly, never throw") {
    import graft.operators.Unigram
    import spark.implicits._
    val alphabet = "abé中🙂x "
    val words = (1 to 300).map { _ =>
      val cps = (0 until rnd.nextInt(12)).map { _ =>
        alphabet.codePointAt(
          alphabet.offsetByCodePoints(0,
            rnd.nextInt(alphabet.codePointCount(0, alphabet.length))))
      }
      cps.map(Character.toChars(_).mkString).mkString.trim
    }.filter(_.nonEmpty) ++ Seq("🙂🙂🙂", "中a中")
    val vocab = Seq("a" -> 900000L, "b" -> 1200000L, "ab" -> 1400000L,
      "中" -> 2000000L, "é" -> 1500000L)
    val out = Unigram.encodeWords(words.distinct.toDF("word"), "word",
      vocab, unkCostMu = 9000000L).collect()
    out.foreach { r =>
      val w = r.getString(0)
      val pieces = r.getSeq[String](1)
      assert(pieces.mkString === w, s"cover broke on '$w'")
      assert(r.getInt(2) === pieces.size)
      // every piece is whole code points — no lone surrogates ever
      pieces.foreach { p =>
        assert(!Character.isLowSurrogate(p.charAt(0)))
        assert(!Character.isHighSurrogate(p.charAt(p.length - 1)))
      }
    }
  }

  test("byte map: decode(encode(x)) == x on random unicode from five " +
      "scripts incl. astral code points") {
    import graft.expressions.ByteMap
    val alphabet = "ab Z9é中д😀ह\tÿ"
    val strings = (1 to 400).map { _ =>
      val cps = (0 until rnd.nextInt(20)).map { _ =>
        alphabet.codePointAt(
          alphabet.offsetByCodePoints(0,
            rnd.nextInt(alphabet.codePointCount(0, alphabet.length))))
      }
      cps.map(Character.toChars(_).mkString).mkString
    }.distinct
    val got = strDf(strings)
      .select(col("v"),
        ByteMap.byteMapDecode(ByteMap.byteMapEncode(col("v"))).as("rt"),
        length(ByteMap.byteMapEncode(col("v"))).as("n_chars"),
        octet_length(col("v")).as("n_bytes"))
      .collect()
    got.foreach { r =>
      assert(r.getString(1) === r.getString(0),
        s"round-trip broke on '${r.getString(0)}'")
      // one mapped char per UTF-8 byte — the length contract
      assert(r.getInt(2) === r.getInt(3))
    }
  }

  test("WordPiece greedy encode: reconstruction invariant on random words/vocabs") {
    import graft.operators.WordPiece
    import spark.implicits._
    // random vocab over a small alphabet (so matches actually occur),
    // always including the single-char coverage of that alphabet in
    // both forms; random words over a SUPERSET alphabet so [UNK] paths
    // fire too
    val alpha = "abc"
    val wordAlpha = "abcxy" // x, y not in vocab -> UNK opportunities
    for (round <- 1 to 5) {
      val multis = (1 to 20).map { _ =>
        val len = rnd.nextInt(3) + 2
        val body = (0 until len)
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        if (rnd.nextBoolean()) body else "##" + body
      }.distinct
      val vocab = (alpha.map(_.toString) ++
        alpha.map(c => s"##$c") ++ multis).distinct
      val words = (1 to 200).map { _ =>
        (0 until rnd.nextInt(10) + 1)
          .map(_ => wordAlpha(rnd.nextInt(wordAlpha.length))).mkString
      }.distinct
      val out = WordPiece.encodeWords(words.toDF("word"), "word", vocab)
        .collect()
      out.foreach { r =>
        val w = r.getString(0)
        val pieces = r.getSeq[String](1)
        val unk = r.getBoolean(3)
        assert(r.getInt(2) === pieces.length)
        if (unk) {
          // whole-word UNK, partial matches discarded; and the word
          // genuinely contains an out-of-vocab char
          assert(pieces === Seq("[UNK]"), s"$w: $pieces")
          assert(w.exists(c => c == 'x' || c == 'y'), s"$w should encode")
        } else {
          // reconstruction: pieces minus markers concatenate to the word
          val rebuilt = pieces.zipWithIndex.map { case (p, i) =>
            if (i == 0) p else p.stripPrefix("##") }.mkString
          assert(rebuilt === w, s"$w != $rebuilt via $pieces")
          // form correctness: first piece plain, rest continuation
          assert(!pieces.head.startsWith("##") || w.startsWith("##"))
          pieces.drop(1).foreach(p => assert(p.startsWith("##"), s"$w: $p"))
        }
      }
    }
  }

  test("normalizeKey/cleanText: idempotent under re-application") {
    val inputs = (1 to 200).map(_ => randString(rnd.nextInt(20))) :+ null
    val out = strDf(inputs).select(
      C.normalizeKey(col("v")).as("k1"),
      C.normalizeKey(C.normalizeKey(col("v"))).as("k2"),
      C.cleanText(col("v")).as("t1"),
      C.cleanText(C.cleanText(col("v"))).as("t2")).collect()
    out.foreach { r =>
      assert(Option(r.getString(0)) === Option(r.getString(1)))
      assert(Option(r.getAs[String]("t1")) === Option(r.getAs[String]("t2")))
    }
  }
}
