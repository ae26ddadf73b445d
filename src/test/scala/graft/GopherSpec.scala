package graft

import graft.operators.Curation
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Hand-computed cases for the Gopher quality-rule report: every metric
  * is checked against arithmetic done on paper, including the run-fold
  * paths (dup chars, top-gram argmax with its lexicographic tie-break)
  * that a naive distinct-count test would not distinguish. */
class GopherSpec extends SparkSpec {
  import spark.implicits._

  private def report(text: String): Row = {
    val df = Seq(Tuple1(text)).toDF("text")
      .select(Curation.gopherReport(col("text")).as("g"))
    df.select(col("g.*")).collect()(0)
  }

  test("word/char basics: counts, mean length, symbol ratio") {
    // 4 words, lens 3+2+5+1 = 11 -> mean 2.75; one '#', one '...',
    // one unicode ellipsis -> 3 symbols / 4 words = 0.75
    val r = report("the be... #hello …")
    assert(r.getAs[Long]("word_count") === 4L)
    // tokens: "the"(3) "be..."(5) "#hello"(6) "…"(1) -> 15/4 = 3.75
    assert(r.getAs[Double]("mean_word_len") === 3.75)
    assert(r.getAs[Double]("symbol_word_ratio") === 0.75)
    assert(r.getAs[Long]("stopword_hits") === 1L) // "the" ("be..." != "be")
  }

  test("line metrics: bullets, ellipsis ends, dup lines by count and chars") {
    // 5 non-empty trimmed lines: "- a", "* b", "hello...", "x", "x"
    val r = report("- a\n* b\nhello...\nx\n  \nx")
    assert(r.getAs[Double]("bullet_line_frac") === 0.4)   // 2/5
    assert(r.getAs[Double]("ellipsis_line_frac") === 0.2) // 1/5
    // distinct lines = 4 of 5 -> dup_line_frac = 0.2
    assert(r.getAs[Double]("dup_line_frac") === 0.2)
    // chars: 3+3+8+1+1 = 16; duplicated line "x" twice -> 2 chars
    assert(r.getAs[Double]("dup_line_char_frac") === 0.125)
  }

  test("alpha fraction and empty/null safety") {
    val r = report("abc 123 4d 56")
    assert(r.getAs[Double]("alpha_word_frac") === 0.5) // abc, 4d
    for (t <- Seq("", "   ")) {
      val e = report(t)
      assert(e.getAs[Long]("word_count") === 0L)
      assert(e.getAs[Double]("mean_word_len") === 0.0)
      assert(e.getAs[Double]("dup_line_frac") === 0.0)
      assert(e.getAs[Double]("top_2gram_char_frac") === 0.0)
      assert(e.getAs[Double]("dup_5gram_char_frac") === 0.0)
    }
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("text")
      .select(Curation.gopherReport(col("text")).as("g")).select("g.*")
      .collect()(0)
    assert(n.getAs[Long]("word_count") === 0L)
    assert(n.getAs[Double]("symbol_word_ratio") === 0.0)
  }

  test("top-2gram char fraction: count argmax, count ties -> lex smallest") {
    // words: b a b a z b a  -> 2-grams: "b a","a b","b a","a z","z b","b a"
    // counts: "b a"=3, "a b"=1, "a z"=1, "z b"=1 -> top "b a" (3*3 chars)
    // denom = len("b a b a z b a") = 13 -> 9/13 = 0.692308
    val r = report("b a b a z b a")
    assert(r.getAs[Double]("top_2gram_char_frac") === 0.692308)
    // tie case: "c d c d" -> "c d"=2... no tie; use "x y z x y" ->
    // grams: "x y"(2), "y z"(1), "z x"(1) -> top is "x y" by count.
    // True tie: "b c a b c" -> "b c"=2, "c a"=1, "a b"=1 -> no tie.
    // Construct tie: "a b x a b y a b" has "a b"=3 unique max.
    // "p q r p q r" -> "p q"=2, "q r"=2, "r p"=1: tie 2 vs 2 ->
    // lexicographically smallest of {"p q","q r"} = "p q".
    // denom = len("p q r p q r") = 11 -> 2*3/11 = 0.545455
    val t = report("p q r p q r")
    assert(t.getAs[Double]("top_2gram_char_frac") === 0.545455)
  }

  test("dup-5gram char fraction: doubled text repeats every window") {
    // 6 distinct words doubled -> 12 words, 8 5-grams, the 2 windows
    // spanning the seam are unique, the 6 others pair up into 3
    // duplicated gram values... compute exactly instead:
    // words: w1..w6 w1..w6; 5-grams at positions 1..8; gram(i)=gram(i+6)
    // only for i<=2 -> grams 1,2 dup with 7,8. So 4 windows in dup sets.
    // each gram = 5 words of len 2 + 4 spaces = 14 chars -> dup_chars=4*14=56
    // denom = 12 words * 2 chars + 11 spaces = 35
    val words = Seq("w1", "w2", "w3", "w4", "w5", "w6")
    val text = (words ++ words).mkString(" ")
    val r = report(text)
    assert(r.getAs[Double]("dup_5gram_char_frac") === math.rint(56.0 / 35 * 1e6) / 1e6)
    // and a no-repetition text scores 0
    assert(report("q w e r t y u i o p").getAs[Double]("dup_5gram_char_frac") === 0.0)
  }

  test("fused gopherReportFused equals the composed report " +
      "field-for-field on adversarial inputs") {
    val cases: Seq[String] = Seq(
      null,
      "",
      "   ",
      "\n\n\n",
      "the be... #hello …",
      "- a\n* b\nhello...\nx\n  \nx",
      // tie-break: two grams at equal count — binary-smallest must win
      "b a b a c a b a",
      // multi-line with dup lines and bullets, unicode bullet
      "• uni bullet\n- dash\nsame line\nsame line\nsame line\nend...",
      // unicode: Kelvin sign (lowercases to ASCII k), Turkish dotted
      // capital İ (lowercase adds a combining mark → length changes),
      // supplementary plane chars (UTF-8 vs UTF-16 sort order differs)
      "K elvin the İstanbul 😀gram 😀gram zz zz",
      // tabs/CR whitespace runs, '#' density, overlapping dots "....",
      "a\tb\r\nc....d ## the of and that",
      // long repetitive doc exercising every fold
      (1 to 40).map(i => s"tok${i % 7}").mkString(" ") + "\n" +
        (1 to 40).map(i => s"tok${i % 5}").mkString(" "))
    val df = cases.zipWithIndex
      .map { case (t, i) => (i, t) }.toDF("i", "text")
    val both = df.select(col("i"),
        Curation.gopherReport(col("text")).as("c"),
        Curation.gopherReportFused(col("text")).as("f"))
      .orderBy(col("i")).collect()
    both.foreach { r =>
      val c = r.getStruct(1); val f = r.getStruct(2)
      assert(c === f, s"case ${r.getInt(0)}: composed=$c fused=$f " +
        s"(input=${cases(r.getInt(0))})")
    }
    // and the pass decision agrees everywhere
    val passes = df.select(
        Curation.gopherPass(Curation.gopherReport(col("text"))).as("c"),
        Curation.gopherPass(Curation.gopherReportFused(col("text")))
          .as("f"))
      .collect()
    passes.foreach(r => assert(r.get(0) === r.get(1)))
  }

  test("gopherPass: a clean passing doc and each failing rule") {
    // passing doc: 60 distinct-ish words with stopwords, reasonable lens
    val good = (1 to 52).map(i => s"word${i}xx").mkString(
      "the quick be brown to of and that have with ", " ", "")
    val g = Seq(Tuple1(good)).toDF("text")
      .select(Curation.gopherReport(col("text")).as("g"))
      .select(Curation.gopherPass(col("g")).as("p")).as[Boolean].collect()(0)
    assert(g === true)
    def pass(t: String): Boolean =
      Seq(Tuple1(t)).toDF("text")
        .select(Curation.gopherPass(Curation.gopherReport(col("text"))).as("p"))
        .as[Boolean].collect()(0)
    assert(!pass("too short to pass the word count rule"))
    // symbol-heavy doc fails
    assert(!pass(good + " " + Seq.fill(20)("#").mkString(" ")))
    // doubled text fails the dup-gram rules
    assert(!pass(good + " " + good))
  }
}
