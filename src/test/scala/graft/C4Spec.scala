package graft

import graft.operators.Curation
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Hand-computed cases for the C4 line-level cleaner. */
class C4Spec extends SparkSpec {
  import spark.implicits._

  private def clean(text: String, minLineWords: Int = 3,
      minLines: Int = 5): Row =
    Seq(Tuple1(text)).toDF("text")
      .select(Curation.c4LineClean(col("text"), minLineWords, minLines)
        .as("c"))
      .select(col("c.*")).collect()(0)

  test("line rules: terminal punctuation, word count, javascript") {
    val doc = Seq(
      "this line survives the filter.",  // kept
      "no terminal punctuation here",    // dropped: no . ! ? "
      "too short.",                      // dropped: 2 words < 3
      "enable javascript to continue.",  // dropped: javascript
      "is this a kept question?",        // kept
      "\"a quoted line also counts.\""   // kept (ends with quote)
    ).mkString("\n")
    val r = clean(doc)
    assert(r.getAs[Long]("n_lines_kept") === 3L)
    assert(r.getAs[Long]("n_lines_dropped") === 3L)
    assert(r.getAs[String]("clean_text") ===
      "this line survives the filter.\nis this a kept question?\n" +
      "\"a quoted line also counts.\"")
    assert(r.getAs[Boolean]("is_kept") === false) // 3 < minLines=5
  }

  test("page rules: minLines, lorem ipsum, curly brace") {
    val five = (1 to 5).map(i => s"line number $i is long enough.")
      .mkString("\n")
    assert(clean(five).getAs[Boolean]("is_kept") === true)
    assert(clean(five + "\nLorem Ipsum dolor sit amet.")
      .getAs[Boolean]("is_kept") === false)
    assert(clean(five + " {").getAs[Boolean]("is_kept") === false)
    // the lorem-ipsum line itself still passes the LINE rules
    val r = clean(five + "\nlorem ipsum dolor sit amet.")
    assert(r.getAs[Long]("n_lines_kept") === 6L)
  }

  test("empty and null text clean to empty, not null") {
    for (t <- Seq("", "   \n  ")) {
      val r = clean(t)
      assert(r.getAs[String]("clean_text") === "")
      assert(r.getAs[Long]("n_lines_kept") === 0L)
      assert(r.getAs[Boolean]("is_kept") === false)
    }
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("text")
      .select(Curation.c4LineClean(col("text")).as("c")).select("c.*")
      .collect()(0)
    assert(n.getAs[String]("clean_text") === "")
    assert(n.getAs[Boolean]("is_kept") === false)
  }
}
