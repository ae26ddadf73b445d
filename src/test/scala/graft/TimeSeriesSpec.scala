package graft

import graft.ops.TimeSeries
import org.apache.spark.sql.functions._
import java.sql.Date

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("dateSpine: contiguous inclusive per-group span; null dates " +
      "excluded; single-day group yields one row") {
    val df = Seq(
      ("a", "2021-01-03"), ("a", "2021-01-07"), ("a", "2021-01-05"),
      ("b", "2021-02-01"),
      ("c", "2021-03-01"), ("c", null)).toDF("g", "day")
    val spine = TimeSeries.dateSpine(df, Seq("g"), "day")
      .collect().map(r => (r.getString(0), r.getDate(1).toString))
    assert(spine.count(_._1 == "a") === 5) // 03..07 inclusive
    assert(spine.filter(_._1 == "a").map(_._2).sorted ===
      Seq("2021-01-03", "2021-01-04", "2021-01-05", "2021-01-06",
        "2021-01-07"))
    assert(spine.filter(_._1 == "b") === Array(("b", "2021-02-01")))
    assert(spine.filter(_._1 == "c") === Array(("c", "2021-03-01")))
  }

  test("gapFill: zero-fill keeps type, LOCF carries across multi-day " +
      "gaps, leading gaps stay null, is_gap marks synthesized days") {
    val daily = Seq(
      // group a: observed 01, 04; gap 02-03
      ("a", d("2021-01-01"), 2L, Some(10.0)),
      ("a", d("2021-01-04"), 1L, Some(40.0)),
      // group b: level null on first day -> leading null carries nothing
      ("b", d("2021-01-01"), 1L, None: Option[Double]),
      ("b", d("2021-01-03"), 1L, Some(7.0)))
      .toDF("g", "day", "n", "lvl")
    val got = TimeSeries.gapFill(daily, Seq("g"), "day",
        zeroCols = Seq("n"), locfCols = Seq("lvl"))
      .orderBy("g", "day")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getBoolean(4)))
    assert(got === Array(
      ("a", "2021-01-01", 2L, Some(10.0), false),
      ("a", "2021-01-02", 0L, Some(10.0), true),
      ("a", "2021-01-03", 0L, Some(10.0), true),
      ("a", "2021-01-04", 1L, Some(40.0), false),
      ("b", "2021-01-01", 1L, None, false),
      ("b", "2021-01-02", 0L, None, true),
      ("b", "2021-01-03", 1L, Some(7.0), false)))
  }

  test("dateSpine fails loudly when a group's span exceeds maxSpanDays " +
      "(one corrupt outlier date would explode the group)") {
    val df = Seq(("a", d("1970-01-01")), ("a", d("2026-01-01")))
      .toDF("g", "day")
    val ex = intercept[Exception] {
      TimeSeries.dateSpine(df, Seq("g"), "day", maxSpanDays = 10000)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => String.valueOf(e.getMessage) +:
        msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("exceeds maxSpanDays")))
    // the default century bound admits the same span (~20.5k days)
    assert(TimeSeries.dateSpine(df, Seq("g"), "day").count() > 20000L)
  }

  test("gapFill fails loudly on a null day instead of dropping the row") {
    val df = Seq(("a", Some(d("2021-01-01")), 1L), ("a", None, 2L))
      .toDF("g", "day", "n")
    val ex = intercept[Exception] {
      TimeSeries.gapFill(df, Seq("g"), "day", Seq("n"), Nil).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => String.valueOf(e.getMessage) +:
        msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("null day")))
  }

  test("gapFill fails loudly on duplicated (keys, day) input grain") {
    val dup = Seq(("a", d("2021-01-01"), 1L), ("a", d("2021-01-01"), 2L))
      .toDF("g", "day", "n")
    val ex = intercept[Exception] {
      TimeSeries.gapFill(dup, Seq("g"), "day", Seq("n"), Nil).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => String.valueOf(e.getMessage) +:
        msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("duplicate")))
  }
}
