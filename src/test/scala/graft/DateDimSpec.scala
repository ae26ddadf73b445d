package graft

import graft.datedim.DateDim
import org.apache.spark.sql.functions._

class DateDimSpec extends SparkSpec {

  private def rowFor(date: String) =
    DateDim.generate(spark, date, date).collect().head

  test("2024-03-31: Sunday, fiscal year end, quarter end") {
    val r = rowFor("2024-03-31")
    def s(n: String) = r.getAs[String](n)
    assert(r.getAs[Int]("date_id") === 20240331)
    assert(r.getAs[Int]("day_of_week") === 7)      // Sunday, Monday=1 conv
    assert(s("day_name") === "Sunday")
    assert(r.getAs[Int]("fiscal_quarter") === 4)
    assert(r.getAs[Int]("fiscal_year") === 2024)   // end-year convention
    assert(s("is_weekend") === "Y")
    assert(s("is_month_end") === "Y")
    assert(s("is_quarter_end") === "Y")
    assert(s("is_fiscal_year_end") === "Y")
    assert(s("day_type") === "Weekend")
  }

  test("2024-04-01: fiscal rollover to FY2025 Q1, Monday") {
    val r = rowFor("2024-04-01")
    assert(r.getAs[Int]("day_of_week") === 1)
    assert(r.getAs[Int]("fiscal_quarter") === 1)
    assert(r.getAs[Int]("fiscal_year") === 2025)
    assert(r.getAs[String]("is_business_day") === "Y")
  }

  test("2024-02-29: leap-day month end") {
    val r = rowFor("2024-02-29")
    assert(r.getAs[String]("is_month_end") === "Y")
    assert(r.getAs[String]("is_quarter_end") === "N")
  }

  test("holiday on a weekday: not a business day, day_type Holiday") {
    val r = rowFor("2024-08-15") // Independence Day, Thursday
    assert(r.getAs[String]("is_holiday") === "Y")
    assert(r.getAs[String]("holiday_name") === "Independence Day")
    assert(r.getAs[String]("is_business_day") === "N")
    assert(r.getAs[String]("day_type") === "Holiday")
  }

  test("ISO week at year boundary") {
    assert(rowFor("2024-12-30").getAs[Int]("week_of_year") === 1) // ISO 2025-W1
    assert(rowFor("2027-01-01").getAs[Int]("week_of_year") === 53)
  }

  test("extendIncremental: caps at N days and skips existing ids") {
    val existing = DateDim.generate(spark, "2024-01-01", "2024-01-20")
    val ext = DateDim.extendIncremental(spark, existing, "2024-03-01",
      cap = 10)
    val got = ext.orderBy("date_id").select("date_id")
      .collect().map(_.getInt(0)).toSeq
    assert(got === (20240121 to 20240130))
    // fully caught up -> empty
    val current = DateDim.generate(spark, "2024-01-01", "2024-03-01")
    assert(DateDim.extendIncremental(spark, current, "2024-03-01").count() === 0)
  }
}
