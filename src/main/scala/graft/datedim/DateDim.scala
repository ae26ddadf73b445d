package graft.datedim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Cleansing

/** Calendar-dimension generator (SURVEY.md §2.7 F13-F17, §1.1 "time
  * dimension as data"): the 21-column dim_date of the reference
  * (dim_date_daily.py:149-204, load_dim_date_dw.py:140-169) derived from
  * `spark.range` over epoch days — fully distributed, no driver loop.
  *
  * Conventions pinned by spec + oracle:
  *  - day_of_week is Monday=1..Sunday=7 (Python weekday()+1); Spark's
  *    dayofweek is Sunday=1, converted here (§7.4 risk 6).
  *  - week_of_year is ISO (isocalendar) = Spark weekofyear.
  *  - Indian fiscal calendar: Q1=Apr-Jun … Q4=Jan-Mar; fiscal_year is
  *    END-year (Apr 2024-Mar 2025 → FY 2025).
  *  - period-end flags via next-day month change; fiscal variants.
  *  - holidays come from a DATA table (date_id, holiday_name), broadcast-
  *    joined — not hardcoded in expressions.
  */
object DateDim {

  /** The reference's holiday table shape: (date_id yyyyMMdd, name).
    * Carried as data (dim_date_daily.py:15-76 holds 2023-2030); this
    * default covers the window the tests exercise; deployments supply the
    * full table through the `holidays` parameter. */
  def defaultHolidays(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (20230126, "Republic Day"), (20230308, "Holi"),
      (20230815, "Independence Day"), (20231002, "Gandhi Jayanti"),
      (20231112, "Diwali"), (20231225, "Christmas"),
      (20240126, "Republic Day"), (20240325, "Holi"),
      (20240815, "Independence Day"), (20241002, "Gandhi Jayanti"),
      (20241031, "Diwali"), (20241225, "Christmas"),
      (20250126, "Republic Day"), (20250314, "Holi"),
      (20250815, "Independence Day"), (20251002, "Gandhi Jayanti"),
      (20251101, "Diwali"), (20251225, "Christmas"),
    ).toDF("h_date_id", "holiday_name")
  }

  private def yn(c: Column): Column = when(c, "Y").otherwise("N")

  /** All calendar attribute columns for a `full_date` date column. */
  def attributes(d: Column): Seq[(String, Column)] = {
    val m = month(d)
    val dow = ((dayofweek(d) + 5) % 7) + 1 // Sun=1.. -> Mon=1..Sun=7
    val monthEnd = d === last_day(d)
    Seq(
      "date_id" -> Cleansing.dateId(d),
      "day" -> dayofmonth(d),
      "day_name" -> date_format(d, "EEEE"),
      "day_of_week" -> dow,
      "week_of_year" -> weekofyear(d),
      "month" -> m,
      "month_name" -> date_format(d, "MMMM"),
      "quarter" -> quarter(d),
      "year" -> year(d),
      "fiscal_quarter" -> when(m >= 4, (m - 4).divide(3).cast("int") + 1)
        .otherwise(4),
      "fiscal_year" -> when(m >= 4, year(d) + 1).otherwise(year(d)),
      "is_weekend" -> yn(dow >= 6),
      "is_month_end" -> yn(monthEnd),
      "is_quarter_end" -> yn(monthEnd && m.isin(3, 6, 9, 12)),
      "is_fiscal_quarter_end" -> yn(monthEnd && m.isin(6, 9, 12, 3)),
      "is_year_end" -> yn(m === 12 && dayofmonth(d) === 31),
      "is_fiscal_year_end" -> yn(m === 3 && dayofmonth(d) === 31))
  }

  /** Generate the full dimension for [start, end] inclusive. */
  def generate(spark: SparkSession, start: String, end: String,
      holidays: Option[DataFrame] = None): DataFrame = {
    val hol = holidays.getOrElse(defaultHolidays(spark))
    val base = spark.range(0,
        java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(start),
          java.time.LocalDate.parse(end)) + 1)
      .select(date_add(lit(start).cast("date"), col("id").cast("int"))
        .as("full_date"))
    val withAttrs = attributes(col("full_date")).foldLeft(base) {
      case (df, (n, c)) => df.withColumn(n, c)
    }
    val dow = col("day_of_week")
    withAttrs
      .join(broadcast(hol), col("date_id") === col("h_date_id"), "left")
      .drop("h_date_id")
      .withColumn("is_holiday", yn(col("holiday_name").isNotNull))
      .withColumn("is_business_day",
        yn(dow <= 5 && col("holiday_name").isNull))
      .withColumn("day_type",
        when(col("holiday_name").isNotNull, "Holiday")
          .when(dow >= 6, "Weekend").otherwise("Weekday"))
  }

  /** Capped incremental extension (dim_date_daily.py:117-134): from
    * max(full_date)+1 up to `today`, at most `cap` rows per run; J10
    * anti-join guards re-inserts. */
  def extendIncremental(spark: SparkSession, existing: DataFrame,
      today: String, cap: Int = 10,
      holidays: Option[DataFrame] = None): DataFrame = {
    val maxDate = existing.agg(max(col("full_date"))).collect()(0)
    val start = Option(maxDate.getDate(0))
      .map(_.toLocalDate.plusDays(1))
      .getOrElse(java.time.LocalDate.parse(today).minusYears(2))
    val end = java.time.LocalDate.parse(today)
    if (start.isAfter(end)) return generate(spark, today, today, holidays)
      .limit(0)
    val cappedEnd = if (start.plusDays(cap - 1).isBefore(end))
      start.plusDays(cap - 1) else end
    generate(spark, start.toString, cappedEnd.toString, holidays)
      .join(existing.select(col("date_id")), Seq("date_id"), "left_anti")
  }
}
