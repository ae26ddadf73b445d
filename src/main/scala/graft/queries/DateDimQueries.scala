package graft.queries

import graft.datedim.DateDim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked calendar dimension (SURVEY §2.7 F13-F17): the full
  * 21-column dim_date for 2024-2025, validated attribute-by-attribute
  * against DuckDB's independent date functions (isodow, weekofyear,
  * dayname, last_day...). Catches the Sunday=1 vs Monday=1 and fiscal
  * year-end conventions (§7.4 risk 6).
  */
object DateDimQueries {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "f14_date_dim" -> ((s, _) => {
      DateDim.generate(s, "2024-01-01", "2025-12-31")
        .orderBy(col("date_id"))
    }),
  )

  private val holidayValues = Seq(
    (20240126, "Republic Day"), (20240325, "Holi"),
    (20240815, "Independence Day"), (20241002, "Gandhi Jayanti"),
    (20241031, "Diwali"), (20241225, "Christmas"),
    (20250126, "Republic Day"), (20250314, "Holi"),
    (20250815, "Independence Day"), (20251002, "Gandhi Jayanti"),
    (20251101, "Diwali"), (20251225, "Christmas"))
    .map { case (i, n) => s"($i, '$n')" }.mkString(", ")

  def oracles: Map[String, String] = Map(
    "f14_date_dim" ->
      s"""WITH dates AS (
         |  SELECT CAST(gs AS DATE) AS full_date
         |  FROM generate_series(DATE '2024-01-01', DATE '2025-12-31',
         |    INTERVAL 1 DAY) t(gs)),
         |hol(h_date_id, holiday_name) AS (VALUES $holidayValues),
         |base AS (
         |  SELECT
         |    CAST(strftime(full_date, '%Y%m%d') AS INTEGER) AS date_id,
         |    full_date,
         |    CAST(day(full_date) AS INTEGER) AS day,
         |    dayname(full_date) AS day_name,
         |    CAST(isodow(full_date) AS INTEGER) AS day_of_week,
         |    CAST(weekofyear(full_date) AS INTEGER) AS week_of_year,
         |    CAST(month(full_date) AS INTEGER) AS month,
         |    monthname(full_date) AS month_name,
         |    CAST(quarter(full_date) AS INTEGER) AS quarter,
         |    CAST(year(full_date) AS INTEGER) AS year,
         |    CAST(CASE WHEN month(full_date) >= 4
         |      THEN (month(full_date) - 4) // 3 + 1 ELSE 4 END AS INTEGER)
         |      AS fiscal_quarter,
         |    CAST(CASE WHEN month(full_date) >= 4 THEN year(full_date) + 1
         |      ELSE year(full_date) END AS INTEGER) AS fiscal_year,
         |    CASE WHEN isodow(full_date) >= 6 THEN 'Y' ELSE 'N' END
         |      AS is_weekend,
         |    CASE WHEN full_date = last_day(full_date) THEN 'Y' ELSE 'N' END
         |      AS is_month_end,
         |    CASE WHEN full_date = last_day(full_date)
         |      AND month(full_date) IN (3,6,9,12) THEN 'Y' ELSE 'N' END
         |      AS is_quarter_end,
         |    CASE WHEN full_date = last_day(full_date)
         |      AND month(full_date) IN (6,9,12,3) THEN 'Y' ELSE 'N' END
         |      AS is_fiscal_quarter_end,
         |    CASE WHEN month(full_date) = 12 AND day(full_date) = 31
         |      THEN 'Y' ELSE 'N' END AS is_year_end,
         |    CASE WHEN month(full_date) = 3 AND day(full_date) = 31
         |      THEN 'Y' ELSE 'N' END AS is_fiscal_year_end
         |  FROM dates)
         |SELECT b.*, h.holiday_name,
         |  CASE WHEN h.holiday_name IS NOT NULL THEN 'Y' ELSE 'N' END
         |    AS is_holiday,
         |  CASE WHEN b.day_of_week <= 5 AND h.holiday_name IS NULL
         |    THEN 'Y' ELSE 'N' END AS is_business_day,
         |  CASE WHEN h.holiday_name IS NOT NULL THEN 'Holiday'
         |       WHEN b.day_of_week >= 6 THEN 'Weekend'
         |       ELSE 'Weekday' END AS day_type
         |FROM base b LEFT JOIN hol h ON b.date_id = h.h_date_id
         |ORDER BY b.date_id""".stripMargin,
  )
}
