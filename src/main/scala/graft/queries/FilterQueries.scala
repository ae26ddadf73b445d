package graft.queries

import graft.Tables
import graft.functions.{Cleansing => C}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining §2.2 predicate coverage: P4 (validity filter post-cleaning
  * with sentinel rejection) and P9 (date-range sanity predicate). */
object FilterQueries {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // ---- P4: post-cleaning validity filter (sentinel-aware) -------------
    "p4_validity_filter" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val raw = when(col("c_custkey") % 11 === 0, lit(null).cast("string"))
        .when(col("c_custkey") % 11 === 1, lit("  "))
        .otherwise(col("c_name"))
      val cleaned = c.select(col("c_custkey"),
        C.cleanStoreName(raw).as("store_name"),
        C.cleanCity(when(col("c_custkey") % 7 === 0,
          lit(null).cast("string")).otherwise(col("c_mktsegment")))
          .as("city"))
      cleaned.filter(col("store_name").isNotNull
          && col("store_name") =!= "UNKNOWN STORE"
          && col("city").isNotNull)
        .orderBy(col("c_custkey"))
    }),

    // ---- P9: date-range sanity (null outside [1990-01-01, cutoff]) ------
    "p9_date_sanity" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val raw = when(col("o_orderkey") % 6 === 0, lit("1980-05-05"))
        .when(col("o_orderkey") % 6 === 1, lit("2090-01-01"))
        .when(col("o_orderkey") % 6 === 2, lit("garbage"))
        .otherwise(date_format(col("o_orderdate").cast("date"),
          "yyyy-MM-dd"))
      o.select(col("o_orderkey"),
        C.cleanBoundedDate(raw, "1990-01-01",
          lit("2030-12-31").cast("date")).as("onboarding_date"))
        .orderBy(col("o_orderkey"))
    }),
  )

  def oracles: Map[String, String] = Map(
    "p4_validity_filter" ->
      """WITH cleaned AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 11 IN (0, 1) THEN 'UNKNOWN STORE'
        |         ELSE upper(regexp_replace(trim(c_name),'\s+',' ','g'))
        |    END AS store_name,
        |    CASE WHEN c_custkey % 7 = 0 THEN 'UNKNOWN'
        |         ELSE array_to_string(list_transform(
        |           string_split(lower(trim(c_mktsegment)), ' '),
        |           w -> upper(w[1]) || w[2:]), ' ')
        |    END AS city
        |  FROM customer)
        |SELECT c_custkey, store_name, city FROM cleaned
        |WHERE store_name IS NOT NULL AND store_name <> 'UNKNOWN STORE'
        |  AND city IS NOT NULL
        |ORDER BY c_custkey""".stripMargin,

    "p9_date_sanity" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 6 IN (0, 1, 2) THEN NULL
        |       ELSE CAST(o_orderdate AS DATE) END AS onboarding_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
  )
}
