package graft.queries

import graft.Tables
import graft.validate._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked coverage for the DQ check algebra (SURVEY §2.8). The
  * events table is clean, so the query injects deterministic violations
  * (bad flag tokens, unparsable numerics, nulls) and the oracle recomputes
  * every CheckResult row in SQL.
  */
object ValidateQueries {

  type Q = (SparkSession, String) => DataFrame

  private def messyEvents(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
      col("value"),
      when(col("user_id") % 97 === 0, "X")
        .when(col("user_id") % 2 === 0, "Y").otherwise("N").as("flag"),
      when(col("event_id") % 101 === 0, lit("abc"))
        .when(col("event_id") % 3 === 0,
          concat(lit("₹"), col("value").cast("decimal(10,2)").cast("string")))
        .otherwise(col("value").cast("decimal(10,2)").cast("string"))
        .as("amount_str"),
      when(col("event_id") % 53 === 0, lit(null).cast("string"))
        .otherwise(lit("x")).as("nullable_col"))
  }

  def queries: Map[String, Q] = Map(
    // ---- V1-V7: full check suite in one agg pass ------------------------
    "v1_check_suite" -> ((s, d) => {
      Validator.run(messyEvents(s, d), Seq(
        MandatoryColumns(Seq("EVENT_ID", "MISSING_COL")),
        MinRows(1000),
        NoNulls(Seq("event_id", "nullable_col")),
        NumericParsable(Seq("amount_str")),
        FlagDomain(Seq("flag")),
        Freshness("ts", "2024-01-01"),
        PkUnique(Seq("event_id")),
        PkUnique(Seq("event_type"))))
        .orderBy(col("check"), col("column"))
    }),

    // ---- V6 evidence: top-N duplicate examples --------------------------
    "v6_dup_examples" -> ((s, d) => {
      Validator.duplicateExamples(Tables.lineitem(s, d),
        Seq("l_orderkey"), n = 5)
        .orderBy(col("dup_count").desc, col("l_orderkey"))
    }),

    // ---- V8: numeric profile (one pass, decimal-deterministic avg) ------
    "v8_numeric_profile" -> ((s, d) => {
      Validator.numericProfile(messyEvents(s, d), Seq("value", "user_id"))
        .orderBy(col("column"))
    }),

    // sketch profile: self-verifying gate form — exact min/max/count are
    // hash-checked against DuckDB, and the engine-specific sketch values
    // are asserted within their error bounds as booleans (a sketch
    // drifting out of bound flips false and breaks the hash match).
    // Raw sketch behavior is additionally spec-pinned in ChecksApproxSpec.
    "v8b_approx_profile" -> ((s, d) => {
      Validator.approxProfileChecked(Tables.lineitem(s, d),
        Seq("l_extendedprice", "l_partkey", "l_quantity"))
        .orderBy(col("column"))
    }),

    // ---- V9: identifier-injection guard ---------------------------------
    // The guard is construction-time (driver-side), so the gate probes
    // the REAL Identifiers.isSafe/requireSafe over a fixed candidate
    // slate (safe, hostile, unicode, over-length, null) and the oracle
    // recomputes accept/reject with DuckDB's independent regex engine
    // plus the documented rejection-message format. The slate is shared
    // with the generated oracle so the two sides cannot drift on INPUTS
    // while staying independent on the LOGIC.
    "v9_identifier_guard" -> ((s, _) => {
      import s.implicits._
      v9Candidates.map { case (id, nm) =>
        val safe = Identifiers.isSafe(nm.orNull)
        val reason =
          if (safe) None
          else Some(
            try { Identifiers.requireSafe(nm.orNull); "unreachable" }
            catch { case e: IllegalArgumentException => e.getMessage })
        (id, nm, safe, reason)
      }.toDF("cand_id", "name", "is_safe", "reason")
        .orderBy(col("cand_id"))
    }),
  )

  /** V9 candidate slate: ids are the stable sort key (names contain
    * nulls and near-duplicates). */
  private[queries] val v9Candidates: Seq[(Int, Option[String])] = Seq(
    1 -> Some("sales_fact"),
    2 -> Some("COL$#_9"),
    3 -> Some("a" * 128),            // exactly the length cap: safe
    4 -> Some("a" * 129),            // one over: rejected
    5 -> Some("drop table x; --"),   // classic injection shape
    6 -> Some("név"),                // non-ASCII letter
    7 -> Some(""),
    8 -> None,                       // null name
    9 -> Some("o'brien"),            // quote smuggling
    10 -> Some("bad\tname"))         // control char

  def oracles: Map[String, String] = Map(
    // DuckDB re-decides each candidate with ITS regex engine and
    // reconstructs the rejection message from the documented format —
    // independent recompute of the guard's logic over the shared slate.
    "v9_identifier_guard" -> {
      val rows = v9Candidates.map { case (id, nm) =>
        val sqlName = nm.map(n => "'" + n.replace("'", "''") + "'")
          .getOrElse("CAST(NULL AS VARCHAR)")
        s"($id, $sqlName)"
      }.mkString(",\n  ")
      s"""WITH cand(cand_id, name) AS (VALUES
         |  $rows)
         |SELECT cand_id, name,
         |  coalesce(regexp_matches(name, '^[A-Za-z0-9_$$#]{1,128}$$'),
         |    false) AS is_safe,
         |  CASE WHEN NOT coalesce(
         |      regexp_matches(name, '^[A-Za-z0-9_$$#]{1,128}$$'), false)
         |    THEN 'requirement failed: Unsafe table/column name ' ||
         |      'rejected: ''' || coalesce(name, 'null') ||
         |      '''. Only alphanumeric characters, _, $$, # are allowed.'
         |  END AS reason
         |FROM cand ORDER BY cand_id""".stripMargin
    },

    "v1_check_suite" ->
      """WITH ev AS (
        |  SELECT event_id, ts, user_id, event_type, value,
        |    CASE WHEN user_id % 97 = 0 THEN 'X'
        |         WHEN user_id % 2 = 0 THEN 'Y' ELSE 'N' END AS flag,
        |    CASE WHEN event_id % 101 = 0 THEN 'abc'
        |         WHEN event_id % 3 = 0
        |           THEN '₹' || CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR)
        |         ELSE CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR)
        |    END AS amount_str,
        |    CASE WHEN event_id % 53 = 0 THEN NULL ELSE 'x' END
        |      AS nullable_col
        |  FROM events)
        |SELECT * FROM (
        |  SELECT 'mandatory_column' AS "check", 'EVENT_ID' AS "column",
        |    CAST(1 AS BIGINT) AS observed, CAST(1 AS BIGINT) AS threshold,
        |    true AS passed, 'ERROR' AS severity
        |  UNION ALL
        |  SELECT 'mandatory_column', 'MISSING_COL', 0, 1, false, 'ERROR'
        |  UNION ALL
        |  SELECT 'min_rows', '*', (SELECT COUNT(*) FROM ev), 1000,
        |    (SELECT COUNT(*) FROM ev) >= 1000, 'ERROR'
        |  UNION ALL
        |  SELECT 'no_nulls', 'event_id', 0, 0, true, 'ERROR'
        |  UNION ALL
        |  SELECT 'no_nulls', 'nullable_col',
        |    (SELECT COUNT(*) FROM ev WHERE nullable_col IS NULL), 0,
        |    (SELECT COUNT(*) FROM ev WHERE nullable_col IS NULL) = 0, 'ERROR'
        |  UNION ALL
        |  SELECT 'numeric_parsable', 'amount_str',
        |    (SELECT COUNT(*) FROM ev WHERE amount_str IS NOT NULL AND
        |      TRY_CAST(trim(regexp_replace(amount_str,
        |        '(?i)Rs\.?|[₹$,\s]', '', 'g')) AS DECIMAL(18,4)) IS NULL),
        |    0,
        |    (SELECT COUNT(*) FROM ev WHERE amount_str IS NOT NULL AND
        |      TRY_CAST(trim(regexp_replace(amount_str,
        |        '(?i)Rs\.?|[₹$,\s]', '', 'g')) AS DECIMAL(18,4)) IS NULL) = 0,
        |    'ERROR'
        |  UNION ALL
        |  SELECT 'flag_domain', 'flag',
        |    (SELECT COUNT(*) FROM ev
        |     WHERE flag IS NULL OR flag NOT IN ('Y','N')), 0,
        |    (SELECT COUNT(*) FROM ev
        |     WHERE flag IS NULL OR flag NOT IN ('Y','N')) = 0, 'ERROR'
        |  UNION ALL
        |  SELECT 'freshness', 'ts',
        |    (SELECT COUNT(*) FROM ev
        |     WHERE CAST(ts AS DATE) = DATE '2024-01-01'), 1,
        |    (SELECT COUNT(*) FROM ev
        |     WHERE CAST(ts AS DATE) = DATE '2024-01-01') >= 1, 'ERROR'
        |  UNION ALL
        |  SELECT 'pk_unique', 'event_id',
        |    (SELECT COUNT(*) FROM (SELECT event_id FROM ev
        |      GROUP BY event_id HAVING COUNT(*) > 1)), 0,
        |    (SELECT COUNT(*) FROM (SELECT event_id FROM ev
        |      GROUP BY event_id HAVING COUNT(*) > 1)) = 0, 'ERROR'
        |  UNION ALL
        |  SELECT 'pk_unique', 'event_type',
        |    (SELECT COUNT(*) FROM (SELECT event_type FROM ev
        |      GROUP BY event_type HAVING COUNT(*) > 1)), 0,
        |    (SELECT COUNT(*) FROM (SELECT event_type FROM ev
        |      GROUP BY event_type HAVING COUNT(*) > 1)) = 0, 'ERROR'
        |) ORDER BY "check", "column"""".stripMargin,

    "v6_dup_examples" ->
      """SELECT l_orderkey, COUNT(*) AS dup_count FROM lineitem
        |GROUP BY l_orderkey HAVING COUNT(*) > 1
        |ORDER BY dup_count DESC, l_orderkey LIMIT 5""".stripMargin,

    "v8b_approx_profile" ->
      """SELECT 'l_extendedprice' AS "column",
        |  CAST(MIN(l_extendedprice) AS DOUBLE) AS "min",
        |  CAST(MAX(l_extendedprice) AS DOUBLE) AS "max",
        |  COUNT(l_extendedprice) AS non_null,
        |  true AS distinct_ok, true AS median_ok
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_partkey', CAST(MIN(l_partkey) AS DOUBLE),
        |  CAST(MAX(l_partkey) AS DOUBLE), COUNT(l_partkey), true, true
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', CAST(MIN(l_quantity) AS DOUBLE),
        |  CAST(MAX(l_quantity) AS DOUBLE), COUNT(l_quantity), true, true
        |FROM lineitem
        |ORDER BY "column"""".stripMargin,

    "v8_numeric_profile" ->
      """WITH ev AS (SELECT value, user_id FROM events)
        |SELECT 'user_id' AS "column",
        |  CAST(MIN(user_id) AS DOUBLE) AS min,
        |  CAST(MAX(user_id) AS DOUBLE) AS max,
        |  CAST(SUM(CAST(user_id AS DECIMAL(18,4))) AS DOUBLE)
        |    / COUNT(user_id) AS avg,
        |  COUNT(user_id) AS non_null
        |FROM ev
        |UNION ALL
        |SELECT 'value', CAST(MIN(value) AS DOUBLE), CAST(MAX(value) AS DOUBLE),
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(value),
        |  COUNT(value)
        |FROM ev
        |ORDER BY "column"""".stripMargin,
  )
}
