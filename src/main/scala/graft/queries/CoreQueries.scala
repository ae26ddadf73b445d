package graft.queries

import graft.Tables
import graft.Tables.{dsum, davg, dec2, dec4}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator coverage (SURVEY.md §2.2 P, §2.3 J, §2.4 A,
  * §2.5 W, §2.6 O) expressed over the TPC-H-ish test star schema.
  *
  * Every query ends in a deterministic ORDER BY (and so does its oracle) so
  * the driver's hash compare is stable. Aggregates over doubles go through
  * `Tables.dsum`/`davg` — see the determinism note there.
  *
  * Scale notes (local[32] now, 1000-executor cluster by design):
  *  - dims (region/nation/supplier/part) are broadcast; the fact side never
  *    shuffles for those joins.
  *  - fact⋈orders is a key-equi join left to AQE (sort-merge or shuffled
  *    hash; both sides shuffle once on the key — unavoidable without
  *    bucketing, which the parquet inputs don't carry).
  */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // ---- A2/A4: TPC-H Q1-style pricing summary (full-scan agg) ----------
    "a2_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice"))
            * (lit(1).cast("decimal(9,4)") - dec4(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          // ROUND(…, 4) before the double cast: DuckDB casts scale-10
          // decimals to double via hugeint with two roundings (1-ulp drift
          // vs Spark's correctly-rounded BigDecimal); at scale 4 both are
          // single-rounded and identical.
          round(sum(dec2(col("l_extendedprice"))
            * (lit(1).cast("decimal(9,4)") - dec4(col("l_discount")))
            * (lit(1).cast("decimal(9,4)") + dec4(col("l_tax")))), 4)
            .cast("double").as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- SQL-text surface: the same engine through spark.sql ------------
    // The reference's users speak SQL (its compute is SQL pushed to
    // Oracle); this query goes parse → Catalyst through spark.sql over
    // the registered views and is hash-checked like everything else.
    "sql1_sql_text" -> ((s, d) => {
      graft.sql.SqlSurface.registerTables(s, d)
      s.sql("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
            AS sum_base_price,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")
    }),

    // ---- J1/P1/O1: denormalized wide star-join snapshot -----------------
    // Mirrors extract_sales_snapshot.py:32-96 (fact ⋈ all dims, ordered by
    // the fact PK). part/supplier are broadcast; orders joins on the key.
    "j1_star_snapshot" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d)
      val p  = Tables.part(s, d)
      val su = Tables.supplier(s, d)
      val n  = Tables.nation(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"),
          col("l_shipdate").cast("date").as("ship_date"),
          col("o_custkey"), col("o_orderstatus"),
          col("o_orderdate").cast("date").as("order_date"),
          col("o_totalprice"),
          col("p_name"), col("p_brand"), col("p_type"), col("p_retailprice"),
          col("s_name"), col("s_acctbal"),
          col("n_name").as("supp_nation"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- P2/P3: not-null + positivity + flag filter ---------------------
    "p2_filter_positive" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_extendedprice").isNotNull
          && col("l_extendedprice") > 0 && col("l_returnflag") === "N")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- J6: left-anti "new rows" (parts never sold) --------------------
    "j6_left_anti_new" -> ((s, d) => {
      val p  = Tables.part(s, d)
      val li = Tables.lineitem(s, d).select(col("l_partkey"))
      p.join(li, col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
    }),

    // ---- J9: left-semi existence probe (customers with orders) ----------
    "j9_semi_exists" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // ---- A1: max-key scalar agg (surrogate-key seed) --------------------
    "a1_max_key_seed" -> ((s, d) => {
      Tables.orders(s, d)
        .agg((coalesce(max(col("o_orderkey")), lit(0L)) + lit(1L))
          .as("next_key"))
    }),

    // ---- A3: multi-column COUNT(DISTINCT) -------------------------------
    "a3_count_distinct" -> ((s, d) => {
      Tables.part(s, d).agg(
        countDistinct(col("p_brand")).as("n_brand"),
        countDistinct(col("p_type")).as("n_type"),
        countDistinct(col("p_size")).as("n_size"))
    }),

    // ---- A4: conditional aggregation (flag tallies) ---------------------
    "a4_conditional_agg" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(when(col("o_totalprice") > 100000.0, 1).otherwise(0))
            .cast("long").as("n_big"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // ---- A5: duplicate-detection group agg ------------------------------
    "a5_dup_groups" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .orderBy(col("l_orderkey"))
    }),

    // ---- A7: group totals by dim attribute (net sales by brand) ---------
    "a7_group_totals" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p  = Tables.part(s, d)
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(dec2(col("l_extendedprice"))
          * (lit(1).cast("decimal(9,4)") - dec4(col("l_discount"))))
          .cast("double").as("net_sales"))
        .orderBy(col("p_brand"))
    }),

    // ---- W1: sequential surrogate-key assignment ------------------------
    // row_number over a stable total order + max-key offset. NOTE: a global
    // ORDER BY is a single-reducer barrier; this is only for modest
    // insert-batches (the reference inserts <=10k/run). At 100 TB use
    // SurrogateKeys.assignContiguous (per-partition offsets, no total order).
    "w1_surrogate_keys" -> ((s, d) => {
      val w = Window.orderBy(col("s_suppkey"))
      Tables.supplier(s, d)
        .select(col("s_suppkey"),
          (row_number().over(w).cast("long") + lit(1000000L)).as("new_key"))
        .orderBy(col("s_suppkey"))
    }),

    // ---- A8: dedupe on business key, deterministic keep-first -----------
    "a8_dedupe_keep_first" -> ((s, d) => {
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // order by the full unique grain so "keep first" is deterministic.
      val w = Window.partitionBy(col("l_orderkey")).orderBy(
        col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"))
      Tables.lineitem(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .orderBy(col("l_orderkey"))
    }),

    // ---- O2: deterministic top-N ----------------------------------------
    "o2_topn" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(5)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // ---- O4: tagged union of insert/update sets -------------------------
    "o4_union_tagged" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val ins = o.filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), lit("INSERT").as("op"))
      val upd = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), lit("UPDATE").as("op"))
      ins.unionByName(upd).orderBy(col("op"), col("o_orderkey"))
    }),

    // ---- J2: dim-key lookup through normalized string keys --------------
    // Rebuilds load_fact_sales_dw.py's dict-probe as a broadcast left join
    // on canonicalized (TRIM+UPPER) keys: incoming rows carry a free-text
    // nation name; resolve it back to the surrogate key.
    "j2_dimkey_lookup" -> ((s, d) => {
      val su = Tables.supplier(s, d)
      val n  = Tables.nation(s, d)
      val incoming = su
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"),
          lower(concat(lit("  "), col("n_name"), lit(" "))).as("nation_raw"))
      val dim = n.select(col("n_nationkey").as("resolved_nationkey"),
        upper(trim(col("n_name"))).as("nk"))
      incoming
        .join(broadcast(dim), upper(trim(col("nation_raw"))) === col("nk"), "left")
        .select(col("s_suppkey"), col("resolved_nationkey"))
        .orderBy(col("s_suppkey"))
    }),

    // ---- J3: two-level fallback lookup (exact bk, then name-only) -------
    "j3_fallback_lookup" -> ((s, d) => {
      val p = Tables.part(s, d)
      val incoming = p.select(
        col("p_partkey").as("src_key"), col("p_name"),
        when(col("p_partkey") % 3 === 0, lit(null).cast("string"))
          .otherwise(col("p_brand")).as("p_brand"))
      val exact = p.groupBy(col("p_name").as("e_name"), col("p_brand").as("e_brand"))
        .agg(min(col("p_partkey")).as("e_key"))
      val byName = p.groupBy(col("p_name").as("b_name"))
        .agg(min(col("p_partkey")).as("b_key"))
      incoming
        .join(broadcast(exact),
          col("p_name") === col("e_name") && col("p_brand") === col("e_brand"),
          "left")
        .join(broadcast(byName), col("p_name") === col("b_name"), "left")
        .select(col("src_key"),
          coalesce(col("e_key"), col("b_key")).as("resolved_key"))
        .orderBy(col("src_key"))
    }),
  )

  /** DuckDB 1.0 SQL equivalents, same column names, same ORDER BY. */
  private val D = "DECIMAL(18,4)"
  private def dsumSql(e: String) = s"CAST(SUM(CAST($e AS $D)) AS DOUBLE)"
  // decimal end-to-end money math (see Tables.dec2 determinism note)
  private val netExpr = "CAST(l_extendedprice AS DECIMAL(15,2)) * " +
    "(CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))"
  private val chargeExpr = s"$netExpr * " +
    "(CAST(1 AS DECIMAL(9,4)) + CAST(l_tax AS DECIMAL(9,4)))"

  def oracles: Map[String, String] = Map(
    "a2_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM($netExpr) AS DOUBLE) AS sum_disc_price,
         |  CAST(ROUND(SUM($chargeExpr), 4) AS DOUBLE) AS sum_charge,
         |  ${dsumSql("l_quantity")} / COUNT(l_quantity) AS avg_qty,
         |  ${dsumSql("l_extendedprice")} / COUNT(l_extendedprice) AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "j1_star_snapshot" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  l_discount, CAST(l_shipdate AS DATE) AS ship_date,
        |  o_custkey, o_orderstatus, CAST(o_orderdate AS DATE) AS order_date,
        |  o_totalprice, p_name, p_brand, p_type, p_retailprice,
        |  s_name, s_acctbal, n_name AS supp_nation
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN part     ON l_partkey  = p_partkey
        |JOIN supplier ON l_suppkey  = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p2_filter_positive" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0
        |  AND l_returnflag = 'N'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "j6_left_anti_new" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |ORDER BY p_partkey""".stripMargin,

    "j9_semi_exists" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "a1_max_key_seed" ->
      "SELECT COALESCE(MAX(o_orderkey), 0) + 1 AS next_key FROM orders",

    "a3_count_distinct" ->
      """SELECT COUNT(DISTINCT p_brand) AS n_brand,
        |  COUNT(DISTINCT p_type) AS n_type,
        |  COUNT(DISTINCT p_size) AS n_size
        |FROM part""".stripMargin,

    "sql1_sql_text" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_base_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "a4_conditional_agg" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_big,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "a5_dup_groups" ->
      """SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem
        |GROUP BY l_orderkey HAVING COUNT(*) > 1
        |ORDER BY l_orderkey""".stripMargin,

    "a7_group_totals" ->
      s"""SELECT p_brand,
         |  CAST(SUM($netExpr) AS DOUBLE) AS net_sales
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "w1_surrogate_keys" ->
      """SELECT s_suppkey,
        |  CAST(ROW_NUMBER() OVER (ORDER BY s_suppkey) + 1000000 AS BIGINT)
        |    AS new_key
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "a8_dedupe_keep_first" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |  ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) = 1
        |ORDER BY l_orderkey""".stripMargin,

    "o2_topn" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 5""".stripMargin,

    "o4_union_tagged" ->
      """SELECT o_orderkey, 'INSERT' AS op FROM orders WHERE o_orderstatus='O'
        |UNION ALL
        |SELECT o_orderkey, 'UPDATE' AS op FROM orders WHERE o_orderstatus='F'
        |ORDER BY op, o_orderkey""".stripMargin,

    "j2_dimkey_lookup" ->
      """SELECT s_suppkey, resolved_nationkey FROM (
        |  SELECT s_suppkey,
        |    lower('  ' || n_name || ' ') AS nation_raw
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |) i LEFT JOIN (
        |  SELECT n_nationkey AS resolved_nationkey,
        |    upper(trim(n_name)) AS nk
        |  FROM nation
        |) dim ON upper(trim(i.nation_raw)) = dim.nk
        |ORDER BY s_suppkey""".stripMargin,

    "j3_fallback_lookup" ->
      """WITH incoming AS (
        |  SELECT p_partkey AS src_key, p_name,
        |    CASE WHEN p_partkey % 3 = 0 THEN NULL ELSE p_brand END AS p_brand
        |  FROM part),
        |exact AS (
        |  SELECT p_name AS e_name, p_brand AS e_brand,
        |    MIN(p_partkey) AS e_key FROM part GROUP BY 1, 2),
        |byname AS (
        |  SELECT p_name AS b_name, MIN(p_partkey) AS b_key
        |  FROM part GROUP BY 1)
        |SELECT i.src_key,
        |  COALESCE(e.e_key, b.b_key) AS resolved_key
        |FROM incoming i
        |LEFT JOIN exact e  ON i.p_name = e.e_name AND i.p_brand = e.e_brand
        |LEFT JOIN byname b ON i.p_name = b.b_name
        |ORDER BY i.src_key""".stripMargin,
  )
}
