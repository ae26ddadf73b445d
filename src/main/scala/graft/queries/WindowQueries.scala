package graft.queries

import graft.Tables
import graft.Tables.{dsum, dec2, dec4}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Capability breadth beyond the reference's own surface (SURVEY §2.5
  * notes the reference has no ranking/lag/frames — a complete engine its
  * users can grow into needs them): window functions with frames,
  * ROLLUP hierarchies, pivot, and correlated-subquery shapes. All
  * oracle-checked against DuckDB's independent implementations.
  */
object WindowQueries {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // ---- rank / lag / running-sum frames over per-customer orders -------
    "w4_window_frames" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val byCust = Window.partitionBy(col("o_custkey"))
        .orderBy(col("order_date"), col("o_orderkey"))
      o.select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("order_date"),
          dec2(col("o_totalprice")).as("price"))
        .withColumn("order_rank", row_number().over(byCust))
        .withColumn("prev_price",
          lag(col("price"), 1).over(byCust).cast("double"))
        .withColumn("running_spend",
          sum(col("price")).over(byCust.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)).cast("double"))
        .withColumn("price", col("price").cast("double"))
        .orderBy(col("o_custkey"), col("order_rank"))
    }),

    // ---- ROLLUP: revenue by region→nation hierarchy with subtotals ------
    "g1_rollup" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      li.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("r_name").asc_nulls_first,
          col("n_name").asc_nulls_first)
    }),

    // ---- CUBE: all grouping-set combinations with grouping_id ----------
    "g2_cube" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // ---- ranking family: two windows on purpose -------------------------
    // rank/dense_rank/percent_rank/cume_dist run over the VALUE order
    // alone (deterministic under ties by definition); row_number/ntile
    // need a total order, so they ride a tie-broken window. A unique
    // tie-break on the rank family would degenerate rank ≡ row_number
    // and stop exercising tie semantics at all.
    "w5_rank_funcs" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val wp = Window.partitionBy(col("o_custkey"))
        .orderBy(col("__p").desc)
      val wu = Window.partitionBy(col("o_custkey"))
        .orderBy(col("__p").desc, col("o_orderkey"))
      o.select(col("o_custkey"), col("o_orderkey"),
          dec2(col("o_totalprice")).as("__p"))
        .withColumn("rn", row_number().over(wu))
        .withColumn("rk", rank().over(wp))
        .withColumn("drk", dense_rank().over(wp))
        .withColumn("pr", percent_rank().over(wp))
        .withColumn("cd", cume_dist().over(wp))
        .withColumn("nt", ntile(4).over(wu))
        .withColumn("price", col("__p").cast("double")).drop("__p")
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // ---- GROUPING SETS with grouping() flags (SQL-text surface) ---------
    "g3_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_g3")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
          |  CAST(grouping(o_orderpriority) AS INT) AS g_prio,
          |  COUNT(*) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
          |    AS sum_price
          |FROM orders_g3
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
          |  (o_orderstatus, o_orderpriority), ())
          |ORDER BY g_status, g_prio,
          |  o_orderstatus ASC NULLS FIRST,
          |  o_orderpriority ASC NULLS FIRST""".stripMargin)
    }),

    // ---- UNPIVOT/stack: wide per-flag sums melted to (metric, value) ----
    "u1_unpivot" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val wide = li.groupBy(col("l_returnflag"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"))
      wide.select(col("l_returnflag"),
          expr("stack(2, 'sum_qty', sum_qty, 'sum_price', sum_price)" +
            " AS (metric, value)"))
        .orderBy(col("l_returnflag"), col("metric"))
    }),

    // ---- pivot: order counts per status × priority ----------------------
    "pv1_pivot_status" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("o_orderpriority"))
    }),

    // ---- W2: SKU counter continuation (SURVEY §2.5) ---------------------
    // Parse the max trailing counter out of the existing SKU population,
    // then number new rows from max+1 — the reference's "continue the
    // sequence from what's already on disk" pattern. Numbering goes
    // through SurrogateKeys.assignSequential (range-partitioned rank, no
    // single-reducer WindowExec) — same p_partkey order the old global
    // window produced, so the oracle's ROW_NUMBER() is unchanged.
    "w2_sku_counter" -> ((s, d) => {
      val p = Tables.part(s, d)
      def code = substring(
        regexp_replace(upper(col("p_type")), "[^A-Z]", ""), 1, 3)
      val existing = p.filter(col("p_partkey") % 2 === 0)
        .select(concat(lit("SKU-"), code, lit("-"),
          lpad((col("p_partkey") % 90000).cast("string"), 5, "0"))
          .as("sku"))
      val maxCtr = existing.agg(coalesce(
        max(regexp_extract(col("sku"), "([0-9]+)$", 1).cast("long")),
        lit(0L)).as("max_ctr"))
      val numbered = graft.ops.SurrogateKeys.assignSequential(
        p.filter(col("p_partkey") % 2 === 1)
          .select(col("p_partkey"), code.as("code")),
        "rn", 0L, Seq(col("p_partkey")))
      numbered
        .crossJoin(broadcast(maxCtr))
        .select(col("p_partkey"), concat(lit("SKU-"), col("code"),
          lit("-"), lpad((col("max_ctr") + col("rn")).cast("string"),
            5, "0")).as("sku"))
        .orderBy(col("p_partkey"))
    }),

    // ---- Q18 shape: customers with any large order (HAVING + semi) ------
    "q18_big_orders" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val big = li.groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 150.0)
      o.join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("total_qty"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- Q16 shape: NOT IN correlated exclusion -------------------------
    "q16_not_in" -> ((s, d) => {
      val p = Tables.part(s, d)
      val su = Tables.supplier(s, d)
      val li = Tables.lineitem(s, d)
      // suppliers with below-zero balance are "complained about"
      val badSupp = su.filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      val liOk = li.join(badSupp, col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      liOk.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
        .limit(25)
    }),
  )

  def oracles: Map[String, String] = Map(
    "w4_window_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS DOUBLE) AS price,
        |  CAST(ROW_NUMBER() OVER w AS INTEGER) AS order_rank,
        |  CAST(lag(CAST(o_totalprice AS DECIMAL(15,2)), 1) OVER w
        |    AS DOUBLE) AS prev_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_rank""".stripMargin,

    "g1_rollup" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "g2_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_qty,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,

    "w5_rank_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS DOUBLE) AS price,
        |  CAST(ROW_NUMBER() OVER wu AS INTEGER) AS rn,
        |  CAST(RANK() OVER wp AS INTEGER) AS rk,
        |  CAST(DENSE_RANK() OVER wp AS INTEGER) AS drk,
        |  PERCENT_RANK() OVER wp AS pr,
        |  CUME_DIST() OVER wp AS cd,
        |  CAST(NTILE(4) OVER wu AS INTEGER) AS nt
        |FROM orders
        |WINDOW
        |  wp AS (PARTITION BY o_custkey
        |    ORDER BY CAST(o_totalprice AS DECIMAL(15,2)) DESC),
        |  wu AS (PARTITION BY o_custkey
        |    ORDER BY CAST(o_totalprice AS DECIMAL(15,2)) DESC, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,

    "g3_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |  (o_orderstatus, o_orderpriority), ())
        |ORDER BY g_status, g_prio,
        |  o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin,

    "u1_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |      AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |      AS sum_price
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, metric, value
        |FROM w UNPIVOT (value FOR metric IN (sum_qty, sum_price))
        |ORDER BY l_returnflag, metric""".stripMargin,

    "pv1_pivot_status" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "w2_sku_counter" ->
      """WITH existing AS (
        |  SELECT 'SKU-'
        |    || substr(regexp_replace(upper(p_type), '[^A-Z]', '', 'g'), 1, 3)
        |    || '-' || lpad(CAST(p_partkey % 90000 AS VARCHAR), 5, '0') AS sku
        |  FROM part WHERE p_partkey % 2 = 0),
        |mc AS (
        |  SELECT COALESCE(MAX(CAST(regexp_extract(sku, '([0-9]+)$', 1)
        |    AS BIGINT)), 0) AS max_ctr
        |  FROM existing)
        |SELECT p_partkey,
        |  'SKU-'
        |    || substr(regexp_replace(upper(p_type), '[^A-Z]', '', 'g'), 1, 3)
        |    || '-' || lpad(CAST(max_ctr + ROW_NUMBER()
        |      OVER (ORDER BY p_partkey) AS VARCHAR), 5, '0') AS sku
        |FROM part, mc WHERE p_partkey % 2 = 1
        |ORDER BY p_partkey""".stripMargin,

    "q18_big_orders" ->
      """SELECT o_orderkey, o_custkey, total_qty FROM orders
        |JOIN (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |      AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |    > 150.0
        |) big ON o_orderkey = big.l_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "q16_not_in" ->
      """SELECT p_brand, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (
        |  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size LIMIT 25""".stripMargin,
  )
}
