package graft.queries

import graft.Tables
import graft.Tables.{dec2, dec4}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic star-schema analytics (TPC-H Q3/Q5/Q10 shapes) over the test
  * tables — the "answer business questions over the DW" workload the
  * reference's target warehouse exists to serve. These are the
  * bench-weight queries: multi-join + aggregation + sort at fact scale.
  *
  * Scale shape: region/nation/supplier/customer broadcast; the
  * lineitem⋈orders key join is the only real shuffle, and AQE picks the
  * strategy.
  */
object AnalyticQueries {

  type Q = (SparkSession, String) => DataFrame

  private def net = sum(dec2(col("l_extendedprice"))
    * (lit(1).cast("decimal(9,4)") - dec4(col("l_discount"))))
    .cast("double")

  def queries: Map[String, Q] = Map(
    // ---- Q3 shape: top unshipped orders by revenue ----------------------
    "q3_order_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment") === "BUILDING"
          && col("o_orderstatus") =!= "F")
        .groupBy(col("l_orderkey"),
          col("o_orderdate").cast("date").as("order_date"),
          col("o_orderpriority"))
        .agg(net.as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    }),

    // ---- Q5 shape: revenue by supplier nation ---------------------------
    "q5_nation_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      li.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(net.as("revenue"), count(lit(1)).as("n_lines"))
        .orderBy(col("r_name"), col("revenue").desc, col("n_name"))
    }),

    // ---- Q10 shape: returned-item customers by lost revenue -------------
    "q10_returned_customers" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      li.filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(net.as("lost_revenue"), count(lit(1)).as("n_lines"))
        .orderBy(col("lost_revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // ---- Q7 shape: volume shipping between two nations by year ----------
    "q7_volume_shipping" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val n1 = Tables.nation(s, d).select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d).select(col("n_nationkey").as("c_nk"),
        col("n_name").as("cust_nation"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_18"
            && col("cust_nation") === "NATION_19")
          || (col("supp_nation") === "NATION_19"
            && col("cust_nation") === "NATION_18"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(net.as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // ---- Q8 shape: a nation's market share within a region by year ------
    "q8_market_share" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val p = Tables.part(s, d)
      val n1 = Tables.nation(s, d).select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d).select(col("n_nationkey").as("c_nk"),
        col("n_regionkey").as("c_rk"))
      val r = Tables.region(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(col("p_type") === "PROMO")
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .join(broadcast(r), col("c_rk") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .withColumn("vol", dec2(col("l_extendedprice"))
          * (lit(1).cast("decimal(9,4)") - dec4(col("l_discount"))))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        // decimal sums are exact; the double division of the two exact
        // casts is IEEE-identical across engines
        .agg((sum(when(col("supp_nation") === "NATION_19", col("vol"))
            .otherwise(lit(0))).cast("double")
          / sum(col("vol")).cast("double")).as("mkt_share"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("o_year"))
    }),

    // ---- Q12 shape: priority mix of late shipments by line status -------
    "q12_late_priority" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }),

    // ---- Q14 shape: promo revenue share by ship month -------------------
    "q14_promo_share" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .withColumn("vol", dec2(col("l_extendedprice"))
          * (lit(1).cast("decimal(9,4)") - dec4(col("l_discount"))))
        .groupBy((year(col("l_shipdate")) * 100
          + month(col("l_shipdate"))).as("ship_month"))
        .agg((sum(when(col("p_type") === "PROMO", col("vol"))
            .otherwise(lit(0))).cast("double") * lit(100.0)
          / sum(col("vol")).cast("double")).as("promo_share"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("ship_month"))
    }),

    // ---- Q15 shape: supplier(s) achieving the maximum revenue ----------
    "q15_top_supplier" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      // range predicate, not year(): a function over the column defeats
      // parquet row-group stats pruning; between reaches PushedFilters
      val rev = li.filter(col("l_shipdate")
          .between("1997-01-01", "1997-12-31"))
        .groupBy(col("l_suppkey"))
        .agg(net.as("total_rev"))
      val maxRev = rev.agg(max(col("total_rev")).as("mr"))
      rev.join(broadcast(maxRev), col("total_rev") === col("mr"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
        .orderBy(col("s_suppkey"))
    }),

    // ---- Q2 shape: which supplier ships each part cheapest -------------
    "q2_min_price_supplier" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      val p = Tables.part(s, d)
      val minp = li.groupBy(col("l_partkey"))
        .agg(min(col("l_extendedprice")).as("min_price")).alias("m")
      li.alias("l").join(minp,
          col("l.l_partkey") === col("m.l_partkey")
            && col("l.l_extendedprice") === col("m.min_price"))
        .select(col("l.l_partkey").as("partkey"),
          col("l.l_suppkey").as("l_suppkey"), col("m.min_price"))
        .distinct()
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(p), col("partkey") === col("p_partkey"))
        .select(col("partkey"), col("p_name"), col("s_name"),
          col("min_price"))
        .orderBy(col("partkey"), col("s_name"))
        .limit(100)
    }),

    // ---- SCD2 as-of resolution against a deterministic version history:
    // part "price versions" exist only for even ship-years (min price,
    // effective Jan 1), so odd-year facts genuinely resolve backwards
    "sc1_scd2_resolve" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val history = li.filter(year(col("l_shipdate")) % 2 === 0)
        .groupBy(col("l_partkey"), year(col("l_shipdate")).as("vy"))
        .agg(min(dec2(col("l_extendedprice"))).cast("double")
          .as("min_price"))
        .select(col("l_partkey"),
          to_timestamp(make_date(col("vy"), lit(1), lit(1)))
            .as("scd_start"),
          col("min_price"), col("vy").as("scd_version"))
      val facts = li.select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("l_extendedprice"),
        col("l_shipdate"))
      graft.ops.Scd2.resolveAtTime(facts, history, Seq("l_partkey"),
        "l_shipdate", attrs = Seq("min_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    }),

    // ---- Q21 shape: sole late-shipping supplier on multi-supplier orders
    // (no commit/receipt dates in the synthetic schema, so "late" is
    // reshaped to shipped >90 days after the order date)
    "q21_late_suppliers" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val su = Tables.supplier(s, d)
      // EXISTS(other supplier) ∧ NOT EXISTS(other late supplier) ≡
      // per-order: distinct suppliers > 1 ∧ late suppliers == 1 — the
      // decorrelated form, as two pipelined aggregations (per-pair late
      // flag, then per-order counts) instead of semi+anti re-joins.
      // Deliberately NOT countDistinct×2: multiple distinct aggregates
      // plan an Expand that triples the rows into the shuffle.
      val isLate = max(when(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1).otherwise(0))
      val perPair = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(isLate.as("is_late"))
      val perOrder = perPair.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("is_late")).as("n_late"),
          max(when(col("is_late") === 1, col("l_suppkey"))).as("late_sk"))
        .filter(col("n_supp") > 1 && col("n_late") === 1)
      perOrder.join(broadcast(su), col("late_sk") === col("s_suppkey"))
        .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(20)
    }),

    // ---- Q4 shape: priority mix of orders with a late line (EXISTS) -----
    // (no commit/receipt dates in the synthetic schema: "late" is shipped
    // >60 days after the order date, which needs the parent order row, so
    // the EXISTS is a conditioned semi join, not a bare key semi join)
    "q4_priority_exists" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= "1996-01-01"
          && col("o_orderdate") < "1996-07-01")
      o.join(li,
          col("o_orderkey") === col("l_orderkey")
            && col("l_shipdate") >
              col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // ---- Q6 shape: forecast-revenue-change scalar aggregate -------------
    "q6_forecast_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        // date RANGE instead of year(): pushes to the parquet scan
        .filter(col("l_shipdate").between("1997-01-01", "1997-12-31")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(sum(dec2(col("l_extendedprice")) * dec4(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // ---- Q9 shape: profit by supplier nation and year -------------------
    // (no partsupp/supplycost in the synthetic schema: line cost is
    // quantity x part list price, revenue is the discounted price)
    "q9_profit_nation_year" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d).filter(col("p_name").contains("widget"))
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val amount = (dec2(col("l_extendedprice"))
        * (lit(1).cast("decimal(9,4)") - dec4(col("l_discount"))))
        .minus(dec2(col("p_retailprice")) * dec2(col("l_quantity")))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("l_shipdate")).as("o_year"))
        .agg(sum(amount).cast("double").as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // ---- Q13 shape: customer distribution by order count ----------------
    // left outer join so zero-order customers land in the c_count=0 bucket
    "q13_custdist" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val perCust = c.join(o, col("c_custkey") === col("o_custkey"),
          "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // ---- Q17 shape: revenue from small-quantity lines vs part average ---
    "q17_small_quantity" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d).filter(col("p_type") === "MEDIUM")
      // per-part avg over integer-valued doubles: the sum is exact in
      // IEEE double, so avg*0.2 is bit-identical in DuckDB
      val avgq = li.groupBy(col("l_partkey").as("ap"))
        .agg((avg(col("l_quantity")) * 0.2).as("qty_floor"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(avgq, col("l_partkey") === col("ap"))
        .filter(col("l_quantity") < col("qty_floor"))
        .agg((Tables.dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    }),

    // ---- Q19 shape: disjunctive brand/size/quantity predicate join ------
    "q19_disjunctive" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val pred =
        (col("p_brand") === "Brand#11" && col("p_size").between(1, 15)
          && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 25)
          && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 35)
          && col("l_quantity").between(20, 30))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey") && pred)
        .agg(net.as("revenue"), count(lit(1)).as("n_lines"))
    }),

    // ---- Q11 shape: suppliers whose revenue share exceeds a threshold ---
    // (no partsupp in the synthetic schema: "value" is shipped revenue)
    "q11_value_share" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      // Per-supplier revenue stays DECIMAL through the aggregate; the
      // grand total is the sum of those per-supplier decimals — exact
      // and accumulation-order-independent, so it equals the oracle's
      // direct whole-table decimal sum bit for bit. The tiny aggregate
      // is materialized ONCE (eager localCheckpoint — O(n_suppliers)
      // narrow rows) and feeds both the probe side and the total, so
      // lineitem is scanned exactly once; per-branch column pruning
      // otherwise de-duplicates the two partial aggregates and defeats
      // ReuseExchange, silently re-reading the fact table. PlanSpec
      // pins the single-scan shape.
      val netDec = sum(dec2(col("l_extendedprice"))
        * (lit(1).cast("decimal(9,4)") - dec4(col("l_discount"))))
      val rev = li.groupBy(col("l_suppkey"))
        .agg(netDec.as("supp_rev_dec"), count(lit(1)).as("n_lines"))
        .localCheckpoint(true)
      val total = rev.agg(
        sum(col("supp_rev_dec")).cast("double").as("total_rev"))
      rev.crossJoin(broadcast(total))
        .select(col("l_suppkey"),
          col("supp_rev_dec").cast("double").as("supp_rev"),
          col("n_lines"), col("total_rev"))
        .filter(col("supp_rev") > col("total_rev") * 0.011)
        .select(col("l_suppkey"), col("supp_rev"), col("n_lines"))
        .orderBy(col("supp_rev").desc, col("l_suppkey"))
    }),

    // ---- Q22 shape: high-balance customers with no recent orders --------
    "q22_cold_customers" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val n = Tables.nation(s, d)
      // davg = exact decimal sum / count — bit-identical across engines
      // (plain double avg is accumulation-order-dependent)
      val avgBal = c.filter(col("c_acctbal") > 0)
        .agg(Tables.davg(col("c_acctbal")).as("ab"))
      val recent = o.filter(col("o_orderdate") >= "1999-01-01")
        .select(col("o_custkey")).distinct()
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("ab"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("numcust"),
          Tables.dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("n_name"))
    }),

    // ---- Q20 shape: suppliers shipping large volumes of matching parts --
    "q20_part_supply" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d).filter(col("p_name").startsWith("small"))
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d).filter(col("n_name") === "NATION_3")
      val bigShippers = li
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity")).as("ship_qty"))
        .filter(col("ship_qty") > 100)
        .select(col("l_suppkey")).distinct()
      // the big-shipper key set is usually tiny (suppliers moving >100
      // qty of 'small%' parts) but scales with the SUPPLIER dimension —
      // ~1e9 keys at SF100k — so a hard broadcast() hint here would be
      // a driver-OOM cliff at scale. Left to AQE: it converts the semi
      // join to broadcast at runtime exactly when the key set is small.
      // (r6's 0.5→1.5 s move on this query was machine contention; the
      // warm plan re-times at the r5 number.)
      su.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(bigShippers, col("s_suppkey") === col("l_suppkey"),
          "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    }),
  )

  private val netSql = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) " +
    "* (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))) " +
    "AS DOUBLE)"

  def oracles: Map[String, String] = Map(
    "q3_order_revenue" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
         |  o_orderpriority, $netSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING' AND o_orderstatus <> 'F'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin,

    "q5_nation_revenue" ->
      s"""SELECT r_name, n_name, $netSql AS revenue, COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name
         |ORDER BY r_name, revenue DESC, n_name""".stripMargin,

    "q10_returned_customers" ->
      s"""SELECT c_custkey, c_name, n_name, $netSql AS lost_revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |GROUP BY 1, 2, 3
         |ORDER BY lost_revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
         |  $netSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
         |   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      """WITH vols AS (
        |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
        |    n1.n_name AS supp_nation,
        |    CAST(l_extendedprice AS DECIMAL(15,2))
        |      * (CAST(1 AS DECIMAL(9,4))
        |         - CAST(l_discount AS DECIMAL(9,4))) AS vol
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  JOIN region ON n2.n_regionkey = r_regionkey
        |  WHERE p_type = 'PROMO' AND r_name = 'ASIA')
        |SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_19' THEN vol
        |           ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share,
        |  COUNT(*) AS n_lines
        |FROM vols GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q12_late_priority" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q14_promo_share" ->
      """WITH v AS (
        |  SELECT CAST(EXTRACT(YEAR FROM l_shipdate) * 100
        |      + EXTRACT(MONTH FROM l_shipdate) AS INT) AS ship_month,
        |    p_type,
        |    CAST(l_extendedprice AS DECIMAL(15,2))
        |      * (CAST(1 AS DECIMAL(9,4))
        |         - CAST(l_discount AS DECIMAL(9,4))) AS vol
        |  FROM lineitem JOIN part ON l_partkey = p_partkey)
        |SELECT ship_month,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vol ELSE 0 END)
        |    AS DOUBLE) * 100.0 / CAST(SUM(vol) AS DOUBLE) AS promo_share,
        |  COUNT(*) AS n_lines
        |FROM v GROUP BY ship_month ORDER BY ship_month""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, $netSql AS total_rev
         |  FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_rev
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q2_min_price_supplier" ->
      """WITH minp AS (
        |  SELECT l_partkey, MIN(l_extendedprice) AS min_price
        |  FROM lineitem GROUP BY 1),
        |sel AS (
        |  SELECT DISTINCT l.l_partkey AS partkey, l.l_suppkey, m.min_price
        |  FROM lineitem l JOIN minp m ON l.l_partkey = m.l_partkey
        |    AND l.l_extendedprice = m.min_price)
        |SELECT partkey, p_name, s_name, min_price
        |FROM sel JOIN supplier ON l_suppkey = s_suppkey
        |JOIN part ON partkey = p_partkey
        |ORDER BY partkey, s_name LIMIT 100""".stripMargin,

    "sc1_scd2_resolve" ->
      """WITH h AS (
        |  SELECT l_partkey,
        |    CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS vy,
        |    CAST(MIN(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE)
        |      AS min_price
        |  FROM lineitem
        |  WHERE EXTRACT(YEAR FROM l_shipdate) % 2 = 0
        |  GROUP BY 1, 2)
        |SELECT f.l_orderkey, f.l_linenumber, f.l_partkey, f.l_suppkey,
        |  f.l_extendedprice, f.l_shipdate,
        |  (SELECT h.min_price FROM h
        |   WHERE h.l_partkey = f.l_partkey
        |     AND h.vy <= EXTRACT(YEAR FROM f.l_shipdate)
        |   ORDER BY h.vy DESC LIMIT 1) AS min_price_asof,
        |  (SELECT h.vy FROM h
        |   WHERE h.l_partkey = f.l_partkey
        |     AND h.vy <= EXTRACT(YEAR FROM f.l_shipdate)
        |   ORDER BY h.vy DESC LIMIT 1) AS scd_version_asof
        |FROM lineitem f
        |ORDER BY f.l_orderkey, f.l_linenumber, f.l_partkey, f.l_suppkey,
        |  f.l_extendedprice""".stripMargin,

    "q21_late_suppliers" ->
      """WITH late AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY),
        |pairs AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM late l1 JOIN supplier ON l1.sk = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM pairs l2
        |              WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.ok = l1.ok AND l3.sk <> l1.sk)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q4_priority_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= DATE '1996-01-01'
        |  AND o_orderdate < DATE '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
        |    * CAST(l_discount AS DECIMAL(9,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q9_profit_nation_year" ->
      """SELECT n_name AS nation,
        |  CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
        |      * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))
        |      - CAST(p_retailprice AS DECIMAL(15,2))
        |      * CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q13_custdist" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM per_cust GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q17_small_quantity" ->
      """WITH avgq AS (
        |  SELECT l_partkey AS ap, AVG(l_quantity) * 0.2 AS qty_floor
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN avgq ON l_partkey = ap
        |WHERE p_type = 'MEDIUM' AND l_quantity < qty_floor""".stripMargin,

    "q19_disjunctive" ->
      s"""SELECT $netSql AS revenue, COUNT(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q11_value_share" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, $netSql AS supp_rev, COUNT(*) AS n_lines
         |  FROM lineitem GROUP BY 1),
         |total AS (SELECT $netSql AS total_rev FROM lineitem)
         |SELECT l_suppkey, supp_rev, n_lines
         |FROM rev, total
         |WHERE supp_rev > total_rev * 0.011
         |ORDER BY supp_rev DESC, l_suppkey""".stripMargin,

    "q22_cold_customers" ->
      """WITH ab AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |    / COUNT(c_acctbal) AS ab
        |  FROM customer WHERE c_acctbal > 0),
        |recent AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= DATE '1999-01-01')
        |SELECT n_name, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |    AS totacctbal
        |FROM customer, ab
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > ab
        |  AND c_custkey NOT IN (SELECT o_custkey FROM recent)
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q20_part_supply" ->
      """WITH big AS (
        |  SELECT DISTINCT l_suppkey
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING SUM(l_quantity) > 100)
        |SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3'
        |  AND s_suppkey IN (SELECT l_suppkey FROM big)
        |ORDER BY s_suppkey""".stripMargin,
  )
}
