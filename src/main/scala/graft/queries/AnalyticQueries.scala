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
  )
}
