package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{AnalyticQueries, CleansingQueries, CoreQueries, CurationQueries, DataGenQueries, DateDimQueries, FilterQueries, GraphQueries, IoQueries, LlmQueries, OpsQueries, StreamQueries, ValidateQueries, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-area catalogs under graft.queries;
  * `oracleSql` carries the DuckDB-equivalent SQL for every query that is
  * SQL-expressible (non-expressible ops get a rows-only check).
  */
object SparkEntry {

  /** Flagship: net sales by brand and supplier nation over the full star
    * join — exercises scan, broadcast dim joins, fact-key join, agg, sort.
    * Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d  = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    val p  = Tables.part(spark, d)
    val su = Tables.supplier(spark, d)
    val n  = Tables.nation(spark, d)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("p_brand"), col("n_name"))
      .agg(Tables.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("net_sales"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"), col("n_name"))
  }

  private def catalogs = Seq(
    CoreQueries.queries -> CoreQueries.oracles,
    CleansingQueries.queries -> CleansingQueries.oracles,
    OpsQueries.queries -> OpsQueries.oracles,
    DateDimQueries.queries -> DateDimQueries.oracles,
    ValidateQueries.queries -> ValidateQueries.oracles,
    LlmQueries.queries -> LlmQueries.oracles,
    CurationQueries.queries -> CurationQueries.oracles,
    IoQueries.queries -> IoQueries.oracles,
    FilterQueries.queries -> FilterQueries.oracles,
    StreamQueries.queries -> StreamQueries.oracles,
    AnalyticQueries.queries -> AnalyticQueries.oracles,
    WindowQueries.queries -> WindowQueries.oracles,
    DataGenQueries.queries -> DataGenQueries.oracles,
    GraphQueries.queries -> GraphQueries.oracles,
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.map(_._1).reduce(_ ++ _)

  /** DuckDB-runnable equivalents (same column names, same ORDER BY). */
  def oracleSql: Map[String, String] =
    catalogs.map(_._2).reduce(_ ++ _)
}
