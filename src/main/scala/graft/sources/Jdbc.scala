package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S1/S9: JDBC source/sink configuration, parameterized the way the
  * reference talks to Oracle (explicit SELECT pushdown, batched writes
  * with a single transaction per partition). No driver jar ships in this
  * environment, so connect paths are exercised in deployments only; the
  * option assembly is unit-testable and the parquet scans in Tables
  * stand in for S1 everywhere else.
  */
object Jdbc {

  final case class JdbcConfig(
      url: String,
      user: String,
      password: String,
      fetchSize: Int = 10000,
      batchSize: Int = 10000,
      /** Partition the read by a numeric column for parallel extraction:
        * (column, lowerBound, upperBound, numPartitions). */
      partitionRead: Option[(String, Long, Long, Int)] = None)

  /** Options for reading `query` (pushdown happens in the database —
    * exactly the reference's hand-written SELECT ... WHERE).
    * Spark forbids combining the `query` option with partitionColumn, so
    * partitioned reads wrap the query as a dbtable subquery alias. */
  def readOptions(cfg: JdbcConfig, query: String): Map[String, String] = {
    val base = Map(
      "url" -> cfg.url, "user" -> cfg.user, "password" -> cfg.password,
      "fetchsize" -> cfg.fetchSize.toString)
    cfg.partitionRead match {
      case Some((col, lo, hi, n)) => base ++ Map(
        "dbtable" -> s"($query) graft_sub",
        "partitionColumn" -> col, "lowerBound" -> lo.toString,
        "upperBound" -> hi.toString, "numPartitions" -> n.toString)
      case None => base + ("query" -> query)
    }
  }

  /** Options for a batched append (the reference's executemany +
    * single-commit maps to per-partition transactions with `batchsize`). */
  def writeOptions(cfg: JdbcConfig, table: String): Map[String, String] =
    Map("url" -> cfg.url, "user" -> cfg.user, "password" -> cfg.password,
      "dbtable" -> table, "batchsize" -> cfg.batchSize.toString,
      "isolationLevel" -> "READ_COMMITTED")

  def read(spark: SparkSession, cfg: JdbcConfig, query: String): DataFrame =
    spark.read.format("jdbc").options(readOptions(cfg, query)).load()

  def append(df: DataFrame, cfg: JdbcConfig, table: String): Unit =
    df.write.format("jdbc").options(writeOptions(cfg, table))
      .mode(SaveMode.Append).save()
}
