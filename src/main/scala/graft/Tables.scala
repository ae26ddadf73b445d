package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver-generated parquet tables (TESTDATA.md) plus
  * deterministic-aggregation helpers used by every oracle-checked query.
  *
  * Determinism note: double-sum order differs between Spark (parallel,
  * partition-order) and DuckDB (sequential). To make results hash-comparable
  * we do per-row arithmetic in DOUBLE (bit-identical IEEE in both engines),
  * cast the row value to DECIMAL(18,4) (same rounding both sides), sum
  * exactly (decimal addition is associative), and cast the total back to
  * DOUBLE. The mirrored SQL pattern is
  * `CAST(SUM(CAST(expr AS DECIMAL(18,4))) AS DOUBLE)`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark rejects
    * (PARQUET_TYPE_ILLEGAL). Read nanos as long and convert to a regular
    * (microsecond) timestamp with integer division — `div`, not `/`,
    * because double division loses precision above 2^53 ns. DuckDB's
    * TIMESTAMP_NS→TIMESTAMP cast truncates identically. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events").withColumn("ts",
      timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Name-dispatched loader that routes through the TYPED readers —
    * `load("events")` without the nanosAsLong conf throws
    * PARQUET_TYPE_ILLEGAL (this was the bench warm-up's anonymous
    * aborted-job stack in rounds 5-6). */
  def table(s: SparkSession, d: String, name: String): DataFrame =
    name match {
      case "events" => events(s, d)
      case other => load(s, d, other)
    }

  /** Exact (order-independent) sum of a double expression, surfaced as double. */
  def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact average: decimal sum cast to double, divided by count (IEEE-stable). */
  def davg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    dsum(c) / count(c)

  /** Money arithmetic must be decimal END-TO-END: a double MULTIPLY creates
    * values with arbitrary fraction tails, and double→decimal rounding of
    * those tails differs between Spark (HALF_UP on the shortest string
    * repr) and DuckDB (binary half-even) — observed 1e-4-per-row drift on
    * sf0.01. Casting the 2/4-decimal SOURCE values to decimal first is safe
    * (they sit ~1e-12 from the true decimal, never at a midpoint); decimal
    * ×/− are then exact in both engines. SQL mirror: CAST(x AS DECIMAL(15,2)).
    */
  def dec2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(DecimalType(15, 2))
  def dec4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(DecimalType(9, 4))
}
