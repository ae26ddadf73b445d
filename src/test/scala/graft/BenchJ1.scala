package graft

/** Forensics for the r13 j1_star_snapshot official swing (0.583 →
  * 2.184 s): time the gate under bench-identical settings, then the
  * same plan with the global sort dropped and with count() replaced by
  * a write-free noop action, to split scan/join cost from the
  * order-by materialization. Run:
  *   sbt "Test/runMain graft.BenchJ1"
  */
object BenchJ1 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(tag: String, n: Int = 5)(f: => Unit): Unit = {
      val runs = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[j1bench] $tag: min=${runs.min}%.3f " +
        s"runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    // warm-up at sf0.001 like Bench
    CacheScope.withScope { _ =>
      SparkEntry.queries("j1_star_snapshot")(spark,
        "/root/testdata/sf0.001").count()
    }
    val q = SparkEntry.queries("j1_star_snapshot")
    time("j1 full (bench shape)") {
      CacheScope.withScope { _ => q(spark, sf).count() }
    }
    // same chain without the global sort
    import org.apache.spark.sql.functions._
    def noSort() = {
      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf)
      val p = Tables.part(spark, sf)
      val su = Tables.supplier(spark, sf)
      val n = Tables.nation(spark, sf)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"),
          col("l_shipdate").cast("date").as("ship_date"),
          col("o_custkey"), col("o_orderstatus"),
          col("o_orderdate").cast("date").as("order_date"),
          col("o_totalprice"),
          col("p_name"), col("p_brand"), col("p_type"),
          col("p_retailprice"), col("s_name"), col("s_acctbal"),
          col("n_name").as("supp_nation"))
    }
    time("j1 without orderBy") { noSort().count() }
    time("j1 orderBy, no count (noop foreach)") {
      noSort().orderBy(col("l_orderkey"), col("l_linenumber"))
        .foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
    }
    time("lineitem scan only") {
      Tables.lineitem(spark, sf).count()
    }
    spark.stop()
  }
}
