package graft

/** Dev tool: print the AQE-final formatted plan of a named query.
  * Usage: sbt 'Test/runMain graft.ExplainCheck <queryName> [sfDir]'
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "p2_filter_positive"
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSpec.session
    val df = SparkEntry.queries(name)(spark, d)
    df.collect() // let AQE finalize the plan
    df.explain("formatted")
    spark.stop()
  }
}
