package graft

import graft.validate.Validator
import org.apache.spark.sql.functions._

/** Error-bound pins for the sketch profile: approximate values can't be
  * hash-compared across engines, so correctness here means "within the
  * sketch's advertised error of the exact aggregate". */
class ChecksApproxSpec extends SparkSpec {

  test("approxProfile: within advertised error of exact aggregates") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val cols = Seq("l_extendedprice", "l_partkey", "l_quantity")
    val prof = Validator.approxProfile(li, cols, rsd = 0.05)
      .collect().map(r => r.getString(0) -> r).toMap

    cols.foreach { c =>
      val exact = li.agg(
        min(col(c)).cast("double"), max(col(c)).cast("double"),
        count(col(c)), countDistinct(col(c)),
        expr(s"percentile(CAST($c AS DOUBLE), 0.5)")).collect()(0)
      val p = prof(c)
      assert(p.getDouble(1) === exact.getDouble(0)) // min exact
      assert(p.getDouble(2) === exact.getDouble(1)) // max exact
      assert(p.getLong(3) === exact.getLong(2))     // count exact
      val distErr = math.abs(p.getLong(4).toDouble - exact.getLong(3))
        ./(exact.getLong(3).toDouble)
      assert(distErr < 0.10, s"$c approx_distinct off by $distErr")
      // median within 2% of the value range
      val range = exact.getDouble(1) - exact.getDouble(0)
      val medErr = math.abs(p.getDouble(5) - exact.getDouble(4)) / range
      assert(medErr < 0.02, s"$c approx_median off by $medErr of range")
    }
  }
}
