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

  test("approxProfileChecked: bound booleans hold on real data") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val rows = Validator.approxProfileChecked(li,
      Seq("l_extendedprice", "l_partkey", "l_quantity")).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"${r.getString(0)} distinct_ok false")
      assert(r.getBoolean(5), s"${r.getString(0)} median_ok false")
    }
  }

  test("V9: unsafe identifiers are rejected at check entry") {
    import graft.validate._
    val df = strDf(Seq("x"), "ok_col$1")
    // safe: alphanumeric + _ $ # up to 128 chars
    Validator.run(df, Seq(NoNulls(Seq("ok_col$1")))).collect()
    val bad = Seq("a;DROP TABLE t", "a b", "a\"b", "", "x" * 129,
      "col--comment")
    bad.foreach { name =>
      val e = intercept[IllegalArgumentException] {
        Validator.run(df, Seq(NoNulls(Seq(name))))
      }
      assert(e.getMessage.contains("Unsafe table/column name"), name)
    }
    val e2 = intercept[IllegalArgumentException] {
      Validator.suite(Seq(("tbl;--", df, Seq(MinRows(1)))))
    }
    assert(e2.getMessage.contains("Unsafe table/column name"))
    // every Check type routes through the guard
    Seq[Check](MandatoryColumns(Seq("bad name")),
      NumericParsable(Seq("bad name")), FlagDomain(Seq("bad name")),
      PkUnique(Seq("bad name")), Freshness("bad name", "2024-01-01"))
      .foreach { c =>
        intercept[IllegalArgumentException](Validator.run(df, Seq(c)))
      }
  }
}
