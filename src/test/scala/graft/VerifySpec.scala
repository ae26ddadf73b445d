package graft

import org.apache.spark.sql.functions._

/** The digests.json fingerprint exists to diagnose driver-red cells, so
  * its invariants are load-bearing: stable under column/row order,
  * sensitive to value shifts across columns, null distinguishable from
  * the string "NULL". */
class VerifySpec extends SparkSpec {

  test("digest is invariant to column and row order") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((2L, "y"), (1L, "x")).toDF("id", "v")
      .select(col("v"), col("id")) // different row AND column order
    assert(Verify.digest(a) === Verify.digest(b))
  }

  test("digest separates fields: cross-column value shifts differ") {
    import spark.implicits._
    val a = Seq(("ab", "c")).toDF("x", "y")
    val b = Seq(("a", "bc")).toDF("x", "y")
    assert(Verify.digest(a)._1 !== Verify.digest(b)._1)
  }

  test("null is not the string NULL; doubles keep full precision") {
    import spark.implicits._
    val a = Seq((1L, Option.empty[String])).toDF("id", "v")
    val b = Seq((1L, Option("NULL"))).toDF("id", "v")
    assert(Verify.digest(a)._1 !== Verify.digest(b)._1)
    val c = Seq((1L, 0.1 + 0.2)).toDF("id", "v")
    val d = Seq((1L, 0.3)).toDF("id", "v")
    assert(Verify.digest(c)._1 !== Verify.digest(d)._1)
  }

  test("canon renders containers and decimals stably") {
    assert(Verify.canon(Seq(1.5, 2.0)) === "[1.5,2.0]")
    assert(Verify.canon(new java.math.BigDecimal("12.3400")) === "12.3400")
    assert(Verify.canon(Array[Byte](0x0a, 0x7f)) === "0a7f")
  }

  test("dumpAll surfaces construction failures instead of dropping them") {
    import spark.implicits._
    val outDir = java.nio.file.Files
      .createTempDirectory("graft-verify").toFile.getAbsolutePath
    val queries = Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame)](
      "ok_query" -> ((s, _) => { import s.implicits._; Seq(1, 2).toDF("n") }),
      "boom_query" -> ((_, _) =>
        throw new IllegalStateException("induced: first line\nsecond line")))
    val (digests, errors) = Verify.dumpAll(spark, "unused", outDir, queries)
    // the good query dumped and digested; the failure got a sentinel digest
    assert(spark.read.parquet(s"$outDir/ok_query").count() === 2L)
    assert(digests("ok_query").contains("\"rows\":2"))
    assert(digests("boom_query") === """{"digest":null,"rows":-1}""")
    // and a first-line-only error entry the artifact will carry
    assert(errors === Map("boom_query" -> "induced: first line"))
  }
}
