package graft

import graft.sources.JsonlIO
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  test("roundtrip preserves nulls, unicode, quotes, and newlines-in-text") {
    val rows = Seq(
      (1L, "plain ascii text", "en"),
      (2L, "quotes \" and \\ backslash and tab\there", "en"),
      (3L, "unicode héllo 中文 😀 ₹42", "zh"),
      (4L, null.asInstanceOf[String], "de"),
      (5L, "embedded\nnewline", "fr"))
    val df = rows.toDF("id", "text", "lang")
    val path = "/tmp/graft_jsonl_spec"
    JsonlIO.write(df, path)
    val back = JsonlIO.read(spark, path, df.schema)
      .as[(Long, String, String)].collect()
      .map(t => (t._1, Option(t._2), t._3)).toSet
    assert(back === rows.map(t => (t._1, Option(t._2), t._3)).toSet)
  }

  test("roundtrip preserves float arrays exactly (shortest-repr JSON)") {
    val df = Seq((1L, Array(0.1f, -3.4028235e38f, 1.1754944e-38f, 42.0f)))
      .toDF("id", "vec")
    val path = "/tmp/graft_jsonl_vec"
    JsonlIO.write(df, path)
    val back = JsonlIO.read(spark, path, df.schema)
      .as[(Long, Array[Float])].collect().head
    assert(back._2.toSeq === Seq(0.1f, -3.4028235e38f, 1.1754944e-38f, 42.0f))
  }

  test("corrupt lines land in _corrupt_record instead of failing the read") {
    val path = "/tmp/graft_jsonl_corrupt"
    val dir = new java.io.File(path)
    dir.mkdirs()
    val pw = new java.io.PrintWriter(s"$path/part-00000.json")
    pw.println("""{"id": 1, "text": "good"}""")
    pw.println("""{"id": 2, "text": BROKEN""")
    pw.close()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    val got = JsonlIO.read(spark, path, schema)
      .select(col("id"), col("_corrupt_record").isNotNull.as("bad"))
      .as[(Option[Long], Boolean)].collect().toSet
    assert(got === Set((Some(1L), false), (None, true)))
  }

  test("writer emits one part file per partition, no coalesce") {
    val df = spark.range(1000).repartition(6).toDF("id")
    val path = "/tmp/graft_jsonl_parts"
    JsonlIO.write(df, path)
    val parts = new java.io.File(path).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(parts === 6)
  }
}
