package graft

import graft.ops.IncrementalAgg
import graft.ops.IncrementalAgg.Measure
import graft.streaming.StreamingSummary
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingSummarySpec extends SparkSpec {

  test("streamed summary equals full recompute over all delta files") {
    val root = Files.createTempDirectory("graft_ss").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice")
    // three delta files landing over time
    (0 to 2).foreach { i =>
      li.filter(col("l_quantity").cast("long") % 3 === i)
        .coalesce(1).write.parquet(s"$root/in/batch_$i")
    }
    // flatten: the stream source reads files under one dir
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    (0 to 2).foreach { i =>
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/in/batch_$i"))
        .filter(_.getPath.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, j) =>
          fs.rename(f.getPath,
            new org.apache.hadoop.fs.Path(s"$root/deltas/b${i}_$j.parquet"))
        }
    }

    val keys = Seq("l_returnflag", "l_linestatus")
    val measures = Seq(
      Measure("sum_qty", "l_quantity", "sum"),
      Measure("max_price", "l_extendedprice", "max"))
    val summary = StreamingSummary.maintainFromFiles(spark,
      s"$root/deltas", li.schema, s"$root/ckpt", s"$root/summary",
      keys, measures)

    val full = IncrementalAgg.summarize(li, keys, measures)
    val cols = (keys ++ Seq("n", "sum_qty", "max_price")).map(col)
    assert(summary.select(cols: _*).orderBy(keys.map(col): _*)
      .collect().toSeq ===
      full.select(cols: _*).orderBy(keys.map(col): _*).collect().toSeq)

    // late-arriving fourth delta: resume from checkpoint, only it folds
    li.limit(50).coalesce(1).write.parquet(s"$root/in/batch_3")
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/in/batch_3"))
      .filter(_.getPath.getName.endsWith(".parquet")).zipWithIndex
      .foreach { case (f, j) =>
        fs.rename(f.getPath,
          new org.apache.hadoop.fs.Path(s"$root/deltas/b3_$j.parquet"))
      }
    val summary2 = StreamingSummary.maintainFromFiles(spark,
      s"$root/deltas", li.schema, s"$root/ckpt", s"$root/summary",
      keys, measures)
    val full2 = IncrementalAgg.summarize(li.unionByName(li.limit(50)),
      keys, measures)
    assert(summary2.select(cols: _*).orderBy(keys.map(col): _*)
      .collect().toSeq ===
      full2.select(cols: _*).orderBy(keys.map(col): _*).collect().toSeq)
  }
}
