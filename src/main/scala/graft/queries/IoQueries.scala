package graft.queries

import graft.Tables
import graft.sources.CsvIO
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate coverage for the file-interchange layer (SURVEY §2.1 S2-S4) and
  * the multimodal plumbing. The CSV query actually round-trips bytes
  * through a pipe-delimited file (write → all-string read → typed cast)
  * so a delimiter/quoting/null-token regression breaks the hash match.
  */
object IoQueries {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // ---- S2/S3/S4: pipe CSV write → all-string read → typed cast --------
    "s2_csv_roundtrip" -> ((s, d) => {
      val sfTag = d.replaceAll("[^a-zA-Z0-9.]", "_")
      val path = s"/tmp/graft_csv_roundtrip_$sfTag"
      val src = Tables.orders(s, d).select(
        col("o_orderkey").cast("string").as("o_orderkey"),
        // inject the reference's null token for some rows
        when(col("o_orderkey") % 9 === 0, lit("NULL"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"),
        col("o_totalprice").cast("decimal(12,2)").cast("string")
          .as("o_totalprice"),
        date_format(col("o_orderdate").cast("date"), "yyyy-MM-dd")
          .as("o_orderdate"))
      CsvIO.write(src, path, sep = "|")
      // typed cast goes through DECIMAL(12,2) (file semantics) but lands on
      // DOUBLE for driver-hash canonicalization.
      CsvIO.readAllString(s, path, sep = "|")
        .select(col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_orderstatus"),
          col("o_totalprice").cast("decimal(12,2)").cast("double")
            .as("o_totalprice"),
          col("o_orderdate").cast("date").as("o_orderdate"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- multimodal metadata path (payload bytes untouched) -------------
    "m1_multimodal_meta" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Multimodal.toMedia(
        docs.withColumn("payload", col("text").cast("binary")),
        "doc_id", "payload", "image", "png",
        width = (col("doc_id") % 4 + 1) * lit(320), height = lit(240))
        .filter(col("meta.width") >= 640)
        .select(col("media_id"), col("meta.media_type").as("media_type"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.size_bytes").as("size_bytes"))
        .orderBy(col("media_id"))
    }),

    // ---- multimodal frame-sampling shape (1 video → n frame rows) -------
    "m2_frame_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val media = Multimodal.toMedia(
        docs.withColumn("payload", col("text").cast("binary")),
        "doc_id", "payload", "video", "mp4",
        width = lit(640), height = lit(480))
      Multimodal.sampleFrames(media, 4)
        .select(col("media_id"), col("frame_idx"))
        .orderBy(col("media_id"), col("frame_idx"))
    }),
  )

  def oracles: Map[String, String] = Map(
    "s2_csv_roundtrip" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 9 = 0 THEN NULL
        |       ELSE o_orderstatus END AS o_orderstatus,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
        |  CAST(o_orderdate AS DATE) AS o_orderdate
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "m1_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'image' AS media_type,
        |  CAST((doc_id % 4 + 1) * 320 AS INTEGER) AS width,
        |  240 AS height,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS size_bytes
        |FROM documents
        |WHERE (doc_id % 4 + 1) * 320 >= 640
        |ORDER BY media_id""".stripMargin,

    "m2_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx
        |FROM documents, generate_series(0, 3) t(f)
        |ORDER BY media_id, frame_idx""".stripMargin,
  )
}
