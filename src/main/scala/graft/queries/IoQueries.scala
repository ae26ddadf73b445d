package graft.queries

import graft.Tables
import graft.sources.{CsvIO, FileResolver, JsonlIO, Layout, Ledger}
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

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
      val path = GateTmp.dir("graft_csv_roundtrip", d)
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

    // ---- ORC round-trip (the other columnar interchange format) ----------
    // write → read with Spark's built-in ORC source; the oracle is the
    // source table itself, so type mapping (long/string/double/date),
    // null preservation, and value fidelity are all under the hash.
    "io2_orc_roundtrip" -> ((s, d) => {
      val path = GateTmp.dir("graft_orc_roundtrip", d)
      Tables.orders(s, d).select(col("o_orderkey"),
          when(col("o_orderkey") % 9 === 0, lit(null).cast("string"))
            .otherwise(col("o_orderstatus")).as("o_orderstatus"),
          col("o_totalprice").cast("double").as("o_totalprice"),
          col("o_orderdate").cast("date").as("o_orderdate"))
        .write.mode("overwrite").orc(path)
      s.read.orc(path).orderBy(col("o_orderkey"))
    }),

    // ---- JSONL round-trip (corpus interchange format) --------------------
    // write → explicit-schema read; the oracle is the source table, so
    // any serialization loss (escaping, unicode, nulls, int width)
    // breaks the hash match.
    "io1_jsonl_roundtrip" -> ((s, d) => {
      val path = GateTmp.dir("graft_jsonl_roundtrip", d)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
      JsonlIO.write(docs, path)
      JsonlIO.read(s, path, docs.schema).orderBy(col("doc_id"))
    }),

    // ---- S5/S6/S7: the incremental file-control loop, end to end --------
    // Builds the reference's file lifecycle from scratch each run: three
    // pipe-CSV batch files land in staging/ (S2 writer), rotate into
    // current/ (S6), a ledger already records batch 003 as consumed, the
    // newest-first selection must therefore pick 002 (S5 — ascending
    // selection would pick 001 and change the file CONTENTS, breaking
    // the hash), the file is read back (S4) and marked processed (S7),
    // after which the next selection must fall back to 001. File
    // contents are modulo slices of orders, so DuckDB reconstructs the
    // expected rows — including which file was picked — from the table
    // alone.
    "s5_ledger_loop" -> ((s, d) => {
      val base = GateTmp.dir("graft_s5", d)
      val fs = new Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(base), true)
      val orders = Tables.orders(s, d)
      (1 to 3).foreach { n =>
        val slice = orders.filter(col("o_orderkey") % 3 === n % 3)
          .select(col("o_orderkey").cast("string").as("o_orderkey"),
            col("o_totalprice").cast("decimal(12,2)").cast("string")
              .as("o_totalprice"))
        val tmp = s"$base/tmp_$n"
        CsvIO.write(slice.coalesce(1), tmp, sep = "|")
        val part = fs.listStatus(new Path(tmp)).map(_.getPath)
          .find(_.getName.startsWith("part-")).get
        fs.mkdirs(new Path(s"$base/staging"))
        fs.rename(part, new Path(s"$base/staging/sales_00$n.csv"))
        fs.delete(new Path(tmp), true)
      }
      val moved = CsvIO.rotate(s, s"$base/staging", s"$base/current")
      require(moved == 3, s"rotation moved $moved files, expected 3")
      val ledgerPath = s"$base/ledger"
      Ledger.markProcessed(s, ledgerPath, "sales_003.csv",
        "2024-01-01T00:00:00")
      def files = Ledger.listFiles(s, s"$base/current", "sales_", ".csv")
      def ledger = s.read.parquet(ledgerPath)
      val next = Ledger.nextUnprocessed(files, ledger)
        .getOrElse(sys.error("no unprocessed file found"))
      val consumed = CsvIO.readAllString(s, s"$base/current/$next",
        sep = "|")
      Ledger.markProcessed(s, ledgerPath, next, "2024-01-01T01:00:00")
      val after = Ledger.nextUnprocessed(files, ledger).getOrElse("NONE")
      consumed.select(col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_totalprice").cast("decimal(12,2)").cast("double")
            .as("o_totalprice"),
          lit(next).as("processed_file"), lit(after).as("next_after"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- S6+S8: rotation then dated-glob walk-back, end to end ----------
    // Two dated extracts (sales_20240101 / sales_20240102) land in
    // staging/ and rotate into current/ (S6 — the read below only works
    // if rotation moved BOTH files). Resolution then asks for
    // 2024-01-05 with a 7-day walk-back (S8): days 05/04/03 match
    // nothing, so the resolver must substitute back to 20240102 —
    // picking 20240101 (too far) or failing (no walk-back) changes the
    // file CONTENTS and the matched-date column, breaking the hash.
    // Slices are modulo cuts of orders so DuckDB reconstructs the
    // expected rows AND the expected match date from the table alone.
    "s6_rotation_walkback" -> ((s, d) => {
      val base = GateTmp.dir("graft_s6", d)
      val fs = new Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new Path(base), true)
      val orders = Tables.orders(s, d)
      Seq(1 -> "20240101", 2 -> "20240102").foreach { case (n, day) =>
        val slice = orders.filter(col("o_orderkey") % 5 === n)
          .select(col("o_orderkey").cast("string").as("o_orderkey"),
            col("o_totalprice").cast("decimal(12,2)").cast("string")
              .as("o_totalprice"))
        val tmp = s"$base/tmp_$n"
        CsvIO.write(slice.coalesce(1), tmp, sep = "|")
        val part = fs.listStatus(new Path(tmp)).map(_.getPath)
          .find(_.getName.startsWith("part-")).get
        fs.mkdirs(new Path(s"$base/staging"))
        fs.rename(part, new Path(s"$base/staging/sales_$day.csv"))
        fs.delete(new Path(tmp), true)
      }
      val moved = CsvIO.rotate(s, s"$base/staging", s"$base/current")
      require(moved == 2, s"rotation moved $moved files, expected 2")
      val (matchedDate, paths) = FileResolver.globWithWalkback(s,
          s"$base/current/sales_YYYYMMDD.csv",
          java.time.LocalDate.of(2024, 1, 5), daysBack = 7)
        .getOrElse(sys.error("walk-back found no file"))
      require(paths.size == 1, s"expected 1 match, got $paths")
      CsvIO.readAllString(s, paths.head, sep = "|")
        .select(col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_totalprice").cast("decimal(12,2)").cast("double")
            .as("o_totalprice"),
          lit(matchedDate.toString).cast("date").as("matched_date"))
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

    // ---- multimodal batched decode (mapPartitions shape) -----------------
    // The decode values are stub-generated (not oracle-recomputable),
    // but the PLUMBING contract is: every media row comes back exactly
    // once with a dim-wide feature vector in [0,1], independent of
    // batching — which is what the oracle pins (one row per doc, fixed
    // dim, range flag).
    "m3_batched_decode" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val media = Multimodal.toMedia(
        docs.withColumn("payload", col("text").cast("binary")),
        "doc_id", "payload", "image", "png",
        width = lit(320), height = lit(240))
      Multimodal.decodeBatched(media, dim = 8, batchSize = 16)
        .select(col("media_id"),
          size(col("features")).as("n_features"),
          forall(col("features"),
            v => v >= 0.0 && v <= 1.0).as("in_range"))
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

    // ---- REAL image decode (pure-JDK ImageIO), analytic oracle ----------
    // Each doc synthesizes a two-tone PNG (left half color c1, right
    // half c2, both derived from the id) that travels a FULL PNG
    // encode→decode round trip through javax.imageio; the decoded
    // header dims, per-channel means, and corner pixels come back as
    // data. Because the construction is two equal halves, every
    // statistic is ANALYTIC — the oracle recomputes means as
    // (c1+c2)/2 and corners as the raw colors with no codec at all —
    // so a decode regression anywhere (channel order, pixel indexing,
    // header parse, PNG writer) breaks the hash.
    "m4_image_decode" -> ((s, d) => {
      val ids = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("media_id"))
        .filter(col("media_id") < 200)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType)))
      val rows = ids.rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val w = (8 + (id % 8) * 2).toInt
          val h = (6 + (id % 5) * 2).toInt
          val c1 = ((id % 251).toInt, ((id * 7) % 251).toInt,
            ((id * 13) % 251).toInt)
          val c2 = (((id * 3) % 251).toInt, ((id * 11) % 251).toInt,
            ((id * 17) % 251).toInt)
          org.apache.spark.sql.Row(id,
            Multimodal.ImageIo.encodeTwoTonePng(w, h, c1, c2))
        }
      }
      Multimodal.decodeImageStats(s.createDataFrame(rows, schema))
        .orderBy(col("media_id"))
    }),

    // ---- REAL audio decode (pure-JVM RIFF/PCM parse), analytic oracle ----
    // Each doc synthesizes a PCM16 mono WAV (pattern: every 3rd sample
    // +A, the rest -B; A/B/rate/frame-count derived from the id) that
    // travels a full RIFF encode→parse round trip. Frame counts are
    // chosen to divide 1e6 so the 6-dec mean is exactly integral in
    // micros on both engines. The oracle recomputes every field
    // analytically — header fields, integer-division duration, the
    // exact amplitude mean, the max — with no parser at all.
    "m5_audio_decode" -> ((s, d) => {
      val ids = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("media_id"))
        .filter(col("media_id") < 200)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType)))
      val nBy4 = Seq(100, 125, 200, 250)
      val rows = ids.rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val rate = (8000 + (id % 4) * 4000).toInt
          val n = nBy4((id % 4).toInt)
          val a = (1000 + id % 2000).toShort
          val b = (500 + id % 700).toShort
          val samples = Array.tabulate(n)(i =>
            if (i % 3 == 0) a else (-b).toShort)
          org.apache.spark.sql.Row(id,
            Multimodal.WavIo.encodePcm16(rate, samples))
        }
      }
      Multimodal.decodeAudioStats(s.createDataFrame(rows, schema))
        .orderBy(col("media_id"))
    }),

    // ---- REAL media probing: type inference + metadata FROM BYTES --------
    // A mixed payload column (PNG / WAV / junk by id mod 3) probes
    // through the real codecs: magic-byte + header detection, image
    // dims, audio duration. The oracle knows every answer analytically
    // from the id — a mis-sniffed format, wrong header field, or a
    // junk payload classified as media breaks the hash.
    "m6_media_probe" -> ((s, d) => {
      val ids = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("media_id"))
        .filter(col("media_id") < 200)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType)))
      val nBy4 = Seq(100, 125, 200, 250)
      val rows = ids.rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val payload: Array[Byte] = (id % 3) match {
            case 0 =>
              val w = (8 + (id % 8) * 2).toInt
              val h = (6 + (id % 5) * 2).toInt
              val c = ((id % 251).toInt, ((id * 7) % 251).toInt,
                ((id * 13) % 251).toInt)
              Multimodal.ImageIo.encodeTwoTonePng(w, h, c, c)
            case 1 =>
              val rate = (8000 + (id % 4) * 4000).toInt
              val n = nBy4((id % 4).toInt)
              Multimodal.WavIo.encodePcm16(rate,
                Array.fill[Short](n)(7))
            case _ => s"junk payload $id".getBytes("UTF-8")
          }
          org.apache.spark.sql.Row(id, payload)
        }
      }
      Multimodal.probeMedia(s.createDataFrame(rows, schema),
          "media_id", "payload")
        .select(col("media_id"),
          col("meta.media_type").as("media_type"),
          col("meta.format").as("format"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.duration_ms").as("duration_ms"))
        .orderBy(col("media_id"))
    }),

    // ---- REAL animated-GIF frame sampling, analytic oracle ---------------
    // Each doc synthesizes an animated GIF of 4–8 solid-color frames
    // (colors closed-form in (id, frame)) through the JDK's GIF
    // sequence writer, then samples 3 evenly spaced frames through the
    // real reader — only the sampled indices decode. The oracle knows
    // the sampled indices (⌊j·total/3⌋, pure integer math), dims, and
    // every channel mean (a solid frame's mean IS its color) with no
    // codec at all — a wrong frame index, a palette drift, or a
    // channel swap breaks the hash. The m2 stub keeps the video tier's
    // SHAPE; this is the real multi-frame path.
    // ---- MULTIMODAL DEDUP: caption-image pairs deduped JOINTLY ----------
    // The multimodal columns graduate from decode-gates to pipeline
    // member: every (image, caption) pair gets a joint fingerprint —
    // md5 over the REAL-PNG-decode statistics (dims + both corner
    // colors, all integers) concatenated with the whitespace/case-
    // normalized caption — and exact-dedups keep-lowest-id. Planted
    // rows: +5000 re-encodes of the SAME image with the SAME caption
    // (joint dups — must drop) and +8000 same-image DIFFERENT-caption
    // rows (kept: joint identity is pair identity, visual identity
    // alone is not enough). The oracle knows every corner color and
    // dimension analytically from the id, so the whole chain — PNG
    // byte round-trip, decode, normalization, fingerprint, group
    // min — is hash-pinned with no image library on the oracle side.
    "mm1_media_dedup" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .filter(col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
      val media = base
          .select(col("doc_id").as("media_id"),
            col("doc_id").as("base_id"), col("text").as("caption"))
        .unionByName(base.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 5000L).as("media_id"),
            col("doc_id").as("base_id"), col("text").as("caption")))
        .unionByName(base.filter(col("doc_id") % 15 === 0)
          .select((col("doc_id") + 8000L).as("media_id"),
            col("doc_id").as("base_id"),
            concat(col("text"), lit(" alt view")).as("caption")))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.types.StructField("caption",
          org.apache.spark.sql.types.StringType)))
      val rows = media.select(col("media_id"), col("base_id"),
          col("caption")).rdd
        .mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(1) // image params from the BASE id
            val w = (8 + (id % 8) * 2).toInt
            val h = (6 + (id % 5) * 2).toInt
            val c1 = ((id % 251).toInt, ((id * 7) % 251).toInt,
              ((id * 13) % 251).toInt)
            val c2 = (((id * 3) % 251).toInt, ((id * 11) % 251).toInt,
              ((id * 17) % 251).toInt)
            org.apache.spark.sql.Row(r.getLong(0),
              Multimodal.ImageIo.encodeTwoTonePng(w, h, c1, c2),
              if (r.isNullAt(2)) null else r.getString(2))
          }
        }
      val mediaDf = s.createDataFrame(rows, schema)
      val stats = Multimodal.decodeImageStats(
        mediaDf.select(col("media_id"), col("payload")))
      val capNorm = lower(trim(regexp_replace(
        coalesce(col("caption"), lit("")), "\\s+", " ")))
      val fp = stats
        .join(mediaDf.select(col("media_id"), col("caption")),
          Seq("media_id"))
        .select(col("media_id"), md5(concat_ws("|",
          col("width"), col("height"),
          col("tl_r"), col("tl_g"), col("tl_b"),
          col("br_r"), col("br_g"), col("br_b"),
          capNorm)).as("joint_sig"))
      val groups = fp.groupBy(col("joint_sig"))
        .agg(min(col("media_id")).as("__keeper"),
          count(lit(1)).as("n_group"))
      fp.join(groups, Seq("joint_sig"))
        .select(col("media_id"), col("joint_sig"),
          (col("media_id") =!= col("__keeper")).as("is_duplicate"),
          col("n_group"))
        .orderBy(col("media_id"))
    }),

    "m7_gif_frames" -> ((s, d) => {
      val ids = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("media_id"))
        .filter(col("media_id") < 200)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType)))
      val rows = ids.rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val w = (5 + id % 4).toInt
          val h = (4 + id % 3).toInt
          org.apache.spark.sql.Row(id,
            Multimodal.GifIo.encodeAnimatedGif(w, h,
              Multimodal.GifIo.testbedFrames(id)))
        }
      }
      Multimodal.sampleGifFrames(s.createDataFrame(rows, schema), n = 3)
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // ---- GIF frame EXTRACTION through a second real codec (m8) -----------
    // m7 samples statistics; this extracts the sampled frames as
    // standalone PNG payloads and round-trips them through the FULL
    // PNG decode (decodeImageStats) — a two-codec chain (GIF decode →
    // PNG encode → PNG decode) whose every statistic is still analytic
    // because the frames are solid colors. A pixel lost or shifted in
    // either codec hop, a wrong sampled index, or a palette drift
    // breaks the hash.
    "m8_gif_extract" -> ((s, d) => {
      val ids = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("media_id"))
        .filter(col("media_id") < 200)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType)))
      val rows = ids.rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val w = (6 + (id % 4) * 2).toInt
          val h = (4 + id % 3).toInt
          org.apache.spark.sql.Row(id,
            Multimodal.GifIo.encodeAnimatedGif(w, h,
              Multimodal.GifIo.testbedFrames(id)))
        }
      }
      val frames = Multimodal.extractGifFrames(
        s.createDataFrame(rows, schema), n = 3)
      // feed the per-frame PNGs through the real image decoder; a
      // composite row id keeps media_id unique for the stats stage
      // (total ≤ 8 so frame_idx < 8)
      Multimodal.decodeImageStats(frames.select(
          (col("media_id") * 8 + col("frame_idx")).as("media_id"),
          col("payload")))
        .orderBy(col("media_id"))
    }),

    // ---- Z-order layout: key exactness + clustered-write round-trip ------
    // The Morton key is computed, written through zorderWrite (range
    // partition + sort + file split), read back, and hash-compared to
    // DuckDB's closed-form 16-term bit interleave — a wrong shift, a
    // lost row in the clustered rewrite, or a bit-order flip breaks it.
    "z1_zorder_key" -> ((s, d) => {
      val path = GateTmp.dir("graft_zorder", d)
      val keyed = Tables.orders(s, d).select(col("o_orderkey"),
          (col("o_custkey") % 256).cast("long").as("zx"),
          (col("o_orderkey") % 256).cast("long").as("zy"))
        .withColumn("zkey",
          Layout.zorderKey(Seq(col("zx"), col("zy")), bits = 8))
      Layout.zorderWrite(keyed, path, Seq(col("zx"), col("zy")), bits = 8)
      s.read.parquet(path).select(col("o_orderkey"), col("zkey"))
        .orderBy(col("o_orderkey"))
    }),

  )

  /** DuckDB replay of the 8-bit two-column Morton interleave: x =
    * custkey bits at even positions, y = orderkey bits at odd. */
  private val zTerms = (for { i <- 0 until 8; j <- 0 until 2 } yield {
    val c = if (j == 0) "(o_custkey % 256)" else "(o_orderkey % 256)"
    s"((($c >> $i) & 1) << ${i * 2 + j})"
  }).mkString(" + ")

  def oracles: Map[String, String] = Map(
    "z1_zorder_key" ->
      s"""SELECT o_orderkey, CAST($zTerms AS BIGINT) AS zkey
         |FROM orders ORDER BY o_orderkey""".stripMargin,
    "s2_csv_roundtrip" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 9 = 0 THEN NULL
        |       ELSE o_orderstatus END AS o_orderstatus,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
        |  CAST(o_orderdate AS DATE) AS o_orderdate
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "io1_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "io2_orc_roundtrip" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 9 = 0 THEN NULL
        |       ELSE o_orderstatus END AS o_orderstatus,
        |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |  CAST(o_orderdate AS DATE) AS o_orderdate
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "s5_ledger_loop" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
        |    AS o_totalprice,
        |  'sales_002.csv' AS processed_file,
        |  'sales_001.csv' AS next_after
        |FROM orders WHERE o_orderkey % 3 = 2
        |ORDER BY o_orderkey""".stripMargin,

    "s6_rotation_walkback" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
        |    AS o_totalprice,
        |  CAST('2024-01-02' AS DATE) AS matched_date
        |FROM orders WHERE o_orderkey % 5 = 2
        |ORDER BY o_orderkey""".stripMargin,

    "m1_multimodal_meta" ->
      """SELECT doc_id AS media_id, 'image' AS media_type,
        |  CAST((doc_id % 4 + 1) * 320 AS INTEGER) AS width,
        |  240 AS height,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS size_bytes
        |FROM documents
        |WHERE (doc_id % 4 + 1) * 320 >= 640
        |ORDER BY media_id""".stripMargin,

    // decodeBatched drops null payloads by contract (a real FFI codec
    // crashes on them), so the oracle mirrors the filter: one row per
    // document WITH a payload, not one row per document.
    "m3_batched_decode" ->
      """SELECT doc_id AS media_id, 8 AS n_features, true AS in_range
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY media_id""".stripMargin,

    "m2_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx
        |FROM documents, generate_series(0, 3) t(f)
        |ORDER BY media_id, frame_idx""".stripMargin,

    // every probed field analytic from the id-mod-3 construction
    "m6_media_probe" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'unknown' END AS media_type,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
        |    ELSE NULL END AS format,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN CAST(8 + (doc_id % 8) * 2 AS INTEGER) END AS width,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN CAST(6 + (doc_id % 5) * 2 AS INTEGER) END AS height,
        |  CASE WHEN doc_id % 3 = 1 THEN CAST(
        |    ((CASE doc_id % 4 WHEN 0 THEN 100 WHEN 1 THEN 125
        |       WHEN 2 THEN 200 ELSE 250 END) * 1000)
        |    // (8000 + (doc_id % 4) * 4000) AS BIGINT) END AS duration_ms
        |FROM documents WHERE doc_id < 200
        |ORDER BY media_id""".stripMargin,

    // m7: solid-color frames make every sampled statistic analytic —
    // indices are ⌊j·total/3⌋ in pure integer math, means ARE the
    // planted colors; the engine side runs the real GIF sequence
    // writer + indexed reader round trip
    "m7_gif_frames" ->
      """WITH g AS (
        |  SELECT doc_id AS media_id, 4 + doc_id % 5 AS total,
        |    CAST(5 + doc_id % 4 AS INTEGER) AS width,
        |    CAST(4 + doc_id % 3 AS INTEGER) AS height
        |  FROM documents WHERE doc_id < 200),
        |fr AS (
        |  SELECT media_id, width, height,
        |    CAST((j * total) // 3 AS INTEGER) AS frame_idx
        |  FROM g, range(0, 3) t(j))
        |SELECT media_id, frame_idx, width, height,
        |  round(CAST((media_id * 7 + frame_idx * 13) % 256 AS DOUBLE), 6)
        |    AS mean_r,
        |  round(CAST((media_id * 11 + frame_idx * 17) % 256 AS DOUBLE), 6)
        |    AS mean_g,
        |  round(CAST((media_id * 3 + frame_idx * 29) % 256 AS DOUBLE), 6)
        |    AS mean_b
        |FROM fr ORDER BY media_id, frame_idx""".stripMargin,

    // m8: the two-codec chain's statistics are the planted solid
    // colors — means AND corners; the composite id is media_id*8 +
    // sampled index ⌊j·total/3⌋
    "m8_gif_extract" ->
      """WITH g AS (
        |  SELECT doc_id AS mid, 4 + doc_id % 5 AS total,
        |    CAST(6 + (doc_id % 4) * 2 AS INTEGER) AS width,
        |    CAST(4 + doc_id % 3 AS INTEGER) AS height
        |  FROM documents WHERE doc_id < 200),
        |fr AS (
        |  SELECT mid, width, height,
        |    CAST((j * total) // 3 AS INTEGER) AS i
        |  FROM g, range(0, 3) t(j)),
        |cx AS (
        |  SELECT mid * 8 + i AS media_id, width, height,
        |    CAST((mid * 7 + i * 13) % 256 AS INTEGER) AS r,
        |    CAST((mid * 11 + i * 17) % 256 AS INTEGER) AS gg,
        |    CAST((mid * 3 + i * 29) % 256 AS INTEGER) AS b
        |  FROM fr)
        |SELECT media_id, width, height,
        |  round(CAST(r AS DOUBLE), 6) AS mean_r,
        |  round(CAST(gg AS DOUBLE), 6) AS mean_g,
        |  round(CAST(b AS DOUBLE), 6) AS mean_b,
        |  r AS tl_r, gg AS tl_g, b AS tl_b,
        |  r AS br_r, gg AS br_g, b AS br_b
        |FROM cx ORDER BY media_id""".stripMargin,

    // the two-tone construction makes every decoded statistic analytic:
    // means are (c1+c2)/2 (equal halves), corners are the raw colors —
    // no codec on the oracle side, a full real codec on the engine side
    "m4_image_decode" ->
      """SELECT doc_id AS media_id,
        |  CAST(8 + (doc_id % 8) * 2 AS INTEGER) AS width,
        |  CAST(6 + (doc_id % 5) * 2 AS INTEGER) AS height,
        |  round((CAST(doc_id % 251 AS DOUBLE)
        |    + CAST((doc_id * 3) % 251 AS DOUBLE)) / 2.0, 6) AS mean_r,
        |  round((CAST((doc_id * 7) % 251 AS DOUBLE)
        |    + CAST((doc_id * 11) % 251 AS DOUBLE)) / 2.0, 6) AS mean_g,
        |  round((CAST((doc_id * 13) % 251 AS DOUBLE)
        |    + CAST((doc_id * 17) % 251 AS DOUBLE)) / 2.0, 6) AS mean_b,
        |  CAST(doc_id % 251 AS INTEGER) AS tl_r,
        |  CAST((doc_id * 7) % 251 AS INTEGER) AS tl_g,
        |  CAST((doc_id * 13) % 251 AS INTEGER) AS tl_b,
        |  CAST((doc_id * 3) % 251 AS INTEGER) AS br_r,
        |  CAST((doc_id * 11) % 251 AS INTEGER) AS br_g,
        |  CAST((doc_id * 17) % 251 AS INTEGER) AS br_b
        |FROM documents WHERE doc_id < 200
        |ORDER BY media_id""".stripMargin,

    // the joint fingerprint replayed with ZERO image machinery: every
    // decoded statistic is analytic in the base id, the caption
    // normalization is the same regex, and md5 agrees byte for byte
    "mm1_media_dedup" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |media AS (
        |  SELECT doc_id AS media_id, doc_id AS base_id, text AS caption
        |  FROM base
        |  UNION ALL
        |  SELECT doc_id + 5000, doc_id, text FROM base
        |  WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 8000, doc_id, text || ' alt view' FROM base
        |  WHERE doc_id % 15 = 0),
        |fp AS (
        |  SELECT media_id, md5(concat_ws('|',
        |    CAST(8 + (base_id % 8) * 2 AS VARCHAR),
        |    CAST(6 + (base_id % 5) * 2 AS VARCHAR),
        |    CAST(base_id % 251 AS VARCHAR),
        |    CAST((base_id * 7) % 251 AS VARCHAR),
        |    CAST((base_id * 13) % 251 AS VARCHAR),
        |    CAST((base_id * 3) % 251 AS VARCHAR),
        |    CAST((base_id * 11) % 251 AS VARCHAR),
        |    CAST((base_id * 17) % 251 AS VARCHAR),
        |    lower(trim(regexp_replace(coalesce(caption, ''),
        |      '\s+', ' ', 'g'))))) AS joint_sig
        |  FROM media),
        |g AS (
        |  SELECT joint_sig, min(media_id) AS keeper,
        |    CAST(count(*) AS BIGINT) AS n_group
        |  FROM fp GROUP BY 1)
        |SELECT f.media_id, f.joint_sig,
        |  f.media_id <> g.keeper AS is_duplicate, g.n_group
        |FROM fp f JOIN g USING (joint_sig)
        |ORDER BY f.media_id""".stripMargin,

    // every field analytic: the +A/-B pattern has ceil(n/3) A-samples;
    // duration is integer division; n divides 1e6 so the rounded mean
    // is exactly integral in micros
    "m5_audio_decode" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS rate,
        |    CASE doc_id % 4 WHEN 0 THEN 100 WHEN 1 THEN 125
        |      WHEN 2 THEN 200 ELSE 250 END AS n,
        |    1000 + doc_id % 2000 AS a,
        |    500 + doc_id % 700 AS b
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id AS media_id, rate AS sample_rate,
        |  CAST(1 AS INTEGER) AS channels,
        |  CAST(n AS BIGINT) AS n_frames,
        |  CAST((n * 1000) // rate AS BIGINT) AS duration_ms,
        |  round((CAST((n + 2) // 3 AS DOUBLE) * a
        |    + CAST(n - (n + 2) // 3 AS DOUBLE) * b) / n, 6) AS mean_abs,
        |  CAST(greatest(a, b) AS INTEGER) AS max_abs
        |FROM p ORDER BY media_id""".stripMargin,
  )
}
