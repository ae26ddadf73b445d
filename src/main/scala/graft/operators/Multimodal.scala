package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media as opaque
  * `binary` payloads + a typed metadata struct, with decode / feature /
  * resize / frame-sample stages.
  *
  * Decode comes in two tiers. IMAGES are decoded FOR REAL via
  * [[ImageIo]] — `javax.imageio` ships PNG/JPEG/BMP/GIF readers in
  * every JDK, no external codec needed — covering header-only
  * dimension probes, pixel statistics, feature extraction, and a true
  * resize-and-re-encode stage (hash-pinned by the m4 gate against an
  * analytic oracle). VIDEO/AUDIO codecs do not ship with the JDK, so
  * those paths keep the deterministic `DecodeStub` fake with the same
  * [[BatchDecoder]] shape a real FFI wrapper (JNI / ONNX / javacv)
  * plugs into; every signature stays put.
  *
  * Scale notes: payloads ride in the same parquet row group as their
  * metadata — size `spark.sql.files.maxPartitionBytes` DOWN (e.g. 32 MB)
  * when average payloads are MBs so a task holds O(tens) of rows;
  * metadata-only predicates (media_type, width, dims) prune on column
  * statistics WITHOUT touching payload bytes because parquet is columnar
  * — filter-then-decode is the whole game.
  */
object Multimodal {

  /** Typed metadata carried beside every payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),  // image | audio | video
    StructField("format", StringType),      // png/jpeg/wav/mp4…
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("size_bytes", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Deterministic fake codec: "decodes" a payload to a small fixed
    * feature vector derived from content hashes. Real decode goes here
    * (??? in a deployment without the codec lib). */
  object DecodeStub {
    /** Per-payload feature vector (dim 8), deterministic in content. */
    def featureExpr(payload: Column, dim: Int = 8): Column =
      transform(sequence(lit(0), lit(dim - 1)),
        i => pmod(xxhash64(payload, i), lit(1000000L)).cast("double")
          / 1000000.0)

    /** Batch-decoder stub with the same shape a real codec/model FFI
      * wrapper has: construction is the expensive part (load the
      * model / init the codec context), decodeBatch amortizes the call
      * overhead over a bounded batch. Deterministic in content. */
    def batchDecoder(dim: Int = 8): () => BatchDecoder = () =>
      new BatchDecoder {
        override def decodeBatch(
            payloads: Array[Array[Byte]]): Array[Array[Double]] =
          payloads.map { p =>
            Array.tabulate(dim) { i =>
              (scala.util.hashing.MurmurHash3.bytesHash(p, i)
                & 0x7fffffff).toDouble / Int.MaxValue.toDouble
            }
          }
      }
  }

  /** A real decoder is stateful and expensive to construct (codec
    * context, ONNX session, JNI handle); implementations are created
    * once per partition by [[decodeBatched]] and fed bounded batches. */
  trait BatchDecoder extends Serializable {
    def decodeBatch(payloads: Array[Array[Byte]]): Array[Array[Double]]
  }

  /** Batched decode via mapPartitions — the Scala analog of PySpark's
    * mapInPandas, and the contract a real codec needs:
    *  - the decoder is constructed ONCE per partition (model load /
    *    codec init is the dominant fixed cost), not per row;
    *  - rows stream through in batches of `batchSize`, so peak memory
    *    is O(batchSize · payload) regardless of partition size — a
    *    partition of 10k videos never materializes at once;
    *  - output is (media_id, features), payload bytes are dropped on
    *    the spot — decoded features, not payloads, ride any downstream
    *    shuffle.
    * Results are independent of partitioning and batch size by
    * construction (each payload is decoded alone within its batch) —
    * spec-pinned. Swap `mkDecoder` for the FFI-backed implementation in
    * deployment; [[DecodeStub.batchDecoder]] is the container's fake. */
  def decodeBatched(media: DataFrame, dim: Int = 8, batchSize: Int = 64,
      mkDecoder: () => BatchDecoder = null): DataFrame = {
    require(batchSize > 0)
    val mk = Option(mkDecoder).getOrElse(DecodeStub.batchDecoder(dim))
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType))))
    // null payloads never reach the decoder (a real FFI codec crashes
    // on them, and a crash there kills the whole task) — same null
    // discipline as the PQ coded scan
    val rows = media.select(col("media_id"), col("payload"))
      .filter(col("payload").isNotNull).rdd
      .mapPartitions { it =>
        val dec = mk() // once per partition
        it.grouped(batchSize).flatMap { chunk =>
          val feats = dec.decodeBatch(
            chunk.map(_.getAs[Array[Byte]](1)).toArray)
          // a short (or long) result would silently misalign every
          // later row's features with the wrong media_id via zip
          // truncation — corrupt training data with no error. Fail.
          require(feats.length == chunk.size,
            s"decoder returned ${feats.length} results for a " +
              s"${chunk.size}-payload batch")
          chunk.iterator.zip(feats.iterator).map { case (r, f) =>
            org.apache.spark.sql.Row(r.getLong(0), f.toSeq)
          }
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** REAL image codec — pure-JDK `javax.imageio`. Construction-free
    * and headless-safe (BufferedImage needs no display); each method is
    * a pure function of the payload bytes, so every DataFrame stage
    * built on it is partitioning-independent. */
  object ImageIo {
    System.setProperty("java.awt.headless", "true")

    /** Header-only dimension probe: positions an ImageReader on the
      * container header and asks for width/height WITHOUT decoding
      * pixel data — the cheap metadata pass that lets a 100 TB media
      * table derive/refresh its prune columns at IO speed. None for
      * undecodable/unknown payloads. */
    def dims(bytes: Array[Byte]): Option[(Int, Int)] = {
      if (bytes == null || bytes.length == 0) return None
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Some((r.getWidth(0), r.getHeight(0)))
          } finally r.dispose()
        }
      } catch { case _: Exception => None }
      finally iis.close()
    }

    /** Full pixel statistics: dimensions, per-channel means (sRGB,
      * exact integer sums divided once — deterministic IEEE), and the
      * top-left / bottom-right pixels (the channel-order / indexing
      * canaries: an R/B swap or a flipped axis moves them). None for
      * undecodable payloads. */
    final case class ImageStats(width: Int, height: Int,
        meanR: Double, meanG: Double, meanB: Double,
        tlR: Int, tlG: Int, tlB: Int, brR: Int, brG: Int, brB: Int)

    def decodeStats(bytes: Array[Byte]): Option[ImageStats] = {
      val img = read(bytes)
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      if (w <= 0 || h <= 0) return None
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val tl = img.getRGB(0, 0); val br = img.getRGB(w - 1, h - 1)
      Some(ImageStats(w, h,
        sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
        (tl >> 16) & 0xff, (tl >> 8) & 0xff, tl & 0xff,
        (br >> 16) & 0xff, (br >> 8) & 0xff, br & 0xff))
    }

    /** A real [[BatchDecoder]]: 8-dim feature vector per image —
      * [w, h, meanR, meanG, meanB, luma, tl-luma, br-luma], channel
      * values normalized to [0, 1]. Undecodable payloads yield an
      * all-(-1) vector (a crash would kill the task; silently dropping
      * would desync training manifests). */
    def decoder(dim: Int = 8): () => BatchDecoder = () =>
      new BatchDecoder {
        override def decodeBatch(
            payloads: Array[Array[Byte]]): Array[Array[Double]] =
          payloads.map { p =>
            decodeStats(p) match {
              case Some(s) =>
                val luma = (0.299 * s.meanR + 0.587 * s.meanG +
                  0.114 * s.meanB) / 255.0
                val tlL = (0.299 * s.tlR + 0.587 * s.tlG +
                  0.114 * s.tlB) / 255.0
                val brL = (0.299 * s.brR + 0.587 * s.brG +
                  0.114 * s.brB) / 255.0
                Array(s.width.toDouble, s.height.toDouble,
                  s.meanR / 255.0, s.meanG / 255.0, s.meanB / 255.0,
                  luma, tlL, brL).padTo(dim, 0.0).take(dim)
              case None => Array.fill(dim)(-1.0)
            }
          }
      }

    /** Real resize: bilinear scale through Graphics2D, re-encoded as
      * PNG (lossless, JDK-writable). Undecodable input → null. */
    def resizePng(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img = read(bytes)
      if (img == null) return null
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      encodePng(out)
    }

    /** Deterministic two-tone test/gate image: left half `rgb1`, right
      * half `rgb2` — chosen so every pixel statistic is ANALYTIC (the
      * m4 gate's DuckDB oracle recomputes means as (c1+c2)/2 without
      * any codec), while the bytes still travel the full PNG
      * encode→decode round trip. */
    def encodeTwoTonePng(w: Int, h: Int, rgb1: (Int, Int, Int),
        rgb2: (Int, Int, Int)): Array[Byte] = {
      require(w >= 2 && w % 2 == 0 && h >= 1,
        s"two-tone needs even w >= 2, h >= 1: ($w, $h)")
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val c1 = (rgb1._1 << 16) | (rgb1._2 << 8) | rgb1._3
      val c2 = (rgb2._1 << 16) | (rgb2._2 << 8) | rgb2._3
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, if (x < w / 2) c1 else c2)
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }

    private def read(bytes: Array[Byte]): java.awt.image.BufferedImage =
      if (bytes == null || bytes.length == 0) null
      else
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }

    private[operators] def encodePng(
        img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** REAL multi-frame sampling for animated GIF — the one multi-frame
    * container the stock JDK reads (video codecs don't ship with it;
    * [[sampleFrames]] keeps the stub for video-typed rows, this is the
    * real path for the frame-sequence tier). ImageIO's GIF plugin
    * exposes the frame sequence through one reader: frame COUNT, then
    * per-frame decode of exactly the sampled indices — a 100-frame GIF
    * sampled at n=4 decodes 4 frames, not 100. Pure functions of the
    * payload bytes, like the other codecs here.
    *
    * Frames are returned as STORED, and the samplers GUARD that
    * stored = rendered: a sampled frame must cover the full logical
    * screen at offset (0,0) with no transparent palette entry —
    * otherwise the GIF is delta-encoded (sub-rectangle patches or
    * transparency compositing onto prior frames, per the GIF89a
    * disposal model) and its stored pixels are NOT the rendered
    * frames. Such GIFs return None — a countable skip, never a
    * silently wrong statistic. [[encodeAnimatedGif]]'s output and most
    * re-encoded training corpora are full-frame and pass. */
  object GifIo {
    System.setProperty("java.awt.headless", "true")

    final case class GifFrame(frameIdx: Int, width: Int, height: Int,
        meanR: Double, meanG: Double, meanB: Double)

    /** Frame count via the reader's index scan (no pixel decode); None
      * for non-GIF / undecodable payloads. */
    def frameCount(bytes: Array[Byte]): Option[Int] =
      withReader(bytes) { r => r.getNumImages(true) }

    /** Evenly spaced sample of `n` frames (indices ⌊j·total/k⌋ for
      * j < k = min(n, total) — exact integer arithmetic, so an oracle
      * replays the index choice): per frame, dimensions + per-channel
      * means from exact integer sums (the [[ImageIo.decodeStats]]
      * discipline). None for non-GIF / undecodable payloads. */
    def sampleFrames(bytes: Array[Byte], n: Int): Option[Seq[GifFrame]] =
      sampleIndexed(bytes, n) { (i, img) =>
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff
            sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val np = w.toLong * h
        GifFrame(i, w, h, sr.toDouble / np, sg.toDouble / np,
          sb.toDouble / np)
      }

    /** The ONE copy of the sampling contract both legs share —
      * k = min(n, total), indices ⌊j·total/k⌋, only sampled frames
      * decode — because the m7/m8 oracles replay exactly this index
      * choice and two hand-synced copies would invite the legs
      * drifting apart. */
    private def sampleIndexed[T](bytes: Array[Byte], n: Int)(
        body: (Int, java.awt.image.BufferedImage) => T)
        : Option[Seq[T]] = {
      require(n >= 1, s"sample: n must be >= 1, got $n")
      withReader(bytes) { r =>
        val total = r.getNumImages(true)
        if (total <= 0) Seq.empty[T]
        else {
          val k = math.min(n, total)
          val idx = (0 until k).map(j => (j.toLong * total / k).toInt)
          // stored-equals-rendered guard (metadata-only, no pixel
          // decode): every SAMPLED frame must be standalone; one
          // delta/sub-rect/transparent frame disqualifies the GIF
          val screen = logicalScreen(r)
          if (!idx.forall(i => standaloneFrame(r, i, screen)))
            Seq.empty[T]
          else idx.map(i => body(i, r.read(i)))
        }
      }.filter(_.nonEmpty)
    }

    /** Logical screen (canvas) size from the GIF stream metadata; None
      * when the plugin doesn't expose it (the per-frame offset checks
      * still apply). */
    private def logicalScreen(
        r: javax.imageio.ImageReader): Option[(Int, Int)] =
      try {
        val md = r.getStreamMetadata
        if (md == null) None
        else {
          val tree = md.getAsTree("javax_imageio_gif_stream_1.0")
            .asInstanceOf[org.w3c.dom.Element]
          val lsd = tree.getElementsByTagName("LogicalScreenDescriptor")
          if (lsd.getLength == 0) None
          else {
            val e = lsd.item(0).asInstanceOf[org.w3c.dom.Element]
            Some((e.getAttribute("logicalScreenWidth").toInt,
              e.getAttribute("logicalScreenHeight").toInt))
          }
        }
      } catch { case _: Exception => None }

    /** A frame is standalone-renderable iff its image descriptor sits
      * at (0,0) covering the full logical screen AND it carries no
      * transparent palette entry: stored pixels then EQUAL the
      * rendered frame regardless of disposal method. A sub-rectangle
      * or transparent frame composites onto prior frames / the
      * background per GIF89a disposal semantics — which this reader
      * deliberately does not do — so it reports false and the GIF
      * surfaces as a skip. Unreadable metadata also reports false
      * (can't prove standalone ⇒ don't emit statistics). */
    private def standaloneFrame(r: javax.imageio.ImageReader, i: Int,
        screen: Option[(Int, Int)]): Boolean =
      try {
        val md = r.getImageMetadata(i)
        if (md == null) return false
        val tree = md.getAsTree("javax_imageio_gif_image_1.0")
          .asInstanceOf[org.w3c.dom.Element]
        val idn = tree.getElementsByTagName("ImageDescriptor")
        if (idn.getLength == 0) return false
        val d = idn.item(0).asInstanceOf[org.w3c.dom.Element]
        val full = d.getAttribute("imageLeftPosition").toInt == 0 &&
          d.getAttribute("imageTopPosition").toInt == 0 &&
          screen.forall { case (w, h) =>
            d.getAttribute("imageWidth").toInt == w &&
              d.getAttribute("imageHeight").toInt == h
          }
        val gce = tree.getElementsByTagName("GraphicControlExtension")
        val transparent = gce.getLength > 0 &&
          gce.item(0).asInstanceOf[org.w3c.dom.Element]
            .getAttribute("transparentColorFlag") == "TRUE"
        full && !transparent
      } catch { case _: Exception => false }

    /** Sampled frames RE-ENCODED as standalone PNG payloads (same
      * ⌊j·total/k⌋ index choice as [[sampleFrames]]) — the extraction
      * leg that turns a multi-frame container into per-frame rows any
      * image stage ([[Multimodal.decodeImageStats]],
      * [[Multimodal.resizeImages]]) consumes. PNG is lossless, so the
      * GIF-decode→PNG-encode hop preserves every pixel (the m8 gate
      * round-trips it through a SECOND real decode and hash-pins the
      * statistics). None for non-GIF payloads. */
    def framePngs(bytes: Array[Byte],
        n: Int): Option[Seq[(Int, Array[Byte])]] =
      sampleIndexed(bytes, n) { (i, img) =>
        (i, ImageIo.encodePng(img))
      }

    /** Deterministic testbed frame colors for gif id `id` — ONE copy
      * shared by the m7/m8 gates and the Stress gif tier (their DuckDB
      * oracles replay these exact formulas, so a drifted copy would
      * silently break a digest): 4 + id%5 frames, frame f colored
      * ((id·7+f·13)%256, (id·11+f·17)%256, (id·3+f·29)%256). */
    def testbedFrames(id: Long): Seq[(Int, Int, Int)] =
      (0 until (4 + id % 5).toInt).map(f => (
        ((id * 7 + f * 13) % 256).toInt,
        ((id * 11 + f * 17) % 256).toInt,
        ((id * 3 + f * 29) % 256).toInt))

    /** Deterministic animated-GIF testbed: solid-color full frames
      * through the JDK's GIF sequence writer. A solid frame's palette
      * contains exactly its color, so every sampled frame's mean IS the
      * planted color — the m7 gate's analytic-oracle construction
      * (the two-tone-PNG precedent, one container up). */
    def encodeAnimatedGif(w: Int, h: Int,
        frames: Seq[(Int, Int, Int)]): Array[Byte] = {
      require(w >= 1 && h >= 1 && frames.nonEmpty)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach { case (cr, cg, cb) =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (cr << 16) | (cg << 8) | cb
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }

    /** Position a GIF reader on the payload and run `body`; None when
      * the payload isn't a readable GIF (None-never-throw, the codec
      * contract here). seekForwardOnly = false because getNumImages'
      * index scan needs to rewind before frame reads. */
    private def withReader[T](bytes: Array[Byte])(
        body: javax.imageio.ImageReader => T): Option[T] = {
      if (bytes == null || bytes.length < 6) return None
      // magic: GIF87a / GIF89a
      if (!(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F'))
        return None
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            // seekForwardOnly = false: getNumImages' index scan must
            // rewind before the indexed frame reads
            r.setInput(iis, false, false)
            Some(body(r))
          } finally r.dispose()
        }
      } catch { case _: Exception => None }
      finally iis.close()
    }
  }

  /** REAL audio codec for WAV/PCM — a transparent pure-JVM RIFF parser
    * (WAV is a length-prefixed chunk container; PCM samples are raw
    * little-endian integers — no codec library involved, which is why
    * audio's "decode" tier can be real while video's cannot). Pure
    * functions of the payload bytes. */
  object WavIo {
    final case class WavInfo(sampleRate: Int, channels: Int,
        bitsPerSample: Int, nFrames: Long, durationMs: Long)
    final case class WavStats(info: WavInfo, meanAbs: Double,
        maxAbs: Int)

    /** Chunk-walk the RIFF container for fmt + data; None for
      * non-WAV / truncated / non-PCM payloads. Header-only — sample
      * bytes are located, not read. */
    def info(bytes: Array[Byte]): Option[WavInfo] =
      locate(bytes).map(_._1)

    /** Full PCM16 statistics: mean |sample| (exact integer sum divided
      * once) and max |sample| over all channels. */
    def stats(bytes: Array[Byte]): Option[WavStats] =
      locate(bytes).flatMap { case (inf, off, len) =>
        if (inf.bitsPerSample != 16) return None
        val n = len / 2
        if (n == 0) return Some(WavStats(inf, 0.0, 0))
        var sum = 0L; var mx = 0; var i = 0
        while (i < n) {
          val lo = bytes(off + 2 * i) & 0xff
          val hi = bytes(off + 2 * i + 1)
          val s = (hi << 8) | lo
          val a = math.abs(s)
          sum += a; if (a > mx) mx = a
          i += 1
        }
        Some(WavStats(inf, sum.toDouble / n, mx))
      }

    /** Deterministic PCM16 mono WAV encoder (the test/gate synth and
      * a valid minimal writer: RIFF + fmt + data). */
    def encodePcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2)
        .putShort(2).putShort(16) // block align, bits
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(buf.putShort)
      buf.array()
    }

    /** (info, data-offset, data-length) or None. */
    private def locate(bytes: Array[Byte])
        : Option[(WavInfo, Int, Int)] = {
      if (bytes == null || bytes.length < 12) return None
      def ascii(o: Int, n: Int) = new String(bytes, o, n, "US-ASCII")
      def le32(o: Int): Int =
        (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
          ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      def le16(o: Int): Int =
        (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
      var pos = 12
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var data: Option[(Int, Int)] = None     // (offset, len)
      while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
        val id = ascii(pos, 4)
        val len = le32(pos + 4)
        if (len < 0 || pos + 8 + len > bytes.length) return None
        if (id == "fmt " && len >= 16) {
          if (le16(pos + 8) != 1) return None // PCM only
          fmt = Some((le16(pos + 10), le32(pos + 12), le16(pos + 22)))
        } else if (id == "data") data = Some((pos + 8, len))
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      for ((ch, rate, bits) <- fmt; (off, len) <- data) yield {
        if (ch <= 0 || rate <= 0 || bits <= 0) return None
        // sub-byte frames (e.g. a crafted fmt with bits=4, ch=1) make
        // the integer divisor 0 — malformed payloads are DATA on a
        // 100 TB ingest, so hold the "None, never a throw" contract
        val bytesPerFrame = ch * bits / 8
        if (bytesPerFrame <= 0) return None
        val nFrames = len.toLong / bytesPerFrame
        (WavInfo(rate, ch, bits, nFrames, nFrames * 1000L / rate),
          off, len)
      }
    }
  }

  /** Real audio statistics as a DataFrame stage: RIFF header fields,
    * frame count, integer-derived duration, and exact PCM amplitude
    * stats (6-dec rounded mean |sample|); non-WAV payloads yield null
    * stats. Same mapPartitions discipline as [[decodeImageStats]]. */
  def decodeAudioStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_frames", LongType),
      StructField("duration_ms", LongType),
      StructField("mean_abs", DoubleType),
      StructField("max_abs", IntegerType)))
    val rows = media.select(col("media_id"), col("payload")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val st =
            if (r.isNullAt(1)) None
            else WavIo.stats(r.getAs[Array[Byte]](1))
          st match {
            case Some(s) => org.apache.spark.sql.Row(r.getLong(0),
              s.info.sampleRate, s.info.channels, s.info.nFrames,
              s.info.durationMs, math.rint(s.meanAbs * 1e6) / 1e6,
              s.maxAbs)
            case None => org.apache.spark.sql.Row(r.getLong(0),
              null, null, null, null, null, null)
          }
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** REAL frame sampling as a DataFrame stage: each animated-GIF row
    * explodes to min(n, frames) rows of per-frame statistics — the
    * 1-video→n-frames shape [[sampleFrames]] stubs, made real for the
    * container the JDK decodes. Only the SAMPLED frames decode (the
    * reader seeks by index), so cost scales with n, not frame count.
    * Non-GIF / undecodable payloads — and delta-encoded GIFs whose
    * sampled frames aren't standalone-renderable (sub-rectangle,
    * transparency; see [[GifIo]]'s stored-equals-rendered guard) —
    * contribute ZERO rows (a sampler selects frames; it is not the
    * prober — [[probeMedia]] counts the unreadable). Same
    * mapPartitions discipline as [[decodeImageStats]]: payload bytes
    * never shuffle. */
  def sampleGifFrames(media: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"sampleGifFrames: n must be >= 1, got $n")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false)))
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    val rows = media.select(col("media_id"), col("payload")).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          val frames =
            if (r.isNullAt(1)) None
            else GifIo.sampleFrames(r.getAs[Array[Byte]](1), n)
          frames.toSeq.flatten.map(f =>
            org.apache.spark.sql.Row(r.getLong(0), f.frameIdx,
              f.width, f.height, r6(f.meanR), r6(f.meanG), r6(f.meanB)))
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** Frame EXTRACTION as a DataFrame stage: each animated-GIF row
    * explodes to min(n, frames) rows of (media_id, frame_idx,
    * payload) where payload is a standalone lossless PNG — feed the
    * result straight into [[decodeImageStats]] / [[resizeImages]] /
    * [[probeMedia]]. The video-corpus shape (1 container → n trainable
    * frames), real for the container the JDK decodes. Non-GIF rows —
    * and delta-encoded GIFs rejected by [[GifIo]]'s
    * stored-equals-rendered guard — contribute zero rows; payload
    * bytes never shuffle (mapPartitions, [[decodeImageStats]]'s
    * discipline). */
  def extractGifFrames(media: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"extractGifFrames: n must be >= 1, got $n")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rows = media.select(col("media_id"), col("payload")).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          val frames =
            if (r.isNullAt(1)) None
            else GifIo.framePngs(r.getAs[Array[Byte]](1), n)
          frames.toSeq.flatten.map { case (i, png) =>
            org.apache.spark.sql.Row(r.getLong(0), i, png)
          }
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** REAL media probing: detect the payload's type and derive its
    * metadata FROM THE BYTES (what a 100 TB ingest actually needs —
    * upstream-supplied metadata lies). Images probe header-only via
    * [[ImageIo.dims]]; WAV via [[WavIo.info]]'s chunk walk; anything
    * else comes back ("unknown", format null, dims/duration null) with
    * its size — a countable fact, not a dropped row. Output is the
    * canonical [[mediaSchema]], so every downstream stage composes. */
  def probeMedia(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val rows = df.select(col(idCol).cast("long"), col(payloadCol)).rdd
      .mapPartitions { it =>
        it.map { r =>
          val p = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val size = if (p == null) 0L else p.length.toLong
          val (mt, fmt, w, h, dur) = ImageIo.dims(p) match {
            case Some((iw, ih)) =>
              ("image", sniffImageFormat(p), iw: Integer, ih: Integer,
                null: java.lang.Long)
            case None => WavIo.info(p) match {
              case Some(wi) => ("audio", "wav", null: Integer,
                null: Integer, wi.durationMs: java.lang.Long)
              case None => ("unknown", null, null: Integer,
                null: Integer, null: java.lang.Long)
            }
          }
          org.apache.spark.sql.Row(r.getLong(0), p,
            org.apache.spark.sql.Row(mt, fmt, w, h, dur, size))
        }
      }
    spark.createDataFrame(rows, mediaSchema)
  }

  /** Container magic-byte sniff for the formats the JDK decodes. */
  private def sniffImageFormat(p: Array[Byte]): String =
    if (p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' &&
      p(2) == 'N' && p(3) == 'G') "png"
    else if (p.length >= 2 && (p(0) & 0xff) == 0xff &&
      (p(1) & 0xff) == 0xd8) "jpeg"
    else if (p.length >= 2 && p(0) == 'B' && p(1) == 'M') "bmp"
    else if (p.length >= 4 && p(0) == 'G' && p(1) == 'I' &&
      p(2) == 'F') "gif"
    else "image"

  /** Real image statistics as a DataFrame stage: one row per media row
    * with header dims, channel means (6-dec rounded — exact integer
    * sums divided once, so both engines and any partitioning agree),
    * and the corner-pixel canaries; undecodable payloads yield null
    * stats (countable data facts, not task deaths). mapPartitions like
    * [[decodeBatched]]: payload bytes are dropped on the spot. */
  def decodeImageStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType),
      StructField("tl_r", IntegerType), StructField("tl_g", IntegerType),
      StructField("tl_b", IntegerType),
      StructField("br_r", IntegerType), StructField("br_g", IntegerType),
      StructField("br_b", IntegerType)))
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    val rows = media.select(col("media_id"), col("payload")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val stats =
            if (r.isNullAt(1)) None
            else ImageIo.decodeStats(r.getAs[Array[Byte]](1))
          stats match {
            case Some(s) => org.apache.spark.sql.Row(r.getLong(0),
              s.width, s.height, r6(s.meanR), r6(s.meanG), r6(s.meanB),
              s.tlR, s.tlG, s.tlB, s.brR, s.brG, s.brB)
            case None => org.apache.spark.sql.Row(r.getLong(0),
              null, null, null, null, null, null, null, null, null,
              null, null)
          }
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** Real image resize as a DataFrame stage: bilinear scale +
    * lossless PNG re-encode, metadata updated from the NEW payload
    * (stale dims/size would poison metadata-first pruning).
    * Undecodable payloads pass through with a null payload. */
  def resizeImages(media: DataFrame, newW: Int, newH: Int): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select(col("media_id"), col("payload"),
        col("meta.media_type"), col("meta.format"),
        col("meta.duration_ms")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val resized =
            if (r.isNullAt(1)) null
            else ImageIo.resizePng(r.getAs[Array[Byte]](1), newW, newH)
          // duration_ms is null for images born from probeMedia —
          // carry the null through (getLong on it would kill the task)
          val dur: java.lang.Long =
            if (r.isNullAt(4)) null else java.lang.Long.valueOf(r.getLong(4))
          org.apache.spark.sql.Row(r.getLong(0), resized,
            org.apache.spark.sql.Row(r.getString(2), "png",
              newW, newH, dur,
              if (resized == null) 0L else resized.length.toLong))
        }
      }
    spark.createDataFrame(rows, mediaSchema)
  }

  /** Wrap an id+binary frame into the canonical media schema, deriving
    * size metadata from the payload. */
  def toMedia(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String, format: String, width: Column,
      height: Column): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(payloadCol).as("payload"),
      struct(
        lit(mediaType).as("media_type"), lit(format).as("format"),
        width.cast("int").as("width"), height.cast("int").as("height"),
        lit(0L).as("duration_ms"),
        octet_length(col(payloadCol)).cast("long").as("size_bytes"))
        .as("meta"))

  /** Decode+featurize: metadata-only filters FIRST (columnar pruning —
    * payload bytes never leave parquet for filtered-out rows), then the
    * stubbed decode produces features. */
  def extractFeatures(media: DataFrame, minW: Int = 0,
      dim: Int = 8): DataFrame =
    media.filter(col("meta.width") >= minW)
      .select(col("media_id"), col("meta"),
        DecodeStub.featureExpr(col("payload"), dim).as("features"))

  /** Fake frame-sampling for video-typed rows: n evenly spaced "frames",
    * each a deterministic slice hash of the payload — the row-explosion
    * shape (1 video → n frame rows) that a real sampler produces. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media.filter(col("meta.media_type") === "video")
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => xxhash64(col("payload"), i))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_hash")

  /** Resize stage: updates metadata dims and replaces the payload with
    * the stub's re-encoded bytes. */
  def resize(media: DataFrame, newW: Int, newH: Int): DataFrame =
    media.select(col("media_id"),
      expr(s"substring(payload, 1, greatest(1, cast(octet_length(payload)" +
        s" * (($newW * $newH) / greatest(meta.width * meta.height, 1.0))" +
        s" as int)))").as("payload"),
      col("meta"))
      .select(col("media_id"), col("payload"),
        // size_bytes recomputed from the NEW payload — stale metadata
        // would poison the metadata-first pruning contract
        struct(col("meta.media_type").as("media_type"),
          col("meta.format").as("format"),
          lit(newW).as("width"), lit(newH).as("height"),
          col("meta.duration_ms").as("duration_ms"),
          octet_length(col("payload")).cast("long").as("size_bytes"))
          .as("meta"))
}
