package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media as opaque
  * `binary` payloads + a typed metadata struct, with decode / feature /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing (schema, batch shape, partition sizing,
  * pipeline composition) is real and tested; the actual codec call is
  * STUBBED behind `DecodeStub` as a deterministic fake — the container
  * has no image/audio libraries. A deployment swaps `DecodeStub.decode`
  * for an FFI call (JNI / ONNX / javacv); every signature stays put.
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
