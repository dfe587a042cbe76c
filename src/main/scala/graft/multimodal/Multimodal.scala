package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines (builder-prompt extension surface).
  *
  * Media is carried as an opaque `binary` column plus a typed metadata
  * struct — the schema a 100 TB multimodal dataset actually uses (media
  * bytes inline for small assets, or a URI + byte-range into an object
  * store for large ones; both shapes are supported by [[mediaSchema]]).
  *
  * The decode kernels (JPEG decode, audio resample, video frame-split)
  * need native libraries that are NOT in this container, so the kernel
  * functions are deliberately STUBBED with deterministic fakes — but all
  * the Spark-side plumbing is real and tested: schema, batched
  * per-partition execution (`mapPartitions` over iterator batches — the
  * JVM analogue of `mapInPandas`' arrow-batch shape), output schema
  * contracts, and partition sizing.
  *
  * Scale notes:
  *  - decode is CPU-heavy per row → `repartition` upstream so each task
  *    gets ~`targetRowsPerBatch` rows; no shuffle is introduced here.
  *  - kernels process a whole Iterator per partition, so per-batch setup
  *    (decoder init, model load) is amortized — the same reason
  *    mapInPandas batches.
  *  - never collect: everything is row-to-row or row-to-many (frames).
  */
object Multimodal {

  /** Metadata carried with every media value. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),      // e.g. jpeg / wav / mp4
    StructField("width", IntegerType),      // images/video; null for audio
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),   // audio/video; null for images
    StructField("uri", StringType),         // external location (nullable)
    StructField("byte_len", LongType)))

  /** The canonical multimodal row: id + media bytes + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media", BinaryType),
    StructField("meta", metaSchema)))

  /** Wrap a (id, binary) DataFrame into the canonical schema, deriving
    * metadata from the bytes (format sniffed from magic bytes). */
  def toMediaTable(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val b = col(binCol)
    val fmt = when(hex(b).startsWith("FFD8"), "jpeg")
      .when(hex(b).startsWith("52494646"), "wav")
      .when(hex(b).substr(lit(9), lit(8)) === lit("66747970"), "mp4")
      .otherwise("bin")
    df.select(
      col(idCol).cast("long").as("media_id"),
      b.as("media"),
      struct(
        fmt.as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("string").as("uri"),
        octet_length(b).cast("long").as("byte_len")).as("meta"))
  }

  // ---- stubbed kernels ----------------------------------------------------
  // Each kernel is the per-partition batch function a real implementation
  // would hand to a native decoder. The fakes are DETERMINISTIC pure
  // functions of the bytes so tests are stable.

  /** STUB: image decode → fixed-size feature vector. A real kernel would
    * decode JPEG and run a vision encoder; the fake emits a 8-dim byte
    * histogram (deterministic in the bytes). */
  private[multimodal] def decodeFeaturesKernel(media: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < media.length) { hist((media(i) & 0xff) % dim) += 1f; i += 1 }
    if (media.length > 0) { var j = 0; while (j < dim) { hist(j) /= media.length; j += 1 } }
    hist
  }

  /** STUB: image resize — a real kernel returns re-encoded bytes; the
    * fake truncates/pads to a deterministic target length derived from
    * (w, h) so the batch shape and schema are exercised. */
  private[multimodal] def resizeKernel(media: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, (w * h) / 8)
    java.util.Arrays.copyOf(media, target)
  }

  /** STUB: video frame sampling — a real kernel splits container frames;
    * the fake slices the bytes into `n` equal chunks. */
  private[multimodal] def frameSampleKernel(media: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (media.isEmpty) Seq.empty
    else {
      val step = math.max(1, media.length / n)
      (0 until math.min(n, media.length)).map { i =>
        val from = i * step
        java.util.Arrays.copyOfRange(media, from, math.min(from + step, media.length))
      }
    }
  }

  // ---- dataset-level operators -------------------------------------------

  /** STUB kernel variant with exact integer output (oracle-checkable):
    * histogram of byte values mod dim, as counts. */
  private[multimodal] def byteHistogramKernel(media: Array[Byte], dim: Int): Array[Long] = {
    val hist = new Array[Long](dim)
    var i = 0
    while (i < media.length) { hist((media(i) & 0xff) % dim) += 1L; i += 1 }
    hist
  }

  /** Byte-histogram counts via the batched mapPartitions path —
    * (media_id, h: array<long> of length dim). */
  def byteHistogram(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) => (id, byteHistogramKernel(bytes, dim)) })
      .toDF("media_id", "h")
  }

  /** Feature-extract: media table → (media_id, features array<float>).
    * Batched per partition; decoder init happens once per partition. */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col("media_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would go here (decoder/model init)
        it.map { case (id, bytes) => (id, decodeFeaturesKernel(bytes, dim)) }
      }
    out.toDF("media_id", "features")
  }

  /** Resize: media table → same schema with transformed bytes + meta. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media"), col("meta.format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(it => it.map { case (id, bytes, fmt) =>
        val r = resizeKernel(bytes, w, h)
        (id, r, fmt, r.length.toLong)
      })
      .toDF("media_id", "media", "format", "byte_len")
  }

  /** Frame-sample: one row per sampled frame (row-to-many). */
  def frameSample(media: DataFrame, nFrames: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        frameSampleKernel(bytes, nFrames).zipWithIndex.map { case (f, i) => (id, i, f) }
      })
      .toDF("media_id", "frame_no", "frame")
  }
}
