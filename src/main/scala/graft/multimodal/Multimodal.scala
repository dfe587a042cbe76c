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
  * The IMAGE kernels are REAL: decode / feature-extract / resize /
  * dimension probing run on `javax.imageio` (JDK built-in readers for
  * PNG, JPEG, GIF, BMP — no native deps). The AUDIO kernels are REAL
  * for the JDK sound stack's formats (WAV/AIFF/AU carrying PCM or
  * uLaw/aLaw): decode, duration probe, RMS-envelope features, and
  * linear-interpolation resampling run on `javax.sound.sampled` — again
  * no native deps. The VIDEO frame-split kernel is REAL for Motion-JPEG
  * AVI (pure RIFF container walk; each frame is an independently
  * decodable JPEG) — other video codecs (H.264/MP4) need libraries NOT
  * in this container and fall back to the deterministic byte-slicing
  * stub, as do payloads no stack accepts, so arbitrary bytes still flow
  * through the same plumbing with stable outputs. The Spark-side
  * plumbing — schema, batched per-partition execution (`mapPartitions`
  * over iterator batches, the JVM analogue of `mapInPandas`'
  * arrow-batch shape), output schema contracts, partition sizing — is
  * real and tested for all kernels.
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
    // sniff on the first 12 bytes only — hex() of the whole payload would
    // allocate 2x-payload strings per CASE branch on multi-MB media rows.
    // RIFF is a container family: bytes 8-11 say which (WAVE vs AVI).
    val head = hex(substring(b, 1, 12))
    val fmt = when(head.startsWith("FFD8"), "jpeg")
      .when(head.startsWith("89504E47"), "png")
      .when(head.startsWith("52494646") &&
        head.substr(lit(17), lit(8)) === lit("41564920"), "avi")
      .when(head.startsWith("52494646"), "wav")
      .when(head.substr(lit(9), lit(8)) === lit("66747970"), "mp4")
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

  // ---- kernels ------------------------------------------------------------
  // Each kernel is the per-partition batch function handed to the decoder.
  // Image paths are real (javax.imageio); the non-image fallbacks are
  // DETERMINISTIC pure functions of the bytes so tests are stable.

  // the sources are in-memory byte arrays: disable ImageIO's disk-backed
  // stream cache or every kernel call pays a temp-file round trip
  javax.imageio.ImageIO.setUseCache(false)

  /** Decode bytes as an image via ImageIO, None if no installed reader
    * accepts them OR the reader blows up on malformed data (JDK readers
    * throw unchecked CMMException/AIOOBE on corrupt JPEGs — any failure
    * is the stub-fallback trigger, never a task failure). Thread-safe per
    * call, no native libs for PNG/JPEG/GIF/BMP. */
  private[multimodal] def decodeImage(media: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (media == null || media.isEmpty) None
    else Option(
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
      catch { case scala.util.control.NonFatal(_) => null })

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Image decode → fixed-size feature vector. REAL for image bytes: a
    * `dim`-bucket luminance histogram over decoded pixels, normalized by
    * pixel count (the classic cheap visual descriptor; a production
    * pipeline would swap the histogram for a vision-encoder forward pass
    * in the same per-partition batch position). Audio bytes get the REAL
    * RMS-envelope descriptor ([[audioFeaturesKernel]]); bytes that are
    * neither fall back to a normalized byte histogram (deterministic
    * stub). */
  private[multimodal] def decodeFeaturesKernel(media: Array[Byte], dim: Int): Array[Float] =
    if (media == null) new Array[Float](dim)
    else decodeImage(media) match {
      case Some(img) =>
        val hist = new Array[Float](dim)
        val (w, h) = (img.getWidth, img.getHeight)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            hist(lum * dim / 256) += 1f
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat // gigapixel images overflow Int
        var j = 0; while (j < dim) { hist(j) /= n; j += 1 }
        hist
      case None =>
        audioFeaturesKernel(media, dim).getOrElse {
          val hist = new Array[Float](dim)
          var i = 0
          while (i < media.length) { hist((media(i) & 0xff) % dim) += 1f; i += 1 }
          if (media.length > 0) { var j = 0; while (j < dim) { hist(j) /= media.length; j += 1 } }
          hist
        }
    }

  /** Image resize. REAL for image bytes: bilinear rescale to (w, h) and
    * PNG re-encode via ImageIO. Non-image bytes truncate/pad to a
    * deterministic target length (stub) so the batch shape and schema are
    * exercised for any payload. */
  private[multimodal] def resizeKernel(media: Array[Byte], w: Int, h: Int): Array[Byte] =
    decodeImage(media) match {
      case Some(img) =>
        val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        encodePng(out)
      case None =>
        val target = math.max(1, (w * h) / 8)
        java.util.Arrays.copyOf(media, target)
    }

  /** Difference-hash (dHash) perceptual fingerprint. REAL for image
    * bytes: area-average downscale to 9×8 luma, one bit per horizontal
    * gradient sign (64 bits total) — the standard perceptual hash of
    * large-scale image-dedup pipelines (robust to re-encode, resize and
    * mild brightness shifts; visually distinct images land ~32 bits
    * apart). None for bytes no ImageIO reader accepts — a curation
    * pipeline treats those as their own identity class, never a crash. */
  private[multimodal] def dHashKernel(media: Array[Byte]): Option[Long] =
    decodeImage(media).map { img =>
      val (w, h) = (9, 8)
      val scaled = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = scaled.createGraphics()
      try g.drawImage(
        img.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
      finally g.dispose()
      def luma(px: Int): Int = (px >> 16 & 0xff) * 299 + (px >> 8 & 0xff) * 587 + (px & 0xff) * 114
      var bits = 0L
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w - 1) {
          if (luma(scaled.getRGB(x, y)) < luma(scaled.getRGB(x + 1, y))) bits |= 1L << i
          i += 1; x += 1
        }
        y += 1
      }
      bits
    }

  /** Image dimension probe. REAL: reads only the header via ImageIO's
    * reader API (no full pixel decode — cheap even for huge images).
    * None for non-image bytes. */
  private[multimodal] def imageDimsKernel(media: Array[Byte]): Option[(Int, Int)] = {
    if (media == null || media.isEmpty) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(media))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
        catch { case scala.util.control.NonFatal(_) => None }
        finally r.dispose()
      }
    } finally iis.close()
  }

  // ---- audio kernels (REAL via javax.sound.sampled) -----------------------

  /** Decode bytes as audio via the JDK sound stack (WAV/AIFF/AU readers,
    * PCM + uLaw/aLaw codecs — no native libs). Returns (sampleRateHz,
    * channels, mono-mixed samples normalized to [-1, 1]); None when no
    * installed reader accepts the bytes or decoding blows up (the
    * stub-fallback trigger, never a task failure). */
  private[multimodal] def decodeAudio(media: Array[Byte]): Option[(Float, Int, Array[Float])] = {
    if (media == null || media.isEmpty) return None
    try {
      val ais0 = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(media))
      try {
        val f0 = ais0.getFormat
        // normalize whatever the file carries (8-bit, unsigned, big-endian,
        // uLaw...) to 16-bit signed little-endian PCM at the SOURCE rate —
        // these conversions are in the stock JDK; rate conversion is not
        // (that's what [[resampleKernel]] implements)
        val target = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          f0.getSampleRate, 16, f0.getChannels, 2 * f0.getChannels, f0.getSampleRate, false)
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais0)
        val bytes = ais.readAllBytes()
        val ch = math.max(1, f0.getChannels)
        val nFrames = bytes.length / (2 * ch)
        val mono = new Array[Float](nFrames)
        var i = 0
        while (i < nFrames) {
          var sum = 0f
          var c = 0
          while (c < ch) {
            val off = (i * ch + c) * 2
            sum += (((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort) / 32768f
            c += 1
          }
          mono(i) = sum / ch
          i += 1
        }
        Some((f0.getSampleRate, ch, mono))
      } finally ais0.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Audio header probe: (sampleRateHz, channels, durationMs) without
    * decoding any samples (AudioFileFormat reads only the header). None
    * for non-audio bytes or headers without a frame count. */
  private[multimodal] def audioInfoKernel(media: Array[Byte]): Option[(Float, Int, Long)] = {
    if (media == null || media.isEmpty) return None
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(media))
      val f = aff.getFormat
      if (aff.getFrameLength <= 0 || f.getFrameRate <= 0) None
      else Some((f.getSampleRate, f.getChannels,
        math.round(aff.getFrameLength * 1000.0 / f.getFrameRate)))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Audio feature vector. REAL for audio bytes: `dim`-window RMS energy
    * envelope over the mono-mixed PCM samples (the classic cheap audio
    * descriptor; a production pipeline would swap in a mel-spectrogram or
    * audio-encoder forward pass in the same batch position). */
  private[multimodal] def audioFeaturesKernel(media: Array[Byte], dim: Int): Option[Array[Float]] =
    decodeAudio(media).collect { case (_, _, samples) if samples.nonEmpty =>
      val env = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        val from = (i.toLong * samples.length / dim).toInt
        val to = ((i + 1).toLong * samples.length / dim).toInt
        var acc = 0.0
        var j = from
        while (j < to) { acc += samples(j).toDouble * samples(j); j += 1 }
        env(i) = if (to > from) math.sqrt(acc / (to - from)).toFloat else 0f
        i += 1
      }
      env
    }

  /** Encode mono [-1,1] samples as a 16-bit PCM little-endian WAV. */
  private def encodeWav(samples: Array[Float], hz: Int): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = math.max(-32768, math.min(32767, math.round(samples(i) * 32767f))).toShort
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(hz.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Audio resample to `targetHz`. REAL for audio bytes: linear
    * interpolation over the decoded mono samples (deterministic,
    * executor-local DSP — the JDK converts encodings but not rates),
    * re-encoded as 16-bit PCM WAV. Non-audio bytes truncate to half
    * length (deterministic stub exercising the batch shape; the rate is
    * unknowable without a decodable header). */
  private[multimodal] def resampleKernel(media: Array[Byte], targetHz: Int): Array[Byte] =
    if (media == null) Array.emptyByteArray
    else decodeAudio(media) match {
      case Some((srcHz, _, samples)) if samples.nonEmpty =>
        val n = math.max(1, math.round(samples.length.toLong * targetHz / srcHz.toDouble).toInt)
        val out = new Array[Float](n)
        val step = (samples.length - 1).toDouble / math.max(1, n - 1)
        var i = 0
        while (i < n) {
          val pos = i * step
          val i0 = pos.toInt
          val i1 = math.min(i0 + 1, samples.length - 1)
          val frac = (pos - i0).toFloat
          out(i) = samples(i0) * (1 - frac) + samples(i1) * frac
          i += 1
        }
        encodeWav(out, targetHz)
      case _ =>
        java.util.Arrays.copyOf(media, math.max(1, media.length / 2))
    }

  // ---- video kernels (REAL for Motion-JPEG AVI; stub otherwise) -----------

  /** Walk a RIFF/AVI container and return the Motion-JPEG frame payloads
    * ('00dc'/'01dc'-style video chunks that start with the JPEG SOI
    * marker). Pure byte-walking — RIFF is fourcc(4) + size(4 LE) + data
    * (padded to even), with LIST chunks nesting. Empty result for
    * non-AVI bytes or AVIs whose codec isn't MJPEG. */
  private[multimodal] def parseMjpegFrames(media: Array[Byte]): Vector[Array[Byte]] = {
    def le32(off: Int): Long =
      (media(off) & 0xffL) | (media(off + 1) & 0xffL) << 8 |
        (media(off + 2) & 0xffL) << 16 | (media(off + 3) & 0xffL) << 24
    def fourcc(off: Int): String =
      new String(media, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (media == null || media.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
      return Vector.empty
    val frames = Vector.newBuilder[Array[Byte]]
    // depth cap: real AVIs nest 2-3 LIST levels; a crafted file nesting
    // thousands must not stack-overflow the task
    def walk(from: Int, to: Int, depth: Int): Unit = {
      if (depth > 16) return
      var off = from
      while (off + 8 <= to) {
        val cc = fourcc(off)
        val size = le32(off + 4)
        val dataStart = off + 8
        val dataEnd = dataStart + size
        if (size < 0 || dataEnd > to) return // malformed size: stop, keep what we have
        if (cc == "LIST" && size >= 4) walk(dataStart + 4, dataEnd.toInt, depth + 1)
        else if (cc.endsWith("dc") || cc.endsWith("db")) {
          // video stream chunk; keep only JPEG payloads (MJPEG)
          if (size >= 2 && (media(dataStart) & 0xff) == 0xFF && (media(dataStart + 1) & 0xff) == 0xD8)
            frames += java.util.Arrays.copyOfRange(media, dataStart, dataEnd.toInt)
        }
        off = dataEnd.toInt + (size.toInt & 1) // chunks pad to even length
      }
    }
    walk(12, media.length, 0)
    frames.result()
  }

  /** Video frame sampling. REAL for Motion-JPEG AVI bytes: parses the
    * RIFF container and returns `n` evenly-spaced JPEG frames (each
    * independently decodable — MJPEG frames are plain JPEGs). Other
    * payloads fall back to slicing the bytes into `n` equal chunks
    * (deterministic stub; real MP4/H.264 needs codec libraries not in
    * this container). (Still-image bytes are not frame-sampled: one
    * frame = the image itself, use [[resize]]/[[extractFeatures]].) */
  private[multimodal] def frameSampleKernel(media: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (media == null) return Seq.empty
    val mjpeg = parseMjpegFrames(media)
    if (mjpeg.nonEmpty) {
      val k = math.min(n, mjpeg.length)
      // evenly spaced indices across the clip, endpoints included
      (0 until k).map(i => mjpeg(if (k == 1) 0 else (i.toLong * (mjpeg.length - 1) / (k - 1)).toInt))
    } else if (media.isEmpty) Seq.empty
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

  /** Fill meta.width/meta.height for image rows by probing headers
    * (ImageIO reader metadata — no pixel decode); non-image rows keep
    * null dims. Same canonical schema out. */
  def imageDims(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media"), col("meta.format"),
        col("meta.duration_ms"), col("meta.uri"), col("meta.byte_len"))
      .as[(Long, Array[Byte], String, Option[Long], Option[String], Option[Long])]
      .mapPartitions(it => it.map { case (id, bytes, fmt, dur, uri, len) =>
        val dims = imageDimsKernel(bytes)
        (id, bytes, fmt, dims.map(_._1), dims.map(_._2), dur, uri, len)
      })
      .toDF("media_id", "media", "format", "width", "height", "duration_ms", "uri", "byte_len")
      .select(col("media_id"), col("media"),
        struct(col("format"), col("width"), col("height"),
          col("duration_ms"), col("uri"), col("byte_len")).as("meta"))
  }

  /** Perceptual image hash: media table → (media_id, dhash) for rows
    * ImageIO can decode (others are dropped — report them via the
    * anti-join if a pipeline wants the undecodable list). Feed the
    * result to [[graft.ops.Dedup.exact]] on `dhash` for exact
    * perceptual groups, or to the SimHash hamming-pair join for
    * near-dup pairs at a bit threshold — dhash IS a 64-bit simhash-
    * shaped key, so the whole text near-dup toolchain applies
    * unchanged. Decode cost is the map stage; everything downstream
    * shuffles 16 bytes/row. */
  def imageDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        dHashKernel(bytes).map(hc => (id, hc))
      })
      .toDF("media_id", "dhash")
  }

  /** Fill meta.duration_ms (width/height stay untouched) for audio rows
    * by probing headers only — no sample decode; rows the sound stack
    * cannot parse KEEP whatever duration they already carried (e.g. a
    * catalog-supplied mp4 duration). Same canonical schema out. */
  def audioMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media"), col("meta.format"), col("meta.width"),
        col("meta.height"), col("meta.duration_ms"), col("meta.uri"), col("meta.byte_len"))
      .as[(Long, Array[Byte], String, Option[Int], Option[Int], Option[Long], Option[String], Option[Long])]
      .mapPartitions(it => it.map { case (id, bytes, fmt, w, h, dur0, uri, len) =>
        (id, bytes, fmt, w, h, audioInfoKernel(bytes).map(_._3).orElse(dur0), uri, len)
      })
      .toDF("media_id", "media", "format", "width", "height", "duration_ms", "uri", "byte_len")
      .select(col("media_id"), col("media"),
        struct(col("format"), col("width"), col("height"),
          col("duration_ms"), col("uri"), col("byte_len")).as("meta"))
  }

  /** Resample audio rows to `targetHz` (16-bit PCM WAV out); same
    * canonical row shape as [[resize]]'s output. */
  def resampleAudio(media: DataFrame, targetHz: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media"), col("meta.format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(it => it.map { case (id, bytes, fmt) =>
        val r = resampleKernel(bytes, targetHz)
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
