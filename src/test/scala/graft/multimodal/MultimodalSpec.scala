package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media = {
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0x01, 0x02, 0x03, 0x04, 0x05, 0x06)
    val wav = "RIFFxxxxWAVEfmt data".getBytes("UTF-8")
    val other = "plain bytes payload here".getBytes("UTF-8")
    Multimodal.toMediaTable(
      Seq((1L, jpeg), (2L, wav), (3L, other)).toDF("id", "bin"), "id", "bin")
  }

  test("toMediaTable builds canonical schema and sniffs formats") {
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.toSeq.map(f => (f.name, f.dataType.sql.replace(" NOT NULL", "")))
    assert(shape(media.schema) == shape(Multimodal.mediaSchema))
    val byId = media.collect().map(r => r.getLong(0) -> r.getStruct(2)).toMap
    assert(byId(1L).getAs[String]("format") == "jpeg")
    assert(byId(2L).getAs[String]("format") == "wav")
    assert(byId(3L).getAs[String]("format") == "bin")
    assert(byId(1L).getAs[Long]("byte_len") == 8L)
  }

  test("extractFeatures emits fixed-dim normalized vectors") {
    val f = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f.values.forall(_.length == 8))
    assert(f.values.forall(v => math.abs(v.sum - 1.0) < 1e-5)) // histogram sums to 1
    // deterministic: rerun gives identical vectors
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f == f2)
  }

  test("resize preserves ids and reshapes bytes deterministically") {
    val out = Multimodal.resize(media, 8, 8).collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Array[Byte]]("media").length == 8)) // (8*8)/8
    assert(out.forall(r => r.getAs[Long]("byte_len") == 8L))
  }

  // a real 16x12 PNG: left half black, right half white
  private def realPng: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG: decode kernel yields luminance histogram, not the byte-histogram stub") {
    val png = realPng
    val tbl = Multimodal.toMediaTable(Seq((10L, png)).toDF("id", "bin"), "id", "bin")
    assert(tbl.head().getStruct(2).getAs[String]("format") == "png")
    val feats = Multimodal.extractFeatures(tbl, dim = 8).head().getSeq[Float](1)
    // half-black/half-white image: all mass in the darkest and brightest
    // luminance buckets — the byte-histogram stub would spread it
    assert(math.abs(feats(0) - 0.5f) < 1e-5 && math.abs(feats(7) - 0.5f) < 1e-5,
      s"expected [0.5,0,...,0,0.5], got ${feats.mkString(",")}")
    assert(feats.slice(1, 7).forall(_ == 0f))
  }

  test("real PNG: resize re-encodes at the target dimensions") {
    val tbl = Multimodal.toMediaTable(Seq((11L, realPng)).toDF("id", "bin"), "id", "bin")
    val out = Multimodal.resize(tbl, 6, 4).head().getAs[Array[Byte]]("media")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(back != null && back.getWidth == 6 && back.getHeight == 4)
  }

  test("real PNG: imageDims fills meta width/height without touching non-images") {
    val png = realPng
    val mixed = Multimodal.toMediaTable(
      Seq((20L, png), (21L, "not an image".getBytes("UTF-8"))).toDF("id", "bin"), "id", "bin")
    val withDims = Multimodal.imageDims(mixed)
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.toSeq.map(f => (f.name, f.dataType.sql.replace(" NOT NULL", "")))
    assert(shape(withDims.schema) == shape(Multimodal.mediaSchema))
    val byId = withDims.collect().map(r => r.getLong(0) -> r.getStruct(2)).toMap
    assert(byId(20L).getAs[Int]("width") == 16 && byId(20L).getAs[Int]("height") == 12)
    assert(byId(21L).isNullAt(byId(21L).fieldIndex("width")))
  }

  // a real 36x32 PNG of 4x4 luma blocks (deterministic per-block level)
  // — block-structured so the 9x8 dHash grid sees distinct averages
  private def blockPng(invert: Boolean = false, brighten: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(36, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 36) {
      val base = ((x / 4) * 37 + (y / 4) * 101) % 256
      val v0 = if (invert) 255 - base else base
      val v = math.min(255, math.max(0, v0 + brighten))
      img.setRGB(x, y, v << 16 | v << 8 | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("imageDHash: stable under resize + brightness, far for distinct images, drops non-images") {
    val orig = blockPng()
    // same content re-rendered at 27x24 with a +12 brightness shift —
    // the re-encode/rescale survivor class a perceptual hash must group
    val variantSrc = blockPng(brighten = 12)
    val variant = Multimodal.resizeKernel(variantSrc, 27, 24)
    val inverted = blockPng(invert = true)
    val tbl = Multimodal.toMediaTable(
      Seq((1L, orig), (2L, variant), (3L, inverted),
        (4L, "not an image".getBytes("UTF-8"))).toDF("id", "bin"), "id", "bin")
    val hs = Multimodal.imageDHash(tbl).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs.keySet == Set(1L, 2L, 3L)) // undecodable bytes dropped, not crashed
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(1L), hs(2L)) <= 12,
      s"resize+brightness variant drifted ${hamming(hs(1L), hs(2L))} bits")
    assert(hamming(hs(1L), hs(3L)) >= 24,
      s"inverted image only ${hamming(hs(1L), hs(3L))} bits away")
  }

  test("imageDHash feeds Dedup.exact: byte-identical copies form one perceptual group") {
    val orig = blockPng()
    val tbl = Multimodal.toMediaTable(
      Seq((1L, orig), (2L, orig), (3L, blockPng(invert = true))).toDF("id", "bin"), "id", "bin")
    val hashed = Multimodal.imageDHash(tbl)
    val groups = graft.ops.Dedup.exact(hashed, "media_id", col("dhash")).collect()
      .map(r => (r.getAs[Long]("rep_id"), r.getAs[Long]("n_copies")))
    assert(groups.toSet == Set((1L, 2L), (3L, 1L)))
  }

  // a real 1-second 440 Hz sine WAV at 8 kHz mono, amplitude 0.5
  private def realWav: Array[Byte] = {
    val hz = 8000
    val samples = Array.tabulate(hz)(i =>
      (0.5 * math.sin(2 * math.Pi * 440 * i / hz)).toFloat)
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      val s = math.round(samples(i) * 32767f).toShort
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(hz.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV: extractFeatures yields the RMS envelope, not the byte-histogram stub") {
    val tbl = Multimodal.toMediaTable(Seq((30L, realWav)).toDF("id", "bin"), "id", "bin")
    assert(tbl.head().getStruct(2).getAs[String]("format") == "wav")
    val feats = Multimodal.extractFeatures(tbl, dim = 8).head().getSeq[Float](1)
    // constant-amplitude sine: every window's RMS ≈ 0.5/√2 ≈ 0.3536
    // (byte-histogram stub would instead sum to 1 across buckets)
    assert(feats.length == 8)
    feats.foreach(v => assert(math.abs(v - 0.3536f) < 0.01, s"RMS window off: $v"))
  }

  test("real WAV: audioMeta fills duration_ms from the header only") {
    val mixed = Multimodal.toMediaTable(
      Seq((31L, realWav), (32L, "not audio".getBytes("UTF-8"))).toDF("id", "bin"), "id", "bin")
    val withMeta = Multimodal.audioMeta(mixed)
    def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
      s.fields.toSeq.map(f => (f.name, f.dataType.sql.replace(" NOT NULL", "")))
    assert(shape(withMeta.schema) == shape(Multimodal.mediaSchema))
    val byId = withMeta.collect().map(r => r.getLong(0) -> r.getStruct(2)).toMap
    assert(byId(31L).getAs[Long]("duration_ms") == 1000L)
    assert(byId(32L).isNullAt(byId(32L).fieldIndex("duration_ms")))
  }

  test("real WAV: resampleAudio halves the rate, preserves duration and energy") {
    val tbl = Multimodal.toMediaTable(Seq((33L, realWav)).toDF("id", "bin"), "id", "bin")
    val out = Multimodal.resampleAudio(tbl, 4000).head().getAs[Array[Byte]]("media")
    val info = Multimodal.audioInfoKernel(out)
    assert(info.isDefined, "resampled bytes must be a decodable WAV")
    val (rate, ch, durMs) = info.get
    assert(rate == 4000f && ch == 1 && math.abs(durMs - 1000L) <= 1)
    // 440 Hz is far below the 2 kHz Nyquist: RMS survives the resample
    val rms = Multimodal.audioFeaturesKernel(out, 1).get.head
    assert(math.abs(rms - 0.3536f) < 0.01, s"post-resample RMS off: $rms")
  }

  // a real Motion-JPEG AVI: 10 JPEG frames, each a solid gray level
  // 0,25,...,225 so the sampled frame order is observable after decode
  private def realMjpegAvi: Array[Byte] = {
    def jpegFrame(gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(cc: String, data: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(cc.getBytes("US-ASCII")); b.write(le32(data.length)); b.write(data)
      if (data.length % 2 == 1) b.write(0) // RIFF pads chunks to even
      b.toByteArray
    }
    val movi = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("movi".getBytes("US-ASCII"))
      (0 until 10).foreach(i => b.write(chunk("00dc", jpegFrame(i * 25))))
      b.toByteArray
    }
    val list = chunk("LIST", movi)
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(le32(4 + list.length)) // "AVI " + payload
    bos.write("AVI ".getBytes("US-ASCII"))
    bos.write(list)
    bos.toByteArray
  }

  test("real MJPEG AVI: frameSample returns decodable JPEG frames, evenly spaced") {
    val avi = realMjpegAvi
    val tbl = Multimodal.toMediaTable(Seq((40L, avi)).toDF("id", "bin"), "id", "bin")
    assert(tbl.head().getStruct(2).getAs[String]("format") == "avi")
    val frames = Multimodal.frameSample(tbl, nFrames = 4)
      .orderBy("frame_no").collect().map(_.getAs[Array[Byte]]("frame"))
    assert(frames.length == 4)
    val grays = frames.map { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth == 8 && img.getHeight == 8, "frame must be a real JPEG")
      img.getRGB(4, 4) & 0xff
    }
    // frames 0,3,6,9 of gray levels 0..225 step 25 → ~0,75,150,225
    // (JPEG is lossy: allow a few levels of error)
    val expected = Seq(0, 75, 150, 225)
    grays.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e) <= 8, s"sampled grays ${grays.mkString(",")} vs $expected")
    }
  }

  test("frameSample is row-to-many with frame indices") {
    val frames = Multimodal.frameSample(media, nFrames = 4)
    assert(frames.filter(col("media_id") === 2).count() == 4)
    val idx = frames.filter(col("media_id") === 2)
      .orderBy("frame_no").collect().map(_.getInt(1)).toSeq
    assert(idx == Seq(0, 1, 2, 3))
  }
}
