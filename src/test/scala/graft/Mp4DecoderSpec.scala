package graft

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import graft.ops.Multimodal

/** The MP4/ISO-BMFF header parser on synthetic but structurally valid
  * containers: v0 and v1 headers, 64-bit largesize framing, audio+video
  * track selection, and corrupt-payload degradation.
  */
class Mp4DecoderSpec extends SparkSpec {

  private def box(tag: String, payload: Array[Byte], largesize: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    if (largesize) {
      out.write(ByteBuffer.allocate(4).putInt(1).array())
      out.write(tag.getBytes("ISO-8859-1"))
      out.write(ByteBuffer.allocate(8).putLong(16L + payload.length).array())
    } else {
      out.write(ByteBuffer.allocate(4).putInt(8 + payload.length).array())
      out.write(tag.getBytes("ISO-8859-1"))
    }
    out.write(payload)
    out.toByteArray
  }

  /** mvhd v0: version/flags, ctime, mtime, timescale, duration, + tail. */
  private def mvhdV0(timescale: Int, duration: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(100)
    b.putInt(0)           // version 0 + flags
    b.putInt(0).putInt(0) // ctime, mtime
    b.putInt(timescale).putInt(duration)
    box("mvhd", b.array())
  }

  private def mvhdV1(timescale: Int, duration: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(112)
    b.putInt(0x01000000)        // version 1
    b.putLong(0L).putLong(0L)   // ctime, mtime (64-bit)
    b.putInt(timescale).putLong(duration)
    box("mvhd", b.array())
  }

  /** tkhd v0 with 16.16 fixed-point dimensions at offsets 76/80. */
  private def tkhdV0(w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(84)
    b.position(76)
    b.putInt(w << 16).putInt(h << 16)
    box("trak", box("tkhd", b.array()))
  }

  /** tkhd v1 per ISO 14496-12: version/flags(4) + ctime(8) + mtime(8) +
    * track_ID(4) + reserved(4) + duration(8) + reserved(8) + layer/group/
    * volume/reserved(8) + matrix(36) = 88 bytes before width.
    */
  private def tkhdV1(w: Int, h: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(96)
    b.putInt(0x01000000)
    b.position(88)
    b.putInt(w << 16).putInt(h << 16)
    box("trak", box("tkhd", b.array()))
  }

  private def mp4(moovChildren: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(box("ftyp", "isom0000isomiso2".getBytes("ISO-8859-1")))
    val moov = new ByteArrayOutputStream()
    moovChildren.foreach(moov.write)
    out.write(box("moov", moov.toByteArray))
    out.toByteArray
  }

  test("v0 headers: dimensions, duration, video track wins over audio") {
    val bytes = mp4(
      mvhdV0(timescale = 600, duration = 3000), // 5 s
      tkhdV0(0, 0),                             // audio track: 0x0
      tkhdV0(1920, 1080))
    val meta = Multimodal.parseMp4(bytes).get
    assert(meta === Multimodal.Mp4Meta(1920, 1080, 5000L, 2))
    assert(Multimodal.Mp4Decoder.decode(bytes) === ((1920, 1080, "video/mp4")))
  }

  test("v1 (64-bit) headers and largesize framing parse identically") {
    val moov = new ByteArrayOutputStream()
    moov.write(mvhdV1(timescale = 1000, duration = 90500L)) // 90.5 s
    moov.write(tkhdV1(640, 480))
    val out = new ByteArrayOutputStream()
    out.write(box("ftyp", "isom".getBytes("ISO-8859-1")))
    out.write(box("moov", moov.toByteArray, largesize = true))
    val meta = Multimodal.parseMp4(out.toByteArray).get
    assert(meta === Multimodal.Mp4Meta(640, 480, 90500L, 1))
  }

  test("corrupt and non-MP4 payloads degrade, never throw") {
    assert(Multimodal.Mp4Decoder.decode(Array[Byte](1, 2, 3))
      === ((0, 0, "application/octet-stream")))
    // declared box size runs past the buffer
    val bad = ByteBuffer.allocate(16)
      .putInt(9999).put("ftyp".getBytes("ISO-8859-1")).array()
    assert(Multimodal.parseMp4(bad) === None)
    // ftyp but no moov
    val noMoov = box("ftyp", "isom".getBytes("ISO-8859-1"))
    assert(Multimodal.parseMp4(noMoov) === None)
    // a PNG is not an MP4
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 0, 0, 0, 0)
    assert(Multimodal.parseMp4(png) === None)
  }

  // ------------------------------------------------ real frame decode path

  /** A real JPEG (ImageIO-encoded) of a solid gray level. */
  private def jpegBytes(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(gray, gray, gray))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** A structurally valid MJPEG MP4: ftyp, mdat holding the encoded frames
    * (chunk 1 = frames 0..1 contiguous, chunk 2 = frame 2 — exercising a
    * multi-entry stsc), and a moov whose stbl addresses them exactly.
    */
  private def mjpegMp4(frames: Seq[Array[Byte]], timescale: Int, delta: Int): Array[Byte] = {
    val ftyp = box("ftyp", "isom0000isomiso2".getBytes("ISO-8859-1"))
    val mdatPayload = frames.reduce(_ ++ _)
    val chunk1Off = ftyp.length + 8L
    val chunk2Off = chunk1Off + frames(0).length + frames(1).length
    def fullBox(tag: String, body: ByteBuffer) = box(tag, body.array())
    val stsd = {
      val b = ByteBuffer.allocate(8 + 16)
      b.putInt(0).putInt(1)                      // version/flags, entry_count
      b.putInt(16).put("jpeg".getBytes("ISO-8859-1")) // minimal sample entry
      fullBox("stsd", b)
    }
    val stts = fullBox("stts",
      ByteBuffer.allocate(16).putInt(0).putInt(1).putInt(frames.length).putInt(delta))
    val stsc = fullBox("stsc", ByteBuffer.allocate(8 + 24)
      .putInt(0).putInt(2)
      .putInt(1).putInt(2).putInt(1)   // chunks 1.. : 2 samples each
      .putInt(2).putInt(1).putInt(1))  // chunks 2.. : 1 sample each
    val stsz = {
      val b = ByteBuffer.allocate(12 + 4 * frames.length)
      b.putInt(0).putInt(0).putInt(frames.length)
      frames.foreach(f => b.putInt(f.length))
      fullBox("stsz", b)
    }
    val stco = fullBox("stco", ByteBuffer.allocate(8 + 8)
      .putInt(0).putInt(2).putInt(chunk1Off.toInt).putInt(chunk2Off.toInt))
    val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
    val mdhd = {
      val b = ByteBuffer.allocate(24)
      b.putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(delta * frames.length)
      fullBox("mdhd", b)
    }
    val trak = {
      val tk = ByteBuffer.allocate(84)
      tk.position(76)
      tk.putInt(40 << 16).putInt(30 << 16)
      box("trak", box("tkhd", tk.array()) ++ box("mdia", mdhd ++ box("minf", stbl)))
    }
    ftyp ++ box("mdat", mdatPayload) ++ box("moov", mvhdV0(timescale, delta * frames.length) ++ trak)
  }

  test("sample tables resolve frame extents and timestamps from the container") {
    val frames = Seq(jpegBytes(40, 30, 16), jpegBytes(40, 30, 112), jpegBytes(40, 30, 208))
    val bytes = mjpegMp4(frames, timescale = 600, delta = 200)
    val (codec, samples) = Multimodal.mp4SampleTable(bytes).get
    assert(codec === "jpeg")
    assert(samples.map(_.idx) === Seq(0, 1, 2))
    assert(samples.map(_.ptsMs) === Seq(0L, 333L, 666L)) // 200/600ths of a second
    assert(samples.map(_.size) === frames.map(_.length))
    // the located extents are EXACTLY the encoded frames
    samples.zip(frames).foreach { case (s, f) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, s.offset.toInt, s.offset.toInt + s.size), f))
    }
    assert(Multimodal.mp4SampleTable(Array[Byte](1, 2, 3)) === None)
  }

  test("sampleMp4Frames decodes REAL pixels through the MJPEG seam") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val grays = Seq(16, 112, 208)
    val good = mjpegMp4(grays.map(jpegBytes(40, 30, _)), timescale = 600, delta = 200)
    val schema = StructType(Seq(
      StructField("id", LongType, false), StructField("payload", BinaryType, true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, good), Row(2L, Array[Byte](9, 9, 9)), Row(3L, null)), 2), schema)
    val got = Multimodal.sampleMp4Frames(df, "id", "payload",
        decoder = Multimodal.MjpegFrameDecoder)
      .orderBy("id", "frame_idx").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 1L, 1L), "only the parseable MP4 yields rows")
    assert(got.map(_.getInt(1)).toSeq === Seq(0, 1, 2))
    assert(got.map(_.getLong(2)).toSeq === Seq(0L, 333L, 666L))
    assert(got.forall(r => r.getInt(5) === 40 && r.getInt(6) === 30), "decoded dimensions")
    // decoded MEAN LUMA tracks each frame's gray level (JPEG is lossy on a
    // solid field only at the margin)
    got.zip(grays).foreach { case (r, g) =>
      assert(math.abs(r.getDouble(7) - g) <= 3.0, s"luma ${r.getDouble(7)} vs gray $g")
    }
    // stride sampling keeps every Nth frame
    val every2 = Multimodal.sampleMp4Frames(df, "id", "payload",
        everyNth = 2, decoder = Multimodal.MjpegFrameDecoder)
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(every2.toSeq === Seq(0, 2))
    // the stub double rides the same seam deterministically
    val stub = Multimodal.sampleMp4Frames(df, "id", "payload")
      .select("frame_idx", "mean_luma").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(stub.keySet === Set(0, 1, 2))
  }

  test("malformed sample tables degrade to None/empty, never throw") {
    val frames = Seq(jpegBytes(8, 8, 50), jpegBytes(8, 8, 150), jpegBytes(8, 8, 250))
    val good = mjpegMp4(frames, timescale = 600, delta = 200)
    // truncate mid-moov: the box walk hits a size running past the buffer
    assert(Multimodal.mp4SampleTable(good.dropRight(20)) === None)
    // corrupt the stco chunk offsets to point past the payload: affected
    // samples are skipped (bounds check), not sliced out of range
    val stcoAt = {
      val needle = "stco".getBytes("ISO-8859-1")
      (0 until good.length - 4).find(i =>
        good(i) == needle(0) && good(i + 1) == needle(1) &&
        good(i + 2) == needle(2) && good(i + 3) == needle(3)).get
    }
    val bad = good.clone()
    // first chunk offset field sits 12 bytes after the tag (version/flags
    // + entry_count); write 0x7fffffff
    bad(stcoAt + 12) = 0x7f.toByte
    bad(stcoAt + 13) = 0xff.toByte
    bad(stcoAt + 14) = 0xff.toByte
    bad(stcoAt + 15) = 0xff.toByte
    val (_, samples) = Multimodal.mp4SampleTable(bad).get
    assert(samples.map(_.idx) === Seq(2), "chunk-1 samples out of bounds, chunk 2 intact")
    // sampleMp4Frames over the corrupt payload still yields only the
    // decodable frame — corrupt assets are data, not errors
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, false), StructField("payload", BinaryType, true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, bad)), 1), schema)
    val rows = Multimodal.sampleMp4Frames(df, "id", "payload",
      decoder = Multimodal.MjpegFrameDecoder).collect()
    assert(rows.map(_.getInt(1)).toSeq === Seq(2))

    // negative stsz entry (>= 2^31 read as a negative Int): the affected
    // sample emits nothing and later samples stay in sync — a missing
    // guard would throw copyOfRange errors inside mapPartitions
    val stszAt = {
      val needle = "stsz".getBytes("ISO-8859-1")
      (0 until good.length - 4).find(i =>
        good(i) == needle(0) && good(i + 1) == needle(1) &&
        good(i + 2) == needle(2) && good(i + 3) == needle(3)).get
    }
    val negSz = good.clone()
    negSz(stszAt + 16) = 0xff.toByte // first size entry sign bit
    val (_, negSamples) = Multimodal.mp4SampleTable(negSz).get
    assert(!negSamples.exists(_.idx == 0), "negative-size sample never emits")
    assert(negSamples.forall(s => s.offset >= 0 && s.size >= 0))

    // rogue uniform sample_count (stsz sample_size != 0, count 2^31-1):
    // bounded allocation, parse degrades instead of OOM
    val uni = good.clone()
    uni(stszAt + 8) = 0
    uni(stszAt + 9) = 0
    uni(stszAt + 10) = 0
    uni(stszAt + 11) = 9          // uniform size 9
    uni(stszAt + 12) = 0x7f.toByte // count = 0x7fffffff
    uni(stszAt + 13) = 0xff.toByte
    uni(stszAt + 14) = 0xff.toByte
    uni(stszAt + 15) = 0xff.toByte
    Multimodal.mp4SampleTable(uni) // must return promptly, not allocate 2^31 entries
  }

  test("rides the shared mapPartitions seam like every other decoder") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val good = mp4(mvhdV0(600, 600), tkhdV0(320, 240))
    val schema = StructType(Seq(
      StructField("id", LongType, false), StructField("payload", BinaryType, true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, good), Row(2L, Array[Byte](0, 1))), 2), schema)
    val got = Multimodal.withDecodedMeta(df, "payload", Multimodal.Mp4Decoder)
      .select("id", "meta.width", "meta.height", "meta.mime")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got(1L) === ((320, 240, "video/mp4")))
    assert(got(2L) === ((0, 0, "application/octet-stream")))
  }
  /** JPEG of a horizontal gradient offset by `shift` — structured content
    * for perceptual-hash tests (solid frames hash to 0 by construction).
    */
  private def gradJpeg(w: Int, h: Int, shift: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val v = math.min(255, (x * 256 / w + shift) % 256)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def stripesJpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, if ((x / 4) % 2 == 0) 0xffffff else 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("videoFrameHashes + videoNearDupPairs: shared frames pair, foreign content doesn't") {
    val g1 = gradJpeg(40, 32, 0)
    val g2 = gradJpeg(40, 32, 0) // identical bytes -> identical frame hash
    val st = stripesJpeg(40, 32)
    val vidA = mjpegMp4(Seq(g1, st, g1), timescale = 600, delta = 200)
    val vidB = mjpegMp4(Seq(g2, st), timescale = 600, delta = 200) // shares 2 distinct hashes
    val vidC = mjpegMp4(Seq(gradJpeg(40, 32, 128), stripesJpeg(40, 32).reverse),
      timescale = 600, delta = 200) // reversed bytes: undecodable second frame
    val junk = Array.tabulate[Byte](64)(i => (i * 3).toByte)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, vidA), org.apache.spark.sql.Row(2L, vidB),
        org.apache.spark.sql.Row(3L, vidC), org.apache.spark.sql.Row(4L, junk)), 2),
      schema)

    val hashes = Multimodal.videoFrameHashes(df, "id", "payload")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(hashes.keySet.count(_._1 == 1L) == 3 && hashes.keySet.count(_._1 == 2L) == 2)
    assert(!hashes.keySet.exists(_._1 == 4L), "junk payload yields no frames")
    assert(hashes((1L, 0)) == hashes((2L, 0)), "identical frame bytes hash identically")
    assert(hashes((1L, 0)) != hashes((1L, 1)), "gradient vs stripes must differ")

    val pairs = Multimodal.videoNearDupPairs(df, "id", "payload", minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 2L)), s"only A-B share >= 2 frames, got $pairs")
    assert(pairs((1L, 2L)) == 2L, "two DISTINCT shared frame hashes")
  }
}
