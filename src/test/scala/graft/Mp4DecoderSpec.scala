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
}
