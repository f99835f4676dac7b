package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** EXIF container truth: builder∘parser round-trip in both byte orders,
  * malformed-input degradation, and the mapPartitions plumbing.
  */
class ExifSpec extends SparkSpec {
  import spark.implicits._

  test("round trip: every field survives build → parse in both byte orders") {
    for (le <- Seq(true, false)) {
      val bytes = Multimodal.buildExifJpeg(
        orientation = 6, datetime = Some("2024:01:02 03:04:05"), gps = true,
        make = Some("CamCo"), model = Some("X100"), littleEndian = le)
      val m = Multimodal.parseExif(bytes)
      assert(m == Multimodal.ExifMeta(hasExif = true, 6, "2024:01:02 03:04:05",
        hasGps = true, "CamCo", "X100"), s"littleEndian=$le")
    }
  }

  test("optional fields absent: orientation only, no gps") {
    val m = Multimodal.parseExif(Multimodal.buildExifJpeg(
      orientation = 1, datetime = None, gps = false))
    assert(m == Multimodal.ExifMeta(hasExif = true, 1, null, hasGps = false, null, null))
  }

  test("short ASCII value packs inline (count <= 4) and reads back") {
    val m = Multimodal.parseExif(Multimodal.buildExifJpeg(
      orientation = 3, datetime = None, gps = false, make = Some("abc")))
    assert(m.make == "abc")
  }

  test("EXIF segment after a leading APP0 is still found") {
    val base = Multimodal.buildExifJpeg(3, Some("2020:05:05 05:05:05"), gps = false)
    // splice a minimal APP0 (JFIF) segment between SOI and APP1
    val app0 = Array(0xFF, 0xE0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0,
      1, 2, 0, 0, 1, 0, 1, 0, 0).map(_.toByte)
    val spliced = base.take(2) ++ app0 ++ base.drop(2)
    val m = Multimodal.parseExif(spliced)
    assert(m.hasExif && m.orientation == 3 && m.datetime == "2020:05:05 05:05:05")
  }

  test("malformed payloads degrade to no-EXIF, never throw") {
    val good = Multimodal.buildExifJpeg(6, Some("2024:01:02 03:04:05"), gps = true)
    val cases = Seq[Array[Byte]](
      null,
      Array.empty[Byte],
      Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte), // bare JPEG, no APP1
      "not an image at all".getBytes,
      good.dropRight(12), // truncated inside the TIFF
      good.take(8), // truncated inside the segment header
      good.updated(12, 'X'.toByte) // corrupted byte-order mark
    )
    cases.foreach { c =>
      val m = Multimodal.parseExif(c)
      assert(!m.hasExif && m.orientation == 0 && m.datetime == null && !m.hasGps)
    }
  }

  test("gps pointer beyond the buffer does not set has_gps") {
    val good = Multimodal.buildExifJpeg(1, None, gps = true)
    // the GPS IFD is the last 22 bytes before EOI; cutting them leaves the
    // pointer dangling past the segment end
    val cut = good.dropRight(24) ++ good.takeRight(2)
    // fix the APP1 length so the segment itself stays well-formed
    val segLen = cut.length - 4 // SOI(2) + marker(2) excluded, EOI(2) excluded... recompute:
    val payloadLen = cut.length - 2 /*SOI*/ - 2 /*FF E1*/ - 2 /*EOI*/
    val fixed = cut.clone()
    fixed(4) = (((payloadLen + 2) >> 8) & 0xFF).toByte
    fixed(5) = ((payloadLen + 2) & 0xFF).toByte
    val m = Multimodal.parseExif(fixed)
    assert(m.hasExif && !m.hasGps)
    val _ = segLen
  }

  test("withExifMeta: mapPartitions plumbing preserves columns, null degrades") {
    val rows = Seq(
      (1L, Multimodal.buildExifJpeg(8, Some("2021:12:31 23:59:59"), gps = true,
        littleEndian = false)),
      (2L, Multimodal.buildExifJpeg(2, None, gps = false)),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val got = Multimodal.withExifMeta(rows, "payload")
      .select(col("id"), col("exif.has_exif"), col("exif.orientation"),
        col("exif.has_gps"), col("exif.datetime"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getInt(2), r.getBoolean(3), Option(r.getString(4)))))
      .toMap
    assert(got(1L) == ((true, 8, true, Some("2021:12:31 23:59:59"))))
    assert(got(2L) == ((true, 2, false, None)))
    assert(got(3L) == ((false, 0, false, None)))
  }
}
