package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.catalog.LakeCatalog
import graft.ops.Multimodal

class MultimodalCatalogSpec extends SparkSpec {

  import spark.implicits._

  test("multimodal: batched decode attaches deterministic metadata") {
    val df = Seq((1L, "payload-one"), (2L, "payload-two"))
      .toDF("id", "s")
      .select(col("id"), col("s").cast("binary").as("bin"))
    val got = Multimodal.withDecodedMeta(df, "bin")
    assert(got.schema.fieldNames.contains("meta"))
    val metas = got.select("id", "meta.byte_len", "meta.width", "meta.height", "meta.mime")
      .as[(Long, Int, Int, Int, String)].collect().toSet
    // deterministic: same run twice gives the same metadata
    val again = Multimodal.withDecodedMeta(df, "bin")
      .select("id", "meta.byte_len", "meta.width", "meta.height", "meta.mime")
      .as[(Long, Int, Int, Int, String)].collect().toSet
    assert(metas == again)
    assert(metas.forall { case (_, len, w, h, mime) =>
      len == 11 && w >= 64 && h >= 64 && mime == "image/fake"
    })
  }

  test("multimodal: ImageIoDecoder decodes real PNG/JPEG headers through the same plumbing") {
    // checked-in PNG fixture (37×21 RGB, hand-assembled chunks)
    val pngBytes = {
      val in = getClass.getResourceAsStream("/fixtures/graft_37x21.png")
      try in.readAllBytes() finally in.close()
    }
    // JPEG produced by the JDK encoder itself (19×13)
    val jpegBytes = {
      val img = new java.awt.image.BufferedImage(19, 13, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 13).foreach(y => (0 until 19).foreach(x => img.setRGB(x, y, (x * 31 + y * 7) << 8)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, pngBytes), (2L, jpegBytes), (3L, "not an image at all".getBytes("UTF-8")))
      .toDF("id", "bin")
    val got = Multimodal.withDecodedMeta(df, "bin", Multimodal.ImageIoDecoder)
      .select("id", "meta.byte_len", "meta.width", "meta.height", "meta.mime")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(got(0) == ((1L, pngBytes.length, 37, 21, "image/png")))
    assert(got(1) == ((2L, jpegBytes.length, 19, 13, "image/jpeg")))
    // unrecognized payloads degrade instead of failing the partition
    assert(got(2) == ((3L, 19, 0, 0, "application/octet-stream")))
  }

  test("multimodal: ImageIoDecoder survives a truncated header") {
    val pngBytes = {
      val in = getClass.getResourceAsStream("/fixtures/graft_37x21.png")
      try in.readAllBytes() finally in.close()
    }
    // keep the PNG magic (recognized by the reader) but cut inside IHDR
    val truncated = pngBytes.take(12)
    val df = Seq((1L, truncated)).toDF("id", "bin")
    val got = Multimodal.withDecodedMeta(df, "bin", Multimodal.ImageIoDecoder)
      .select("meta.width", "meta.height", "meta.mime")
      .as[(Int, Int, String)].head()
    assert(got == ((0, 0, "application/octet-stream")))
  }

  test("multimodal: ImageIoDecoder degrades on malformed headers that throw RuntimeExceptions") {
    // ImageIO readers are known to throw IllegalArgumentException /
    // ArrayIndexOutOfBounds / NegativeArraySizeException (not IOException)
    // on adversarially malformed headers — each payload below keeps a
    // recognized magic number but corrupts the structure after it; the
    // decoder must degrade, never propagate
    val hostile = Seq(
      // JPEG SOI + APP0 marker with segment length 0 (< the 2 it includes)
      Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x00, 0x4a, 0x46).map(_.toByte),
      // JPEG SOI + DHT with absurd symbol counts
      Array(0xff, 0xd8, 0xff, 0xc4, 0x00, 0x05, 0x00, 0xff, 0xff).map(_.toByte),
      // GIF89a header cut inside the logical screen descriptor
      "GIF89a".getBytes("US-ASCII") ++ Array(0xff.toByte),
      // BMP with negative biWidth/biHeight in the info header
      Array(0x42, 0x4d) ++ Array.fill(16)(0x00) ++
        Array(0x28, 0x00, 0x00, 0x00, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff) map (_.toByte))
    hostile.zipWithIndex.foreach { case (bytes, i) =>
      val got = Multimodal.ImageIoDecoder.decode(bytes)
      assert(got._1 >= 0 && got._2 >= 0, s"payload $i produced negative dims: $got")
      assert(got == ((0, 0, "application/octet-stream")) || got._3.startsWith("image/"),
        s"payload $i: $got")
    }
  }

  test("multimodal: real resize downsamples quadrant colors correctly and degrades on junk") {
    // 8×8 PNG with four solid quadrant colors — nearest-neighbor 4×4 must
    // land each output quadrant on its source color exactly
    val (red, green, blue, white) = (0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    val src = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach { y =>
      (0 until 8).foreach { x =>
        val c = (x < 4, y < 4) match {
          case (true, true) => red
          case (false, true) => green
          case (true, false) => blue
          case (false, false) => white
        }
        src.setRGB(x, y, c)
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val pngBytes = bos.toByteArray

    val df = Seq(
      (1L, pngBytes),
      (2L, "junk junk junk".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "bin")
    val got = Multimodal.resizeImages(df, "bin", targetW = 4, targetH = 4)
      .select("id", "resized", "resize_w", "resize_h", "resize_ok")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Array[Byte]]), r.getInt(2), r.getInt(3),
          r.getBoolean(4))).toMap

    assert(got(2L) == ((None, 0, 0, false)), "junk must degrade, not fail")
    assert(got(3L) == ((None, 0, 0, false)), "null payload must degrade")
    val (Some(outBytes), w, h, ok) = got(1L)
    assert((w, h, ok) == ((4, 4, true)))
    val out = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(outBytes))
    assert(out.getWidth == 4 && out.getHeight == 4)
    def rgb(x: Int, y: Int) = out.getRGB(x, y) & 0xffffff
    assert(rgb(0, 0) == red && rgb(3, 0) == green && rgb(0, 3) == blue && rgb(3, 3) == white)

    // upscale path: 8×8 → 16×16 keeps quadrants solid (every output pixel
    // maps to exactly one source pixel under nearest-neighbor)
    val up = Multimodal.resizeImages(Seq((1L, pngBytes)).toDF("id", "bin"), "bin", 16, 16)
      .select("resized").head().getAs[Array[Byte]](0)
    val upImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(up))
    assert(upImg.getWidth == 16 && (upImg.getRGB(2, 2) & 0xffffff) == red &&
      (upImg.getRGB(13, 13) & 0xffffff) == white)
  }

  test("multimodal: frame sampling emits one row per stride window") {
    val df = Seq((1L, "a" * 250), (2L, "b" * 99))
      .toDF("id", "s").select(col("id"), col("s").cast("binary").as("bin"))
    val frames = Multimodal.sampleFrames(df, "id", "bin", strideBytes = 100)
    val counts = frames.groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 3L, 2L -> 1L))
    val feats = Multimodal.frameFeatures(frames, "id")
    assert(feats.filter(col("id") === 1L && col("frame_idx") === 2).head()
      .getAs[Int]("frame_len") == 50) // last frame clipped
  }

  test("catalog: upsert is latest-wins on the PK, query filters and orders") {
    val dir = Files.createTempDirectory("graft_cat_").toString
    val cat = new LakeCatalog(spark, dir)
    def row(base: String, date: String, pointer: String, proc: String) =
      ("raw", "bt", base, "unmatched.txt", pointer,
        Timestamp.valueOf(date), null.asInstanceOf[Timestamp], Timestamp.valueOf(proc),
        """{"k":1}""")
    val b1 = Seq(
      row("austin", "2020-01-15 00:00:00", "p1", "2020-01-16 01:00:00"),
      row("austin", "2020-01-16 00:00:00", "p2", "2020-01-17 01:00:00"))
      .toDF(graft.model.Schemas.catalog.fieldNames: _*)
    cat.upsert(b1)
    assert(cat.read().count() == 2)
    // second batch overwrites the Jan 15 item
    val b2 = Seq(row("austin", "2020-01-15 00:00:00", "p1-reprocessed", "2020-02-01 00:00:00"))
      .toDF(graft.model.Schemas.catalog.fieldNames: _*)
    cat.upsert(b2)
    val after = cat.read()
    assert(after.count() == 2)
    assert(after.filter(col("collection_date") === "2020-01-15 00:00:00")
      .select("pointer").as[String].head() == "p1-reprocessed")
    // query: date range + ordering
    val q = cat.query("raw", dataSource = Some("bt"),
      dateFrom = Some(Timestamp.valueOf("2020-01-16 00:00:00")))
    assert(q.select("pointer").as[String].collect().toSeq == Seq("p2"))
  }
  test("imageDHash: stable fingerprint, brightness-robust, near-dup pairs, degrade") {
    import spark.implicits._
    def png(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, pix(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // horizontal gradient (strong left-to-right structure)
    val grad = png(32, 32)((x, _) => { val v = x * 8; (v << 16) | (v << 8) | v })
    // same gradient, globally brightened: dHash compares NEIGHBORS, so the
    // fingerprint must be nearly identical
    val gradBright = png(32, 32)((x, _) => {
      val v = math.min(255, x * 8 + 40); (v << 16) | (v << 8) | v })
    // vertical stripes: completely different gradient signature
    val stripes = png(32, 32)((x, _) => if ((x / 4) % 2 == 0) 0xffffff else 0x000000)
    val rows = Seq(
      (1L, grad), (2L, grad), (3L, gradBright), (4L, stripes),
      (5L, "not an image".getBytes("UTF-8")), (6L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "img")
    val hashed = graft.ops.Multimodal.imageDHash(rows, "img")
      .select("id", "dhash")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(hashed(1L).isDefined && hashed(1L) == hashed(2L),
      "identical bytes must hash identically")
    assert(hashed(5L).isEmpty && hashed(6L).isEmpty, "junk and null degrade to NULL")
    val d13 = java.lang.Long.bitCount(hashed(1L).get ^ hashed(3L).get)
    val d14 = java.lang.Long.bitCount(hashed(1L).get ^ hashed(4L).get)
    assert(d13 <= 4, s"brightness shift must barely move the hash, got $d13 bits")
    assert(d14 > 10, s"different structure must be far, got $d14 bits")
    val pairs = graft.ops.Multimodal.imageNearDupPairs(rows, "id", "img", maxHamming = 6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      s"gradient trio must pair up, got $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "stripes must not pair")
  }
}
