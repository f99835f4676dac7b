package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride as opaque `binary`
  * columns with a typed metadata struct. The Spark-side contract — schema,
  * batched decode via `mapPartitions`, partition sizing — is shared by every
  * decoder behind the [[BinaryDecoder]] seam:
  *
  *   - [[ImageIoDecoder]] — the REAL image path: `javax.imageio` (in the
  *     JDK, no external codecs) parses the container header for
  *     width/height/mime without decoding pixel data.
  *   - [[StubDecoder]] — a deterministic md5-derived fake, kept as the test
  *     double so the DuckDB oracle can reproduce the whole mapPartitions
  *     contract byte-for-byte (an oracle cannot re-run ImageIO).
  *
  * Audio rides the same seam ([[JavaSoundDecoder]]); video splits it in
  * two: container truth is pure-JVM ([[parseMp4]], [[mp4SampleTable]]) and
  * the bitstream→pixels step is the [[VideoFrameDecoder]] seam — real for
  * MJPEG ([[MjpegFrameDecoder]]), ffmpeg/JNI-shaped for codecs the JDK
  * cannot decode.
  */
object Multimodal {

  /** Decoded-asset metadata: what `decode(bytes)` yields. */
  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mime", StringType, nullable = false)))

  /** The decode seam: bytes in, (width, height, mime) out, called once per
    * row inside a partition batch. Implementations must be cheap to
    * serialize (stateless objects); expensive native state belongs in
    * lazy per-JVM fields.
    */
  trait BinaryDecoder extends Serializable {
    def decode(bytes: Array[Byte]): (Int, Int, String)
  }

  /** STUB decode: deterministic fake dimensions derived from the payload
    * hash — the oracle-checkable test double (any SQL engine can recompute
    * the md5 arithmetic, which is what q_mm_meta's DuckDB oracle does).
    */
  object StubDecoder extends BinaryDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, String) = {
      val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val w = 64 + (((h(0) & 0xff) << 8 | (h(1) & 0xff)) % 1856)
      val ht = 64 + (((h(2) & 0xff) << 8 | (h(3) & 0xff)) % 1016)
      (w, ht, "image/fake")
    }
  }

  /** REAL image decode via `javax.imageio` (JDK-bundled readers: PNG, JPEG,
    * GIF, BMP, TIFF, WBMP). Reads ONLY the container header — `getWidth`/
    * `getHeight` parse dimensions without decoding pixel rows, so cost per
    * asset is O(header), not O(pixels); at 100 TB of images the scan stays
    * I/O-bound on the payload bytes already being read. Unrecognized
    * payloads degrade to (0, 0, application/octet-stream) rather than
    * failing the partition — corrupt assets are data, not errors, in a
    * corpus pipeline.
    */
  object ImageIoDecoder extends BinaryDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, String) =
      // NonFatal, not just IOException: ImageIO readers throw
      // IllegalArgumentException / ArrayIndexOutOfBounds /
      // NegativeArraySizeException on malformed headers after a recognized
      // magic number — at corpus scale one such payload must degrade, not
      // fail the partition. The reader/mime lookup is inside the guard too.
      try {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) (0, 0, "application/octet-stream")
          else {
            val r = readers.next()
            try {
              r.setInput(iis, true, true)
              val mime = Option(r.getOriginatingProvider)
                .flatMap(p => Option(p.getMIMETypes).flatMap(_.headOption))
                .getOrElse("image/" + r.getFormatName.toLowerCase(java.util.Locale.ROOT))
              (r.getWidth(0), r.getHeight(0), mime)
            } finally r.dispose()
          }
        } finally iis.close()
      } catch {
        case scala.util.control.NonFatal(_) => (0, 0, "application/octet-stream")
      }
  }

  /** Attach decode metadata to a binary column with a batched
    * `mapPartitions` pass — the decoder is initialized once per partition
    * (the expensive part for real codecs), not once per row; rows stream
    * through without materializing the partition.
    */
  def withDecodedMeta(
      df: DataFrame,
      binCol: String,
      decoder: BinaryDecoder = StubDecoder): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("meta", metaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val d = decoder // per-partition init point for a real codec
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val meta =
          if (bytes == null) Row(0, 0, 0, "application/octet-stream")
          else {
            val (w, h, mime) = d.decode(bytes)
            Row(bytes.length, w, h, mime)
          }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** REAL image resize: `javax.imageio` decode → deterministic
    * NEAREST_NEIGHBOR rescale on a headless `java.awt` raster → PNG
    * re-encode. Adds `resized` (binary PNG), `resize_w`/`resize_h`, and
    * `resize_ok`; unreadable payloads (and null cells) degrade to a null
    * payload with `resize_ok = false` — corrupt assets are data, not
    * errors. Nearest-neighbor is chosen over bilinear deliberately: its
    * integer source-pixel lookup is bit-reproducible across JVMs, so two
    * cluster runs (or a backfill vs. the original run) produce identical
    * rasters — the determinism contract every operator here keeps. One
    * batched `mapPartitions` pass, cost O(pixels) per asset; at 100 TB
    * this is the embarrassingly parallel scan it should be, with no
    * shuffle and output size bounded by `targetW × targetH`.
    */
  def resizeImages(
      df: DataFrame,
      binCol: String,
      targetW: Int,
      targetH: Int): DataFrame = {
    require(targetW >= 1 && targetH >= 1, "target dimensions must be positive")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("resized", org.apache.spark.sql.types.BinaryType),
      StructField("resize_w", org.apache.spark.sql.types.IntegerType),
      StructField("resize_h", org.apache.spark.sql.types.IntegerType),
      StructField("resize_ok", org.apache.spark.sql.types.BooleanType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val out = if (bytes == null) None else resizePng(bytes, targetW, targetH)
        val tail = out match {
          case Some(b) => Seq(b, targetW, targetH, true)
          case None => Seq(null, 0, 0, false)
        }
        Row.fromSeq(r.toSeq ++ tail)
      }
    }(enc)
  }

  /** Decode → nearest-neighbor rescale → PNG bytes; None on anything
    * unreadable (same NonFatal discipline as [[ImageIoDecoder]]).
    */
  private[ops] def resizePng(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 1 || img.getHeight < 1) None
      else {
        val dst = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_RENDERING,
            java.awt.RenderingHints.VALUE_RENDER_SPEED)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        val ok = javax.imageio.ImageIO.write(dst, "png", bos)
        if (ok) Some(bos.toByteArray) else None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Frame sampling: emit every `strideBytes`-th slice of the payload as its
    * own row (video frame-sample shape: one row per sampled frame, keyed by
    * frame index). Pure column expressions — no UDF.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, strideBytes: Int): DataFrame =
    df.filter(length(col(binCol)) >= 1)
      .select(
        col(idCol), col(binCol),
        posexplode(sequence(
          lit(0),
          floor((length(col(binCol)) - 1) / strideBytes).cast("int"))))
      .select(
        col(idCol),
        col("pos").as("frame_idx"),
        col(binCol).substr(col("pos") * strideBytes + 1, lit(strideBytes)).as("frame"))

  /** Feature extraction shape over frames: per-frame digest + byte stats
    * (stand-ins for embeddings), grouped back per asset.
    */
  def frameFeatures(frames: DataFrame, idCol: String): DataFrame =
    frames.select(
      col(idCol), col("frame_idx"),
      md5(col("frame")).as("frame_md5"),
      length(col("frame")).as("frame_len"))

  // ----------------------------------------------------------------- video

  /** Parsed MP4 movie metadata (header boxes only — no frame decode). */
  final case class Mp4Meta(width: Int, height: Int, durationMs: Long, tracks: Int)

  /** REAL video-container metadata via a pure-JVM ISO BMFF (MP4) box
    * parser: walks the `moov` box for `mvhd` (timescale + duration) and
    * each `trak`/`tkhd` (16.16 fixed-point width × height; audio tracks
    * carry 0×0, so the video track's dimensions win via max). Box framing
    * handles 32-bit sizes, 64-bit `largesize`, and version-1 (64-bit time)
    * headers. Cost is O(moov bytes) — the same header-only story as
    * [[ImageIoDecoder]]/[[JavaSoundDecoder]]; actual FRAME decode still
    * needs an external codec and plugs in behind the same seam.
    */
  object Mp4Decoder extends BinaryDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, String) =
      parseMp4(bytes) match {
        case Some(m) => (m.width, m.height, "video/mp4")
        case None    => (0, 0, "application/octet-stream")
      }
  }

  /** Full MP4 metadata, or None when `bytes` is not a parseable container. */
  def parseMp4(bytes: Array[Byte]): Option[Mp4Meta] =
    try {
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
      var sawFtyp = false
      var meta: Option[Mp4Meta] = None
      foreachBox(buf, 0L, bytes.length.toLong) { (boxType, start, end) =>
        boxType match {
          case "ftyp" => sawFtyp = true
          case "moov" => meta = parseMoov(buf, start, end)
          case _      => ()
        }
      }
      if (sawFtyp) meta else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Walk sibling boxes in `[from, to)`, invoking `f(type, payloadStart,
    * payloadEnd)`. Malformed sizes terminate the walk via exception (caught
    * at the top); size==0 ("to end of file") and largesize are honored.
    */
  private def foreachBox(
      buf: java.nio.ByteBuffer, from: Long, to: Long)(
      f: (String, Long, Long) => Unit): Unit = {
    var pos = from
    while (pos + 8 <= to) {
      val size32 = buf.getInt(pos.toInt).toLong & 0xffffffffL
      val tag = new String(Array(
        buf.get(pos.toInt + 4), buf.get(pos.toInt + 5),
        buf.get(pos.toInt + 6), buf.get(pos.toInt + 7)), "ISO-8859-1")
      val (size, headerLen) =
        if (size32 == 1L) (buf.getLong(pos.toInt + 8), 16L)
        else if (size32 == 0L) (to - pos, 8L)
        else (size32, 8L)
      if (size < headerLen || pos + size > to)
        throw new IllegalArgumentException(s"bad box size $size at $pos")
      f(tag, pos + headerLen, pos + size)
      pos += size
    }
  }

  private def parseMoov(buf: java.nio.ByteBuffer, from: Long, to: Long): Option[Mp4Meta] = {
    var durationMs = 0L
    var w = 0
    var h = 0
    var tracks = 0
    foreachBox(buf, from, to) { (tag, s, e) =>
      tag match {
        case "mvhd" =>
          val version = buf.get(s.toInt) & 0xff
          val (timescale, duration) =
            if (version == 1) (buf.getInt(s.toInt + 20).toLong & 0xffffffffL, buf.getLong(s.toInt + 24))
            else (buf.getInt(s.toInt + 12).toLong & 0xffffffffL, buf.getInt(s.toInt + 16).toLong & 0xffffffffL)
          if (timescale > 0) durationMs = duration * 1000L / timescale
        case "trak" =>
          tracks += 1
          foreachBox(buf, s, e) { (t2, s2, _) =>
            if (t2 == "tkhd") {
              val version = buf.get(s2.toInt) & 0xff
              // width sits after version/flags(4) + times+id+duration
              // (20 at v0, 32 at v1) + reserved(8) + layer/group/volume/
              // reserved(8) + matrix(36): offset 76 at v0, 88 at v1
              val base = if (version == 1) s2 + 88 else s2 + 76
              // 16.16 fixed point; audio tracks carry 0x0. Areas compare in
              // Long: 16-bit dims reach 65535, whose Int product overflows
              val tw = buf.getInt(base.toInt) >>> 16
              val th = buf.getInt(base.toInt + 4) >>> 16
              if (tw.toLong * th > w.toLong * h) { w = tw; h = th }
            }
          }
        case _ => ()
      }
    }
    if (tracks == 0 && durationMs == 0) None else Some(Mp4Meta(w, h, durationMs, tracks))
  }

  // ------------------------------------------------------------ video frames

  /** One addressable media sample (≈ one encoded video frame) located by
    * the container's sample tables: decode timestamp, byte extent within
    * the payload, and ordinal.
    */
  final case class Mp4Sample(idx: Int, ptsMs: Long, offset: Long, size: Int)

  /** The frame-decode seam — the ffmpeg-shaped injection point: one encoded
    * sample in, decoded (width, height, mean luma 0–255) out, None when the
    * codec is outside the implementation's reach. The CONTAINER side
    * (which bytes are frame N, when is it presented) is already solved by
    * [[mp4SampleTable]] in pure JVM code; only the bitstream→pixels step
    * varies by codec:
    *
    *   - [[MjpegFrameDecoder]] — REAL pixels for Motion-JPEG tracks
    *     (`jpeg`/`mjpa` sample entries): each sample is a self-contained
    *     JPEG, which `javax.imageio` decodes without native code.
    *   - [[StubFrameDecoder]] — deterministic md5-derived double for specs
    *     and oracles, exactly the [[StubDecoder]] pattern.
    *   - An H.264/H.265/AV1 decoder requires a native library (the JDK
    *     ships no video codec); it plugs in here as an ffmpeg/JNI-backed
    *     implementation with NO change to the Spark-side plumbing — this
    *     sandbox has no JNI toolchain, so that implementation is explicitly
    *     out of scope, not silently missing.
    */
  trait VideoFrameDecoder extends Serializable {
    def decodeFrame(sample: Array[Byte]): Option[(Int, Int, Double)]
  }

  /** REAL pixel decode for MJPEG samples via `javax.imageio`: mean luma is
    * computed over every pixel (Rec. 601 weights) — the smallest honest
    * "looked at the actual pixels" feature.
    */
  object MjpegFrameDecoder extends VideoFrameDecoder {
    def decodeFrame(sample: Array[Byte]): Option[(Int, Int, Double)] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(sample))
        if (img == null) None
        else {
          var sum = 0.0
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              sum += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
              x += 1
            }
            y += 1
          }
          Some((img.getWidth, img.getHeight, sum / (img.getWidth.toLong * img.getHeight)))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic md5-derived frame double (dimensions + fake luma), the
    * spec/oracle twin of [[MjpegFrameDecoder]].
    */
  object StubFrameDecoder extends VideoFrameDecoder {
    def decodeFrame(sample: Array[Byte]): Option[(Int, Int, Double)] = {
      val h = java.security.MessageDigest.getInstance("MD5").digest(sample)
      Some((64 + (h(0) & 0xff), 64 + (h(1) & 0xff), (h(2) & 0xff).toDouble))
    }
  }

  /** The selected video track's codec fourcc and fully resolved sample
    * table, or None when `bytes` is not an MP4 with a usable track. Track
    * selection matches [[parseMoov]] (largest tkhd area). Sample extents
    * come from `stsz`/`stsc`/`stco`(/`co64`), timestamps from `stts` over
    * the `mdhd` timescale (composition offsets — B-frame reorder — are not
    * applied; MJPEG and other all-intra codecs have none).
    */
  def mp4SampleTable(bytes: Array[Byte]): Option[(String, Seq[Mp4Sample])] =
    try {
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
      var sawFtyp = false
      var best: Option[(Long, String, Seq[Mp4Sample])] = None // (area, codec, samples)
      foreachBox(buf, 0L, bytes.length.toLong) { (tag, s, e) =>
        tag match {
          case "ftyp" => sawFtyp = true
          case "moov" =>
            foreachBox(buf, s, e) { (t1, s1, e1) =>
              if (t1 == "trak") {
                var area = 0L
                var codec = ""
                var timescale = 0L
                var stts = Seq.empty[(Long, Long)]    // (count, delta)
                var sizes = Seq.empty[Int]
                var chunkOffsets = Seq.empty[Long]
                var stsc = Seq.empty[(Int, Int)]      // (first_chunk, samples_per_chunk)
                foreachBox(buf, s1, e1) { (t2, s2, e2) =>
                  t2 match {
                    case "tkhd" =>
                      val v = buf.get(s2.toInt) & 0xff
                      val base = (if (v == 1) s2 + 88 else s2 + 76).toInt
                      val tw = buf.getInt(base) >>> 16
                      val th = buf.getInt(base + 4) >>> 16
                      area = tw.toLong * th
                    case "mdia" =>
                      foreachBox(buf, s2, e2) { (t3, s3, e3) =>
                        t3 match {
                          case "mdhd" =>
                            val v = buf.get(s3.toInt) & 0xff
                            timescale =
                              if (v == 1) buf.getInt(s3.toInt + 20).toLong & 0xffffffffL
                              else buf.getInt(s3.toInt + 12).toLong & 0xffffffffL
                          case "minf" =>
                            foreachBox(buf, s3, e3) { (t4, s4, e4) =>
                              if (t4 == "stbl") foreachBox(buf, s4, e4) { (t5, s5, _) =>
                                val p = s5.toInt
                                t5 match {
                                  case "stsd" =>
                                    if (buf.getInt(p + 4) > 0)
                                      codec = new String(Array(
                                        buf.get(p + 12), buf.get(p + 13),
                                        buf.get(p + 14), buf.get(p + 15)), "ISO-8859-1")
                                  case "stts" =>
                                    val n = buf.getInt(p + 4)
                                    stts = (0 until n).map(i => (
                                      buf.getInt(p + 8 + i * 8).toLong & 0xffffffffL,
                                      buf.getInt(p + 12 + i * 8).toLong & 0xffffffffL))
                                  case "stsz" =>
                                    val uniform = buf.getInt(p + 4)
                                    val n = buf.getInt(p + 8)
                                    // uniform path allocates without touching the
                                    // buffer, so a rogue sample_count must be
                                    // bounded BEFORE Seq.fill: n samples of
                                    // `uniform` bytes each cannot exceed the
                                    // payload (the per-entry path self-bounds —
                                    // reads past the buffer throw and are caught)
                                    sizes =
                                      if (uniform != 0)
                                        Seq.fill(math.max(0,
                                          math.min(n, bytes.length / math.max(1, uniform))))(uniform)
                                      else (0 until n).map(i => buf.getInt(p + 12 + i * 4))
                                  case "stsc" =>
                                    val n = buf.getInt(p + 4)
                                    stsc = (0 until n).map(i => (
                                      buf.getInt(p + 8 + i * 12), buf.getInt(p + 12 + i * 12)))
                                  case "stco" =>
                                    val n = buf.getInt(p + 4)
                                    chunkOffsets = (0 until n)
                                      .map(i => buf.getInt(p + 8 + i * 4).toLong & 0xffffffffL)
                                  case "co64" =>
                                    val n = buf.getInt(p + 4)
                                    chunkOffsets = (0 until n).map(i => buf.getLong(p + 8 + i * 8))
                                  case _ => ()
                                }
                              }
                            }
                          case _ => ()
                        }
                      }
                    case _ => ()
                  }
                }
                if (sizes.nonEmpty && chunkOffsets.nonEmpty && stsc.nonEmpty &&
                    timescale > 0 && best.forall(_._1 < area)) {
                  // decode timestamps: running stts deltas → millis
                  val pts = new Array[Long](sizes.length)
                  var cum = 0L
                  var i = 0
                  stts.foreach { case (count, delta) =>
                    var c = 0L
                    while (c < count && i < pts.length) {
                      pts(i) = cum * 1000L / timescale; cum += delta; i += 1; c += 1
                    }
                  }
                  // chunk walk: stsc entry with the greatest first_chunk <= this
                  // chunk governs its samples-per-chunk; offsets accumulate
                  // within the chunk
                  val samples = Seq.newBuilder[Mp4Sample]
                  var sIdx = 0
                  chunkOffsets.zipWithIndex.foreach { case (chunkOff, ci) =>
                    val perChunk = stsc.takeWhile(_._1 <= ci + 1).lastOption.map(_._2).getOrElse(0)
                    var within = 0L
                    var k = 0
                    while (k < perChunk && sIdx < sizes.length) {
                      val sz = sizes(sIdx)
                      // negative sizes (stsz entries >= 2^31) and negative
                      // offsets (co64 high bit) are malformed: emit nothing
                      // and never advance the running offset by a negative —
                      // a skipped guard here would surface as an uncaught
                      // copyOfRange throw inside mapPartitions
                      if (sz >= 0 && chunkOff >= 0 && chunkOff + within + sz <= bytes.length)
                        samples += Mp4Sample(sIdx, pts(sIdx), chunkOff + within, sz)
                      if (sz > 0) within += sz
                      sIdx += 1; k += 1
                    }
                  }
                  best = Some((area, codec, samples.result()))
                }
              }
            }
          case _ => ()
        }
      }
      if (sawFtyp) best.map { case (_, c, ss) => (c, ss) } else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Frame sampling through the REAL container path: resolve each payload's
    * video sample table, keep every `everyNth`-th sample, slice its exact
    * byte extent, and decode it through the [[VideoFrameDecoder]] seam —
    * one output row per decoded frame: (id, frame_idx, pts_ms, codec,
    * sample_len, width, height, mean_luma). Samples the decoder cannot
    * handle (foreign codec, corrupt bitstream) produce no row; payloads
    * that are not parseable MP4 produce no rows — corrupt assets are data,
    * not errors. One batched `mapPartitions` pass, no shuffle, no driver
    * involvement; the byte-slice stride twin (for opaque payloads with no
    * container) is [[sampleFrames]].
    */
  def sampleMp4Frames(
      df: DataFrame,
      idCol: String,
      binCol: String,
      everyNth: Int = 1,
      decoder: VideoFrameDecoder = StubFrameDecoder): DataFrame = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    val idField = df.schema(idCol)
    val schema = StructType(Seq(
      idField,
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("pts_ms", LongType, nullable = false),
      StructField("codec", StringType, nullable = false),
      StructField("sample_len", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_luma", DoubleType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val d = decoder
      rows.flatMap { r =>
        val id = r.get(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Iterator.empty
        else mp4SampleTable(bytes) match {
          case None => Iterator.empty
          case Some((codec, samples)) =>
            samples.iterator
              .filter(_.idx % everyNth == 0)
              .flatMap { s =>
                val slice = java.util.Arrays.copyOfRange(
                  bytes, s.offset.toInt, (s.offset + s.size).toInt)
                d.decodeFrame(slice).map { case (w, h, luma) =>
                  Row(id, s.idx, s.ptsMs, codec, s.size, w, h, luma)
                }
              }
        }
      }
    }(enc)
  }

  // ----------------------------------------------------------------- audio

  /** Decoded-audio metadata: what [[AudioDecoder.decode]] yields. */
  val audioMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("frames", LongType, nullable = false),
    StructField("mime", StringType, nullable = false)))

  /** Audio twin of [[BinaryDecoder]]: bytes in,
    * (sampleRate, channels, bitsPerSample, frameCount, mime) out.
    */
  trait AudioDecoder extends Serializable {
    def decode(bytes: Array[Byte]): (Int, Int, Int, Long, String)
  }

  /** STUB audio decode — md5-derived fake format parameters, the
    * oracle-checkable test double (mirrors [[StubDecoder]]; q_mm_audio's
    * DuckDB oracle recomputes the same hex arithmetic).
    */
  object StubAudioDecoder extends AudioDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, Int, Long, String) = {
      val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val rate = 8000 + (((h(0) & 0xff) << 8 | (h(1) & 0xff)) % 40000)
      val ch = 1 + (h(4) & 0xff) % 2
      val bits = 8 * (1 + (h(5) & 0xff) % 2)
      (rate, ch, bits, (bytes.length / (ch * bits / 8)).toLong, "audio/fake")
    }
  }

  /** REAL audio decode via `javax.sound.sampled` (JDK-bundled parsers: WAV,
    * AIFF, AU). `getAudioFileFormat` reads ONLY the container header —
    * O(header) per asset, same cost story as [[ImageIoDecoder]].
    * Unrecognized/corrupt payloads degrade to zeros +
    * application/octet-stream rather than failing the partition.
    */
  object JavaSoundDecoder extends AudioDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, Int, Long, String) =
      try {
        val aff = javax.sound.sampled.AudioSystem
          .getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
        val fmt = aff.getFormat
        val mime = aff.getType.getExtension match {
          case "wav"          => "audio/wav"
          case "aif" | "aiff" => "audio/aiff"
          case "au" | "snd"   => "audio/basic"
          case ext            => "audio/" + ext
        }
        (fmt.getSampleRate.toInt, fmt.getChannels, fmt.getSampleSizeInBits,
          aff.getFrameLength.toLong, mime)
      } catch {
        // UnsupportedAudioFileException on non-audio magic; IOO/IAE on
        // truncated headers after a recognized magic — all degrade
        case scala.util.control.NonFatal(_) => (0, 0, 0, 0L, "application/octet-stream")
      }
  }

  /** Attach audio metadata — same batched `mapPartitions` shape as
    * [[withDecodedMeta]], decoder initialized once per partition.
    */
  def withAudioMeta(
      df: DataFrame,
      binCol: String,
      decoder: AudioDecoder = StubAudioDecoder): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("audio_meta", audioMetaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val d = decoder
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val meta =
          if (bytes == null) Row(0, 0, 0, 0, 0L, "application/octet-stream")
          else {
            val (rate, ch, bits, frames, mime) = d.decode(bytes)
            Row(bytes.length, rate, ch, bits, frames, mime)
          }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** REAL PCM feature extraction: decode each payload with `javax.sound.
    * sampled`, downmix to mono, and emit one row per `windowFrames`-frame
    * window with RMS energy and zero-crossing count — the audio analog of
    * [[frameFeatures]]. Handles signed PCM 8/16-bit, any channel count,
    * either endianness; payloads that are not decodable PCM produce no rows
    * (corrupt assets are data, not errors).
    *
    * Runs as one `mapPartitions` pass: per-asset cost is linear in payload
    * bytes, no driver involvement, no shuffle — windows of one asset stay in
    * its input partition.
    */
  def pcmWindowFeatures(
      df: DataFrame,
      idCol: String,
      binCol: String,
      windowFrames: Int): DataFrame = {
    require(windowFrames > 0, s"windowFrames must be positive, got $windowFrames")
    val idField = df.schema(idCol)
    val schema = StructType(Seq(
      idField,
      StructField("window_idx", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("rms", DoubleType, nullable = false),
      StructField("zero_crossings", IntegerType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.get(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Iterator.empty
        else decodePcmMono(bytes) match {
          case None => Iterator.empty
          case Some(samples) =>
            samples.grouped(windowFrames).zipWithIndex.map { case (win, wi) =>
              var sumSq = 0.0
              var zc = 0
              var i = 0
              while (i < win.length) {
                sumSq += win(i) * win(i)
                if (i > 0 && (win(i) >= 0.0) != (win(i - 1) >= 0.0)) zc += 1
                i += 1
              }
              Row(id, wi, win.length, math.sqrt(sumSq / win.length), zc)
            }
        }
      }
    }(enc)
  }

  /** REAL audio resampling: decode signed-PCM (WAV/AIFF/AU, the
    * [[AudioIoDecoder]] family) to mono, LINEAR-interpolate to `targetHz`,
    * and re-encode as 16-bit little-endian mono WAV — so the output is
    * again an opaque binary the lake (and [[pcmWindowFeatures]]) consumes
    * unchanged. Adds `resampled`, `out_frames`, `resample_ok`; unreadable
    * payloads degrade (`resample_ok = false`), the corpus contract.
    *
    * Interpolation is the exact two-point formula at source position
    * `j · srcRate / targetHz` — pure double arithmetic in one
    * deterministic order, so backfills are bit-reproducible. One batched
    * `mapPartitions` pass, zero shuffle; output size tracks
    * `targetHz / srcRate`.
    */
  def resamplePcm(
      df: DataFrame,
      binCol: String,
      targetHz: Int): DataFrame = {
    require(targetHz >= 1, s"targetHz=$targetHz must be positive")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("resampled", org.apache.spark.sql.types.BinaryType),
      StructField("out_frames", IntegerType, nullable = false),
      StructField("resample_ok", org.apache.spark.sql.types.BooleanType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val out =
          if (bytes == null) None
          else decodePcmMonoWithRate(bytes).flatMap { case (samples, srcHz) =>
            if (samples.isEmpty) None
            else Some(encodeWav16Mono(resampleLinear(samples, srcHz, targetHz), targetHz))
          }
        val tail = out match {
          case Some((wav, n)) => Seq(wav, n, true)
          case None => Seq(null, 0, false)
        }
        Row.fromSeq(r.toSeq ++ tail)
      }
    }(enc)
  }

  /** `out(j) = lerp(in, j · src/target)` with the exact two-point formula;
    * output length `⌊(n−1)·target/src⌋ + 1` keeps every position in range.
    */
  private[ops] def resampleLinear(
      in: Array[Double], srcHz: Double, targetHz: Double): Array[Double] = {
    val ratio = srcHz / targetHz
    val nOut = math.floor((in.length - 1) / ratio).toInt + 1
    val out = new Array[Double](nOut)
    var j = 0
    while (j < nOut) {
      val p = j * ratio
      val i = math.min(p.toInt, in.length - 1)
      val frac = p - i
      out(j) =
        if (i + 1 < in.length) in(i) + frac * (in(i + 1) - in(i)) else in(i)
      j += 1
    }
    out
  }

  /** Normalized [-1, 1] mono samples → 16-bit LE mono WAV bytes (clamped,
    * round-half-up quantization). Returns (bytes, frame count).
    */
  private[ops] def encodeWav16Mono(
      samples: Array[Double], rateHz: Int): (Array[Byte], Int) = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val q = math.max(-32768.0, math.min(32767.0, math.floor(samples(i) * 32767.0 + 0.5)))
      val s = q.toInt
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rateHz.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    (bos.toByteArray, samples.length)
  }

  /** [[decodePcmMono]] plus the container's sample rate. */
  private def decodePcmMonoWithRate(bytes: Array[Byte]): Option[(Array[Double], Double)] =
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val rate = ais.getFormat.getFrameRate.toDouble
        if (rate <= 0) None
        else decodePcmMono(bytes).map(s => (s, rate))
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode a signed-PCM payload to normalized [-1, 1] mono samples; None
    * when the container or encoding is unsupported.
    */
  private def decodePcmMono(bytes: Array[Byte]): Option[Array[Double]] =
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            (fmt.getSampleSizeInBits != 8 && fmt.getSampleSizeInBits != 16)) None
        else {
          val data = ais.readAllBytes()
          val ch = fmt.getChannels
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          val frameBytes = ch * bytesPerSample
          val nFrames = data.length / frameBytes
          val out = new Array[Double](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0.0
            var c = 0
            while (c < ch) {
              val off = f * frameBytes + c * bytesPerSample
              val v =
                if (bytesPerSample == 1) data(off).toDouble / 128.0
                else {
                  val (lo, hi) = if (fmt.isBigEndian) (off + 1, off) else (off, off + 1)
                  ((data(hi) << 8) | (data(lo) & 0xff)).toDouble / 32768.0
                }
              acc += v
              c += 1
            }
            out(f) = acc / ch
            f += 1
          }
          Some(out)
        }
      } finally ais.close()
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  /** 64-bit perceptual difference-hash (dHash) of an image column — the
    * near-duplicate fingerprint for the IMAGE half of the corpus, feeding
    * the same banded Hamming join as text SimHash
    * ([[Dedup.hammingPairs]]): decode pixels (full decode, unlike the
    * header-only metadata pass), nearest-neighbor-sample a 9×8 integer
    * luma grid, and set bit `y·8 + x` when `luma(x, y) > luma(x+1, y)`.
    * Robust to re-encoding, scaling, and mild brightness shifts — exactly
    * the duplicates a crawled image corpus is full of.
    *
    * Determinism: integer nearest-neighbor sampling + integer luma
    * (299r + 587g + 114b)/1000 make the hash bit-reproducible across JVMs
    * (the [[resizeImages]] contract). Undecodable or null payloads yield
    * a NULL hash (excluded from pairing). One batched `mapPartitions`
    * pass, no shuffle; at 100 TB this is the embarrassingly parallel scan
    * plus [[Dedup.hammingPairs]]'s keyed band join.
    */
  def imageDHash(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("dhash", org.apache.spark.sql.types.LongType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val h: java.lang.Long =
          if (bytes == null) null
          else
            try {
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              if (img == null || img.getWidth < 1 || img.getHeight < 1) null
              else java.lang.Long.valueOf(dHashOfImage(img))
            } catch { case scala.util.control.NonFatal(_) => null }
        Row.fromSeq(r.toSeq :+ (if (h == null) null else h.longValue))
      }
    }(enc)
  }

  /** Image near-duplicate pairs: [[imageDHash]] + the banded Hamming join —
    * `(id_a, id_b, hamming)` for pairs within `maxHamming` bits.
    */
  def imageNearDupPairs(
      df: DataFrame,
      idCol: String,
      binCol: String,
      maxHamming: Int = 6): DataFrame =
    Dedup.hammingPairs(
      imageDHash(df, binCol).select(col(idCol), col("dhash")),
      idCol, "dhash", bits = 64, maxHamming = maxHamming)
  /** 64-bit audio fingerprint — the AUDIO leg of the near-dup triple
    * (text SimHash / image dHash / this), feeding the same
    * [[Dedup.hammingPairs]] banded join: decode mono PCM, split the clip
    * into 65 POSITION-PROPORTIONAL windows (boundaries at ⌊w·N/65⌋, so
    * two copies of the same material at different sample rates or
    * durations align window-for-window), and set bit `w` when
    * `rms(w) > rms(w+1)` — the energy-envelope gradient. Uniform gain
    * scales every window's RMS identically, so the fingerprint is
    * volume-invariant by construction, the dHash brightness argument in
    * the audio domain.
    *
    * Undecodable/empty payloads yield NULL. One batched `mapPartitions`
    * pass, no shuffle.
    */
  def audioFingerprint(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("afp", org.apache.spark.sql.types.LongType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val h: Option[Long] =
          if (bytes == null) None
          else decodePcmMono(bytes).filter(_.nonEmpty).map { samples =>
            val n = samples.length
            val rms = Array.ofDim[Double](65)
            var w = 0
            while (w < 65) {
              val from = (w.toLong * n / 65).toInt
              val until = ((w + 1).toLong * n / 65).toInt
              var sumSq = 0.0
              var i = from
              while (i < until) { sumSq += samples(i) * samples(i); i += 1 }
              rms(w) = if (until > from) math.sqrt(sumSq / (until - from)) else 0.0
              w += 1
            }
            var bitsOut = 0L
            w = 0
            while (w < 64) {
              if (rms(w) > rms(w + 1)) bitsOut |= 1L << w
              w += 1
            }
            bitsOut
          }
        Row.fromSeq(r.toSeq :+ h.map(java.lang.Long.valueOf).orNull)
      }
    }(enc)
  }

  /** Audio near-duplicate pairs: [[audioFingerprint]] + the banded Hamming
    * join — `(id_a, id_b, hamming)` within `maxHamming` bits.
    */
  def audioNearDupPairs(
      df: DataFrame,
      idCol: String,
      binCol: String,
      maxHamming: Int = 8): DataFrame =
    Dedup.hammingPairs(
      audioFingerprint(df, binCol).select(col(idCol), col("afp")),
      idCol, "afp", bits = 64, maxHamming = maxHamming)
  /** The shared dHash grid: integer nearest-neighbor 9×8 luma sampling +
    * horizontal gradient bits — one audited body for images AND video
    * frames.
    */
  private def dHashOfImage(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val ht = img.getHeight
    val g = Array.ofDim[Int](9, 8)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        val sx = x * w / 9
        val sy = y * ht / 8
        val rgb = img.getRGB(sx, sy)
        g(x)(y) = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
          + 114 * (rgb & 0xff)) / 1000
        x += 1
      }
      y += 1
    }
    var bitsOut = 0L
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(x)(y) > g(x + 1)(y)) bitsOut |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bitsOut
  }

  /** Per-frame perceptual hashes for MJPEG videos: resolve the sample
    * table ([[mp4SampleTable]]), decode every `everyNth`-th frame's JPEG
    * slice, and emit `(id, frame_idx, dhash)` — the video leg of the
    * near-dup family at frame grain. Foreign codecs and corrupt payloads
    * produce no rows (the [[sampleMp4Frames]] degrade contract).
    */
  def videoFrameHashes(
      df: DataFrame,
      idCol: String,
      binCol: String,
      everyNth: Int = 1): DataFrame = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    val idField = df.schema(idCol)
    val schema = StructType(Seq(
      idField,
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("dhash", org.apache.spark.sql.types.LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.get(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Iterator.empty
        else mp4SampleTable(bytes) match {
          // fourccs are exactly 4 bytes: "jpeg" (MP4 Motion-JPEG) and
          // "mjpa" (Motion-JPEG Format A) are the ImageIO-decodable entries
          case Some((codec, samples)) if codec == "jpeg" || codec == "mjpa" =>
            samples.iterator
              .filter(_.idx % everyNth == 0)
              .flatMap { smp =>
                try {
                  val slice = java.util.Arrays.copyOfRange(
                    bytes, smp.offset.toInt, (smp.offset + smp.size).toInt)
                  val img = javax.imageio.ImageIO.read(
                    new java.io.ByteArrayInputStream(slice))
                  if (img == null || img.getWidth < 1 || img.getHeight < 1) None
                  else Some(Row(id, smp.idx, dHashOfImage(img)))
                } catch { case scala.util.control.NonFatal(_) => None }
              }
          case _ => Iterator.empty
        }
      }
    }(enc)
  }

  /** Video near-duplicate pairs: videos sharing at least `minShared`
    * DISTINCT frame hashes — the [[Dedup.cdcChunkPairs]] shape with frames
    * as chunks, so a re-encoded or trimmed copy still pairs as long as
    * enough frames survive perceptually. The join is KEYED on the frame
    * hash; `maxFrameFreq` drops boilerplate frames (test cards, black
    * frames) whose document frequency would explode the pair count.
    */
  def videoNearDupPairs(
      df: DataFrame,
      idCol: String,
      binCol: String,
      everyNth: Int = 1,
      minShared: Int = 2,
      maxFrameFreq: Int = 0): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val allFrames = videoFrameHashes(df, idCol, binCol, everyNth)
      .select(col(idCol), col("dhash")).distinct()
    val frames =
      if (maxFrameFreq <= 0) allFrames
      else allFrames.join(
        allFrames.groupBy("dhash").agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= maxFrameFreq)
          .select("dhash"),
        Seq("dhash"), "left_semi")
    val a = frames.alias("a")
    val b = frames.hint("SHUFFLE_HASH").alias("b")
    a.join(b, col("a.dhash") === col("b.dhash") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
  }

  // ---------------------------------------------------------------------
  // EXIF metadata (JPEG APP1 / TIFF IFD walk — pure JVM)
  // ---------------------------------------------------------------------

  /** EXIF extraction result: container truth a curation pipeline needs
    * BEFORE any pixel decode — orientation (a resize/dHash pass that
    * ignores it fingerprints rotated duplicates apart), capture time, and
    * whether a GPS IFD is present. `has_gps` is deliberately a FLAG, not
    * the coordinates: for training-data curation the decision is "strip or
    * quarantine", and extracting lat/long into yet another table would
    * itself propagate the PII ([[graft.ops.Privacy]] composes on the flag).
    */
  val exifMetaSchema: StructType = StructType(Seq(
    StructField("has_exif", BooleanType, nullable = false),
    StructField("orientation", IntegerType, nullable = false),
    StructField("datetime", StringType, nullable = true),
    StructField("has_gps", BooleanType, nullable = false),
    StructField("make", StringType, nullable = true),
    StructField("model", StringType, nullable = true)))

  /** Parsed EXIF fields; the all-default value means "no parseable EXIF". */
  case class ExifMeta(
      hasExif: Boolean, orientation: Int, datetime: String,
      hasGps: Boolean, make: String, model: String)

  private val NoExif = ExifMeta(hasExif = false, 0, null, hasGps = false, null, null)

  /** Parse EXIF from JPEG bytes: walk the segment chain to APP1/`Exif\0\0`,
    * then the TIFF IFD0 (both byte orders) for orientation (0x0112),
    * DateTime (0x0132), Make/Model (0x010F/0x0110), and the GPS IFD
    * pointer (0x8825 — presence with an in-bounds target sets `has_gps`).
    * Every read is bounds-checked; any malformed structure degrades to
    * [[NoExif]] — corrupt assets are data, not errors. Pixel data is never
    * touched (cost is O(header), not O(bytes)).
    */
  def parseExif(bytes: Array[Byte]): ExifMeta = {
    try {
      if (bytes == null || bytes.length < 4 ||
        (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return NoExif
      var i = 2
      while (i + 4 <= bytes.length && (bytes(i) & 0xFF) == 0xFF) {
        val marker = bytes(i + 1) & 0xFF
        if (marker == 0xFF) { i += 1 } // fill byte
        else if (marker == 0xD9 || marker == 0xDA) return NoExif // EOI / scan start
        else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) i += 2 // standalone
        else {
          val segLen = ((bytes(i + 2) & 0xFF) << 8) | (bytes(i + 3) & 0xFF)
          if (segLen < 2 || i + 2 + segLen > bytes.length) return NoExif
          if (marker == 0xE1 && segLen >= 8 &&
            bytes(i + 4) == 'E' && bytes(i + 5) == 'x' && bytes(i + 6) == 'i' &&
            bytes(i + 7) == 'f' && bytes(i + 8) == 0 && bytes(i + 9) == 0) {
            return parseTiff(bytes, i + 10, i + 2 + segLen)
          }
          i += 2 + segLen
        }
      }
      NoExif
    } catch { case scala.util.control.NonFatal(_) => NoExif }
  }

  /** TIFF IFD0 walk over `bytes[t, end)`; offsets are TIFF-header-relative. */
  private def parseTiff(bytes: Array[Byte], t: Int, end: Int): ExifMeta = {
    if (t + 8 > end) return NoExif
    val little =
      if (bytes(t) == 'I' && bytes(t + 1) == 'I') true
      else if (bytes(t) == 'M' && bytes(t + 1) == 'M') false
      else return NoExif
    def u16(p: Int): Int = {
      if (p < t || p + 2 > end) throw new IndexOutOfBoundsException
      val a = bytes(p) & 0xFF; val b = bytes(p + 1) & 0xFF
      if (little) (b << 8) | a else (a << 8) | b
    }
    def u32(p: Int): Long = {
      if (p < t || p + 4 > end) throw new IndexOutOfBoundsException
      val a = bytes(p) & 0xFFL; val b = bytes(p + 1) & 0xFFL
      val c = bytes(p + 2) & 0xFFL; val d = bytes(p + 3) & 0xFFL
      if (little) (d << 24) | (c << 16) | (b << 8) | a
      else (a << 24) | (b << 16) | (c << 8) | d
    }
    if (u16(t + 2) != 42) return NoExif
    val ifd0 = t + u32(t + 4).toInt
    val n = u16(ifd0)
    var orientation = 0
    var datetime: String = null
    var make: String = null
    var model: String = null
    var hasGps = false
    def ascii(entry: Int): String = {
      val count = u32(entry + 4).toInt
      if (count <= 0) return null
      val at = if (count <= 4) entry + 8 else t + u32(entry + 8).toInt
      if (at < t || at + count > end) return null
      // count includes the trailing NUL; tolerate its absence
      val len = if (bytes(at + count - 1) == 0) count - 1 else count
      new String(bytes, at, len, java.nio.charset.StandardCharsets.US_ASCII)
    }
    var e = 0
    while (e < n) {
      val entry = ifd0 + 2 + e * 12
      u16(entry) match {
        case 0x0112 => orientation = u16(entry + 8)
        case 0x0132 => datetime = ascii(entry)
        case 0x010F => make = ascii(entry)
        case 0x0110 => model = ascii(entry)
        case 0x8825 =>
          val gpsOff = t + u32(entry + 8).toInt
          // a valid pointer lands on a readable IFD entry count
          hasGps = gpsOff + 2 <= end && gpsOff >= t && u16(gpsOff) >= 0
        case _ => ()
      }
      e += 1
    }
    ExifMeta(hasExif = true, orientation, datetime, hasGps, make, model)
  }

  /** Attach the EXIF struct to a binary column — the [[withDecodedMeta]]
    * batched mapPartitions shape: per-row header walk, no pixel decode, no
    * shuffle; null payloads degrade to the no-EXIF struct.
    */
  def withExifMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("exif", exifMetaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val m = parseExif(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq :+
          Row(m.hasExif, m.orientation, m.datetime, m.hasGps, m.make, m.model))
      }
    }(enc)
  }

  /** Minimal EXIF JPEG WRITER — the inverse of [[parseExif]] for derived
    * assets (a resize pipeline that re-encodes should carry orientation
    * forward) and the round-trip fixture for the oracle: build-then-parse
    * must invert exactly, in BOTH byte orders. Emits SOI + APP1(Exif/TIFF
    * IFD0 with the given fields [+ a one-entry GPS IFD]) + EOI. Tags are
    * written ascending as TIFF requires.
    */
  def buildExifJpeg(
      orientation: Int,
      datetime: Option[String],
      gps: Boolean,
      make: Option[String] = None,
      model: Option[String] = None,
      littleEndian: Boolean = true): Array[Byte] = {
    val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    def p16(v: Int): Unit =
      if (littleEndian) { buf += (v & 0xFF).toByte; buf += ((v >> 8) & 0xFF).toByte }
      else { buf += ((v >> 8) & 0xFF).toByte; buf += (v & 0xFF).toByte }
    def p32(v: Long): Unit =
      if (littleEndian) (0 to 3).foreach(s => buf += ((v >> (8 * s)) & 0xFF).toByte)
      else (3 to 0 by -1).foreach(s => buf += ((v >> (8 * s)) & 0xFF).toByte)
    // TIFF header
    buf ++= (if (littleEndian) "II" else "MM").getBytes
    p16(42); p32(8L)
    // entries: make?, model?, orientation, datetime?, gps? — ascending tags
    case class Ent(tag: Int, typ: Int, count: Int, inline: Option[Int], data: Option[Array[Byte]])
    val strs = Seq(
      make.map(s => Ent(0x010F, 2, s.length + 1, None, Some((s + "\u0000").getBytes))),
      model.map(s => Ent(0x0110, 2, s.length + 1, None, Some((s + "\u0000").getBytes))),
      Some(Ent(0x0112, 3, 1, Some(orientation), None)),
      datetime.map(s => Ent(0x0132, 2, s.length + 1, None, Some((s + "\u0000").getBytes))),
      if (gps) Some(Ent(0x8825, 4, 1, None, None)) else None).flatten
    val n = strs.size
    p16(n)
    // data area starts after: header(8) + count(2) + 12n + next-IFD(4)
    val dataOff = 8 + 2 + 12 * n + 4
    val dataBytes = scala.collection.mutable.ArrayBuffer[Byte]()
    strs.foreach { ent =>
      p16(ent.tag); p16(ent.typ); p32(ent.count.toLong)
      ent match {
        case Ent(_, 3, _, Some(v), _) =>
          // SHORT value packs into the first two value bytes
          p16(v); p16(0)
        case Ent(0x8825, _, _, _, _) =>
          p32(0L) // placeholder, back-patched once the data area is sized
        case Ent(_, 2, count, _, Some(d)) =>
          if (count <= 4) { d.padTo(4, 0.toByte).take(4).foreach(buf += _); () }
          else { p32((dataOff + dataBytes.length).toLong); dataBytes ++= d }
        case _ => p32(0L)
      }
    }
    p32(0L) // next IFD
    buf ++= dataBytes
    if (gps) {
      val gpsAt = dataOff + dataBytes.length
      // back-patch the GPS pointer (entry field at its computed position)
      val gpsEntryIdx = strs.indexWhere(_.tag == 0x8825)
      val ptrPos = 8 + 2 + 12 * gpsEntryIdx + 8
      val v = gpsAt.toLong
      (0 to 3).foreach { s =>
        val b = ((v >> (8 * (if (littleEndian) s else 3 - s))) & 0xFF).toByte
        buf(ptrPos + s) = b
      }
      // one-entry GPS IFD: GPSVersionID = 2.3.0.0
      p16(1); p16(0x0000); p16(1); p32(4L)
      buf += 2; buf += 3; buf += 0; buf += 0
      p32(0L)
    }
    val tiff = buf.toArray
    val payload = "Exif\u0000\u0000".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ tiff
    val segLen = payload.length + 2
    (Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE1.toByte,
      ((segLen >> 8) & 0xFF).toByte, (segLen & 0xFF).toByte) ++
      payload ++ Array(0xFF.toByte, 0xD9.toByte))
  }
}
