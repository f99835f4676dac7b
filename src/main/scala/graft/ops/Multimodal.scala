package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride as opaque `binary`
  * columns with a typed metadata struct. The Spark-side contract — schema,
  * batched decode via `mapPartitions`, partition sizing — is real and
  * tested; the *decoder itself* is a clearly-marked deterministic stub
  * (this container ships no image/audio codecs). Swap [[StubDecoder]] for a
  * JNI/codec-backed implementation without touching the plumbing.
  */
object Multimodal {

  /** Decoded-asset metadata: what a real `decode(bytes)` would yield. */
  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mime", StringType, nullable = false)))

  /** STUB decode: deterministic fake dimensions derived from the payload
    * hash. A real implementation would parse the container header. The
    * signature — bytes in, (w, h, mime) out, called once per row inside a
    * partition batch — is the part that carries over.
    */
  object StubDecoder extends Serializable {
    def decode(bytes: Array[Byte]): (Int, Int, String) = {
      val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val w = 64 + (((h(0) & 0xff) << 8 | (h(1) & 0xff)) % 1856)
      val ht = 64 + (((h(2) & 0xff) << 8 | (h(3) & 0xff)) % 1016)
      (w, ht, "image/fake")
    }
  }

  /** Attach decode metadata to a binary column with a batched
    * `mapPartitions` pass — the decoder is initialized once per partition
    * (the expensive part for real codecs), not once per row; rows stream
    * through without materializing the partition.
    */
  def withDecodedMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("meta", metaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      val decoder = StubDecoder // per-partition init point for a real codec
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val meta =
          if (bytes == null) Row(0, 0, 0, "application/octet-stream")
          else {
            val (w, h, mime) = decoder.decode(bytes)
            Row(bytes.length, w, h, mime)
          }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

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
}
