package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** S8 — device ingest client (reference `drivers/devices/gs_log_reader.py:
  * 27-87` and `gs_device.py:48-76`): each GRIDSMART camera serves a
  * `counts.json` date list plus one zip of per-zone CSVs per date,
  * downloaded in 1 MB chunks with retries.
  *
  * The network is abstracted behind [[Transport]] — a ranged-read function —
  * so the engine-side logic (chunk assembly, bounded per-chunk retry, date
  * listing, distributed per-device fetch) is real and fully tested without
  * sockets; a production deployment supplies an HTTP transport. This is the
  * same boundary split the rest of the engine uses (`Sinks.Connector` for
  * REST publishers).
  */
object DeviceIngest {

  /** Ranged read: bytes of `path` starting at `offset`, at most `maxBytes`;
    * empty array when the object is exhausted. Implementations may throw on
    * transient failure — callers retry.
    */
  trait Transport extends Serializable {
    def fetch(path: String, offset: Long, maxBytes: Int): Array[Byte]
  }

  /** Reference chunk size (1 MB, `gs_log_reader.py:60-87`). */
  val DefaultChunkBytes: Int = 1 << 20

  /** Reference retry bound (`gs_device.py:48-76` retries whole requests;
    * per-chunk retry is strictly stronger).
    */
  val DefaultRetries: Int = 5

  /** Download a complete object through chunked ranged reads, retrying each
    * chunk up to `maxRetries` times. A transient mid-object failure resumes
    * at the failed offset — already-fetched chunks are never re-downloaded.
    */
  def download(
      t: Transport,
      path: String,
      chunkBytes: Int = DefaultChunkBytes,
      maxRetries: Int = DefaultRetries): Array[Byte] = {
    require(chunkBytes > 0)
    val out = new java.io.ByteArrayOutputStream()
    var offset = 0L
    var done = false
    while (!done) {
      var attempt = 0
      var chunk: Array[Byte] = null
      while (chunk == null) {
        try chunk = t.fetch(path, offset, chunkBytes)
        catch {
          case e: Exception =>
            attempt += 1
            if (attempt > maxRetries) throw e
        }
      }
      if (chunk.isEmpty) done = true
      else { out.write(chunk); offset += chunk.length }
    }
    out.toByteArray
  }

  /** The device's available count dates (reference `counts.json` — a JSON
    * array of ISO dates): downloaded through the same chunked/retried path,
    * parsed leniently, deduplicated, sorted (the reference sorts its date
    * lists for deterministic iteration, `last_upd_gs.py:40-41`).
    */
  def availableDates(
      t: Transport,
      path: String = "counts.json",
      maxRetries: Int = DefaultRetries): Seq[java.time.LocalDate] = {
    val text = new String(download(t, path, maxRetries = maxRetries), "UTF-8")
    "\\d{4}-\\d{2}-\\d{2}".r.findAllIn(text).toSeq.distinct
      .map(java.time.LocalDate.parse).sorted
  }

  /** Day-archive path for a device date (reference
    * `counts/bydate/YYYY-MM-DD`, `gs_log_reader.py:40-58`).
    */
  def dayArchivePath(date: java.time.LocalDate): String = s"counts/bydate/$date"

  /** Distributed fetch: one download per input row, executed in executors
    * via `mapPartitions` (SURVEY S8 — "mapPartitions fetch over a device
    * DataFrame"); the transport is constructed per partition, mirroring a
    * real per-executor HTTP client pool. Appends a `payload` binary column
    * read from `pathCol`.
    */
  def fetchPerDevice(
      devices: DataFrame,
      pathCol: String,
      makeTransport: () => Transport,
      chunkBytes: Int = DefaultChunkBytes,
      maxRetries: Int = DefaultRetries): DataFrame = {
    val schema = StructType(devices.schema.fields :+ StructField("payload", BinaryType))
    val pathIdx = devices.schema.fieldIndex(pathCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    devices.mapPartitions { rows =>
      val t = makeTransport() // per-partition client init
      rows.map { r =>
        val bytes = download(t, r.getString(pathIdx), chunkBytes, maxRetries)
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(enc)
  }
}
