package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sink-side operators (SURVEY §2.2).
  *
  * The primary lake format is partitioned parquet in relational (exploded)
  * form — the reference's per-day JSON documents become partitions, which is
  * what makes 100 TB queryable (partition pruning on
  * year/month/day/data_source replaces its `yyyy/mm/dd/source/` S3 key
  * scheme, reference `drivers/storage_s3.py:36-48`). Document-envelope JSON
  * remains available as a compatibility *view* via [[assembleEnvelope]] +
  * `toJSON`, per SURVEY §7.5 risk 5.
  */
object Sinks {

  /** K1 — lake write: relational rows partitioned by date parts + source.
    * `dateCol` drives the partition columns.
    */
  def writeLake(
      df: DataFrame,
      dateCol: String,
      dataSource: String,
      path: String,
      mode: String = "overwrite"): Unit = {
    df.withColumn("year", year(col(dateCol)))
      .withColumn("month", month(col(dateCol)))
      .withColumn("day", dayofmonth(col(dateCol)))
      .withColumn("data_source", lit(dataSource))
      .write
      .partitionBy("year", "month", "day", "data_source")
      .mode(mode)
      .parquet(path)
  }

  /** Document-envelope assembly (reference `{"header":…, "data":[…]}` files,
    * SURVEY §1.1): group rows by the header key columns and collect the data
    * rows into an array. `.toJSON` on the result reproduces lake-compatible
    * documents. Each group is one output document — bounded by the
    * reference's per-(file × day) sizes, so `collect_list` is safe; the
    * relational parquet form stays primary at scale.
    */
  def assembleEnvelope(
      df: DataFrame,
      headerCols: Seq[String],
      dataCols: Seq[String],
      sortCols: Seq[String] = Seq.empty): DataFrame = {
    // collect with the sort keys as the struct prefix (array_sort orders by
    // field order), then rebuild each struct in the caller's dataCols order
    val collectOrder = (sortCols ++ dataCols.filterNot(sortCols.contains)).distinct
    val rowStruct = struct(collectOrder.map(col): _*)
    val collected = df
      .groupBy(headerCols.map(col): _*)
      .agg(collect_list(rowStruct).as("_rows"))
    val sorted =
      if (sortCols.isEmpty) col("_rows")
      else array_sort(col("_rows"))
    val dataArr =
      if (collectOrder == dataCols) sorted
      else transform(sorted, r => struct(dataCols.map(c => r.getField(c).as(c)): _*))
    collected.select(
      struct(headerCols.map(col): _*).as("header"),
      dataArr.as("data"))
  }

  /** K4 — CSV publisher (reference `support/publish.py:120-161`). */
  def writeCsv(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.option("header", "true").mode(mode).csv(path)

  /** Connector contract for buffered REST-shaped publishers (Socrata/Knack
    * analogs, reference `support/publish.py:36-77`,
    * `drivers/publish_socrata.py:26-42`). Implementations receive one chunk
    * (≤ `chunkSize` rows) per call.
    */
  trait Connector extends Serializable {
    def writeChunk(rows: Seq[Map[String, Any]]): Unit
  }

  /** K3 — buffered row publisher: `foreachPartition`, chunked at
    * `chunkSize` (reference Socrata chunk 10 000,
    * `drivers/publish_socrata.py:10-11`), client-side throttled to
    * `maxCallsPerSec` (reference Knack ≤ 9 calls/s,
    * `util/perfmet_knack.py:22-27`) with `maxRetries` retry attempts.
    * Rate limiting is per-partition-task (the reference is single-process;
    * a distributed publisher throttles per executor slot — size
    * `maxCallsPerSec` accordingly).
    */
  def publishBuffered(
      df: DataFrame,
      connector: Connector,
      chunkSize: Int = 10000,
      maxCallsPerSec: Double = 9.0,
      maxRetries: Int = 5): Unit = {
    val fields = df.schema.fieldNames
    df.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      val minIntervalNs = (1e9 / maxCallsPerSec).toLong
      var lastCall = 0L
      it.grouped(chunkSize).foreach { chunk =>
        val rows = chunk.map(r => fields.zipWithIndex.map { case (f, i) => f -> r.get(i) }.toMap)
        val wait = lastCall + minIntervalNs - System.nanoTime()
        if (wait > 0) Thread.sleep(wait / 1000000, (wait % 1000000).toInt)
        var attempt = 0
        var done = false
        while (!done) {
          try { connector.writeChunk(rows); done = true }
          catch {
            case e: Exception if attempt < maxRetries =>
              attempt += 1
              Thread.sleep(math.min(1000L * attempt, 5000L))
          }
        }
        lastCall = System.nanoTime()
      }
    }
  }

  /** Deterministic publish ordering helper (reference output orderings, O1-O3):
    * a final `orderBy` before single-writer sinks.
    */
  def ordered(df: DataFrame, cols: Column*): DataFrame = df.orderBy(cols: _*)
}
