package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured Streaming restatement of the reference's incremental concerns
  * (SURVEY §2.9): the nightly compare loop becomes a file-source stream with
  * `Trigger.AvailableNow` + checkpoint (exactly-once per item replaces the
  * catalog anti-join for the streaming path), the same-day cancel becomes an
  * event-time watermark, and the flagship 15-minute aggregation runs as a
  * windowed streaming agg.
  */
object Streaming {

  /** Windowed streaming aggregation (SURVEY A1 as a stream): tumbling
    * `freqSeconds` windows per `dims`, volume + mean of each measure, with a
    * `watermark` bounding late data (the reference's day_covered/adjacent-day
    * logic, `gs_ready.py:244-281`, collapses into event-time windowing).
    */
  def windowedAgg(
      stream: DataFrame,
      tsCol: String,
      dims: Seq[String],
      measures: Seq[String],
      freqSeconds: Int = 900,
      watermark: String = "1 day"): DataFrame = {
    val stats = measures.flatMap { m =>
      Seq(
        sum(col(m).cast("decimal(18,6)")).cast("double").as(s"_s1_$m"),
        count(col(m)).as(s"_n_$m"))
    }
    val grouped = stream
      .withWatermark(tsCol, watermark)
      .groupBy(
        window(col(tsCol), s"$freqSeconds seconds").as("w") +: dims.map(col): _*)
      .agg(count(lit(1)).as("volume"), stats: _*)
    val avgs = measures.map(m =>
      graft.Functions.roundHalfUp(col(s"_s1_$m") / col(s"_n_$m"), 3).as(s"${m}_avg"))
    grouped.select(
      (col("w.start").as("bucket_start") +: dims.map(col)) ++ (col("volume") +: avgs): _*)
  }

  /** Stream-stream point-in-interval join — the streaming twin of
    * [[graft.ops.RangeJoin.pointInInterval]]: each point row joined to the
    * interval rows of the same key whose half-open `[start, end)` contains
    * it, over two unbounded streams.
    *
    * State stays bounded because the TIME-RANGE part of the condition uses
    * the two watermarked event-time columns with a CONSTANT bound
    * (`pt between start and start + maxIntervalSeconds`): Spark derives
    * state watermarks from it and evicts interval state once the point
    * stream's watermark passes `start + maxIntervalSeconds`, and point state
    * symmetrically. The exact per-row end (`pt < end`, a data column) rides
    * along as a residual predicate — it cannot bound state, which is why
    * `maxIntervalSeconds` (the longest interval you ever emit) is a
    * required, semantic knob and not a tuning hint. Matches emit as they
    * join (inner join, append mode); the watermark only delays cleanup, not
    * results.
    */
  def pointInIntervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointKey: String,
      intervalKey: String,
      ptCol: String,
      iStartCol: String,
      iEndCol: String,
      maxIntervalSeconds: Long,
      watermark: String = "1 hour"): DataFrame = {
    require(maxIntervalSeconds > 0, s"maxIntervalSeconds must be positive")
    points.withWatermark(ptCol, watermark)
      .join(
        intervals.withWatermark(iStartCol, watermark),
        col(pointKey) === col(intervalKey) &&
          col(ptCol) >= col(iStartCol) &&
          col(ptCol) <= col(iStartCol) + expr(s"INTERVAL $maxIntervalSeconds SECONDS") &&
          col(ptCol) < col(iEndCol),
        "inner")
  }

  /** Stream-stream interval-OVERLAP join — the streaming twin of
    * [[graft.ops.RangeJoin.overlap]]. Overlap of `[lS, lE)` and `[rS, rE)`
    * with bounded lengths (`lE ≤ lS + maxLeft`, `rE ≤ rS + maxRight`)
    * bounds the start distance: `rS < lE ≤ lS + maxLeft` gives
    * `lS ≥ rS - maxLeft`, and `lS < rE ≤ rS + maxRight` gives
    * `lS ≤ rS + maxRight` — note each side's own length bounds how far ITS
    * start may trail the other. The two watermarked START columns carry
    * that constant band as a time-range condition Spark can derive state
    * watermarks from; the exact overlap predicate (`lS < rE && rS < lE`,
    * on data columns) rides as the residual filter. As with
    * [[pointInIntervalJoin]], the max lengths are SEMANTIC: an interval
    * longer than its declared bound can silently miss matches, so emit
    * clamped intervals or raise the bound.
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      maxLeftSeconds: Long,
      maxRightSeconds: Long,
      watermark: String = "1 hour"): DataFrame = {
    require(maxLeftSeconds > 0 && maxRightSeconds > 0, "interval bounds must be positive")
    left.withWatermark(lStart, watermark)
      .join(
        right.withWatermark(rStart, watermark),
        col(leftKey) === col(rightKey) &&
          col(lStart) >= col(rStart) - expr(s"INTERVAL $maxLeftSeconds SECONDS") &&
          col(lStart) <= col(rStart) + expr(s"INTERVAL $maxRightSeconds SECONDS") &&
          col(lStart) < col(rEnd) && col(rStart) < col(lEnd),
        "inner")
  }

  /** Run a finite file-backed stream to completion (AvailableNow) into an
    * in-memory table and return the result — used by tests and the
    * verification harness to exercise the real streaming engine on the
    * synthetic parquet.
    */
  def runAvailableNow(
      spark: SparkSession,
      path: String,
      schema: StructType,
      transform: DataFrame => DataFrame,
      outputMode: String = "complete"): DataFrame = {
    val name = s"graft_stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val stream = spark.readStream.schema(schema).parquet(path)
    val q = transform(stream).writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Exactly-once snapshot-lake sink for a streaming query: each micro
    * batch commits through [[graft.catalog.SnapshotLake.commitIfNew]] keyed
    * by (appId, batchId), so Structured Streaming's at-least-once
    * `foreachBatch` delivery — replays after a crash before the checkpoint
    * advanced, retried batches — lands each batch's data EXACTLY once: the
    * batch-id watermark rides the same atomic manifest create as the data.
    * Use a stable `appId` per logical stream; two streams writing the same
    * lake need distinct ids (watermarks are per-app).
    *
    * The default trigger is `AvailableNow` — drain what exists, then stop
    * (the scheduled-batch deployment shape); pass a processing-time trigger
    * for a resident continuous sink. See [[graft.catalog.SnapshotLake
    * .commitIfNew]] for the checkpoint-loss caveat: batch ids are relative
    * to ONE checkpoint lineage, so recovering from a lost checkpoint needs
    * a fresh appId or a repositioned source — never the old appId with a
    * fresh checkpoint.
    */
  def snapshotSink(
      df: DataFrame,
      lake: graft.catalog.SnapshotLake,
      partitionCols: Seq[String],
      appId: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        lake.commitIfNew(appId, batchId, batch, partitionCols)
        ()
      }
      .start()
}
