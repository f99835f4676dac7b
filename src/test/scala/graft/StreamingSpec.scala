package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.Streaming

/** Structured Streaming restatement (SURVEY §2.9): the windowed streaming
  * aggregation over the events parquet must agree with the equivalent batch
  * aggregation.
  */
class StreamingSpec extends SparkSpec {

  test("AvailableNow windowed agg equals batch A1 on sf0.001 events") {
    // stream source needs the pre-converted schema: read via Tables once to
    // learn it, then re-feed the converted frame through a temp parquet dir
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_").toString
    events.write.mode("overwrite").parquet(dir)

    val streamed = Streaming.runAvailableNow(
      spark, dir, events.schema,
      df => Streaming.windowedAgg(df, "ts", Seq("event_type"), Seq("value")),
      outputMode = "complete")

    val batch = graft.ops.TrafficAgg
      .aggregate(events, "ts", Seq("event_type"), Seq("value"))
      .select("bucket_start", "event_type", "volume", "value_avg")

    val s = streamed.select("bucket_start", "event_type", "volume", "value_avg")
      .collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(s == b)
    assert(s.nonEmpty)
  }

  test("checkpointed AvailableNow processes each file exactly once across runs") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_incr_src_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_incr_out_").toString + "/sink"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_incr_ck_").toString

    def runOnce(): Unit = {
      val q = spark.readStream.schema("id LONG").parquet(src)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    Seq(1L, 2L, 3L).toDF("id").write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(out).count() == 3)
    // rerun with nothing new: no duplicates (the checkpoint is the catalog)
    runOnce()
    assert(spark.read.parquet(out).count() == 3)
    // new file arrives: only its rows append
    Seq(4L, 5L).toDF("id").write.mode("append").parquet(src)
    runOnce()
    val ids = spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("watermark bounds state in append mode") {
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream2_").toString
    events.write.mode("overwrite").parquet(dir)
    // append mode only emits closed windows — with AvailableNow + 1h
    // watermark every window except the last hour's closes
    val appended = Streaming.runAvailableNow(
      spark, dir, events.schema,
      df => Streaming.windowedAgg(df, "ts", Seq("event_type"), Seq("value"),
        watermark = "1 hour"),
      outputMode = "append")
    val total = Streaming.runAvailableNow(
      spark, dir, events.schema,
      df => Streaming.windowedAgg(df, "ts", Seq("event_type"), Seq("value"),
        watermark = "1 hour"),
      outputMode = "complete")
    assert(appended.count() > 0)
    assert(appended.count() <= total.count())
  }
}
