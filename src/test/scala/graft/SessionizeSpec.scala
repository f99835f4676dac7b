package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Sessionize

/** Batch and stateful-streaming sessionization must agree. */
class SessionizeSpec extends SparkSpec {

  import spark.implicits._

  test("batch: gap > threshold starts a new session; ordering by (ts, id)") {
    val rows = Seq(
      (1L, 10L, Timestamp.valueOf("2020-01-01 08:00:00")),
      (2L, 10L, Timestamp.valueOf("2020-01-01 08:10:00")), // within 30 min
      (3L, 10L, Timestamp.valueOf("2020-01-01 09:30:00")), // 80 min gap → new
      (4L, 20L, Timestamp.valueOf("2020-01-01 08:00:00"))) // other user
      .toDF("event_id", "user_id", "ts")
    val got = Sessionize.assignBatch(rows, "user_id", "ts", "event_id", 1800)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("streaming flatMapGroupsWithState agrees with batch on sf0.001 events") {
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), unix_timestamp(Functions.toSecond(col("ts"))).as("sec"),
        col("event_id"))
    val batch = Sessionize
      .assignBatch(
        events.select(col("event_id"), col("user_id"),
          timestamp_seconds(col("sec")).as("t")),
        "user_id", "t", "event_id", 1800)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap

    val dir = java.nio.file.Files.createTempDirectory("graft_sess_").toString
    events.select(col("user_id").as("key"), col("sec").as("tsSec"), col("event_id").as("id"))
      .write.mode("overwrite").parquet(dir)
    val name = "sess_out"
    val stream = spark.readStream
      .schema("key LONG, tsSec LONG, id LONG")
      .parquet(dir)
      .as[Sessionize.Event]
    val q = Sessionize.assignStream(stream, 1800).writeStream
      .outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(name)
      .select("id", "sessionId").as[(Long, Long)].collect().toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
