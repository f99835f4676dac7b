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

  test("native session_window agg groups exactly like assignBatch, incl. the gap boundary") {
    val rows = Seq(
      (1L, 10L, Timestamp.valueOf("2020-01-01 08:00:00")),
      (2L, 10L, Timestamp.valueOf("2020-01-01 08:30:00")), // EXACTLY the 1800s gap
      (3L, 10L, Timestamp.valueOf("2020-01-01 08:40:00")),
      (4L, 20L, Timestamp.valueOf("2020-01-01 08:00:00")))
      .toDF("id", "user", "ts")
    // windows touching at the boundary COALESCE: diff == gap stays merged,
    // exactly assignBatch's `diff > g` rule
    val native = Sessionize.sessionAgg(rows, "user", "ts", gapSeconds = 1800L)
      .select(col("user"), unix_timestamp(col("session_start")).as("s"),
        unix_timestamp(col("session_end")).as("e"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def sec(t: String) = Timestamp.valueOf(t).toInstant.getEpochSecond
    assert(native == Set(
      (10L, sec("2020-01-01 08:00:00"), sec("2020-01-01 09:10:00"), 3L),
      (20L, sec("2020-01-01 08:00:00"), sec("2020-01-01 08:30:00"), 1L)))
    val perRow = Sessionize.assignBatch(rows, "user", "ts", "id", 1800L)
      .select("user", "id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(perRow((10L, 1L)) == perRow((10L, 2L)), "assignBatch: diff == gap stays merged")

    // randomized equivalence at the SAME gap: session bounds derived from
    // assignBatch ids == native windows
    val rnd = new scala.util.Random(11)
    val randRows = (1 to 400).map { i =>
      (i.toLong, (rnd.nextInt(4) + 1).toLong,
        Timestamp.from(Timestamp.valueOf("2020-01-01 00:00:00").toInstant
          .plusSeconds(rnd.nextInt(40000).toLong)))
    }.toDF("id", "user", "ts")
    val viaIds = Sessionize.assignBatch(randRows, "user", "ts", "id", 600L)
      .groupBy("user", "session_id")
      .agg(min(unix_timestamp(col("ts"))).as("s"),
        max(unix_timestamp(col("ts"))).as("e"), count(lit(1)).as("n"))
      .select(col("user"), col("s"), (col("e") + 600L).as("e"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val viaNative = Sessionize.sessionAgg(randRows, "user", "ts", gapSeconds = 600L)
      .select(col("user"), unix_timestamp(col("session_start")),
        unix_timestamp(col("session_end")), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaNative == viaIds, "sessionAgg(g) must group exactly like assignBatch(g)")
  }

  test("streaming session_window with watermark equals the batch native form") {
    val src = java.nio.file.Files.createTempDirectory("graft_ssw_src_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_ssw_out_").toString + "/sessions"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ssw_ck_").toString
    val rows = Seq(
      (10L, Timestamp.valueOf("2020-01-01 08:00:00")),
      (10L, Timestamp.valueOf("2020-01-01 08:10:00")),
      (10L, Timestamp.valueOf("2020-01-01 09:30:00")),
      (20L, Timestamp.valueOf("2020-01-01 08:00:00")))
      .toDF("user", "ts")
    rows.write.mode("overwrite").parquet(src)
    val q = spark.readStream.schema("user LONG, ts TIMESTAMP").parquet(src)
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user"), session_window(col("ts"), "1800 seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user"),
        unix_timestamp(col("session_window.start")).as("s"),
        unix_timestamp(col("session_window.end")).as("e"),
        col("n_events"))
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // append mode only emits sessions the watermark has CLOSED; with a
    // 0s watermark at max(ts), sessions ending before it are final
    val streamed = spark.read.schema("user LONG, s LONG, e LONG, n_events LONG")
      .parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Sessionize.sessionAgg(rows, "user", "ts", 1800L)
      .select(col("user"), unix_timestamp(col("session_start")),
        unix_timestamp(col("session_end")), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val watermarkSec = Timestamp.valueOf("2020-01-01 09:30:00").toInstant.getEpochSecond
    val expected = batch.filter(_._3 <= watermarkSec)
    assert(streamed == expected,
      s"stream must emit exactly the watermark-closed sessions: got $streamed want $expected")
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
