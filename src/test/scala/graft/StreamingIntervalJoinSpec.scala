package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streaming

/** Stream-stream point-in-interval join: the real streaming engine (two
  * file-source streams, watermarks, append mode) must produce exactly the
  * batch theta-join result, and the exact per-row interval end must hold
  * even below the constant state bound.
  */
class StreamingIntervalJoinSpec extends SparkSpec {

  // purchases = points, clicks = intervals [ts, ts + 60 + floor(value*60))
  private lazy val events = Tables(spark, "/root/testdata/sf0.001", "events")
  private lazy val points = events
    .filter(col("event_type") === "purchase")
    .select(
      col("user_id").as("p_user"), col("event_id").as("p_id"),
      Functions.toSecond(col("ts")).as("p_ts"))
  private lazy val intervals = events
    .filter(col("event_type") === "click")
    .select(
      col("user_id").as("l_user"), col("event_id").as("l_id"),
      Functions.toSecond(col("ts")).as("l_start_ts"),
      (Functions.toSecond(col("ts")).cast("long") + lit(60L) + floor(col("value") * 60d).cast("long"))
        .cast("timestamp").as("l_end_ts"))

  private def runStreamJoin(maxIntervalSeconds: Long): Set[(Long, Long)] = {
    val pDir = java.nio.file.Files.createTempDirectory("graft_sij_p").toString
    val iDir = java.nio.file.Files.createTempDirectory("graft_sij_i").toString
    points.write.mode("overwrite").parquet(pDir)
    intervals.write.mode("overwrite").parquet(iDir)

    val pStream = spark.readStream.schema(points.schema).parquet(pDir)
    val iStream = spark.readStream.schema(intervals.schema).parquet(iDir)
    val joined = Streaming.pointInIntervalJoin(
      pStream, iStream, "p_user", "l_user", "p_ts", "l_start_ts", "l_end_ts",
      maxIntervalSeconds)

    val name = s"graft_sij_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = joined.select("p_id", "l_id").writeStream
      .outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def batchPairs(extra: DataFrame => DataFrame = identity): Set[(Long, Long)] =
    extra(points.join(intervals,
        col("p_user") === col("l_user") &&
          col("p_ts") >= col("l_start_ts") && col("p_ts") < col("l_end_ts")))
      .select("p_id", "l_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streamed join equals the batch theta join") {
    // max interval length is 60 + 490*60 < 30000 s — the bound is slack
    val got = runStreamJoin(maxIntervalSeconds = 30000L)
    val want = batchPairs()
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("a tight state bound drops only pairs beyond it (bound is semantic)") {
    val bound = 600L
    val got = runStreamJoin(maxIntervalSeconds = bound)
    // the bound caps how far a point may sit past the interval START
    val want = batchPairs(_.filter(
      col("p_ts").cast("long") <= col("l_start_ts").cast("long") + bound))
    assert(got === want)
    assert(got.size < batchPairs().size, "fixture must exercise the bound")
  }

  // ---- interval × interval overlap ----

  private lazy val views = events
    .filter(col("event_type") === "view")
    .select(
      col("user_id").as("r_user"), col("event_id").as("r_id"),
      Functions.toSecond(col("ts")).as("r_start_ts"),
      (Functions.toSecond(col("ts")).cast("long") + lit(60L) + floor(col("value") * 60d).cast("long"))
        .cast("timestamp").as("r_end_ts"))

  test("streamed overlap join equals the batch theta join") {
    val iDir = java.nio.file.Files.createTempDirectory("graft_soj_l").toString
    val vDir = java.nio.file.Files.createTempDirectory("graft_soj_r").toString
    intervals.write.mode("overwrite").parquet(iDir)
    views.write.mode("overwrite").parquet(vDir)

    val lStream = spark.readStream.schema(intervals.schema).parquet(iDir)
    val rStream = spark.readStream.schema(views.schema).parquet(vDir)
    // both interval families are ≤ 60 + 490·60 < 30000 s long
    val joined = Streaming.intervalOverlapJoin(
      lStream, rStream, "l_user", "r_user",
      "l_start_ts", "l_end_ts", "r_start_ts", "r_end_ts",
      maxLeftSeconds = 30000L, maxRightSeconds = 30000L)

    val name = s"graft_soj_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = joined.select("l_id", "r_id").writeStream
      .outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val want = intervals.join(views,
        col("l_user") === col("r_user") &&
          col("l_start_ts") < col("r_end_ts") && col("r_start_ts") < col("l_end_ts"))
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
    // and the streaming result agrees with the batch bucketed RangeJoin on
    // the same epoch data — the two operators are genuine twins
    val epochPairs = graft.ops.RangeJoin.overlap(
        intervals.select(col("l_user"), col("l_id"),
          col("l_start_ts").cast("long").as("l_s"), col("l_end_ts").cast("long").as("l_e")),
        views.select(col("r_user"), col("r_id"),
          col("r_start_ts").cast("long").as("r_s"), col("r_end_ts").cast("long").as("r_e")),
        "l_s", "l_e", "r_s", "r_e", Seq("l_user"), Seq("r_user"), bucketWidth = 86400L)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === epochPairs)
  }

  test("asymmetric length bounds drop nothing when each side's bound covers its lengths") {
    // clamp the RIGHT intervals to ≤ 120 s so maxRight = 120 is valid while
    // the left side keeps its long (≤ 30000 s) intervals — a regression
    // guard for swapping the two bounds in the derived start-distance band
    // (a long-left/short-right overlap where lS ≪ rS survives only if
    // maxLeft bounds the lower side)
    val shortViews = views.withColumn("r_end_ts",
      least(col("r_end_ts"), (col("r_start_ts").cast("long") + 120L).cast("timestamp")))
    val iDir = java.nio.file.Files.createTempDirectory("graft_soj_asym_l").toString
    val vDir = java.nio.file.Files.createTempDirectory("graft_soj_asym_r").toString
    intervals.write.mode("overwrite").parquet(iDir)
    shortViews.write.mode("overwrite").parquet(vDir)

    val joined = Streaming.intervalOverlapJoin(
      spark.readStream.schema(intervals.schema).parquet(iDir),
      spark.readStream.schema(shortViews.schema).parquet(vDir),
      "l_user", "r_user", "l_start_ts", "l_end_ts", "r_start_ts", "r_end_ts",
      maxLeftSeconds = 30000L, maxRightSeconds = 120L)
    val name = s"graft_soj_asym_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = joined.select("l_id", "r_id").writeStream
      .outputMode("append").format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val want = intervals.join(shortViews,
        col("l_user") === col("r_user") &&
          col("l_start_ts") < col("r_end_ts") && col("r_start_ts") < col("l_end_ts"))
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    // the fixture must contain long-left overlaps that a swapped bound loses
    assert(intervals.join(shortViews,
        col("l_user") === col("r_user") &&
          col("l_start_ts") < col("r_end_ts") && col("r_start_ts") < col("l_end_ts") &&
          col("l_start_ts").cast("long") < col("r_start_ts").cast("long") - 120L)
      .count() > 0, "fixture must exercise the asymmetric band")
  }
}
