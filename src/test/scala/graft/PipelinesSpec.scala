package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.apps.Pipelines
import graft.model.Schemas
import graft.sources.Sources

/** End-to-end pipeline slices on miniature reference-shaped fixtures
  * (FIXTURES.md A1-A7): wt standardize→ready→publish (SURVEY §7.3), bt
  * joins + pseudonymization, gs v8 timestamp reconstruction + drift +
  * day_covered + agg15.
  */
class PipelinesSpec extends SparkSpec {

  import spark.implicits._

  test("wt slice: parse tz, as-of style dim join, publish projection") {
    val raw = Seq(
      // detID, intID, curDateTime (US/Central), intName, detName, volume, occ, speed
      ("1", "100", "2020-01-15 08:00:00", "LAMAR/KOENIG", "NB_1", "12", "3", "35"),
      ("2", "100", "2020-01-15 08:00:00", "LAMAR/KOENIG", "SB_1", "7", "2", "33"))
      .toDF("detID", "intID", "curDateTime", "intName", "detName", "volume", "occupancy", "speed")
      .selectExpr("cast(detID as int) detID", "cast(intID as long) intID", "curDateTime",
        "intName", "detName", "cast(volume as int) volume",
        "cast(occupancy as int) occupancy", "cast(speed as int) speed")
    val unit = Seq((100L, 77, "LAMAR_KOENIG", "LOC_1"))
      .toDF("kits_id", "atd_device_id", "device_name", "atd_location_id")

    val std = Pipelines.Wt.standardize(raw)
    // 08:00 US/Central (CST, UTC-6) = 14:00 UTC
    val t = std.select("timestamp").as[Timestamp].head()
    assert(t == Timestamp.valueOf("2020-01-15 14:00:00"))

    val ready = Pipelines.Wt.ready(std, unit)
    assert(ready.count() == 2)
    assert(ready.select("device_id").distinct().count() == 1)

    val pub = Pipelines.Wt.publish(ready)
    val row = pub.filter($"direction" === "NB").head()
    assert(row.getAs[String]("time_bin") == "14:00")
    assert(row.getAs[Int]("day_of_week") == 3) // 2020-01-15 is a Wednesday
    assert(row.getAs[String]("record_id").length == 32)
    // deterministic publish key: same inputs → same id
    assert(Pipelines.Wt.publish(ready).filter($"direction" === "NB").head()
      .getAs[String]("record_id") == row.getAs[String]("record_id"))
  }

  test("bt slice: double dim join + daily first-seen pseudonymization") {
    val devices = Pipelines.Bt.deviceDim(
      Seq((1, "r1"), (2, "r2"), (3, "r3")).toDF("atd_device_id", "device_name"))
    val matched = Seq(
      ("AbC=", "r1", "r2", "01/15/2020 08:05:00 AM", "01/15/2020 08:09:00 AM", 240, 35, "valid", 1),
      ("DeF=", "r2", "r3", "01/15/2020 08:06:00 AM", "01/15/2020 08:11:00 AM", 300, 30, "valid", 1))
      .toDF("dev_addr", "origin_reader_id", "dest_reader_id", "start_time", "end_time",
        "travel_time_secs", "speed", "match_validity", "filter_id")
    val ready = Pipelines.Bt.readyMatched(Pipelines.Bt.standardizeMatched(matched), devices)
    assert(ready.select("origin_device_id", "dest_device_id").distinct().count() == 2)

    val used = Pipelines.Bt.usedDevices(devices, ready)
    assert(used.count() == 3) // r1, r2, r3 all referenced

    val unmatchedRaw = Seq(
      ("01/15/2020 08:00:01 AM", "10.0.0.1", "01/15/2020 08:00:00 AM", "r1", "AbC="),
      ("01/15/2020 08:00:05 AM", "10.0.0.1", "01/15/2020 08:00:04 AM", "r1", "DeF="),
      ("01/16/2020 08:00:00 AM", "10.0.0.1", "01/15/2020 07:59:59 AM", "r1", "DeF="))
      .toDF("host_timestamp", "ip_address", "field_timestamp", "reader_id", "dev_addr")
    val pub = Pipelines.Bt.publishUnmatched(
      Pipelines.Bt.readyUnmatched(Pipelines.Bt.standardizeUnmatched(unmatchedRaw), devices))
    val byAddr = pub.select(
      to_date(col("host_timestamp")).cast("string"), col("device_number"))
      .as[(String, Int)].collect().toSet
    // day 1: AbC first (num 1), DeF second (num 2); day 2: DeF resets to 1
    assert(byAddr == Set(("2020-01-15", 1), ("2020-01-15", 2), ("2020-01-16", 1)))
  }

  test("gs slice: v8 timestamp + drift + day_covered + agg15") {
    // site clock runs 30 min behind host: drift = +1800 s
    val drift = Pipelines.Gs.driftSeconds(
      lit("2020-01-15 07:30:00"), lit("2020-01-15 08:00:00"))

    val raw = Seq(
      // HHMMSS.f seconds-since-midnight local; utc_offset -360 (US/Central)
      (8, "s1", 80000.5, -360, "S", 12.0, 35.0, "G", 2.5, 1, 1.0, 5.0, 30.0, 30.0, "z1"),
      (8, "s1", 80001.0, -360, "L", 25.0, 20.0, "R", 3.0, 1, 1.0, 5.0, 30.0, 30.0, "z1"),
      // 23:59:30 local + 6h offset + 30 min drift → lands on the NEXT day
      (8, "s1", 235930.0, -360, "S", 10.0, 40.0, "G", 1.0, 1, 1.0, 5.0, 30.0, 30.0, "z1"))
      .toDF("count_version", "site_version", "timestamp", "utc_offset", "turn",
        "vehicle_length", "speed", "light_state", "seconds_in_zone",
        "vehicles_in_zone", "light_state_sec", "sec_since_green",
        "zone_freeflow_speed", "zone_freeflow_speed_cal", "zone")

    val std = Pipelines.Gs.standardizeV8(raw, lit("2020-01-15"), drift)
    val times = std.select(col("timestamp_adj").cast("string"), col("day_covered"))
      .as[(String, Int)].collect().toSet
    // 08:00:00.5 local = 14:00:00.5 UTC + 1800 s drift = 14:30:00.5
    assert(times.contains(("2020-01-15 14:30:00.5", 0)))
    assert(times.exists { case (t, d) => t.startsWith("2020-01-16") && d == 1 })

    // day-completion window keeps only Jan 15 events
    assert(Pipelines.Gs.dayWindow(std, lit("2020-01-15")).count() == 2)

    val movements = Seq(("z1", "Northbound", "Straight"))
      .toDF("zone", "zone_approach", "turn_type")
    val agg = Pipelines.Gs.agg15(
      Pipelines.Gs.dayWindow(std, lit("2020-01-15")), movements)
    // two groups: (S, light 12 ft) and (L, heavy 25 ft), same 14:30 bucket
    val rows = agg.orderBy("turn").collect()
    assert(rows.length == 2)
    val l = rows(0) // turn L
    val s = rows(1) // turn S
    assert(l.getAs[Int]("heavy_vehicle") == 1 && l.getAs[Long]("volume") == 1L)
    assert(l.getAs[Double]("speed_std") == 0.0) // single-row group → 0, not null
    assert(s.getAs[Int]("heavy_vehicle") == 0 && s.getAs[Double]("speed_avg") == 35.0)
  }

  test("ready stages carry no mid-chain global sort; ordering lives at the write edge") {
    val raw = Seq(
      ("1", "100", "2020-01-15 08:05:00", "X", "NB_1", "1", "1", "30"),
      ("2", "100", "2020-01-15 08:00:00", "X", "SB_1", "1", "1", "30"))
      .toDF("detID", "intID", "curDateTime", "intName", "detName", "volume", "occupancy", "speed")
      .selectExpr("cast(detID as int) detID", "cast(intID as long) intID", "curDateTime",
        "intName", "detName", "cast(volume as int) volume",
        "cast(occupancy as int) occupancy", "cast(speed as int) speed")
    val unit = Seq((100L, 77, "X_D", "LOC_1"))
      .toDF("kits_id", "atd_device_id", "device_name", "atd_location_id")
    val ready = Pipelines.Wt.ready(Pipelines.Wt.standardize(raw), unit)

    // the reference's O2 ordering moved to the sink: the ready plan itself
    // must not range-exchange (a mid-chain global sort is wasted work)
    val plan = ready.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), s"unexpected range exchange in:\n$plan")

    // write-edge ordering reproduces O2 exactly
    val ordered = graft.sinks.Sinks.ordered(ready, col("timestamp"), col("detID"))
    assert(ordered.select("detID").as[Int].collect().toSeq == Seq(2, 1))
  }

  test("gs zone movements: unconfigured cameras and excluded zones drop") {
    val json = Files.createTempFileContent(
      """{"header": {"data_type": "gs_site", "device_net_addr": "10.0.0.9"},
        |"site": {"Id": "site1", "CameraDevices": [
        |  {"Fisheye": {"IsConfigured": true, "MACAddress": "m1", "CameraMasks": {"ZoneMasks": [
        |    {"Vehicle": {"Id": "aaaa-bbbb", "ApproachType": "Northbound", "TurnType": "S", "IncludeInData": true, "NumberOfLanes": 2}},
        |    {"Vehicle": {"Id": "cccc-dddd", "ApproachType": "Southbound", "TurnType": "L", "IncludeInData": false, "NumberOfLanes": 1}},
        |    {}]}}},
        |  {"Fisheye": {"IsConfigured": false, "MACAddress": "m2", "CameraMasks": {"ZoneMasks": [
        |    {"Vehicle": {"Id": "eeee-ffff", "ApproachType": "Eastbound", "TurnType": "R", "IncludeInData": true, "NumberOfLanes": 1}}]}}}],
        | "Location": {"Street1": "A St", "Street2": "B Ave", "Latitude": 30.3, "Longitude": -97.7}},
        |"datetime": {"DateTime": "2020-01-15 07:30:00", "TimeZoneId": "CST", "HostTimeUTC": "2020-01-15 08:00:00"}}""".stripMargin)
    val site = spark.read.schema(Schemas.gsSite).option("multiLine", "true").json(json)
    val mv = Pipelines.Gs.zoneMovements(site)
    val got = mv.as[(String, String, String)].collect().toSet
    assert(got == Set(("aaaabbbb", "Northbound", "S")))
  }

  object Files {
    def createTempFileContent(content: String): String = {
      val p = java.nio.file.Files.createTempFile("graft_fix_", ".json")
      java.nio.file.Files.writeString(p, content)
      p.toString
    }
  }
}
