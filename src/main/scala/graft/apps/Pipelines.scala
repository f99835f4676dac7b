package graft.apps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Functions
import graft.ops.{AsOf, Publish, TrafficAgg}

/** The reference's ETL stage chains (SURVEY §3), re-expressed as pure
  * DataFrame → DataFrame functions: standardize (parse/type/tz), ready
  * (dimension joins + surrogate ids), publish (recodes + idempotent keys).
  * Apps are thin compositions — every operator lives in `graft.ops`.
  *
  * Timezone policy (SURVEY §7.5 risk 1): raw feeds carry naive US/Central
  * wall-clock strings; standardize pins them to UTC instants via
  * `to_utc_timestamp(..., "America/Chicago")` once, at the edge. Everything
  * downstream is UTC.
  */
object Pipelines {

  val LocalTz = "America/Chicago"

  /** Surrogate device id (reference bt_ready.py:81-88, wt_ready.py:77-84):
    * md5 over the natural device identity.
    */
  private def deviceSurrogate: Column =
    md5(concat_ws("_", col("atd_device_id"), col("device_name")))

  private def centralToUtc(c: Column, fmt: String): Column =
    to_utc_timestamp(to_timestamp(c, fmt), LocalTz)

  /** Wavetronix (SURVEY §7.3 — the canonical end-to-end slice). */
  object Wt {

    /** Standardize (reference `wt_json_standard.py:95-109`): parse
      * `"%Y-%m-%d %H:%M:%S"` local timestamps, type the counters.
      */
    def standardize(raw: DataFrame): DataFrame =
      raw.withColumn("timestamp", centralToUtc(col("curDateTime"), "yyyy-MM-dd HH:mm:ss"))
        .drop("curDateTime")

    /** Ready (reference `wt_ready.py:77-111`): equi join to unit data on
      * `intID = kits_id` (J4), trim the embedded dimension to used devices
      * (U2), surrogate md5 device ids (§2.10). The reference's O2 output
      * ordering (`wt_ready.py:103`) lives at the write edge
      * (`Sinks.ordered(df, col("timestamp"), col("detID"))`) — a mid-chain
      * global sort is a wasted range exchange that downstream operators
      * destroy anyway.
      */
    def ready(std: DataFrame, unitData: DataFrame): DataFrame = {
      val dim = broadcast(unitData
        .withColumn("device_id", deviceSurrogate)
        .select(col("kits_id"), col("device_id"), col("device_name"), col("atd_location_id")))
      std.join(dim, col("intID") === col("kits_id"), "inner")
        .drop("kits_id")
    }

    /** Publish projection (reference `wt_extract_soc.py:62-86`): direction
      * from the detName prefix, date parts, Sunday=0 weekday, 15-min
      * timebin, md5 record id.
      */
    def publish(ready: DataFrame): DataFrame =
      ready.select(
        col("atd_location_id"),
        col("intName").as("intersection_name"),
        split(col("detName"), "_").getItem(0).as("direction"),
        col("volume"), col("occupancy"), col("speed"),
        col("timestamp"),
        year(col("timestamp")).as("year"),
        month(col("timestamp")).as("month"),
        dayofmonth(col("timestamp")).as("day"),
        hour(col("timestamp")).as("hour"),
        minute(col("timestamp")).as("minute"),
        Functions.dayOfWeekSun0(col("timestamp")).as("day_of_week"),
        Functions.timeBin15(col("timestamp")).as("time_bin"),
        Functions.recordId(col("intID"), col("detID"), col("timestamp").cast("string"))
          .as("record_id"))
  }

  /** Bluetooth. */
  object Bt {

    private val TsFmt = "M/d/yyyy h:mm:ss a" // reference bt_json_standard.py:90-97
    private val TsFmtShort = "M/d/yyyy h:mm a" // reference bt_json_standard.py:98-104

    /** Standardize unmatched/IAF: parse both timestamp columns; unparseable
      * timestamps null out (reference nulls and logs,
      * `bt_json_standard.py:90-104` — `to_timestamp` already yields null on
      * mismatch with the lenient parser policy).
      */
    def standardizeUnmatched(raw: DataFrame): DataFrame =
      raw
        .withColumn("host_timestamp", centralToUtc(col("host_timestamp"), TsFmt))
        .withColumn("field_timestamp", centralToUtc(col("field_timestamp"), TsFmt))

    def standardizeMatched(raw: DataFrame): DataFrame =
      raw
        .withColumn("start_time", centralToUtc(col("start_time"), TsFmt))
        .withColumn("end_time", centralToUtc(col("end_time"), TsFmt))

    def standardizeTmsr(raw: DataFrame): DataFrame =
      raw.withColumn("timestamp", centralToUtc(col("timestamp"), TsFmtShort))

    /** Device dimension with surrogate ids (reference `bt_ready.py:81-88`). */
    def deviceDim(unitData: DataFrame): DataFrame =
      unitData.withColumn("device_id", deviceSurrogate)

    /** Ready unmatched (reference `bt_ready.py:99-110`): J2 equi join
      * `reader_id = device_name`; U2 dimension trimming is the caller's
      * `usedDevices` semi-join. The O1 ordering (`bt_ready.py:108`) is
      * applied at the write edge via `Sinks.ordered`.
      */
    def readyUnmatched(std: DataFrame, devices: DataFrame): DataFrame =
      std.join(
          broadcast(devices.select(col("device_name"), col("device_id"))),
          col("reader_id") === col("device_name"), "inner")
        .drop("device_name")

    /** Ready matched (reference `bt_ready.py:112-122`): J3 double dim join —
      * devices joined once per edge endpoint.
      */
    def readyMatched(std: DataFrame, devices: DataFrame): DataFrame = {
      val origin = broadcast(devices.select(
        col("device_name").as("origin_name"), col("device_id").as("origin_device_id")))
      val dest = broadcast(devices.select(
        col("device_name").as("dest_name"), col("device_id").as("dest_device_id")))
      std.join(origin, col("origin_reader_id") === col("origin_name"), "inner")
        .join(dest, col("dest_reader_id") === col("dest_name"), "inner")
        .drop("origin_name", "dest_name")
      // O1 ordering (`bt_ready.py:120-122`) applies at the write edge
    }

    /** Trim the embedded dimension to devices actually referenced (U1+U2,
      * reference `bt_ready.py:110,124-126`).
      */
    def usedDevices(devices: DataFrame, readyMatchedDf: DataFrame): DataFrame = {
      val used = readyMatchedDf.select(col("origin_device_id").as("device_id"))
        .union(readyMatchedDf.select(col("dest_device_id")))
        .distinct()
      devices.join(used, Seq("device_id"), "left_semi")
    }

    /** Publish unmatched (reference `bt_extract_soc.py:73-135`): W1 daily
      * first-seen counter pseudonymizes device addresses, plus record ids.
      */
    def publishUnmatched(ready: DataFrame): DataFrame = {
      val counter = Publish.firstSeenCounter(ready, "host_timestamp", "dev_addr")
        .select(col("day"), col("dev_addr").as("_cd"), col("daily_counter"))
      ready
        .withColumn("day", to_date(col("host_timestamp")))
        .join(counter, col("dev_addr") === col("_cd") &&
          to_date(col("host_timestamp")) === counter("day"))
        .select(
          col("host_timestamp"),
          col("reader_id"),
          col("daily_counter").as("device_number"),
          date_format(col("host_timestamp"), "EEEE").as("day_name"),
          Functions.recordId(col("reader_id"), col("host_timestamp").cast("string"),
            col("daily_counter")).as("record_id"))
    }
  }

  /** GRIDSMART. */
  object Gs {

    /** v8 timestamp reconstruction (reference `gs_json_standard.py:253-260`;
      * SURVEY §2.10): the raw `timestamp` is an `HHMMSS.f` float
      * (seconds-since-midnight, digit-encoded); combine with the collection
      * date, subtract the `utc_offset` minutes, add the site clock-drift
      * `driftSeconds` → UTC event time `timestamp_adj`.
      */
    def v8Timestamp(dateCol: Column, hhmmss: Column, utcOffsetMin: Column,
        driftSeconds: Column): Column = {
      val hh = floor(hhmmss / 10000)
      val mm = floor(hhmmss % 10000 / 100)
      val ss = hhmmss % 100
      val secondsOfDay = hh * 3600 + mm * 60 + ss
      timestamp_seconds(
        unix_timestamp(dateCol.cast("timestamp")) + secondsOfDay -
          utcOffsetMin * 60 + driftSeconds)
    }

    /** Clock-drift seconds from the site file's device-vs-host clock pair
      * (reference `gs_json_standard.py:179-191`; `docs/datasrc_gs.md:217-227`).
      */
    def driftSeconds(deviceTime: Column, hostTimeUtc: Column): Column =
      unix_timestamp(hostTimeUtc) - unix_timestamp(deviceTime)

    /** Standardize v8 counts for one (site, date): adjusted UTC timestamps
      * + day_covered marker (-1/0/+1 when the adjusted time falls on the
      * previous/same/next day vs the collection date, reference
      * `gs_json_standard.py:226-247`).
      */
    def standardizeV8(
        raw: DataFrame, collectionDate: Column, drift: Column): DataFrame =
      raw
        .withColumn("timestamp_adj",
          v8Timestamp(collectionDate, col("timestamp"), col("utc_offset"), drift))
        .withColumn("day_covered",
          datediff(to_date(col("timestamp_adj")), collectionDate.cast("date")))

    /** Day-completion filter (SURVEY §2.9 / §7.5 risk 6): given counts read
      * from date±1 partitions, keep exactly the 24 h window of `day`
      * (replaces the reference's imperative adjacent-day fetch,
      * `gs_ready.py:244-281,330-339`).
      */
    def dayWindow(counts: DataFrame, day: Column): DataFrame =
      counts.filter(
        col("timestamp_adj") >= day.cast("timestamp") &&
          col("timestamp_adj") < date_add(day.cast("date"), 1).cast("timestamp"))

    /** Zone → movement join (J6, reference `gs_ready_agg.py:60-74`): attach
      * approach/turn config from the site's zone masks; F8 keeps configured
      * vehicle zones only.
      */
    def zoneMovements(site: DataFrame): DataFrame =
      site.select(explode(col("site.CameraDevices")).as("cam"))
        .filter(col("cam.Fisheye.IsConfigured"))
        .select(explode(col("cam.Fisheye.CameraMasks.ZoneMasks")).as("zm"))
        .filter(col("zm.Vehicle").isNotNull && col("zm.Vehicle.IncludeInData"))
        .select(
          lower(regexp_replace(col("zm.Vehicle.Id"), "-", "")).as("zone"),
          col("zm.Vehicle.ApproachType").as("zone_approach"),
          col("zm.Vehicle.TurnType").as("turn_type"))

    /** The flagship A1 aggregation (reference `gs_ready_agg.py:69-92`):
      * counts ⋈ zone movements → 15-min × (approach, turn, heavy) stats.
      * `heavy_vehicle` = length ≥ 17 ft (reference `gs_ready_agg.py:70`,
      * `docs/datasrc_gs.md:423`).
      */
    def agg15(counts: DataFrame, movements: DataFrame, freqSeconds: Int = 900): DataFrame = {
      val joined = counts
        .withColumn("zone", lower(regexp_replace(col("zone"), "-", "")))
        .join(broadcast(movements), Seq("zone"))
        .withColumn("heavy_vehicle", (col("vehicle_length") >= 17).cast("int"))
      TrafficAgg.aggregate(
        joined, "timestamp_adj",
        dims = Seq("zone_approach", "turn", "heavy_vehicle"),
        measures = Seq("speed", "seconds_in_zone"),
        freqSeconds = freqSeconds)
    }

    /** Publish recodes (reference `gs_agg_extract_soc.py:78-131`). */
    def publishAgg(agg: DataFrame, siteName: Column): DataFrame =
      agg
        .withColumn("approach", Publish.approachRecode(col("zone_approach")))
        .filter(col("approach").isNotNull)
        .withColumn("movement", Publish.turnRecode(col("turn")))
        .select(
          siteName.as("intersection_name"),
          col("bucket_start").as("timestamp"),
          col("approach"), col("movement"), col("heavy_vehicle"),
          col("volume"), col("speed_avg"), col("speed_std"),
          col("seconds_in_zone_avg"), col("seconds_in_zone_std"),
          Functions.dayOfWeekSun0(col("bucket_start")).as("day_of_week"),
          Functions.recordId(siteName, col("bucket_start").cast("string"),
            col("zone_approach"), col("turn"), col("heavy_vehicle")).as("record_id"))
  }
}
