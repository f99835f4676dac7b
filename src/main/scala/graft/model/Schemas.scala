package graft.model

import org.apache.spark.sql.types._

/** Declared schemas for every reference file type (SURVEY §1.3): the
  * reference hard-codes ordered column lists per format (bt
  * `bt_json_standard.py:111-125`, wt `wt_json_standard.py:98-109`, gs
  * `gs_json_standard.py:126-154`, unit data
  * `unitdata_knack_common.py:13-27,92-99`); this engine declares them as
  * `StructType`s so scans are typed end-to-end and Catalyst can prune.
  */
object Schemas {

  /** Bluetooth IAF "unmatched" raw CSV — headerless, 5 columns
    * (reference `bt_json_standard.py:111-114`; `docs/datasrc_bt.md:16-23`).
    * Timestamps arrive as `"%m/%d/%Y %I:%M:%S %p"` strings and are parsed
    * by the standardize stage, not the scan.
    */
  val btUnmatchedRaw: StructType = StructType(Seq(
    StructField("host_timestamp", StringType),
    StructField("ip_address", StringType),
    StructField("field_timestamp", StringType),
    StructField("reader_id", StringType),
    StructField("dev_addr", StringType)))

  /** Bluetooth ITMF "matched" raw CSV — 9 columns
    * (reference `bt_json_standard.py:116-119`; `docs/datasrc_bt.md:181-208`).
    */
  val btMatchedRaw: StructType = StructType(Seq(
    StructField("dev_addr", StringType),
    StructField("origin_reader_id", StringType),
    StructField("dest_reader_id", StringType),
    StructField("start_time", StringType),
    StructField("end_time", StringType),
    StructField("travel_time_secs", IntegerType),
    StructField("speed", IntegerType),
    StructField("match_validity", StringType),
    StructField("filter_id", IntegerType)))

  /** Bluetooth TMSR "traf_match_summary" raw CSV — 15 columns
    * (reference `bt_json_standard.py:121-125`; `docs/datasrc_bt.md:339-372`).
    */
  val btTmsrRaw: StructType = StructType(Seq(
    StructField("origin_reader_id", StringType),
    StructField("dest_reader_id", StringType),
    StructField("origin_road", StringType),
    StructField("origin_cross_st", StringType),
    StructField("origin_dir", StringType),
    StructField("dest_road", StringType),
    StructField("dest_cross_st", StringType),
    StructField("dest_dir", StringType),
    StructField("seg_length", DoubleType),
    StructField("timestamp", StringType),
    StructField("avg_travel_time", IntegerType),
    StructField("avg_speed", IntegerType),
    StructField("interval", IntegerType),
    StructField("samples", IntegerType),
    StructField("std_dev", DoubleType)))

  /** Wavetronix daily CSV — headered
    * (reference `wt_json_standard.py:98-109`; `docs/datasrc_wt.md:12-21`).
    */
  val wtRaw: StructType = StructType(Seq(
    StructField("detID", IntegerType),
    StructField("intID", LongType),
    StructField("curDateTime", StringType),
    StructField("intName", StringType),
    StructField("detName", StringType),
    StructField("volume", IntegerType),
    StructField("occupancy", IntegerType),
    StructField("speed", IntegerType),
    StructField("status", StringType),
    StructField("uploadSuccess", IntegerType),
    StructField("detCountComparison", IntegerType),
    StructField("dailyCumulative", IntegerType)))

  /** GRIDSMART counts CSV v8 — headerless, 14 columns; `timestamp` is an
    * `HHMMSS.f` seconds-since-midnight float (reference
    * `gs_json_standard.py:134-140`; `docs/datasrc_gs.md:16-33`).
    */
  val gsCountsV8: StructType = StructType(Seq(
    StructField("count_version", IntegerType),
    StructField("site_version", StringType),
    StructField("timestamp", DoubleType),
    StructField("utc_offset", IntegerType),
    StructField("turn", StringType),
    StructField("vehicle_length", DoubleType),
    StructField("speed", DoubleType),
    StructField("light_state", StringType),
    StructField("seconds_in_zone", DoubleType),
    StructField("vehicles_in_zone", IntegerType),
    StructField("light_state_sec", DoubleType),
    StructField("sec_since_green", DoubleType),
    StructField("zone_freeflow_speed", DoubleType),
    StructField("zone_freeflow_speed_cal", DoubleType)))

  /** GRIDSMART v7: v8 minus the calibrated freeflow column (reference
    * `gs_json_standard.py:141-145`).
    */
  val gsCountsV7: StructType =
    StructType(gsCountsV8.fields.dropRight(1))

  /** GRIDSMART v4 — 16 columns, ISO-ish timestamp string (reference
    * `gs_json_standard.py:146-152`).
    */
  val gsCountsV4: StructType = StructType(Seq(
    StructField("count_version", IntegerType),
    StructField("site_version", StringType),
    StructField("timestamp", StringType),
    StructField("internal_veh_id", StringType),
    StructField("internal_veh_type", StringType),
    StructField("vehicle_length", DoubleType),
    StructField("speed", DoubleType),
    StructField("turn", StringType),
    StructField("allowable_turns", StringType),
    StructField("seconds_in_zone", DoubleType),
    StructField("seconds_since_last_exit", DoubleType),
    StructField("queue_length", DoubleType),
    StructField("light_state_on_exit", StringType),
    StructField("sec_since_green", DoubleType),
    StructField("internal_frame_count", LongType),
    StructField("day_night", StringType)))

  /** Unit-data dimension record (reference
    * `drivers/devices/unitdata_knack_common.py:102-121`;
    * `docs/datasrc_bt.md:75-99`). `kits_id` only for wt.
    */
  val unitDevice: StructType = StructType(Seq(
    StructField("device_type", StringType),
    StructField("atd_device_id", IntegerType),
    StructField("device_name", StringType),
    StructField("device_status", StringType),
    StructField("device_ip", StringType),
    StructField("ip_comm_status", StringType),
    StructField("atd_location_id", StringType),
    StructField("coa_intersection_id", LongType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("primary_st", StringType),
    StructField("primary_st_segment_id", LongType),
    StructField("cross_st", StringType),
    StructField("cross_st_segment_id", LongType),
    StructField("kits_id", LongType)))

  /** Catalog row (reference `docs/tech_architecture.md:121-138`, DDL
    * `docs/appendix_catalog.md:77-99`). `metadata` kept as a JSON string.
    */
  val catalog: StructType = StructType(Seq(
    StructField("repository", StringType, nullable = false),
    StructField("data_source", StringType, nullable = false),
    StructField("id_base", StringType, nullable = false),
    StructField("id_ext", StringType, nullable = false),
    StructField("pointer", StringType),
    StructField("collection_date", TimestampType, nullable = false),
    StructField("collection_end", TimestampType),
    StructField("processing_date", TimestampType),
    StructField("metadata", StringType)))

  /** GRIDSMART site file, trimmed to the consumed paths (reference
    * `docs/datasrc_gs.md:72-148`; traversal `gs_ready_agg.py:61-66`,
    * `gs_ready.py:119-233`).
    */
  val gsSite: StructType = {
    val zoneMask = StructType(Seq(
      StructField("Vehicle", StructType(Seq(
        StructField("Id", StringType),
        StructField("ApproachType", StringType),
        StructField("TurnType", StringType),
        StructField("IncludeInData", BooleanType),
        StructField("NumberOfLanes", IntegerType))))))
    val fisheye = StructType(Seq(
      StructField("IsConfigured", BooleanType),
      StructField("MACAddress", StringType),
      StructField("CameraMasks", StructType(Seq(
        StructField("ZoneMasks", ArrayType(zoneMask)))))))
    StructType(Seq(
      StructField("header", StructType(Seq(
        StructField("data_type", StringType),
        StructField("device_net_addr", StringType),
        StructField("collection_date", StringType)))),
      StructField("site", StructType(Seq(
        StructField("Id", StringType),
        StructField("CameraDevices", ArrayType(StructType(Seq(
          StructField("Fisheye", fisheye))))),
        StructField("Location", StructType(Seq(
          StructField("Street1", StringType),
          StructField("Street2", StringType),
          StructField("Latitude", DoubleType),
          StructField("Longitude", DoubleType))))))),
      StructField("datetime", StructType(Seq(
        StructField("DateTime", StringType),
        StructField("TimeZoneId", StringType),
        StructField("HostTimeUTC", StringType))))))
  }
}
