package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle coverage for the COMPOSED GRIDSMART ready stage
  * (graft.apps.GsReady — reference `gs_ready.py:106-317` `_processDay`):
  * backward as-of site snapshots, clock-drift application, v8 timestamp
  * reconstruction with adjusted-day regrouping, and the 4-stage device
  * cascade — end to end in one query, checked against a DuckDB
  * recomputation.
  *
  * The fixture is derived deterministically from the driver's tables:
  * 25 sites from `nation`, counts from `events`. Street names are
  * md5-derived hex (max cross-site Ratcliff–Obershelp ratio 0.52, verified
  * offline, so the fuzzy stage's ≥0.7 matches are exactly the
  * equal-string pairs and the oracle can express the fuzzy stage as an
  * equality join). Site k mod 5 selects the resolution path:
  * 0 → device IP equality, 1 → nearest-geo (< 300 ft), 2 → unmatched,
  * 3/4 → fuzzy street match. The curated-lookup stage (J9) is covered
  * separately by q_j14_map_lookup.
  */
object QueriesGsReady {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** One row per site: id, md5-hex streets, net addr, coordinates, group. */
  private def siteBase(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation").select(
      col("n_nationkey").cast("int").as("k"),
      concat(lit("site_"), col("n_nationkey").cast("string")).as("base"),
      substring(md5(concat(lit("st1:"), col("n_nationkey").cast("string"))), 1, 12).as("st1"),
      substring(md5(concat(lit("st2:"), col("n_nationkey").cast("string"))), 1, 12).as("st2"),
      concat(lit("10.0.0."), col("n_nationkey").cast("string")).as("net_addr"),
      (lit(30.0) + col("n_nationkey") * 0.01).as("lat"),
      (lit(-97.0) - col("n_nationkey") * 0.01).as("lon"),
      (col("n_nationkey") % 5).cast("int").as("grp"))

  /** Two snapshots per site: an early one whose device clock runs 30 min
    * behind its host (drift +1800 s) and a 2024-01-16 one with zero drift —
    * so the backward as-of genuinely switches snapshots mid-range.
    */
  private def siteSnaps(s: SparkSession, dir: String): DataFrame =
    siteBase(s, dir)
      .select(
        col("base"), col("st1"), col("st2"), col("net_addr"), col("lat"), col("lon"),
        explode(array(
          struct(
            lit("2000-01-01 00:00:00").as("sd"),
            lit("2000-01-01 07:30:00").as("dt"),
            lit("2000-01-01 08:00:00").as("ht")),
          struct(
            lit("2024-01-16 00:00:00").as("sd"),
            lit("2024-01-16 08:00:00").as("dt"),
            lit("2024-01-16 08:00:00").as("ht")))).as("sn"))
      .select(
        col("base"),
        col("sn.sd").cast("timestamp").as("snap_date"),
        col("st1").as("street1"), col("st2").as("street2"),
        col("net_addr"), col("lat"), col("lon"),
        col("sn.dt").as("device_time"), col("sn.ht").as("host_time_utc"))

  /** Device dimension: group 0 shares the site's IP (garbage streets, far
    * away); group 1 sits ~73 ft from its site (garbage streets, wrong IP);
    * group 2 matches nothing; groups 3/4 carry the site's exact streets.
    */
  private def devices(s: SparkSession, dir: String): DataFrame =
    siteBase(s, dir).select(
      concat(lit("d_"), col("k").cast("string")).as("device_id"),
      when(col("grp").isin(0, 1, 2), concat(lit("qqq"), col("k").cast("string")))
        .otherwise(col("st1")).as("primary_st"),
      when(col("grp").isin(0, 1, 2), concat(lit("zzz"), col("k").cast("string")))
        .otherwise(col("st2")).as("cross_st"),
      when(col("grp") === 0, col("net_addr"))
        .otherwise(concat(lit("10.1.0."), col("k").cast("string"))).as("device_ip"),
      when(col("grp") === 1, col("lat") + 0.0002).otherwise(col("lat") + 1.0).as("lat"),
      col("lon"))

  /** v8-shaped counts from `events`: the nominal collection day plus the
    * HHMMSS seconds-since-midnight float the GRIDSMART camera emits.
    */
  private def counts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      concat(lit("site_"), pmod(col("user_id"), lit(25)).cast("string")).as("base"),
      to_date(col("ts")).cast("timestamp").as("collection_date"),
      (hour(col("ts")) * 10000 + minute(col("ts")) * 100 + second(col("ts")))
        .cast("double").as("timestamp"),
      lit(-360).as("utc_offset"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F7: per-day time window over adjusted timestamps (reference
    // gs_ready.py:330-339 — the 24h keep-filter when merging adjacent days)
    "q_f7_daywindow" -> ((s, dir) =>
      graft.apps.Pipelines.Gs.dayWindow(
        t(s, dir, "events")
          .select(col("event_id"), Functions.toSecond(col("ts")).as("timestamp_adj")),
        lit("2024-01-15"))),

    // F9 + §2.10 conditional recodes: approach whitelist + turn labels
    // (reference gs_agg_extract_soc.py:78-104)
    "q_f9_recode" -> ((s, dir) =>
      t(s, dir, "events")
        .select(
          col("event_id"),
          element_at(
            array(lit("Northbound"), lit("Southbound"), lit("Unassigned3"), lit("Weird")),
            (pmod(col("event_id"), lit(4)) + 1).cast("int")).as("raw_approach"),
          element_at(
            array(lit("S"), lit("L"), lit("R"), lit("U"), lit("X")),
            (pmod(col("event_id"), lit(5)) + 1).cast("int")).as("raw_turn"))
        .select(
          col("event_id"),
          graft.ops.Publish.approachRecode(col("raw_approach")).as("approach"),
          graft.ops.Publish.turnRecode(col("raw_turn")).as("movement"))
        .filter(col("approach").isNotNull)),

    // J4: equi join on an md5 surrogate key (reference wt_ready.py:77-102 —
    // the surrogate is derived, then joined on the natural key)
    "q_j4_surrogate" -> ((s, dir) => {
      val dim = t(s, dir, "customer").select(
        col("c_custkey").as("kits_id"),
        md5(concat_ws("_", col("c_custkey").cast("string"), col("c_name"))).as("device_id"),
        col("c_name").as("device_name"))
      t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(broadcast(dim), col("o_custkey") === col("kits_id"))
        .select("o_orderkey", "o_custkey", "device_id", "device_name")
    }),

    "q_gs_ready" -> ((s, dir) =>
      graft.apps.GsReady
        .ready(counts(s, dir), siteSnaps(s, dir), devices(s, dir))
        .select(
          col("event_id"), col("base"), col("timestamp_adj"), col("event_day"),
          col("device_id"), col("resolution_stage"))))

  val oracles: Map[String, String] = Map(
    "q_f7_daywindow" ->
      """SELECT event_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS timestamp_adj
        |FROM events
        |WHERE date_trunc('second', ts) >= TIMESTAMP '2024-01-15 00:00:00'
        |  AND date_trunc('second', ts) < TIMESTAMP '2024-01-16 00:00:00'""".stripMargin,
    "q_f9_recode" ->
      """WITH raw AS (
        |  SELECT event_id,
        |    ['Northbound','Southbound','Unassigned3','Weird'][CAST(event_id % 4 AS INT) + 1] AS ra,
        |    ['S','L','R','U','X'][CAST(event_id % 5 AS INT) + 1] AS rt
        |  FROM events)
        |SELECT event_id,
        |  CASE WHEN ra IN ('Northbound','Southbound','Eastbound','Westbound') THEN ra
        |       WHEN ra LIKE 'Unassigned%' THEN 'Unassigned' END AS approach,
        |  CASE rt WHEN 'S' THEN 'straight' WHEN 'L' THEN 'left turn'
        |          WHEN 'R' THEN 'right turn' WHEN 'U' THEN 'u turn' END AS movement
        |FROM raw
        |WHERE ra IN ('Northbound','Southbound','Eastbound','Westbound')
        |   OR ra LIKE 'Unassigned%'""".stripMargin,
    "q_j4_surrogate" ->
      """SELECT o_orderkey, o_custkey,
        |  md5(CAST(c_custkey AS VARCHAR) || '_' || c_name) AS device_id,
        |  c_name AS device_name
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q_gs_ready" ->
      """WITH site AS (
        |  SELECT CAST(n_nationkey AS INT) AS k, 'site_' || n_nationkey AS base,
        |    n_nationkey % 5 AS grp
        |  FROM nation),
        |snaps AS (
        |  SELECT base, TIMESTAMP '2000-01-01 00:00:00' AS snap_date,
        |    CAST(epoch(TIMESTAMP '2000-01-01 08:00:00')
        |      - epoch(TIMESTAMP '2000-01-01 07:30:00') AS BIGINT) AS drift_s
        |  FROM site
        |  UNION ALL
        |  SELECT base, TIMESTAMP '2024-01-16 00:00:00', 0 FROM site),
        |cnt AS (
        |  SELECT event_id, 'site_' || (user_id % 25) AS base,
        |    CAST(CAST(ts AS DATE) AS TIMESTAMP) AS collection_date,
        |    date_part('hour', ts) * 3600 + date_part('minute', ts) * 60
        |      + date_part('second', ts) AS sod
        |  FROM events),
        |drift AS (
        |  SELECT i.base, i.collection_date, s.drift_s
        |  FROM (SELECT DISTINCT base, collection_date FROM cnt) i
        |  JOIN snaps s ON s.base = i.base AND s.snap_date <= i.collection_date
        |  QUALIFY row_number() OVER (PARTITION BY i.base, i.collection_date
        |    ORDER BY s.snap_date DESC) = 1),
        |adj AS (
        |  SELECT c.event_id, c.base,
        |    make_timestamp((CAST(epoch(c.collection_date) AS BIGINT) + CAST(c.sod AS BIGINT)
        |      + 21600 + d.drift_s) * 1000000) AS timestamp_adj
        |  FROM cnt c
        |  JOIN drift d ON d.base = c.base AND d.collection_date = c.collection_date),
        |res AS (
        |  SELECT base,
        |    CASE WHEN grp = 2 THEN NULL ELSE 'd_' || k END AS device_id,
        |    CASE WHEN grp IN (3, 4) THEN 'fuzzy' WHEN grp = 0 THEN 'ip'
        |         WHEN grp = 1 THEN 'geo' ELSE 'unmatched' END AS resolution_stage
        |  FROM site)
        |SELECT a.event_id, a.base, a.timestamp_adj,
        |  CAST(a.timestamp_adj AS DATE) AS event_day, r.device_id, r.resolution_stage
        |FROM adj a JOIN res r ON r.base = a.base""".stripMargin)
}
