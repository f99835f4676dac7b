package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Perfmet

/** Oracle coverage for the COMPOSED performance-metrics dashboard feed
  * (reference `util/perfmet_knack.py:259-313`): per-sensor daily
  * observations → trailing 7-day expected → feed-day gap-fill (-1 rows for
  * silent sensors) → data/expected ratio; plus the jobs side — latest job
  * per (data_source, stage) with display labels. The individual pieces are
  * oracle-checked by q_a3/q_a5/q_a6; these check the compositions.
  */
object QueriesPerfmet {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pm_feed" -> ((s, dir) => {
      val obs = Perfmet.sensorObs(
        t(s, dir, "events")
          .select(col("user_id"), Functions.toSecond(col("ts")).as("ts_sec")),
        "user_id", "ts_sec")
      // known sensors plus one phantom (-99) that never reports, so the
      // gap-fill path always triggers
      val sensors = obs.select(col("sensor_name"))
        .unionByName(s.range(1).select(lit(-99L).as("sensor_name")))
      // feed day = the latest observed day (bounded one-row driver read)
      val day = obs.agg(max(col("collection_date"))).head().getDate(0).toString
      Perfmet.dashboardFeed(obs, sensors, lit(day))
    }),

    // A4: job-level collect range with representsDay end widening
    // (reference support/perfmet.py:40-50)
    "q_a4_jobrange" -> ((s, dir) =>
      Perfmet.jobRange(
        t(s, dir, "events").select(Functions.toSecond(col("ts")).as("ts_sec")),
        "ts_sec", representsDay = true)),

    "q_pm_jobs" -> ((s, dir) => {
      val jobs = t(s, dir, "orders").select(
        concat(lit("src_"), pmod(col("o_orderkey"), lit(3)).cast("string"))
          .as("data_source"),
        element_at(
          array(lit("a"), lit("b"), lit("c"), lit("d"), lit("e")),
          (pmod(col("o_custkey"), lit(5)) + 1).cast("int")).as("stage"),
        col("o_orderdate").as("processing_date"),
        col("o_orderkey"))
      Perfmet.latestJobs(jobs, "processing_date", "o_orderkey")
        .select("data_source", "stage", "stage_label", "processing_date", "o_orderkey")
    }))

  val oracles: Map[String, String] = Map(
    "q_pm_feed" ->
      """WITH obs AS (
        |  SELECT user_id AS sensor_name, CAST(ts AS DATE) AS collection_date,
        |    CAST(count(*) AS DOUBLE) AS data
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT max(collection_date) AS day FROM obs),
        |exp AS (
        |  SELECT sensor_name, floor(avg(data) * 1000 + 0.5) / 1000 AS expected
        |  FROM obs, d WHERE collection_date > day - 7 AND collection_date <= day
        |  GROUP BY sensor_name),
        |sensors AS (SELECT DISTINCT sensor_name FROM obs UNION SELECT -99),
        |present AS (
        |  SELECT sensor_name, collection_date, data FROM obs, d
        |  WHERE collection_date = day),
        |missing AS (
        |  SELECT s.sensor_name, d.day AS collection_date, -1.0 AS data
        |  FROM sensors s, d
        |  WHERE NOT EXISTS (SELECT 1 FROM present p WHERE p.sensor_name = s.sensor_name)),
        |feed AS (SELECT * FROM present UNION ALL SELECT * FROM missing)
        |SELECT f.sensor_name, f.collection_date, f.data, e.expected,
        |  CASE WHEN f.data >= 0 AND e.expected > 0
        |    THEN floor(f.data / e.expected * 10000 + 0.5) / 10000 END AS pct_of_expected
        |FROM feed f LEFT JOIN exp e ON e.sensor_name = f.sensor_name""".stripMargin,
    "q_a4_jobrange" ->
      """SELECT min(CAST(date_trunc('second', ts) AS TIMESTAMP)) AS collect_start,
        |  CAST(max(CAST(ts AS DATE)) + 1 AS TIMESTAMP) AS collect_end
        |FROM events""".stripMargin,
    "q_pm_jobs" ->
      """WITH jobs AS (
        |  SELECT 'src_' || (o_orderkey % 3) AS data_source,
        |    ['a','b','c','d','e'][CAST(o_custkey % 5 AS INT) + 1] AS stage,
        |    o_orderdate AS processing_date, o_orderkey
        |  FROM orders)
        |SELECT data_source, stage,
        |  CASE stage WHEN 'a' THEN 'a. Ingest' WHEN 'b' THEN 'b. Standardize'
        |    WHEN 'c' THEN 'c. Ready' WHEN 'd' THEN 'd. Aggregate'
        |    WHEN 'e' THEN 'e. Publish' ELSE stage END AS stage_label,
        |  processing_date, o_orderkey
        |FROM (SELECT *, row_number() OVER (PARTITION BY data_source, stage
        |    ORDER BY processing_date DESC, o_orderkey DESC) AS rn FROM jobs)
        |WHERE rn = 1""".stripMargin)
}
