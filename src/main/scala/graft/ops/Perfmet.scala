package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Functions

/** Performance-metrics operators (reference `support/perfmet.py`,
  * `util/perfmet_knack.py`, tables `docs/appendix_perfmet.md:19-70`): job
  * telemetry and per-sensor daily observations with 7-day expected values —
  * the reference's ETL observability layer as plain DataFrames.
  */
object Perfmet {

  /** A3 — per-sensor daily health observation: count (or sum of a measure)
    * plus the observed time range (reference `bt_json_standard.py:146-157`,
    * `wt_json_standard.py:111-121`).
    */
  def sensorObs(
      df: DataFrame,
      sensorCol: String,
      tsCol: String,
      measure: Option[String] = None): DataFrame = {
    val value = measure
      .map(m => sum(col(m).cast("decimal(18,4)")).cast("double"))
      .getOrElse(count(lit(1)).cast("double"))
    df.groupBy(col(sensorCol).as("sensor_name"), to_date(col(tsCol)).as("collection_date"))
      .agg(
        value.as("data"),
        min(col(tsCol)).as("min_timestamp"),
        max(col(tsCol)).as("max_timestamp"))
  }

  /** A4 — job-level collect range (reference `support/perfmet.py:40-50`):
    * min/max collection instants; `representsDay` widens the end to the next
    * midnight.
    */
  def jobRange(df: DataFrame, tsCol: String, representsDay: Boolean = false): DataFrame = {
    val end =
      if (representsDay) date_add(to_date(max(col(tsCol))), 1).cast("timestamp")
      else max(col(tsCol))
    df.agg(min(col(tsCol)).as("collect_start"), end.as("collect_end"))
  }

  /** A5 — 7-day expected value per sensor (reference
    * `perfmet_knack.py:127-156`, `SAMPLE_DAYS=7` `util/perfmet_knack.py:21`):
    * trailing moving average of `data` over the 6 preceding days + current.
    */
  def expectedValues(obs: DataFrame): DataFrame = {
    val dayNum = datediff(col("collection_date"), lit("1970-01-01").cast("date"))
    val w = Window.partitionBy(col("sensor_name")).orderBy(dayNum).rangeBetween(-6, 0)
    obs.withColumn("expected", Functions.roundHalfUp(avg(col("data")).over(w), 3))
  }

  /** A6 — latest observation per sensor (reference
    * `perfmet_knack.py:140-143`).
    */
  def latestPerSensor(obs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("sensor_name"))
      .orderBy(col("collection_date").desc)
    obs.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Gap-filling (reference `perfmet_knack.py:145-156`): sensors expected to
    * report but absent on a day get a `-1` placeholder row so dashboards
    * show silence, not nothing.
    */
  def fillGaps(obs: DataFrame, sensors: DataFrame, day: Column): DataFrame = {
    val expected = sensors.select(col("sensor_name")).distinct()
      .withColumn("collection_date", day.cast("date"))
    val present = obs.filter(col("collection_date") === day.cast("date"))
    val missing = expected
      .join(present, Seq("sensor_name", "collection_date"), "left_anti")
      .withColumn("data", lit(-1.0))
      .withColumn("min_timestamp", lit(null).cast("timestamp"))
      .withColumn("max_timestamp", lit(null).cast("timestamp"))
    present.unionByName(missing)
  }

  /** The composed observation feed (reference `util/perfmet_knack.py:
    * 259-313`): the feed day's observations gap-filled with -1 rows for
    * silent sensors, each carrying the sensor's trailing 7-day expected
    * value (`SAMPLE_DAYS=7`, `perfmet_knack.py:21,127-156`) and the
    * data/expected ratio the dashboard plots. All pieces are keyed
    * aggregates/joins on `sensor_name` — one shuffle family, no day-wide
    * windows.
    */
  def dashboardFeed(obs: DataFrame, sensors: DataFrame, day: Column): DataFrame = {
    val d = day.cast("date")
    val exp = obs
      .filter(col("collection_date") > date_sub(d, 7) && col("collection_date") <= d)
      .groupBy(col("sensor_name"))
      .agg(Functions.roundHalfUp(avg(col("data")), 3).as("expected"))
    fillGaps(obs, sensors, day)
      .join(exp, Seq("sensor_name"), "left")
      .select(
        col("sensor_name"), col("collection_date"), col("data"), col("expected"),
        when(col("data") >= 0 && col("expected") > 0,
          Functions.roundHalfUp(col("data") / col("expected"), 4)).as("pct_of_expected"))
  }

  /** Stage display labels (reference `util/perfmet_knack.py:298-303`). */
  def stageLabel(c: Column): Column =
    when(c === "a", "a. Ingest")
      .when(c === "b", "b. Standardize")
      .when(c === "c", "c. Ready")
      .when(c === "d", "d. Aggregate")
      .when(c === "e", "e. Publish")
      .otherwise(c)

  /** Latest job per (data_source, stage) with its display label (reference
    * `perfmet_knack.py:295-303`: `jobs.sort_values(...).groupby(...)
    * .tail(1)` + stage relabel). `tiebreak` makes equal version rows
    * deterministic.
    */
  def latestJobs(jobs: DataFrame, versionCol: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col("data_source"), col("stage"))
      .orderBy(col(versionCol).desc, col(tiebreak).desc)
    jobs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
      .withColumn("stage_label", stageLabel(col("stage")))
  }
}
