package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Publish-stage transforms (reference `*_extract_soc.py`): privacy
  * pseudonymization, label recodes, idempotent record keys.
  */
object Publish {

  /** Daily first-seen counter (reference `bt_extract_soc.py:73-91`,
    * documented `docs/datasrc_bt.md:171-174`): per day, each distinct device
    * gets an incrementing integer in order of first appearance; the counter
    * resets at midnight. The reference numbers devices in *file row order*;
    * a distributed engine must define order by data, so this engine numbers
    * by (first timestamp of the device that day, key) — deterministic under
    * any partitioning (SURVEY §7.5 risk 2).
    *
    * Two-step: per-(day, key) min timestamp (map-side combinable groupBy),
    * then `dense_rank` within the day — the window partition carries one row
    * per device per day, not per event.
    */
  def firstSeenCounter(
      df: DataFrame,
      tsCol: String,
      keyCol: String): DataFrame = {
    val day = to_date(col(tsCol)).as("day")
    val firstSeen = df
      .groupBy(day, col(keyCol))
      .agg(min(col(tsCol)).as("first_seen"))
    val w = Window.partitionBy(col("day")).orderBy(col("first_seen"), col(keyCol))
    firstSeen.withColumn("daily_counter", dense_rank().over(w))
  }

  /** Approach recode (reference `gs_agg_extract_soc.py:78-92`): keep the
    * compass-bound approaches, map "Unassigned*" to "Unassigned", null out
    * anything else (callers filter).
    */
  def approachRecode(c: Column): Column =
    when(c.isin("Northbound", "Southbound", "Eastbound", "Westbound"), c)
      .when(c.startsWith("Unassigned"), lit("Unassigned"))
      .otherwise(lit(null))

  /** Turn-movement recode (reference `gs_agg_extract_soc.py:93-104`). */
  def turnRecode(c: Column): Column =
    when(c === "S", "straight")
      .when(c === "L", "left turn")
      .when(c === "R", "right turn")
      .when(c === "U", "u turn")
      .otherwise(lit(null))
}
