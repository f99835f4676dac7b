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
    * Scale shape (three levels, no day-wide window partition anywhere):
    *   1. per-(day, key) min timestamp — map-side combinable groupBy, one
    *      row per device per day;
    *   2. rank within (day, time-bucket) — the bucket index
    *      `floor(secondsOfDay(first_seen) / width)` is monotone in
    *      `first_seen`, so bucket order is a prefix of the (first_seen, key)
    *      ordering and equal timestamps can never straddle buckets;
    *   3. per-day cumulative bucket offsets (≤ `bucketsPerDay` rows per day)
    *      added to the local rank.
    * The widest window partition is the densest *bucket's* devices, not the
    * whole day's; raise `bucketsPerDay` (e.g. 1440) if device cardinality
    * per day grows. Keys are distinct after step 1, so row_number ≡
    * dense_rank and the result matches a day-wide dense_rank exactly.
    */
  def firstSeenCounter(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      bucketsPerDay: Int = 24): DataFrame = {
    require(bucketsPerDay >= 1 && 86400 % bucketsPerDay == 0,
      "bucketsPerDay must divide 86400")
    val day = to_date(col(tsCol)).as("day")
    val firstSeen = df
      .groupBy(day, col(keyCol))
      .agg(min(col(tsCol)).as("first_seen"))
    val width = 86400L / bucketsPerDay
    val bucket = floor(
      (unix_timestamp(col("first_seen")) - unix_timestamp(col("day").cast("timestamp"))) /
        width).cast("int")
    val localW = Window.partitionBy(col("day"), col("_b"))
      .orderBy(col("first_seen"), col(keyCol))
    val local = firstSeen
      .withColumn("_b", bucket)
      .withColumn("_lr", row_number().over(localW))
    val offsetW = Window.partitionBy(col("day")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local
      .groupBy(col("day"), col("_b"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_off", coalesce(sum(col("_n")).over(offsetW), lit(0L)))
      .select(col("day"), col("_b"), col("_off"))
    // SHUFFLE_HASH (not broadcast): both sides then share the identical
    // (day, _b) exchange over the firstSeen aggregate, so ReuseExchange
    // scans the source once — a broadcast build would re-evaluate the whole
    // aggregation to produce the tiny offsets table
    local
      .join(offsets.hint("SHUFFLE_HASH"), Seq("day", "_b"))
      .select(
        col("day"), col(keyCol), col("first_seen"),
        (col("_off") + col("_lr")).cast("int").as("daily_counter"))
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
