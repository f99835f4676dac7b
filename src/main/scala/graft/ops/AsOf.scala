package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: attach to each fact row the single dimension snapshot that is
  * nearest in time — backward (greatest snapshot time ≤ fact time, reference
  * `support/catalog.py:105-188` "previous-date" site lookup) or forward
  * (smallest snapshot time ≥ fact time, reference `support/unitdata.py:40-63`
  * unit-data resolution).
  *
  * Implementation: union-then-window ("last non-null over ordered partition")
  * rather than a range join. One shuffle on the join key, no interval
  * explosion, no per-key candidate cross product — at 100 TB of facts with a
  * small snapshot dimension this is a single keyed exchange, and Spark's
  * window runs sorted within partitions. Ties on snapshot time are broken by
  * the greatest (backward) / least (forward) `tiebreak` column so results are
  * deterministic regardless of physical row order.
  */
object AsOf {

  /** @param facts     left side; keeps all its rows and columns
    * @param snapshots right side; `snapCols` are attached (nullable when no
    *                  snapshot qualifies)
    * @param key       equi-join column present on both sides
    * @param factTime  event-time column on `facts`
    * @param snapTime  snapshot-time column on `snapshots`
    * @param snapCols  snapshot payload columns to attach
    * @param forward   false = backward as-of (snapTime <= factTime),
    *                  true = forward as-of (snapTime >= factTime)
    * @param tiebreak  snapshot column ordering tiebreak on equal snapTime
    */
  def join(
      facts: DataFrame,
      snapshots: DataFrame,
      key: String,
      factTime: String,
      snapTime: String,
      snapCols: Seq[String],
      forward: Boolean = false,
      tiebreak: Option[String] = None): DataFrame = {

    val factCols = facts.columns.toSeq
    val payload = (snapTime +: snapCols).distinct

    // Unified event stream: facts carry a null snapshot struct, snapshots a
    // null fact payload. The whole snapshot row rides in ONE struct so the
    // window fill can never tear fields from different snapshots (a null
    // *field* in the nearest snapshot stays null instead of being backfilled
    // from an older row). `_t` is the ordering time; direction is handled by
    // negating the ordering for forward as-of.
    val sign = if (forward) -1L else 1L
    def orderExpr(t: String) = (unix_micros(col(t).cast("timestamp")) * sign).as("_t")

    val snapStructType = org.apache.spark.sql.types.StructType(
      payload.map(c => snapshots.schema(c).copy(name = c)))

    // `_isSnap` orders snapshots *before* facts at identical times for
    // backward as-of (a snapshot dated exactly at the fact time applies), and
    // the same after negation for forward.
    val tagged = facts
      .select(
        col(key).as("_k") +: orderExpr(factTime) +: lit(0).as("_isSnap") +:
          tiebreak.map(tb => lit(null).cast(snapshots.schema(tb).dataType))
            .getOrElse(lit(0)).as("_tb") +:
          lit(null).cast(snapStructType).as("_snap") +:
          factCols.map(col): _*)
      .unionByName(
        snapshots.select(
          col(key).as("_k") +: orderExpr(snapTime) +: lit(1).as("_isSnap") +:
            tiebreak.map(tb => col(tb)).getOrElse(lit(0)).as("_tb") +:
            struct(payload.map(col): _*).as("_snap") +:
            factCols.map(c => lit(null).cast(facts.schema(c).dataType).as(c)): _*))

    // Tiebreak keeps its native type and orderability: backward as-of wants
    // the greatest tiebreak among equal snapTimes to win (last in ascending
    // order); forward wants the least (last in descending order).
    val tbOrder = if (forward) col("_tb").desc else col("_tb").asc
    val w = Window
      .partitionBy("_k")
      .orderBy(col("_t"), col("_isSnap").desc, tbOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    tagged
      .withColumn("_snap", last(col("_snap"), ignoreNulls = true).over(w))
      .filter(col("_isSnap") === 0)
      .select(factCols.map(col) ++ payload.map(c => col(s"_snap.$c").as(s"snap_$c")): _*)
  }

  /** [[join]] with a STALENESS bound — pandas `merge_asof(tolerance=...)`:
    * the nearest snapshot only attaches when it lies within
    * `toleranceSeconds` of the fact time; a nearer-than-nothing-but-stale
    * snapshot nulls out exactly like no snapshot at all. The device-feed
    * contract "use the last reading unless it's older than X" — without
    * the bound an as-of join happily carries a reading forward forever.
    *
    * Pure post-filter on the joined output (no extra shuffle): every
    * `snap_*` column nulls together, so a stale match can never leak a
    * partial row.
    */
  def joinWithTolerance(
      facts: DataFrame,
      snapshots: DataFrame,
      key: String,
      factTime: String,
      snapTime: String,
      snapCols: Seq[String],
      toleranceSeconds: Long,
      forward: Boolean = false,
      tiebreak: Option[String] = None): DataFrame = {
    require(toleranceSeconds >= 0, s"toleranceSeconds=$toleranceSeconds must be >= 0")
    val joined = join(facts, snapshots, key, factTime, snapTime, snapCols,
      forward, tiebreak)
    val factSec = unix_timestamp(col(factTime).cast("timestamp"))
    val snapSec = unix_timestamp(col(s"snap_$snapTime").cast("timestamp"))
    val within =
      if (forward) snapSec - factSec <= toleranceSeconds
      else factSec - snapSec <= toleranceSeconds
    // materialize the keep decision FIRST: the fold below overwrites
    // snap_<snapTime> itself, and re-deriving the predicate from a
    // half-nulled row would be order-dependent
    val payload = (snapTime +: snapCols).distinct.map(c => s"snap_$c")
    payload
      .foldLeft(joined.withColumn("_fresh",
        col(s"snap_$snapTime").isNotNull && within)) { (df, c) =>
        df.withColumn(c, when(col("_fresh"), col(c)))
      }
      .drop("_fresh")
  }
}
