package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sensor/time-series repair operators — the gap-filling half of the
  * reference's dashboard-feed story (its 15-minute aggregates assume a
  * complete grid; real device feeds have holes).
  *
  * Reference analog: the perfmet expected-value window
  * (`ops/Perfmet.expectedValues`) answers "what SHOULD this sensor read";
  * these answer "carry the last reading forward" and "produce one row per
  * grid slot".
  */
object TimeSeries {

  /** Forward fill: for each of `fillCols`, add `<col>_ff` carrying the
    * last NON-NULL value at or before the row, per key in (time, id)
    * order — `last(ignoreNulls)` over a running window, the canonical
    * Spark formulation (one keyed shuffle, sorted within partitions, no
    * self-join). The id tiebreak makes equal-timestamp fills
    * deterministic.
    */
  def forwardFill(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      fillCols: Seq[String]): DataFrame = {
    require(fillCols.nonEmpty, "nothing to fill")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(df) { (d, c) =>
      d.withColumn(s"${c}_ff", last(col(c), ignoreNulls = true).over(w))
    }
  }

  case class FfEvent(key: Long, tsSec: Long, id: Long, v: Option[Double])
  case class FfFilled(key: Long, id: Long, vFf: Option[Double])
  case class FfState(lastV: Double, hasV: Boolean)

  /** Streaming twin of [[forwardFill]]: per-key state carries the last
    * non-null reading (ONE value per key — bounded state); within each
    * micro-batch events apply in (time, id) order, the batch ordering
    * exactly. The live-telemetry shape: holes in a device feed fill as
    * they stream, and a restart resumes from the state store.
    */
  def forwardFillStream(
      events: org.apache.spark.sql.Dataset[FfEvent]): org.apache.spark.sql.Dataset[FfFilled] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: Long, it: Iterator[FfEvent], state: GroupState[FfState]) => {
          val sorted = it.toSeq.sortBy(e => (e.tsSec, e.id))
          var st = state.getOption.getOrElse(FfState(0.0, hasV = false))
          val out = sorted.map { e =>
            e.v.foreach(v => st = FfState(v, hasV = true))
            FfFilled(key, e.id, if (st.hasV) Some(st.lastV) else None)
          }
          state.update(st)
          out.iterator
        })
  }

  private def roundUpTo(c: Column, step: Long): Column = {
    val shifted = c + lit(step - 1)
    shifted - pmod(shifted, lit(step))
  }

  private def roundDownTo(c: Column, step: Long): Column = c - pmod(c, lit(step))

  /** Resample each key's observations onto a regular `stepSeconds` grid
    * with backward (as-of) fill: one row per (key, grid slot) between the
    * key's first and last observation, carrying the most recent
    * observation at or before the slot — the "complete 15-minute series"
    * a dashboard or model-feature join expects. Duplicate observations at
    * the same (key, second) resolve to the greatest `tiebreakCol` first,
    * so the result is deterministic.
    *
    * The grid starts at the first observation rounded UP (every slot
    * therefore HAS a predecessor — no leading-null rows) and ends at the
    * last observation rounded DOWN; keys whose span is shorter than one
    * step emit nothing (guarded — Spark's `sequence` would otherwise emit
    * a descending phantom range, the [[Pack.packTokenIds]] lesson).
    *
    * Scale shape: grid construction is a per-key bounded aggregate +
    * generator; the fill is [[AsOf.join]]'s union-window (ONE keyed
    * shuffle, no interval explosion). Output volume = Σ span/step.
    */
  def resampleGrid(
      df: DataFrame,
      keyCol: String,
      tsSecCol: String,
      valueCol: String,
      tiebreakCol: String,
      stepSeconds: Long): DataFrame = {
    require(stepSeconds >= 1, s"stepSeconds=$stepSeconds must be positive")
    val rn = row_number().over(
      Window.partitionBy(col(keyCol), col(tsSecCol)).orderBy(col(tiebreakCol).desc))
    val obs = df
      .select(col(keyCol), col(tsSecCol), col(valueCol), col(tiebreakCol))
      .withColumn("_rn", rn).filter(col("_rn") === 1)
      .select(col(keyCol), col(tsSecCol), col(valueCol))
    val bounds = obs.groupBy(col(keyCol))
      .agg(min(col(tsSecCol)).as("_lo"), max(col(tsSecCol)).as("_hi"))
      .select(col(keyCol),
        roundUpTo(col("_lo"), stepSeconds).as("_start"),
        roundDownTo(col("_hi"), stepSeconds).as("_end"))
      .filter(col("_end") >= col("_start"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("_start"), col("_end"), lit(stepSeconds))).as("grid_ts"))
    AsOf.join(grid, obs, keyCol, "grid_ts", tsSecCol, Seq(valueCol), forward = false)
  }
}
