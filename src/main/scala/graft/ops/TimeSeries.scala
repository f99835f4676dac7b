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
    val obs = dedupObs(df, keyCol, tsSecCol, valueCol, tiebreakCol)
    val grid = gridFor(obs, keyCol, tsSecCol, stepSeconds)
    AsOf.join(grid, obs, keyCol, "grid_ts", tsSecCol, Seq(valueCol), forward = false)
  }

  /** One observation per (key, second): greatest `tiebreakCol` wins. */
  private def dedupObs(
      df: DataFrame,
      keyCol: String,
      tsSecCol: String,
      valueCol: String,
      tiebreakCol: String): DataFrame = {
    val rn = row_number().over(
      Window.partitionBy(col(keyCol), col(tsSecCol)).orderBy(col(tiebreakCol).desc))
    df.select(col(keyCol), col(tsSecCol), col(valueCol), col(tiebreakCol))
      .withColumn("_rn", rn).filter(col("_rn") === 1)
      .select(col(keyCol), col(tsSecCol), col(valueCol))
  }

  /** Per-key regular grid between ⌈first⌉ and ⌊last⌋ observation. */
  private def gridFor(
      obs: DataFrame,
      keyCol: String,
      tsSecCol: String,
      stepSeconds: Long): DataFrame =
    obs.groupBy(col(keyCol))
      .agg(min(col(tsSecCol)).as("_lo"), max(col(tsSecCol)).as("_hi"))
      .select(col(keyCol),
        roundUpTo(col("_lo"), stepSeconds).as("_start"),
        roundDownTo(col("_hi"), stepSeconds).as("_end"))
      .filter(col("_end") >= col("_start"))
      .select(col(keyCol),
        explode(sequence(col("_start"), col("_end"), lit(stepSeconds))).as("grid_ts"))

  /** [[resampleGrid]]'s linear-interpolation sibling: one row per (key,
    * grid slot) carrying the value INTERPOLATED between the nearest
    * observations on either side — the gap repair a model-feature grid
    * wants when carrying a stale reading forward would bias it.
    *
    * `v = prev + (next − prev) · (t − t_prev) / (t_next − t_prev)`, with a
    * slot that lands exactly on an observation returning that observation
    * (guarding the 0/0 division). Because the grid spans ⌈first⌉..⌊last⌋,
    * every slot has BOTH neighbours — no null legs.
    *
    * Scale shape: two [[AsOf.join]] union-window passes (backward then
    * forward) over the same keyed exchange — no interval explosion, no
    * self-join of the grid against raw observations.
    *
    * Output: key, grid_ts, prev_sec, prev_v, next_sec, next_v, v.
    */
  def interpolateGrid(
      df: DataFrame,
      keyCol: String,
      tsSecCol: String,
      valueCol: String,
      tiebreakCol: String,
      stepSeconds: Long): DataFrame = {
    require(stepSeconds >= 1, s"stepSeconds=$stepSeconds must be positive")
    val obs = dedupObs(df, keyCol, tsSecCol, valueCol, tiebreakCol)
    val grid = gridFor(obs, keyCol, tsSecCol, stepSeconds)
    val back = AsOf
      .join(grid, obs, keyCol, "grid_ts", tsSecCol, Seq(valueCol), forward = false)
      .withColumnRenamed(s"snap_$tsSecCol", "prev_sec")
      .withColumnRenamed(s"snap_$valueCol", "prev_v")
    val both = AsOf
      .join(back, obs, keyCol, "grid_ts", tsSecCol, Seq(valueCol), forward = true)
      .withColumnRenamed(s"snap_$tsSecCol", "next_sec")
      .withColumnRenamed(s"snap_$valueCol", "next_v")
    both.withColumn(
      "v",
      when(col("next_sec") === col("prev_sec"), col("prev_v"))
        .otherwise(
          col("prev_v") + (col("next_v") - col("prev_v")) *
            ((col("grid_ts") - col("prev_sec")).cast("double") /
              (col("next_sec") - col("prev_sec")).cast("double"))))
  }

  /** Exponentially weighted moving average per key, in (time, id) order:
    * `s₁ = r(x₁)`, `sₜ = r(α·xₜ + (1−α)·sₜ₋₁)` with `r` = half-up rounding
    * at 9 decimals EVERY step — the per-step quantization is what makes the
    * recursion bit-reproducible across engines (the DuckDB oracle replays
    * the identical arithmetic in a recursive CTE).
    *
    * Scale shape: one hash exchange on the key + an in-partition sort, then
    * a single sequential walk per key run inside `mapPartitions` — constant
    * state (one double), no window buffering, no per-key collect. The
    * sequential dependency is fundamental to EWMA; the parallelism unit is
    * the key, which a telemetry corpus has millions of.
    *
    * NULL-valued rows are dropped (compose with [[forwardFill]] first to
    * carry readings into the holes instead). Output: (keyCol as string,
    * idCol, ewma).
    */
  def ewma(
      df: DataFrame,
      keyCol: String,
      tsSecCol: String,
      idCol: String,
      valueCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha=$alpha out of (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val beta = 1.0 - alpha
    // every consumed column must be non-null: the typed tuple below has
    // primitive Long/Double fields, and a NULL ts/id would NPE the
    // deserializer instead of dropping the row
    val typed = df
      .filter(col(valueCol).isNotNull && col(keyCol).isNotNull &&
        col(tsSecCol).isNotNull && col(idCol).isNotNull)
      .select(
        col(keyCol).cast("string").as("k"),
        col(tsSecCol).cast("long").as("ts"),
        col(idCol).cast("long").as("id"),
        col(valueCol).cast("double").as("v"))
      .as[(String, Long, Long, Double)]
    typed
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("ts"), col("id"))
      .mapPartitions { it =>
        var curKey: String = null
        var s: Double = 0.0
        it.map { case (k, _, id, v) =>
          if (k != curKey) { curKey = k; s = round9(v) }
          else s = round9(alpha * v + beta * s)
          (k, id, s)
        }
      }
      .toDF(keyCol, idCol, "ewma")
  }

  private def round9(v: Double): Double = math.floor(v * 1e9 + 0.5) / 1e9

  case class EwEvent(key: String, tsSec: Long, id: Long, v: Double)
  case class EwOut(key: String, id: Long, ewma: Double)
  case class EwState(s: Double, hasS: Boolean)

  /** Streaming twin of [[ewma]]: per-key state is ONE double; within each
    * micro-batch events apply in (time, id) order. Replaying the same
    * batches yields the batch operator's values step for step.
    */
  def ewmaStream(
      events: org.apache.spark.sql.Dataset[EwEvent],
      alpha: Double): org.apache.spark.sql.Dataset[EwOut] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha=$alpha out of (0, 1]")
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val beta = 1.0 - alpha
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, it: Iterator[EwEvent], state: GroupState[EwState]) => {
          val sorted = it.toSeq.sortBy(e => (e.tsSec, e.id))
          var st = state.getOption.getOrElse(EwState(0.0, hasS = false))
          val out = sorted.map { e =>
            st =
              if (!st.hasS) EwState(round9(e.v), hasS = true)
              else EwState(round9(alpha * e.v + beta * st.s), hasS = true)
            EwOut(key, e.id, st.s)
          }
          state.update(st)
          out.iterator
        })
  }

  /** Per-key ordinary-least-squares trend — "is this sensor drifting?" as
    * one aggregate: `(key, n, x0, slope, intercept)` with `slope` in value
    * units per second and `intercept` the fitted value at `x0 = min(x)`
    * (the per-key centering that keeps Σx² inside exact DECIMAL range at
    * any epoch magnitude — raw epoch-seconds squared would overflow 38
    * digits in a large group).
    *
    * The sums are DECIMAL-exact and map-side combinable (one keyed
    * exchange reused by the centering window); only the final closed-form
    * division happens in DOUBLE, mirrored operation-for-operation by the
    * oracle. Degenerate keys (single point, zero x-variance) return NULL
    * slope/intercept.
    */
  def trend(
      df: DataFrame,
      keyCol: String,
      xSecCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
    val base = df
      .filter(col(keyCol).isNotNull && col(xSecCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol), col(xSecCol).cast("long").as("_x"), col(valueCol).as("_y"))
      .withColumn("_xc", col("_x") - min(col("_x")).over(w))
    val g = base
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        min(col("_x")).as("x0"),
        sum(col("_xc").cast("decimal(38,0)")).cast("double").as("_sx"),
        sum(col("_xc").cast("decimal(19,0)") * col("_xc").cast("decimal(19,0)"))
          .cast("double").as("_sxx"),
        sum(col("_y").cast("decimal(18,6)")).cast("double").as("_sy"),
        sum(col("_xc").cast("decimal(19,0)") * col("_y").cast("decimal(18,6)"))
          .cast("double").as("_sxy"))
    val num = col("n") * col("_sxy") - col("_sx") * col("_sy")
    val den = col("n") * col("_sxx") - col("_sx") * col("_sx")
    val slopeRaw = num / den
    g.select(
      col(keyCol), col("n"), col("x0"),
      when(den === 0, lit(null).cast("double"))
        .otherwise(graft.Functions.roundHalfUp(slopeRaw, 6)).as("slope"),
      when(den === 0, lit(null).cast("double"))
        .otherwise(graft.Functions.roundHalfUp(
          (col("_sy") - slopeRaw * col("_sx")) / col("n"), 6)).as("intercept"))
  }
}
