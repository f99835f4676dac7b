package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the canonical stateful-sequential operator: an
  * event starts a new session when more than `gapSeconds` elapsed since the
  * user's previous event.
  *
  * Two implementations with identical semantics:
  *   - [[assignBatch]]: lag + running sum over a keyed window — one shuffle,
  *     fully codegen'd; the shape to use for backfills at any scale.
  *   - [[assignStream]]: `flatMapGroupsWithState` keeping (lastTs,
  *     sessionId) per user — the live-stream shape, state bounded by one
  *     record per active user.
  */
object Sessionize {

  /** Batch: session_id = 1 + number of gap-exceeding boundaries before the
    * row, per key ordered by (time, id).
    */
  def assignBatch(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val prev = lag(unix_timestamp(col(tsCol)), 1).over(w)
    val newSession = when(
      prev.isNull || unix_timestamp(col(tsCol)) - prev > gapSeconds, 1L).otherwise(0L)
    df.withColumn(
      "session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Session-LEVEL aggregation through Spark's native `session_window`
    * (merge-on-overlap windows: sessions merge while successive gaps are
    * ≤ `gapSeconds` — windows touching at a boundary coalesce — and each
    * session ends `gapSeconds` after its last event). One aggregate —
    * Catalyst owns the merge, including the streaming state-store variant
    * with watermark expiry.
    *
    * Grouping is EXACTLY [[assignBatch]]'s (`diff > g` starts a session;
    * an event landing precisely at the gap stays merged, spec-pinned on
    * the boundary fixture and by randomized equivalence), so the two forms
    * are interchangeable: per-row ids when downstream needs event grain,
    * this when it needs session grain.
    */
  def sessionAgg(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds >= 1, s"gapSeconds=$gapSeconds must be positive")
    df.groupBy(col(keyCol), session_window(col(tsCol), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
  }

  case class Event(key: Long, tsSec: Long, id: Long)
  case class Sessioned(key: Long, id: Long, sessionId: Long)
  case class State(lastTs: Long, sessionId: Long)

  /** Streaming: per-key state carries (last event time, current session id).
    * Within a micro-batch, events are ordered by (time, id) before applying
    * the same boundary rule as [[assignBatch]].
    */
  def assignStream(
      events: Dataset[Event],
      gapSeconds: Long): Dataset[Sessioned] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: Long, it: Iterator[Event], state: GroupState[State]) => {
          val sorted = it.toSeq.sortBy(e => (e.tsSec, e.id))
          var st = state.getOption.getOrElse(State(Long.MinValue, 0L))
          val out = sorted.map { e =>
            val newSession = st.lastTs == Long.MinValue || e.tsSec - st.lastTs > gapSeconds
            st = State(e.tsSec, if (newSession) st.sessionId + 1 else st.sessionId)
            Sessioned(key, e.id, st.sessionId)
          }
          state.update(st)
          out.iterator
        })
  }
}
