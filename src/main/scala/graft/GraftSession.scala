package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration.
  *
  * Scale notes (the engine targets ~100 TB on a multi-executor cluster,
  * tested on `local[N]`):
  *   - AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  *     dynamic join-strategy switching replace any hand-tuned partition count.
  *   - `spark.sql.shuffle.partitions` defaults to the local core count here;
  *     on a real cluster leave it high (or rely on
  *     `spark.sql.adaptive.coalescePartitions.initialPartitionNum`) and let
  *     AQE coalesce.
  *   - Session time zone is pinned to UTC: the reference mixes naive local
  *     times and explicit offsets (reference `util/date_util.py:67-85`); this
  *     engine stores UTC instants and converts only at parse/format edges,
  *     which also reproduces the reference's DST-safe "group in UTC" policy
  *     (reference `gs_ready_agg.py:71-73`) by construction.
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  /** A `local[cores]` session for tests and the bench/verify mains. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val b = builder(s"local[$cores]", math.max(cores, 8))
    if (sys.env.contains("SPARK_GRAFT_NO_AQE")) b.config("spark.sql.adaptive.enabled", "false")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Functions.register(spark)
    // Same optimizer surface as `spark.sql.extensions=graft.GraftExtensions`
    // (the config path can't apply to an already-running session, so the
    // programmatic path installs the rule here; guarded — getOrCreate can
    // hand back a session that already has it).
    if (!spark.experimental.extraOptimizations.contains(graft.plans.SequenceRatioLengthBound))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.SequenceRatioLengthBound
    spark
  }
}
