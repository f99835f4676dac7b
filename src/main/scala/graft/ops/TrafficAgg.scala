package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Functions

/** The system's flagship analytic (reference `gs_ready_agg.py:69-92`):
  * tumbling time-bucket aggregation of per-event rows into
  * (bucket × dims) → volume, mean and stddev of each measure.
  *
  * Semantics carried over from the reference:
  *   - bucket width defaults to 900 s (15 min, `gs_ready_agg.py:36`);
  *   - stddev is the *sample* deviation (pandas default ddof=1 ⇒
  *     `stddev_samp`), and single-row groups produce 0.0, not null
  *     (`fillna(0)`, `gs_ready_agg.py:81-83`);
  *   - averages and deviations are rounded to 3 decimals
  *     (`gs_ready_agg.py:80-83`);
  *   - grouping happens on epoch-aligned UTC buckets, which reproduces the
  *     reference's deliberate group-in-UTC DST dodge (`gs_ready_agg.py:71-73`).
  *
  * Scale: a single map-side-combinable `groupBy` — the partial aggregation
  * runs before the shuffle, so the exchange carries one row per
  * (bucket × dims) per task, not per event. No window functions, no skew
  * (time buckets spread uniformly).
  */
object TrafficAgg {

  /** Mean/stddev are computed from exact decimal moments (Σx, Σx² summed as
    * DECIMAL, combined in DOUBLE): numerically equal to `avg`/`stddev_samp`
    * at the reference's 3-decimal rounding, but bit-for-bit deterministic
    * under any partitioning / merge order — reruns and engine swaps hash
    * identically. The moment sums are plain partial-aggregable `sum`s, so
    * map-side combine still applies.
    */
  def aggregate(
      events: DataFrame,
      tsCol: String,
      dims: Seq[String],
      measures: Seq[String],
      freqSeconds: Int = 900): DataFrame = {

    val bucket = Functions.bucketStart(col(tsCol), freqSeconds).as("bucket_start")
    val moments: Seq[Column] = measures.flatMap { m =>
      val dec = col(m).cast("decimal(18,6)")
      Seq(
        sum(dec).cast("double").as(s"_s1_$m"),
        sum(dec * dec).cast("double").as(s"_s2_$m"))
    }
    val grouped = events
      .groupBy(bucket +: dims.map(col): _*)
      .agg(count(lit(1)).as("volume"), moments: _*)
    val n = col("volume")
    val stats = measures.flatMap { m =>
      val s1 = col(s"_s1_$m")
      val s2 = col(s"_s2_$m")
      val variance = greatest((s2 * n - s1 * s1) / (n * (n - 1)), lit(0.0))
      Seq(
        Functions.roundHalfUp(s1 / n, 3).as(s"${m}_avg"),
        when(n > 1, Functions.roundHalfUp(sqrt(variance), 3))
          .otherwise(lit(0.0)).as(s"${m}_std"))
    }
    grouped.select(
      (col("bucket_start") +: dims.map(col)) ++ (n +: stats): _*)
  }
}
