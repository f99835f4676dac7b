package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group statistics for corpus/metric quality gates: percentile
  * winsorization and median-absolute-deviation outlier flags — the
  * clip-don't-drop counterparts of the quality filters in
  * [[TextAnalysis.qualityScore]] (a training pipeline clips pathological
  * measure values rather than losing the rows).
  *
  * Shape at scale: one exact-percentile aggregate per group (map-side
  * combinable sort-based `percentile`, same operator the grouped-percentile
  * query uses), broadcast back onto the rows — group cardinality is the
  * dimension side, rows never shuffle. Two passes for MAD (median, then
  * median of absolute deviations) is inherent to the statistic.
  *
  * Determinism: clip boundaries and flags compare at fixed 6-decimal
  * rounding ([[graft.Functions.roundHalfUp]]) so engine-side float
  * interpolation differences cannot flip a boundary row.
  */
object Robust {

  /** Clip `valueCol` into its group's `[pLo, pHi]` exact percentile range;
    * adds `<valueCol>_w` (rounded to 6 decimals). */
  def winsorize(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pLo: Double,
      pHi: Double): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    val bounds = df.groupBy(col(groupCol))
      .agg(
        expr(s"percentile($valueCol, ${pLo}D)").as("_lo"),
        expr(s"percentile($valueCol, ${pHi}D)").as("_hi"))
      .withColumnRenamed(groupCol, "_grp")
    // null-SAFE group equality: groupBy emits a NULL-group bounds row, and
    // clip-don't-drop means NULL-group rows must clip too, not vanish
    df.join(broadcast(bounds), col(groupCol) <=> col("_grp"))
      .withColumn(s"${valueCol}_w",
        graft.Functions.roundHalfUp(least(greatest(col(valueCol), col("_lo")), col("_hi")), 6))
      .drop("_grp", "_lo", "_hi")
  }

  /** Flag rows whose absolute deviation from the group median exceeds
    * `k × MAD` (median absolute deviation); adds boolean `<valueCol>_outlier`.
    * The comparison happens on 6-decimal-rounded quantities on BOTH sides so
    * a boundary row cannot flip on float noise.
    */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Double): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5D)").as("_med"))
      .withColumnRenamed(groupCol, "_grp")
    val withDev = df.join(broadcast(med), col(groupCol) <=> col("_grp"))
      .drop("_grp")
      .withColumn("_dev", abs(col(valueCol) - col("_med")))
    val mad = withDev.groupBy(col(groupCol))
      .agg(expr("percentile(_dev, 0.5D)").as("_mad"))
      .withColumnRenamed(groupCol, "_grp")
    withDev.join(broadcast(mad), col(groupCol) <=> col("_grp"))
      .withColumn(s"${valueCol}_outlier",
        graft.Functions.roundHalfUp(col("_dev"), 6) >
          graft.Functions.roundHalfUp(col("_mad") * k, 6))
      .drop("_grp", "_med", "_dev", "_mad")
  }
}
