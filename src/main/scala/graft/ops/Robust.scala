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

  /** Per-group quantile normalization: `<valueCol>_qn` = `percent_rank`
    * within the group — the rank-based calibration that makes quality
    * scores comparable ACROSS sources (a 0.9 means "top decile of its own
    * domain" whether the domain's raw scores cluster at 3 or at 300), so
    * one global threshold mixes sources fairly. Standard `(rank−1)/(n−1)`
    * semantics: ties share a value, a singleton group normalizes to 0.0,
    * and NULL scores pass through with a NULL rank (excluded from the
    * window so they cannot shift real rows — the [[TextAnalysis
    * .perplexityBuckets]] convention).
    *
    * This exact form windows each group whole — fine up to millions of
    * rows per group; at web scale use [[quantileNormalizeApprox]], whose
    * oracle this is (the q_ann_brute / LSH relationship again).
    */
  def quantileNormalize(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol))
    df.filter(col(valueCol).isNotNull)
      .withColumn(s"${valueCol}_qn",
        graft.Functions.roundHalfUp(percent_rank().over(w), 6))
      .unionByName(
        df.filter(col(valueCol).isNull)
          .withColumn(s"${valueCol}_qn", lit(null).cast("double")))
  }

  /** The scale path: per-group quantile CUTS from a mergeable
    * `approx_percentile` sketch (grid of `grid` interior cut points),
    * broadcast back and applied per row — no group-wide window, no skewed
    * partition. `<valueCol>_qn` = fraction of cuts STRICTLY below the
    * value — strict, because `percent_rank` gives ties their MINIMUM rank,
    * and cuts that equal a heavily-tied value must therefore not count —
    * so the result lands within ~1/grid of the exact percent-rank (plus
    * sketch error near a cut); the spec bounds the observed gap.
    */
  def quantileNormalizeApprox(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      grid: Int = 200,
      accuracy: Int = 10000): DataFrame = {
    require(grid >= 2, s"grid=$grid must be at least 2")
    val ps = array((1 until grid).map(i => lit(i.toDouble / grid)): _*)
    val cuts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("_grp"))
      .agg(percentile_approx(col(valueCol), ps, lit(accuracy)).as("_cuts"))
    df.join(broadcast(cuts), col(groupCol) <=> col("_grp"), "left")
      .withColumn(s"${valueCol}_qn",
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(graft.Functions.roundHalfUp(
            size(filter(col("_cuts"), c => c < col(valueCol))).cast("double") /
              lit((grid - 1).toDouble), 6)))
      .drop("_grp", "_cuts")
  }

  /** Per-group Pearson correlation between two numeric columns — "are these
    * metrics coupled per segment" as ONE map-side-combinable aggregate:
    * `(group, n, corr)` with
    * `r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))`.
    *
    * The five sums are DECIMAL-exact (order-free, partition-invariant); the
    * closed form — including both square roots, which IEEE 754 rounds
    * correctly and therefore identically in every engine — evaluates in
    * DOUBLE, mirrored op-for-op by the oracle. Rows with a NULL in either
    * column are excluded (pairwise deletion); degenerate groups (n < 2 or
    * zero variance on either side) return NULL.
    *
    * Spark's builtin `corr` is a single-pass DOUBLE accumulation whose
    * result depends on partition merge order; this form trades one extra
    * decimal column for bit-reproducibility, the engine-wide contract.
    */
  def groupCorr(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(18,6)")
    val y = col(yCol).cast("decimal(18,6)")
    val g = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("_sx"),
        sum(y).cast("double").as("_sy"),
        sum(x * x).cast("double").as("_sxx"),
        sum(y * y).cast("double").as("_syy"),
        sum(x * y).cast("double").as("_sxy"))
    val num = col("n") * col("_sxy") - col("_sx") * col("_sy")
    val dx = col("n") * col("_sxx") - col("_sx") * col("_sx")
    val dy = col("n") * col("_syy") - col("_sy") * col("_sy")
    g.select(
      col(groupCol), col("n"),
      when(col("n") < 2 || dx <= 0 || dy <= 0, lit(null).cast("double"))
        .otherwise(graft.Functions.roundHalfUp(num / (sqrt(dx) * sqrt(dy)), 6))
        .as("corr"))
  }

  /** Per-group trimmed mean: drop each group's lowest and highest
    * `floor(trim·n)` values by rank, average the core — the
    * outlier-robust location estimate for metric dashboards where
    * [[winsorize]]'s clipping would double-count the boundary value.
    *
    * Determinism contract: ranks order by `(value, tiebreak key)` so the
    * drop set is exact and reproducible even on heavily tied metrics;
    * the kept values sum as DECIMAL(28,6) (order-free) and ONE divide
    * produces the mean, rounded half-up 6. `n_kept = n − 2·floor(trim·n)`
    * is always ≥ 1 for trim < 0.5 (enforced). NULL/NaN values and NULL
    * keys drop.
    *
    * Scale shape: one rank window + count window over ONE exchange on
    * the group key (the [[graft.ops.Sampling.topFractionPerGroup]]
    * plan), then a map-side-combinable keyed mean.
    */
  def trimmedMean(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      valueCol: String,
      trim: Double): DataFrame = {
    require(trim >= 0.0 && trim < 0.5, s"trim must be in [0, 0.5), got $trim")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(valueCol).cast("double"), col(keyCol))
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df
      .filter(col(keyCol).isNotNull && col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast("double")))
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(cw))
      .withColumn("_k", floor(lit(trim) * col("_n").cast("double")).cast("long"))
      .filter(col("_rn") > col("_k") && col("_rn") <= col("_n") - col("_k"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col(valueCol).cast("decimal(28,6)")).as("_s"))
      .select(
        col(groupCol), col("n_kept"),
        graft.Functions.roundHalfUp(
          col("_s").cast("double") / col("n_kept").cast("double"), 6).as("trimmed_mean"))
  }
}
