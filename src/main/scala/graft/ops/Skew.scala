package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the 100 TB path. AQE's skew-join splitting
  * covers sort-merge joins automatically; these helpers cover the two cases
  * it doesn't: skewed *aggregations* and skewed joins against a small
  * replicable side.
  */
object Skew {

  /** Two-phase salted aggregation: group by (key, salt) first — spreading a
    * hot key over `salts` partial groups — then merge the partials by key.
    * Correct for any algebraic aggregate expressed as (partial, merge)
    * pairs; this helper covers the common count/sum case.
    *
    * Use when one key holds a large share of rows (a megacity in a
    * geo-grouped count, a bot user in an event count): the hot key's rows
    * land on `salts` reducers instead of one.
    */
  def saltedSumCount(
      df: DataFrame,
      keyCols: Seq[String],
      sumCols: Seq[String],
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partials = salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(
        count(lit(1)).as("_cnt"),
        sumCols.map(c => sum(col(c)).as(s"_sum_$c")): _*)
    partials
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col("_cnt")).as("cnt"),
        sumCols.map(c => sum(col(s"_sum_$c")).as(s"sum_$c")): _*)
  }

  /** Replicated ("broadcast-salted") join for a skewed key joined against a
    * small dimension that is just over the broadcast threshold: explode the
    * dimension `salts` times, salt the fact side uniformly, and equi-join on
    * (key, salt) — the hot key's rows spread across `salts` reducers, each
    * meeting its own copy of the dimension row.
    */
  def saltedJoin(
      facts: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    // right/full outer would null-extend the (salts-1) unmatched dimension
    // replicas into spurious rows — the replication trick only preserves
    // semantics when dim-only rows don't surface
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin supports inner/left joins only, got $joinType")
    val saltedFacts = facts.withColumn(
      "_salt",
      pmod(hash(facts.columns.map(col): _*), lit(salts)))
    val replicatedDim = dim.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFacts
      .join(replicatedDim, Seq(key, "_salt"), joinType)
      .drop("_salt")
  }

  /** Key-skew diagnosis for a prospective join/aggregation key — the
    * numbers that decide broadcast vs salt vs bucket BEFORE a 100 TB
    * shuffle: one row with total rows, NULL-key rows, distinct keys, the
    * hottest key's count and share, and the Gini coefficient of the
    * per-key count distribution (0 = uniform, →1 = one key owns
    * everything).
    *
    * Exactness: with the per-key counts compressed to the COUNT-OF-COUNTS
    * table (frequency f → m keys), ranks of equal-count keys are
    * consecutive, so the Lorenz sum folds per block —
    * `Σ_i i·c_i = Σ_blocks f·(m·s + m(m+1)/2)` with `s` the cumulative
    * key count of smaller frequencies — and
    * `G = (2S − (K+1)T) / (K·T)` is integers (DECIMAL(38) products)
    * until ONE divide, rounded half-up 6. No per-key tie canon is needed:
    * blocks depend on f alone. G is NULL when K·T = 0.
    *
    * Scale shape: one keyed count (|keys| rows), one frequency aggregate
    * (bounded by DISTINCT FREQUENCY VALUES — heavy-tailed by nature), a
    * window over that bounded table (the grid-quantile discipline), and
    * a one-row fold; per-key rows never sort globally.
    */
  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    val base = df.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("n_null"))
    val counts = df
      .filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("_f"))
    val cc = counts.groupBy(col("_f")).agg(count(lit(1)).as("_m"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_f"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val blocks = cc
      .withColumn("_s", coalesce(sum(col("_m")).over(w), lit(0L)))
      .select(
        (dec(col("_f")) * (dec(col("_m")) * dec(col("_s")) +
          dec(col("_m")) * dec(col("_m") + 1L) / lit(2))).as("_bs"),
        (dec(col("_f")) * dec(col("_m"))).as("_t"),
        col("_m"), col("_f"))
    val folded = blocks.agg(
      coalesce(sum(col("_bs")), dec(lit(0))).as("_S"),
      coalesce(sum(col("_t")), dec(lit(0))).as("_T"),
      coalesce(sum(col("_m")), lit(0L)).as("n_keys"),
      max(col("_f")).as("top1_cnt"))
    base.crossJoin(folded).select(
      col("n_rows"), col("n_null"), col("n_keys"), col("top1_cnt"),
      when(col("n_rows") - col("n_null") === 0L, lit(null).cast("double"))
        .otherwise(graft.Functions.roundHalfUp(
          col("top1_cnt").cast("double") /
            (col("n_rows") - col("n_null")).cast("double"), 6)).as("top1_share"),
      when(dec(col("n_keys")) * col("_T") === dec(lit(0)), lit(null).cast("double"))
        .otherwise(graft.Functions.roundHalfUp(
          (lit(2) * col("_S") - dec(col("n_keys") + 1L) * col("_T")).cast("double") /
            (dec(col("n_keys")) * col("_T")).cast("double"), 6)).as("gini"))
  }
}
