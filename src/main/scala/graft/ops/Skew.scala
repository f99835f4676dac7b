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
}
