package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-pair construction for DPO/RLHF reward modeling (Rafailov et
  * al. 2023; Ouyang et al. 2022 §3.2): from a table of scored candidate
  * responses `(prompt_id, candidate_id, score)`, emit (chosen, rejected)
  * pairs whose score margin clears a threshold — the join that turns
  * best-of-N sampling output into trainer input.
  *
  * Reference analog: the reference's argmax-style device resolution picks
  * one winner per group (`/root/reference/atd_data_lake/
  * device_filter.py:61-97`); preference pairs are that pattern emitting
  * both extremes of each group.
  *
  * Determinism contract: ties on score break toward the SMALLER candidate
  * id on both sides, and a prompt whose best and worst candidate coincide
  * (single candidate) emits nothing. NULL and NaN scores are dropped
  * before pairing — they are unusable as supervision, and NaN would poison
  * min/max ordering differently per engine.
  *
  * Scale shape: [[pairs]] is ONE exchange on the prompt key — struct
  * extremes aggregate as a sort-aggregate (struct buffers aren't
  * hash-aggregable), but PARTIAL aggregation still runs map-side, so the
  * shuffle carries one row per prompt, not one per candidate.
  * [[pairsTopBottom]] bounds the quadratic per-prompt blow-up of all-pairs
  * mining by pruning each side to a fixed top/bottom-k FIRST (grouped
  * heap-free window over the same single exchange), so the pair join is
  * k²-bounded per prompt, never candidates².
  */
object Preference {

  private def usableScore(scoreCol: String): Column =
    col(scoreCol).isNotNull && !isnan(col(scoreCol).cast("double"))

  /** One (chosen, rejected) pair per prompt: chosen = highest score
    * (ties → smallest id), rejected = lowest score (ties → smallest id),
    * kept only when `margin = chosen_score - rejected_score >= minMargin`
    * and the two candidates differ. Output:
    * `(promptCol, chosen_id, rejected_id, chosen_score, rejected_score,
    * margin)`.
    *
    * Both extremes come from ONE `groupBy(prompt)` via struct min/max —
    * `max(struct(score, -id))` is the lexicographic argmax with the
    * smaller id winning ties (negating the id flips the tie direction).
    * The aggregate is a map-side-partial sort-aggregate: one shuffled row
    * per prompt (verified in the executed plan — PlanInvariantsSpec).
    */
  def pairs(
      df: DataFrame,
      promptCol: String,
      idCol: String,
      scoreCol: String,
      minMargin: Double = 0.0): DataFrame = {
    require(minMargin >= 0.0, s"minMargin must be >= 0, got $minMargin")
    val s = col(scoreCol).cast("double")
    df.filter(usableScore(scoreCol) && col(idCol).isNotNull)
      .groupBy(col(promptCol))
      .agg(
        max(struct(s.as("s"), (-col(idCol)).as("negid"))).as("_hi"),
        min(struct(s.as("s"), col(idCol).as("id"))).as("_lo"))
      .select(
        col(promptCol),
        (-col("_hi.negid")).as("chosen_id"),
        col("_lo.id").as("rejected_id"),
        col("_hi.s").as("chosen_score"),
        col("_lo.s").as("rejected_score"),
        (col("_hi.s") - col("_lo.s")).as("margin"))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("margin") >= minMargin)
  }

  /** All (chosen, rejected) combinations from each prompt's top-k vs
    * bottom-k candidates with `margin >= minMargin` — the denser mining
    * variant (k² pairs per prompt max). Sides are pruned to k BEFORE the
    * self-join, so the join input is k-bounded per prompt regardless of
    * how many candidates best-of-N produced; the join itself is keyed on
    * the prompt (one shuffle each side, never a cross join). A candidate
    * appearing in both prunes (top-k ∩ bottom-k overlap on small prompts)
    * never pairs with itself, and `chosen_score > rejected_score` strictly
    * — equal-score pairs carry no preference signal.
    */
  def pairsTopBottom(
      df: DataFrame,
      promptCol: String,
      idCol: String,
      scoreCol: String,
      k: Int,
      minMargin: Double = 0.0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minMargin >= 0.0, s"minMargin must be >= 0, got $minMargin")
    val s = col(scoreCol).cast("double")
    val usable = df.filter(usableScore(scoreCol) && col(idCol).isNotNull)
      .select(col(promptCol), col(idCol), s.as("_s"))
    val topW = Window.partitionBy(col(promptCol))
      .orderBy(col("_s").desc, col(idCol))
    val botW = Window.partitionBy(col(promptCol))
      .orderBy(col("_s").asc, col(idCol))
    val top = usable.withColumn("_rn", row_number().over(topW))
      .filter(col("_rn") <= k)
      .select(col(promptCol), col(idCol).as("chosen_id"), col("_s").as("chosen_score"))
    val bot = usable.withColumn("_rn", row_number().over(botW))
      .filter(col("_rn") <= k)
      .select(col(promptCol), col(idCol).as("rejected_id"), col("_s").as("rejected_score"))
    top.join(bot, Seq(promptCol))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("chosen_score") > col("rejected_score") &&
        (col("chosen_score") - col("rejected_score")) >= minMargin)
      .select(col(promptCol), col("chosen_id"), col("rejected_id"),
        col("chosen_score"), col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("margin"))
  }
}
