package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label-noise detection via confident learning (Northcutt, Jiang & Chuang
  * 2021, JAIR — "Confident Learning: Estimating Uncertainty in Dataset
  * Labels"): given a model's per-class predicted probabilities and the
  * dataset's given labels, estimate per-class confidence thresholds
  * `t_j = mean p_j over items labeled j`, then flag items whose
  * probability for some OTHER class clears that class's threshold — the
  * standard pre-training triage for mislabeled SFT/classifier data.
  *
  * Reference analog: the reference's bad-device contingency tagging
  * (`/root/reference/atd_data_lake/device_filter.py:61-97`) flags rows
  * whose observed attributes contradict their catalog assignment; this is
  * the probabilistic generalization.
  *
  * Determinism contract: probabilities quantize to integer MICRO units on
  * ingestion; the threshold comparison `p_k ≥ t_k` is evaluated as the
  * integer cross-multiplication `pm_k · cnt_k ≥ Σpm_k` — NO division ever
  * happens, so there is no rounding to disagree on. The suggested class is
  * the qualified class with the highest probability (ties → smaller class
  * id). Items qualifying for no class keep `suggested = NULL, flagged =
  * false` (confident learning drops them from the joint rather than
  * guessing). NULL items/labels/classes/probs and NaN probs drop.
  *
  * Scale shape: thresholds are a CLASS-bounded aggregate joined back by
  * broadcast; the per-item argmax is ONE map-side-combinable struct-max
  * aggregate (the DPO-pairs shape — one shuffled row per item, never one
  * per class); the item spine rejoins with a single keyed left join.
  */
object LabelNoise {

  /** Per-item noise flags: `(item, given, suggested, flagged)`. Input is
    * LONG format — one row per (item, class) with that class's predicted
    * probability; `givenCol` must be constant per item (enforced by
    * taking max, which is a no-op for well-formed input).
    */
  def confidentFlags(
      df: DataFrame,
      itemCol: String,
      givenCol: String,
      classCol: String,
      probCol: String): DataFrame = {
    val base = df
      .filter(col(itemCol).isNotNull && col(givenCol).isNotNull &&
        col(classCol).isNotNull && col(probCol).isNotNull &&
        !isnan(col(probCol).cast("double")))
      .select(
        col(itemCol).as("item"),
        col(givenCol).cast("long").as("given"),
        col(classCol).cast("long").as("_cls"),
        floor(col(probCol).cast("double") * 1e6 + lit(0.5)).cast("long").as("_pm"))
    val thresholds = base
      .filter(col("_cls") === col("given"))
      .groupBy(col("_cls"))
      .agg(count(lit(1)).as("_cnt"), sum(col("_pm")).as("_spm"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val qualified = base
      .join(broadcast(thresholds), Seq("_cls"))
      .filter(dec(col("_pm")) * dec(col("_cnt")) >= dec(col("_spm")))
    val winners = qualified
      .groupBy(col("item"))
      .agg(max(struct(col("_pm"), (-col("_cls")).as("_negc"), col("_cls"))).as("_w"))
      .select(col("item"), col("_w._cls").as("suggested"))
    base
      .groupBy(col("item"))
      .agg(max(col("given")).as("given"))
      .join(winners, Seq("item"), "left")
      .select(
        col("item"), col("given"), col("suggested"),
        coalesce(col("suggested") =!= col("given"), lit(false)).as("flagged"))
  }

  /** The confident joint: counts per (given, suggested) cell over items
    * that qualified for some class — the matrix whose off-diagonal mass
    * IS the estimated label-error rate. One bounded keyed aggregate over
    * [[confidentFlags]] output.
    */
  def confidentJoint(flags: DataFrame): DataFrame =
    flags
      .filter(col("suggested").isNotNull)
      .groupBy(col("given"), col("suggested"))
      .agg(count(lit(1)).as("n"))
}
