package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents whose n-gram shingle
  * sets overlap an evaluation/test document — the standard pre-training
  * hygiene pass (report the eval items a train doc covers, drop or flag the
  * train doc). Contamination is measured as containment of the EVAL
  * document: `|train ∩ eval| / |eval|` — a train doc that embeds a whole
  * benchmark item scores 1.0 regardless of how much other text surrounds it.
  *
  * Scale shape (the asymmetry is the whole design): the train corpus is
  * 100 TB, the eval suite is MBs. The eval shingle index is broadcast, so
  * the train side is one scan with a map-side hash probe — no shuffle of
  * train shingles ever happens; the only exchange is the per-(train, eval)
  * pair count over rows that MATCHED an eval shingle, which is proportional
  * to actual contamination, not corpus size. (A 100 GB eval suite would
  * instead use the [[Dedup.ngramContainmentPairs]] inverted-index shuffle
  * shape; the operator picks broadcast because eval suites are small by
  * construction.)
  */
object Decontaminate {

  /** (train_id, eval_id, contamination) pairs with contamination ≥
    * `threshold`, over `n`-word shingles hashed to 60-bit longs (same
    * hashing as the dedup family, so any SQL engine reproduces it).
    */
  def ngramOverlap(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      eval: DataFrame,
      evalIdCol: String,
      evalTextCol: String,
      n: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    require(threshold > 0.0, "broadcast-probe decontamination requires a positive threshold")
    def hashed(df: DataFrame, idCol: String, textCol: String, outId: String) =
      Dedup.shingleRows(df, idCol, textCol, n)
        .select(col(idCol).as(outId), graft.Functions.md5Bits(col("shingle"), 60).as("shh"))
    // distinct eval shingles + per-doc set size: eval-suite-sized, broadcast
    val evalSh = hashed(eval, evalIdCol, evalTextCol, "eval_id")
      .distinct()
      .withColumn("eval_sz", count(lit(1)).over(Window.partitionBy(col("eval_id"))))
    // train side is NOT pre-deduplicated (that would shuffle the whole
    // corpus); duplicate train shingles survive the broadcast probe and are
    // collapsed by the count_distinct in the pair aggregate, which only sees
    // matched rows
    val matches = hashed(train, trainIdCol, trainTextCol, "train_id")
      .join(broadcast(evalSh), Seq("shh"))
    matches
      .groupBy(col("train_id"), col("eval_id"), col("eval_sz"))
      .agg(count_distinct(col("shh")).as("inter"))
      .select(
        col("train_id"), col("eval_id"),
        graft.Functions.roundHalfUp(
          col("inter").cast("double") / col("eval_sz").cast("double"), 4)
          .as("contamination"))
      .filter(col("contamination") >= threshold)
  }
}
