package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via importance resampling — the DSIR shape (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling", NeurIPS
  * 2023): estimate hashed n-gram feature distributions on a small TARGET
  * corpus (the data you want more of) and the large RAW corpus, weight every
  * raw document by its log importance ratio `Σ_features ln(p̂_target(f) /
  * p̂_raw(f))`, then resample without replacement by Gumbel top-k.
  *
  * Scale shape: the feature space is `buckets` hash buckets (10⁴–10⁶), so
  * the ratio table is BOUNDED and broadcast — per-doc weighting is one
  * broadcast join over exploded features + one doc-keyed sum, never a
  * corpus×corpus comparison. The top-k is a `TakeOrdered` (k driver rows,
  * no global sort materialization). All randomness is md5-derived
  * ([[Sampling.hashUniform]] discipline), so selection is reproducible in
  * any SQL engine and stable under repartitioning.
  *
  * Determinism: log terms are floored to integer nano-nats and summed as
  * LONGs (the [[TextAnalysis.bigramPerplexity]] discipline).
  */
object ImportanceSampling {

  /** Exploded `(carry..., bucket)` hashed n-gram feature rows: every
    * `n`-token gram of the non-empty whitespace tokens, hashed to
    * `pmod(md5₃₂, buckets)` (the [[TextAnalysis]] index-bucket formula).
    * Documents with fewer than `n` tokens contribute no features — they
    * surface downstream with `n_feats = 0`, they don't vanish.
    */
  def hashedFeatureRows(
      df: DataFrame,
      textCol: String,
      n: Int,
      buckets: Int,
      carryCols: Seq[Column] = Seq.empty): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val toks = filter(Dedup.tokens(col(textCol)), t => t =!= "")
    df.select(carryCols :+ toks.as("_t"): _*)
      .filter(size(col("_t")) >= n)
      .select(carryCols :+ explode(transform(
        sequence(lit(0), size(col("_t")) - n),
        i => pmod(graft.Functions.md5Bits(
          concat_ws(" ", slice(col("_t"), i + 1, lit(n))), 32), lit(buckets))
          .cast("long"))).as("bucket"): _*)
  }

  /** Corpus-level feature histogram `(bucket, cnt)` — the persistable
    * artifact for a target distribution (estimate once on the small target
    * set, reuse across raw shards).
    */
  def featureCounts(df: DataFrame, textCol: String, n: Int, buckets: Int): DataFrame =
    hashedFeatureRows(df, textCol, n, buckets)
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Per-document importance weights against target/raw histograms
    * ([[featureCounts]] outputs): `(id, n_feats, weight)` where `weight =
    * Σ_features [ln((t_b + alpha)/(T + alpha·buckets)) − ln((r_b + alpha)/
    * (R + alpha·buckets))]` in nats rounded half-up 6. The ratio table is
    * built by a bounded full-outer join of the two histograms (≤ `buckets`
    * rows) and broadcast; totals ride one-row broadcast aggregates (the
    * bm25 avgdl trick).
    */
  def importanceWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetCounts: DataFrame,
      rawCounts: DataFrame,
      n: Int,
      buckets: Int,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0.0, s"smoothing alpha must be > 0, got $alpha")
    val nano = (c: Column) => floor(c * lit(1e9) + lit(0.5)).cast("long")
    val tTot = targetCounts.agg(coalesce(sum(col("cnt")), lit(0L)).as("_tt"))
    val rTot = rawCounts.agg(coalesce(sum(col("cnt")), lit(0L)).as("_rt"))
    // the ratio table spans the FULL bucket domain, not just buckets seen
    // in a histogram: a doc feature absent from both corpora still carries
    // the (smoothed) both-zero log ratio ln((R+αB)/(T+αB)) — dropping it
    // would silently skew weights toward docs with unseen vocabulary
    val ratio = docs.sparkSession.range(buckets).select(col("id").as("bucket"))
      .join(targetCounts.select(col("bucket"), col("cnt").as("_tc")), Seq("bucket"), "left")
      .join(rawCounts.select(col("bucket"), col("cnt").as("_rc")), Seq("bucket"), "left")
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(rTot))
      .select(col("bucket"),
        nano(
          log((coalesce(col("_tc"), lit(0L)).cast("double") + lit(alpha)) /
            (col("_tt").cast("double") + lit(alpha * buckets))) -
          log((coalesce(col("_rc"), lit(0L)).cast("double") + lit(alpha)) /
            (col("_rt").cast("double") + lit(alpha * buckets)))).as("_lr"))
    val perDoc = hashedFeatureRows(docs, textCol, n, buckets, Seq(col(idCol)))
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("_lr")).as("_w"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        graft.Functions.roundHalfUp(
          coalesce(col("_w"), lit(0L)).cast("double") / lit(1e9), 6).as("weight"))
  }

  /** Gumbel top-k resampling WITHOUT replacement: each row's sample key is
    * `weight + Gumbel(0,1)` with the Gumbel noise `−ln(−ln(u))` fed by the
    * md5 uniform of the id (offset by half a hash step so u ∈ (0,1) — the
    * log never sees 0). Taking the k largest keys draws k rows without
    * replacement with probability ∝ e^weight — the Gumbel-max trick, fully
    * deterministic given (salt, ids). Returns `(id, weight, sample_key)`,
    * keys rounded half-up 6, ordered by (key desc, id).
    */
  def gumbelTopK(
      weights: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (graft.Functions.md5Bits(
      concat(lit(salt), col(idCol).cast("string")), 32).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    weights
      .select(col(idCol), col(weightCol).as("weight"),
        graft.Functions.roundHalfUp(col(weightCol) - log(-log(u)), 6).as("sample_key"))
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(k)
  }
}
