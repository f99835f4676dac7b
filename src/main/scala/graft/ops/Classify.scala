package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed text classification — the fastText-shaped quality/domain
  * classifier every production corpus pipeline runs (CCNet/GPT-3-style
  * "score every page against a trusted-corpus model"), as a multinomial
  * Naive Bayes over whitespace tokens. Training is two map-side-combinable
  * aggregates; scoring is one keyed join plus a bounded broadcast — nothing
  * iterative, nothing driver-side, which is exactly why NB (not SGD) is the
  * right first classifier at 100 TB.
  *
  * Determinism contract: every log term is floored to integer nano-nats and
  * summed as LONGs (the [[TextAnalysis.bigramPerplexity]] discipline) —
  * float sums are partition-order-dependent, integer sums are not — so
  * scores and argmax labels are bit-identical across engines, reruns, and
  * partitionings.
  *
  * Reference analog: the reference tags and routes records by
  * source/data-type metadata (`/root/reference/atd_data_lake/config/
  * config_app.py` purpose tables); this learns the routing signal from
  * content instead.
  */
object Classify {

  /** Non-empty whitespace tokens — the corpus-wide tokenization contract
    * ([[Dedup.tokens]] minus empty strings, the [[Dedup.windowRows]] form).
    * NULL text counts as empty: `size(NULL)` is -1 under Spark's legacy
    * sizeOfNull, which would corrupt the n_tokens·default score term.
    */
  private def toks(text: Column): Column =
    filter(Dedup.tokens(coalesce(text, lit(""))), t => t =!= "")

  /** Exploded (label, token) rows with repetitions — multinomial evidence. */
  private def tokenRows(train: DataFrame, labelCol: String, textCol: String): DataFrame =
    train.select(col(labelCol).as("label"), explode(toks(col(textCol))).as("token"))

  /** Per-(label, token) add-alpha conditional log-likelihoods:
    * `(label, token, cnt, log_cond)` with
    * `log_cond = ln((cnt + alpha) / (N_label + alpha·vocabSize))` rounded
    * half-up 6. `vocabSize` is the caller-supplied distinct train-token
    * count (bounded driver value — the [[TextAnalysis.bigramPerplexity]] /
    * `tfidf` contract, keeps the relation lazily composable).
    */
  def nbTokenLogProbs(
      train: DataFrame,
      labelCol: String,
      textCol: String,
      vocabSize: Long,
      alpha: Double = 1.0): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive (distinct train tokens)")
    require(alpha > 0.0, "add-alpha smoothing needs alpha > 0")
    val counts = tokenRows(train, labelCol, textCol)
      .groupBy("label", "token").agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy("label").agg(sum(col("cnt")).as("_tot"))
    counts.join(totals, Seq("label"))
      .select(col("label"), col("token"), col("cnt"),
        graft.Functions.roundHalfUp(
          log((col("cnt").cast("double") + lit(alpha)) /
            (col("_tot").cast("double") + lit(alpha * vocabSize))), 6).as("log_cond"))
  }

  /** A fitted model: `tokenLogLik(label, token, _lp)` with `_lp` the
    * add-alpha conditional log-likelihood in integer nano-nats, and
    * `labelStats(label, _prior, _default)` with the log prior and the
    * unseen-token default, same units. Both are bounded relations
    * (vocab×labels / labels) — the persistable build-once/score-many
    * artifact ([[saveNbModel]]/[[loadNbModel]]).
    */
  case class NbModel(tokenLogLik: DataFrame, labelStats: DataFrame)

  /** Fit the model: ONE corpus-scale token-count pass (localCheckpoint'd —
    * without the barrier the count pipeline appears in four plan subtrees
    * and Spark re-scans the train corpus for each; the [[IvfIndex.refine]]
    * discipline) plus one narrow doc-count pass for the priors. Totals ride
    * broadcast one-row aggregates (the bm25 avgdl trick — no driver
    * action).
    */
  def nbFit(
      train: DataFrame,
      labelCol: String,
      textCol: String,
      vocabSize: Long,
      alpha: Double = 1.0): NbModel = {
    require(vocabSize > 0, "vocabSize must be positive (distinct train tokens)")
    require(alpha > 0.0, "add-alpha smoothing needs alpha > 0")
    val nano = (c: Column) => floor(c * lit(1e9) + lit(0.5)).cast("long")
    val counts = tokenRows(train, labelCol, textCol)
      .groupBy("label", "token").agg(count(lit(1)).as("_c"))
      .localCheckpoint(true)
    val totals = counts.groupBy("label").agg(sum(col("_c")).as("_tot"))
    val docCounts = train.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("_d"))
    val totalDocs = docCounts.agg(sum(col("_d")).as("_td"))
    val labelStats = docCounts
      .crossJoin(broadcast(totalDocs))
      .join(totals, Seq("label"))
      .select(col("label"),
        nano(log(col("_d").cast("double") / col("_td").cast("double"))).as("_prior"),
        nano(log(lit(alpha) /
          (col("_tot").cast("double") + lit(alpha * vocabSize)))).as("_default"))
    val lp = counts.join(totals, Seq("label"))
      .select(col("label"), col("token"),
        nano(log((col("_c").cast("double") + lit(alpha)) /
          (col("_tot").cast("double") + lit(alpha * vocabSize)))).as("_lp"))
    NbModel(lp, labelStats)
  }

  /** Score `docs` against a fitted model: `(id, label, n_tokens, score)`
    * for EVERY (document × model label), `score = ln P(label) +
    * Σ_tokens ln P(token|label)` in nats (rounded half-up 6).
    *
    * Shape: the per-label token table is joined ONCE on `token` (inner —
    * corpus-sized probe, vocab-sized build), and the unseen-token default
    * is algebra, not a join: score = prior + n_tokens·default +
    * Σ_matched (log_cond − default). The label-stats relation is
    * labels-sized and broadcast; a hot token skews the probe side only.
    */
  def nbScoresWith(
      model: NbModel,
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val docToks = docs.select(col(idCol), explode(toks(col(textCol))).as("token"))
    val adj = docToks
      .join(model.tokenLogLik, Seq("token"))
      .join(broadcast(model.labelStats.select(col("label"), col("_default"))), Seq("label"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("_lp") - col("_default")).as("_adj"))
    docs.select(col(idCol), size(toks(col(textCol))).cast("long").as("n_tokens"))
      .crossJoin(broadcast(model.labelStats))
      .join(adj, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"), col("n_tokens"),
        (col("_prior") + col("n_tokens") * col("_default") +
          coalesce(col("_adj"), lit(0L))).as("_nano"))
      .select(col(idCol), col("label"), col("n_tokens"),
        graft.Functions.roundHalfUp(col("_nano").cast("double") / lit(1e9), 6).as("score"))
  }

  /** [[nbFit]] + [[nbScoresWith]] in one expression (the self-contained
    * train-and-score form the oracle queries use).
    */
  def nbScores(
      train: DataFrame,
      labelCol: String,
      trainTextCol: String,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Long,
      alpha: Double = 1.0): DataFrame =
    nbScoresWith(nbFit(train, labelCol, trainTextCol, vocabSize, alpha), docs, idCol, textCol)

  private val NbMetaFile = "_nb_meta.json"

  /** Persist the fitted model: the token table partitioned nowhere (vocab×
    * labels rows — a scan, not a lookup), label stats as one file, plus a
    * marker sidecar so [[loadNbModel]] refuses bare directories.
    */
  def saveNbModel(model: NbModel, path: String): Unit = {
    model.tokenLogLik.write.mode("overwrite").parquet(s"$path/tokens")
    model.labelStats.coalesce(1).write.mode("overwrite").parquet(s"$path/labels")
    val spark = model.tokenLogLik.sparkSession
    val p = new org.apache.hadoop.fs.Path(path, NbMetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write("""{"format":"nb-v1"}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def loadNbModel(spark: org.apache.spark.sql.SparkSession, path: String): NbModel = {
    val p = new org.apache.hadoop.fs.Path(path, NbMetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$path has no $NbMetaFile — not a model written by saveNbModel")
    NbModel(spark.read.parquet(s"$path/tokens"), spark.read.parquet(s"$path/labels"))
  }

  /** Argmax over [[nbScores]]: `(id, pred_label, score)` — one row per
    * document. The argmax orders on the ROUNDED score (the published
    * value), ties to the lexicographically smallest label — so an oracle
    * recomputing the same rounded scores picks the same winner.
    */
  def nbPredict(
      train: DataFrame,
      labelCol: String,
      trainTextCol: String,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Long,
      alpha: Double = 1.0): DataFrame =
    argmax(
      nbScores(train, labelCol, trainTextCol, docs, idCol, textCol, vocabSize, alpha), idCol)

  /** [[nbPredict]] against a fitted/loaded model — the score-many form. */
  def nbPredictWith(
      model: NbModel,
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    argmax(nbScoresWith(model, docs, idCol, textCol), idCol)

  private def argmax(scored: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("label"))
    scored
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(idCol), col("label").as("pred_label"), col("score"))
  }

  /** χ² token–label association — the classic feature-selection score for
    * the classifier family (which tokens predict which label): for each
    * (token, label) the one-vs-rest 2×2 document-frequency contingency
    * table (A = docs with token & label, B = token & ¬label, C = ¬token &
    * label, D = neither) scored
    * `χ² = n·(AD − BC)² / ((A+B)(C+D)(A+C)(B+D))`.
    *
    * Scale shape: distinct (doc, token) pairs — one corpus pass — then a
    * token-keyed count aggregate; the per-label document totals are a
    * bounded one-row-per-label aggregate joined broadcast. All counts are
    * exact integers; the formula evaluates in DOUBLE mirrored by the
    * oracle. `minDf` prunes the hapax tail before the join (at web scale
    * almost all tokens, and χ² is meaningless at df=1 anyway).
    *
    * Output: (token, label, df_label, chi2) per surviving (token, label).
    */
  def chiSquareTokens(
      docs: DataFrame,
      labelCol: String,
      textCol: String,
      minDf: Long = 2L): DataFrame = {
    val base = docs.filter(col(labelCol).isNotNull)
    val docTok = base
      .select(col(labelCol).as("label"), explode(array_distinct(toks(col(textCol)))).as("token"))
    val labelTotals = base.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_label"))
    val n = base.count() // one bounded scalar → plan-time literal
    val tokLabel = docTok.groupBy("token", "label").agg(count(lit(1)).as("a"))
    val tokTotals = tokLabel.groupBy("token").agg(sum(col("a")).as("df_tok"))
      .filter(col("df_tok") >= minDf)
    val cells = tokLabel
      .join(tokTotals, Seq("token")) // semi-prunes below-minDf tokens too
      .join(broadcast(labelTotals), Seq("label"))
      .select(
        col("token"), col("label"), col("a").as("df_label"),
        col("a").cast("double").as("_a"),
        (col("df_tok") - col("a")).cast("double").as("_b"),
        (col("n_label") - col("a")).cast("double").as("_c"),
        (lit(n) - col("df_tok") - col("n_label") + col("a")).cast("double").as("_d"))
    val ad_bc = col("_a") * col("_d") - col("_b") * col("_c")
    val denom = (col("_a") + col("_b")) * (col("_c") + col("_d")) *
      (col("_a") + col("_c")) * (col("_b") + col("_d"))
    cells.select(
      col("token"), col("label"), col("df_label"),
      when(denom === 0, lit(null).cast("double"))
        .otherwise(graft.Functions.roundHalfUp(
          lit(n.toDouble) * ad_bc * ad_bc / denom, 6))
        .as("chi2"))
  }
}
