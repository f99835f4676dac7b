package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality metrics — precision/recall/hit@k, MRR, NDCG — over a
  * run table of scored candidates and a qrels table of graded relevance
  * judgments (the TREC evaluation contract; NDCG per Järvelin &
  * Kekäläinen 2002). This is the measurement half of the
  * [[SimilaritySearch]] family: retrieval without these numbers is a
  * vibe, and a recall sweep (IVF nProbe, LSH bands) needs them per
  * configuration.
  *
  * Reference analog: the reference's perfmet health reporting
  * (`/root/reference/atd_data_lake/perfmet.py:103-138`) aggregates
  * per-sensor observation quality the same way this aggregates per-query
  * retrieval quality — a keyed metric table over a join of observed
  * against expected.
  *
  * Determinism contract: ranks derive from `(score DESC, doc ASC)` —
  * bit-stable for any scored run. Unjudged retrieved docs count as
  * relevance 0 (the TREC convention). DCG terms quantize to integer
  * NANO units — `floor(rel / log2(rank+1) · 1e9 + 0.5)`, with log2
  * spelled `ln(x)/ln(2)` so both engines run the same IEEE ops — BEFORE
  * the per-query sum, so the sum is order-free; NDCG is one quantized
  * divide of the two nano sums. `recall` is NULL when a query has zero
  * relevant docs (undefined, not 0); `ndcg` likewise when IDCG = 0.
  *
  * Scale shape: the run table is already top-k-bounded per query
  * (|Q|·k rows); the qrels join is keyed on (query, doc); per-query
  * ideal-DCG is a window over each query's bounded judgment set; output
  * is one row per query. No global sort anywhere.
  */
object RankEval {

  private def q9(c: Column): Column = floor(c * lit(1e9) + lit(0.5)).cast("long")

  private def log2d(c: Column): Column = log(c) / log(lit(2.0))

  /** Per-query metrics at cutoff `k`: `(query, n_rel, n_hits, precision,
    * recall, rr, dcg, idcg, ndcg)`. `runs` holds scored candidates
    * `(qidCol, docCol, scoreCol)`; `qrels` holds judgments `(relQidCol,
    * relDocCol, relCol)` with graded relevance ≥ 0 (0 = judged
    * irrelevant). Every query present in `runs` emits a row.
    */
  def metricsAtK(
      runs: DataFrame,
      qidCol: String,
      docCol: String,
      scoreCol: String,
      qrels: DataFrame,
      relQidCol: String,
      relDocCol: String,
      relCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rels = qrels
      .filter(col(relQidCol).isNotNull && col(relDocCol).isNotNull && col(relCol).isNotNull)
      .select(
        col(relQidCol).as("query"),
        col(relDocCol).as("_doc"),
        col(relCol).cast("long").as("_rel"))

    // observed side: rank the run, keep top k, attach judgments
    val rankW = Window.partitionBy(col("query"))
      .orderBy(col("_score").desc, col("_doc"))
    val ranked = runs
      .filter(col(qidCol).isNotNull && col(docCol).isNotNull)
      .select(
        col(qidCol).as("query"),
        col(docCol).as("_doc"),
        col(scoreCol).cast("double").as("_score"))
      .withColumn("_rank", row_number().over(rankW))
      .filter(col("_rank") <= k)
      .join(rels, Seq("query", "_doc"), "left")
      .withColumn("_rel", coalesce(col("_rel"), lit(0L)))
    val observed = ranked
      .groupBy(col("query"))
      .agg(
        sum(when(col("_rel") > 0L, 1L).otherwise(0L)).as("n_hits"),
        min(when(col("_rel") > 0L, col("_rank"))).as("_first_hit"),
        sum(q9(col("_rel").cast("double") / log2d(col("_rank").cast("double") + lit(1.0))))
          .as("_dcg_nano"))

    // ideal side: this query's judgments sorted by relevance — what a
    // perfect ranker would have put in the first min(k, |rel>0|) slots
    val idealW = Window.partitionBy(col("query"))
      .orderBy(col("_rel").desc, col("_doc"))
    val ideal = rels
      .filter(col("_rel") > 0L)
      .withColumn("_irank", row_number().over(idealW))
      .groupBy(col("query"))
      .agg(
        count(lit(1)).as("n_rel"),
        sum(when(col("_irank") <= k,
          q9(col("_rel").cast("double") / log2d(col("_irank").cast("double") + lit(1.0))))
          .otherwise(0L)).as("_idcg_nano"))

    observed
      .join(ideal, Seq("query"), "left")
      .select(
        col("query"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("n_hits"),
        graft.Functions.roundHalfUp(col("n_hits").cast("double") / lit(k.toDouble), 6)
          .as("precision"),
        when(coalesce(col("n_rel"), lit(0L)) === 0L, lit(null).cast("double"))
          .otherwise(graft.Functions.roundHalfUp(
            col("n_hits").cast("double") / col("n_rel").cast("double"), 6))
          .as("recall"),
        when(col("_first_hit").isNull, lit(0.0))
          .otherwise(graft.Functions.roundHalfUp(
            lit(1.0) / col("_first_hit").cast("double"), 6))
          .as("rr"),
        graft.Functions.roundHalfUp(col("_dcg_nano").cast("double") / lit(1e9), 6)
          .as("dcg"),
        graft.Functions.roundHalfUp(
          coalesce(col("_idcg_nano"), lit(0L)).cast("double") / lit(1e9), 6)
          .as("idcg"),
        when(coalesce(col("_idcg_nano"), lit(0L)) <= 0L, lit(null).cast("double"))
          .otherwise(graft.Functions.roundHalfUp(
            col("_dcg_nano").cast("double") / col("_idcg_nano").cast("double"), 6))
          .as("ndcg"))
  }

  /** Grouped ROC-AUC via the exact Mann–Whitney rank-sum identity —
    * `AUC = (Σ_{pos} r̄ − nP(nP+1)/2) / (nP·nN)` with r̄ the AVERAGE rank
    * under ascending score (ties share their mean rank — the standard
    * tie-corrected U statistic). The classifier-quality number a filter
    * model (GPT-3/CCNet-style) reports per domain/language stratum.
    *
    * Exactness: average ranks are carried DOUBLED — `2r̄ = 2·rank_min +
    * (ties−1)` is always an integer — so the whole statistic is integers
    * until one final divide: `AUC = (Σ 2r̄ − nP(nP+1)) / (2·nP·nN)`,
    * rounded half-up 6. No float ever aggregates. AUC is NULL when a group
    * lacks either class (undefined, not 0.5 — reporting chance level for
    * an unmeasurable group would smuggle in a judgment). NULL/NaN scores
    * and NULL labels drop.
    *
    * Scale shape: ONE exchange on the group key; rank_min and the tie
    * count ride two window passes over the same (group, score) sort order
    * (no second exchange); the final fold is a map-side-combinable keyed
    * aggregate. Per-group data must fit a partition's sort — the grouped
    * eval contract, same class as [[metricsAtK]]'s per-query windows.
    */
  def aucByGroup(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      labelCol: String): DataFrame = {
    val base = df
      .filter(col(groupCol).isNotNull && col(labelCol).isNotNull &&
        col(scoreCol).isNotNull && !isnan(col(scoreCol).cast("double")))
      .select(
        col(groupCol).as("grp"),
        col(scoreCol).cast("double").as("_s"),
        when(col(labelCol).cast("long") > 0L, 1L).otherwise(0L).as("_y"))
    val rankW = Window.partitionBy(col("grp")).orderBy(col("_s"))
    val tieW = Window.partitionBy(col("grp"), col("_s"))
    val ranked = base
      .withColumn("_rmin", rank().over(rankW))
      .withColumn("_ties", count(lit(1)).over(tieW))
      .withColumn("_2r", lit(2L) * col("_rmin") + (col("_ties") - 1L))
    ranked
      .groupBy(col("grp"))
      .agg(
        sum(col("_y")).as("n_pos"),
        sum(lit(1L) - col("_y")).as("n_neg"),
        sum(when(col("_y") === 1L, col("_2r")).otherwise(0L)).as("_s2"))
      .select(
        col("grp"), col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null).cast("double"))
          .otherwise(graft.Functions.roundHalfUp(
            (col("_s2") - col("n_pos") * (col("n_pos") + 1L)).cast("double") /
              (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")), 6))
          .as("auc"))
  }

  /** Reliability-diagram bins for a probabilistic classifier: per (group,
    * bin) — count, hits, mean confidence, empirical accuracy. Bin
    * `floor(p·bins)` clamped to bins−1 (so p = 1.0 lands in the last bin);
    * the bin index derives from the RAW double — one IEEE multiply+floor,
    * identical in any engine. Per-row probabilities quantize to integer
    * MICRO units before the confidence sum, so the sum is order-free.
    * NULL/NaN probabilities and NULL labels drop; p outside [0, 1] is
    * clamped into the edge bins (bin 0 below, bin bins−1 above) so a
    * stray out-of-range score can never write a negative bin index —
    * the micro-unit confidence sum still records the raw p, so the
    * reliability row for the edge bin exposes the anomaly (conf outside
    * the bin's nominal range) instead of silently corrupting the table.
    */
  def calibrationBins(
      df: DataFrame,
      groupCol: String,
      probCol: String,
      labelCol: String,
      bins: Int): DataFrame =
    calibrationFromCounts(calibrationCounts(df, groupCol, probCol, labelCol, bins))

  /** The raw mergeable state behind [[calibrationBins]]: per (group, bin)
    * — count, hits, and the micro-unit confidence sum, all integers. Two
    * batches' counts ADD per cell (spec-asserted merge law), so a
    * streaming consumer maintains calibration exactly by folding each
    * batch with [[mergeCalibrationCounts]] — the CMS/grid-quantile
    * register discipline.
    */
  def calibrationCounts(
      df: DataFrame,
      groupCol: String,
      probCol: String,
      labelCol: String,
      bins: Int): DataFrame =
    calibrationEvents(df, groupCol, probCol, labelCol, bins)
      .groupBy(col("grp"), col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("hits"),
        sum(col("pm")).as("spm"))

  /** The per-ROW calibration projection under [[calibrationCounts]] —
    * `(grp, bin, y, pm)`, one row per usable prediction. Public because it
    * is the event grain an INCREMENTALLY-maintained calibration table
    * ingests: `n = Σ 1`, `hits = Σ y`, `spm = Σ pm` are all signed sums,
    * so a [[graft.catalog.MaterializedAgg]] with
    * `groupCols = (grp, bin), sumCols = (y, pm)` maintains the exact
    * [[calibrationCounts]] state — retractions included — at CDF delta
    * cost, and [[eceFromCounts]] turns any snapshot of that state into
    * the live ECE (the continuous filter-model monitor).
    */
  def calibrationEvents(
      df: DataFrame,
      groupCol: String,
      probCol: String,
      labelCol: String,
      bins: Int,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    // carry columns ride alongside the generated event columns in the same
    // projection — a carry named like one of them (or like the transient
    // _p) would be ambiguous-or-shadowed downstream, silently
    val reserved = Set("grp", "bin", "y", "pm", "_p")
    require(!carryCols.exists(reserved.contains),
      s"carryCols must not collide with generated columns ${reserved.mkString("/")}, got $carryCols")
    df
      .filter(col(groupCol).isNotNull && col(labelCol).isNotNull &&
        col(probCol).isNotNull && !isnan(col(probCol).cast("double")))
      .select(carryCols.map(col) ++ Seq(
        col(groupCol).as("grp"),
        col(probCol).cast("double").as("_p"),
        when(col(labelCol).cast("long") > 0L, 1L).otherwise(0L).as("y")): _*)
      .select(carryCols.map(col) ++ Seq(
        col("grp"),
        greatest(least(floor(col("_p") * bins).cast("long"), lit(bins - 1L)), lit(0L))
          .as("bin"),
        col("y"),
        floor(col("_p") * 1e6 + lit(0.5)).cast("long").as("pm")): _*)
  }

  /** Per-cell addition of two [[calibrationCounts]] tables. */
  def mergeCalibrationCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("grp"), col("bin"))
      .agg(sum(col("n")).as("n"), sum(col("hits")).as("hits"), sum(col("spm")).as("spm"))

  /** Derive the reliability diagram (conf, acc per cell) from counts. */
  def calibrationFromCounts(counts: DataFrame): DataFrame =
    counts.select(
      col("grp"), col("bin"), col("n"), col("hits"),
      graft.Functions.roundHalfUp(
        col("spm").cast("double") / (col("n").cast("double") * 1e6), 6).as("conf"),
      graft.Functions.roundHalfUp(
        col("hits").cast("double") / col("n").cast("double"), 6).as("acc"))

  /** Expected calibration error per group, folded from the same micro-unit
    * arithmetic as [[calibrationBins]]: `ECE = Σ_b (n_b/N)·|acc_b − conf_b|
    * = Σ_b |hits_b·10⁶ − Σpm_b| / (N·10⁶)` — every term integer, ONE
    * divide at the end (rounded half-up 6). One row per group:
    * `(grp, n, ece)`.
    */
  def ece(
      df: DataFrame,
      groupCol: String,
      probCol: String,
      labelCol: String,
      bins: Int): DataFrame =
    eceFromCounts(calibrationCounts(df, groupCol, probCol, labelCol, bins))

  /** [[ece]] folded from an already-maintained [[calibrationCounts]] table
    * `(grp, bin, n, hits, spm)` — what a continuously-maintained
    * calibration state (a [[graft.catalog.MaterializedAgg]] over the lake
    * CDF, or a streaming [[mergeCalibrationCounts]] fold) reads out as the
    * live metric without touching row-grain data.
    */
  def eceFromCounts(counts: DataFrame): DataFrame =
    counts
      .groupBy(col("grp"))
      .agg(
        sum(col("n")).as("n"),
        sum(abs(col("hits") * lit(1000000L) - col("spm"))).as("_dev"))
      .select(
        col("grp"), col("n"),
        graft.Functions.roundHalfUp(
          col("_dev").cast("double") / (col("n").cast("double") * 1e6), 6).as("ece"))

  /** Per-query average precision at cutoff `k` (binary relevance: rel > 0)
    * — the area-under-PR-curve companion to [[metricsAtK]]'s NDCG:
    * `AP = (1/n_rel) · Σ_{i ≤ k, rel_i} P@i`, with each precision term
    * `hits_≤i / i` quantized to integer NANO units BEFORE the per-query
    * sum (order-free — the DCG discipline), and ONE final divide by the
    * TOTAL judged-relevant count (TREC convention: missing relevant docs
    * cost you, whether they were below the cutoff or never retrieved).
    * AP is NULL when a query has no judged-relevant docs. Ranks derive
    * from `(score DESC, doc ASC)`; unjudged docs count relevance 0.
    *
    * Scale shape: identical to [[metricsAtK]] — the run is |Q|·k-bounded,
    * the running hit count rides the SAME per-query sort as the rank
    * window, and the qrels join is keyed.
    */
  def averagePrecisionAtK(
      runs: DataFrame,
      qidCol: String,
      docCol: String,
      scoreCol: String,
      qrels: DataFrame,
      relQidCol: String,
      relDocCol: String,
      relCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rels = qrels
      .filter(col(relQidCol).isNotNull && col(relDocCol).isNotNull && col(relCol).isNotNull)
      .select(
        col(relQidCol).as("query"),
        col(relDocCol).as("_doc"),
        col(relCol).cast("long").as("_rel"))
    val rankW = Window.partitionBy(col("query"))
      .orderBy(col("_score").desc, col("_doc"))
    val cumW = rankW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perQuery = runs
      .filter(col(qidCol).isNotNull && col(docCol).isNotNull)
      .select(
        col(qidCol).as("query"),
        col(docCol).as("_doc"),
        col(scoreCol).cast("double").as("_score"))
      .withColumn("_rank", row_number().over(rankW))
      .filter(col("_rank") <= k)
      .join(rels, Seq("query", "_doc"), "left")
      .withColumn("_hit", when(coalesce(col("_rel"), lit(0L)) > 0L, 1L).otherwise(0L))
      .withColumn("_cumhits", sum(col("_hit")).over(cumW))
      .groupBy(col("query"))
      .agg(sum(when(col("_hit") === 1L,
        q9(col("_cumhits").cast("double") / col("_rank").cast("double")))
        .otherwise(0L)).as("_ap_nano"))
    val relTotals = rels
      .filter(col("_rel") > 0L)
      .groupBy(col("query"))
      .agg(count(lit(1)).as("n_rel"))
    perQuery
      .join(relTotals, Seq("query"), "left")
      .select(
        col("query"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        when(coalesce(col("n_rel"), lit(0L)) === 0L, lit(null).cast("double"))
          .otherwise(graft.Functions.roundHalfUp(
            col("_ap_nano").cast("double") / (col("n_rel").cast("double") * 1e9), 6))
          .as("ap"))
  }

  /** Split conformal prediction (Vovk et al.; Angelopoulos & Bates 2023
    * tutorial): from a CALIBRATION set of nonconformity scores (higher =
    * more nonconforming), the threshold
    * `q̂ = the ⌈(n+1)(1−α)⌉-th smallest score` guarantees marginal
    * coverage ≥ 1−α on exchangeable test data — the distribution-free
    * "how confident is this filter model" wrapper that needs no model
    * internals. Reports the threshold AND the realized test coverage in
    * one row: `(n_cal, k, qhat, n_test, n_covered, coverage)`.
    *
    * Conventions: when k > n (tiny calibration set for the requested α)
    * the honest threshold is +∞ — `qhat` is NULL and every test row
    * counts covered. NULL/NaN scores drop on both sides. The k-th order
    * statistic is a VALUE, so rank ties among equal scores cannot change
    * it. `qhat` rounds half-up 6 for display; the coverage comparison
    * uses the raw double.
    *
    * Scale shape: one global rank window over the CALIBRATION set — a
    * bounded eval-scale relation by contract (the [[metricsAtK]]
    * per-query window class; never run this on a corpus) — and one
    * map-side-combinable fold over the test side.
    */
  def splitConformal(
      cal: DataFrame,
      test: DataFrame,
      scoreCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0, 1), got $alpha")
    def scores(df: DataFrame) = df
      .filter(col(scoreCol).isNotNull && !isnan(col(scoreCol).cast("double")))
      .select(col(scoreCol).cast("double").as("_s"))
    val calS = scores(cal)
    val nk = calS.agg(count(lit(1)).as("n_cal"))
      .select(col("n_cal"),
        ceil((col("n_cal") + 1L).cast("double") * (1.0 - alpha)).cast("long").as("k"))
    val ranked = calS.withColumn("_rn",
      row_number().over(Window.orderBy(col("_s"))))
    val qhat = ranked
      .crossJoin(broadcast(nk))
      .filter(col("_rn") <= col("k"))
      .agg(max(col("_s")).as("_qraw"))
    val covered = scores(test)
      .crossJoin(broadcast(nk.crossJoin(qhat)))
      .agg(
        count(lit(1)).as("n_test"),
        coalesce(sum(when(col("k") > col("n_cal") || col("_s") <= col("_qraw"), 1L)
          .otherwise(0L)), lit(0L)).as("n_covered"))
    nk.crossJoin(qhat).crossJoin(covered).select(
      col("n_cal"), col("k"),
      when(col("k") > col("n_cal"), lit(null).cast("double"))
        .otherwise(graft.Functions.roundHalfUp(col("_qraw"), 6)).as("qhat"),
      col("n_test"), col("n_covered"),
      when(col("n_test") === 0L, lit(null).cast("double"))
        .otherwise(graft.Functions.roundHalfUp(
          col("n_covered").cast("double") / col("n_test").cast("double"), 6))
        .as("coverage"))
  }

  /** Per-class classification report — precision / recall / F1 per class
    * over (label, prediction) pairs, the multiclass completion of the
    * eval family (a domain/language/quality classifier's scorecard).
    * Classes = the union of observed labels and predictions, so a class
    * the model never predicts (or invents) still gets its row.
    *
    * Exactness: tp/fp/fn are integer cells of the (label, pred)
    * contingency (ONE bounded keyed aggregate — cells ≤ classes², never
    * corpus-scale); precision/recall are single divides rounded half-up
    * 6, F1 = 2pr/(p+r) computed FROM THE ROUNDED p and r (the oracle
    * replays the same two-step). The sklearn zero-division convention:
    * a metric with a zero denominator reports 0.0, and the `defined`
    * flags say which cells were degenerate rather than smuggling the
    * judgment into the number.
    */
  def classificationReport(
      df: DataFrame,
      labelCol: String,
      predCol: String): DataFrame = {
    val cells = df
      .filter(col(labelCol).isNotNull && col(predCol).isNotNull)
      .select(col(labelCol).cast("string").as("_l"), col(predCol).cast("string").as("_p"))
      .groupBy(col("_l"), col("_p"))
      .agg(count(lit(1)).as("_n"))
    val classes = cells.select(col("_l").as("cls"))
      .unionByName(cells.select(col("_p").as("cls"))).distinct()
    val tp = cells.filter(col("_l") === col("_p"))
      .select(col("_l").as("cls"), col("_n").as("_tp"))
    val predTot = cells.groupBy(col("_p").as("cls")).agg(sum(col("_n")).as("_pt"))
    val labelTot = cells.groupBy(col("_l").as("cls")).agg(sum(col("_n")).as("_lt"))
    val p = col("precision")
    val r = col("recall")
    classes
      .join(tp, Seq("cls"), "left")
      .join(predTot, Seq("cls"), "left")
      .join(labelTot, Seq("cls"), "left")
      .select(
        col("cls"),
        coalesce(col("_tp"), lit(0L)).as("tp"),
        (coalesce(col("_pt"), lit(0L)) - coalesce(col("_tp"), lit(0L))).as("fp"),
        (coalesce(col("_lt"), lit(0L)) - coalesce(col("_tp"), lit(0L))).as("fn"))
      .select(
        col("cls"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") === 0L, lit(0.0))
          .otherwise(graft.Functions.roundHalfUp(
            col("tp").cast("double") / (col("tp") + col("fp")).cast("double"), 6))
          .as("precision"),
        when(col("tp") + col("fn") === 0L, lit(0.0))
          .otherwise(graft.Functions.roundHalfUp(
            col("tp").cast("double") / (col("tp") + col("fn")).cast("double"), 6))
          .as("recall"),
        (col("tp") + col("fp") > 0L).as("precision_defined"),
        (col("tp") + col("fn") > 0L).as("recall_defined"))
      .withColumn("f1",
        when(p + r === 0.0, lit(0.0))
          .otherwise(graft.Functions.roundHalfUp(lit(2.0) * p * r / (p + r), 6)))
  }

  /** Macro / micro summary over a [[classificationReport]]: one row with
    * the class count, micro accuracy `Σtp / N` (for single-label
    * multiclass, micro-P = micro-R = accuracy), and macro means of the
    * per-class precision / recall / F1 (zero-division cells counted as
    * their reported 0.0 — the sklearn convention). Macro means average
    * the ALREADY-ROUNDED per-class values in integer micro units, so the
    * mean is order-free and replayable.
    */
  def classificationSummary(report: DataFrame): DataFrame = {
    val micro = (c: Column) => floor(c * 1e6 + lit(0.5)).cast("long")
    report.agg(
      count(lit(1)).as("n_classes"),
      sum(col("tp")).as("_tps"),
      (sum(col("tp")) + sum(col("fn"))).as("_n"),
      sum(micro(col("precision"))).as("_sp"),
      sum(micro(col("recall"))).as("_sr"),
      sum(micro(col("f1"))).as("_sf"))
      .select(
        col("n_classes"),
        when(col("_n") === 0L, lit(null).cast("double"))
          .otherwise(graft.Functions.roundHalfUp(
            col("_tps").cast("double") / col("_n").cast("double"), 6)).as("accuracy"),
        graft.Functions.roundHalfUp(
          col("_sp").cast("double") / (col("n_classes").cast("double") * 1e6), 6)
          .as("macro_precision"),
        graft.Functions.roundHalfUp(
          col("_sr").cast("double") / (col("n_classes").cast("double") * 1e6), 6)
          .as("macro_recall"),
        graft.Functions.roundHalfUp(
          col("_sf").cast("double") / (col("n_classes").cast("double") * 1e6), 6)
          .as("macro_f1"))
  }

  /** Paired sign-flip permutation test (Fisher randomization; the
    * recommended significance check for per-query metric deltas between
    * two retrieval/eval systems — Smucker, Allan & Carterette 2007 find
    * it the least error-prone of the classical choices): under H₀ the
    * sign of each per-item delta is exchangeable, so compare the observed
    * |Σδ| against `replicates` deterministic sign-flipped sums, and
    * report `p = (1 + #{b : |S_b| ≥ |S|}) / (B + 1)` (the add-one
    * estimator — a permutation p-value of exactly 0 is never honest).
    *
    * Determinism contract: deltas quantize to integer MICRO units, every
    * replicate sum is an integer, and the flip signs derive from
    * `md5(salt:b:item)` parity — no RNG, so any engine (and any rerun)
    * produces the identical p-value. The |S_b| ≥ |S| comparison is
    * integer-vs-integer; division happens exactly twice (mean and p),
    * both rounded half-up 6. NULL/NaN deltas drop.
    *
    * Scale shape: ONE cross join of the per-item delta table with the
    * bounded replicate range (|items|·B rows — eval-scale by definition,
    * never corpus-scale), one map-side-combinable sum per replicate, a
    * B-bounded fold to the hit count, one output row:
    * `(n, replicates, mean_delta, hits, p_value)`.
    */
  def pairedPermutationTest(
      df: DataFrame,
      itemCol: String,
      deltaCol: String,
      replicates: Int,
      salt: String = "perm"): DataFrame = {
    require(replicates >= 1, s"replicates must be >= 1, got $replicates")
    val spark = df.sparkSession
    val base = df
      .filter(col(itemCol).isNotNull && col(deltaCol).isNotNull &&
        !isnan(col(deltaCol).cast("double")))
      .select(
        col(itemCol).cast("string").as("_item"),
        floor(col(deltaCol).cast("double") * 1e6 + lit(0.5)).cast("long").as("_dm"))
    val observed = base.agg(
      count(lit(1)).as("n"),
      coalesce(sum(col("_dm")), lit(0L)).as("_s"))
    val sign = graft.Functions.md5Bits(
      concat(lit(s"$salt:"), col("_b"), lit(":"), col("_item")), 4) % 2L * 2L - 1L
    val flips = base
      .crossJoin(broadcast(spark.range(replicates).select(col("id").as("_b"))))
      .groupBy(col("_b"))
      .agg(sum(sign * col("_dm")).as("_sb"))
    val hits = flips
      .crossJoin(broadcast(observed))
      .agg(sum(when(abs(col("_sb")) >= abs(col("_s")), 1L).otherwise(0L)).as("hits"))
    observed.crossJoin(hits).select(
      col("n"),
      lit(replicates.toLong).as("replicates"),
      when(col("n") === 0L, lit(null).cast("double"))
        .otherwise(graft.Functions.roundHalfUp(
          col("_s").cast("double") / (col("n").cast("double") * 1e6), 6)).as("mean_delta"),
      coalesce(col("hits"), lit(replicates.toLong)).as("hits"),
      graft.Functions.roundHalfUp(
        (col("hits") + 1L).cast("double") / (replicates + 1).toDouble, 6).as("p_value"))
  }

  /** Per-group Brier score — the mean squared error of probabilistic
    * predictions, `(1/N)·Σ(p−y)²` (Brier 1950): the PROPER scoring rule
    * companion to [[ece]] (ECE measures calibration alone; Brier charges
    * for calibration AND resolution together, and can't be gamed by
    * predicting the base rate). Per-row squared errors quantize to
    * integer NANO units before the order-free sum; one divide, rounded
    * half-up 6. NULL/NaN probabilities and NULL labels drop. One
    * map-side-combinable keyed aggregate.
    */
  def brierScore(
      df: DataFrame,
      groupCol: String,
      probCol: String,
      labelCol: String): DataFrame = {
    val y = when(col(labelCol).cast("long") > 0L, 1.0).otherwise(0.0)
    val se = (col(probCol).cast("double") - y) * (col(probCol).cast("double") - y)
    df
      .filter(col(groupCol).isNotNull && col(labelCol).isNotNull &&
        col(probCol).isNotNull && !isnan(col(probCol).cast("double")))
      .select(col(groupCol).as("grp"),
        floor(se * 1e9 + lit(0.5)).cast("long").as("_sen"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("_sen")).as("_s"))
      .select(col("grp"), col("n"),
        graft.Functions.roundHalfUp(
          col("_s").cast("double") / (col("n").cast("double") * 1e9), 6).as("brier"))
  }

  /** Cochran's Q test (Cochran 1950) — "do these k systems have the same
    * success rate on the same items?", the k-system generalization of
    * [[mcnemar]]. Input: one row per (item, system) with boolean-ish
    * correctness; (item, system) duplicates dedup to max, and only items
    * rated by ALL k systems count (the [[Preference.fleissKappa]]
    * complete-panel discipline — mixing panel sizes corrupts the
    * statistic). With G_j the per-system success totals, L_i the
    * per-item totals and T = ΣG_j:
    * `Q = (k−1)·(k·ΣG_j² − T²) / (k·T − ΣL_i²)` — pure integers
    * (DECIMAL(38) products) until ONE divide, rounded half-up 6;
    * χ²-distributed with k−1 df under H₀. Q is NULL when every item is
    * unanimous (denominator 0 — no discordance to test). Output one row:
    * `(n_items, k, q_stat)`.
    */
  def cochranQ(
      df: DataFrame,
      itemCol: String,
      systemCol: String,
      correctCol: String): DataFrame = {
    // size-adaptive pin (SizeAdaptive): rated fans out to the panel-size
    // probe, the per-item totals and the per-system semi-join — one input
    // pass instead of three once the relation's estimate crosses the gate
    val rated = graft.ops.SizeAdaptive.pinIfLarge(df
      .filter(col(itemCol).isNotNull && col(systemCol).isNotNull &&
        col(correctCol).isNotNull)
      .groupBy(col(itemCol).as("_item"), col(systemCol).as("_sys"))
      .agg(max(when(col(correctCol).cast("boolean"), 1L).otherwise(0L)).as("_c")))
    val kRow = rated.agg(countDistinct(col("_sys")).as("k"))
    val perItem = rated.groupBy(col("_item"))
      .agg(count(lit(1)).as("_nr"), sum(col("_c")).as("_li"))
      .crossJoin(broadcast(kRow))
      .filter(col("_nr") === col("k"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val itemAgg = perItem.agg(
      count(lit(1)).as("n_items"),
      coalesce(sum(col("_li")), lit(0L)).as("_t"),
      coalesce(sum(dec(col("_li")) * dec(col("_li"))), dec(lit(0))).as("_sl2"))
    val perSys = rated
      .join(perItem.select(col("_item")), Seq("_item"), "left_semi")
      .groupBy(col("_sys"))
      .agg(sum(col("_c")).as("_gj"))
      .agg(coalesce(sum(dec(col("_gj")) * dec(col("_gj"))), dec(lit(0))).as("_sg2"))
    val den = dec(col("k")) * dec(col("_t")) - col("_sl2")
    itemAgg.crossJoin(perSys).crossJoin(broadcast(kRow)).select(
      col("n_items"), col("k"),
      when(den <= dec(lit(0)), lit(null).cast("double"))
        .otherwise(graft.Functions.roundHalfUp(
          (dec(col("k") - 1L) * (dec(col("k")) * col("_sg2") -
            dec(col("_t")) * dec(col("_t")))).cast("double") / den.cast("double"), 6))
        .as("q_stat"))
  }

  /** McNemar's paired test over two systems' per-item correctness — the
    * significance check for "model B beats model A on the same eval set"
    * (McNemar 1947; Dietterich 1998 recommends exactly this for paired
    * classifier comparison). Input: one row per item with boolean-ish
    * correctness columns for each system. Output one row: the discordant
    * counts `b` (A right, B wrong) and `c` (A wrong, B right), the χ²
    * statistic `(b−c)²/(b+c)`, and the continuity-corrected variant
    * `(max(|b−c|−1, 0))²/(b+c)`. Both are integer-over-integer divides
    * (rounded half-up 6); both are NULL when b+c = 0 (no discordant pairs
    * — the test is undefined, and 0 would read as "definitely equal").
    * Rows with a NULL on either side drop. One map-side-combinable
    * aggregate; no shuffle wider than one row.
    */
  def mcnemar(
      df: DataFrame,
      itemCol: String,
      aCorrectCol: String,
      bCorrectCol: String): DataFrame = {
    val a = col(aCorrectCol).cast("boolean")
    val b = col(bCorrectCol).cast("boolean")
    val disc = col("b_only") + col("c_only")
    df.filter(col(itemCol).isNotNull && a.isNotNull && b.isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(when(a && !b, 1L).otherwise(0L)).as("b_only"),
        sum(when(!a && b, 1L).otherwise(0L)).as("c_only"))
      .select(
        col("n"), col("b_only"), col("c_only"),
        when(disc === 0L, lit(null).cast("double"))
          .otherwise(graft.Functions.roundHalfUp(
            ((col("b_only") - col("c_only")) * (col("b_only") - col("c_only")))
              .cast("double") / disc.cast("double"), 6))
          .as("chi2"),
        when(disc === 0L, lit(null).cast("double"))
          .otherwise(graft.Functions.roundHalfUp(
            (greatest(abs(col("b_only") - col("c_only")) - 1L, lit(0L)) *
              greatest(abs(col("b_only") - col("c_only")) - 1L, lit(0L)))
              .cast("double") / disc.cast("double"), 6))
          .as("chi2_cc"))
  }

  /** Unbiased pass@k (Chen et al. 2021, "Evaluating Large Language Models
    * Trained on Code", §2.1) — THE code-eval sampling estimator: from n
    * samples per problem of which c are correct,
    *
    *   pass@k = 1 − C(n−c, k) / C(n, k)
    *          = 1 − Π_{i=0}^{k−1} (n−c−i) / (n−i)
    *
    * is an unbiased estimate of P(at least one of k draws correct).
    * Input: one row per SAMPLE `(problemCol, correctCol)` (boolean-ish
    * correct; NULL problem or correct drops the sample). Output one row
    * per problem: `(problem, n_samples, n_correct, pass_at_<k>...)` — a
    * pass@k column per requested k, NULL where n < k (the estimator is
    * undefined; silently clamping k to n would overstate coverage).
    *
    * Exactness: both falling-factorial products are evaluated as
    * DECIMAL(38,0) INTEGER products (the [[cochranQ]] discipline) in a
    * fixed unroll order — k is compile-time bounded to 12 so n up to
    * ~1000 samples/problem stays within 38 digits — then ONE double
    * divide, rounded half-up 6. An oracle replays the same products in
    * HUGEINT. When n−c < k some factor is ≤ 0; the estimator is exactly
    * 1 there (C(n−c,k) = 0) and is special-cased rather than trusting a
    * signed product.
    *
    * Scale shape: one map-side-combinable keyed aggregate over samples,
    * then per-row arithmetic on the bounded (problems × ks) result.
    */
  def passAtK(
      df: DataFrame,
      problemCol: String,
      correctCol: String,
      ks: Seq[Int]): DataFrame =
    passAtKFromCounts(passAtKCounts(df, problemCol, correctCol), ks)

  /** The mergeable state behind [[passAtK]]: `(problem, n_samples,
    * n_correct)` — plain integer sums, so per-batch counts fold into a
    * maintained table with [[mergePassAtKCounts]] and the estimator stays
    * EXACT under incremental/streaming arrival (the
    * [[calibrationCounts]]/[[mergeCalibrationCounts]] discipline).
    */
  def passAtKCounts(
      df: DataFrame,
      problemCol: String,
      correctCol: String): DataFrame =
    df.filter(col(problemCol).isNotNull && col(correctCol).isNotNull)
      .select(col(problemCol).as("problem"),
        when(col(correctCol).cast("boolean"), 1L).otherwise(0L).as("_c"))
      .groupBy(col("problem"))
      .agg(count(lit(1)).as("n_samples"), sum(col("_c")).as("n_correct"))

  /** Fold two counts tables (integer sums are associative — exact). */
  def mergePassAtKCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("problem"))
      .agg(sum(col("n_samples")).as("n_samples"), sum(col("n_correct")).as("n_correct"))

  /** Finalize pass@k from a (possibly merged) counts table. */
  def passAtKFromCounts(counts: DataFrame, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty, "ks must be non-empty")
    require(ks.distinct == ks, s"ks must be distinct, got $ks")
    require(ks.forall(k => k >= 1 && k <= 12),
      s"each k must be in [1, 12] (DECIMAL(38,0) falling-factorial bound), got $ks")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def falling(base: Column, k: Int): Column =
      (0 until k).map(i => (base - lit(i.toLong)).cast(dec38)).reduce(_ * _)
    val agg = counts
      .groupBy(col("problem"))
      .agg(sum(col("n_samples")).as("n_samples"), sum(col("n_correct")).as("n_correct"))
    val passCols = ks.map { k =>
      val n = col("n_samples")
      val miss = col("n_samples") - col("n_correct")
      when(n < k, lit(null).cast("double"))
        .when(miss < k, lit(1.0))
        .otherwise(graft.Functions.roundHalfUp(
          lit(1.0) - falling(miss, k).cast("double") / falling(n, k).cast("double"), 6))
        .as(s"pass_at_$k")
    }
    agg.select(col("problem") +: col("n_samples") +: col("n_correct") +: passCols: _*)
  }

  /** Corpus BLEU (Papineni et al. 2002) between a candidate and a
    * reference text column: per-segment CLIPPED n-gram matches
    * `Σ_gram min(c_cand, c_ref)` for n = 1..maxN pooled over the corpus,
    * geometric-mean precision, brevity penalty `min(1, e^(1−r/c))`.
    * Output ONE row: `(cand_tokens, ref_tokens, bp, p_1..p_maxN, bleu)`.
    * Unsmoothed: any pooled p_n = 0 (or an empty candidate corpus) makes
    * bleu exactly 0 — the corpus-level statistic rarely hits it, and
    * smoothing conventions differ enough across toolkits that a silent
    * default would be a portability trap.
    *
    * Determinism ([[graft.ops.TextAnalysis.bigramPerplexity]]'s
    * discipline): all counts and lengths are exact LONGs; each ln p_n is
    * quantized to integer nano-nats BEFORE the weighted sum, the brevity
    * exponent 1−r/c is a single-divide double added after, and the one
    * final `exp` is rounded half-up 4 (p_n and bp round half-up 6).
    *
    * Scale shape: one (id, n, gram)-keyed count per side, one keyed join
    * (never gram×gram), one global one-row aggregate. Gram rows are
    * emitted per (doc, n) by slicing the token array — maxN scans of
    * nothing: a single explode carries an `n` column so the whole family
    * is ONE pass over each side.
    */
  def bleuCorpus(
      df: DataFrame,
      idCol: String,
      candCol: String,
      refCol: String,
      maxN: Int = 4): DataFrame =
    bleuFromCounts(bleuCounts(df, idCol, candCol, refCol, maxN), maxN)

  /** The mergeable state behind [[bleuCorpus]]: one `(n, clip, tot)` row
    * per order 1..maxN (pooled clipped matches / candidate totals) plus an
    * `n = 0` SENTINEL row carrying the token lengths (`clip` =
    * cand_tokens, `tot` = ref_tokens). Every component is a plain LONG
    * sum, so per-batch counts fold EXACTLY with [[mergeBleuCounts]] —
    * valid whenever each (cand, ref) pair arrives whole in one batch
    * (per-segment clipping is segment-local; corpus BLEU pools sums).
    */
  def bleuCounts(
      df: DataFrame,
      idCol: String,
      candCol: String,
      refCol: String,
      maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    val spark = df.sparkSession

    def gramCounts(textCol: String, cntName: String): DataFrame =
      tokenGramCounts(df, idCol, textCol, maxN, cntName)

    val candLens = df.select(
      size(filter(Dedup.tokens(col(candCol)), t => t =!= "")).cast("long").as("_cl"),
      size(filter(Dedup.tokens(col(refCol)), t => t =!= "")).cast("long").as("_rl"))
      .agg(coalesce(sum(col("_cl")), lit(0L)).as("clip"),
        coalesce(sum(col("_rl")), lit(0L)).as("tot"))
      .select(lit(0).as("n"), col("clip"), col("tot"))

    val clipped = gramCounts(candCol, "_cc")
      .join(gramCounts(refCol, "_rc"), Seq("_id", "n", "gram"), "left")
      .groupBy(col("n"))
      .agg(
        sum(least(col("_cc"), coalesce(col("_rc"), lit(0L)))).as("clip"),
        sum(col("_cc")).as("tot"))

    // densify over 1..maxN: an order with zero candidate grams anywhere in
    // the corpus must surface as p_n = 0, not as a missing row
    spark.range(1, maxN + 1).select(col("id").cast("int").as("n"))
      .join(clipped, Seq("n"), "left")
      .select(col("n"),
        coalesce(col("clip"), lit(0L)).as("clip"),
        coalesce(col("tot"), lit(0L)).as("tot"))
      .unionByName(candLens)
  }

  /** Fold two counts tables (LONG sums — exact, order-free). */
  def mergeBleuCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("n"))
      .agg(sum(col("clip")).as("clip"), sum(col("tot")).as("tot"))

  /** Finalize corpus BLEU from a (possibly merged) counts table. */
  def bleuFromCounts(counts: DataFrame, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    val summed = counts.groupBy(col("n"))
      .agg(sum(col("clip")).as("_clip"), sum(col("tot")).as("_tot"))
    val candLens = summed.filter(col("n") === 0)
      .select(col("_clip").as("cand_tokens"), col("_tot").as("ref_tokens"))
    val perN = summed.filter(col("n") >= 1)

    val pn = col("_clip").cast("double") / col("_tot").cast("double")
    val pRounded = when(col("_tot") === 0L, lit(null).cast("double"))
      .otherwise(graft.Functions.roundHalfUp(pn, 6))
    val statCols = Seq(
      sum(when(col("_tot") === 0L || col("_clip") === 0L, 1L).otherwise(0L)).as("_zeros"),
      // nano-nat quantized Σ ln p_n (only meaningful when _zeros = 0)
      sum(when(col("_clip") > 0L, q9(log(pn))).otherwise(lit(0L))).as("_lnsum")) ++
      (1 to maxN).map(i => max(when(col("n") === i, pRounded)).as(s"p_$i"))
    val stats = perN.agg(statCols.head, statCols.tail: _*)

    val bpExp = when(col("cand_tokens") >= col("ref_tokens"), lit(0.0))
      .otherwise(lit(1.0) - col("ref_tokens").cast("double") / col("cand_tokens").cast("double"))
    val pCols = (1 to maxN).map(n => col(s"p_$n"))
    candLens.crossJoin(stats).select(
      Seq(
        col("cand_tokens"), col("ref_tokens"),
        when(col("cand_tokens") === 0L, lit(0.0))
          .otherwise(graft.Functions.roundHalfUp(exp(bpExp), 6)).as("bp")) ++
      pCols :+
      when(col("cand_tokens") === 0L || col("_zeros") > 0L, lit(0.0))
        .otherwise(graft.Functions.roundHalfUp(
          exp(bpExp + col("_lnsum").cast("double") / lit(maxN.toDouble) / lit(1e9)), 4))
        .as("bleu"): _*)
  }

  /** `(id, n, gram, <cntName>)` token n-gram counts for n = 1..maxN in ONE
    * pass: a single explode carries the n column. Per-n position sequences
    * are guarded per element (a doc shorter than n emits nothing for that
    * n): `sequence(1, size)` is only built for size >= 1, and positions
    * past size − n + 1 are filtered out — an unguarded
    * `sequence(0, size − n)` would DESCEND when size < n and emit bogus
    * grams.
    */
  private def tokenGramCounts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxN: Int,
      cntName: String): DataFrame = {
    val toks = filter(Dedup.tokens(col(textCol)), t => t =!= "")
    df.select(col(idCol).as("_id"), toks.as("_t"))
      .filter(size(col("_t")) >= 1)
      .select(col("_id"), explode(flatten(transform(
        sequence(lit(1), lit(maxN)),
        n => filter(
          transform(
            sequence(lit(1), size(col("_t"))),
            pos => when(pos + n - 1 <= size(col("_t")),
              struct(n.cast("int").as("n"),
                concat_ws(" ", slice(col("_t"), pos, n)).as("gram")))
              .otherwise(lit(null))),
          g => g.isNotNull)))).as("_g"))
      .select(col("_id"), col("_g.n").as("n"), col("_g.gram").as("gram"))
      .groupBy("_id", "n", "gram")
      .agg(count(lit(1)).cast("long").as(cntName))
  }

  /** Distinct-n generation-diversity ratios (Li et al. 2016, "A
    * Diversity-Promoting Objective Function"): per n-gram order,
    * `distinct_grams / total_grams` pooled over the corpus — the
    * repetitiveness red-flag for sampled generations (a mode-collapsed
    * sampler scores near 0 at n = 2..3). Output one row per n:
    * `(n, total_grams, distinct_grams, ratio)`, ratio NULL when the
    * corpus has no grams of that order (undefined, not 0 — distinct-2 of
    * a one-token corpus is not "zero diversity").
    *
    * Scale shape: one explode + one (n, gram)-grain aggregate; counts are
    * exact LONGs, one divide rounded half-up 6.
    */
  def distinctN(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxN: Int = 3): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8], got $maxN")
    val perGram = tokenGramCounts(df, idCol, textCol, maxN, "_c")
      .groupBy(col("n"), col("gram"))
      .agg(sum(col("_c")).as("_tot"))
    df.sparkSession.range(1, maxN + 1).select(col("id").cast("int").as("n"))
      .join(
        perGram.groupBy(col("n")).agg(
          sum(col("_tot")).as("total_grams"),
          count(lit(1)).as("distinct_grams")),
        Seq("n"), "left")
      .select(col("n"),
        coalesce(col("total_grams"), lit(0L)).as("total_grams"),
        coalesce(col("distinct_grams"), lit(0L)).as("distinct_grams"),
        when(coalesce(col("total_grams"), lit(0L)) === 0L, lit(null).cast("double"))
          .otherwise(graft.Functions.roundHalfUp(
            col("distinct_grams").cast("double") / col("total_grams").cast("double"), 6))
          .as("ratio"))
  }

  /** Per-document ROUGE-L (Lin 2004) with the rouge_scorer F1 convention:
    * token-grain LCS via the codegen'd [[graft.expressions.LcsLength]]
    * expression, `precision = LCS/|cand|`, `recall = LCS/|ref|`,
    * `f1 = 2PR/(P+R)`. Output `(id, lcs, cand_tokens, ref_tokens, prec,
    * rec, f1)`; an empty side makes its ratio (and f1) 0.0
    * rather than NULL — the scoring convention every ROUGE toolkit uses
    * for an empty candidate.
    *
    * Scale shape: zero shuffle — tokenization, the LCS DP (O(|a|·|b|)
    * per row, O(min) space), and the ratio arithmetic are all per-row
    * expressions inside one whole-stage-codegen'd projection. Every
    * ratio is one exact-rational divide of LONGs, rounded half-up 6.
    */
  def rougeL(
      df: DataFrame,
      idCol: String,
      candCol: String,
      refCol: String): DataFrame = {
    def toks(c: String) = filter(Dedup.tokens(col(c)), t => t =!= "")
    val lcsCol = graft.Functions.lcsLen(toks(candCol), toks(refCol)).cast("long")
    val p = when(col("cand_tokens") === 0L, lit(0.0))
      .otherwise(col("lcs").cast("double") / col("cand_tokens").cast("double"))
    val r = when(col("ref_tokens") === 0L, lit(0.0))
      .otherwise(col("lcs").cast("double") / col("ref_tokens").cast("double"))
    df.select(
      col(idCol).as("id"),
      lcsCol.as("lcs"),
      size(toks(candCol)).cast("long").as("cand_tokens"),
      size(toks(refCol)).cast("long").as("ref_tokens"))
      .select(col("id"), col("lcs"), col("cand_tokens"), col("ref_tokens"),
        graft.Functions.roundHalfUp(p, 6).as("prec"),
        graft.Functions.roundHalfUp(r, 6).as("rec"),
        when(col("lcs") === 0L, lit(0.0))
          .otherwise(graft.Functions.roundHalfUp(
            lit(2.0) * p * r / (p + r), 6)).as("f1"))
  }

  /** Per-document TER (translation edit rate, Snover et al. 2006,
    * shift-less variant — plain token edit distance over reference
    * length, the widely-reported approximation): `ter = dist / |ref|`,
    * with the distance from the codegen'd
    * [[graft.expressions.TokenEditDistance]] (word grain — Spark's
    * builtin `levenshtein` counts characters and over-penalizes long
    * words). Output `(id, edits, cand_tokens, ref_tokens, ter)`; an empty
    * reference with a non-empty candidate is all-insertions over nothing
    * — ter NULL (undefined), both-empty is 0.0. Zero shuffle: the DP and
    * the divide are per-row expressions, one codegen'd projection.
    */
  def ter(
      df: DataFrame,
      idCol: String,
      candCol: String,
      refCol: String): DataFrame = {
    def toks(c: String) = filter(Dedup.tokens(col(c)), t => t =!= "")
    val d = org.apache.spark.sql.graft.ColumnBridge.column(graft.expressions.TokenEditDistance(
      org.apache.spark.sql.graft.ColumnBridge.expression(toks(candCol)),
      org.apache.spark.sql.graft.ColumnBridge.expression(toks(refCol)))).cast("long")
    df.select(
      col(idCol).as("id"),
      d.as("edits"),
      size(toks(candCol)).cast("long").as("cand_tokens"),
      size(toks(refCol)).cast("long").as("ref_tokens"))
      .select(col("id"), col("edits"), col("cand_tokens"), col("ref_tokens"),
        when(col("ref_tokens") === 0L && col("cand_tokens") === 0L, lit(0.0))
          .when(col("ref_tokens") === 0L, lit(null).cast("double"))
          .otherwise(graft.Functions.roundHalfUp(
            col("edits").cast("double") / col("ref_tokens").cast("double"), 6))
          .as("ter"))
  }

  /** Corpus chrF (Popović 2015): character n-gram F-score over the
    * whitespace-stripped texts, n = 1..maxN (6, the paper's default),
    * `chrf = (1+β²)·P·R / (β²·P + R)` with β = 2 (recall-weighted) and
    * P/R the MACRO averages of the per-order precisions/recalls (an
    * order with zero candidate — resp. reference — grams contributes
    * 0 to its average, the sacrebleu convention). Output one row:
    * `(cand_chars, ref_chars, prec, rec, chrf)`.
    *
    * Determinism: per-order ratios are exact-rational LONG divides; the
    * macro averages are FIXED-ORDER sums (p_1 + ... + p_maxN, spelled
    * out, never a float aggregate); chrf is one final rational
    * expression rounded half-up 4 (prec/rec 6). Same keyed-join shape
    * as [[bleuCorpus]]: (id, n, gram) counts per side, one keyed left
    * join, position sequences guarded per element.
    */
  def chrF(
      df: DataFrame,
      idCol: String,
      candCol: String,
      refCol: String,
      maxN: Int = 6,
      beta: Double = 2.0): DataFrame = {
    require(maxN >= 1 && maxN <= 10, s"maxN must be in [1, 10], got $maxN")
    require(beta > 0.0, s"beta must be > 0, got $beta")
    val spark = df.sparkSession

    def stripped(c: String) = regexp_replace(col(c), "\\s+", "")

    def gramCounts(textCol: String, cntName: String): DataFrame =
      df.select(col(idCol).as("_id"), stripped(textCol).as("_s"))
        .filter(length(col("_s")) >= 1)
        .select(col("_id"), explode(flatten(transform(
          sequence(lit(1), lit(maxN)),
          n => filter(
            transform(
              sequence(lit(1), length(col("_s"))),
              pos => when(pos + n - 1 <= length(col("_s")),
                struct(n.cast("int").as("n"),
                  col("_s").substr(pos, n).as("gram")))
                .otherwise(lit(null))),
            g => g.isNotNull)))).as("_g"))
        .select(col("_id"), col("_g.n").as("n"), col("_g.gram").as("gram"))
        .groupBy("_id", "n", "gram")
        .agg(count(lit(1)).cast("long").as(cntName))

    val lens = df.select(
      length(stripped(candCol)).cast("long").as("_cl"),
      length(stripped(refCol)).cast("long").as("_rl"))
      .agg(coalesce(sum(col("_cl")), lit(0L)).as("cand_chars"),
        coalesce(sum(col("_rl")), lit(0L)).as("ref_chars"))

    val joined = gramCounts(candCol, "_cc")
      .join(gramCounts(refCol, "_rc"), Seq("_id", "n", "gram"), "full")
      .groupBy(col("n"))
      .agg(
        sum(least(coalesce(col("_cc"), lit(0L)), coalesce(col("_rc"), lit(0L)))).as("_clip"),
        sum(coalesce(col("_cc"), lit(0L))).as("_ctot"),
        sum(coalesce(col("_rc"), lit(0L))).as("_rtot"))
    val perN = spark.range(1, maxN + 1).select(col("id").cast("int").as("n"))
      .join(joined, Seq("n"), "left")
      .select(col("n"),
        coalesce(col("_clip"), lit(0L)).as("_clip"),
        coalesce(col("_ctot"), lit(0L)).as("_ctot"),
        coalesce(col("_rtot"), lit(0L)).as("_rtot"))

    def ratio(tot: String) = when(col(tot) === 0L, lit(0.0))
      .otherwise(col("_clip").cast("double") / col(tot).cast("double"))
    val pivots = (1 to maxN).flatMap { i =>
      Seq(max(when(col("n") === i, ratio("_ctot"))).as(s"_p_$i"),
        max(when(col("n") === i, ratio("_rtot"))).as(s"_r_$i"))
    }
    val stats = perN.agg(pivots.head, pivots.tail: _*)

    // FIXED-ORDER macro sums: p_1 + p_2 + ... (never a float aggregate)
    val pAvg = (1 to maxN).map(i => col(s"_p_$i")).reduce(_ + _) / lit(maxN.toDouble)
    val rAvg = (1 to maxN).map(i => col(s"_r_$i")).reduce(_ + _) / lit(maxN.toDouble)
    val b2 = lit(beta * beta)
    lens.crossJoin(stats).select(
      col("cand_chars"), col("ref_chars"),
      graft.Functions.roundHalfUp(pAvg, 6).as("prec"),
      graft.Functions.roundHalfUp(rAvg, 6).as("rec"),
      when(pAvg === 0.0 && rAvg === 0.0, lit(0.0))
        .otherwise(graft.Functions.roundHalfUp(
          (lit(1.0) + b2) * pAvg * rAvg / (b2 * pAvg + rAvg), 4)).as("chrf"))
  }
}
