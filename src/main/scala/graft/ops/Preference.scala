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
    * Both extremes come from ONE `groupBy(prompt)` via struct mins —
    * `min(struct(-score, id))` is the lexicographic argmax over score with
    * the smaller id winning ties (the tie direction flips by negating the
    * double score, which is an exact sign-flip; the id is never negated,
    * so arbitrary orderable ids — strings included — tie-break correctly).
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
        // the "smaller id wins ties" direction flips by negating the SCORE
        // (a double — sign-flip is exact, no overflow), never the id: the
        // id stays its declared type, so string/arbitrary orderable ids
        // tie-break correctly instead of silently casting to NULL
        min(struct((-s).as("negs"), col(idCol).as("id"))).as("_hi"),
        min(struct(s.as("s"), col(idCol).as("id"))).as("_lo"))
      .select(
        col(promptCol),
        col("_hi.id").as("chosen_id"),
        col("_lo.id").as("rejected_id"),
        (-col("_hi.negs")).as("chosen_score"),
        col("_lo.s").as("rejected_score"),
        (-col("_hi.negs") - col("_lo.s")).as("margin"))
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

  /** Group-relative advantage (the GRPO normalization, Shao et al. 2024
    * §4.1; RLOO uses the mean-only variant): per candidate,
    * `advantage = (score - mean_group) / std_group`, population std. The
    * group moments come from exact DECIMAL(18,6) sums over ONE
    * prompt-partitioned window (the [[TrafficAgg]] moment discipline, so
    * the mean is order-free and cross-engine exact); the advantage is
    * rounded half-up to 6 decimals. A degenerate group (n == 1, or all
    * scores equal → std 0) gets advantage 0.0 — the GRPO convention, and
    * division-safe. Output: `(promptCol, idCol, score, advantage)`.
    */
  def groupAdvantage(
      df: DataFrame,
      promptCol: String,
      idCol: String,
      scoreCol: String): DataFrame = {
    val s = col(scoreCol).cast("double")
    val w = Window.partitionBy(col(promptCol))
    val dec = s.cast("decimal(18,6)")
    val n = count(lit(1)).over(w).cast("double")
    val s1 = sum(dec).over(w).cast("double")
    val s2 = sum(dec * dec).over(w).cast("double")
    val mean = s1 / n
    val variance = greatest((s2 * n - s1 * s1) / (n * n), lit(0.0))
    val std = sqrt(variance)
    df.filter(usableScore(scoreCol) && col(idCol).isNotNull)
      .select(col(promptCol), col(idCol), s.as("score"),
        when(std > 0.0,
          graft.Functions.roundHalfUp((s - mean) / std, 6))
          .otherwise(lit(0.0)).as("advantage"))
  }

  /** Rejection-sampling selection (RFT / Llama-2 §3.2.2): the single best
    * candidate per prompt (ties → smaller id), kept only when its score
    * clears `minScore` — the filter that turns best-of-N generations into
    * an SFT batch. Same one-exchange struct-extreme aggregate as [[pairs]].
    * Output: `(promptCol, best_id, best_score)`.
    */
  def bestOfN(
      df: DataFrame,
      promptCol: String,
      idCol: String,
      scoreCol: String,
      minScore: Double): DataFrame = {
    val s = col(scoreCol).cast("double")
    df.filter(usableScore(scoreCol) && col(idCol).isNotNull)
      .groupBy(col(promptCol))
      .agg(min(struct((-s).as("negs"), col(idCol).as("id"))).as("_hi"))
      .select(col(promptCol), col("_hi.id").as("best_id"),
        (-col("_hi.negs")).as("best_score"))
      .filter(col("best_score") >= minScore)
  }

  /** A scored candidate on the stream. */
  case class Cand(promptId: Long, candId: Long, score: Double)
  /** Running per-prompt extremes. */
  case class Extremes(hiScore: Double, hiId: Long, loScore: Double, loId: Long)
  /** The refreshed pair a batch emits for a prompt that received data. */
  case class PairUpdate(
      promptId: Long, chosenId: Long, rejectedId: Long,
      chosenScore: Double, rejectedScore: Double, margin: Double)

  /** Streaming maintenance of [[pairs]]: per-prompt (max, min) extremes
    * are MERGEABLE, so state is two (score, id) cells per prompt —
    * bounded regardless of how many candidates stream through. Each
    * micro-batch folds its candidates into the state with the batch tie
    * canon (higher score wins; equal score → smaller id) and emits the
    * prompt's refreshed pair; the LATEST emission per prompt equals the
    * batch [[pairs]] over everything seen (StreamingSpec). Margin gating
    * is the consumer's filter — the state must remember extremes even
    * while the margin is still below threshold. NaN scores are dropped at
    * the edge like the batch side.
    */
  def pairsStream(
      cands: org.apache.spark.sql.Dataset[Cand]): org.apache.spark.sql.Dataset[PairUpdate] = {
    import cands.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def beatsHi(s: Double, id: Long, st: Extremes): Boolean =
      s > st.hiScore || (s == st.hiScore && id < st.hiId)
    def beatsLo(s: Double, id: Long, st: Extremes): Boolean =
      s < st.loScore || (s == st.loScore && id < st.loId)
    cands
      .filter(c => !c.score.isNaN)
      .groupByKey(_.promptId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (prompt: Long, it: Iterator[Cand], state: GroupState[Extremes]) => {
          var st = state.getOption.orNull
          it.foreach { c =>
            st =
              if (st == null) Extremes(c.score, c.candId, c.score, c.candId)
              else {
                val hi =
                  if (beatsHi(c.score, c.candId, st)) (c.score, c.candId)
                  else (st.hiScore, st.hiId)
                val lo =
                  if (beatsLo(c.score, c.candId, st)) (c.score, c.candId)
                  else (st.loScore, st.loId)
                Extremes(hi._1, hi._2, lo._1, lo._2)
              }
          }
          if (st == null) Iterator.empty
          else {
            state.update(st)
            if (st.hiId == st.loId) Iterator.empty // single candidate so far
            else Iterator.single(PairUpdate(prompt, st.hiId, st.loId,
              st.hiScore, st.loScore, st.hiScore - st.loScore))
          }
        })
  }

  /** Bradley–Terry pairwise strength fitting (Bradley & Terry 1952) — the
    * step between pairwise preference labels and scalar item strengths
    * (reward models train on exactly such comparisons, Ouyang et al. 2022
    * §3.2; chatbot leaderboards rank with the same model): full-batch
    * gradient ascent on the BT log-likelihood. Per iteration every match
    * contributes `±(win − σ(θ_a − θ_b))` to its two endpoints.
    *
    * Exactness discipline (the Logistic/PageRank recipe): strengths live
    * in integer NANO units; each match's gradient is quantized to
    * `floor(g·10⁸ + 0.5)` — the 0.1 learning rate folded into the
    * quantum — BEFORE the per-item sum, so cross-match aggregation is an
    * order-free integer sum and the ITERATED fixpoint is bit-deterministic
    * under any partitioning, replayable by unrolled SQL CTE pairs
    * (q_bt_strength). σ's `exp` evaluates in double on both engines (the
    * domainReweight precedent).
    *
    * Scale shape: matches are corpus-scale, θ is ITEM-bounded — per
    * iteration θ broadcasts into the match table twice (keyed joins on
    * each endpoint), the gradient sum is one map-side-combinable per-item
    * aggregate, and θ localCheckpoints per round (bounded rows — the
    * PageRank lineage lesson). NULL endpoints/labels and self-matches
    * drop. Returns `(item, n_games, theta_nano)`.
    */
  def bradleyTerry(
      matches: DataFrame,
      aCol: String,
      bCol: String,
      winCol: String,
      iterations: Int = 5): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // pinned once: every iteration's gradient join re-references the match
    // table, so without the barrier the source scan + filter re-runs per
    // iteration (slim (a, b, w) rows — bounded materialization)
    val m = matches
      .select(
        col(aCol).cast("long").as("a"),
        col(bCol).cast("long").as("b"),
        col(winCol).cast("long").as("w"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("w").isNotNull &&
        col("a") =!= col("b"))
      .localCheckpoint(false)
    val items = m.select(col("a").as("item"))
      .union(m.select(col("b").as("item")))
      .distinct()
    val games = m.select(col("a").as("item"))
      .union(m.select(col("b").as("item")))
      .groupBy("item").agg(count(lit(1)).as("n_games"))
    var theta = items.select(col("item"), lit(0L).as("t")).localCheckpoint()
    for (_ <- 1 to iterations) {
      val ta = theta.select(col("item").as("a"), col("t").as("_ta"))
      val tb = theta.select(col("item").as("b"), col("t").as("_tb"))
      val g = m
        .join(broadcast(ta), Seq("a"))
        .join(broadcast(tb), Seq("b"))
        .select(
          col("a"), col("b"),
          floor(
            (col("w").cast("double") -
              lit(1.0) / (lit(1.0) +
                exp(-((col("_ta") - col("_tb")).cast("double") / lit(1e9))))) *
              lit(1e8) + lit(0.5)).cast("long").as("_g"))
      val delta = g.select(col("a").as("item"), col("_g").as("d"))
        .union(g.select(col("b").as("item"), (-col("_g")).as("d")))
        .groupBy("item").agg(sum(col("d")).as("_d"))
      theta = theta
        .join(delta, Seq("item"), "left")
        .select(col("item"), (col("t") + coalesce(col("_d"), lit(0L))).as("t"))
        .localCheckpoint()
    }
    theta
      .join(games, Seq("item"))
      .select(col("item"), col("n_games"), col("t").as("theta_nano"))
  }

  /** Cohen's kappa (Cohen 1960) between two raters over shared items — the
    * inter-annotator agreement gate preference data needs before anyone
    * trains on it (noisy labels cap reward-model quality; κ quantifies the
    * noise). Only items BOTH raters labeled count. Returns one row
    * `(n_items, n_agree, po, pe, kappa)`.
    *
    * Exactness: po, pe, and κ are ratios of INTEGER counts —
    * `po = agree/n`, `pe = Σ_c nA_c·nB_c / n²`, and the closed form
    * `κ = (n·agree − Σ_c nA_c·nB_c) / (n² − Σ_c nA_c·nB_c)` makes the
    * whole statistic ONE integer-over-integer divide, rounded half-up 6 —
    * no intermediate float survives between engines. κ is NULL when the
    * denominator is 0 (pe = 1: both raters constant — agreement is
    * unmeasurable, and reporting 0 would smuggle in a judgment).
    *
    * Scale shape: the rater pivot is one keyed aggregate on the item
    * (max-by-rater — items are rated once per rater; duplicate ratings
    * take the max label deterministically), the per-class marginal product
    * is a CLASS-bounded aggregate, and the final row folds in one reduce.
    */
  def cohenKappa(
      df: DataFrame,
      itemCol: String,
      raterCol: String,
      labelCol: String,
      raterA: String,
      raterB: String): DataFrame = {
    val paired = df
      .filter(col(itemCol).isNotNull && col(labelCol).isNotNull &&
        col(raterCol).isin(raterA, raterB))
      .groupBy(col(itemCol))
      .agg(
        max(when(col(raterCol) === raterA, col(labelCol))).as("_la"),
        max(when(col(raterCol) === raterB, col(labelCol))).as("_lb"))
      .filter(col("_la").isNotNull && col("_lb").isNotNull)
    val totals = paired.agg(
      count(lit(1)).as("n_items"),
      sum(when(col("_la") === col("_lb"), 1L).otherwise(0L)).as("n_agree"))
    val chance = paired
      .select(col("_la").as("_c")).groupBy(col("_c")).agg(count(lit(1)).as("_na"))
      .join(
        paired.select(col("_lb").as("_c")).groupBy(col("_c")).agg(count(lit(1)).as("_nb")),
        Seq("_c"), "inner")
      .agg(coalesce(sum(col("_na") * col("_nb")), lit(0L)).as("_sab"))
    val n = col("n_items")
    val den = (n * n - col("_sab")).cast("double")
    totals.crossJoin(chance).select(
      n, col("n_agree"),
      graft.Functions.roundHalfUp(col("n_agree").cast("double") / n, 6).as("po"),
      graft.Functions.roundHalfUp(col("_sab").cast("double") / (n * n), 6).as("pe"),
      when(den <= 0.0, lit(null).cast("double"))
        .otherwise(graft.Functions.roundHalfUp(
          (n * col("n_agree") - col("_sab")).cast("double") / den, 6))
        .as("kappa"))
  }

  /** Fleiss' kappa (Fleiss 1971) — multi-rater categorical agreement, the
    * generalization [[cohenKappa]] can't express past two raters. Input:
    * one row per (item, rater, label); each (item, rater) de-duplicates to
    * its max label (the cohenKappa convention), and only items rated by
    * EXACTLY `ratersPerItem` distinct raters count — Fleiss' formula
    * assumes a fixed panel size, and silently mixing panel sizes would
    * corrupt the chance term. Output one row:
    * `(n_items, n_raters, p_bar, p_e, kappa)`.
    *
    * Exactness: with A = ΣΣ n_ij² − N·n, D1 = N·n·(n−1), S2 = Σ_j s_j²,
    * D2 = (N·n)², the statistic is
    * `κ = (A·D2 − S2·D1) / (D1·(D2 − S2))` — one integer-over-integer
    * divide (products in DECIMAL(38,0) so corpus-scale N cannot overflow a
    * long), rounded half-up 6; p_bar = A/D1 and p_e = S2/D2 likewise.
    * κ is NULL when D2 = S2 (every rating in one class — chance agreement
    * is total and the statistic undefined).
    *
    * Scale shape: two keyed aggregates on the item (dedup + per-(item,
    * label) cell counts), one CLASS-bounded aggregate for the marginals,
    * and a one-row fold; nothing wider than (items × labels) ever
    * shuffles.
    */
  def fleissKappa(
      df: DataFrame,
      itemCol: String,
      raterCol: String,
      labelCol: String,
      ratersPerItem: Int): DataFrame = {
    require(ratersPerItem >= 2, s"ratersPerItem must be >= 2, got $ratersPerItem")
    val nInt = ratersPerItem.toLong
    // size-adaptive pin (SizeAdaptive): rated feeds the complete-panel
    // filter AND the cell counts — above the threshold the input stream is
    // read once instead of once per surviving leaf scan; below it (all
    // local runs) the unpinned shape stays, which measured faster
    val rated = SizeAdaptive.pinIfLarge(df
      .filter(col(itemCol).isNotNull && col(raterCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("_item"), col(raterCol).as("_rater"))
      .agg(max(col(labelCol)).as("_label")))
    val complete = rated
      .groupBy(col("_item"))
      .agg(count(lit(1)).as("_nr"))
      .filter(col("_nr") === nInt)
      .select(col("_item"))
    val cells = rated
      .join(complete, Seq("_item"))
      .groupBy(col("_item"), col("_label"))
      .agg(count(lit(1)).as("_nij"))
    val aAndN = cells.agg(
      (coalesce(sum(col("_nij") * col("_nij")), lit(0L)) -
        countDistinct(col("_item")) * nInt).as("_a"),
      countDistinct(col("_item")).as("_n_items"))
    val s2 = cells
      .groupBy(col("_label"))
      .agg(sum(col("_nij")).as("_sj"))
      .agg(coalesce(sum(col("_sj") * col("_sj")), lit(0L)).as("_s2"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val nTot = dec(col("_n_items")) * lit(nInt)            // N·n
    val d1 = nTot * lit(nInt - 1L)                         // N·n·(n−1)
    val d2 = nTot * nTot                                   // (N·n)²
    aAndN.crossJoin(s2).select(
      col("_n_items").as("n_items"),
      lit(nInt).as("n_raters"),
      graft.Functions.roundHalfUp(
        col("_a").cast("double") / d1.cast("double"), 6).as("p_bar"),
      graft.Functions.roundHalfUp(
        col("_s2").cast("double") / d2.cast("double"), 6).as("p_e"),
      when(d2 === dec(col("_s2")), lit(null).cast("double"))
        .otherwise(graft.Functions.roundHalfUp(
          (dec(col("_a")) * d2 - dec(col("_s2")) * d1).cast("double") /
            (d1 * (d2 - dec(col("_s2")))).cast("double"), 6))
        .as("kappa"))
  }

  /** Krippendorff's alpha, nominal metric (Krippendorff 2004 §11) — the
    * agreement coefficient that handles what [[cohenKappa]] (two raters)
    * and [[fleissKappa]] (fixed panel) can't: ANY number of raters with
    * MISSING ratings. Items keep whatever raters they have; only items
    * with ≥ 2 ratings are pairable, and single-rating items drop (they
    * carry no agreement evidence).
    *
    * Exactness: with per-item value counts n_ic, the observed
    * disagreement is `D_o = Σ_i (n_i² − Σ_c n_ic²)/(n_i − 1)` — each
    * item's rational term quantizes to integer NANO units before the
    * order-free sum — and the expected disagreement denominator
    * `n² − Σ_c n_c²` is pure integers (DECIMAL(38) products), so
    * `α = 1 − D_o_nano·(n−1) / ((n² − Σn_c²)·10⁹)` is ONE final
    * expression, rounded half-up 6. α is NULL when every pairable rating
    * is one value (D_e = 0 — agreement is unmeasurable). (item, rater)
    * duplicates dedup to their max label, the [[cohenKappa]] convention.
    *
    * Scale shape: two item-keyed aggregates, one label-bounded marginal
    * aggregate, one-row folds — nothing wider than (items × labels)
    * shuffles. Output one row:
    * `(n_items, n_pairable, n_values, d_o, d_e, alpha)`.
    */
  def krippendorffAlpha(
      df: DataFrame,
      itemCol: String,
      raterCol: String,
      labelCol: String): DataFrame = {
    val rated = df
      .filter(col(itemCol).isNotNull && col(raterCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("_item"), col(raterCol).as("_rater"))
      .agg(max(col(labelCol)).as("_label"))
    // size-adaptive pin: g is the op's fan-out point (per-item totals AND
    // the margins semi-join re-derive it); bounded by items × labels
    val g = SizeAdaptive.pinIfLarge(
      rated.groupBy(col("_item"), col("_label")).agg(count(lit(1)).as("_nic")))
    val ni = g.groupBy(col("_item"))
      .agg(sum(col("_nic")).as("_ni"), sum(col("_nic") * col("_nic")).as("_s2"))
    val pairable = ni.filter(col("_ni") >= 2L)
    // observed-disagreement sum and the pairable-item count in ONE
    // aggregate pass (they were two separate scans of the same relation)
    val dOn = pairable.agg(
      coalesce(sum(
        floor((col("_ni") * col("_ni") - col("_s2")).cast("double") /
          (col("_ni") - 1L).cast("double") * 1e9 + lit(0.5)).cast("long")), lit(0L))
        .as("_dn"),
      count(lit(1)).as("n_items"))
    val margins = g
      .join(pairable.select(col("_item")), Seq("_item"), "left_semi")
      .groupBy(col("_label"))
      .agg(sum(col("_nic")).as("_nc"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val tot = margins.agg(
      coalesce(sum(col("_nc")), lit(0L)).as("_n"),
      coalesce(sum(dec(col("_nc")) * dec(col("_nc"))), dec(lit(0))).as("_sc2"),
      count(lit(1)).as("n_values"))
    val deNum = (dec(col("_n")) * dec(col("_n")) - col("_sc2")).cast("double")
    dOn.crossJoin(tot).select(
      col("n_items"),
      col("_n").as("n_pairable"),
      col("n_values"),
      graft.Functions.roundHalfUp(col("_dn").cast("double") / 1e9, 6).as("d_o"),
      when(col("_n") < 2L, lit(null).cast("double"))
        .otherwise(graft.Functions.roundHalfUp(
          deNum / (col("_n") - 1L).cast("double"), 6)).as("d_e"),
      when(col("_n") < 2L || deNum <= 0.0, lit(null).cast("double"))
        .otherwise(graft.Functions.roundHalfUp(
          lit(1.0) - col("_dn").cast("double") * (col("_n") - 1L).cast("double") /
            (deNum * 1e9), 6)).as("alpha"))
  }

  /** Arena-style win-rate leaderboard with Wilson lower bounds (Wilson
    * 1927 — the sort key that doesn't promote a lucky 2-0 above a solid
    * 70-30): from a pairwise match table, per item — games, wins, raw win
    * rate, and the 95% Wilson score interval's lower bound. Draws are not
    * modeled; `winACol > 0` means A won, else B won (the [[bradleyTerry]]
    * input contract). Self-matches and NULL rows drop.
    *
    * Exactness: wins/games are integers; p̂ = wins/games is one IEEE
    * divide, and the Wilson bound is evaluated in ONE fixed expression
    * shape — `(p̂ + z²/(2n) − z·√((p̂·(1−p̂) + z²/(4n))/n)) / (1 + z²/n)`
    * with z² precomputed as z·z — so every multiply/divide/sqrt is the
    * same correctly-rounded IEEE op sequence in any engine; the result
    * rounds half-up 6. The SQL oracle replays the identical expression.
    *
    * Scale shape: the match table unpivots into (item, won) rows and folds
    * in ONE map-side-combinable keyed aggregate; output is |items| rows.
    */
  def winRates(
      matches: DataFrame,
      itemACol: String,
      itemBCol: String,
      winACol: String,
      z: Double = 1.96): DataFrame = {
    val m = matches.filter(
      col(itemACol).isNotNull && col(itemBCol).isNotNull && col(winACol).isNotNull &&
        col(itemACol) =!= col(itemBCol))
    val sides = m.select(col(itemACol).as("item"),
        when(col(winACol).cast("long") > 0L, 1L).otherwise(0L).as("_w"))
      .unionByName(m.select(col(itemBCol).as("item"),
        when(col(winACol).cast("long") > 0L, 0L).otherwise(1L).as("_w")))
    val zz = z * z
    val nD = col("games").cast("double")
    val p = col("wins").cast("double") / nD
    val wilson = (p + lit(zz) / (lit(2.0) * nD) -
      lit(z) * sqrt((p * (lit(1.0) - p) + lit(zz) / (lit(4.0) * nD)) / nD)) /
      (lit(1.0) + lit(zz) / nD)
    sides
      .groupBy(col("item"))
      .agg(count(lit(1)).as("games"), sum(col("_w")).as("wins"))
      .select(
        col("item"), col("games"), col("wins"),
        graft.Functions.roundHalfUp(p, 6).as("win_rate"),
        graft.Functions.roundHalfUp(wilson, 6).as("wilson_lb"))
  }
}
