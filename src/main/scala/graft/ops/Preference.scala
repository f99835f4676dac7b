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
      .agg(max(struct(s.as("s"), (-col(idCol)).as("negid"))).as("_hi"))
      .select(col(promptCol), (-col("_hi.negid")).as("best_id"),
        col("_hi.s").as("best_score"))
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
    val m = matches
      .select(
        col(aCol).cast("long").as("a"),
        col(bCol).cast("long").as("b"),
        col(winCol).cast("long").as("w"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("w").isNotNull &&
        col("a") =!= col("b"))
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
}
