package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{LabelNoise, Preference, RankEval}

/** Evaluation & calibration family — the measurement layer a training-data
  * pipeline needs before trusting a filter model or a preference dataset:
  * grouped ROC-AUC (exact Mann–Whitney), reliability bins + ECE, McNemar's
  * paired test, Fleiss' multi-rater kappa, and Wilson-bounded win rates.
  * Every statistic is integers (or one fixed IEEE expression) until a
  * single final divide, so the DuckDB oracle replays it bit-for-bit.
  *
  * Fixtures derive deterministically from the synthetic `events` table so
  * both engines rebuild identical inputs (the QueriesSft convention).
  */
object QueriesEval {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Events with a usable numeric value — the shared fixture base. */
  private def ev(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_id").isNotNull && col("value").isNotNull &&
        !isnan(col("value").cast("double")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // grouped ROC-AUC over a deliberately tie-heavy score (1-decimal
    // quantized value) with pseudo-labels event_id%3==0 — exercises the
    // tie-corrected average-rank path in every group
    "q_ev_auc" -> ((s, dir) =>
      RankEval.aucByGroup(
        ev(s, dir).select(
          col("event_type").as("grp"),
          (floor(col("value") * 10) / 10).as("score"),
          (col("event_id") % 3 === 0).cast("int").as("label")),
        "grp", "score", "label")),

    // reliability-diagram bins: prob = fractional part of |value| (exact
    // IEEE in both engines), labels event_id%2, 10 bins per event_type
    "q_ev_calib" -> ((s, dir) =>
      RankEval.calibrationBins(
        ev(s, dir).select(
          col("event_type").as("grp"),
          (abs(col("value")) - floor(abs(col("value")))).as("p"),
          (col("event_id") % 2 === 0).cast("int").as("label")),
        "grp", "p", "label", bins = 10)),

    // expected calibration error folded from the same micro-unit bins
    "q_ev_ece" -> ((s, dir) =>
      RankEval.ece(
        ev(s, dir).select(
          col("event_type").as("grp"),
          (abs(col("value")) - floor(abs(col("value")))).as("p"),
          (col("event_id") % 2 === 0).cast("int").as("label")),
        "grp", "p", "label", bins = 10)),

    // McNemar's paired test between two synthetic systems (correct on
    // id%3!=0 vs id%5!=0) — discordant cells large and deterministic
    "q_ev_mcnemar" -> ((s, dir) =>
      RankEval.mcnemar(
        t(s, dir, "events").filter(col("event_id").isNotNull)
          .select(col("event_id"),
            (col("event_id") % 3 =!= 0).as("a_ok"),
            (col("event_id") % 5 =!= 0).as("b_ok")),
        "event_id", "a_ok", "b_ok")),

    // Fleiss' kappa for a 3-rater panel (labels floor(v·10/7/13) mod 3 —
    // correlated but distinct raters, so kappa lands strictly inside (0,1))
    "q_ev_fleiss" -> ((s, dir) => {
      val e = ev(s, dir)
      val r = e.select(col("event_id").as("item"), lit("a").as("rater"),
          (floor(col("value") * 10).cast("long") % 3).as("label"))
        .unionByName(e.select(col("event_id").as("item"), lit("b").as("rater"),
          (floor(col("value") * 7).cast("long") % 3).as("label")))
        .unionByName(e.select(col("event_id").as("item"), lit("c").as("rater"),
          (floor(col("value") * 13).cast("long") % 3).as("label")))
      Preference.fleissKappa(r, "item", "rater", "label", ratersPerItem = 3)
    }),

    // confident-learning label-noise flags: classes 0..2, probs from
    // fractional parts of |value|·(c+2), given labels event_id%3 — the
    // thresholds compare via integer cross-multiplication (no division)
    "q_cl_flags" -> ((s, dir) =>
      LabelNoise.confidentFlags(clFixture(s, dir), "item", "given", "cls", "p")),

    // the confident joint over the same flags — off-diagonal mass is the
    // estimated label-error rate per (given, suggested) cell
    "q_cl_joint" -> ((s, dir) =>
      LabelNoise.confidentJoint(
        LabelNoise.confidentFlags(clFixture(s, dir), "item", "given", "cls", "p"))),

    // per-class P/R/F1 scorecard between two value-derived labelings
    // (floor(v·10)%3 as truth, floor(v·7)%3 as prediction)
    "q_ev_f1" -> ((s, dir) =>
      RankEval.classificationReport(
        ev(s, dir).select(
          (floor(col("value") * 10).cast("long") % 3).as("label"),
          (floor(col("value") * 7).cast("long") % 3).as("pred")),
        "label", "pred")),

    // macro/micro summary over the same report: accuracy + macro means
    // of the already-rounded per-class metrics (order-free micro sums)
    "q_ev_f1_macro" -> ((s, dir) =>
      RankEval.classificationSummary(
        RankEval.classificationReport(
          ev(s, dir).select(
            (floor(col("value") * 10).cast("long") % 3).as("label"),
            (floor(col("value") * 7).cast("long") % 3).as("pred")),
          "label", "pred"))),

    // Brier score per event type over the calibration fixture — the
    // proper scoring rule ECE alone can't substitute for
    "q_ev_brier" -> ((s, dir) =>
      RankEval.brierScore(
        ev(s, dir).select(
          col("event_type").as("grp"),
          (abs(col("value")) - floor(abs(col("value")))).as("p"),
          (col("event_id") % 2 === 0).cast("int").as("label")),
        "grp", "p", "label")),

    // Cochran's Q across THREE systems (correct on id%3/%5/%7 != 0) —
    // the k-system same-success-rate test McNemar can't express
    "q_ev_cochran" -> ((s, dir) => {
      val e = t(s, dir, "events").filter(col("event_id").isNotNull)
      val r = e.select(col("event_id").as("item"), lit("s3").as("sys"),
          (col("event_id") % 3 =!= 0).as("ok"))
        .unionByName(e.select(col("event_id").as("item"), lit("s5").as("sys"),
          (col("event_id") % 5 =!= 0).as("ok")))
        .unionByName(e.select(col("event_id").as("item"), lit("s7").as("sys"),
          (col("event_id") % 7 =!= 0).as("ok")))
      RankEval.cochranQ(r, "item", "sys", "ok")
    }),

    // Krippendorff's alpha with MISSING ratings: rater c skips every
    // third item, so pairable sizes vary between 2 and 3 — the case
    // Cohen (two raters) and Fleiss (fixed panel) cannot express
    "q_ev_kripp" -> ((s, dir) => {
      val e = ev(s, dir)
      val r = e.select(col("event_id").as("item"), lit("a").as("rater"),
          (floor(col("value") * 10).cast("long") % 3).as("label"))
        .unionByName(e.select(col("event_id").as("item"), lit("b").as("rater"),
          (floor(col("value") * 7).cast("long") % 3).as("label")))
        .unionByName(e.filter(col("event_id") % 3 =!= 0)
          .select(col("event_id").as("item"), lit("c").as("rater"),
            (floor(col("value") * 13).cast("long") % 3).as("label")))
      Preference.krippendorffAlpha(r, "item", "rater", "label")
    }),

    // split conformal: calibrate on even event ids, cover odd ones —
    // threshold = ⌈(n+1)·0.9⌉-th smallest nonconformity score
    "q_ev_conformal" -> ((s, dir) => {
      val e = ev(s, dir).select(col("event_id"),
        (abs(col("value")) * 3 - floor(abs(col("value")) * 3)).as("score"))
      RankEval.splitConformal(
        e.filter(col("event_id") % 2 === 0),
        e.filter(col("event_id") % 2 === 1),
        "score", alpha = 0.1)
    }),

    // paired sign-flip permutation test over per-item metric deltas
    // (frac(|v|·3) − frac(|v|·5)): 200 md5-derived replicates, integer
    // |S_b| ≥ |S| comparisons, add-one p-value
    "q_ev_perm" -> ((s, dir) =>
      RankEval.pairedPermutationTest(
        ev(s, dir).select(
          col("event_id").as("item"),
          ((abs(col("value")) * 3 - floor(abs(col("value")) * 3)) -
            (abs(col("value")) * 5 - floor(abs(col("value")) * 5))).as("delta")),
        "item", "delta", replicates = 200)),

    // Wilson-bounded win-rate leaderboard over the Bradley-Terry match
    // fixture — the arena sort key with exact integer wins/games
    "q_ev_wilson" -> ((s, dir) => {
      val m = t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(
          (col("user_id") % 32).as("item_a"),
          ((col("user_id") / 32).cast("long") % 32).as("item_b"),
          (floor(col("value") * 100).cast("long") % 2).as("win_a"))
      Preference.winRates(m, "item_a", "item_b", "win_a")
    }),

    // unbiased pass@k (Chen et al. 2021) over orders-as-samples: problem =
    // o_custkey % 50 (~300 samples each at sf0.01), correct = every third
    // order key; exact DECIMAL(38) falling factorials vs HUGEINT in the
    // oracle
    "q_ev_passk" -> ((s, dir) =>
      RankEval.passAtK(
        t(s, dir, "orders").select(
          (col("o_custkey") % 50).as("problem"),
          (col("o_orderkey") % 3 === 0).as("ok")),
        "problem", "ok", Seq(1, 5, 10))),

    // corpus BLEU-4 of each document against a deterministic reference
    // (even ids: token-reversed text — unigram multiset preserved, order
    // destroyed; odd ids: last three tokens dropped — brevity penalty
    // territory); clipped n-gram SQL replay
    "q_ev_bleu" -> ((s, dir) => {
      val toks = filter(
        split(trim(lower(col("text"))), "\\s+"), t => t =!= "")
      val pairs = t(s, dir, "documents").select(
        col("doc_id").as("id"),
        col("text").as("cand"),
        when(col("doc_id") % 2 === 0, concat_ws(" ", reverse(toks)))
          .otherwise(concat_ws(" ",
            slice(toks, lit(1), greatest(size(toks) - 3, lit(0))))).as("ref"))
      RankEval.bleuCorpus(pairs, "id", "cand", "ref", maxN = 4)
    }),

    // per-doc ROUGE-L through the REAL LCS DP (codegen'd LcsLength) against
    // references whose LCS has an UNCONDITIONAL closed form the oracle
    // states directly (the q_mm_exif trick): every-3rd-token deleted
    // (remaining tokens are a common subsequence and also an upper bound —
    // LCS = len − ⌊len/3⌋, recall 1), a pure half prefix (LCS = prefix
    // len), and cand + a 10-token echo appended (cand is a prefix of ref —
    // LCS = len, recall < 1). Hash-exact means the DP agrees with the
    // closed form on every document.
    "q_ev_rougel" -> ((s, dir) => {
      val toks = filter(
        split(trim(lower(col("text"))), "\\s+"), t => t =!= "")
      val ref = when(col("doc_id") % 3 === 0,
          concat_ws(" ", transform(toks,
            (t, i) => when((i + 1) % 3 === 0, lit("")).otherwise(t))))
        .when(col("doc_id") % 3 === 1,
          concat_ws(" ", slice(toks, lit(1),
            floor((size(toks) + 1) / lit(2.0)).cast("int"))))
        .otherwise(concat(col("text"), lit(" "),
          concat_ws(" ", slice(toks, lit(1), lit(10)))))
      RankEval.rougeL(
        t(s, dir, "documents").select(
          col("doc_id").as("id"), col("text").as("cand"), ref.as("ref")),
        "id", "cand", "ref")
    }),

    // corpus chrF (β=2, char 6-grams, whitespace stripped) against two
    // deterministic char-grain perturbations: vowels deleted (even ids)
    // and self-concatenation with a 50-char echo (odd ids)
    "q_ev_chrf" -> ((s, dir) => {
      val pairs = t(s, dir, "documents").select(
        col("doc_id").as("id"),
        col("text").as("cand"),
        when(col("doc_id") % 2 === 0,
          regexp_replace(col("text"), "[aeiou]", ""))
          .otherwise(concat(col("text"), lit(" "), substring(col("text"), 1, 50)))
          .as("ref"))
      RankEval.chrF(pairs, "id", "cand", "ref")
    }),

    // distinct-n generation-diversity ratios over the documents corpus
    "q_ev_distinctn" -> ((s, dir) =>
      RankEval.distinctN(t(s, dir, "documents"), "doc_id", "text", maxN = 3)),

    // per-doc TER through the REAL token-grain edit-distance DP against
    // the q_ev_rougel closed-form references: deletion (dist = ⌊len/3⌋),
    // prefix (dist = len − prefix), echo append (dist = appended count —
    // the |len diff| lower bound is achievable in all three classes)
    "q_ev_ter" -> ((s, dir) => {
      val toks = filter(
        split(trim(lower(col("text"))), "\\s+"), t => t =!= "")
      val ref = when(col("doc_id") % 3 === 0,
          concat_ws(" ", transform(toks,
            (t, i) => when((i + 1) % 3 === 0, lit("")).otherwise(t))))
        .when(col("doc_id") % 3 === 1,
          concat_ws(" ", slice(toks, lit(1),
            floor((size(toks) + 1) / lit(2.0)).cast("int"))))
        .otherwise(concat(col("text"), lit(" "),
          concat_ws(" ", slice(toks, lit(1), lit(10)))))
      RankEval.ter(
        t(s, dir, "documents").select(
          col("doc_id").as("id"), col("text").as("cand"), ref.as("ref")),
        "id", "cand", "ref")
    }))

  /** Long-format (item, given, class, prob) fixture for confident
    * learning: three classes, probabilities = fractional parts of
    * |value|·(class+2) — deterministic, engine-identical IEEE arithmetic.
    */
  private def clFixture(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .select(col("event_id"), col("value"),
        explode(array(lit(0L), lit(1L), lit(2L))).as("cls"))
      .select(
        col("event_id").as("item"),
        (col("event_id") % 3).as("given"),
        col("cls"),
        (abs(col("value")) * (col("cls") + 2) -
          floor(abs(col("value")) * (col("cls") + 2))).as("p"))

  /** Shared fixture CTE: events with usable value. */
  private val evSql: String =
    """SELECT event_id, event_type, user_id, value FROM events
      |WHERE event_id IS NOT NULL AND value IS NOT NULL
      |  AND NOT isnan(CAST(value AS DOUBLE))""".stripMargin

  /** Confident-learning CTE chain shared by q_cl_flags / q_cl_joint —
    * ends in `w(item, suggested)` and `spine(item, given)`.
    */
  private def clCteSql: String =
    s"""ev AS ($evSql),
       |p AS (
       |  SELECT event_id AS item, event_id % 3 AS given, CAST(c AS BIGINT) AS cls,
       |    CAST(floor((abs(value) * (c + 2) - floor(abs(value) * (c + 2)))
       |      * 1e6 + 0.5) AS BIGINT) AS pm
       |  FROM ev, (SELECT unnest([0, 1, 2]) AS c)),
       |th AS (SELECT cls, count(*) AS cnt, CAST(sum(pm) AS BIGINT) AS spm
       |  FROM p WHERE cls = given GROUP BY 1),
       |q AS (
       |  SELECT p.item, p.cls, p.pm,
       |    row_number() OVER (PARTITION BY p.item ORDER BY p.pm DESC, p.cls) AS rn
       |  FROM p JOIN th USING (cls) WHERE p.pm * th.cnt >= th.spm),
       |w AS (SELECT item, cls AS suggested FROM q WHERE rn = 1),
       |spine AS (SELECT DISTINCT item, given FROM p)""".stripMargin

  /** Per-class report CTE chain shared by q_ev_f1 / q_ev_f1_macro —
    * ends in `rep(cls, tp, fp, fn, precision, recall, precision_defined,
    * recall_defined, f1)`.
    */
  private def f1CteSql: String =
    s"""ev AS ($evSql),
       |d AS (
       |  SELECT CAST(CAST(floor(value * 10) AS BIGINT) % 3 AS VARCHAR) AS l,
       |    CAST(CAST(floor(value * 7) AS BIGINT) % 3 AS VARCHAR) AS p
       |  FROM ev),
       |cells AS (SELECT l, p, count(*) AS n FROM d GROUP BY 1, 2),
       |cls AS (SELECT l AS cls FROM cells UNION SELECT p FROM cells),
       |tpt AS (SELECT l AS cls, CAST(sum(n) AS BIGINT) AS tp FROM cells WHERE l = p GROUP BY 1),
       |pt AS (SELECT p AS cls, CAST(sum(n) AS BIGINT) AS pt FROM cells GROUP BY 1),
       |lt AS (SELECT l AS cls, CAST(sum(n) AS BIGINT) AS lt FROM cells GROUP BY 1),
       |j AS (
       |  SELECT cls.cls, coalesce(tp, 0) AS tp,
       |    coalesce(pt, 0) - coalesce(tp, 0) AS fp,
       |    coalesce(lt, 0) - coalesce(tp, 0) AS fn
       |  FROM cls LEFT JOIN tpt USING (cls) LEFT JOIN pt USING (cls)
       |    LEFT JOIN lt USING (cls)),
       |m AS (
       |  SELECT cls, tp, fp, fn,
       |    CASE WHEN tp + fp = 0 THEN 0.0
       |      ELSE floor(CAST(tp AS DOUBLE) / (tp + fp) * 1000000 + 0.5) / 1000000
       |    END AS precision,
       |    CASE WHEN tp + fn = 0 THEN 0.0
       |      ELSE floor(CAST(tp AS DOUBLE) / (tp + fn) * 1000000 + 0.5) / 1000000
       |    END AS recall,
       |    tp + fp > 0 AS precision_defined, tp + fn > 0 AS recall_defined
       |  FROM j),
       |rep AS (
       |  SELECT cls, tp, fp, fn, precision, recall,
       |    precision_defined, recall_defined,
       |    CASE WHEN precision + recall = 0 THEN 0.0
       |      ELSE floor(2 * precision * recall / (precision + recall)
       |        * 1000000 + 0.5) / 1000000 END AS f1
       |  FROM m)""".stripMargin

  /** HUGEINT falling factorial `Π_{i=0}^{k−1} (base − i)` as SQL text —
    * the exact-integer twin of passAtK's DECIMAL(38,0) products.
    */
  private def fallingSql(base: String, k: Int): String =
    (0 until k).map(i => s"CAST($base - $i AS HUGEINT)").mkString(" * ")

  private def passkSql(k: Int): String =
    s"""CASE WHEN n_samples < $k THEN NULL
       |     WHEN n_samples - n_correct < $k THEN 1.0
       |     ELSE floor((1.0 - CAST(${fallingSql("n_samples - n_correct", k)} AS DOUBLE)
       |                     / CAST(${fallingSql("n_samples", k)} AS DOUBLE))
       |            * 1000000 + 0.5) / 1000000 END AS pass_at_$k""".stripMargin

  val oracles: Map[String, String] = Map(

    "q_ev_passk" ->
      s"""WITH s AS (
         |  SELECT o_custkey % 50 AS problem,
         |         CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS ok
         |  FROM orders),
         |a AS (
         |  SELECT problem, count(*) AS n_samples, CAST(sum(ok) AS BIGINT) AS n_correct
         |  FROM s GROUP BY 1)
         |SELECT problem, n_samples, n_correct,
         |  ${passkSql(1)},
         |  ${passkSql(5)},
         |  ${passkSql(10)}
         |FROM a""".stripMargin,

    "q_ev_ter" ->
      """WITH base AS (
        |  SELECT doc_id AS id,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                    x -> x <> '')) AS n
        |  FROM documents),
        |m AS (
        |  SELECT id, n,
        |    CASE WHEN id % 3 = 0 THEN n // 3
        |         WHEN id % 3 = 1 THEN n - (n + 1) // 2
        |         ELSE least(10, n) END AS edits,
        |    CASE WHEN id % 3 = 0 THEN n - n // 3
        |         WHEN id % 3 = 1 THEN (n + 1) // 2
        |         ELSE n + least(10, n) END AS rn
        |  FROM base)
        |SELECT id, CAST(edits AS BIGINT) AS edits,
        |  CAST(n AS BIGINT) AS cand_tokens, CAST(rn AS BIGINT) AS ref_tokens,
        |  CASE WHEN rn = 0 AND n = 0 THEN 0.0
        |       WHEN rn = 0 THEN NULL
        |       ELSE floor(CAST(edits AS DOUBLE) / CAST(rn AS DOUBLE) * 1000000 + 0.5) / 1000000 END AS ter
        |FROM m""".stripMargin,

    "q_ev_rougel" ->
      """WITH base AS (
        |  SELECT doc_id AS id,
        |    len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                    x -> x <> '')) AS n
        |  FROM documents),
        |m AS (
        |  SELECT id, n,
        |    CASE WHEN id % 3 = 0 THEN n - n // 3
        |         WHEN id % 3 = 1 THEN (n + 1) // 2
        |         ELSE n END AS lcs,
        |    CASE WHEN id % 3 = 0 THEN n - n // 3
        |         WHEN id % 3 = 1 THEN (n + 1) // 2
        |         ELSE n + least(10, n) END AS rn
        |  FROM base)
        |SELECT id, CAST(lcs AS BIGINT) AS lcs,
        |  CAST(n AS BIGINT) AS cand_tokens, CAST(rn AS BIGINT) AS ref_tokens,
        |  CASE WHEN n = 0 THEN 0.0
        |       ELSE floor(CAST(lcs AS DOUBLE) / CAST(n AS DOUBLE) * 1000000 + 0.5) / 1000000 END AS prec,
        |  CASE WHEN rn = 0 THEN 0.0
        |       ELSE floor(CAST(lcs AS DOUBLE) / CAST(rn AS DOUBLE) * 1000000 + 0.5) / 1000000 END AS rec,
        |  CASE WHEN lcs = 0 THEN 0.0
        |       ELSE floor(2.0 * (CAST(lcs AS DOUBLE) / CAST(n AS DOUBLE))
        |                      * (CAST(lcs AS DOUBLE) / CAST(rn AS DOUBLE))
        |                  / (CAST(lcs AS DOUBLE) / CAST(n AS DOUBLE)
        |                     + CAST(lcs AS DOUBLE) / CAST(rn AS DOUBLE))
        |                  * 1000000 + 0.5) / 1000000 END AS f1
        |FROM m""".stripMargin,

    "q_ev_chrf" ->
      """WITH pairs AS (
        |  SELECT doc_id AS id,
        |    regexp_replace(text, '\s+', '', 'g') AS cs,
        |    regexp_replace(
        |      CASE WHEN doc_id % 2 = 0 THEN regexp_replace(text, '[aeiou]', '', 'g')
        |           ELSE text || ' ' || substr(text, 1, 50) END,
        |      '\s+', '', 'g') AS rs
        |  FROM documents),
        |ns AS (SELECT unnest([1, 2, 3, 4, 5, 6]) AS n),
        |cg AS (
        |  SELECT id, n, substr(cs, CAST(i AS INT), CAST(n AS INT)) AS gram, count(*) AS cc
        |  FROM pairs, ns, unnest(range(1, len(cs) - n + 2)) AS u(i)
        |  GROUP BY 1, 2, 3),
        |rg AS (
        |  SELECT id, n, substr(rs, CAST(i AS INT), CAST(n AS INT)) AS gram, count(*) AS rc
        |  FROM pairs, ns, unnest(range(1, len(rs) - n + 2)) AS u(i)
        |  GROUP BY 1, 2, 3),
        |j AS (
        |  SELECT coalesce(cg.n, rg.n) AS n,
        |    CAST(sum(least(coalesce(cc, 0), coalesce(rc, 0))) AS BIGINT) AS clip,
        |    CAST(sum(coalesce(cc, 0)) AS BIGINT) AS ctot,
        |    CAST(sum(coalesce(rc, 0)) AS BIGINT) AS rtot
        |  FROM cg FULL JOIN rg ON cg.id = rg.id AND cg.n = rg.n AND cg.gram = rg.gram
        |  GROUP BY 1),
        |pern AS (
        |  SELECT ns.n, coalesce(clip, 0) AS clip,
        |         coalesce(ctot, 0) AS ctot, coalesce(rtot, 0) AS rtot
        |  FROM ns LEFT JOIN j ON ns.n = j.n),
        |lens AS (
        |  SELECT CAST(coalesce(sum(len(cs)), 0) AS BIGINT) AS cand_chars,
        |         CAST(coalesce(sum(len(rs)), 0) AS BIGINT) AS ref_chars
        |  FROM pairs),
        |stats AS (
        |  SELECT
        |    max(CASE WHEN n = 1 THEN CASE WHEN ctot = 0 THEN 0.0 ELSE CAST(clip AS DOUBLE) / CAST(ctot AS DOUBLE) END END) AS p1,
        |    max(CASE WHEN n = 2 THEN CASE WHEN ctot = 0 THEN 0.0 ELSE CAST(clip AS DOUBLE) / CAST(ctot AS DOUBLE) END END) AS p2,
        |    max(CASE WHEN n = 3 THEN CASE WHEN ctot = 0 THEN 0.0 ELSE CAST(clip AS DOUBLE) / CAST(ctot AS DOUBLE) END END) AS p3,
        |    max(CASE WHEN n = 4 THEN CASE WHEN ctot = 0 THEN 0.0 ELSE CAST(clip AS DOUBLE) / CAST(ctot AS DOUBLE) END END) AS p4,
        |    max(CASE WHEN n = 5 THEN CASE WHEN ctot = 0 THEN 0.0 ELSE CAST(clip AS DOUBLE) / CAST(ctot AS DOUBLE) END END) AS p5,
        |    max(CASE WHEN n = 6 THEN CASE WHEN ctot = 0 THEN 0.0 ELSE CAST(clip AS DOUBLE) / CAST(ctot AS DOUBLE) END END) AS p6,
        |    max(CASE WHEN n = 1 THEN CASE WHEN rtot = 0 THEN 0.0 ELSE CAST(clip AS DOUBLE) / CAST(rtot AS DOUBLE) END END) AS r1,
        |    max(CASE WHEN n = 2 THEN CASE WHEN rtot = 0 THEN 0.0 ELSE CAST(clip AS DOUBLE) / CAST(rtot AS DOUBLE) END END) AS r2,
        |    max(CASE WHEN n = 3 THEN CASE WHEN rtot = 0 THEN 0.0 ELSE CAST(clip AS DOUBLE) / CAST(rtot AS DOUBLE) END END) AS r3,
        |    max(CASE WHEN n = 4 THEN CASE WHEN rtot = 0 THEN 0.0 ELSE CAST(clip AS DOUBLE) / CAST(rtot AS DOUBLE) END END) AS r4,
        |    max(CASE WHEN n = 5 THEN CASE WHEN rtot = 0 THEN 0.0 ELSE CAST(clip AS DOUBLE) / CAST(rtot AS DOUBLE) END END) AS r5,
        |    max(CASE WHEN n = 6 THEN CASE WHEN rtot = 0 THEN 0.0 ELSE CAST(clip AS DOUBLE) / CAST(rtot AS DOUBLE) END END) AS r6
        |  FROM pern)
        |SELECT cand_chars, ref_chars,
        |  floor(((p1 + p2 + p3 + p4 + p5 + p6) / 6.0) * 1000000 + 0.5) / 1000000 AS prec,
        |  floor(((r1 + r2 + r3 + r4 + r5 + r6) / 6.0) * 1000000 + 0.5) / 1000000 AS rec,
        |  CASE WHEN (p1 + p2 + p3 + p4 + p5 + p6) / 6.0 = 0.0
        |        AND (r1 + r2 + r3 + r4 + r5 + r6) / 6.0 = 0.0 THEN 0.0
        |       ELSE floor(5.0 * ((p1 + p2 + p3 + p4 + p5 + p6) / 6.0)
        |                      * ((r1 + r2 + r3 + r4 + r5 + r6) / 6.0)
        |                  / (4.0 * ((p1 + p2 + p3 + p4 + p5 + p6) / 6.0)
        |                     + (r1 + r2 + r3 + r4 + r5 + r6) / 6.0)
        |                  * 10000 + 0.5) / 10000 END AS chrf
        |FROM lens, stats""".stripMargin,

    "q_ev_distinctn" ->
      """WITH base AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS ct
        |  FROM documents),
        |ns AS (SELECT unnest([1, 2, 3]) AS n),
        |g AS (
        |  SELECT n, array_to_string(ct[CAST(i AS INT):CAST(i + n - 1 AS INT)], ' ') AS gram,
        |         count(*) AS c
        |  FROM base, ns, unnest(range(1, len(ct) - n + 2)) AS u(i)
        |  GROUP BY 1, 2),
        |agg AS (
        |  SELECT n, CAST(sum(c) AS BIGINT) AS total_grams,
        |         CAST(count(*) AS BIGINT) AS distinct_grams
        |  FROM g GROUP BY 1)
        |SELECT ns.n,
        |  coalesce(total_grams, 0) AS total_grams,
        |  coalesce(distinct_grams, 0) AS distinct_grams,
        |  CASE WHEN coalesce(total_grams, 0) = 0 THEN NULL
        |       ELSE floor(CAST(distinct_grams AS DOUBLE) / CAST(total_grams AS DOUBLE)
        |              * 1000000 + 0.5) / 1000000 END AS ratio
        |FROM ns LEFT JOIN agg ON ns.n = agg.n""".stripMargin,

    "q_ev_bleu" ->
      """WITH base AS (
        |  SELECT doc_id AS id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |                x -> x <> '') AS ct
        |  FROM documents),
        |pairs AS (
        |  SELECT id, ct,
        |    CASE WHEN id % 2 = 0 THEN list_reverse(ct)
        |         ELSE ct[1:greatest(len(ct) - 3, 0)] END AS rt
        |  FROM base),
        |ns AS (SELECT unnest([1, 2, 3, 4]) AS n),
        |cg AS (
        |  SELECT id, n, array_to_string(ct[CAST(i AS INT):CAST(i + n - 1 AS INT)], ' ') AS gram,
        |         count(*) AS cc
        |  FROM pairs, ns, unnest(range(1, len(ct) - n + 2)) AS u(i)
        |  GROUP BY 1, 2, 3),
        |rg AS (
        |  SELECT id, n, array_to_string(rt[CAST(i AS INT):CAST(i + n - 1 AS INT)], ' ') AS gram,
        |         count(*) AS rc
        |  FROM pairs, ns, unnest(range(1, len(rt) - n + 2)) AS u(i)
        |  GROUP BY 1, 2, 3),
        |clip AS (
        |  SELECT cg.n,
        |         CAST(sum(least(cc, coalesce(rc, 0))) AS BIGINT) AS clip,
        |         CAST(sum(cc) AS BIGINT) AS tot
        |  FROM cg LEFT JOIN rg ON cg.id = rg.id AND cg.n = rg.n AND cg.gram = rg.gram
        |  GROUP BY 1),
        |pern AS (
        |  SELECT ns.n, coalesce(clip, 0) AS clip, coalesce(tot, 0) AS tot
        |  FROM ns LEFT JOIN clip ON ns.n = clip.n),
        |lens AS (
        |  SELECT CAST(coalesce(sum(len(ct)), 0) AS BIGINT) AS cand_tokens,
        |         CAST(coalesce(sum(len(rt)), 0) AS BIGINT) AS ref_tokens
        |  FROM pairs),
        |stats AS (
        |  SELECT
        |    sum(CASE WHEN tot = 0 OR clip = 0 THEN 1 ELSE 0 END) AS zeros,
        |    CAST(sum(CASE WHEN clip > 0
        |      THEN CAST(floor(ln(CAST(clip AS DOUBLE) / CAST(tot AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS lnsum,
        |    max(CASE WHEN n = 1 THEN CASE WHEN tot = 0 THEN NULL
        |      ELSE floor(CAST(clip AS DOUBLE) / CAST(tot AS DOUBLE) * 1000000 + 0.5) / 1000000 END END) AS p_1,
        |    max(CASE WHEN n = 2 THEN CASE WHEN tot = 0 THEN NULL
        |      ELSE floor(CAST(clip AS DOUBLE) / CAST(tot AS DOUBLE) * 1000000 + 0.5) / 1000000 END END) AS p_2,
        |    max(CASE WHEN n = 3 THEN CASE WHEN tot = 0 THEN NULL
        |      ELSE floor(CAST(clip AS DOUBLE) / CAST(tot AS DOUBLE) * 1000000 + 0.5) / 1000000 END END) AS p_3,
        |    max(CASE WHEN n = 4 THEN CASE WHEN tot = 0 THEN NULL
        |      ELSE floor(CAST(clip AS DOUBLE) / CAST(tot AS DOUBLE) * 1000000 + 0.5) / 1000000 END END) AS p_4
        |  FROM pern)
        |SELECT cand_tokens, ref_tokens,
        |  CASE WHEN cand_tokens = 0 THEN 0.0
        |       ELSE floor(exp(CASE WHEN cand_tokens >= ref_tokens THEN 0.0
        |                      ELSE 1.0 - CAST(ref_tokens AS DOUBLE) / CAST(cand_tokens AS DOUBLE) END)
        |              * 1000000 + 0.5) / 1000000 END AS bp,
        |  p_1, p_2, p_3, p_4,
        |  CASE WHEN cand_tokens = 0 OR zeros > 0 THEN 0.0
        |       ELSE floor(exp(
        |              (CASE WHEN cand_tokens >= ref_tokens THEN 0.0
        |                    ELSE 1.0 - CAST(ref_tokens AS DOUBLE) / CAST(cand_tokens AS DOUBLE) END)
        |              + CAST(lnsum AS DOUBLE) / 4.0 / 1000000000)
        |              * 10000 + 0.5) / 10000 END AS bleu
        |FROM lens, stats""".stripMargin,

    "q_ev_f1" ->
      s"""WITH $f1CteSql
         |SELECT * FROM rep""".stripMargin,
    "q_ev_f1_macro" ->
      s"""WITH $f1CteSql,
         |s AS (
         |  SELECT count(*) AS n_classes,
         |    CAST(sum(tp) AS BIGINT) AS tps,
         |    CAST(sum(tp) + sum(fn) AS BIGINT) AS n,
         |    CAST(sum(CAST(floor(precision * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sp,
         |    CAST(sum(CAST(floor(recall * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sr,
         |    CAST(sum(CAST(floor(f1 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sf
         |  FROM rep)
         |SELECT n_classes,
         |  CASE WHEN n = 0 THEN NULL
         |    ELSE floor(CAST(tps AS DOUBLE) / CAST(n AS DOUBLE) * 1000000 + 0.5)
         |      / 1000000 END AS accuracy,
         |  floor(CAST(sp AS DOUBLE) / (CAST(n_classes AS DOUBLE) * 1e6)
         |    * 1000000 + 0.5) / 1000000 AS macro_precision,
         |  floor(CAST(sr AS DOUBLE) / (CAST(n_classes AS DOUBLE) * 1e6)
         |    * 1000000 + 0.5) / 1000000 AS macro_recall,
         |  floor(CAST(sf AS DOUBLE) / (CAST(n_classes AS DOUBLE) * 1e6)
         |    * 1000000 + 0.5) / 1000000 AS macro_f1
         |FROM s""".stripMargin,
    "q_cl_flags" ->
      s"""WITH $clCteSql
         |SELECT s.item, s.given, w.suggested,
         |  coalesce(w.suggested <> s.given, false) AS flagged
         |FROM spine s LEFT JOIN w USING (item)""".stripMargin,
    "q_cl_joint" ->
      s"""WITH $clCteSql
         |SELECT s.given, w.suggested, count(*) AS n
         |FROM spine s JOIN w USING (item) GROUP BY 1, 2""".stripMargin,
    "q_ev_auc" ->
      s"""WITH ev AS ($evSql),
         |e AS (
         |  SELECT event_type AS grp, floor(value * 10) / 10 AS s,
         |    CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS y
         |  FROM ev WHERE event_type IS NOT NULL),
         |r AS (
         |  SELECT grp, y,
         |    rank() OVER (PARTITION BY grp ORDER BY s) AS rmin,
         |    count(*) OVER (PARTITION BY grp, s) AS ties
         |  FROM e),
         |a AS (
         |  SELECT grp,
         |    CAST(sum(y) AS BIGINT) AS n_pos,
         |    CAST(sum(1 - y) AS BIGINT) AS n_neg,
         |    CAST(sum(CASE WHEN y = 1 THEN 2 * rmin + (ties - 1) ELSE 0 END) AS BIGINT) AS s2
         |  FROM r GROUP BY 1)
         |SELECT grp, n_pos, n_neg,
         |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
         |    ELSE floor(CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
         |      / (2.0 * n_pos * n_neg) * 1000000 + 0.5) / 1000000 END AS auc
         |FROM a""".stripMargin,
    "q_ev_calib" ->
      s"""WITH ev AS ($evSql),
         |e AS (
         |  SELECT event_type AS grp, abs(value) - floor(abs(value)) AS p,
         |    CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS y
         |  FROM ev WHERE event_type IS NOT NULL),
         |b AS (
         |  SELECT grp, CAST(least(floor(p * 10), 9) AS BIGINT) AS bin, y,
         |    CAST(floor(p * 1e6 + 0.5) AS BIGINT) AS pm
         |  FROM e),
         |g AS (
         |  SELECT grp, bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS hits,
         |    CAST(sum(pm) AS BIGINT) AS spm
         |  FROM b GROUP BY 1, 2)
         |SELECT grp, bin, n, hits,
         |  floor(CAST(spm AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6) * 1000000 + 0.5) / 1000000 AS conf,
         |  floor(CAST(hits AS DOUBLE) / CAST(n AS DOUBLE) * 1000000 + 0.5) / 1000000 AS acc
         |FROM g""".stripMargin,
    "q_ev_ece" ->
      s"""WITH ev AS ($evSql),
         |e AS (
         |  SELECT event_type AS grp, abs(value) - floor(abs(value)) AS p,
         |    CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS y
         |  FROM ev WHERE event_type IS NOT NULL),
         |b AS (
         |  SELECT grp, CAST(least(floor(p * 10), 9) AS BIGINT) AS bin, y,
         |    CAST(floor(p * 1e6 + 0.5) AS BIGINT) AS pm
         |  FROM e),
         |g AS (
         |  SELECT grp, bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS hits,
         |    CAST(sum(pm) AS BIGINT) AS spm
         |  FROM b GROUP BY 1, 2)
         |SELECT grp, CAST(sum(n) AS BIGINT) AS n,
         |  floor(CAST(sum(abs(hits * 1000000 - spm)) AS DOUBLE)
         |    / (CAST(sum(n) AS DOUBLE) * 1e6) * 1000000 + 0.5) / 1000000 AS ece
         |FROM g GROUP BY 1""".stripMargin,
    "q_ev_mcnemar" ->
      """WITH e AS (
        |  SELECT event_id % 3 <> 0 AS a_ok, event_id % 5 <> 0 AS b_ok
        |  FROM events WHERE event_id IS NOT NULL),
        |t AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END) AS BIGINT) AS b_only,
        |    CAST(sum(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END) AS BIGINT) AS c_only
        |  FROM e)
        |SELECT n, b_only, c_only,
        |  CASE WHEN b_only + c_only = 0 THEN NULL
        |    ELSE floor(CAST((b_only - c_only) * (b_only - c_only) AS DOUBLE)
        |      / (b_only + c_only) * 1000000 + 0.5) / 1000000 END AS chi2,
        |  CASE WHEN b_only + c_only = 0 THEN NULL
        |    ELSE floor(CAST(greatest(abs(b_only - c_only) - 1, 0)
        |        * greatest(abs(b_only - c_only) - 1, 0) AS DOUBLE)
        |      / (b_only + c_only) * 1000000 + 0.5) / 1000000 END AS chi2_cc
        |FROM t""".stripMargin,
    "q_ev_fleiss" ->
      s"""WITH ev AS ($evSql),
         |e AS (
         |  SELECT event_id AS item,
         |    CAST(floor(value * 10) AS BIGINT) % 3 AS la,
         |    CAST(floor(value * 7) AS BIGINT) % 3 AS lb,
         |    CAST(floor(value * 13) AS BIGINT) % 3 AS lc
         |  FROM ev),
         |r AS (
         |  SELECT item, la AS label FROM e UNION ALL
         |  SELECT item, lb FROM e UNION ALL
         |  SELECT item, lc FROM e),
         |cells AS (SELECT item, label, count(*) AS nij FROM r GROUP BY 1, 2),
         |an AS (SELECT CAST(sum(nij * nij) AS BIGINT) - count(DISTINCT item) * 3 AS a,
         |    count(DISTINCT item) AS n_items FROM cells),
         |s2t AS (SELECT CAST(sum(sj * sj) AS BIGINT) AS s2 FROM
         |  (SELECT label, CAST(sum(nij) AS BIGINT) AS sj FROM cells GROUP BY 1))
         |SELECT n_items, CAST(3 AS BIGINT) AS n_raters,
         |  floor(CAST(a AS DOUBLE) / CAST(n_items * 3 * 2 AS DOUBLE) * 1000000 + 0.5)
         |    / 1000000 AS p_bar,
         |  floor(CAST(s2 AS DOUBLE)
         |      / CAST(CAST(n_items * 3 AS HUGEINT) * (n_items * 3) AS DOUBLE)
         |      * 1000000 + 0.5) / 1000000 AS p_e,
         |  CASE WHEN CAST(n_items * 3 AS HUGEINT) * (n_items * 3) = s2 THEN NULL
         |    ELSE floor(
         |      CAST(CAST(a AS HUGEINT) * (CAST(n_items * 3 AS HUGEINT) * (n_items * 3))
         |         - CAST(s2 AS HUGEINT) * (n_items * 3 * 2) AS DOUBLE)
         |      / CAST(CAST(n_items * 3 * 2 AS HUGEINT)
         |         * (CAST(n_items * 3 AS HUGEINT) * (n_items * 3) - s2) AS DOUBLE)
         |      * 1000000 + 0.5) / 1000000 END AS kappa
         |FROM an, s2t""".stripMargin,
    "q_ev_brier" ->
      s"""WITH ev AS ($evSql),
         |e AS (
         |  SELECT event_type AS grp, abs(value) - floor(abs(value)) AS p,
         |    CASE WHEN event_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS y
         |  FROM ev WHERE event_type IS NOT NULL),
         |b AS (SELECT grp,
         |    CAST(floor((p - y) * (p - y) * 1e9 + 0.5) AS BIGINT) AS sen
         |  FROM e)
         |SELECT grp, count(*) AS n,
         |  floor(CAST(sum(sen) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1e9)
         |    * 1000000 + 0.5) / 1000000 AS brier
         |FROM b GROUP BY 1""".stripMargin,
    "q_ev_cochran" ->
      """WITH r AS (
        |  SELECT event_id AS item, 's3' AS sys,
        |    CASE WHEN event_id % 3 <> 0 THEN 1 ELSE 0 END AS c
        |  FROM events WHERE event_id IS NOT NULL
        |  UNION ALL
        |  SELECT event_id, 's5', CASE WHEN event_id % 5 <> 0 THEN 1 ELSE 0 END
        |  FROM events WHERE event_id IS NOT NULL
        |  UNION ALL
        |  SELECT event_id, 's7', CASE WHEN event_id % 7 <> 0 THEN 1 ELSE 0 END
        |  FROM events WHERE event_id IS NOT NULL),
        |kk AS (SELECT count(DISTINCT sys) AS k FROM r),
        |li AS (SELECT item, count(*) AS nr, CAST(sum(c) AS BIGINT) AS l
        |  FROM r GROUP BY 1),
        |p AS (SELECT li.* FROM li, kk WHERE li.nr = kk.k),
        |ia AS (SELECT count(*) AS n_items, CAST(coalesce(sum(l), 0) AS BIGINT) AS t,
        |    CAST(coalesce(sum(CAST(l AS HUGEINT) * l), 0) AS HUGEINT) AS sl2
        |  FROM p),
        |gs AS (SELECT CAST(coalesce(sum(CAST(gj AS HUGEINT) * gj), 0) AS HUGEINT) AS sg2
        |  FROM (SELECT sys, CAST(sum(c) AS BIGINT) AS gj
        |    FROM r JOIN p USING (item) GROUP BY 1))
        |SELECT ia.n_items, kk.k,
        |  CASE WHEN CAST(kk.k AS HUGEINT) * ia.t - ia.sl2 <= 0 THEN NULL
        |    ELSE floor(
        |      CAST((kk.k - 1) * (CAST(kk.k AS HUGEINT) * gs.sg2
        |          - CAST(ia.t AS HUGEINT) * ia.t) AS DOUBLE)
        |      / CAST(CAST(kk.k AS HUGEINT) * ia.t - ia.sl2 AS DOUBLE)
        |      * 1000000 + 0.5) / 1000000 END AS q_stat
        |FROM ia, gs, kk""".stripMargin,
    "q_ev_kripp" ->
      s"""WITH ev AS ($evSql),
         |e AS (
         |  SELECT event_id AS item,
         |    CAST(floor(value * 10) AS BIGINT) % 3 AS la,
         |    CAST(floor(value * 7) AS BIGINT) % 3 AS lb,
         |    CAST(floor(value * 13) AS BIGINT) % 3 AS lc
         |  FROM ev),
         |r AS (
         |  SELECT item, la AS label FROM e
         |  UNION ALL SELECT item, lb FROM e
         |  UNION ALL SELECT item, lc FROM e WHERE item % 3 <> 0),
         |g AS (SELECT item, label, count(*) AS nic FROM r GROUP BY 1, 2),
         |ni AS (SELECT item, CAST(sum(nic) AS BIGINT) AS n_i,
         |    CAST(sum(nic * nic) AS BIGINT) AS s2
         |  FROM g GROUP BY 1),
         |p AS (SELECT * FROM ni WHERE n_i >= 2),
         |dn AS (
         |  SELECT CAST(coalesce(sum(CAST(floor(
         |      CAST(n_i * n_i - s2 AS DOUBLE) / CAST(n_i - 1 AS DOUBLE)
         |      * 1e9 + 0.5) AS BIGINT)), 0) AS BIGINT) AS dn,
         |    count(*) AS n_items
         |  FROM p),
         |m AS (SELECT label, CAST(sum(nic) AS BIGINT) AS nc
         |  FROM g JOIN p USING (item) GROUP BY 1),
         |tot AS (SELECT CAST(coalesce(sum(nc), 0) AS BIGINT) AS n,
         |    CAST(coalesce(sum(CAST(nc AS HUGEINT) * nc), 0) AS HUGEINT) AS sc2,
         |    count(*) AS n_values
         |  FROM m)
         |SELECT dn.n_items, tot.n AS n_pairable, tot.n_values,
         |  floor(CAST(dn.dn AS DOUBLE) / 1e9 * 1000000 + 0.5) / 1000000 AS d_o,
         |  CASE WHEN tot.n < 2 THEN NULL
         |    ELSE floor(CAST(CAST(tot.n AS HUGEINT) * tot.n - tot.sc2 AS DOUBLE)
         |      / CAST(tot.n - 1 AS DOUBLE) * 1000000 + 0.5) / 1000000 END AS d_e,
         |  CASE WHEN tot.n < 2
         |      OR CAST(CAST(tot.n AS HUGEINT) * tot.n - tot.sc2 AS DOUBLE) <= 0 THEN NULL
         |    ELSE floor((1.0 - CAST(dn.dn AS DOUBLE) * CAST(tot.n - 1 AS DOUBLE)
         |      / (CAST(CAST(tot.n AS HUGEINT) * tot.n - tot.sc2 AS DOUBLE) * 1e9))
         |      * 1000000 + 0.5) / 1000000 END AS alpha
         |FROM dn, tot""".stripMargin,
    "q_ev_conformal" ->
      s"""WITH ev AS ($evSql),
         |b AS (
         |  SELECT event_id, abs(value) * 3 - floor(abs(value) * 3) AS s
         |  FROM ev),
         |cal AS (SELECT s FROM b WHERE event_id % 2 = 0),
         |tst AS (SELECT s FROM b WHERE event_id % 2 = 1),
         |nk AS (
         |  SELECT count(*) AS n_cal,
         |    CAST(ceil(CAST(count(*) + 1 AS DOUBLE) * 0.9) AS BIGINT) AS k
         |  FROM cal),
         |rk AS (SELECT s, row_number() OVER (ORDER BY s) AS rn FROM cal),
         |q AS (SELECT max(rk.s) AS qraw FROM rk, nk WHERE rk.rn <= nk.k),
         |cov AS (
         |  SELECT count(*) AS n_test,
         |    CAST(coalesce(sum(CASE WHEN nk.k > nk.n_cal OR tst.s <= q.qraw
         |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_covered
         |  FROM tst, nk, q)
         |SELECT nk.n_cal, nk.k,
         |  CASE WHEN nk.k > nk.n_cal THEN NULL
         |    ELSE floor(q.qraw * 1000000 + 0.5) / 1000000 END AS qhat,
         |  cov.n_test, cov.n_covered,
         |  CASE WHEN cov.n_test = 0 THEN NULL
         |    ELSE floor(CAST(cov.n_covered AS DOUBLE) / CAST(cov.n_test AS DOUBLE)
         |      * 1000000 + 0.5) / 1000000 END AS coverage
         |FROM nk, q, cov""".stripMargin,
    "q_ev_perm" ->
      s"""WITH ev AS ($evSql),
         |d AS (
         |  SELECT CAST(event_id AS VARCHAR) AS item,
         |    CAST(floor(((abs(value) * 3 - floor(abs(value) * 3))
         |      - (abs(value) * 5 - floor(abs(value) * 5))) * 1e6 + 0.5) AS BIGINT) AS dm
         |  FROM ev),
         |obs AS (SELECT count(*) AS n, CAST(coalesce(sum(dm), 0) AS BIGINT) AS s FROM d),
         |f AS (
         |  SELECT b,
         |    CAST(sum((CAST('0x' || substr(md5('perm:' || b || ':' || item), 1, 1) AS BIGINT)
         |      % 2 * 2 - 1) * dm) AS BIGINT) AS sb
         |  FROM d, (SELECT unnest(range(0, 200)) AS b) GROUP BY 1),
         |h AS (SELECT CAST(sum(CASE WHEN abs(sb) >= abs(s) THEN 1 ELSE 0 END) AS BIGINT) AS hits
         |  FROM f, obs)
         |SELECT obs.n, CAST(200 AS BIGINT) AS replicates,
         |  CASE WHEN obs.n = 0 THEN NULL
         |    ELSE floor(CAST(obs.s AS DOUBLE) / (CAST(obs.n AS DOUBLE) * 1e6)
         |      * 1000000 + 0.5) / 1000000 END AS mean_delta,
         |  coalesce(h.hits, 200) AS hits,
         |  floor(CAST(coalesce(h.hits, 200) + 1 AS DOUBLE) / 201 * 1000000 + 0.5)
         |    / 1000000 AS p_value
         |FROM obs, h""".stripMargin,
    "q_ev_wilson" ->
      """WITH m AS (
        |  SELECT user_id % 32 AS a, (user_id // 32) % 32 AS b,
        |    CAST(floor(value * 100) AS BIGINT) % 2 AS w
        |  FROM events
        |  WHERE user_id IS NOT NULL AND value IS NOT NULL
        |    AND user_id % 32 <> (user_id // 32) % 32),
        |sides AS (
        |  SELECT a AS item, CASE WHEN w > 0 THEN 1 ELSE 0 END AS won FROM m
        |  UNION ALL
        |  SELECT b, CASE WHEN w > 0 THEN 0 ELSE 1 END FROM m),
        |g AS (
        |  SELECT item, count(*) AS games, CAST(sum(won) AS BIGINT) AS wins
        |  FROM sides GROUP BY 1)
        |SELECT item, games, wins,
        |  floor(CAST(wins AS DOUBLE) / CAST(games AS DOUBLE) * 1000000 + 0.5)
        |    / 1000000 AS win_rate,
        |  floor(
        |    ((CAST(wins AS DOUBLE) / CAST(games AS DOUBLE)
        |        + (1.96 * 1.96) / (2.0 * CAST(games AS DOUBLE))
        |        - 1.96 * sqrt((CAST(wins AS DOUBLE) / CAST(games AS DOUBLE)
        |            * (1.0 - CAST(wins AS DOUBLE) / CAST(games AS DOUBLE))
        |            + (1.96 * 1.96) / (4.0 * CAST(games AS DOUBLE)))
        |          / CAST(games AS DOUBLE)))
        |      / (1.0 + (1.96 * 1.96) / CAST(games AS DOUBLE)))
        |    * 1000000 + 0.5) / 1000000 AS wilson_lb
        |FROM g""".stripMargin)
}
