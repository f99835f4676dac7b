package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Oracle coverage for deterministic sampling / mixing / splitting
  * (graft.ops.Sampling) — the training-data curation operators. All
  * decisions are md5-derived, so DuckDB reproduces them exactly.
  */
object QueriesSampling {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** DuckDB twin of Sampling.hashUniform. */
  private def uSql(expr: String, salt: String = "") =
    s"(CAST('0x' || substr(md5('$salt' || CAST($expr AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // deterministic corpus sampling at 25%
    "q_sm_hash" -> ((s, dir) =>
      Sampling.hashSample(t(s, dir, "documents"), "doc_id", 0.25)
        .select("doc_id", "lang", "n_chars")),

    // data mixing: per-language rates (en-heavy mix, everything else thin)
    "q_sm_stratified" -> ((s, dir) =>
      Sampling.stratifiedSample(
        t(s, dir, "documents"), "lang", "doc_id",
        rates = Map("en" -> 0.5, "de" -> 0.1), defaultRate = 0.05)
        .select("doc_id", "lang")),

    // weighted reservoir (Efraimidis-Spirakis): 25 docs per language, keep
    // probability tracking n_chars as the weight
    "q_sm_wreservoir" -> ((s, dir) =>
      Sampling.weightedPerStratumSample(
        t(s, dir, "documents"), "lang", "doc_id", "n_chars", k = 25)
        .select("doc_id", "lang", "n_chars")),

    // upsampling with repetition: epochs-per-domain mixing (rates > 1) —
    // en seen 2.5x (every doc twice, an md5-chosen half a third time),
    // de once, fr thinned to half, everything else dropped
    "q_sm_upsample" -> ((s, dir) =>
      Sampling.upsample(
        t(s, dir, "documents"), "lang", "doc_id",
        rates = Map("en" -> 2.5, "de" -> 1.0, "fr" -> 0.5), defaultRate = 0.0)
        .select("doc_id", "lang", "epoch")),

    // train/val/test split: disjoint, exhaustive, rerun-stable
    "q_sm_split" -> ((s, dir) =>
      Sampling.split(
        t(s, dir, "documents"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split")),

    // UniMax allocation (budget 700 rows, ≤2 epochs per language): integer
    // water-filling over the language histogram — capped small languages
    // release budget to the larger ones after them; the sequential fill
    // itself is replayed by the oracle as a recursive CTE
    "q_sm_unimax" -> ((s, dir) =>
      Sampling.unimaxAllocation(
        t(s, dir, "documents"), "lang", budget = 700L, maxEpochs = 2.0)),

    // the applied UniMax mix: per-language quotas taken by md5 rank
    "q_sm_unimax_take" -> ((s, dir) =>
      Sampling.unimaxMix(t(s, dir, "documents"), "lang", "doc_id",
        budget = 700L, maxEpochs = 2.0, salt = "um")
        .select("doc_id", "lang")),

    // temporal split at the 80th time percentile with a 1-day embargo gap:
    // train strictly before cutoff − 86400 s, test at/after the cutoff,
    // the gap excluded from both — the anti-leakage split for
    // time-correlated corpora
    "q_sm_timesplit" -> ((s, dir) =>
      Sampling.temporalSplitEmbargo(
        t(s, dir, "events").select("event_id", "ts", "user_id"),
        "ts", frac = 0.8, embargoSeconds = 86400L)),

    // exactly min(k, |stratum|) docs per language: deterministic min-wise
    // reservoir (k smallest md5-uniforms per stratum)
    "q_sm_pergroup" -> ((s, dir) =>
      Sampling.perStratumSample(t(s, dir, "documents"), "lang", "doc_id", k = 40)
        .select("doc_id", "lang")),

    // temperature mixing at alpha = 0.5: per-language rates (n_i/n_min)^-0.5
    // derived from the data, smallest language kept whole
    "q_sm_temperature" -> ((s, dir) =>
      Sampling.temperatureMix(t(s, dir, "documents"), "lang", "doc_id",
        alpha = 0.5, salt = "mix")
        .select("doc_id", "lang", "n_chars")),

    // weight-proportional sampling: keep probability scales with n_chars
    // (the longest doc keeps at exactly 0.8)
    "q_sm_weighted" -> ((s, dir) =>
      Sampling.weightedSample(t(s, dir, "documents"), "doc_id", "n_chars",
        targetRate = 0.8, salt = "ws")
        .select("doc_id", "lang", "n_chars")),

    // DoReMi-style domain reweighting: per-language mixture weights from
    // proxy-vs-reference excess loss (losses synthesized deterministically
    // from n_chars so the whole update — aggregate, exp, normalize — oracles)
    "q_sm_reweight" -> ((s, dir) =>
      Sampling.domainReweight(
        t(s, dir, "documents").select(
          col("lang"),
          ((col("n_chars") % 97).cast("double") / 10.0).as("cur"),
          ((col("n_chars") % 89).cast("double") / 10.0).as("ref")),
        "lang", "cur", "ref",
        baseWeights = Map("en" -> 2.0), eta = 0.5)),

    // epoch-3 training order: reproducible global permutation, two-level
    // position assignment (no whole-dataset window partition)
    "q_sm_shuffle" -> ((s, dir) =>
      Sampling.epochShuffle(t(s, dir, "documents"), "doc_id", epoch = 3L)
        .select("doc_id", "pos")),

    // token-budget mixture: 40k chars at 60/25/15 en/de/fr — zh/es absent
    // from the target mix drop entirely; under-supplied strata keep whole
    "q_sm_budget" -> ((s, dir) =>
      Sampling.budgetMix(t(s, dir, "documents"), "lang", "doc_id", "n_chars",
        budget = 40000.0, proportions = Map("en" -> 0.6, "de" -> 0.25, "fr" -> 0.15),
        salt = "bm")
        .select("doc_id", "lang", "n_chars")),

    // curriculum order: short-document bands first, shuffled within band
    "q_sm_curriculum" -> ((s, dir) =>
      Sampling.tieredShuffle(
          t(s, dir, "documents").withColumn("band", floor(col("n_chars") / 500)),
          Seq("band"), "doc_id", epoch = 2L)
        .select("doc_id", "band", "pos")),

    // stratified quality cut: keep each language's top 30% by n_chars —
    // exactly ceil(0.3·n_g) rows per group, (score DESC, doc_id) tie canon
    "q_sm_topfrac" -> ((s, dir) =>
      Sampling.topFractionPerGroup(
        t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
        "lang", "doc_id", "n_chars", frac = 0.3)))

  /** UniMax water-fill CTE chain (budget 700, maxEpochs 2.0) ending in
    * `fill(i, remaining, lang, n, cap, quota)` — the driver loop of
    * [[graft.ops.Sampling.unimaxAllocation]] replayed as a recursive CTE.
    */
  private val unimaxCteSql =
    """s AS (
      |  SELECT lang, count(*) AS n, CAST(floor(count(*) * 2.0) AS BIGINT) AS cap
      |  FROM documents WHERE lang IS NOT NULL GROUP BY 1),
      |o AS (SELECT lang, n, cap,
      |    CAST(row_number() OVER (ORDER BY cap, lang) AS BIGINT) AS i,
      |    CAST(count(*) OVER () AS BIGINT) AS tot
      |  FROM s),
      |fill(i, remaining, lang, n, cap, quota) AS (
      |  SELECT o.i, 700 - least(o.cap, 700 // o.tot), o.lang, o.n, o.cap,
      |      least(o.cap, 700 // o.tot)
      |    FROM o WHERE o.i = 1
      |  UNION ALL
      |  SELECT o.i, f.remaining - least(o.cap, f.remaining // (o.tot - o.i + 1)),
      |      o.lang, o.n, o.cap, least(o.cap, f.remaining // (o.tot - o.i + 1))
      |    FROM fill f JOIN o ON o.i = f.i + 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_sm_topfrac" ->
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
        |    AND NOT isnan(CAST(n_chars AS DOUBLE))),
        |r AS (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM d)
        |SELECT doc_id, lang, n_chars FROM r
        |WHERE rn <= CAST(ceil(0.3 * CAST(n AS DOUBLE)) AS BIGINT)""".stripMargin,
    "q_sm_unimax" ->
      s"""WITH RECURSIVE $unimaxCteSql
         |SELECT lang, n AS n_rows, cap, quota FROM fill""".stripMargin,
    "q_sm_unimax_take" ->
      s"""WITH RECURSIVE $unimaxCteSql
         |SELECT doc_id, d.lang FROM documents d JOIN fill USING (lang)
         |WHERE doc_id IS NOT NULL
         |QUALIFY row_number() OVER (
         |  PARTITION BY d.lang ORDER BY ${uSql("doc_id", "um")}, doc_id) <= fill.quota""".stripMargin,
    "q_sm_timesplit" ->
      """WITH r AS (SELECT event_id, ts, user_id FROM events WHERE ts IS NOT NULL),
        |n AS (SELECT count(*) AS n FROM r),
        |c AS (SELECT ts, count(*) AS c FROM r GROUP BY 1),
        |cum AS (SELECT ts, sum(c) OVER (ORDER BY ts) AS cum FROM c),
        |cut AS (SELECT min(ts) AS cutoff FROM cum, n WHERE cum >= ceil(n * 0.8))
        |SELECT r.event_id, r.ts, r.user_id,
        |  CASE WHEN r.ts >= cut.cutoff THEN 'test'
        |       WHEN epoch_us(r.ts) < epoch_us(cut.cutoff) - 86400000000 THEN 'train'
        |       ELSE 'embargo' END AS split
        |FROM r, cut""".stripMargin,
    "q_sm_budget" ->
      s"""WITH w AS (SELECT lang, sum(CAST(n_chars AS DOUBLE)) AS tot
         |    FROM documents GROUP BY 1),
         |r AS (SELECT lang,
         |    floor(least(1.0, 40000.0 *
         |      CASE lang WHEN 'en' THEN 0.6 WHEN 'de' THEN 0.25 WHEN 'fr' THEN 0.15
         |                ELSE 0.0 END / tot) * 1000000000 + 0.5) / 1000000000 AS rate
         |  FROM w)
         |SELECT doc_id, d.lang, n_chars
         |FROM documents d JOIN r ON d.lang = r.lang
         |WHERE ${uSql("doc_id", "bm")} < rate""".stripMargin,
    "q_sm_curriculum" ->
      """SELECT doc_id, CAST(floor(n_chars / 500) AS BIGINT) AS band,
        |  CAST(row_number() OVER (
        |    ORDER BY floor(n_chars / 500), md5('2:' || CAST(doc_id AS VARCHAR)), doc_id)
        |    - 1 AS BIGINT) AS pos
        |FROM documents""".stripMargin,
    "q_sm_shuffle" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (
        |    ORDER BY md5('3:' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) AS pos
        |FROM documents""".stripMargin,
    "q_sm_hash" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE ${uSql("doc_id")} < 0.25""".stripMargin,
    "q_sm_stratified" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${uSql("doc_id")} <
         |  CASE WHEN lang = 'de' THEN 0.1 WHEN lang = 'en' THEN 0.5 ELSE 0.05 END""".stripMargin,
    "q_sm_wreservoir" ->
      s"""WITH s AS (
         |  SELECT doc_id, lang, n_chars,
         |    floor(-ln((CAST('0x' || substr(md5('' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1) / 4294967296.0)
         |      / CAST(n_chars AS DOUBLE) * 1e9 + 0.5) / 1e9 AS score
         |  FROM documents
         |  WHERE doc_id IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0.0)
         |SELECT doc_id, lang, n_chars FROM s
         |QUALIFY row_number() OVER (PARTITION BY lang ORDER BY score, doc_id) <= 25""".stripMargin,
    "q_sm_upsample" ->
      s"""WITH c AS (
         |  SELECT doc_id, lang,
         |    CAST(CASE lang WHEN 'en' THEN 2.0 WHEN 'de' THEN 1.0 ELSE 0.0 END
         |      + CASE WHEN ${uSql("doc_id")} <
         |          CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 0.5 ELSE 0.0 END
         |        THEN 1.0 ELSE 0.0 END AS BIGINT) AS copies
         |  FROM documents WHERE doc_id IS NOT NULL)
         |SELECT doc_id, lang, unnest(generate_series(0, copies - 1)) AS epoch
         |FROM c WHERE copies > 0""".stripMargin,
    "q_sm_split" ->
      s"""SELECT doc_id,
         |  CASE WHEN ${uSql("doc_id")} < 0.8 THEN 'train'
         |       WHEN ${uSql("doc_id")} < 0.9 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin,
    "q_sm_pergroup" ->
      s"""SELECT doc_id, lang FROM documents
         |QUALIFY row_number() OVER (
         |  PARTITION BY lang ORDER BY ${uSql("doc_id")}, doc_id) <= 40""".stripMargin,
    "q_sm_weighted" ->
      s"""WITH m AS (
         |  SELECT floor(0.8 / max(CAST(n_chars AS DOUBLE)) * 1000000000 + 0.5)
         |    / 1000000000 AS scale FROM documents)
         |SELECT doc_id, lang, n_chars FROM documents, m
         |WHERE CAST(n_chars AS DOUBLE) > 0.0
         |  AND ${uSql("doc_id", "ws")} < CAST(n_chars AS DOUBLE) * m.scale""".stripMargin,
    "q_sm_reweight" ->
      """WITH r AS (
        |  SELECT lang,
        |    CAST(n_chars % 97 AS DOUBLE) / 10.0 AS cur,
        |    CAST(n_chars % 89 AS DOUBLE) / 10.0 AS ref
        |  FROM documents WHERE lang IS NOT NULL),
        |d AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    floor(CAST(sum(CAST(cur AS DECIMAL(28,12)) - CAST(ref AS DECIMAL(28,12)))
        |        AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5)
        |      / 1000000.0 AS excess
        |  FROM r GROUP BY lang),
        |u AS (
        |  SELECT *, CAST(floor((CASE WHEN lang = 'en' THEN 2.0 ELSE 1.0 END)
        |      * exp(0.5 * excess) * 1000000000.0 + 0.5) AS BIGINT) AS u9
        |  FROM d),
        |t AS (SELECT CAST(sum(u9) AS BIGINT) AS t9 FROM u)
        |SELECT lang, n_docs, excess,
        |  floor(CAST(u9 AS DOUBLE) / CAST(t9 AS DOUBLE) * 1000000000.0 + 0.5)
        |    / 1000000000.0 AS weight
        |FROM u, t""".stripMargin,
    "q_sm_temperature" ->
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |m AS (SELECT min(n) AS nmin FROM c),
         |r AS (SELECT lang,
         |  floor(power(CAST(n AS DOUBLE) / CAST(nmin AS DOUBLE), -0.5)
         |    * 1000000000 + 0.5) / 1000000000 AS rate FROM c, m)
         |SELECT d.doc_id, d.lang, d.n_chars
         |FROM documents d JOIN r USING (lang)
         |WHERE ${uSql("d.doc_id", "mix")} < r.rate""".stripMargin)
}
