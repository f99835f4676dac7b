package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Preference, Prototype, Sft}

/** Round-9 wave: post-training data preparation — SFT conversation
  * assembly ([[graft.ops.Sft]]), DPO preference-pair construction
  * ([[graft.ops.Preference]]), and D4-style prototypicality pruning
  * ([[graft.ops.Prototype]]). Message/candidate fixtures are derived
  * deterministically from the synthetic tables inside each query body so
  * the DuckDB oracle can rebuild the identical input frame.
  */
object QueriesSft {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  /** Conversations from events: conv = user, turns ordered by event_id,
    * roles mapped from event_type (signup→system, view/click→user,
    * rest→assistant), with a deterministic sprinkling of empty contents
    * (error events with event_id % 7 == 0) so every validation flag trips
    * somewhere in the fixture.
    */
  private def eventMessages(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("user_id").isNotNull && col("event_id").isNotNull)
      .select(
        col("user_id").as("conv_id"),
        col("event_id"),
        when(col("event_type") === "signup", "system")
          .when(col("event_type").isin("view", "click"), "user")
          .otherwise("assistant").as("role"),
        when(col("event_type") === "error" && col("event_id") % 7 === 0, lit(""))
          .otherwise(concat(col("event_type"), lit(":"),
            col("event_id").cast("string"))).as("content"))

  /** Conversations from documents: four consecutive docs form one
    * conversation (system, user, assistant, user), content is each doc's
    * first 150 characters.
    */
  private def docMessages(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(
        floor(col("doc_id") / 4).cast("long").as("conv_id"),
        (col("doc_id") % 4).cast("long").as("turn_idx"),
        when(col("doc_id") % 4 === 0, "system")
          .when(col("doc_id") % 4 === 1, "user")
          .when(col("doc_id") % 4 === 2, "assistant")
          .otherwise("user").as("role"),
        substring(col("text"), 1, 150).as("content"))

  /** The md5-frozen 16-cell centroid relation over embeddings — the
    * [[graft.ops.IvfIndex.build]] seed rule, so the oracle replays it.
    */
  private def frozenCentroids(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id").cast("long").as("cell"),
        col("embedding").cast("array<double>").as("cv"),
        md5(col("vec_id").cast("string")).as("_h"))
      .orderBy("_h")
      .limit(16)
      .select("cell", "cv")

  /** Tool-call conversations from events: every 4th turn is a user ask,
    * odd turns are assistant tool calls built as JSON text, with a
    * deterministic sprinkling of every defect class the validator gates:
    * unknown tool (`% 13`), missing required arg (`% 17`), fabricated arg
    * (`% 19`), wrong top-level key (`% 23`), truncated JSON (`% 31`).
    * Content strings are concat-built so the DuckDB oracle reproduces them
    * byte-for-byte.
    */
  private def toolCallMessages(s: SparkSession, dir: String): DataFrame = {
    val eid = col("event_id")
    val es = eid.cast("string")
    val tool = when(eid % 13 === 0, "teleport")
      .when(eid % 3 === 0, "lookup")
      .when(eid % 3 === 1, "search")
      .otherwise("update")
    val argsKey = when(eid % 23 === 0, "arguments").otherwise("args")
    val argsBody = when(tool === "search",
        concat(lit("{\"q\":\""), es, lit("\""),
          when(eid % 19 === 0, ",\"extra\":1").otherwise(""), lit("}")))
      .when(tool === "update",
        concat(lit("{\"id\":"), es,
          when(eid % 17 === 0, lit(""))
            .otherwise(concat(lit(",\"value\":"), (eid % 9).cast("string"))),
          lit("}")))
      .otherwise( // lookup shape; the unknown tool rides it too
        concat(lit("{\"id\":"), es,
          when(eid % 17 === 0, "").otherwise(",\"limit\":5"),
          when(eid % 19 === 0, ",\"extra\":1").otherwise(""), lit("}")))
    val base = concat(lit("{\"tool\":\""), tool, lit("\",\""), argsKey,
      lit("\":"), argsBody, lit("}"))
    t(s, dir, "events")
      .filter(col("user_id").isNotNull && eid.isNotNull)
      .select(
        col("user_id").as("conv_id"),
        eid,
        when(eid % 4 === 0, "user").otherwise("assistant").as("role"),
        when(eid % 4 === 0, concat(lit("ask:"), es))
          .when(eid % 4 === 2, concat(lit("plain "), es))
          .when(eid % 31 === 0, base.substr(lit(1), length(base) - 1))
          .otherwise(base).as("content"))
  }

  /** The bounded tool registry dimension. */
  private def toolRegistry(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("lookup", Seq("id", "limit"), Seq("verbose")),
      ("search", Seq("q"), Seq("limit")),
      ("update", Seq("id", "value"), Seq.empty[String]))
      .toDF("tool", "required", "optional")
  }

  /** Scored DPO candidates from events: prompt = user, candidate = event,
    * score = value. */
  private def candidates(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("user_id").isNotNull && col("event_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sft_validate" -> ((s, dir) =>
      Sft.validate(eventMessages(s, dir), "conv_id", "event_id", "role", "content")),

    // function-calling validation: per-call structural flags over the
    // defect-seeded tool-call fixture (hallucinated tools, missing and
    // fabricated arguments, malformed JSON) against the bounded registry
    "q_sft_toolcalls" -> ((s, dir) =>
      Sft.validateToolCalls(toolCallMessages(s, dir),
        "conv_id", "event_id", "role", "content", toolRegistry(s))),

    // per-conversation rollup: zero-call conversations report calls_ok so
    // the flag ANDs with q_sft_validate's keep
    "q_sft_toolcall_report" -> ((s, dir) =>
      Sft.toolCallReport(toolCallMessages(s, dir),
        "conv_id", "event_id", "role", "content", toolRegistry(s))),

    "q_sft_render" -> ((s, dir) =>
      Sft.render(docMessages(s, dir), "conv_id", "turn_idx", "role", "content")),

    "q_sft_lossmask" -> ((s, dir) =>
      Sft.lossMaskSpans(docMessages(s, dir), "conv_id", "turn_idx", "role", "content")),

    // the SFT data funnel as ONE plan: structural validation gates →
    // keep survivors → render to training strings → loss-mask spans →
    // per-conversation trainable-character budget (the number an SFT
    // data build reports: how much loss-bearing content survived).
    // The oracle recomputes trainable_chars a DIFFERENT way (assistant
    // content lengths directly, not span end−start), so span arithmetic
    // and summary must agree through two independent derivations.
    "q_e2e_sft" -> ((s, dir) => {
      // three docs form one conversation (system, user, assistant); a
      // deterministic subset is BROKEN so the gates actually gate: every
      // 5th conversation swaps its middle role (roles_ok fails), every
      // 7th makes the middle content tab+space-only (no_empty fails via
      // the whitespace class — the SQL-trim blind spot)
      val conv = floor(col("doc_id") / 3).cast("long")
      val msgs = t(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(
          conv.as("conv_id"),
          (col("doc_id") % 3).cast("long").as("turn_idx"),
          when(col("doc_id") % 3 === 0, "system")
            .when(col("doc_id") % 3 === 1,
              when(conv % 5 === 0, "assistant").otherwise("user"))
            .otherwise("assistant").as("role"),
          when(conv % 7 === 0 && col("doc_id") % 3 === 1, lit("\t "))
            .otherwise(substring(col("text"), 1, 120)).as("content"))
      val keep = Sft.validate(msgs, "conv_id", "turn_idx", "role", "content")
        .filter(col("keep")).select("conv_id")
      val kept = msgs.join(keep, Seq("conv_id"))
      val rendered = Sft.render(kept, "conv_id", "turn_idx", "role", "content")
      val spans = Sft.lossMaskSpans(kept, "conv_id", "turn_idx", "role", "content")
      rendered
        .join(
          spans.groupBy(col("conv_id")).agg(
            count(lit(1)).as("n_spans"),
            sum(col("end_pos") - col("start_pos")).as("trainable_chars")),
          Seq("conv_id"), "left")
        .select(col("conv_id"), col("text"), col("n_turns"), col("n_chars"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          coalesce(col("trainable_chars"), lit(0L)).as("trainable_chars"),
          Functions.roundHalfUp(
            coalesce(col("trainable_chars"), lit(0L)).cast("double") /
              col("n_chars").cast("double"), 6).as("coverage"))
    }),

    "q_dpo_pairs" -> ((s, dir) =>
      Preference.pairs(candidates(s, dir), "user_id", "event_id", "value",
        minMargin = 50.0)),

    // Bradley-Terry strength fit over md5-free deterministic pairwise
    // matches derived from events (a = user % 32, b = user div 32 mod 32,
    // win = parity of floor(value·100)): 5 full-batch gradient iterations
    // in integer nano-units — the ITERATED fixpoint itself is replayed by
    // the oracle as unrolled CTE pairs (the PageRank discipline)
    "q_bt_strength" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val m = e
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(
          (col("user_id") % 32).as("item_a"),
          ((col("user_id") / 32).cast("long") % 32).as("item_b"),
          (floor(col("value") * 100).cast("long") % 2).as("win_a"))
      Preference.bradleyTerry(m, "item_a", "item_b", "win_a", iterations = 5)
    }),

    // Cohen's kappa between two synthetic raters derived from event values
    // (floor(v·10) mod 3 vs floor(v·7) mod 3) — correlated but not equal, so
    // κ lands strictly between chance and 1 and every term is exercised
    "q_kappa" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .filter(col("event_id").isNotNull && col("value").isNotNull &&
          !isnan(col("value").cast("double")))
      val ratings = e.select(col("event_id"), lit("a").as("rater"),
          (floor(col("value") * 10).cast("long") % 3).as("label"))
        .unionByName(e.select(col("event_id"), lit("b").as("rater"),
          (floor(col("value") * 7).cast("long") % 3).as("label")))
      Preference.cohenKappa(ratings, "event_id", "rater", "label", "a", "b")
    }),

    "q_dpo_pairs_topk" -> ((s, dir) =>
      Preference.pairsTopBottom(candidates(s, dir), "user_id", "event_id", "value",
        k = 3, minMargin = 100.0)),

    "q_dpo_advantage" -> ((s, dir) =>
      Preference.groupAdvantage(candidates(s, dir), "user_id", "event_id", "value")),

    "q_dpo_bestofn" -> ((s, dir) =>
      Preference.bestOfN(candidates(s, dir), "user_id", "event_id", "value",
        minScore = 220.0)),

    "q_pf_embdrift" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.ops.Profile.embeddingDrift(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        "embedding", frozenCentroids(s, dir))
    }),

    "q_proto_rank" -> ((s, dir) =>
      Prototype.prototypicality(t(s, dir, "embeddings"), "vec_id", "embedding",
        frozenCentroids(s, dir))),

    "q_proto_prune" -> ((s, dir) =>
      Prototype.prune(t(s, dir, "embeddings"), "vec_id", "embedding",
        frozenCentroids(s, dir), dropTopFrac = 0.25, dropBottomFrac = 0.125)),

    // cluster quality vs known labels: purity + NMI of the frozen-centroid
    // IVF assignment against the embeddings label column — the external
    // validity check before a semantic dedup trusts its cluster structure
    "q_sd_nmi" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.ops.ClusterEval.purityNmi(
        graft.ops.ClusterEval.assignCells(
          emb.filter(col("label").isNotNull), "embedding", frozenCentroids(s, dir)),
        "cell", "label")
    }))

  /** The shared message-fixture CTE, verbatim in every SFT oracle. */
  private val eventMsgsSql =
    """SELECT user_id AS conv_id, event_id,
      |    CASE WHEN event_type = 'signup' THEN 'system'
      |         WHEN event_type IN ('view', 'click') THEN 'user'
      |         ELSE 'assistant' END AS role,
      |    CASE WHEN event_type = 'error' AND event_id % 7 = 0 THEN ''
      |         ELSE event_type || ':' || CAST(event_id AS VARCHAR) END AS content
      |  FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL""".stripMargin

  private val docMsgsSql =
    """SELECT CAST(floor(doc_id / 4) AS BIGINT) AS conv_id,
      |    CAST(doc_id % 4 AS BIGINT) AS turn_idx,
      |    CASE WHEN doc_id % 4 = 0 THEN 'system'
      |         WHEN doc_id % 4 = 1 THEN 'user'
      |         WHEN doc_id % 4 = 2 THEN 'assistant'
      |         ELSE 'user' END AS role,
      |    substr(text, 1, 150) AS content
      |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL""".stripMargin

  /** Tool-call fixture + per-call validation CTE chain, shared by both
    * tool-call oracles (ends with per-call flag table `tcf`). Concat
    * operators sit at line ENDS — stripMargin would eat a leading `||`.
    */
  private val toolCallsSql =
    """tm0 AS (
      |  SELECT user_id, event_id,
      |    CASE WHEN event_id % 13 = 0 THEN 'teleport'
      |         WHEN event_id % 3 = 0 THEN 'lookup'
      |         WHEN event_id % 3 = 1 THEN 'search'
      |         ELSE 'update' END AS tool,
      |    CASE WHEN event_id % 23 = 0 THEN 'arguments' ELSE 'args' END AS argskey
      |  FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL),
      |tm1 AS (
      |  SELECT user_id, event_id, tool, argskey,
      |    CASE WHEN tool = 'search' THEN
      |        '{"q":"' || CAST(event_id AS VARCHAR) || '"' ||
      |        CASE WHEN event_id % 19 = 0 THEN ',"extra":1' ELSE '' END || '}'
      |      WHEN tool = 'update' THEN
      |        '{"id":' || CAST(event_id AS VARCHAR) ||
      |        CASE WHEN event_id % 17 = 0 THEN ''
      |             ELSE ',"value":' || CAST(event_id % 9 AS VARCHAR) END || '}'
      |      ELSE
      |        '{"id":' || CAST(event_id AS VARCHAR) ||
      |        CASE WHEN event_id % 17 = 0 THEN '' ELSE ',"limit":5' END ||
      |        CASE WHEN event_id % 19 = 0 THEN ',"extra":1' ELSE '' END || '}'
      |    END AS argsbody
      |  FROM tm0),
      |tm2 AS (
      |  SELECT user_id, event_id,
      |    '{"tool":"' || tool || '","' || argskey || '":' || argsbody || '}' AS base
      |  FROM tm1),
      |m AS (
      |  SELECT user_id AS conv_id, event_id,
      |    CASE WHEN event_id % 4 = 0 THEN 'user' ELSE 'assistant' END AS role,
      |    CASE WHEN event_id % 4 = 0 THEN 'ask:' || CAST(event_id AS VARCHAR)
      |         WHEN event_id % 4 = 2 THEN 'plain ' || CAST(event_id AS VARCHAR)
      |         WHEN event_id % 31 = 0 THEN substr(base, 1, length(base) - 1)
      |         ELSE base END AS content
      |  FROM tm2),
      |reg AS (SELECT * FROM (VALUES
      |    ('lookup', ['id', 'limit'], ['verbose']),
      |    ('search', ['q'], ['limit']),
      |    ('update', ['id', 'value'], CAST([] AS VARCHAR[])))
      |  r(tool, required, optional)),
      |tcc AS (SELECT conv_id, event_id, content FROM m
      |  WHERE role = 'assistant' AND starts_with(content, '{')),
      |tcx AS (SELECT conv_id, event_id,
      |    CASE WHEN json_valid(content)
      |      THEN json_extract_string(content, '$.tool') END AS tool,
      |    CASE WHEN json_valid(content) THEN
      |      (CASE WHEN json_type(content) = 'OBJECT'
      |            THEN json_keys(content) END) END AS topk,
      |    CASE WHEN json_valid(content)
      |      THEN json_keys(content, '$.args') END AS argk
      |  FROM tcc),
      |tcj AS (SELECT tcx.*, r.required, r.optional
      |  FROM tcx LEFT JOIN reg r USING (tool)),
      |tcf AS (SELECT conv_id, event_id, tool,
      |    (topk IS NOT NULL) AS json_ok,
      |    (topk IS NOT NULL AND list_sort(topk) = ['args', 'tool']
      |      AND argk IS NOT NULL) AS shape_ok,
      |    (topk IS NOT NULL AND list_sort(topk) = ['args', 'tool']
      |      AND argk IS NOT NULL AND required IS NOT NULL) AS tool_known,
      |    coalesce(topk IS NOT NULL AND list_sort(topk) = ['args', 'tool']
      |      AND argk IS NOT NULL AND required IS NOT NULL
      |      AND list_has_all(argk, required), FALSE) AS args_ok,
      |    coalesce(topk IS NOT NULL AND list_sort(topk) = ['args', 'tool']
      |      AND argk IS NOT NULL AND required IS NOT NULL
      |      AND list_has_all(required || optional, argk), FALSE) AS no_unknown_args
      |  FROM tcj)""".stripMargin

  private val protoRankSql =
    """WITH cent AS (
      |  SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
      |  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
      |sc AS (
      |  SELECT e.vec_id, c.cell,
      |    floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv)
      |      * 1000000 + 0.5) / 1000000 AS sim
      |  FROM embeddings e, cent c),
      |a AS (
      |  SELECT vec_id, cell, sim AS cos_centroid FROM sc
      |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) = 1)
      |SELECT vec_id, cell, cos_centroid,
      |  CAST(row_number() OVER (PARTITION BY cell
      |    ORDER BY cos_centroid DESC, vec_id) AS BIGINT) AS rank,
      |  count(*) OVER (PARTITION BY cell) AS n_cluster
      |FROM a""".stripMargin

  private val dpoCandidatesSql =
    """SELECT user_id, event_id, CAST(value AS DOUBLE) AS s FROM events
      |  WHERE user_id IS NOT NULL AND event_id IS NOT NULL
      |    AND value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_bt_strength" -> {
      val iters = 5
      val sb = new StringBuilder
      sb.append(
        """WITH m AS (
          |  SELECT user_id % 32 AS a, (user_id // 32) % 32 AS b,
          |    CAST(floor(value * 100) AS BIGINT) % 2 AS w
          |  FROM events
          |  WHERE user_id IS NOT NULL AND value IS NOT NULL
          |    AND user_id % 32 <> (user_id // 32) % 32),
          |items AS (SELECT DISTINCT item FROM
          |  (SELECT a AS item FROM m UNION ALL SELECT b FROM m)),
          |games AS (SELECT item, count(*) AS n_games FROM
          |  (SELECT a AS item FROM m UNION ALL SELECT b FROM m) GROUP BY 1),
          |t0 AS (SELECT item, CAST(0 AS BIGINT) AS t FROM items)""".stripMargin)
      for (i <- 1 to iters) {
        val p = i - 1
        sb.append(s""",
          |g$i AS (
          |  SELECT m.a, m.b,
          |    CAST(floor((m.w - 1.0 / (1.0 + exp(-(CAST(ta.t - tb.t AS DOUBLE) / 1e9)))) * 1e8 + 0.5) AS BIGINT) AS g
          |  FROM m JOIN t$p ta ON ta.item = m.a JOIN t$p tb ON tb.item = m.b),
          |d$i AS (SELECT item, CAST(sum(d) AS BIGINT) AS d FROM
          |  (SELECT a AS item, g AS d FROM g$i UNION ALL SELECT b, -g FROM g$i) GROUP BY 1),
          |t$i AS (SELECT t$p.item, t$p.t + coalesce(d$i.d, 0) AS t
          |  FROM t$p LEFT JOIN d$i USING (item))""".stripMargin)
      }
      sb.append(s"""
        |SELECT t$iters.item, games.n_games, t$iters.t AS theta_nano
        |FROM t$iters JOIN games USING (item)""".stripMargin)
      sb.toString
    },
    "q_kappa" ->
      """WITH e AS (
        |  SELECT event_id, CAST(floor(value * 10) AS BIGINT) % 3 AS la,
        |    CAST(floor(value * 7) AS BIGINT) % 3 AS lb
        |  FROM events
        |  WHERE event_id IS NOT NULL AND value IS NOT NULL
        |    AND NOT isnan(CAST(value AS DOUBLE))),
        |p AS (SELECT event_id, max(la) AS la, max(lb) AS lb FROM e GROUP BY 1),
        |tot AS (SELECT count(*) AS n,
        |    sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS agree FROM p),
        |ch AS (
        |  SELECT coalesce(sum(a.na * b.nb), 0) AS sab FROM
        |    (SELECT la AS c, count(*) AS na FROM p GROUP BY 1) a
        |    JOIN (SELECT lb AS c, count(*) AS nb FROM p GROUP BY 1) b USING (c))
        |SELECT tot.n AS n_items, CAST(tot.agree AS BIGINT) AS n_agree,
        |  floor(CAST(tot.agree AS DOUBLE) / tot.n * 1000000 + 0.5) / 1000000 AS po,
        |  floor(CAST(ch.sab AS DOUBLE) / (tot.n * tot.n) * 1000000 + 0.5) / 1000000 AS pe,
        |  CASE WHEN tot.n * tot.n - ch.sab <= 0 THEN NULL
        |    ELSE floor(CAST(tot.n * tot.agree - ch.sab AS DOUBLE)
        |      / CAST(tot.n * tot.n - ch.sab AS DOUBLE) * 1000000 + 0.5) / 1000000
        |  END AS kappa
        |FROM tot, ch""".stripMargin,
    "q_sft_toolcalls" ->
      s"""WITH $toolCallsSql
         |SELECT conv_id, event_id, tool, json_ok, shape_ok, tool_known,
         |  args_ok, no_unknown_args,
         |  (args_ok AND no_unknown_args) AS call_ok
         |FROM tcf""".stripMargin,

    "q_sft_toolcall_report" ->
      s"""WITH $toolCallsSql,
         |allconv AS (SELECT DISTINCT conv_id FROM m),
         |agg AS (SELECT conv_id, count(*) AS n_calls,
         |    CAST(sum(CASE WHEN args_ok AND no_unknown_args THEN 0 ELSE 1 END)
         |      AS BIGINT) AS n_bad_calls
         |  FROM tcf GROUP BY 1)
         |SELECT a.conv_id, coalesce(agg.n_calls, 0) AS n_calls,
         |  coalesce(agg.n_bad_calls, 0) AS n_bad_calls,
         |  (coalesce(agg.n_bad_calls, 0) = 0) AS calls_ok
         |FROM allconv a LEFT JOIN agg USING (conv_id)""".stripMargin,

    "q_sft_validate" ->
      s"""WITH m AS ($eventMsgsSql),
         |p AS (SELECT conv_id, role, content,
         |    row_number() OVER (PARTITION BY conv_id ORDER BY event_id) - 1 AS pos
         |  FROM m),
         |l AS (SELECT conv_id,
         |    max(CASE WHEN pos = 0 AND role = 'system' THEN 1 ELSE 0 END) AS lead
         |  FROM p GROUP BY conv_id),
         |f AS (SELECT p.conv_id, pos, role, content, lead,
         |    CASE WHEN lead = 1 AND pos = 0 THEN role = 'system'
         |         ELSE role = CASE WHEN (pos - lead) % 2 = 0
         |                          THEN 'user' ELSE 'assistant' END END AS turn_ok
         |  FROM p JOIN l ON p.conv_id = l.conv_id)
         |SELECT conv_id,
         |  (bool_and(turn_ok) AND max(pos) >= max(lead)) AS roles_ok,
         |  bool_and(content IS NOT NULL
         |    AND regexp_replace(content, '[ \\t\\n\\r\\f]', '', 'g') <> '') AS no_empty,
         |  (arg_max(role, pos) = 'assistant') AS ends_assistant,
         |  count(*) AS n_turns,
         |  (bool_and(turn_ok) AND max(pos) >= max(lead)
         |    AND bool_and(content IS NOT NULL
         |      AND regexp_replace(content, '[ \\t\\n\\r\\f]', '', 'g') <> '')
         |    AND arg_max(role, pos) = 'assistant') AS keep
         |FROM f GROUP BY conv_id""".stripMargin,

    "q_e2e_sft" ->
      s"""WITH m AS (
         |  SELECT CAST(floor(doc_id / 3) AS BIGINT) AS conv_id,
         |    CAST(doc_id % 3 AS BIGINT) AS turn_idx,
         |    CASE WHEN doc_id % 3 = 0 THEN 'system'
         |         WHEN doc_id % 3 = 1 THEN
         |           CASE WHEN CAST(floor(doc_id / 3) AS BIGINT) % 5 = 0
         |                THEN 'assistant' ELSE 'user' END
         |         ELSE 'assistant' END AS role,
         |    CASE WHEN CAST(floor(doc_id / 3) AS BIGINT) % 7 = 0 AND doc_id % 3 = 1
         |         THEN chr(9) || ' '
         |         ELSE substr(text, 1, 120) END AS content
         |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         |p AS (SELECT conv_id, role, content,
         |    row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS pos
         |  FROM m),
         |l AS (SELECT conv_id,
         |    max(CASE WHEN pos = 0 AND role = 'system' THEN 1 ELSE 0 END) AS lead
         |  FROM p GROUP BY conv_id),
         |f AS (SELECT p.conv_id, pos, role, content, lead,
         |    CASE WHEN lead = 1 AND pos = 0 THEN role = 'system'
         |         ELSE role = CASE WHEN (pos - lead) % 2 = 0
         |                          THEN 'user' ELSE 'assistant' END END AS turn_ok
         |  FROM p JOIN l ON p.conv_id = l.conv_id),
         |v AS (SELECT conv_id FROM f GROUP BY conv_id
         |  HAVING bool_and(turn_ok) AND max(pos) >= max(lead)
         |    AND bool_and(content IS NOT NULL
         |      AND regexp_replace(content, '[ \\t\\n\\r\\f]', '', 'g') <> '')
         |    AND arg_max(role, pos) = 'assistant'),
         |kept AS (SELECT m.* FROM m JOIN v USING (conv_id)),
         |r AS (SELECT conv_id,
         |    string_agg('<|' || role || '|>' || chr(10) || content || '<|end|>' || chr(10),
         |      '' ORDER BY turn_idx) AS text,
         |    count(*) AS n_turns
         |  FROM kept GROUP BY conv_id),
         |sa AS (SELECT conv_id, count(*) AS n_spans,
         |    CAST(sum(length(content)) AS BIGINT) AS trainable_chars
         |  FROM kept WHERE role = 'assistant' GROUP BY conv_id)
         |SELECT r.conv_id, r.text, CAST(r.n_turns AS BIGINT) AS n_turns,
         |  CAST(length(r.text) AS BIGINT) AS n_chars,
         |  coalesce(sa.n_spans, 0) AS n_spans,
         |  coalesce(sa.trainable_chars, 0) AS trainable_chars,
         |  floor(CAST(coalesce(sa.trainable_chars, 0) AS DOUBLE)
         |    / CAST(length(r.text) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS coverage
         |FROM r LEFT JOIN sa USING (conv_id)""".stripMargin,

    "q_sft_render" ->
      s"""WITH m AS ($docMsgsSql),
         |r AS (SELECT conv_id,
         |    string_agg('<|' || role || '|>' || chr(10) || content || '<|end|>' || chr(10),
         |      '' ORDER BY turn_idx) AS text,
         |    count(*) AS n_turns
         |  FROM m GROUP BY conv_id)
         |SELECT conv_id, text, n_turns, length(text) AS n_chars FROM r""".stripMargin,

    "q_sft_lossmask" ->
      s"""WITH m AS ($docMsgsSql),
         |p AS (SELECT conv_id, turn_idx, role,
         |    length('<|' || role || '|>' || chr(10)) AS hlen,
         |    length(content) AS clen,
         |    length('<|' || role || '|>' || chr(10) || content
         |      || '<|end|>' || chr(10)) AS plen
         |  FROM m),
         |c AS (SELECT conv_id, turn_idx, role, hlen, clen,
         |    CAST(COALESCE(sum(plen) OVER (PARTITION BY conv_id ORDER BY turn_idx
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS before
         |  FROM p)
         |SELECT conv_id, turn_idx,
         |  before + hlen AS start_pos,
         |  before + hlen + clen AS end_pos
         |FROM c WHERE role = 'assistant'""".stripMargin,

    "q_dpo_pairs" ->
      s"""WITH c AS ($dpoCandidatesSql),
         |hi AS (SELECT user_id, event_id AS chosen_id, s AS chosen_score FROM c
         |  QUALIFY row_number() OVER (PARTITION BY user_id
         |    ORDER BY s DESC, event_id) = 1),
         |lo AS (SELECT user_id, event_id AS rejected_id, s AS rejected_score FROM c
         |  QUALIFY row_number() OVER (PARTITION BY user_id
         |    ORDER BY s, event_id) = 1)
         |SELECT user_id, chosen_id, rejected_id, chosen_score, rejected_score,
         |  chosen_score - rejected_score AS margin
         |FROM hi JOIN lo USING (user_id)
         |WHERE chosen_id <> rejected_id
         |  AND chosen_score - rejected_score >= 50.0""".stripMargin,

    "q_dpo_pairs_topk" ->
      s"""WITH c AS ($dpoCandidatesSql),
         |top AS (SELECT user_id, event_id AS chosen_id, s AS chosen_score FROM c
         |  QUALIFY row_number() OVER (PARTITION BY user_id
         |    ORDER BY s DESC, event_id) <= 3),
         |bot AS (SELECT user_id, event_id AS rejected_id, s AS rejected_score FROM c
         |  QUALIFY row_number() OVER (PARTITION BY user_id
         |    ORDER BY s, event_id) <= 3)
         |SELECT user_id, chosen_id, rejected_id, chosen_score, rejected_score,
         |  chosen_score - rejected_score AS margin
         |FROM top JOIN bot USING (user_id)
         |WHERE chosen_id <> rejected_id AND chosen_score > rejected_score
         |  AND chosen_score - rejected_score >= 100.0""".stripMargin,

    "q_dpo_advantage" ->
      s"""WITH c AS ($dpoCandidatesSql),
         |m AS (SELECT user_id, event_id, s,
         |    CAST(count(*) OVER (PARTITION BY user_id) AS DOUBLE) AS n,
         |    CAST(sum(CAST(s AS DECIMAL(18,6)))
         |      OVER (PARTITION BY user_id) AS DOUBLE) AS s1,
         |    CAST(sum(CAST(s AS DECIMAL(18,6)) * CAST(s AS DECIMAL(18,6)))
         |      OVER (PARTITION BY user_id) AS DOUBLE) AS s2
         |  FROM c)
         |SELECT user_id, event_id, s AS score,
         |  CASE WHEN greatest((s2 * n - s1 * s1) / (n * n), 0.0) > 0
         |       THEN floor((s - s1 / n)
         |         / sqrt(greatest((s2 * n - s1 * s1) / (n * n), 0.0))
         |         * 1000000 + 0.5) / 1000000
         |       ELSE 0.0 END AS advantage
         |FROM m""".stripMargin,

    "q_dpo_bestofn" ->
      s"""WITH c AS ($dpoCandidatesSql),
         |b AS (SELECT user_id, event_id AS best_id, s AS best_score FROM c
         |  QUALIFY row_number() OVER (PARTITION BY user_id
         |    ORDER BY s DESC, event_id) = 1)
         |SELECT user_id, best_id, best_score FROM b
         |WHERE best_score >= 220.0""".stripMargin,

    "q_pf_embdrift" ->
      """WITH cent AS (
        |  SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        |sc AS (
        |  SELECT e.vec_id, c.cell,
        |    floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv)
        |      * 1000000 + 0.5) / 1000000 AS sim
        |  FROM embeddings e, cent c),
        |a AS (
        |  SELECT vec_id, cell FROM sc
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) = 1),
        |r AS (SELECT cell, count(*) AS cr FROM a WHERE vec_id % 2 = 0 GROUP BY 1),
        |cu AS (SELECT cell, count(*) AS cc FROM a WHERE vec_id % 2 = 1 GROUP BY 1),
        |u AS (SELECT COALESCE(cr, 0) AS cr, COALESCE(cc, 0) AS cc
        |  FROM r FULL OUTER JOIN cu USING (cell)),
        |k AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(cr) AS BIGINT) AS nr,
        |    CAST(sum(cc) AS BIGINT) AS nc FROM u),
        |t AS (SELECT floor(
        |    ((cr + 1e-6) / (nr + k * 1e-6) - (cc + 1e-6) / (nc + k * 1e-6))
        |    * ln(((cr + 1e-6) / (nr + k * 1e-6)) / ((cc + 1e-6) / (nc + k * 1e-6)))
        |    * 1e12 + 0.5) AS t
        |  FROM u, k)
        |SELECT (SELECT nr FROM k) AS n_ref, (SELECT nc FROM k) AS n_cur,
        |  floor(CAST(sum(t) AS DOUBLE) / 1e12 * 1e6 + 0.5) / 1e6 AS psi
        |FROM t""".stripMargin,

    "q_sd_nmi" ->
      """WITH cent AS (
        |  SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        |sc AS (
        |  SELECT e.vec_id, e.label, c.cell,
        |    floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv)
        |      * 1000000 + 0.5) / 1000000 AS sim
        |  FROM embeddings e, cent c
        |  WHERE e.label IS NOT NULL AND e.embedding IS NOT NULL),
        |asg AS (
        |  SELECT vec_id, label, cell FROM sc
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) = 1),
        |cells AS (SELECT cell, label, count(*) AS n FROM asg GROUP BY 1, 2),
        |ac AS (SELECT cell, CAST(sum(n) AS BIGINT) AS a FROM cells GROUP BY 1),
        |bk AS (SELECT label, CAST(sum(n) AS BIGINT) AS b FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS nn,
        |    count(DISTINCT cell) AS n_clusters, count(DISTINCT label) AS n_labels
        |  FROM cells),
        |pur AS (SELECT CAST(coalesce(sum(mx), 0) AS BIGINT) AS pure
        |  FROM (SELECT cell, max(n) AS mx FROM cells GROUP BY 1)),
        |mi AS (
        |  SELECT CAST(coalesce(sum(CAST(floor(
        |      (CAST(n AS DOUBLE) / nn)
        |      * ln((CAST(n AS DOUBLE) * nn) / (CAST(a AS DOUBLE) * CAST(b AS DOUBLE)))
        |      * 1e12 + 0.5) AS BIGINT)), 0) AS BIGINT) AS m
        |  FROM cells JOIN ac USING (cell) JOIN bk USING (label), tot),
        |hc AS (
        |  SELECT CAST(coalesce(sum(CAST(floor(
        |      -(CAST(a AS DOUBLE) / nn) * ln(CAST(a AS DOUBLE) / nn)
        |      * 1e12 + 0.5) AS BIGINT)), 0) AS BIGINT) AS h
        |  FROM ac, tot),
        |hl AS (
        |  SELECT CAST(coalesce(sum(CAST(floor(
        |      -(CAST(b AS DOUBLE) / nn) * ln(CAST(b AS DOUBLE) / nn)
        |      * 1e12 + 0.5) AS BIGINT)), 0) AS BIGINT) AS h
        |  FROM bk, tot)
        |SELECT tot.nn AS n, tot.n_clusters, tot.n_labels,
        |  CASE WHEN tot.nn = 0 THEN NULL
        |    ELSE floor(CAST(pur.pure AS DOUBLE) / CAST(tot.nn AS DOUBLE)
        |      * 1000000 + 0.5) / 1000000 END AS purity,
        |  floor(CAST(mi.m AS DOUBLE) / 1e12 * 1000000 + 0.5) / 1000000 AS mi,
        |  floor(CAST(hc.h AS DOUBLE) / 1e12 * 1000000 + 0.5) / 1000000 AS h_cluster,
        |  floor(CAST(hl.h AS DOUBLE) / 1e12 * 1000000 + 0.5) / 1000000 AS h_label,
        |  CASE WHEN hc.h <= 0 OR hl.h <= 0 THEN NULL
        |    ELSE floor(CAST(mi.m AS DOUBLE)
        |      / sqrt(CAST(hc.h AS DOUBLE) * CAST(hl.h AS DOUBLE))
        |      * 1000000 + 0.5) / 1000000 END AS nmi
        |FROM tot, pur, mi, hc, hl""".stripMargin,

    "q_proto_rank" -> protoRankSql,

    "q_proto_prune" ->
      s"""WITH ranked AS ($protoRankSql)
         |SELECT vec_id, cell, cos_centroid,
         |  (rank > floor(0.25 * n_cluster)
         |    AND rank <= n_cluster - floor(0.125 * n_cluster)) AS keep
         |FROM ranked""".stripMargin)
}
