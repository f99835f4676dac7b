package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised-fine-tuning data preparation: conversation validation, chat
  * template rendering, and loss-mask span computation over a long
  * `(conv_id, turn_idx, role, content)` message table — the assembly step
  * every SFT/RLHF pipeline runs between raw dialogue capture and the
  * tokenizer (Ouyang et al. 2022 §3; the template shape follows the
  * publicly documented ChatML/Llama-chat pattern of role-delimited
  * segments).
  *
  * Reference analog: the reference renders publisher-specific output
  * layouts from the same canonical rows
  * (`/root/reference/atd_data_lake/publish.py:36-88`); rendering a chat
  * template is that projection with order-sensitive concatenation.
  *
  * Scale shape: everything here is ONE hash exchange on `conv_id`
  * (conversations are small — tens of turns — so per-group state is
  * bounded; a window/sort within the group never spills). Rendering uses
  * `collect_list` + `array_sort` rather than a window so the whole
  * conversation collapses to one row in the same exchange that orders it.
  * Offsets come from a cumulative sum over rendered-piece LENGTHS — the
  * text itself is concatenated once, never re-scanned per turn.
  *
  * Determinism contract: the template is fixed (`<|role|>\n` + content +
  * `<|end|>\n` per turn, turns in `turn_idx` order), lengths are measured
  * in Unicode code points (Spark `length` ≡ DuckDB `length` on NFC inputs),
  * so rendered text, offsets, and masks are hash-exact across engines
  * (oracles q_sft_render / q_sft_lossmask / q_sft_validate).
  */
object Sft {

  /** `<|role|>\n` — the per-turn header the template prepends. */
  private def header(role: Column): Column = concat(lit("<|"), role, lit("|>\n"))
  private val footer = "<|end|>\n"

  /** One rendered piece: header + content + footer. */
  private def piece(role: Column, content: Column): Column =
    concat(header(role), content, lit(footer))

  /** Per-conversation structural validation flags:
    *
    *   - `roles_ok`   — after an OPTIONAL single leading `system` turn, the
    *     remaining turns alternate `user`, `assistant`, `user`, … starting
    *     with `user` (so `system` never appears past position 0 and two
    *     same-role turns are never adjacent);
    *   - `no_empty`   — no turn's content is NULL or whitespace-only;
    *   - `ends_assistant` — the final turn (by `turn_idx`) is `assistant`;
    *   - `keep`       — the conjunction, the gate a curation pipeline
    *     applies before rendering.
    *
    * One exchange: a window `row_number` orders turns, then per-turn
    * conformance collapses with `bool_and`. Conversations with a single
    * system turn and nothing else fail `roles_ok` (no user turn to start
    * the alternation).
    */
  def validate(
      msgs: DataFrame,
      convCol: String,
      idxCol: String,
      roleCol: String,
      contentCol: String): DataFrame = {
    val w = Window.partitionBy(col(convCol)).orderBy(col(idxCol))
    val pos = row_number().over(w) - lit(1)
    val withPos = msgs.select(
      col(convCol), col(roleCol).as("_role"), col(contentCol).as("_content"),
      pos.as("_pos"),
      // position within the alternation = pos shifted down when the
      // conversation leads with a system turn; NULL role never counts
      first(coalesce(col(roleCol) === "system", lit(false))).over(w)
        .as("_leads_system"))
    val altPos = when(col("_leads_system"), col("_pos") - lit(1)).otherwise(col("_pos"))
    val turnOk =
      when(col("_leads_system") && col("_pos") === 0, col("_role") === "system")
        .otherwise(col("_role") ===
          when(altPos % 2 === 0, lit("user")).otherwise(lit("assistant")))
    withPos
      // NULL role compares to NULL — coalesce so aggregate skipping can
      // never let a NULL-role turn pass the alternation silently
      .withColumn("_turn_ok", coalesce(turnOk, lit(false)))
      .groupBy(col(convCol))
      .agg(
        bool_and(col("_turn_ok")).as("_all_ok"),
        // _leads_system is constant within a conversation, so bool_and
        // just reads it back out of the aggregate
        bool_and(col("_leads_system")).as("_lead"),
        max(col("_pos")).as("_max_pos"),
        // true whitespace-only detection: an explicit char class (space,
        // tab, LF, CR, FF) that Java regex and DuckDB's RE2 read
        // identically — SQL `trim` strips only spaces, so a tab-only turn
        // would sneak past it
        bool_and(col("_content").isNotNull &&
          regexp_replace(col("_content"), "[ \\t\\n\\r\\f]", "") =!= "")
          .as("no_empty"),
        max_by(col("_role"), col("_pos")).as("_last_role"),
        count(lit(1)).as("n_turns"))
      .select(
        col(convCol),
        // a lone system turn has no alternation to satisfy — reject
        (col("_all_ok") &&
          col("_max_pos") >= when(col("_lead"), 1).otherwise(0)).as("roles_ok"),
        col("no_empty"),
        (col("_last_role") === "assistant").as("ends_assistant"),
        col("n_turns"),
        (col("_all_ok") &&
          col("_max_pos") >= when(col("_lead"), 1).otherwise(0) &&
          col("no_empty") &&
          col("_last_role") === "assistant").as("keep"))
  }

  /** Render each conversation to one training string: pieces in `turn_idx`
    * order, `<|role|>\ncontent<|end|>\n` each. Output
    * `(convCol, text, n_turns, n_chars)`; `n_chars` counts code points.
    * One `collect_list` aggregate; `array_sort` on the (idx, piece) structs
    * orders turns without a window sort.
    */
  def render(
      msgs: DataFrame,
      convCol: String,
      idxCol: String,
      roleCol: String,
      contentCol: String): DataFrame =
    msgs
      .select(col(convCol),
        struct(col(idxCol).cast("long").as("i"),
          piece(col(roleCol), col(contentCol)).as("p")).as("_tp"))
      .groupBy(col(convCol))
      .agg(collect_list(col("_tp")).as("_tps"))
      .select(col(convCol),
        concat_ws("", transform(array_sort(col("_tps")), t => t("p")).as("_")).as("text"),
        size(col("_tps")).cast("long").as("n_turns"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  /** Character spans of ASSISTANT turn CONTENT within [[render]]'s output —
    * the spans a trainer leaves unmasked (loss is computed there; user,
    * system, and template decoration are masked). Output one row per
    * assistant turn: `(convCol, idxCol, start_pos, end_pos)`, 0-based,
    * end-exclusive, in code points, so
    * `substring(text, start_pos + 1, end_pos - start_pos)` over the
    * rendered text is exactly the turn's content (spec-asserted).
    *
    * Offsets are a cumulative sum of rendered-piece lengths over a
    * `turn_idx` window — the same single `conv_id` exchange as [[render]];
    * the rendered text is never scanned.
    */
  def lossMaskSpans(
      msgs: DataFrame,
      convCol: String,
      idxCol: String,
      roleCol: String,
      contentCol: String): DataFrame = {
    val w = Window.partitionBy(col(convCol)).orderBy(col(idxCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val pieceLen = length(piece(col(roleCol), col(contentCol))).cast("long")
    val before = coalesce(sum(pieceLen).over(w), lit(0L))
    msgs
      .withColumn("_start", before + length(header(col(roleCol))).cast("long"))
      .filter(col(roleCol) === "assistant")
      .select(col(convCol), col(idxCol),
        col("_start").as("start_pos"),
        (col("_start") + length(col(contentCol)).cast("long")).as("end_pos"))
  }

  /** Project character-level loss-mask spans onto token space: given a
    * token-offset table (one row per token with its source word's
    * code-point range — [[graft.ops.Bpe.encodeWithOffsets]]'s output
    * shape) and a span table ([[lossMaskSpans]]'s `(id, start_pos,
    * end_pos)` shape), emit every token with `trainable = true` iff its
    * word range OVERLAPS some span of the same document. Overlap (not
    * containment) is the right policy at word grain: a template delimiter
    * fused to the last content word by whitespace tokenization must stay
    * trainable rather than silently truncating the span.
    *
    * Spans collapse to ONE array row per document first (bounded — one
    * span per assistant turn), so the token side flows through a single
    * keyed left join exactly once: no token-side re-aggregation, no
    * windows, no driver state. Output:
    * `(idCol, token_pos, token, trainable)`.
    */
  def lossMaskTokens(
      tokens: DataFrame,
      spans: DataFrame,
      idCol: String): DataFrame = {
    val spansArr = spans
      .groupBy(col(idCol))
      .agg(collect_list(
        struct(col("start_pos").as("s"), col("end_pos").as("e"))).as("_spans"))
    tokens
      .join(spansArr, Seq(idCol), "left")
      .select(col(idCol), col("token_pos"), col("token"),
        coalesce(
          exists(col("_spans"),
            sp => col("word_start") < sp("e") && sp("s") < col("word_end")),
          lit(false)).as("trainable"))
  }

  /** One conversation turn on the stream. */
  case class Turn(convId: Long, turnIdx: Long, role: String, content: String)
  /** Folded per-conversation validation state: everything [[validate]]
    * derives, expressible as a LEFT FOLD over turns in `turnIdx` order —
    * which is what makes streaming maintenance possible with O(1) state
    * per conversation.
    */
  case class ConvState(
      lead: Boolean, nTurns: Long, allOk: Boolean,
      noEmpty: Boolean, lastRole: String)
  /** The refreshed flags a batch emits for a conversation that grew. */
  case class ValidateUpdate(
      convId: Long, rolesOk: Boolean, noEmpty: Boolean,
      endsAssistant: Boolean, nTurns: Long, keep: Boolean)

  /** Streaming twin of [[validate]]: per-conversation flags maintained as
    * turns arrive. CONTRACT: turns of one conversation arrive in
    * `turnIdx` order across micro-batches (the Kafka
    * partition-per-conversation guarantee); within a batch they are
    * sorted, so only CROSS-batch disorder violates it. State is one
    * [[ConvState]] per conversation — five scalars regardless of length,
    * because every [[validate]] flag is a left fold over ordered turns.
    * Each batch emits the refreshed flags for conversations that received
    * turns; the LATEST emission per conversation equals the batch
    * [[validate]] over everything seen (SftSpec).
    */
  def validateStream(
      turns: org.apache.spark.sql.Dataset[Turn]): org.apache.spark.sql.Dataset[ValidateUpdate] = {
    import turns.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def fold(st: ConvState, t: Turn): ConvState = {
      val pos = st.nTurns
      val lead = if (pos == 0) t.role == "system" else st.lead
      val turnOk =
        if (lead && pos == 0) true // the system lead itself
        else {
          val altPos = pos - (if (lead) 1 else 0)
          t.role == (if (altPos % 2 == 0) "user" else "assistant")
        }
      // same whitespace class as the batch twin's regexp_replace
      // ("[ \t\n\r\f]") — the two twins must agree on what "empty" means
      ConvState(
        lead, pos + 1,
        st.allOk && turnOk,
        st.noEmpty && t.content != null && !t.content.forall(" \t\n\r\f".contains(_)),
        t.role)
    }
    turns
      .groupByKey(_.convId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (conv: Long, it: Iterator[Turn], state: GroupState[ConvState]) => {
          val init = state.getOption
            .getOrElse(ConvState(lead = false, 0L, allOk = true, noEmpty = true, null))
          val st = it.toSeq.sortBy(_.turnIdx).foldLeft(init)(fold)
          if (st.nTurns == init.nTurns) Iterator.empty
          else {
            state.update(st)
            val rolesOk = st.allOk && (st.nTurns - 1) >= (if (st.lead) 1L else 0L)
            Iterator.single(ValidateUpdate(conv, rolesOk, st.noEmpty,
              st.lastRole == "assistant", st.nTurns,
              rolesOk && st.noEmpty && st.lastRole == "assistant"))
          }
        })
  }

  /** Function-calling (tool-use) validation for SFT data — the structural
    * gate a tool-use fine-tuning corpus needs beyond [[validate]]'s role
    * alternation: assistant turns that EMIT a tool call must be well-formed
    * JSON of the declared shape, name a registered tool, supply every
    * required argument, and invent none. Hallucinated tool names and
    * missing/fabricated arguments are the dominant defect classes in
    * harvested agent traces, and a defect that reaches the loss mask trains
    * the model to reproduce it.
    *
    * A turn is a CALL CANDIDATE when `role = 'assistant'` and its content
    * starts with `{` — plain-prose assistant turns are not calls and emit
    * no row. Per candidate, cumulative flags:
    *
    *   - `json_ok`   — content parses as a JSON OBJECT
    *     (`json_object_keys` is NULL on anything else);
    *   - `shape_ok`  — top-level keys are exactly `{args, tool}` and
    *     `$.args` is itself an object;
    *   - `tool_known` — `$.tool` matches a registry row. A non-string
    *     `tool` value simply fails the lookup (engines agree on extraction,
    *     not on JSON type introspection — documented contract);
    *   - `args_ok`   — every `required` arg of that tool is a key of
    *     `$.args` (presence, not value typing: a JSON `null` argument is
    *     present);
    *   - `no_unknown_args` — every key of `$.args` is declared
    *     (required ∪ optional);
    *   - `call_ok`   — the conjunction.
    *
    * `registry` is `(tool STRING, required ARRAY<STRING>,
    * optional ARRAY<STRING>)` — a bounded dimension, joined broadcast.
    *
    * Scale shape: one narrow projection over the message table (JSON
    * functions are per-row, codegen'd builtins — no UDF, no explode) plus
    * one broadcast left join on the tool name; no shuffle of the corpus at
    * all. Output `(convCol, idxCol, tool, json_ok, shape_ok, tool_known,
    * args_ok, no_unknown_args, call_ok)` — one row per call candidate.
    */
  def validateToolCalls(
      msgs: DataFrame,
      convCol: String,
      idxCol: String,
      roleCol: String,
      contentCol: String,
      registry: DataFrame): DataFrame = {
    val content = col(contentCol)
    val calls = msgs
      .filter(col(roleCol) === "assistant" && content.startsWith("{"))
      .select(
        col(convCol), col(idxCol),
        get_json_object(content, "$.tool").as("tool"),
        json_object_keys(content).as("_top"),
        // keys of $.args; NULL when $.args is missing or not an object
        json_object_keys(get_json_object(content, "$.args")).as("_argk"))
    val jsonOk = col("_top").isNotNull
    val shapeOk = jsonOk &&
      array_sort(col("_top")) === array(lit("args"), lit("tool")) &&
      col("_argk").isNotNull
    val toolKnown = shapeOk && col("required").isNotNull
    val argsOk = toolKnown &&
      forall(col("required"), a => array_contains(col("_argk"), a))
    val noUnknown = toolKnown &&
      forall(col("_argk"),
        k => array_contains(col("required"), k) || array_contains(col("optional"), k))
    calls
      .join(broadcast(registry), Seq("tool"), "left")
      .select(
        col(convCol), col(idxCol), col("tool"),
        jsonOk.as("json_ok"),
        shapeOk.as("shape_ok"),
        toolKnown.as("tool_known"),
        argsOk.as("args_ok"),
        noUnknown.as("no_unknown_args"),
        (argsOk && noUnknown).as("call_ok"))
  }

  /** Per-conversation rollup of [[validateToolCalls]] over the FULL message
    * table: `(convCol, n_calls, n_bad_calls, calls_ok)` for every
    * conversation — zero-call conversations report `(0, 0, true)` so the
    * flag composes with [[validate]]'s `keep` by a plain AND. One map-side
    * partial aggregate keyed by conversation.
    */
  def toolCallReport(
      msgs: DataFrame,
      convCol: String,
      idxCol: String,
      roleCol: String,
      contentCol: String,
      registry: DataFrame): DataFrame = {
    val calls = validateToolCalls(msgs, convCol, idxCol, roleCol, contentCol, registry)
      .groupBy(col(convCol))
      .agg(
        count(lit(1)).as("n_calls"),
        sum(when(col("call_ok"), 0L).otherwise(1L)).as("n_bad_calls"))
    msgs.select(col(convCol)).distinct()
      .join(calls, Seq(convCol), "left")
      .select(
        col(convCol),
        coalesce(col("n_calls"), lit(0L)).as("n_calls"),
        coalesce(col("n_bad_calls"), lit(0L)).as("n_bad_calls"),
        (coalesce(col("n_bad_calls"), lit(0L)) === 0L).as("calls_ok"))
  }
}
