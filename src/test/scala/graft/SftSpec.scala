package graft

import org.apache.spark.sql.functions._

import graft.ops.Sft

/** SFT conversation assembly: validation flags per structural defect,
  * exact template rendering, and the render/lossmask composition law —
  * every assistant span sliced out of the rendered text must be exactly
  * that turn's content.
  */
class SftSpec extends SparkSpec {

  import spark.implicits._

  private def msgs(rows: (Long, Long, String, String)*) =
    rows.toDF("conv", "idx", "role", "content")

  private def flags(df: org.apache.spark.sql.DataFrame) =
    Sft.validate(df, "conv", "idx", "role", "content")
      .select("conv", "roles_ok", "no_empty", "ends_assistant", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("validate: each structural defect trips exactly its flag") {
    val f = flags(msgs(
      // 1: canonical system-led conversation — all green
      (1L, 0L, "system", "be helpful"), (1L, 1L, "user", "hi"),
      (1L, 2L, "assistant", "hello"),
      // 2: no system lead, still alternates — green
      (2L, 0L, "user", "q"), (2L, 1L, "assistant", "a"),
      // 3: double user — roles_ok fails
      (3L, 0L, "user", "q"), (3L, 1L, "user", "q2"), (3L, 2L, "assistant", "a"),
      // 4: lone system turn — roles_ok fails (nothing to alternate)
      (4L, 0L, "system", "be helpful"),
      // 5: whitespace-only content — no_empty fails
      (5L, 0L, "user", "q"), (5L, 1L, "assistant", "   "),
      // 6: ends on user — ends_assistant fails
      (6L, 0L, "user", "q"), (6L, 1L, "assistant", "a"), (6L, 2L, "user", "bye"),
      // 7: system in the middle — roles_ok fails
      (7L, 0L, "user", "q"), (7L, 1L, "system", "sneak"), (7L, 2L, "assistant", "a"),
      // 8: tab/newline-only content — no_empty must catch NON-space
      // whitespace too (SQL trim strips only spaces; the op uses an
      // explicit whitespace class)
      (8L, 0L, "user", "q"), (8L, 1L, "assistant", "\t\n \r")))
    assert(f(1L) == ((true, true, true, true)))
    assert(f(2L) == ((true, true, true, true)))
    assert(f(3L) == ((false, true, true, false)))
    assert(f(4L) == ((false, true, false, false)))
    assert(f(5L) == ((true, false, true, false)))
    assert(f(6L) == ((true, true, false, false)))
    assert(f(7L) == ((false, true, true, false)))
    assert(f(8L) == ((true, false, true, false)))
  }

  test("validate: NULL role can never pass the alternation") {
    val df = Seq((1L, 0L, Option("user"), "q"), (1L, 1L, Option.empty[String], "a"))
      .toDF("conv", "idx", "role", "content")
    val f = Sft.validate(df, "conv", "idx", "role", "content")
      .select("roles_ok").as[Boolean].head()
    assert(!f)
  }

  test("render: exact template, turns in idx order regardless of input order") {
    val df = msgs((1L, 2L, "assistant", "hello"), (1L, 0L, "system", "sys"),
      (1L, 1L, "user", "hi"))
    val out = Sft.render(df, "conv", "idx", "role", "content")
      .as[(Long, String, Long, Long)].head()
    val expected = "<|system|>\nsys<|end|>\n<|user|>\nhi<|end|>\n<|assistant|>\nhello<|end|>\n"
    assert(out == ((1L, expected, 3L, expected.length.toLong)))
  }

  test("validateStream: latest emission per conversation ≡ batch validate over everything seen") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.Sft.{Turn, ValidateUpdate}
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Turn]
    val q = Sft.validateStream(source.toDS())
      .writeStream.outputMode("append").format("memory").queryName("sft_stream").start()
    try {
      // wave 1 splits conversations MID-stream: conv 1 is valid-so-far but
      // incomplete, conv 2 already broken, conv 3 tab-only content
      source.addData(Seq(
        Turn(1L, 0L, "system", "sys"), Turn(1L, 1L, "user", "hi"),
        Turn(2L, 0L, "user", "q"), Turn(2L, 1L, "user", "q2"),
        Turn(3L, 0L, "user", "\t")))
      q.processAllAvailable()
      // wave 2 completes them (out of input order WITHIN the batch — sorted)
      source.addData(Seq(
        Turn(1L, 3L, "user", "thanks"), Turn(1L, 2L, "assistant", "hello"),
        Turn(2L, 2L, "assistant", "a"),
        Turn(3L, 1L, "assistant", "ans")))
      q.processAllAvailable()
      val latest = spark.table("sft_stream").as[ValidateUpdate].collect()
        .groupBy(_.convId).map { case (c, es) => c -> es.maxBy(_.nTurns) }
      val allTurns = Seq(
        (1L, 0L, "system", "sys"), (1L, 1L, "user", "hi"),
        (1L, 2L, "assistant", "hello"), (1L, 3L, "user", "thanks"),
        (2L, 0L, "user", "q"), (2L, 1L, "user", "q2"), (2L, 2L, "assistant", "a"),
        (3L, 0L, "user", "\t"), (3L, 1L, "assistant", "ans"))
        .toDF("conv", "idx", "role", "content")
      val batch = Sft.validate(allTurns, "conv", "idx", "role", "content")
        .select("conv", "roles_ok", "no_empty", "ends_assistant", "n_turns", "keep")
        .as[(Long, Boolean, Boolean, Boolean, Long, Boolean)]
        .collect().map(r => r._1 -> r).toMap
      assert(latest.keySet == batch.keySet)
      latest.foreach { case (c, u) =>
        val b = batch(c)
        assert((u.rolesOk, u.noEmpty, u.endsAssistant, u.nTurns, u.keep) ==
          ((b._2, b._3, b._4, b._5, b._6)), s"conv $c stream/batch disagree")
      }
      // whitespace-class parity: tab-only content reads as EMPTY in both
      // twins (the explicit [ \t\n\r\f] class, not SQL's space-only trim)
      assert(!latest(3L).noEmpty, "tab-only content is empty under the whitespace class")
      // the wave-1 snapshot of conv 1 was keep=false (ends on user) — the
      // stream legitimately emitted an interim state that wave 2 corrected
      val wave1Conv1 = spark.table("sft_stream").as[ValidateUpdate].collect()
        .filter(u => u.convId == 1L && u.nTurns == 2L)
      assert(wave1Conv1.length == 1 && !wave1Conv1.head.keep)
    } finally q.stop()
  }

  test("encodeWithOffsets: token parity with encode, offsets slice words back, masks match char truth") {
    import graft.ops.{Bpe, Sft}
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(
        floor(col("doc_id") / 4).cast("long").as("conv"),
        (col("doc_id") % 4).cast("long").as("idx"),
        when(col("doc_id") % 4 === 0, "system")
          .when(col("doc_id") % 4 === 1, "user")
          .when(col("doc_id") % 4 === 2, "assistant")
          .otherwise("user").as("role"),
        substring(col("text"), 1, 150).as("content"))
    val rendered = Sft.render(docs, "conv", "idx", "role", "content").cache()
    val merges = Bpe.learn(
      Tables(spark, "/root/testdata/sf0.001", "documents"), "text", numMerges = 24)
    val withOff = Bpe.encodeWithOffsets(rendered, "conv", "text", merges).cache()

    // 1. token parity: sequence identical to encode()
    val viaEncode = Bpe.encode(rendered, "conv", "text", merges)
      .select(col("conv"), col("tokens"))
      .as[(Long, Seq[String])].collect().toMap
    val viaOffsets = withOff.orderBy("conv", "token_pos")
      .select("conv", "token").as[(Long, String)].collect()
      .groupBy(_._1).map { case (c, ts) => c -> ts.map(_._2).toSeq }
    assert(viaOffsets.keySet == viaEncode.keySet)
    viaOffsets.foreach { case (c, ts) =>
      assert(ts == viaEncode(c), s"conv $c token sequences diverge")
    }

    // 2. offsets slice the LOWERED text back to a non-whitespace word
    val sliced = withOff
      .join(rendered.select(col("conv"), lower(col("text")).as("_lt")), "conv")
      .select(col("_lt").substr(col("word_start") + 1,
        col("word_end") - col("word_start")).as("w"))
      .distinct().as[String].collect()
    assert(sliced.nonEmpty)
    assert(!sliced.exists(w => w.isEmpty || w.exists(c => " \t\n\f\r".contains(c))),
      "every offset range must be exactly one whitespace-free word")

    // 2b. case-fold guard: ASCII-ish corpus text keeps offsets exact; a
    // doc with \u0130 (lowercase is 2 code points) flags inexact
    assert(withOff.filter(!col("offsets_exact")).isEmpty,
      "corpus text must keep offsets_exact = true")
    val turkish = Bpe.encodeWithOffsets(
      Seq((99L, "\u0130stanbul rocks")).toDF("conv", "text"), "conv", "text", merges)
    assert(turkish.count() > 0 && turkish.filter(col("offsets_exact")).isEmpty,
      "\u0130 changes code-point length under lowering - must flag inexact")

    // 3. composition law: token trainable ⟺ its word overlaps a char span
    // — ground truth recomputed DRIVER-SIDE from the collected spans
    val spans = Sft.lossMaskSpans(docs, "conv", "idx", "role", "content")
    val masked = Sft.lossMaskTokens(withOff, spans, "conv")
    val spansByConv = spans.select("conv", "start_pos", "end_pos")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (c, ss) => c -> ss.map(s => (s._2, s._3)) }
    val offs = withOff.select("conv", "token_pos", "word_start", "word_end")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (c, p, ws, we) =>
        (c, p) -> spansByConv.getOrElse(c, Array.empty[(Long, Long)])
          .exists { case (s, e) => ws < e && s < we }
      }.toMap
    val got = masked.select("conv", "token_pos", "trainable")
      .as[(Long, Long, Boolean)].collect()
    assert(got.length == offs.size)
    assert(got.forall { case (c, p, t) => offs((c, p)) == t })
    // both mask states occur (assistant content and template decoration)
    assert(got.exists(_._3) && got.exists(!_._3))
  }

  private def registry =
    Seq(
      ("lookup", Seq("id", "limit"), Seq("verbose")),
      ("search", Seq("q"), Seq.empty[String]))
      .toDF("tool", "required", "optional")

  private def callFlags(rows: (Long, Long, String, String)*) =
    Sft.validateToolCalls(msgs(rows: _*), "conv", "idx", "role", "content", registry)
      .select("conv", "idx", "json_ok", "shape_ok", "tool_known", "args_ok",
        "no_unknown_args", "call_ok")
      .as[(Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7, r._8))).toMap

  test("validateToolCalls: each defect class trips exactly its flag") {
    val f = callFlags(
      // well-formed call with an optional arg: everything passes
      (1L, 0L, "assistant", """{"tool":"lookup","args":{"id":1,"limit":5,"verbose":true}}"""),
      // malformed JSON: json_ok fails, everything downstream cumulative-fails
      (2L, 0L, "assistant", """{"tool":"lookup","args":{"id":1}"""),
      // wrong top-level key: valid JSON, shape fails
      (3L, 0L, "assistant", """{"tool":"lookup","arguments":{"id":1,"limit":5}}"""),
      // args not an object: shape fails
      (3L, 1L, "assistant", """{"tool":"lookup","args":7}"""),
      // hallucinated tool: shape ok, registry lookup fails
      (4L, 0L, "assistant", """{"tool":"teleport","args":{"id":1}}"""),
      // missing required arg
      (5L, 0L, "assistant", """{"tool":"lookup","args":{"id":1}}"""),
      // fabricated arg (limit is not declared for search)
      (6L, 0L, "assistant", """{"tool":"search","args":{"q":"x","limit":3}}"""),
      // required arg present with JSON null value: presence is enough
      (7L, 0L, "assistant", """{"tool":"search","args":{"q":null}}"""),
      // prose assistant turn and user turn: no call row at all
      (8L, 0L, "assistant", "plain prose"),
      (8L, 1L, "user", """{"tool":"lookup","args":{"id":1,"limit":5}}"""))
    assert(f((1L, 0L)) == ((true, true, true, true, true, true)))
    assert(f((2L, 0L)) == ((false, false, false, false, false, false)))
    assert(f((3L, 0L)) == ((true, false, false, false, false, false)))
    assert(f((3L, 1L)) == ((true, false, false, false, false, false)))
    assert(f((4L, 0L)) == ((true, true, false, false, false, false)))
    assert(f((5L, 0L)) == ((true, true, true, false, true, false)))
    assert(f((6L, 0L)) == ((true, true, true, true, false, false)))
    assert(f((7L, 0L)) == ((true, true, true, true, true, true)))
    assert(!f.contains((8L, 0L)) && !f.contains((8L, 1L)),
      "prose and user turns must emit no call rows")
  }

  test("toolCallReport: zero-call conversations stay keepable, bad calls count") {
    val report = Sft.toolCallReport(
      msgs(
        (1L, 0L, "user", "hi"),
        (1L, 1L, "assistant", """{"tool":"search","args":{"q":"a"}}"""),
        (1L, 2L, "assistant", """{"tool":"teleport","args":{}}"""),
        (2L, 0L, "user", "hi"),
        (2L, 1L, "assistant", "no tools here")),
      "conv", "idx", "role", "content", registry)
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(report(1L) == ((2L, 1L, false)))
    assert(report(2L) == ((0L, 0L, true)))
  }

  test("lossMaskSpans ∘ render: every assistant span slices back to its content") {
    // the q_sft fixture shape at sf0.001 — real corpus text through both ops
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(
        floor(col("doc_id") / 4).cast("long").as("conv"),
        (col("doc_id") % 4).cast("long").as("idx"),
        when(col("doc_id") % 4 === 0, "system")
          .when(col("doc_id") % 4 === 1, "user")
          .when(col("doc_id") % 4 === 2, "assistant")
          .otherwise("user").as("role"),
        substring(col("text"), 1, 150).as("content"))
    val rendered = Sft.render(docs, "conv", "idx", "role", "content")
    val spans = Sft.lossMaskSpans(docs, "conv", "idx", "role", "content")
    val sliced = spans
      .join(rendered, "conv")
      .join(docs.filter(col("role") === "assistant"), Seq("conv", "idx"))
      .select(
        col("text").substr(col("start_pos") + 1, col("end_pos") - col("start_pos"))
          .as("slice"),
        col("content"))
    assert(sliced.count() > 0)
    assert(sliced.filter(col("slice") =!= col("content")).count() == 0)
    // spans never overlap template decoration: all spans are in-bounds
    val bad = spans.join(rendered, "conv")
      .filter(col("start_pos") < 0 || col("end_pos") > col("n_chars"))
    assert(bad.count() == 0)
  }
}
