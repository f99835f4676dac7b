package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) transformation (Bavarian et al. 2022,
  * "Efficient Training of Language Models to Fill in the Middle"):
  * deterministically split a document into (prefix, middle, suffix) at two
  * uniform character cuts and re-serialize with sentinel tokens so an
  * autoregressive model learns infilling — the data-side transform behind
  * code-model FIM training.
  *
  * Everything is md5-derived per document id ([[Sampling.hashUniform]]):
  * which documents get FIM'd (`fimRate`), which of those use SPM ordering
  * (`spmRate`), and both cut points — so the transform is rerun-stable,
  * partition-independent, and reproducible by a SQL oracle evaluating the
  * same expressions (q_fim).
  *
  * Output modes, following the paper's two serializations (sentinels are
  * parameters; defaults use a neutral spelling):
  *   - PSM:  `<PRE>prefix<SUF>suffix<MID>middle`
  *   - SPM:  `<SUF>suffix<PRE>prefix<MID>middle` (suffix first, so the
  *     prefix and middle stay contiguous — the paper's SPM motivation)
  *   - none: the document unchanged (format 'none').
  *
  * Cut points: u·(n+1) floored gives a cut in [0, n]; the two cuts are
  * sorted so `prefix = [0, lo)`, `middle = [lo, hi)`, `suffix = [hi, n)`.
  * Any cut outcome (empty prefix/middle/suffix included) is valid FIM
  * training data, matching the paper's character-level random splits.
  *
  * Scale shape: one per-row projection — zero shuffles, zero joins, plain
  * codegen'd string expressions; at 100 TB this is scan-bound, as a
  * serialization pass must be.
  *
  * Reference analog: none (training-data extension).
  */
object Fim {

  /** Apply FIM with probability `fimRate`; among transformed docs use SPM
    * ordering with probability `spmRate`. Output adds `format`
    * ('psm' | 'spm' | 'none') and `out_text`.
    */
  def transform(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      fimRate: Double = 0.5,
      spmRate: Double = 0.5,
      preTok: String = "<PRE>",
      sufTok: String = "<SUF>",
      midTok: String = "<MID>",
      salt: String = "fim"): DataFrame = {
    require(fimRate >= 0.0 && fimRate <= 1.0, "fimRate out of [0, 1]")
    require(spmRate >= 0.0 && spmRate <= 1.0, "spmRate out of [0, 1]")
    val id = col(idCol)
    val text = coalesce(col(textCol), lit(""))
    val n = length(text)
    val cut = (which: String) =>
      floor(Sampling.hashUniform(id, salt + which) * (n + 1).cast("double")).cast("int")
    val c1 = cut("c1")
    val c2 = cut("c2")
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    val applyFim = Sampling.hashUniform(id, salt + "a") < lit(fimRate)
    val useSpm = Sampling.hashUniform(id, salt + "s") < lit(spmRate)
    val withCuts = docs
      .withColumn("_fim_lo", lo)
      .withColumn("_fim_hi", hi)
    val pre = substring_index_slice(text, lit(1), col("_fim_lo"))
    val mid = substring_index_slice(text, col("_fim_lo") + 1, col("_fim_hi") - col("_fim_lo"))
    val suf = substring_index_slice(text, col("_fim_hi") + 1, length(text) - col("_fim_hi"))
    val psm = concat(lit(preTok), pre, lit(sufTok), suf, lit(midTok), mid)
    val spm = concat(lit(sufTok), suf, lit(preTok), pre, lit(midTok), mid)
    withCuts
      .withColumn("format",
        when(!applyFim, lit("none")).when(useSpm, lit("spm")).otherwise(lit("psm")))
      .withColumn("out_text",
        when(col("format") === "none", text)
          .when(col("format") === "spm", spm)
          .otherwise(psm))
      .drop("_fim_lo", "_fim_hi")
  }

  /** `substring` with Column start/len — 1-based, len clamped to ≥ 0 (the
    * clamp is a no-op for the cut arithmetic here but keeps the expression
    * total), matching DuckDB's `substr(text, pos, greatest(len, 0))`.
    */
  private def substring_index_slice(text: Column, pos: Column, len: Column): Column =
    text.substr(pos, greatest(len, lit(0)))
  /** T5-style span corruption (Raffel et al. 2020 §3.1.4) — the
    * mask-denoising objective's data transform, [[transform]]'s sibling:
    * replace spans of tokens with numbered sentinels in the INPUT and emit
    * the masked spans behind the same sentinels as the TARGET.
    *
    * Deterministic block construction instead of sequential sampling: the
    * token stream partitions into blocks of `blockTokens`; every FULL
    * block corrupts exactly ONE `spanTokens`-token span at an md5-derived
    * offset (corruption rate = spanTokens/blockTokens, mean span length =
    * spanTokens — the two knobs of the paper, here exact instead of in
    * expectation). The partial tail block stays uncorrupted. Block
    * arithmetic is pure integer math on the token position, so the whole
    * transform — offsets, sentinel numbering, both output strings — is
    * reproducible by the SQL oracle (q_t5_spans), which a
    * sequentially-sampled corruption could never be.
    *
    *   input  = … tok <extra_id_b> tok …   (span b replaced by sentinel b)
    *   target = <extra_id_0> span₀ <extra_id_1> span₁ … <extra_id_n>
    *
    * with the standard terminal sentinel (n = number of corrupted spans).
    * Documents shorter than one block pass through uncorrupted (input =
    * tokens, target = the terminal sentinel alone).
    *
    * Scale shape: per-block array expressions over the token array — ONE
    * row per document, zero shuffles, scan-bound (an earlier explode +
    * ordered-groupBy formulation moved one row per TOKEN through an
    * exchange for the same result, 10× slower at sf0.1). Stateless
    * per-row, so it runs unchanged on a stream.
    */
  def spanCorrupt(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockTokens: Int,
      spanTokens: Int,
      sentinelPrefix: String = "<extra_id_",
      salt: String = "t5"): DataFrame = {
    require(blockTokens >= 2, s"blockTokens=$blockTokens must be >= 2")
    require(spanTokens >= 1 && spanTokens < blockTokens,
      s"need 1 <= spanTokens < blockTokens, got $spanTokens/$blockTokens")
    val toks = filter(Dedup.tokens(coalesce(col(textCol), lit(""))), t => t =!= "")
    val base = docs.select(
      col(idCol), toks.as("_t"), size(toks).cast("long").as("_n"))
    val (inE, tgtE) = corruptionExprs(col(idCol), col("_t"), col("_n"),
      blockTokens, spanTokens, sentinelPrefix, salt)
    base.select(
      col(idCol), col("_n").as("n_tokens"),
      inE.as("input_text"), tgtE.as("target_text"))
  }

  /** The block-corruption (input, target) string expressions over a
    * prepared (id, token-array, count) row — one audited body shared by
    * [[spanCorrupt]] and [[ul2Mix]]'s single-scan mixture. Offsets are
    * precomputed ONCE per block (one md5 each) and looked up by the
    * assembly lambdas; a NULL id (no per-doc randomness) passes through
    * uncorrupted. `slice` is 1-based; block bl covers [bl·B, bl·B + B).
    * The corruptible guard also protects `sequence` from the descending
    * `sequence(0, -1)` trap (the Pack.packTokenIds lesson).
    */
  private def corruptionExprs(
      idExpr: Column,
      t: Column,
      n: Column,
      blockTokens: Int,
      spanTokens: Int,
      sentinelPrefix: String,
      salt: String): (Column, Column) = {
    val b = blockTokens.toLong
    val nf = floor(n / b)
    def sentinel(blk: Column) = concat(lit(sentinelPrefix), blk.cast("string"), lit(">"))
    val blockIdx = sequence(lit(0L), nf - 1)
    val offs = org.apache.spark.sql.functions.transform(blockIdx, bl =>
      pmod(
        graft.Functions.md5Bits(
          concat(lit(s"$salt:"), idExpr.cast("string"), lit(":"), bl.cast("string")),
          32),
        lit((blockTokens - spanTokens + 1).toLong)))
    def offAt(bl: Column) = element_at(offs, (bl + 1).cast("int"))
    val inBlocks = flatten(org.apache.spark.sql.functions.transform(blockIdx, bl =>
      concat(
        slice(t, (bl * b + 1).cast("int"), offAt(bl).cast("int")),
        array(sentinel(bl)),
        slice(t, (bl * b + offAt(bl) + spanTokens + 1).cast("int"),
          (lit(b) - offAt(bl) - spanTokens).cast("int")))))
    val tail = slice(t, (nf * b + 1).cast("int"), (n - nf * b).cast("int"))
    val tgtBlocks = flatten(org.apache.spark.sql.functions.transform(blockIdx, bl =>
      concat(
        array(sentinel(bl)),
        slice(t, (bl * b + offAt(bl) + 1).cast("int"), lit(spanTokens)))))
    val corruptible = idExpr.isNotNull && nf > 0
    (array_join(when(corruptible, concat(inBlocks, tail)).otherwise(t), " "),
      array_join(
        concat(
          when(corruptible, tgtBlocks).otherwise(array().cast("array<string>")),
          array(sentinel(nf))), " "))
  }

  /** The S-denoiser (prefix → suffix continuation) string expressions:
    * split at an md5-uniform token cut; a NULL id coalesces the cut to n,
    * so the doc serializes whole-prefix (deterministic, nothing lost).
    */
  private def continuationExprs(
      idExpr: Column,
      t: Column,
      n: Column,
      sentinelPrefix: String,
      salt: String): (Column, Column) = {
    val sent0 = lit(s"${sentinelPrefix}0>")
    val sent1 = lit(s"${sentinelPrefix}1>")
    val cut = coalesce(
      pmod(graft.Functions.md5Bits(
        concat(lit(s"$salt:"), idExpr.cast("string")), 32), n + 1),
      n)
    (array_join(concat(slice(t, lit(1), cut.cast("int")), array(sent0)), " "),
      array_join(concat(
        array(sent0),
        slice(t, (cut + 1).cast("int"), (n - cut).cast("int")),
        array(sent1)), " "))
  }

  /** UL2 mixture-of-denoisers (Tay et al. 2022): route each document to
    * one of the three denoising objectives by an md5 draw —
    *
    *   - R (regular): block corruption at a modest rate/span,
    *   - X (extreme): block corruption with long spans (high corruption),
    *   - S (sequential): prefix → suffix continuation (split at an
    *     md5-uniform token cut; `input = prefix <extra_id_0>`,
    *     `target = <extra_id_0> suffix <extra_id_1>`),
    *
    * emitting `(id, denoiser, n_tokens, input_text, target_text)`. The
    * routing draw, both corruption geometries, and the S cut are all
    * md5-derived, so the WHOLE mixture is SQL-oracle-able (q_ul2_mix).
    *
    * ONE scan: the arms are CASE branches over shared expressions, so each
    * row computes exactly its own arm (CaseWhen evaluates only the taken
    * branch) and the source is read once — not three filtered sub-plans.
    * A NULL id draws −1 and routes to the R arm, whose NULL-id contract is
    * uncorrupted passthrough: no document can vanish from the mixture.
    */
  def ul2Mix(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rRate: Double = 0.5,
      xRate: Double = 0.25,
      rBlock: Int = 16, rSpan: Int = 3,
      xBlock: Int = 16, xSpan: Int = 8,
      sentinelPrefix: String = "<extra_id_",
      salt: String = "ul2"): DataFrame = {
    require(rRate >= 0 && xRate >= 0 && rRate + xRate <= 1.0,
      s"rates must be non-negative with rRate + xRate <= 1, got $rRate/$xRate")
    // integer thresholds over the 32-bit md5 domain: no float comparison
    // can disagree between engines
    val rThresh = math.floor(rRate * 4294967296.0).toLong
    val xThresh = math.floor((rRate + xRate) * 4294967296.0).toLong
    val toks = filter(Dedup.tokens(coalesce(col(textCol), lit(""))), t => t =!= "")
    val base = docs.select(
      col(idCol), toks.as("_t"), size(toks).cast("long").as("_n"),
      coalesce(
        graft.Functions.md5Bits(
          concat(lit(s"$salt:"), col(idCol).cast("string")), 32),
        lit(-1L)).as("_u"))
    val (inR, tgtR) = corruptionExprs(col(idCol), col("_t"), col("_n"),
      rBlock, rSpan, sentinelPrefix, s"$salt-r")
    val (inX, tgtX) = corruptionExprs(col(idCol), col("_t"), col("_n"),
      xBlock, xSpan, sentinelPrefix, s"$salt-x")
    val (inS, tgtS) = continuationExprs(col(idCol), col("_t"), col("_n"),
      sentinelPrefix, s"$salt-s")
    def route(r: Column, x: Column, sC: Column) =
      when(col("_u") < rThresh, r).when(col("_u") < xThresh, x).otherwise(sC)
    base.select(
      col(idCol),
      route(lit("r"), lit("x"), lit("s")).as("denoiser"),
      col("_n").as("n_tokens"),
      route(inR, inX, inS).as("input_text"),
      route(tgtR, tgtX, tgtS).as("target_text"))
  }
}
