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
    * Scale shape: one explode + one keyed groupBy per doc (the
    * [[graft.ops.VectorOps.meanPool]] ordered-assembly pattern: collect →
    * array_sort → join, with null pieces dropped by `array_join`). At
    * 100 TB this is the same linear one-row-per-token price as
    * [[Dedup.windowRows]].
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
    val b = blockTokens.toLong
    val toks = filter(Dedup.tokens(coalesce(col(textCol), lit(""))), t => t =!= "")
    val base = docs.select(
      col(idCol), toks.as("_t"), size(toks).cast("long").as("_n"))
      .withColumn("_nf", floor(col("_n") / b))
    def sentinel(blk: Column) = concat(lit(sentinelPrefix), blk.cast("string"), lit(">"))
    def offOf(blk: Column) = pmod(
      graft.Functions.md5Bits(
        concat(lit(s"$salt:"), col(idCol).cast("string"), lit(":"), blk.cast("string")),
        32),
      lit((blockTokens - spanTokens + 1).toLong))
    // per-block assembly as pure array expressions — ONE row per document,
    // zero shuffles (the explode + ordered-groupBy formulation moves one
    // row per TOKEN through an exchange; this is the same result at scan
    // cost). `slice` is 1-based; block bl covers [bl·B, bl·B + B).
    val blockIdx = sequence(lit(0L), col("_nf") - 1)
    val inBlocks = flatten(org.apache.spark.sql.functions.transform(blockIdx, bl =>
      concat(
        slice(col("_t"), (bl * b + 1).cast("int"), offOf(bl).cast("int")),
        array(sentinel(bl)),
        slice(col("_t"), (bl * b + offOf(bl) + spanTokens + 1).cast("int"),
          (lit(b) - offOf(bl) - spanTokens).cast("int")))))
    val tail = slice(col("_t"), (col("_nf") * b + 1).cast("int"),
      (col("_n") - col("_nf") * b).cast("int"))
    val tgtBlocks = flatten(org.apache.spark.sql.functions.transform(blockIdx, bl =>
      concat(
        array(sentinel(bl)),
        slice(col("_t"), (bl * b + offOf(bl) + 1).cast("int"), lit(spanTokens)))))
    // a NULL doc id has no per-doc randomness to derive: pass through
    // uncorrupted. The corruptible path needs _nf > 0 (sequence(0, -1)
    // would emit a DESCENDING range — the Pack.packTokenIds trap).
    val corruptible = col(idCol).isNotNull && col("_nf") > 0
    base.select(
      col(idCol), col("_n").as("n_tokens"),
      array_join(
        when(corruptible, concat(inBlocks, tail)).otherwise(col("_t")), " ")
        .as("input_text"),
      array_join(
        concat(
          when(corruptible, tgtBlocks).otherwise(array().cast("array<string>")),
          array(sentinel(col("_nf")))), " ")
        .as("target_text"))
  }
  /** UL2 mixture-of-denoisers (Tay et al. 2022): route each document to
    * one of the three denoising objectives by an md5 draw —
    *
    *   - R (regular): [[spanCorrupt]] at a modest rate/span,
    *   - X (extreme):  [[spanCorrupt]] with long spans (high corruption),
    *   - S (sequential): prefix → suffix continuation (split at an
    *     md5-uniform token cut; `input = prefix <extra_id_0>`,
    *     `target = <extra_id_0> suffix <extra_id_1>`),
    *
    * emitting `(id, denoiser, n_tokens, input_text, target_text)`. The
    * routing draw, both corruption geometries, and the S cut are all
    * md5-derived, so the WHOLE mixture is SQL-oracle-able (q_ul2_mix).
    * Three per-row transforms over disjoint subsets — zero shuffles.
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
    val draw = graft.Functions.md5Bits(
      concat(lit(s"$salt:"), col(idCol).cast("string")), 32)
    val tagged = docs.withColumn("_u", draw)
    def part(pred: Column) = tagged.filter(pred).drop("_u")

    val r = spanCorrupt(part(col("_u") < rThresh), idCol, textCol,
        rBlock, rSpan, sentinelPrefix, salt = s"$salt-r")
      .withColumn("denoiser", lit("r"))
    val x = spanCorrupt(part(col("_u") >= rThresh && col("_u") < xThresh),
        idCol, textCol, xBlock, xSpan, sentinelPrefix, salt = s"$salt-x")
      .withColumn("denoiser", lit("x"))

    val sDocs = part(col("_u") >= xThresh)
    val toks = filter(Dedup.tokens(coalesce(col(textCol), lit(""))), t => t =!= "")
    val sent0 = lit(s"${sentinelPrefix}0>")
    val sent1 = lit(s"${sentinelPrefix}1>")
    val sPart = sDocs
      .select(col(idCol), toks.as("_t"), size(toks).cast("long").as("_n"))
      .withColumn("_cut",
        pmod(graft.Functions.md5Bits(
          concat(lit(s"$salt-s:"), col(idCol).cast("string")), 32),
          col("_n") + 1))
      .select(
        col(idCol), col("_n").as("n_tokens"),
        array_join(concat(
          slice(col("_t"), lit(1), col("_cut").cast("int")), array(sent0)), " ")
          .as("input_text"),
        array_join(concat(
          array(sent0),
          slice(col("_t"), (col("_cut") + 1).cast("int"),
            (col("_n") - col("_cut")).cast("int")),
          array(sent1)), " ")
          .as("target_text"))
      .withColumn("denoiser", lit("s"))

    r.unionByName(x).unionByName(sPart)
      .select(col(idCol), col("denoiser"), col("n_tokens"),
        col("input_text"), col("target_text"))
  }
}
