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
}
