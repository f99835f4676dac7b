package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization for embedding columns — the memory-bound
  * corpus path: a 768-dim float vector (3 KB) becomes 768 bytes plus two
  * shared per-dimension bound arrays, a 4× cut that turns an
  * out-of-memory ANN working set into an in-memory one at recall cost
  * bounded by (hi-lo)/255 per dimension.
  *
  * Affine min-max scheme, md5-free and fully deterministic:
  * `q = floor((x-lo)/(hi-lo)*255 + 0.5) - 128` clamped to [-128, 127]
  * (degenerate dimensions, hi = lo, quantize to 0);
  * `x' = lo + (q+128)*(hi-lo)/255`. Both directions are pure per-row
  * expressions against PLAN-TIME LITERAL bound arrays — the same
  * shift-work-to-plan-time pattern as the LSH hyperplanes
  * ([[SimilaritySearch.planeComponents]]); per-row cost is one fused
  * multiply-add chain, no join against a bounds table, no shuffle.
  *
  * [[fitBounds]] is one exploded min/max aggregate; the collected result
  * is `dims` rows — driver-bounded by construction, the same contract as
  * IVF centroids ([[IvfIndex.build]]).
  */
object Quantize {

  /** Per-dimension (lo, hi) over the corpus: one map-side-combinable
    * aggregate keyed by dimension index.
    */
  def fitBounds(df: DataFrame, vecCol: String): (Seq[Double], Seq[Double]) = {
    val rows = df
      .select(posexplode(col(vecCol).cast("array<double>")))
      .groupBy("pos")
      .agg(min("col").as("lo"), max("col").as("hi"))
      .orderBy("pos")
      .collect()
    require(rows.nonEmpty, "cannot fit quantization bounds on an empty relation")
    (rows.map(_.getDouble(1)).toSeq, rows.map(_.getDouble(2)).toSeq)
  }

  private def boundsAt(lo: Seq[Double], hi: Seq[Double], i: Column): (Column, Column) =
    (element_at(array(lo.map(lit): _*), i + 1), element_at(array(hi.map(lit): _*), i + 1))

  /** Quantized vector column: `array<int>` in [-128, 127] (int, not
    * tinyint, so SQL oracles compare without byte-cast edge cases; the
    * storage win is realized by the parquet writer's dictionary/bit-pack
    * encoding either way). Values outside the fitted range — new data
    * quantized against old bounds — clamp instead of wrapping.
    */
  def quantize(vec: Column, lo: Seq[Double], hi: Seq[Double]): Column =
    transform(vec.cast("array<double>"), (x, i) => {
      val (l, h) = boundsAt(lo, hi, i)
      // clamp on the DOUBLE before the int cast: an out-of-range input
      // would otherwise overflow the cast, an error under ANSI mode
      when(h === l, lit(0))
        .otherwise(
          greatest(lit(0.0), least(lit(255.0), floor((x - l) / (h - l) * 255 + 0.5)))
            .cast("int") - 128)
        .cast("int")
    })

  /** Inverse affine map; the reconstruction error per dimension is at most
    * half a quantization step, (hi-lo)/255 / 2, for in-range inputs.
    */
  def dequantize(qvec: Column, lo: Seq[Double], hi: Seq[Double]): Column =
    transform(qvec, (q, i) => {
      val (l, h) = boundsAt(lo, hi, i)
      when(h === l, l).otherwise(l + (q + 128) * (h - l) / 255.0)
    })
}
