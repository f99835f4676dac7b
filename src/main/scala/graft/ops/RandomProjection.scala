package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection: reduce an embedding column to
  * `outDims` dimensions with a deterministic ±1 sign matrix — the standard
  * memory/compute cut before pairwise similarity work (a 768-d corpus
  * projected to 64-d shrinks every downstream shuffle 12×, and pairwise
  * inner products are preserved in expectation with variance 1/outDims).
  *
  * The matrix entries are md5-derived at plan time (the same
  * plan-time-literal pattern as [[SimilaritySearch.planeComponents]] and
  * [[Quantize]]'s bounds): no fitting pass over the data, no driver state,
  * bit-identical across engines/reruns, and the per-row work is a pure
  * multiply-add that whole-stage codegen inlines. Dense ±1 (Achlioptas
  * 2003) rather than Gaussian — same JL guarantee, integer-exact entry
  * derivation.
  */
object RandomProjection {

  /** Deterministic ±1 entry (o, d): +1 when the md5 uniform of "salt{o}:{d}"
    * falls in [0, 0.5), else −1. Exact in DOUBLE, so a SQL oracle
    * reproduces the matrix bit-for-bit.
    */
  def signMatrix(outDims: Int, dims: Int, salt: String = "rj"): Array[Array[Double]] =
    Array.tabulate(outDims, dims)((o, d) =>
      if (SimilaritySearch.md5Bits32(s"$salt$o:$d") / 4294967296.0 < 0.5) 1.0 else -1.0)

  /** Projection column: out-dim `o` = dot(vec, signs(o)) / sqrt(outDims)
    * (the scaling that makes E[‖Rx‖²] = ‖x‖²). Left-to-right accumulation,
    * oracle-reproducible.
    */
  def projectColumn(vec: Column, outDims: Int, dims: Int, salt: String = "rj"): Column = {
    require(outDims >= 1 && dims >= 1)
    val m = signMatrix(outDims, dims, salt)
    val scale = math.sqrt(outDims.toDouble)
    array((0 until outDims).map { o =>
      val row = array(m(o).map(lit): _*)
      graft.Functions.vecDot(vec, row) / scale
    }: _*)
  }

  /** Project `vecCol` (any numeric array) to `outDims` dimensions; output
    * (idCol, projected array<double>). `dims` is the input dimensionality —
    * callers read it from one row (bounded) the way the LSH queries do.
    */
  def project(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      outDims: Int,
      dims: Int,
      salt: String = "rj"): DataFrame =
    df.select(
      col(idCol),
      projectColumn(col(vecCol).cast("array<double>"), outDims, dims, salt).as("projected"))
}
