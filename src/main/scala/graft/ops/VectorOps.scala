package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-set operations over embedding columns — the vector-side utilities a
  * training-data pipeline runs between chunking and indexing.
  *
  * Reference analog: none (training-data extension; no vector columns in
  * the reference).
  */
object VectorOps {

  /** Element-wise mean pooling: one vector per group — the standard
    * chunk-embeddings → document-embedding reduction (and the classifier
    * "mean of token embeddings" baseline). Sums run in DECIMAL(28,12) per
    * dimension (the [[IvfIndex]] refinement pattern), so pooled vectors are
    * bit-identical under any partitioning or arrival order, and the DuckDB
    * oracle reproduces them exactly.
    *
    * Scale shape: `posexplode` multiplies rows by the dimension count, but
    * the aggregate keys on (group, dim) — map-side combine reduces each
    * task's output to its distinct groups × dims, and the rebuilt array
    * comes from a second keyed aggregate; no window, no collect. Ragged
    * vectors (mixed lengths within a group) would silently mean-pool the
    * shared prefix and tail separately — callers get one vector per group
    * with each dimension averaged over the vectors that HAVE it, which is
    * the only total behavior; fixed-dims corpora (the normal case) are
    * unaffected.
    */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol).as("group"),
        posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col("group"), col("pos"))
      // exact decimal SUM (order-free), then one double division — the
      // quotient is a single IEEE op on identical inputs everywhere, so no
      // engine-specific decimal-division scale rules enter the result
      .agg((sum(col("col").cast("decimal(28,12)")).cast("double") / count(lit(1)))
        .as("m"))
      .groupBy(col("group"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        e => e.getField("m")).as("vec"))

  /** Matryoshka truncation (Kusupati et al. 2022, "Matryoshka
    * Representation Learning"): keep the first `dims` dimensions and
    * re-normalize to unit length — how MRL-trained embeddings are served
    * at reduced cost. A pure per-row projection over the fused
    * [[graft.expressions.L2Normalize]]; zero shuffles.
    */
  def matryoshka(df: DataFrame, vecCol: String, dims: Int): DataFrame = {
    require(dims >= 1, s"dims=$dims must be positive")
    df.withColumn(vecCol,
      graft.Functions.vecNormalize(
        slice(col(vecCol).cast("array<double>"), 1, dims)))
  }
}
