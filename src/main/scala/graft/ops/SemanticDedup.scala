package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication — the SemDeDup shape (Abbas et al., "SemDeDup:
  * Data-efficient learning at web-scale through semantic deduplication",
  * arXiv:2303.09540): embeddings are clustered, and near-identical pairs are
  * searched ONLY within a cluster, so the quadratic pair step is bounded by
  * the largest cluster instead of the corpus. A vector is dropped when some
  * lower-id vector in its cluster sits within cosine `eps` — the same
  * deterministic min-id-wins greedy the exact/MinHash dedup family uses, so
  * results are reproducible in any SQL engine.
  *
  * Reference analog: the reference curates per-partition slices before
  * publishing (`/root/reference/atd_data_lake/aws_transport.py` fan-in);
  * this is that idea applied to embedding space for training corpora.
  *
  * Scale shape: one keyed shuffle on the cluster id for the pair join
  * (never all-pairs), one anti-join back. Cluster granularity is the knob:
  * more clusters → fewer candidate pairs, exactly like LSH band width.
  */
object SemanticDedup {

  /** Per-vector keep/drop decision given a precomputed cluster column:
    * (id, cluster, keep) for every input row. `keep = false` iff another
    * vector in the same cluster with a SMALLER id has cosine ≥ `eps`
    * (cosine rounded half-up to 4 decimals, the
    * [[Dedup.embeddingNearDupPairs]] contract, so oracles reproduce the
    * threshold bit-for-bit). NULL-cluster rows are kept untouched — no
    * cluster, no candidates.
    */
  def semanticKeep(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      clusterCol: String,
      eps: Double): DataFrame = {
    require(eps > 0.0 && eps <= 1.0, s"eps must be in (0,1], got $eps")
    val pairs = Dedup.embeddingNearDupPairs(
      df.filter(col(clusterCol).isNotNull), idCol, vecCol, clusterCol, eps)
    // pairs carry id_a < id_b, so id_b is always the dropped side
    val dropped = pairs.select(col("id_b").as("_drop")).distinct()
    df.select(col(idCol), col(clusterCol).as("cluster"))
      .join(dropped, col(idCol) === col("_drop"), "left")
      .select(col(idCol), col("cluster"), col("_drop").isNull.as("keep"))
  }

  /** [[semanticKeep]] with the cluster assignment computed by k-means over
    * the corpus itself ([[IvfIndex.build]] + Lloyd [[IvfIndex.refine]] —
    * md5-deterministic seeds, DECIMAL-exact means, so the composition is
    * still reproducible). This is the full SemDeDup pipeline: cluster,
    * intra-cluster near-dup search, greedy keep.
    */
  def semanticDedupKMeans(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int,
      eps: Double,
      lloydIters: Int = 2): DataFrame = {
    val idx = IvfIndex.refine(
      IvfIndex.build(df, idCol, vecCol, nClusters), df, idCol, vecCol,
      iterations = lloydIters)
    val assigned = df.join(
      idx.assignments.select(col(idCol), col("cell")), Seq(idCol))
    semanticKeep(assigned, idCol, vecCol, "cell", eps)
  }
}
