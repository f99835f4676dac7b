package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Functions

/** Prototypicality pruning — the second half of the D4 recipe (Tirumala et
  * al. 2023, "D4: Improving LLM Pretraining via Document De-Duplication and
  * Diversification", arXiv:2308.12284): after SemDeDup removes semantic
  * near-duplicates ([[SemanticDedup]]), rank each cluster's members by
  * cosine to their cluster centroid and drop the MOST prototypical fraction
  * (points nearest the centroid carry the least marginal information), and
  * optionally the least prototypical tail (SSL-prototypes style outlier
  * pruning, Sorscher et al. 2022).
  *
  * Reference analog: the reference keeps one representative per device
  * group and drops redundant members
  * (`/root/reference/atd_data_lake/device_filter.py:61-97`); this is that
  * selection generalized to a ranked fraction of embedding clusters.
  *
  * Determinism contract: cosine to centroid is rounded half-up to 6
  * decimals BEFORE ranking (the ANN-family contract), rank ties break on
  * the smaller id, and the drop counts are `floor(frac * n)` per cluster —
  * all integer arithmetic, so keep decisions are hash-exact across engines
  * (oracles q_proto_rank / q_proto_prune).
  *
  * Scale shape: nearest-centroid assignment is one broadcast of
  * nClusters×dim doubles + one scan (no shuffle); ranking is ONE hash
  * exchange on the cluster id. Cluster sizes are corpus/nClusters by
  * construction, so the per-cluster window never concentrates the corpus
  * on one task — the same bound the SemDeDup pair join relies on.
  */
object Prototype {

  /** Per-vector prototypicality against a `(cell, cv)` centroid relation:
    * `(idCol, cell, cos_centroid, rank, n_cluster)` — rank 1 is the MOST
    * prototypical (highest cosine, ties to the smaller id) among the
    * cluster's members. Vectors are assigned to their nearest centroid
    * first (cosine argmax, ties to the lowest cell — the [[IvfIndex]]
    * assignment rule).
    */
  def prototypicality(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame): DataFrame = {
    val scored = df
      .select(col(idCol), col(vecCol).cast("array<double>").as("_v"))
      .crossJoin(broadcast(centroids))
      .select(col(idCol), col("cell"),
        Functions.roundHalfUp(
          SimilaritySearch.cosine(col("_v"), col("cv")), 6).as("_sim"))
    val assignW = Window.partitionBy(col(idCol))
      .orderBy(col("_sim").desc, col("cell"))
    val assigned = scored
      .withColumn("_rn", row_number().over(assignW))
      .filter(col("_rn") === 1)
      .select(col(idCol), col("cell"), col("_sim").as("cos_centroid"))
    val rankW = Window.partitionBy(col("cell"))
      .orderBy(col("cos_centroid").desc, col(idCol))
    val cnts = Window.partitionBy(col("cell"))
    assigned
      .select(col(idCol), col("cell"), col("cos_centroid"),
        row_number().over(rankW).cast("long").as("rank"),
        count(lit(1)).over(cnts).as("n_cluster"))
  }

  /** Keep/drop decision from [[prototypicality]]: per cluster of size n,
    * drop the `floor(dropTopFrac·n)` most prototypical members and the
    * `floor(dropBottomFrac·n)` least. Output
    * `(idCol, cell, cos_centroid, keep)` for every input vector.
    */
  def prune(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      dropTopFrac: Double,
      dropBottomFrac: Double = 0.0): DataFrame = {
    require(dropTopFrac >= 0.0 && dropTopFrac < 1.0,
      s"dropTopFrac must be in [0,1), got $dropTopFrac")
    require(dropBottomFrac >= 0.0 && dropBottomFrac < 1.0,
      s"dropBottomFrac must be in [0,1), got $dropBottomFrac")
    require(dropTopFrac + dropBottomFrac < 1.0,
      "dropTopFrac + dropBottomFrac must leave something to keep")
    prototypicality(df, idCol, vecCol, centroids)
      .select(col(idCol), col("cell"), col("cos_centroid"),
        (col("rank") > floor(lit(dropTopFrac) * col("n_cluster")) &&
          col("rank") <= col("n_cluster") -
            floor(lit(dropBottomFrac) * col("n_cluster"))).as("keep"))
  }
}
