package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Clustering-quality metrics — purity and normalized mutual information
  * of a (cluster, label) co-assignment: the external-validity scorecard
  * for [[SemanticDedup]] / [[IvfIndex]] cell structure against known
  * labels (a semantic dedup whose clusters cut across labels is deleting
  * the wrong documents; NMI is the standard number that says so).
  *
  * Determinism contract: the contingency cells are integers from ONE
  * bounded (cluster, label) aggregate; purity is one integer divide. MI
  * and both entropies quantize EVERY `ln` term to integer PICO(12) units
  * before their order-free sums (the PMI/KN discipline — no float ever
  * aggregates), and NMI = mi_pico / √(hc_pico·hl_pico) is one final
  * expression rounded half-up 6 (NULL when either entropy is 0 — a
  * single-cluster or single-label partition has no normalizable
  * information). Ratios inside `ln` evaluate as DOUBLE products, so no
  * integer overflow at any N.
  */
object ClusterEval {

  /** Attach the nearest-centroid cell (highest cosine, tie → lowest cell
    * id) to every row with a non-NULL vector — the
    * [[Profile.embeddingDrift]] assignment rule, exposed for evaluation
    * pipelines. `centroids` is the bounded `(cell, cv)` relation.
    */
  def assignCells(df: DataFrame, vecCol: String, centroids: DataFrame): DataFrame = {
    val cells: Seq[(Long, Seq[Double])] = centroids
      .select(col("cell").cast("long"), col("cv").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    require(cells.nonEmpty, "need at least one centroid")
    val v = col(vecCol).cast("array<double>")
    val scored = array(cells.map { case (c, cv) =>
      struct(
        (-graft.Functions.roundHalfUp(
          graft.Functions.vecCosine(v, typedlit(cv)), 6)).as("n"),
        lit(c).as("c"))
    }: _*)
    df.filter(v.isNotNull).withColumn("cell", array_min(scored)("c"))
  }

  /** One-row purity + NMI report over (cluster, label) pairs:
    * `(n, n_clusters, n_labels, purity, mi, h_cluster, h_label, nmi)`.
    * NULL clusters/labels drop.
    */
  def purityNmi(df: DataFrame, clusterCol: String, labelCol: String): DataFrame = {
    val pico = (c: Column) => floor(c * 1e12 + lit(0.5)).cast("long")
    val cells = df
      .filter(col(clusterCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(clusterCol).as("_c"), col(labelCol).as("_k"))
      .agg(count(lit(1)).as("_n"))
    val ac = cells.groupBy(col("_c")).agg(sum(col("_n")).as("_a"))
    val bk = cells.groupBy(col("_k")).agg(sum(col("_n")).as("_b"))
    val tot = cells.agg(
      coalesce(sum(col("_n")), lit(0L)).as("n"),
      countDistinct(col("_c")).as("n_clusters"),
      countDistinct(col("_k")).as("n_labels"))
    val pur = cells.groupBy(col("_c")).agg(max(col("_n")).as("_mx"))
      .agg(coalesce(sum(col("_mx")), lit(0L)).as("_pure"))
    val nD = col("n").cast("double")
    val mi = cells
      .join(ac, Seq("_c")).join(bk, Seq("_k")).crossJoin(broadcast(tot))
      .select(pico((col("_n").cast("double") / nD) *
        log((col("_n").cast("double") * nD) /
          (col("_a").cast("double") * col("_b").cast("double")))).as("_t"))
      .agg(coalesce(sum(col("_t")), lit(0L)).as("_mi"))
    def entropy(margin: DataFrame, cnt: String) = margin
      .crossJoin(broadcast(tot))
      .select(pico(-(col(cnt).cast("double") / nD) *
        log(col(cnt).cast("double") / nD)).as("_t"))
      .agg(coalesce(sum(col("_t")), lit(0L)))
    val hc = entropy(ac, "_a").toDF("_hc")
    val hl = entropy(bk, "_b").toDF("_hl")
    tot.crossJoin(pur).crossJoin(mi).crossJoin(hc).crossJoin(hl).select(
      col("n"), col("n_clusters"), col("n_labels"),
      when(col("n") === 0L, lit(null).cast("double"))
        .otherwise(graft.Functions.roundHalfUp(
          col("_pure").cast("double") / nD, 6)).as("purity"),
      graft.Functions.roundHalfUp(col("_mi").cast("double") / 1e12, 6).as("mi"),
      graft.Functions.roundHalfUp(col("_hc").cast("double") / 1e12, 6).as("h_cluster"),
      graft.Functions.roundHalfUp(col("_hl").cast("double") / 1e12, 6).as("h_label"),
      when(col("_hc") <= 0L || col("_hl") <= 0L, lit(null).cast("double"))
        .otherwise(graft.Functions.roundHalfUp(
          col("_mi").cast("double") /
            sqrt(col("_hc").cast("double") * col("_hl").cast("double")), 6))
        .as("nmi"))
  }
}
