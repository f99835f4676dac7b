package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-curation pipeline — the training-data twin of the
  * GRIDSMART ready chain ([[graft.apps.GsReady]]): one declarative decision
  * per document combining every curation signal this engine implements.
  *
  * Per-document flags, ANDed into `keep`:
  *   - `quality_ok`      — [[TextAnalysis.qualityMetrics]] composite ≥ `minQuality`
  *   - `lang_ok`         — [[TextAnalysis.langId]] guess ∈ `acceptLangs`
  *   - `exact_canonical` — the document is its content hash's canonical
  *                         (minimum) id ([[Dedup.exact]])
  *   - `near_canonical`  — the document is its near-dup CLUSTER's canonical:
  *                         [[Dedup.minhashLshPairs]] pairs, clustered by
  *                         [[ConnectedComponents.assign]]
  *   - `sampled`         — deterministic md5 sampling at `sampleRate`
  *                         ([[Sampling.hashUniform]])
  *
  * Flags are computed independently over the full corpus and surfaced per
  * document (not pre-filtered away) so downstream audits can ask "why was
  * this dropped" — observability over destructive filtering, the same call
  * the device cascade makes with `resolution_stage`.
  *
  * Scale shape: quality/lang/sampling are per-row projections (zero
  * shuffle); the exact-canonical flag is one map-side-combinable hash
  * aggregate plus a keyed join on the content hash; the near-dup flag costs
  * the LSH pair generation + star-contraction rounds — every shuffle keyed,
  * nothing quadratic, nothing driver-side.
  */
object Curate {

  def decide(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.5,
      acceptLangs: Seq[String] = Seq("en", "und"),
      sampleRate: Double = 1.0,
      sampleSalt: String = "",
      lshNumHashes: Int = 8,
      lshBands: Int = 2,
      langMarkers: Seq[(String, Seq[String])] = TextAnalysis.LangMarkers): DataFrame = {
    val id = col(idCol)
    val base = docs.select(
      id,
      TextAnalysis.langId(col(textCol), langMarkers).as("_lang"),
      md5(trim(lower(col(textCol)))).as("_ch"),
      (Sampling.hashUniform(id, sampleSalt) < sampleRate).as("sampled"))
    val quality = TextAnalysis.qualityMetrics(docs, idCol, textCol)
      .select(id, (col("quality_score") >= minQuality).as("quality_ok"))
    val exact = Dedup.exact(docs, idCol, textCol)
      .select(col("content_hash").as("_ch"), col("canonical_id"))
    val clusters = ConnectedComponents.assign(
      docs.select(id), idCol,
      Dedup.minhashLshPairs(docs, idCol, textCol, lshNumHashes, lshBands),
      "id_a", "id_b")
    base
      .join(quality, Seq(idCol))
      .join(exact, Seq("_ch"))
      .join(clusters, Seq(idCol))
      .select(
        id,
        col("quality_ok"),
        col("_lang").isin(acceptLangs: _*).as("lang_ok"),
        (id === col("canonical_id")).as("exact_canonical"),
        (id === col("cluster_id")).as("near_canonical"),
        col("sampled"))
      .withColumn(
        "keep",
        col("quality_ok") && col("lang_ok") && col("exact_canonical") &&
          col("near_canonical") && col("sampled"))
  }
}
