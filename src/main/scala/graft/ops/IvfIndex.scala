package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate-nearest-neighbor index: the scale path
  * for embedding search when random-hyperplane LSH recall isn't enough.
  *
  *   - build: pick `nCells` deterministic "centroid" vectors (the rows with
  *     the smallest md5(id) — a seedless uniform sample, so builds are
  *     reproducible), assign every vector to its nearest centroid by cosine.
  *     One broadcast of nCells×dim doubles + one scan.
  *   - search: rank centroids against the query on the driver (nCells is
  *     ~√n — driver-sized by construction), then scan only the `nProbe`
  *     best cells. Candidate set shrinks by ~nCells/nProbe; the per-cell
  *     scan is an ordinary pruned filter + top-k.
  *
  * At 100 TB the assignments table is written partitioned BY cell, so a
  * search reads only its probed partitions (partition pruning does the cell
  * selection).
  */
object IvfIndex {

  case class Index(assignments: DataFrame, centroids: Seq[(Long, Seq[Double])])

  private def cosineSim(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Nearest-centroid assignment (cosine argmax, ties to the lowest cell)
    * against a centroid relation `(cell, cv)`: one broadcast of nCells×dim
    * doubles + one scan. The centroid side stays a DataFrame so callers
    * (notably [[refine]]) can chain iterations without ever collecting
    * centroids to the driver.
    */
  private def assignToDf(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame): DataFrame = {
    val scored = df
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .crossJoin(broadcast(centroids))
      .select(col(idCol), col("cell"),
        SimilaritySearch.cosine(col("v"), col("cv")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("sim").desc, col("cell"))
    scored
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(idCol), col("cell"))
  }

  private def assignTo(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroidRows: Seq[(Long, Seq[Double])]): DataFrame =
    assignToDf(df, idCol, vecCol,
      df.sparkSession.createDataFrame(centroidRows.map { case (i, v) => (i, v) })
        .toDF("cell", "cv"))

  /** Multi-probe assignment against an existing index's geometry: each row
    * gets its `nProbe` NEAREST cells (cosine, ties to the lowest cell) —
    * `(idCol, cell)` with up to nProbe rows per id. The query-side half of
    * an IVF candidate join ([[graft.ops.SimilaritySearch.marginMineIvf]]):
    * one broadcast of the nCells×dim centroid table + one scan, the
    * [[search]] probe rule expressed as a relation instead of a driver
    * loop so a whole QUERY CORPUS probes in one pass.
    */
  def assignProbes(
      index: Index,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val centroids = df.sparkSession
      .createDataFrame(index.centroids.map { case (i, v) => (i, v) })
      .toDF("cell", "cv")
    val scored = df
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .crossJoin(broadcast(centroids))
      .select(col(idCol), col("cell"),
        SimilaritySearch.cosine(col("v"), col("cv")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("sim").desc, col("cell"))
    scored
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= nProbe)
      .select(col(idCol), col("cell"))
  }

  /** Build the index: returns per-id cell assignments plus the centroid
    * vectors.
    */
  def build(df: DataFrame, idCol: String, vecCol: String, nCells: Int): Index = {
    // deterministic uniform sample: smallest md5 over the id domain
    val centroidRows = df
      .select(col(idCol).cast("long").as("cid"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("_h", md5(col("cid").cast("string")))
      .orderBy("_h")
      .limit(nCells)
      .select("cid", "cv")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq
    Index(assignTo(df, idCol, vecCol, centroidRows), centroidRows)
  }

  /** Lloyd refinement of the sampled centroids: `iterations` rounds of
    * assign-to-nearest (cosine) + exact per-cell per-dimension mean. Means
    * sum through DECIMAL(28,12), so refined centroids are BIT-IDENTICAL
    * under any partitioning — double summation order would not be (the
    * same determinism rule every aggregate in this engine follows). Cells
    * that lose all members keep their previous centroid.
    *
    * The whole Lloyd loop is DISTRIBUTED: centroids live as a `(cell, cv)`
    * DataFrame that is broadcast-joined at each assignment, and per-cell
    * means are re-assembled into centroid arrays with a sort-by-position
    * `collect_list` — nothing touches the driver between iterations (at
    * nCells ≈ 31 k × 768 dims the old per-iteration collect was ~24 M rows).
    * The single driver-side materialization is the final `Index.centroids`,
    * which the Index contract needs anyway for search-time probe ranking
    * (nCells ≈ √n — driver-sized by construction, same as [[build]]/[[load]]).
    *
    * Besides better IVF recall, the refined (cell → members) assignment IS
    * the k-means clustering of the corpus — the data-curation/mixing
    * primitive (cluster-balanced sampling pairs it with
    * [[Sampling.stratifiedSample]]).
    */
  def refine(
      index: Index,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      iterations: Int = 3): Index = {
    val spark = df.sparkSession
    var centroids = spark.createDataFrame(index.centroids.map { case (i, v) => (i, v) })
      .toDF("cell", "cv")
    (1 to iterations).foreach { _ =>
      val assignments = assignToDf(df, idCol, vecCol, centroids)
      val means = df
        .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
        .join(assignments, Seq(idCol))
        .select(col("cell"), posexplode(col("v")))
        .groupBy(col("cell"), col("pos"))
        .agg((sum(col("col").cast("decimal(28,12)")) / count(lit(1)))
          .cast("double").as("m"))
        // (pos, m) structs sort by pos (unique per cell), so the rebuilt
        // array is deterministic regardless of collect_list arrival order
        .groupBy(col("cell"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m")).as("mv"))
      // Materialization barrier: each iteration's plan references the
      // previous centroids TWICE (broadcast in assignToDf + the left join),
      // so without a barrier the lineage doubles per iteration and the
      // final collect re-scans `df` O(2^iterations) times. localCheckpoint
      // truncates the plan to the materialized nCells rows — cheap by
      // construction — keeping the loop at O(iterations) scans.
      centroids = centroids
        .join(means, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("mv"), col("cv")).as("cv"))
        .localCheckpoint(true)
    }
    val centroidRows = centroids.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq.sortBy(_._1)
    Index(assignTo(df, idCol, vecCol, centroidRows), centroidRows)
  }

  /** Persist the index as a lake artifact: assignments partitioned BY cell —
    * a probed search then reads only its cells' partition directories
    * (partition pruning does the cell selection) — plus a single-file
    * centroid table. Build once, search many: the 100 TB usage pattern.
    */
  def save(index: Index, path: String): Unit = {
    val spark = index.assignments.sparkSession
    index.assignments.write.mode("overwrite")
      .partitionBy("cell").parquet(s"$path/assignments")
    spark.createDataFrame(index.centroids.map { case (i, v) => (i, v) })
      .toDF("cell", "cv")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Load a persisted index. The centroid table is nCells ≈ √n rows —
    * driver-sized by construction, same as at build time.
    */
  def load(spark: SparkSession, path: String): Index = {
    val assignments = spark.read.parquet(s"$path/assignments")
      .withColumn("cell", col("cell").cast("long"))
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq.sortBy(_._1)
    Index(assignments, centroids)
  }

  /** Incrementally extend a PERSISTED index: assign the new vectors to the
    * existing (frozen) centroids and APPEND to the cell-partitioned
    * assignment table — no rebuild, no rewrite of existing files, the same
    * incremental-maintenance story as [[graft.catalog.SnapshotLake]]
    * commits. Assignment is deterministic given centroids, so the appended
    * index is bit-identical to one built over the union with the same
    * centroid set (spec-asserted). Centroids stay frozen — the standard
    * IVF maintenance trade: cell balance drifts as the corpus grows, so
    * re-run [[refine]] + [[save]] when recall decays.
    */
  def append(
      spark: SparkSession,
      path: String,
      newVectors: DataFrame,
      idCol: String,
      vecCol: String): Unit = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .toSeq.sortBy(_._1)
    require(centroids.nonEmpty, s"$path has no centroids — not a saved IVF index")
    assignTo(newVectors, idCol, vecCol, centroids)
      .write.mode("append").partitionBy("cell").parquet(s"$path/assignments")
  }

  /** Search: top-k by cosine among vectors in the `nProbe` cells nearest to
    * the query.
    */
  def search(
      index: Index,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      nProbe: Int): DataFrame = {
    val probed = index.centroids
      .map { case (cell, cv) => (cell, cosineSim(query, cv)) }
      .sortBy { case (cell, sim) => (-sim, cell) }
      .take(nProbe)
      .map(_._1)
    val q = array(query.map(lit): _*)
    df.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .join(index.assignments.filter(col("cell").isin(probed: _*)), Seq(idCol), "left_semi")
      .select(col(idCol),
        graft.Functions.roundHalfUp(SimilaritySearch.cosine(col("v"), q), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
