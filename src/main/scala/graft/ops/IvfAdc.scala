package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVFADC — the billion-scale ANN composition of [[IvfIndex]] (coarse
  * cells) and [[ProductQuantize]] (residual codes): each vector is stored
  * as its IVF cell plus the PQ codes of its RESIDUAL against that cell's
  * centroid, search ADC-scans only the probed cells' codes, and an exact
  * top-R rerank runs over the shortlist alone (Jégou/Douze/Schmid, TPAMI
  * 2011 — the inverted-file + asymmetric-distance structure of FAISS's
  * `IndexIVFPQ`). Without this composition an IVF probe re-reads raw
  * float vectors per cell; with it the probe reads `m` bytes per
  * candidate.
  *
  * Distance contract: cells PROBE by cosine (the [[IvfIndex.search]]
  * rule, so both index families rank cells identically); candidate
  * distances are squared L2, which residual ADC approximates exactly in
  * expectation — `‖q − v‖² = ‖(q − c) − (v − c)‖²` for the shared
  * centroid `c`, so per-cell ADC tables are built from the residual query
  * `q − c`. The exact rerank is squared L2 on the raw vectors. Every
  * distance lives on the rounded-6 grid with id tiebreaks (the engine's
  * determinism rules), so the whole chain — sampling, assignment,
  * encoding, ADC, rerank — replays in a SQL oracle.
  *
  * Scale shape: build is [[IvfIndex.build]] + one residual projection +
  * [[ProductQuantize]] fit/encode (bounded collects only); the persisted
  * artifact stores codes PARTITIONED BY CELL so a search reads exactly
  * its probed cells' code bytes ([[searchSaved]] hands the scan only
  * those directories — never the raw vectors until the shortlist
  * rerank); the rerank joins the driver-bounded shortlist back to the
  * vector relation as a broadcast semi-join.
  */
object IvfAdc {

  /** codes: `(id, cell, codes array<int>)` — the complete search-side
    * state next to the centroid table and the codebooks.
    */
  case class Index(
      ivf: IvfIndex.Index,
      cb: ProductQuantize.Codebooks,
      codes: DataFrame)

  private def cosineSim(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Residual relation `(id, cell, r)` for `df` against an IVF geometry:
    * one broadcast centroid join, `r = v − centroid(cell)` element-wise.
    */
  private def residuals(
      df: DataFrame, idCol: String, vecCol: String,
      ivf: IvfIndex.Index): DataFrame = {
    val spark = df.sparkSession
    val cent = spark.createDataFrame(ivf.centroids.map { case (i, v) => (i, v) })
      .toDF("cell", "cv")
    df.select(col(idCol), col(vecCol).cast("array<double>").as("_v"))
      .join(ivf.assignments, Seq(idCol))
      .join(broadcast(cent), Seq("cell"))
      .select(col(idCol), col("cell"),
        zip_with(col("_v"), col("cv"), (a, b) => a - b).as("r"))
  }

  /** Build over an existing IVF geometry (pass [[IvfIndex.refine]]'s
    * output for k-means-quality cells): residual-PQ codebooks fit on the
    * whole corpus's residuals, every vector encoded. `refinePq` Lloyd
    * rounds ([[ProductQuantize.refine]]) tighten the codebooks — the
    * production IVFADC trains both quantizers; 0 keeps the raw md5-sample
    * codebooks for oracle replay.
    */
  def buildFromIvf(
      df: DataFrame, idCol: String, vecCol: String,
      ivf: IvfIndex.Index, m: Int, k: Int, refinePq: Int = 0): Index = {
    // deliberately NOT checkpointed: materializing corpus-sized residuals
    // would defeat the compression; each consumer re-derives them from the
    // scan + one broadcast join
    val resid = residuals(df, idCol, vecCol, ivf)
    val cb0 = ProductQuantize.fit(resid, idCol, "r", m, k)
    val cb = if (refinePq <= 0) cb0
      else ProductQuantize.refine(resid, "r", cb0, refinePq)
    val codes = resid.select(col(idCol), col("cell"),
      ProductQuantize.encode(col("r"), cb).as("codes"))
    Index(ivf, cb, codes)
  }

  def build(
      df: DataFrame, idCol: String, vecCol: String,
      nCells: Int, m: Int, k: Int, refinePq: Int = 0): Index =
    buildFromIvf(df, idCol, vecCol,
      IvfIndex.build(df, idCol, vecCol, nCells), m, k, refinePq)

  /** The ADC shortlist: per probed cell, every candidate's approximate
    * squared L2 (`m` table lookups against that cell's residual-query ADC
    * table), unioned across the `nProbe` cells and cut to `shortlist` by
    * `(adc, id)` — one partition-prunable leg per cell, code bytes only.
    */
  private def adcShortlist(
      codes: DataFrame, idCol: String,
      centroids: Seq[(Long, Seq[Double])], cb: ProductQuantize.Codebooks,
      query: Seq[Double], nProbe: Int, shortlist: Int): DataFrame = {
    val probed = centroids
      .map { case (cell, cv) => (cell, cosineSim(query, cv)) }
      .sortBy { case (cell, sim) => (-sim, cell) }
      .take(nProbe).map(_._1)
    val byCell = centroids.toMap
    val legs = probed.map { cell =>
      val qr = query.zip(byCell(cell)).map { case (a, b) => a - b }
      codes.filter(col("cell") === cell)
        .select(col(idCol),
          ProductQuantize.adcDistance(col("codes"), cb, qr).as("adc"))
    }
    legs.reduce(_ union _).orderBy(col("adc"), col(idCol)).limit(shortlist)
  }

  /** Search: ADC over the probed cells' codes → exact squared-L2 rerank of
    * the shortlist against the raw vectors → top-k by `(d2, id)`. With
    * `nProbe = nCells` and `shortlist ≥ |corpus|` this IS the exact
    * squared-L2 top-k (spec-pinned).
    */
  def search(
      index: Index,
      df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, nProbe: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val short = adcShortlist(
      index.codes, idCol, index.ivf.centroids, index.cb, query, nProbe, shortlist)
    rerank(short, df, idCol, vecCol, query, k)
  }

  private def rerank(
      short: DataFrame, df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(col(idCol), col(vecCol).cast("array<double>").as("_v"))
      .join(broadcast(short), Seq(idCol))
      .select(col(idCol), col("adc"),
        graft.Functions.roundHalfUp(
          graft.Functions.vecSqDist(col("_v"), q), 6).as("d2"))
      .orderBy(col("d2"), col(idCol))
      .limit(k)
  }

  private val MetaFile = "_ivfadc_meta.json"
  private val CellsFile = "_ivfadc_cells.json"

  /** The artifact's recorded non-empty cell set, parsed from its own
    * sidecar (`cell_<id>` marker fields).
    */
  private def savedCells(spark: SparkSession, path: String): Set[Long] = {
    val p = new org.apache.hadoop.fs.Path(path, CellsFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$path has no $CellsFile — not an IVFADC artifact written by save")
    val in = fs.open(p)
    val json =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    """"cell_(\d+)"""".r.findAllMatchIn(json).map(_.group(1).toLong).toSet
  }

  /** Persist the composite artifact: codes partitioned BY CELL (a probed
    * search reads only its cells' directories), the centroid table, the
    * PQ codebooks with their own shape sidecar, and a composite meta file
    * so [[load]]/[[searchSaved]] validate geometry instead of guessing —
    * a bare or foreign directory is refused loudly.
    */
  def save(index: Index, path: String): Unit = {
    val spark = index.codes.sparkSession
    index.codes.write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    spark.createDataFrame(index.ivf.centroids.map { case (i, v) => (i, v) })
      .toDF("cell", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    ProductQuantize.save(index.cb, spark, s"$path/pq")
    // which cells actually HAVE members (a cell can legitimately be empty —
    // ties assign to the lowest cell, and nothing may land in a sampled
    // centroid's cell): searchSaved SKIPS probed-but-empty cells, but a
    // RECORDED cell whose directory is missing is damage and must stay
    // loud — so the distinction is persisted, never guessed from listing
    val nonEmpty = index.codes.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    MetaJson.write(spark, path, CellsFile, nonEmpty.map(c => s"cell_$c" -> 1L))
    MetaJson.write(spark, path, MetaFile,
      Seq("nCells" -> index.ivf.centroids.size.toLong,
        "m" -> index.cb.m.toLong, "k" -> index.cb.k.toLong,
        "dims" -> index.cb.dims.toLong))
  }

  /** Incrementally extend a PERSISTED IVFADC artifact: assign the new
    * vectors to the existing (frozen) centroids, encode their residuals
    * with the existing (frozen) codebooks, and APPEND to the
    * cell-partitioned codes table — no rebuild, no rewrite of existing
    * files; the non-empty-cell sidecar unions in any newly populated
    * cells. Assignment and encoding are deterministic given the frozen
    * geometry, so the appended artifact searches identically to one built
    * over the union with the same centroid/codebook set (spec-asserted).
    * Same maintenance trade as [[IvfIndex.append]]: cells and codebooks
    * drift as the corpus grows — rebuild with refinement when recall
    * decays.
    */
  def append(
      spark: SparkSession, path: String,
      newVectors: DataFrame, idCol: String, vecCol: String): Unit = {
    MetaJson.readFields(spark, path, MetaFile,
      Seq("nCells", "m", "k", "dims"), "an IVFADC artifact written by save")
    val cb = ProductQuantize.load(spark, s"$path/pq")
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    require(centroids.nonEmpty, s"$path has no centroids — not a saved IVFADC index")
    // re-assign against the frozen centroids (the IvfIndex.append rule),
    // then residual-encode with the frozen codebooks
    val cent = spark.createDataFrame(centroids.map { case (i, v) => (i, v) })
      .toDF("cell", "cv")
    val scored = newVectors
      .select(col(idCol), col(vecCol).cast("array<double>").as("_v"))
      .crossJoin(broadcast(cent))
      .select(col(idCol), col("_v"), col("cell"),
        SimilaritySearch.cosine(col("_v"), col("cv")).as("_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("_sim").desc, col("cell"))
    val assigned = scored
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(idCol), col("_v"), col("cell"))
    val codes = assigned
      .join(broadcast(cent), Seq("cell"))
      .select(col(idCol), col("cell"),
        ProductQuantize.encode(
          zip_with(col("_v"), col("cv"), (a, b) => a - b), cb).as("codes"))
    codes.write.mode("append").partitionBy("cell").parquet(s"$path/codes")
    // the sidecar must cover any newly populated cell — union, rewrite
    val newCells = codes.select("cell").distinct().collect().map(_.getLong(0)).toSet
    val allCells = (savedCells(spark, path) ++ newCells).toSeq.sorted
    MetaJson.write(spark, path, CellsFile, allCells.map(c => s"cell_$c" -> 1L))
  }

  /** Search a PERSISTED index without materializing it: the ADC legs scan
    * ONLY the probed cells' partition directories of the codes table —
    * probe cost is pinned to probed-cell code bytes by construction, not
    * by optimizer goodwill — and raw vectors enter only at the shortlist
    * rerank. Refuses a directory [[save]] didn't write.
    */
  def searchSaved(
      spark: SparkSession, path: String,
      df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, nProbe: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val f = MetaJson.readFields(spark, path, MetaFile,
      Seq("nCells", "m", "k", "dims"), "an IVFADC artifact written by save")
    val cb = ProductQuantize.load(spark, s"$path/pq")
    require(cb.m == f("m") && cb.k == f("k") && cb.dims == f("dims"),
      s"codebook shape (${cb.m},${cb.k},${cb.dims}) disagrees with the artifact " +
        s"meta (${f("m")},${f("k")},${f("dims")}) — mixed artifacts")
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    require(centroids.size == f("nCells"),
      s"centroid table has ${centroids.size} cells, meta says ${f("nCells")}")
    val nonEmpty = savedCells(spark, path)
    val probed = centroids
      .map { case (cell, cv) => (cell, cosineSim(query, cv)) }
      .sortBy { case (cell, sim) => (-sim, cell) }
      .take(nProbe).map(_._1)
      // a probed cell with no members has no partition directory — skip it
      // (recorded as empty at save time); a RECORDED cell whose directory
      // is gone will fail the parquet read loudly, exactly as damage should
      .filter(nonEmpty.contains)
    if (probed.isEmpty)
      return rerank(
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            df.schema(idCol),
            org.apache.spark.sql.types.StructField("adc",
              org.apache.spark.sql.types.DoubleType)))),
        df, idCol, vecCol, query, k)
    val byCell = centroids.toMap
    val legs = probed.map { cell =>
      val qr = query.zip(byCell(cell)).map { case (a, b) => a - b }
      // EXPLICIT partition directory: the scan physically cannot read an
      // unprobed cell's bytes
      spark.read.parquet(s"$path/codes/cell=$cell")
        .select(col(idCol),
          ProductQuantize.adcDistance(col("codes"), cb, qr).as("adc"))
    }
    val short = legs.reduce(_ union _).orderBy(col("adc"), col(idCol)).limit(shortlist)
    rerank(short, df, idCol, vecCol, query, k)
  }
}
