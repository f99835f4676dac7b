package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.MetaJson

/** Distributed PCA over an embedding column — whitening / dimensionality
  * reduction for the vector half of the pipeline (the learned sibling of
  * [[RandomProjection]]'s data-oblivious JL projection, and the exact
  * counterpart of [[VectorOps.matryoshka]]'s train-time truncation).
  *
  * Spark-first decomposition of the classic algorithm:
  *
  *   1. `covariance` — ONE corpus pass: explode each vector into its d²
  *      (i, j) component pairs and aggregate DECIMAL-exact sums keyed on
  *      (i, j). Partial aggregation absorbs the blow-up map-side, so the
  *      shuffle carries at most d(d+1)/2 rows TOTAL regardless of corpus
  *      size — at 100 TB the network cost is a few thousand rows. Exact
  *      sums make the matrix bit-identical under any partitioning and
  *      recomputable by the DuckDB oracle (q_vec_cov).
  *   2. `fit` — collect the d×d matrix (driver-bounded: d ≤ 512) and run a
  *      deterministic cyclic Jacobi eigendecomposition driver-side; sort
  *      eigenpairs by descending eigenvalue and sign-normalize each vector
  *      (largest-|component| entry made positive) so the model is a pure
  *      function of the data, not of iteration order.
  *   3. `transform` — project rows through PLAN-TIME LITERALS:
  *      `proj_j = dot(x, w_j) − dot(mean, w_j)`, the second term a
  *      driver-precomputed scalar — so centering never materializes an
  *      intermediate array and each component is one fused codegen'd
  *      [[graft.expressions.DotProduct]] per row, zero shuffles.
  *
  * The eigen step is iterative and driver-side, so like IVF's Lloyd
  * refinement it is ScalaTest-bounded (orthonormality, trace preservation,
  * low-rank recovery) while the corpus-scale covariance pass carries the
  * full SQL oracle.
  *
  * Reference analog: none (training-data extension; the reference has no
  * vector data).
  */
object Pca {

  /** Exact sample covariance, long upper-triangle format `(i, j, cov)`,
    * j ≥ i, from one pass. Vectors that are NULL or not `dims` long are
    * excluded. `cov = (Σxᵢxⱼ − Σxᵢ·Σxⱼ/n) / (n−1)` — sums DECIMAL-exact,
    * the closed form evaluated in DOUBLE (mirrored by the oracle).
    */
  /** The one-pass (i, j)-cell aggregate both entry points share:
    * `(i, j, n, sx, sy, sxy)` for j ≥ i, DECIMAL-exact sums.
    */
  private def cellAgg(df: DataFrame, vecCol: String, dims: Int): DataFrame = {
    require(dims >= 2 && dims <= 512, s"dims=$dims out of [2, 512]")
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dims)
      .select(col(vecCol).cast("array<double>").as("_v"))
      .select(posexplode(col("_v")).as(Seq("i", "xi")), col("_v"))
      .select(col("i"), col("xi"), posexplode(col("_v")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .select(
        col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("xi").cast("decimal(18,9)").as("xi"),
        col("xj").cast("decimal(18,9)").as("xj"))
      .groupBy("i", "j")
      .agg(
        count(lit(1)).as("n"),
        sum(col("xi")).cast("double").as("sx"),
        sum(col("xj")).cast("double").as("sy"),
        sum(col("xi") * col("xj")).cast("double").as("sxy"))
  }

  def covariance(df: DataFrame, vecCol: String, dims: Int): DataFrame =
    cellAgg(df, vecCol, dims)
      .select(col("i"), col("j"),
        ((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1))
          .as("cov"))

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric matrix:
    * returns (eigenvalues, eigenvectors-as-rows), unsorted. Fixed sweep
    * order + a pure convergence test make the result a function of the
    * input alone.
    */
  private[ops] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (offDiag() > 1e-22 && sweep < 64) {
      sweep += 1
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0.0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
    }
    (Array.tabulate(d)(i => a(i)(i)), Array.tabulate(d, d)((j, i) => v(i)(j)))
  }

  /** Fitted model: component rows are orthonormal, eigenvalues descending,
    * each component sign-normalized (its largest-|x| entry positive,
    * earliest index on ties) so refits are comparable.
    */
  case class PcaModel(
      dims: Int,
      mean: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    require(components.length == eigenvalues.length)
    def k: Int = components.length
  }

  /** Fit the top-`kComponents` principal axes. Driver cost is O(d³) on a
    * d×d matrix — the corpus enters only through [[covariance]]'s bounded
    * aggregate.
    */
  def fit(df: DataFrame, vecCol: String, dims: Int, kComponents: Int): PcaModel = {
    require(kComponents >= 1 && kComponents <= dims,
      s"kComponents=$kComponents out of [1, $dims]")
    // d(d+1)/2 bounded rows — the ONLY driver materialization
    val cells = cellAgg(df, vecCol, dims)
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    require(cells.nonEmpty, "no vectors to fit (empty input or wrong dims)")
    val n = cells((0, 0))._1
    require(n >= 2, s"need at least 2 vectors, got $n")
    val mean = Array.tabulate(dims)(i => cells((i, i))._2 / n)
    val cov = Array.ofDim[Double](dims, dims)
    cells.foreach { case ((i, j), (cnt, sx, sy, sxy)) =>
      val c = (sxy - sx * sy / cnt) / (cnt - 1)
      cov(i)(j) = c
      cov(j)(i) = c
    }
    val (evals, evecs) = jacobiEigen(cov)
    val order = evals.indices.sortBy(i => (-evals(i), i))
    val top = order.take(kComponents).toArray
    val comps = top.map { idx =>
      val w = evecs(idx)
      // sign normalization: the largest-|x| entry (earliest on ties) positive
      val pivot = w.indices.maxBy(i => (math.abs(w(i)), -i))
      if (w(pivot) < 0.0) w.map(x => -x) else w.clone()
    }
    PcaModel(dims, mean, top.map(evals), comps)
  }

  /** Project each row onto the model's axes: `idCols` + `proj`
    * (array of k doubles). One fused dot product per component, centering
    * folded into a precomputed scalar — zero shuffles, codegen'd.
    */
  def transform(df: DataFrame, vecCol: String, idCols: Seq[String], model: PcaModel): DataFrame = {
    val x = col(vecCol).cast("array<double>")
    val projections = model.components.map { w =>
      val wLit = array(w.map(lit(_)): _*)
      val center = w.zip(model.mean).map { case (wi, mi) => wi * mi }.sum
      graft.Functions.vecDot(x, wLit) - lit(center)
    }
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) === model.dims)
      .select(idCols.map(col) :+ array(projections: _*).as("proj"): _*)
  }

  /** Whitening projection: [[transform]] with each component scaled by
    * `1/√(λⱼ + eps)` so the output has (approximately) identity covariance —
    * the standard preprocessing before cosine-based dedup or k-means when
    * the raw embedding dimensions have wildly different variances. Scales
    * fold into the same plan-time literals; still zero shuffles.
    */
  def whiten(
      df: DataFrame,
      vecCol: String,
      idCols: Seq[String],
      model: PcaModel,
      eps: Double = 1e-12): DataFrame = {
    require(eps > 0.0, s"eps=$eps must be positive")
    val scaled = model.copy(components = model.components.zip(model.eigenvalues).map {
      case (w, lam) =>
        val s = 1.0 / math.sqrt(math.max(lam, 0.0) + eps)
        w.map(_ * s)
    })
    transform(df, vecCol, idCols, scaled)
  }

  /** Persist the model as bounded parquet (mean + per-component rows) with
    * a geometry sidecar — the library's build-once/apply-many artifact
    * contract (LshIndex/NbModel/BpeTokenizer pattern).
    */
  def saveModel(spark: SparkSession, model: PcaModel, dir: String): Unit = {
    import spark.implicits._
    val rows =
      model.components.zipWithIndex.map { case (w, j) =>
        (j.toLong, model.eigenvalues(j), w.toSeq)
      }.toSeq
    rows.toDF("component", "eigenvalue", "w")
      .coalesce(1).write.mode("errorifexists").parquet(s"$dir/components")
    Seq(model.mean.toSeq).toDF("mean")
      .coalesce(1).write.mode("errorifexists").parquet(s"$dir/mean")
    MetaJson.write(spark, dir, "_pca_meta.json",
      Seq("dims" -> model.dims.toLong, "k" -> model.k.toLong))
  }

  /** Load a persisted model; refuses a bare directory (no sidecar). */
  def loadModel(spark: SparkSession, dir: String): PcaModel = {
    val meta = MetaJson.readFields(spark, dir, "_pca_meta.json",
      Seq("dims", "k"), "a PCA model written by Pca.saveModel")
    val dims = meta("dims")
    val comps = spark.read.parquet(s"$dir/components")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))
      .sortBy(_._1)
    val mean = spark.read.parquet(s"$dir/mean")
      .collect().head.getSeq[Double](0).toArray
    PcaModel(dims, mean, comps.map(_._2), comps.map(_._3))
  }
}
