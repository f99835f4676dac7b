package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the memory-compression
  * step beyond [[Quantize]]'s scalar int8: split each `dims`-dim vector into
  * `m` subvectors, learn a `k`-codeword codebook per subspace, and store
  * each vector as `m` small integer codes. A 64-dim float vector (256 B)
  * becomes 4 bytes at m=4/k=256 — the working-set cut that keeps a
  * billion-vector ANN index in executor memory — and search runs against
  * codes alone via asymmetric distance computation (ADC): per query, one
  * `m×k` lookup table of subspace distances, then each candidate costs `m`
  * table lookups instead of `dims` multiplies (Jégou/Douze/Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * Determinism contract (the engine-wide rules): codebook init is the
  * md5-smallest `k` corpus vectors (seedless, rerun-stable — the
  * [[IvfIndex.build]] sample), Lloyd refinement means go through
  * DECIMAL(28,12) (bit-identical under any partitioning), and every distance
  * is rounded half-up to 6 before any comparison, so code assignment and ADC
  * ranking reproduce exactly in a SQL oracle. Ties break to the lowest code.
  *
  * Scale shape: `fit` collects k vectors and, per refinement round, m·k·dsub
  * mean cells — both driver-bounded by construction (the IVF centroid
  * contract). `encode`/`adcDistance` are pure per-row expressions against
  * plan-time literal codebooks: no join, no shuffle, embarrassingly parallel.
  * Per-subspace distances run through the fused codegen'd
  * [[graft.expressions.SquaredDistance]] over a `slice` — m·k fused calls
  * instead of m·k·dsub inline arithmetic terms, so generated-code size
  * scales with the codebook count, not codebook×dimension; k=256 production
  * codebooks stay within codegen limits (the exploded join path, which
  * [[IvfIndex]] demonstrates for the cell case, remains the fallback).
  *
  * Reference analog: none (no vector search in the reference); part of the
  * training-data-pipeline surface this engine adds.
  */
object ProductQuantize {

  /** Learned codebooks: `books(mi)(c)` is subspace `mi`'s codeword `c`
    * (length dims/m). Carrying (m, k, dims) in the type means a persisted
    * codebook can never silently encode vectors of the wrong shape — the
    * [[SimilaritySearch.LshIndex]] lesson.
    */
  case class Codebooks(m: Int, k: Int, dims: Int, books: Seq[Seq[Seq[Double]]]) {
    require(m >= 1 && dims % m == 0, s"dims=$dims must divide into m=$m subspaces")
    require(books.length == m && books.forall(_.length == k),
      "books shape must be m x k")
    def dsub: Int = dims / m
  }

  /** Squared L2 between `vec`'s subspace-`mi` slice and a literal codeword,
    * rounded half-up 6 (the comparison grid every argmin here uses). Terms
    * accumulate left-to-right in dimension order — the same IEEE sequence a
    * SQL list fold produces.
    */
  private def subDist(vec: Column, mi: Int, dsub: Int, word: Seq[Double]): Column = {
    val sub = slice(vec, mi * dsub + 1, dsub)
    val w = array(word.map(lit): _*)
    graft.Functions.roundHalfUp(graft.Functions.vecSqDist(sub, w), 6)
  }

  /** Driver-side twin of [[subDist]] (identical term order, identical
    * rounding) for query-time ADC tables.
    */
  private def subDistLocal(q: Seq[Double], mi: Int, dsub: Int, word: Seq[Double]): Double = {
    var acc = 0.0
    var j = 0
    while (j < dsub) {
      val d = q(mi * dsub + j) - word(j)
      acc += d * d
      j += 1
    }
    math.floor(acc * 1e6 + 0.5) / 1e6
  }

  /** Nearest codeword in subspace `mi`: argmin over the k rounded distances,
    * first (lowest) code on ties. `array_position(d, array_min(d))` keeps the
    * expression LINEAR in k — a when-chain argmin would re-embed its
    * accumulator twice per step and blow up exponentially.
    */
  private def encodeSub(vec: Column, mi: Int, dsub: Int, words: Seq[Seq[Double]]): Column = {
    val dArr = array(words.map(w => subDist(vec, mi, dsub, w)): _*)
    (array_position(dArr, array_min(dArr)) - 1).cast("int")
  }

  /** Fit codebooks on a corpus: the md5-smallest `k` vectors (by id, with id
    * tiebreak) sliced into `m` subvectors each. One bounded k-row collect;
    * add [[refine]] rounds for k-means-quality codebooks.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, m: Int, k: Int): Codebooks = {
    require(k >= 1)
    val sample = df
      .select(col(vecCol).cast("array<double>").as("cv"), col(idCol).cast("long").as("cid"))
      .withColumn("_h", md5(col("cid").cast("string")))
      .orderBy(col("_h"), col("cid"))
      .limit(k)
      .collect()
      .map(_.getSeq[Double](0))
    require(sample.length == k, s"need at least k=$k vectors to fit codebooks")
    val dims = sample.head.length
    val dsub = dims / m
    Codebooks(m, k, dims,
      (0 until m).map(mi => sample.toSeq.map(_.slice(mi * dsub, (mi + 1) * dsub))))
  }

  /** Lloyd refinement, per subspace: assign every subvector to its nearest
    * codeword (plan-time literal books), recompute codewords as the exact
    * per-(subspace, code, dimension) DECIMAL mean, repeat. One pass per
    * round: the dims-explode carries its subspace's code along, so all m
    * k-means run in the SAME aggregate. Codewords that lose all members
    * survive unchanged. Collects m·k·dsub mean cells per round —
    * driver-bounded (the [[IvfIndex.refine]] contract at PQ scale).
    */
  def refine(
      df: DataFrame,
      vecCol: String,
      cb: Codebooks,
      iterations: Int = 3): Codebooks = {
    var books = cb.books
    (1 to iterations).foreach { _ =>
      val v = col("_v")
      val codes = array((0 until cb.m).map(mi => encodeSub(v, mi, cb.dsub, books(mi))): _*)
      val cells = df
        .select(col(vecCol).cast("array<double>").as("_v"))
        .select(codes.as("_codes"), posexplode(col("_v")))
        .select(
          (col("pos") / cb.dsub).cast("int").as("_m"),
          element_at(col("_codes"), (col("pos") / cb.dsub).cast("int") + 1).as("_code"),
          (col("pos") % cb.dsub).as("_j"),
          col("col"))
        .groupBy("_m", "_code", "_j")
        .agg((sum(col("col").cast("decimal(28,12)")) / count(lit(1))).cast("double").as("_mean"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3)))
        .toMap
      books = (0 until cb.m).map { mi =>
        (0 until cb.k).map { c =>
          (0 until cb.dsub).map { j =>
            cells.getOrElse((mi, c, j), books(mi)(c)(j))
          }
        }
      }
    }
    cb.copy(books = books)
  }

  /** PQ code column: `array<int>` of length m, `codes(mi)` the nearest
    * codeword in subspace mi.
    */
  def encode(vec: Column, cb: Codebooks): Column =
    array((0 until cb.m).map(mi => encodeSub(vec, mi, cb.dsub, cb.books(mi))): _*)

  /** Reconstruction (decode): concatenated codewords — the PQ approximation
    * of the original vector, for error measurement and re-ranking.
    */
  def decode(codes: Column, cb: Codebooks): Column =
    concat((0 until cb.m).map { mi =>
      element_at(
        array(cb.books(mi).map(w => array(w.map(lit): _*)): _*),
        element_at(codes, mi + 1) + 1)
    }: _*)

  /** The query's ADC table: `m × k` rounded subspace distances, computed
    * once driver-side and embedded as plan-time literals (the LSH-planes
    * pattern — per-candidate work is m array lookups + (m-1) adds).
    */
  def adcTable(cb: Codebooks, query: Seq[Double]): Seq[Seq[Double]] = {
    require(query.length == cb.dims, s"query has ${query.length} dims, codebook ${cb.dims}")
    (0 until cb.m).map(mi => cb.books(mi).map(w => subDistLocal(query, mi, cb.dsub, w)))
  }

  /** Approximate squared L2 from `query` to the vector behind `codes`:
    * sum of the m table entries, rounded half-up 6.
    */
  def adcDistance(codes: Column, cb: Codebooks, query: Seq[Double]): Column = {
    val table = adcTable(cb, query)
    val terms = (0 until cb.m).map { mi =>
      element_at(array(table(mi).map(lit): _*), element_at(codes, mi + 1) + 1)
    }
    graft.Functions.roundHalfUp(terms.reduce(_ + _), 6)
  }

  /** ADC top-k: encode on the fly (or pass a pre-encoded relation through
    * `vecCol` being the code column with `preEncoded = true`) and rank by
    * approximate distance, ascending, ties to the lowest id.
    */
  def adcTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Codebooks,
      query: Seq[Double],
      topK: Int,
      preEncoded: Boolean = false): DataFrame = {
    val codes =
      if (preEncoded) col(vecCol)
      else encode(col(vecCol).cast("array<double>"), cb)
    df.select(col(idCol), adcDistance(codes, cb, query).as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(topK)
  }

  /** The production PQ search shape: ADC generates a cheap `shortlist` of
    * candidates (m lookups each), then exact squared L2 re-ranks only those
    * — the two-stage pattern that makes coarse codebooks usable (candidates
    * within a codeword CELL tie on ADC distance; only the re-rank can order
    * them). Both stages order ties by id, both distances live on the
    * rounded-6 grid, so results reproduce exactly.
    */
  def adcRerankTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Codebooks,
      query: Seq[Double],
      topK: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= topK, "shortlist must be at least topK")
    val v = col(vecCol).cast("array<double>")
    val q = array(query.map(lit): _*)
    val short = df
      .select(col(idCol), v.as("_v"), adcDistance(encode(v, cb), cb, query).as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(shortlist)
    short
      .select(col(idCol),
        graft.Functions.roundHalfUp(
          graft.Functions.vecSqDist(col("_v"), q), 6).as("d2"))
      .orderBy(col("d2"), col(idCol))
      .limit(topK)
  }

  private val MetaFile = "_pq_meta.json"

  /** Persist codebooks as a lake artifact: one (subspace, code, word) row
    * each, plus a meta file carrying the shape so [[load]] validates instead
    * of guessing (the `_lsh_meta.json` lesson).
    */
  def save(cb: Codebooks, spark: SparkSession, path: String): Unit = {
    val rows = for (mi <- 0 until cb.m; c <- 0 until cb.k)
      yield (mi, c, cb.books(mi)(c))
    spark.createDataFrame(rows).toDF("subspace", "code", "word")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/books")
    MetaJson.write(spark, path, MetaFile,
      Seq("m" -> cb.m.toLong, "k" -> cb.k.toLong, "dims" -> cb.dims.toLong))
  }

  def load(spark: SparkSession, path: String): Codebooks = {
    val f = MetaJson.readFields(spark, path, MetaFile,
      Seq("m", "k", "dims"), "a codebook written by save")
    val (m, k, dims) = (f("m"), f("k"), f("dims"))
    val byCell = spark.read.parquet(s"$path/books")
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2)))
      .toMap
    Codebooks(m, k, dims,
      (0 until m).map(mi => (0 until k).map(c => byCell((mi, c)))))
  }
}
