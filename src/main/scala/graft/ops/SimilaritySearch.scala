package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — one scan, one top-k reduce.
  *     The correct baseline, and at 100 TB still viable per-query because the
  *     scan is embarrassingly parallel and the reduce carries only k rows per
  *     partition (Spark's `ORDER BY ... LIMIT k` does a partial top-k on the
  *     map side).
  *   - [[lshTopK]]: random-hyperplane LSH — sign bits of `planes`
  *     hyperplane projections form a bucket id; only the query's bucket is
  *     scanned. Hyperplane components are md5-derived in [-0.5, 0.5), so
  *     buckets are deterministic and engine-portable. This is the scale path:
  *     the bucket join prunes the candidate set by ~2^planes.
  */
object SimilaritySearch {

  /** Cosine similarity of two `array<double>` columns (0 when either norm is
    * 0). Sequential left-to-right accumulation — bit-compatible with a SQL
    * oracle evaluating the same expression.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x * x))
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
  }

  /** Exact top-k by cosine against a single query vector. Ties and float
    * noise are neutralized by ordering on (rounded cosine desc, id asc).
    */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(
        col(idCol),
        graft.Functions.roundHalfUp(cosine(col(vecCol).cast("array<double>"), q), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Scala-side twin of `Functions.md5Bits(_, 32)` (same md5-hex-prefix
    * derivation) so hyperplane components can be precomputed once at plan
    * time instead of per row × plane × dim — at a billion embeddings × 6
    * planes × 768 dims the per-row form is ~4.6 trillion md5 calls for
    * values that fit in a literal array.
    */
  private def md5Bits32(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(4).map("%02x".format(_)).mkString,
      16)

  /** Deterministic hyperplane matrix: entry (p, d) is the md5-derived
    * uniform in [-0.5, 0.5) for plane p, dimension d. Bit-identical to
    * evaluating the same derivation per row: the 32-bit hash value is exact
    * in DOUBLE, division by 2^32 is exact, and -0.5 is exact.
    */
  def planeComponents(planes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(planes, dims)((p, d) => md5Bits32(s"p$p:$d") / 4294967296.0 - 0.5)

  /** LSH bucket id of a vector: bit p = 1 iff the projection onto hyperplane
    * p is positive. The per-row work is a pure multiply-add against literal
    * plane arrays.
    */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column = {
    val comps = planeComponents(planes, dims)
    (0 until planes)
      .map { p =>
        val plane = array(comps(p).map(lit): _*)
        val proj = aggregate(
          zip_with(vec, plane, (x, c) => x * c),
          lit(0.0),
          (acc, x) => acc + x)
        when(proj > 0.0, lit(1L << p)).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  /** Approximate top-k: scan only vectors whose LSH bucket equals the
    * query's bucket, then exact cosine within the bucket.
    */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      planes: Int = 8): DataFrame = {
    val q = array(query.map(lit): _*)
    val qBucket = lshBucket(q, planes, query.length)
    val bucketed = df.select(
      col(idCol),
      col(vecCol).cast("array<double>").as("v"),
      lshBucket(col(vecCol).cast("array<double>"), planes, query.length).as("bucket"))
    bucketed
      .filter(col("bucket") === qBucket)
      .select(col(idCol), graft.Functions.roundHalfUp(cosine(col("v"), q), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs top-k within blocking keys (k nearest neighbors per id among
    * rows sharing `blockCol`), via window ranking — the IVF-style "probe one
    * cell" pattern.
    */
  def blockedKnn(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      k: Int): DataFrame = {
    val base = df.select(
      col(idCol).as("id"),
      col(blockCol).as("blk"),
      col(vecCol).cast("array<double>").as("v"))
    val a = base.alias("a")
    val b = base.hint("SHUFFLE_HASH").alias("b")
    val scored = a
      .join(b, col("a.blk") === col("b.blk") && col("a.id") =!= col("b.id"))
      .select(
        col("a.id").as("id"),
        col("b.id").as("neighbor"),
        graft.Functions.roundHalfUp(cosine(col("a.v"), col("b.v")), 6).as("cos"))
    val w = Window.partitionBy("id").orderBy(col("cos").desc, col("neighbor"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
  }
}
