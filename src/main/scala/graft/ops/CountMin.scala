package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Functions

/** Count-Min sketch (Cormode & Muthukrishnan 2005): approximate token
  * frequencies in `depth × width` counters regardless of vocabulary size.
  *
  * The engine's third bounded-memory counting primitive, completing the
  * family: exact `groupBy` (unbounded state), Misra-Gries + recount
  * ([[HeavyHitters]] — exact answers for the top-k question only), and CMS —
  * approximate answers for EVERY key, with a one-sided error bound
  * (estimate ≥ true count, excess ≤ ε·N with probability 1−δ for
  * width=⌈e/ε⌉, depth=⌈ln 1/δ⌉).
  *
  * Scale shape: the sketch IS a DataFrame of at most `depth × width` rows —
  * the partial hash aggregate keys on (row, bucket), so per-task state and
  * the shuffle are both bounded by the sketch size, never by the vocabulary.
  * Estimation is a keyed join against the sketch relation; two sketches
  * built with the same geometry merge counter-wise (counts are linear), so
  * per-day sketches roll up into per-month ones without touching the
  * corpora again.
  *
  * All hashing is md5-derived ([[Functions.md5Bits]]) — deterministic,
  * partition-independent, and reproducible by the DuckDB oracle evaluating
  * the same derivation, so the sketch itself is oracle-checkable
  * bit-for-bit (q_cms_sketch / q_cms_estimate).
  *
  * Reference analog: none (training-data extension; the reference counts
  * exactly in pandas at MB scale).
  */
object CountMin {

  /** Counter column for hash row `r`: first 32 md5 bits of
    * `"<salt><r>:<token>"`, mod `width`. Each row uses an independent
    * md5-derived hash function, as the CMS analysis requires.
    */
  private[ops] def bucketFor(token: Column, r: Int, width: Int, salt: String): Column =
    pmod(Functions.md5Bits(concat(lit(s"$salt$r:"), token), 32), lit(width.toLong))

  private def cleanTokens(textCol: String): Column =
    filter(Dedup.tokens(coalesce(col(textCol), lit(""))), t => t =!= "")

  /** Build the sketch over the whitespace tokens of `textCol`:
    * one (row, bucket, cnt) tuple per non-empty counter, ≤ depth×width rows.
    */
  def sketch(
      docs: DataFrame,
      textCol: String,
      depth: Int,
      width: Int,
      salt: String = "cms"): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth=$depth out of range [1, 16]")
    require(width >= 1, s"width=$width must be positive")
    val toks = docs.select(explode(cleanTokens(textCol)).as("tok"))
    val rb = array((0 until depth).map { r =>
      struct(lit(r.toLong).as("row"), bucketFor(col("tok"), r, width, salt).as("bucket"))
    }: _*)
    toks
      .select(explode(rb).as("rb"))
      .select(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for every distinct value of `tokenCol` in `queries`:
    * (token, est) with est = min over hash rows of the addressed counter
    * (0 when a counter was never touched). The probe side explodes to
    * `depth` rows per distinct token and joins the sketch on its key — at
    * any corpus size this is a keyed equi-join against a ≤ depth×width
    * relation, which the planner broadcasts.
    */
  def estimate(
      sk: DataFrame,
      queries: DataFrame,
      tokenCol: String,
      depth: Int,
      width: Int,
      salt: String = "cms"): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth=$depth out of range [1, 16]")
    require(width >= 1, s"width=$width must be positive")
    val probes = queries
      .select(col(tokenCol).cast("string").as("token"))
      .where(col("token").isNotNull)
      .distinct()
      .select(col("token"),
        posexplode(array((0 until depth).map(r => bucketFor(col("token"), r, width, salt)): _*)))
      .withColumnRenamed("pos", "row")
      .withColumnRenamed("col", "bucket")
      .withColumn("row", col("row").cast("long"))
    probes
      .join(broadcast(sk), Seq("row", "bucket"), "left")
      .groupBy("token")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Estimates for every distinct corpus token — the self-audit form the
    * oracle checks: join each token's estimate with nothing dropped.
    */
  def estimateAll(
      docs: DataFrame,
      textCol: String,
      depth: Int,
      width: Int,
      salt: String = "cms"): DataFrame = {
    val sk = sketch(docs, textCol, depth, width, salt)
    val vocab = docs.select(explode(cleanTokens(textCol)).as("token"))
    estimate(sk, vocab, "token", depth, width, salt)
  }

  /** Counter-wise merge of sketches built with the SAME (depth, width,
    * salt) geometry. Counts are linear, so merge(sketch(A), sketch(B)) ==
    * sketch(A ∪ B) exactly — the property that lets per-shard sketches
    * roll up without re-reading data. Geometry agreement is the caller's
    * contract (the relations carry no metadata); [[estimate]] against a
    * mixed-geometry merge would silently misaddress, so keep sketches in
    * lake paths that encode their geometry, as the LSH/PQ artifacts do.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy("row", "bucket").agg(sum("cnt").as("cnt"))

  /** Equi-join SIZE estimate from two sketches alone (the AMS/CMS inner
    * product, Cormode & Muthukrishnan 2005 §4.2): the true join
    * cardinality on a key is `Σ_v f_A(v)·f_B(v)`, and
    * `min_r Σ_w a[r][w]·b[r][w]` over-estimates it by at most ε·|A|·|B|
    * with probability 1−δ — the shuffle-planning number (pick broadcast
    * vs salt vs bucket) WITHOUT touching either corpus again, from
    * sketches that were already maintained per shard/day.
    *
    * Both sketches must share (depth, width, salt) geometry — the
    * [[merge]] contract. Absent counters are zero, so the per-row sum
    * only needs the INNER join of non-empty cells. Output one row:
    * `(est)` = the minimum row sum, 0 when the sketches share no touched
    * counters. Pure integer arithmetic; the join is keyed on (row,
    * bucket) against ≤ depth×width relations.
    */
  def innerProductEstimate(a: DataFrame, b: DataFrame, depth: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth=$depth out of range [1, 16]")
    val rows = a.alias("a")
      .join(b.alias("b"), Seq("row", "bucket"))
      .groupBy(col("row"))
      .agg(sum(col("a.cnt") * col("b.cnt")).as("_rs"))
    // a hash row whose cells never collide is absent from `rows`; its sum
    // is 0 and the minimum must see it — fold against the full row range
    val allRows = a.sparkSession.range(depth).select(col("id").as("row"))
    allRows
      .join(rows, Seq("row"), "left")
      .agg(min(coalesce(col("_rs"), lit(0L))).as("est"))
  }
}
