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
    * oracle evaluating the same expression. Implemented by the fused
    * codegen'd [[graft.expressions.CosineSimilarity]] (one primitive loop,
    * no intermediate arrays, stays inside WholeStageCodegen); the
    * higher-order-function twin below is the semantics oracle its spec pins
    * it against.
    */
  def cosine(a: Column, b: Column): Column = graft.Functions.vecCosine(a, b)

  /** The original `zip_with`/`aggregate` composite — kept as the executable
    * specification of [[cosine]]'s value + null semantics
    * (VectorExpressionsSpec asserts bit-identical results, including the
    * null/unequal-length/zero-norm corners).
    */
  private[graft] def cosineHof(a: Column, b: Column): Column = {
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

  /** Batched multi-query exact top-k: ALL queries' cosine scans fused into
    * ONE corpus pass — the recall-sweep / evaluation-harness shape, where
    * per-query [[bruteForceTopK]] calls would each rescan the corpus. The
    * bounded query table broadcasts into a crossJoin (rows × |Q| scored
    * pairs, never materialized past the heaps), and per-query top-k rides
    * [[TopK.groupTopK]]'s bounded-heap path — the corpus is never sorted,
    * candidates are ≤ partitions × |Q| × k. Ties break on the STRING form
    * of the id ([[TopK.groupTopK]]'s tiebreak contract, mirrored by the
    * oracle). Output: `(query_id, id, cos)` rows, k per query.
    */
  def bruteForceTopKBatch(
      docs: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val q = queries.select(
      col(qidCol).as("query_id"),
      col(qvecCol).cast("array<double>").as("_qv"))
    val scored = docs
      .crossJoin(broadcast(q))
      .select(
        col("query_id"),
        col(idCol),
        graft.Functions.roundHalfUp(
          cosine(col(vecCol).cast("array<double>"), col("_qv")), 6).as("cos"))
    TopK.groupTopK(scored, "query_id", "cos", idCol, k)
  }

  /** Late-interaction (ColBERT-style, Khattab & Zaharia 2020) max-sim
    * retrieval: documents carry MULTIPLE vectors (one per passage/token
    * block); a multi-vector query scores a document as
    * `Σ_q max_{d ∈ doc} cos(q, d)` — each query vector finds its best
    * match inside the document independently, which single-vector cosine
    * (one pooled embedding per side) cannot express. Returns the top-k
    * `(id, maxsim)` by score desc, id asc.
    *
    * Scale shape: query vectors are bounded (a query's token count) and
    * enter as plan-time LITERAL arrays (the embeddingDrift trick) — no
    * join, no broadcast, no row blow-up; per doc-vector row all |Q|
    * cosines are one codegen'd projection, the per-document maxima fold in
    * ONE map-side-combinable keyed aggregate (|Q| max columns), and the
    * top-k is a TakeOrdered partial reduce. At 100 TB: one scan, one keyed
    * exchange of |docs|·|Q| maxima, k rows out. Per-vector cosines are
    * rounded half-up 6 BEFORE the max and the |Q| maxima sum
    * left-associated, so every step replays exactly in SQL.
    */
  def maxSimTopK(
      docVecs: DataFrame,
      idCol: String,
      vecCol: String,
      queryVecs: Seq[Seq[Double]],
      k: Int): DataFrame = {
    require(queryVecs.nonEmpty, "need at least one query vector")
    require(k >= 1, s"k=$k must be >= 1")
    val v = col(vecCol).cast("array<double>")
    val cosCols = queryVecs.zipWithIndex.map { case (qv, i) =>
      graft.Functions.roundHalfUp(cosine(v, typedlit(qv)), 6).as(s"_c$i")
    }
    val maxes = queryVecs.indices.map(i => max(col(s"_c$i")).as(s"_m$i"))
    val total = queryVecs.indices.map(i => col(s"_m$i")).reduce(_ + _)
    docVecs
      .select(col(idCol) +: cosCols: _*)
      .groupBy(col(idCol))
      .agg(maxes.head, maxes.tail: _*)
      .select(col(idCol), graft.Functions.roundHalfUp(total, 6).as("maxsim"))
      .orderBy(col("maxsim").desc, col(idCol))
      .limit(k)
  }

  /** Scala-side twin of `Functions.md5Bits(_, 32)` (same md5-hex-prefix
    * derivation) so hyperplane components can be precomputed once at plan
    * time instead of per row × plane × dim — at a billion embeddings × 6
    * planes × 768 dims the per-row form is ~4.6 trillion md5 calls for
    * values that fit in a literal array.
    */
  private[ops] def md5Bits32(s: String): Long =
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
    if (planes == 0) return lit(0L) // degenerate geometry: one bucket
    val comps = planeComponents(planes, dims)
    (0 until planes)
      .map { p =>
        val plane = array(comps(p).map(lit): _*)
        val proj = graft.Functions.vecDot(vec, plane)
        when(proj > 0.0, lit(1L << p)).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  /** A built LSH index: the (id, v, bucket) relation plus the geometry it
    * was hashed with. Carrying `planes`/`dims` in the type (and persisting
    * them beside the data) closes a silent-wrong-answer hole: a query of
    * the wrong length, or a search assuming different plane count, would
    * otherwise probe a well-formed but WRONG bucket and return confidently
    * bogus neighbors instead of erroring.
    */
  case class LshIndex(relation: DataFrame, planes: Int, dims: Int)

  /** The LSH index: (id, v, bucket) — [[lshTopK]] computes it
    * per query; [[saveLshIndex]] materializes it partitioned BY bucket so
    * build-once/search-many queries read only their bucket's partition
    * directory (the same pattern [[IvfIndex.save]] gives IVF).
    */
  def buildLshIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int,
      dims: Int): LshIndex =
    LshIndex(
      df.select(
        col(idCol),
        col(vecCol).cast("array<double>").as("v"),
        lshBucket(col(vecCol).cast("array<double>"), planes, dims).as("bucket")),
      planes, dims)

  private val MetaFile = "_lsh_meta.json"

  /** Persist an LSH index partitioned by bucket: a search's bucket filter
    * becomes partition pruning — at 100 TB a top-k reads ~1/2^planes of the
    * corpus from ONE partition directory instead of re-hashing every vector
    * per query. The hash geometry rides along as `_lsh_meta.json` so a
    * later load validates queries against it.
    */
  def saveLshIndex(index: LshIndex, path: String): Unit = {
    index.relation.write.mode("overwrite").partitionBy("bucket").parquet(path)
    MetaJson.write(index.relation.sparkSession, path, MetaFile,
      Seq("planes" -> index.planes.toLong, "dims" -> index.dims.toLong))
  }

  def loadLshIndex(spark: org.apache.spark.sql.SparkSession, path: String): LshIndex = {
    val f = MetaJson.readFields(spark, path, MetaFile,
      Seq("planes", "dims"), "an index written by saveLshIndex")
    LshIndex(spark.read.parquet(path), f("planes"), f("dims"))
  }

  /** Incrementally extend a PERSISTED LSH index: hash the new vectors with
    * the index's OWN persisted geometry (planes/dims from `_lsh_meta.json`
    * — never the caller's idea of them) and append to the bucket-partitioned
    * table. Hyperplanes are md5-derived plan-time constants, so appended
    * rows land in exactly the buckets a full rebuild would give them —
    * existing files untouched, the [[IvfIndex.append]] twin.
    */
  def appendLshIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      newVectors: DataFrame,
      idCol: String,
      vecCol: String): Unit = {
    val f = MetaJson.readFields(spark, path, MetaFile,
      Seq("planes", "dims"), "an index written by saveLshIndex")
    buildLshIndex(newVectors, idCol, vecCol, f("planes"), f("dims"))
      .relation.write.mode("append").partitionBy("bucket").parquet(path)
  }

  /** Driver-side twin of [[lshBucket]] for a literal query vector — same
    * left-to-right multiply-add order, so the bucket id is bit-identical to
    * the column expression's.
    */
  def lshBucketOf(query: Seq[Double], planes: Int): Long = {
    val comps = planeComponents(planes, query.length)
    (0 until planes).map { p =>
      var proj = 0.0
      var d = 0
      while (d < query.length) { proj += query(d) * comps(p)(d); d += 1 }
      if (proj > 0.0) 1L << p else 0L
    }.sum
  }

  /** Top-k over a prebuilt/persisted LSH index: only the query's bucket is
    * read (partition-pruned when the index came from [[loadLshIndex]]),
    * then exact cosine within it. The query must match the index's recorded
    * dimensionality — hashing a wrong-length query would probe a wrong
    * bucket, not error.
    */
  def lshTopKIndexed(
      index: LshIndex,
      idCol: String,
      query: Seq[Double],
      k: Int): DataFrame = {
    require(query.length == index.dims,
      s"query has ${query.length} dims but the index was built with ${index.dims}")
    val q = array(query.map(lit): _*)
    index.relation
      .filter(col("bucket") === lshBucketOf(query, index.planes))
      .select(col(idCol), graft.Functions.roundHalfUp(cosine(col("v"), q), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Multi-probe top-k (Lv et al., VLDB 2007): probe the query's own bucket
    * PLUS the `extraProbes` buckets reached by flipping the sign bits whose
    * hyperplane projections are closest to zero — exactly the planes where
    * a true neighbor most plausibly landed on the other side. Recovers most
    * of the recall a single-bucket probe loses without touching more than
    * `extraProbes + 1` of the 2^planes buckets; over a persisted index each
    * probe is one pruned partition directory, so cost scales with probes,
    * never corpus.
    *
    * The probe ORDER derives from the query alone (driver-side projections
    * against the literal plane matrix — `planes × dims` multiply-adds), so
    * the probe set is deterministic and engine-independent.
    */
  def lshTopKMultiProbe(
      index: LshIndex,
      idCol: String,
      query: Seq[Double],
      k: Int,
      extraProbes: Int): DataFrame = {
    require(query.length == index.dims,
      s"query has ${query.length} dims but the index was built with ${index.dims}")
    require(extraProbes >= 0 && extraProbes <= index.planes,
      s"extraProbes must be in [0, ${index.planes}]")
    val comps = planeComponents(index.planes, index.dims)
    val projections = (0 until index.planes).map { p =>
      var proj = 0.0
      var d = 0
      while (d < query.length) { proj += query(d) * comps(p)(d); d += 1 }
      proj
    }
    val own = lshBucketOf(query, index.planes)
    val flips = projections.zipWithIndex
      .sortBy { case (proj, p) => (math.abs(proj), p) } // boundary-closest first
      .take(extraProbes)
      .map { case (_, p) => own ^ (1L << p) }
    val probes = own +: flips
    val q = array(query.map(lit): _*)
    index.relation
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol), graft.Functions.roundHalfUp(cosine(col("v"), q), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Approximate top-k: scan only vectors whose LSH bucket equals the
    * query's bucket, then exact cosine within the bucket. One-shot form of
    * [[lshTopKIndexed]] that hashes the corpus inline.
    */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      planes: Int = 8): DataFrame =
    lshTopKIndexed(
      buildLshIndex(df, idCol, vecCol, planes, query.length),
      idCol, query, k)

  /** All-pairs top-k within blocking keys (k nearest neighbors per id among
    * rows sharing `blockCol`), via window ranking — the IVF-style "probe one
    * cell" pattern.
    */
  /** Exact hard-negative mining for contrastive training: for every anchor,
    * the `k` most-cosine-similar vectors carrying a DIFFERENT label — the
    * "hard negatives" a contrastive or embedding-finetune pipeline pairs
    * with each anchor. Quadratic by construction (a label-mismatch theta
    * join): this is the exact baseline [[hardNegativesLsh]] is oracled
    * against, the q_ann_brute relationship — never the scale path itself.
    */
  def hardNegatives(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    val base = df.select(
      col(idCol).as("id"),
      col(labelCol).as("lbl"),
      col(vecCol).cast("array<double>").as("v"))
    val a = base.alias("a")
    val b = base.alias("b")
    val scored = a
      .join(b, col("a.lbl") =!= col("b.lbl"))
      .select(
        col("a.id").as("id"),
        col("b.id").as("negative"),
        graft.Functions.roundHalfUp(cosine(col("a.v"), col("b.v")), 6).as("cos"))
    val w = Window.partitionBy("id").orderBy(col("cos").desc, col("negative"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
    * Parallel Corpus Mining with Multilingual Sentence Embeddings" — the
    * LASER/CCMatrix recipe): score every (src, tgt) candidate by the RATIO
    * margin
    *
    *   margin(x, y) = cos(x, y) /
    *     ( Σ_{z ∈ NN_k(x, tgt)} cos(x, z) / 2k + Σ_{z ∈ NN_k(y, src)} cos(y, z) / 2k )
    *
    * — raw cosine normalized by both endpoints' neighborhood density, which
    * kills the hubness failure mode (a "central" sentence that is everyone's
    * nearest neighbor without translating anything). A pair is mined when it
    * is its source row's best margin (and, with `mutual = true`, also its
    * target row's best — the "intersection" strategy) and the margin clears
    * `threshold` (≈ 1.06 in the paper's tuning).
    *
    * Determinism: cosines quantize to integer MICRO units up front
    * (`floor(cos·10⁶ + 0.5)` as LONG), so both neighborhood sums are exact
    * integer sums (order-free under any partitioning) and the margin is ONE
    * double division of exact integers — `margin = cosµ · 2k / (aµ + bµ)` —
    * rounded half-up 6. Fewer than k available neighbors still divide by 2k
    * (the paper's fixed-k convention); a zero denominator yields no pair.
    * Ties break on the partner id ascending, both directions.
    *
    * Scale shape: this EXACT form scores the full src×tgt candidate cross
    * (one side broadcast) — right for a bounded mining shard. At corpus
    * scale, restrict candidates first ([[lshTopK]] buckets or an
    * [[graft.ops.IvfIndex]] probe, exactly the [[hardNegativesLsh]]
    * discipline) and feed the shard through this scorer; the margin
    * arithmetic (keyed windows + keyed joins, never a re-cross) is
    * already shuffle-bounded by the candidate count.
    */
  def marginMine(
      src: DataFrame, srcIdCol: String, srcVecCol: String,
      tgt: DataFrame, tgtIdCol: String, tgtVecCol: String,
      k: Int,
      threshold: Double,
      mutual: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val s = src.select(col(srcIdCol).cast("long").as("src_id"),
      col(srcVecCol).cast("array<double>").as("_sv"))
    val t = tgt.select(col(tgtIdCol).cast("long").as("tgt_id"),
      col(tgtVecCol).cast("array<double>").as("_tv"))
    val scored = s.crossJoin(broadcast(t))
      .select(col("src_id"), col("tgt_id"),
        floor(cosine(col("_sv"), col("_tv")) * 1e6 + lit(0.5)).cast("long").as("_cmu"))
      .localCheckpoint(true) // pin: windows + two sum branches reuse one scoring
    marginFromScored(scored, k, threshold, mutual)
  }

  /** The margin machinery both mining forms share: takes the quantized
    * pair scores `(src_id, tgt_id, _cmu)` (already pinned), computes both
    * neighborhood top-k sums OVER THOSE PAIRS, margins, best-per-side, and
    * the threshold. Keyed windows + keyed joins only — cost is bounded by
    * the scored-pair count, never |src|·|tgt|.
    */
  private def marginFromScored(
      scored: DataFrame, k: Int, threshold: Double, mutual: Boolean): DataFrame = {
    val wS = Window.partitionBy(col("src_id")).orderBy(col("_cmu").desc, col("tgt_id"))
    val wT = Window.partitionBy(col("tgt_id")).orderBy(col("_cmu").desc, col("src_id"))
    val aSum = scored.withColumn("_r", row_number().over(wS)).filter(col("_r") <= k)
      .groupBy(col("src_id")).agg(sum(col("_cmu")).as("_amu"))
    val bSum = scored.withColumn("_r", row_number().over(wT)).filter(col("_r") <= k)
      .groupBy(col("tgt_id")).agg(sum(col("_cmu")).as("_bmu"))
    val margins = scored
      .join(aSum, Seq("src_id"))
      .join(bSum, Seq("tgt_id"))
      .filter(col("_amu") + col("_bmu") =!= 0L)
      .select(col("src_id"), col("tgt_id"), col("_cmu"),
        graft.Functions.roundHalfUp(
          col("_cmu").cast("double") * lit(2.0 * k) /
            (col("_amu") + col("_bmu")).cast("double"), 6).as("margin"))
    val wMs = Window.partitionBy(col("src_id")).orderBy(col("margin").desc, col("tgt_id"))
    val fwd = margins.withColumn("_rs", row_number().over(wMs)).filter(col("_rs") === 1)
      .drop("_rs")
    val best =
      if (!mutual) fwd
      else {
        val wMt = Window.partitionBy(col("tgt_id")).orderBy(col("margin").desc, col("src_id"))
        val bwd = margins.withColumn("_rt", row_number().over(wMt)).filter(col("_rt") === 1)
          .select(col("src_id"), col("tgt_id"))
        fwd.join(bwd, Seq("src_id", "tgt_id"))
      }
    best
      .filter(col("margin") >= threshold)
      .select(col("src_id"), col("tgt_id"),
        (col("_cmu").cast("double") / 1e6).as("cos"), col("margin"))
  }

  /** The scale path of [[marginMine]]: score ONLY the supplied candidate
    * pairs — the CCMatrix-scale form, where an LSH bucket join or an IVF
    * probe bounds the pair volume and the margin machinery never sees a
    * cross. Candidate-set semantics (pinned by its own oracle): both
    * neighborhood top-k sums in the margin denominator are computed WITHIN
    * the candidate set — each endpoint's density estimate comes from the
    * neighbors retrieval actually surfaced, exactly what a FAISS-sharded
    * LASER pipeline computes. When the candidates happen to be the full
    * cross, this is [[marginMine]] exactly (AnnSpec pins the equivalence —
    * the 100%-recall fixture).
    *
    * Plan shape: `candidates` ⋈ src ⋈ tgt on their id keys (hash joins,
    * never a cartesian — spec-pinned), then the shared keyed-window margin
    * tail. Cost tracks |candidates|, not |src|·|tgt|.
    *
    * `candidates` needs columns `candSrcCol`, `candTgtCol`; duplicates are
    * collapsed (a pair surfacing from several buckets/probes scores once);
    * pairs referencing unknown ids drop (inner joins).
    */
  def marginMineWithCandidates(
      src: DataFrame, srcIdCol: String, srcVecCol: String,
      tgt: DataFrame, tgtIdCol: String, tgtVecCol: String,
      candidates: DataFrame, candSrcCol: String, candTgtCol: String,
      k: Int,
      threshold: Double,
      mutual: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val s = src.select(col(srcIdCol).cast("long").as("src_id"),
      col(srcVecCol).cast("array<double>").as("_sv"))
    val t = tgt.select(col(tgtIdCol).cast("long").as("tgt_id"),
      col(tgtVecCol).cast("array<double>").as("_tv"))
    val cand = candidates.select(
      col(candSrcCol).cast("long").as("src_id"),
      col(candTgtCol).cast("long").as("tgt_id")).distinct()
    val scored = cand
      .join(s, Seq("src_id"))
      .join(t, Seq("tgt_id"))
      .select(col("src_id"), col("tgt_id"),
        floor(cosine(col("_sv"), col("_tv")) * 1e6 + lit(0.5)).cast("long").as("_cmu"))
      .localCheckpoint(true) // pin: windows + two sum branches reuse one scoring
    marginFromScored(scored, k, threshold, mutual)
  }

  /** [[marginMineWithCandidates]] over the engine's own LSH geometry:
    * candidates are same-bucket (src, tgt) pairs under `planes` md5
    * hyperplanes — a KEYED equi-join on `bucket`, the [[hardNegativesLsh]]
    * discipline applied to mining. Deterministic geometry means even this
    * approximate path replays in SQL (full oracle, not rows-only).
    * `planes = 0` puts everything in one bucket == the exact
    * [[marginMine]], the equivalence AnnSpec pins.
    */
  def marginMineLsh(
      src: DataFrame, srcIdCol: String, srcVecCol: String,
      tgt: DataFrame, tgtIdCol: String, tgtVecCol: String,
      k: Int,
      threshold: Double,
      planes: Int,
      dims: Int,
      mutual: Boolean = true): DataFrame = {
    val sb = src.select(col(srcIdCol).cast("long").as("src_id"),
      lshBucket(col(srcVecCol).cast("array<double>"), planes, dims).as("bucket"))
    val tb = tgt.select(col(tgtIdCol).cast("long").as("tgt_id"),
      lshBucket(col(tgtVecCol).cast("array<double>"), planes, dims).as("bucket"))
    val cand = sb.join(tb.hint("SHUFFLE_HASH"), Seq("bucket"))
      .select(col("src_id"), col("tgt_id"))
    marginMineWithCandidates(
      src, srcIdCol, srcVecCol, tgt, tgtIdCol, tgtVecCol,
      cand, "src_id", "tgt_id", k, threshold, mutual)
  }

  /** [[marginMineWithCandidates]] over an IVF partition of the target
    * side — the other candidate geometry (centroid cells instead of
    * hyperplane buckets): the index is built on the TARGET corpus (the
    * retrieval side, as a CCMatrix pipeline indexes the big language),
    * each source row probes its `nProbe` nearest cells, and candidates
    * are the keyed cell join. `nCells = 1` puts everything in one cell ==
    * the exact [[marginMine]] (AnnSpec pins it). Deterministic centroid
    * sampling (md5 over ids) keeps the candidate set reproducible.
    */
  def marginMineIvf(
      src: DataFrame, srcIdCol: String, srcVecCol: String,
      tgt: DataFrame, tgtIdCol: String, tgtVecCol: String,
      k: Int,
      threshold: Double,
      nCells: Int,
      nProbe: Int,
      mutual: Boolean = true): DataFrame = {
    val index = IvfIndex.build(tgt, tgtIdCol, tgtVecCol, nCells)
    val tb = index.assignments
      .select(col(tgtIdCol).cast("long").as("tgt_id"), col("cell"))
    val sb = IvfIndex.assignProbes(index, src, srcIdCol, srcVecCol, nProbe)
      .select(col(srcIdCol).cast("long").as("src_id"), col("cell"))
    val cand = sb.join(tb.hint("SHUFFLE_HASH"), Seq("cell"))
      .select(col("src_id"), col("tgt_id"))
    marginMineWithCandidates(
      src, srcIdCol, srcVecCol, tgt, tgtIdCol, tgtVecCol,
      cand, "src_id", "tgt_id", k, threshold, mutual)
  }

  /** The scale path of [[hardNegatives]]: candidates are restricted to the
    * anchor's LSH bucket, turning the label-mismatch cross into a KEYED
    * equi-join on `bucket` (the [[lshTopK]] pruning applied to mining).
    * Deterministic md5 geometry means the result — including which
    * candidates were considered — is reproducible in SQL, so this
    * approximate path gets a FULL oracle (q_ann_negatives_lsh), not a
    * rows-only check; its recall versus the exact baseline is what the
    * spec measures. `planes = 0` degenerates to one bucket == the exact
    * form, the equivalence AnnSpec pins.
    */
  def hardNegativesLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      planes: Int,
      dims: Int): DataFrame = {
    val base = df.select(
      col(idCol).as("id"),
      col(labelCol).as("lbl"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes, dims))
    val a = base.alias("a")
    val b = base.hint("SHUFFLE_HASH").alias("b")
    val scored = a
      .join(b, col("a.bucket") === col("b.bucket") && col("a.lbl") =!= col("b.lbl"))
      .select(
        col("a.id").as("id"),
        col("b.id").as("negative"),
        graft.Functions.roundHalfUp(cosine(col("a.v"), col("b.v")), 6).as("cos"))
    val w = Window.partitionBy("id").orderBy(col("cos").desc, col("negative"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
  }

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

  /** Retrieval-quality evaluation: recall@k of an approximate result list
    * against the exact baseline — |approx ∩ exact| / |exact| on the id
    * column. One row out: `(k, hits, recall)` (recall half-up 6). The
    * standard acceptance gate for an ANN index build: compute exact top-k
    * on a sampled query set, compare the index answers, alarm under a
    * floor. Joins are id-keyed over two ≤k-row relations — evaluation
    * cost is bounded by k, never the corpus.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, idCol: String): DataFrame = {
    val a = approx.select(col(idCol).cast("long").as("_id")).distinct()
    val e = exact.select(col(idCol).cast("long").as("_id")).distinct()
    val hits = e.join(a, Seq("_id"), "left_semi").agg(count(lit(1)).as("hits"))
    e.agg(count(lit(1)).as("k"))
      .crossJoin(broadcast(hits))
      .select(
        col("k"), col("hits"),
        graft.Functions.roundHalfUp(
          col("hits").cast("double") / col("k").cast("double"), 6).as("recall"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    * greedily pick `k` of the top-`candidates` cosine hits, each step
    * maximizing
    *
    *   score(i) = λ·rel(i) − (1−λ)·max_{j∈selected} sim(i, j)
    *
    * — relevance traded against redundancy, the standard last-mile
    * diversifier after ANN retrieval. Scores are integer micro-units
    * (λ as a percentage, cosines floor(x·10⁶+0.5)-quantized), so every
    * argmax is exact, ties break on ascending id, and the WHOLE greedy
    * loop is replayable in SQL (oracle q_ann_mmr unrolls the k steps as
    * correlated-subquery CTEs).
    *
    * Scale shape: candidate selection is the one corpus-touching step —
    * and the ONLY Spark job (distributed take-ordered, the
    * [[bruteForceTopK]] cost). The pool is bounded by construction
    * (≤ `candidates` rows), so it collects ONCE and the greedy loop runs
    * driver-side — O(k · candidates · dim) scalar work that was never
    * distributed-shaped to begin with (each candidate carries a running
    * max-penalty, refreshed against only the newly selected vector — max
    * is monotone, so this equals the rescan-all form exactly). The
    * previous form ran k sequential
    * `limit(1)` jobs over a localCheckpoint'ed pool; same answers, k×
    * the job-scheduling latency. Driver cosines replicate the
    * [[cosine]] expression's IEEE op sequence exactly (in-order
    * multiply-add folds, `Math.sqrt`, one divide, zero-norm → 0) — the
    * micro-unit scores, and therefore the oracle replay, are unchanged.
    *
    * Output: `(rank, id, rel_u, mmr_u)` — rank 1-based selection order.
    */
  def mmrRerank(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      candidates: Int = 30,
      k: Int = 10,
      lambdaPct: Int = 70): DataFrame = {
    require(k >= 1 && candidates >= k, s"need candidates >= k >= 1, got $candidates/$k")
    require(lambdaPct >= 0 && lambdaPct <= 100, s"lambdaPct in [0,100], got $lambdaPct")
    val spark = df.sparkSession
    val qv = array(query.map(lit): _*)
    // the ONE Spark job: distributed take-ordered of the top candidates
    val pool: Array[(Long, Array[Double], Long)] = df
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .filter(col("id").isNotNull && col("v").isNotNull)
      .select(col("id"), col("v"),
        floor(cosine(col("v"), qv) * 1e6 + 0.5).cast("long").as("rel_u"))
      // the [[cosine]] expression answers NULL for a vector whose length
      // differs from the query's or that carries null elements — such a row
      // has no defined relevance and CANNOT be a candidate. Dropping the
      // NULLs here (they used to ride at the tail of the desc sort and could
      // enter an underfilled pool) is also what makes the driver-side `cos`
      // twin below total: every surviving vector has exactly query-length
      // null-free doubles, so every pool PAIR is equal-length too and the
      // twin never meets the ragged case the engine answers with NULL.
      .filter(col("rel_u").isNotNull)
      .orderBy(col("rel_u").desc, col("id"))
      .limit(candidates)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))

    // bit-exact driver twin of the codegen'd cosine for the EQUAL-LENGTH
    // null-free vectors the pool filter guarantees: in-order multiply-add
    // folds, Math.sqrt norms, zero-norm → 0, one divide
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val sna = math.sqrt(na); val snb = math.sqrt(nb)
      if (sna == 0.0 || snb == 0.0) 0.0 else dot / (sna * snb)
    }
    def simU(a: Array[Double], b: Array[Double]): Long =
      math.floor(cos(a, b) * 1e6 + 0.5).toLong

    var selected = Vector.empty[(Long, Array[Double], Long, Long)]
    val n = pool.length
    val taken = new Array[Boolean](n)
    // running max-penalty per candidate, updated with ONLY the newly
    // selected vector each step — max is monotone, so this is result-
    // identical to re-scanning all selected vectors while cutting the
    // greedy loop from O(k²·candidates·dim) to O(k·candidates·dim)
    val maxPen = Array.fill(n)(Long.MinValue)
    var step = 0
    // a corpus smaller than k exhausts the pool — return what exists
    while (step < k && selected.length < n) {
      var best = -1; var bestId = Long.MinValue; var bestScore = Long.MinValue
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val (id, _, relU) = pool(i)
          val penalty = if (selected.isEmpty) 0L else maxPen(i)
          val score = lambdaPct.toLong * relU - (100L - lambdaPct) * penalty
          if (best < 0 || score > bestScore || (score == bestScore && id < bestId)) {
            best = i; bestId = id; bestScore = score
          }
        }
        i += 1
      }
      val (bid, bv, brel) = pool(best)
      selected = selected :+ ((bid, bv, brel, bestScore))
      taken(best) = true
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val s = simU(pool(j)._2, bv)
          if (s > maxPen(j)) maxPen(j) = s
        }
        j += 1
      }
      step += 1
    }
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((id, _, rel, score), i) => (i + 1L, id, rel, score) }
      .toDF("rank", idCol, "rel_u", "mmr_u")
  }

  /** Farthest-point / k-center greedy coreset selection (Gonzalez 1985's
    * 2-approximation; the diversity-coreset selector of Sener & Savarese
    * 2018): seed with the pool's minimum id, then repeatedly add the
    * candidate whose nearest already-selected center is FARTHEST — in
    * cosine terms, the candidate minimizing max-similarity-to-selected.
    * The query-free counterpart of [[mmrRerank]]: MMR diversifies a
    * retrieval, k-center covers a corpus — the "pick k maximally-spread
    * exemplars" step of coreset data selection and annotation budgeting.
    *
    * Same exactness and scale contract as [[mmrRerank]]: similarities are
    * floor(cos·10⁶+0.5) integer micro-units so every argmin is exact and
    * the whole loop replays in SQL (oracle q_ann_kcenter unrolls the k
    * steps); the pool is bounded by construction (`candidates` lowest ids
    * — at corpus scale callers pass cluster representatives, e.g.
    * [[IvfIndex]] centroid-nearest members, exactly as SemDeDup bounds its
    * quadratic step), collected in ONE distributed job; the greedy loop is
    * driver-side O(k · candidates · dim) with a running nearest-center
    * similarity per candidate (min-dist is a running MAX of similarity —
    * monotone, so updating against only the newly added center is
    * result-identical to rescanning all centers).
    *
    * Output: `(rank, id, near_u)` — rank 1-based selection order, `near_u`
    * the micro-unit similarity to the nearest center at selection time
    * (NULL for the seed row).
    */
  def kCenterGreedy(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      candidates: Int = 64): DataFrame = {
    require(k >= 1 && candidates >= k, s"need candidates >= k >= 1, got $candidates/$k")
    val spark = df.sparkSession
    val pool: Array[(Long, Array[Double])] = df
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .filter(col("id").isNotNull && col("v").isNotNull)
      .orderBy(col("id"))
      .limit(candidates)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

    // driver twin of the codegen'd cosine (the [[mmrRerank]] contract):
    // in-order multiply-add folds, Math.sqrt norms, zero-norm → 0
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val sna = math.sqrt(na); val snb = math.sqrt(nb)
      if (sna == 0.0 || snb == 0.0) 0.0 else dot / (sna * snb)
    }
    def simU(a: Array[Double], b: Array[Double]): Long =
      math.floor(cos(a, b) * 1e6 + 0.5).toLong

    val n = pool.length
    val taken = new Array[Boolean](n)
    // nearest-center similarity per candidate: running MAX, refreshed
    // against only the newly selected center each step
    val nearSim = Array.fill(n)(Long.MinValue)
    var selected = Vector.empty[(Long, Array[Double], Option[Long])]
    var step = 0
    while (step < k && selected.length < n) {
      var best = -1; var bestId = Long.MaxValue; var bestNear = Long.MaxValue
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val id = pool(i)._1
          if (selected.isEmpty) {
            // seed: minimum id
            if (best < 0 || id < bestId) { best = i; bestId = id }
          } else {
            val nearU = nearSim(i)
            if (best < 0 || nearU < bestNear || (nearU == bestNear && id < bestId)) {
              best = i; bestId = id; bestNear = nearU
            }
          }
        }
        i += 1
      }
      val (bid, bv) = pool(best)
      selected = selected :+ ((bid, bv, Option.when(step > 0)(bestNear)))
      taken(best) = true
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val s = simU(pool(j)._2, bv)
          if (s > nearSim(j)) nearSim(j) = s
        }
        j += 1
      }
      step += 1
    }
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((id, _, near), i) => (i + 1L, id, near) }
      .toDF("rank", idCol, "near_u")
  }
}
