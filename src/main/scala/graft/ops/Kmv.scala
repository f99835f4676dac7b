package graft.ops

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Functions

/** KMV / bottom-k distinct-count sketch (Bar-Yossef et al. 2002; Beyer et
  * al. SIGMOD'07 for the multi-set union form): estimate per-group distinct
  * cardinality from the `k` smallest distinct hash values — the fourth
  * bounded-memory counting primitive, completing the family: exact
  * `count_distinct` (unbounded state), Misra-Gries ([[HeavyHitters]] —
  * top-k frequencies), Count-Min ([[CountMin]] — all frequencies,
  * approximate), and KMV — distinct CARDINALITY at bounded state.
  *
  * Unlike `approx_count_distinct` (HyperLogLog++, whose register values an
  * external engine cannot reproduce — the reason q_x_approx_distinct now
  * runs [[Hll.estimateByGroup]] instead), every byte of a KMV sketch is
  * md5-derived and therefore
  * recomputable by the DuckDB oracle: the sketch itself AND the estimates
  * are hash-exact (q_kmv_sketch / q_kmv_estimate).
  *
  * Scale shape: a per-partition bounded heap (≤ groups-per-partition × k
  * longs of task state, the [[HeavyHitters]] pattern) emits ≤ partitions × k
  * candidate rows per group; the final bottom-k selection sorts only that
  * bounded candidate set. Two sketches with the same (k, salt) geometry
  * merge by taking the bottom-k of their union — merge(sketch(A), sketch(B))
  * equals sketch(A ∪ B) EXACTLY, not approximately, because the global
  * bottom-k of distinct hashes is a function of the per-shard bottom-ks.
  * So per-day sketches roll up into per-month distinct estimates without
  * re-reading the corpora.
  *
  * The estimator is the standard unbiased form: with U_(k) the k-th
  * smallest of n distinct uniform hashes, E[(k−1)/U_(k)] = n; below k
  * distinct values the sketch holds EVERY distinct hash and the answer is
  * exact. Hashes are the top 60 md5 bits ([[Functions.md5Bits]]) normalized
  * against 2^60.
  *
  * Reference analog: none (training-data extension; the reference counts
  * distincts exactly in pandas at MB scale).
  */
object Kmv {

  private val Pow2_60 = 1152921504606846976.0 // 2^60, exactly representable

  /** 60-bit md5 hash for an item — the value space the estimator divides
    * against. Salted so independent sketches over the same column exist.
    */
  private[ops] def hashFor(item: Column, salt: String): Column =
    Functions.md5Bits(concat(lit(s"$salt:"), item), 60)

  /** Per-partition bottom-k distinct hashes per group: bounded task state
    * (a ≤k-element ordered set per group seen by the task), candidate
    * output ≤ partitions × k rows per group — a SUPERSET of the global
    * bottom-k, which the final selection reduces exactly.
    */
  private def candidates(pairs: DataFrame, k: Int): DataFrame = {
    import pairs.sparkSession.implicits._
    pairs
      .as[(String, Long)]
      .mapPartitions { it =>
        val heaps = mutable.HashMap.empty[String, java.util.TreeSet[java.lang.Long]]
        it.foreach { case (g, h) =>
          val s = heaps.getOrElseUpdate(g, new java.util.TreeSet[java.lang.Long]())
          s.add(h)
          if (s.size > k) s.remove(s.last)
        }
        heaps.iterator.flatMap { case (g, s) =>
          s.iterator().asScala.map(h => (g, h.longValue))
        }
      }
      .toDF("g", "h")
      .distinct()
  }

  /** Build the sketch: for each non-null value of `groupCol`, the `k`
    * smallest distinct hashes of the non-null values of `itemCol` —
    * `(groupCol, pos, h)` with `pos` 1-based ascending. NULL groups and
    * NULL items are excluded (they can't hash and a NULL group would
    * silently pool unrelated items, the [[HeavyHitters.frequent]] rule).
    *
    * TYPE CONTRACT: the returned `groupCol` is STRING regardless of the
    * input type (the typed bounded-heap pass keys on the string form, and
    * the merge/estimate path stays type-stable across sketches from
    * different sources). Cast back before equi-joining against the source
    * table's native key type.
    */
  def sketch(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      k: Int,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val pairs = df
      .filter(col(groupCol).isNotNull && col(itemCol).isNotNull)
      .select(
        col(groupCol).cast("string").as("g"),
        hashFor(col(itemCol).cast("string"), salt).as("h"))
    bottomK(candidates(pairs, k), k)
      .withColumnRenamed("g", groupCol)
  }

  /** Bottom-k per group over an already-bounded candidate relation. */
  private def bottomK(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("h"))
    cand
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= k)
      .select(col("g"), col("pos"), col("h"))
  }

  /** Merge sketches built with the SAME (k, salt) geometry: bottom-k of the
    * union — exactly `sketch(A ∪ B)`. Geometry agreement is the caller's
    * contract, as with [[CountMin.merge]].
    */
  def merge(a: DataFrame, b: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    bottomK(
      a.select(col(groupCol).as("g"), col("h"))
        .union(b.select(col(groupCol).as("g"), col("h")))
        .distinct(),
      k)
      .withColumnRenamed("g", groupCol)
  }

  /** Distinct-count estimates from a sketch: `(groupCol, est)`. A group
    * holding fewer than `k` hashes kept EVERY distinct hash, so its answer
    * is exact; otherwise est = ⌊(k−1) · 2^60 / h_k⌋ with h_k the k-th
    * smallest hash. Pure arithmetic over the ≤k-row-per-group sketch —
    * deterministic and oracle-recomputable.
    */
  def estimate(sk: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    sk.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_nc"), max(col("h")).as("_hk"))
      .select(
        col(groupCol),
        when(col("_nc") < k, col("_nc"))
          .otherwise(
            // h_k clamped to >= 1: an item whose 60-bit md5 prefix is 0
            // (2^-60 per distinct item, but adversarially constructible)
            // would otherwise divide by zero → Infinity → garbage long
            floor(lit((k - 1).toDouble) * lit(Pow2_60) /
                greatest(col("_hk"), lit(1L)).cast("double"))
              .cast("long"))
          .as("est"))
  }

  /** Sketch + estimate in one call — the self-audit form the oracle checks. */
  def estimateAll(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      k: Int,
      salt: String = "kmv"): DataFrame =
    estimate(sketch(df, groupCol, itemCol, k, salt), groupCol, k)

  /** Whitespace-token sketch over a text column, grouped — "distinct
    * vocabulary per language/source" at bounded memory. Same tokenization
    * as [[CountMin.sketch]] (trim, lower, split `\s+`, drop empties).
    */
  def sketchTokens(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      k: Int,
      salt: String = "kmv"): DataFrame =
    sketch(
      docs
        .filter(col(groupCol).isNotNull)
        .select(
          col(groupCol),
          explode(filter(Dedup.tokens(coalesce(col(textCol), lit(""))), t => t =!= ""))
            .as("_tok")),
      groupCol, "_tok", k, salt)

  /** Theta-sketch-style set algebra over two KMV sketches with the SAME
    * (k, salt) geometry: per group, bottom-k of the hash union is exactly
    * `sketch(A ∪ B)`, and the fraction of those union-sketch hashes that
    * appear in BOTH input sketches is the standard KMV Jaccard estimator.
    * Output per group:
    *
    *   - `n_merged` — union-sketch size (< k ⇒ the union was exhaustively
    *     sketched and everything below is exact);
    *   - `n_both` — union-sketch hashes present in both inputs;
    *   - `jaccard` — n_both / n_merged, half-up at 9 decimals;
    *   - `est_union` — [[estimate]] of the merged sketch;
    *   - `est_intersection` — ⌊jaccard · est_union⌋, the inclusion-
    *     exclusion-free intersection estimate.
    *
    * Every join is keyed on (group, h) over ≤k-row-per-group relations —
    * sketch-sized work regardless of corpus size. Groups present in only
    * one input get jaccard 0 (nothing can be in both).
    */
  def jaccardEstimate(a: DataFrame, b: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val ha = a.select(col(groupCol).as("g"), col("h"))
    val hb = b.select(col(groupCol).as("g"), col("h"))
    val merged = bottomK(ha.union(hb).distinct(), k)
    val both = ha.join(hb, Seq("g", "h"), "left_semi")
      .withColumn("_inBoth", lit(1L))
    val est = estimate(merged.withColumnRenamed("g", groupCol), groupCol, k)
      .withColumnRenamed(groupCol, "g")
      .withColumnRenamed("est", "est_union")
    merged
      .join(both, Seq("g", "h"), "left")
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n_merged"),
        sum(coalesce(col("_inBoth"), lit(0L))).as("n_both"))
      .join(est, Seq("g"))
      .select(
        col("g").as(groupCol),
        col("n_merged"),
        col("n_both"),
        graft.Functions.roundHalfUp(
          col("n_both").cast("double") / col("n_merged").cast("double"), 9)
          .as("jaccard"),
        col("est_union"),
        floor(col("n_both").cast("double") / col("n_merged").cast("double")
          * col("est_union").cast("double")).cast("long")
          .as("est_intersection"))
  }
}
