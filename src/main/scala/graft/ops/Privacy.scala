package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy gating for training corpora: k-anonymity suppression (Sweeney
  * 2002) and l-diversity (Machanavajjhala et al. 2007) over configurable
  * quasi-identifier columns — the governance pass a pipeline runs after
  * [[TextAnalysis.scrub]]'s pattern-level PII removal: scrubbing hides
  * direct identifiers, but a row can still be re-identified when its
  * quasi-identifier combination is rare (k) or its group's sensitive
  * values are uniform (l).
  *
  * Reference analog: the reference drops device rows that fail its
  * published whitelist before the public CSV publish
  * (`/root/reference/atd_data_lake/publish.py:36-88`); these gates are
  * that publish-side suppression driven by group cardinality instead of a
  * static list.
  *
  * Scale shape: each gate is ONE hash aggregation on the quasi-identifier
  * tuple plus one keyed join back to the rows (same exchange key, so AQE
  * plans a co-partitioned join) — group counts are map-side partial, the
  * shuffle carries one row per group plus the fact rows once. No windows,
  * no driver state; NULL quasi-values form their own group (SQL GROUP BY
  * semantics in both engines), which is the conservative choice — an
  * all-NULL combination is itself a quasi-identifier.
  */
object Privacy {

  /** Per-row k-anonymity decision: `(input columns…, group_n, suppress)` —
    * `suppress = true` iff the row's quasi-identifier combination occurs
    * fewer than `k` times. Publishing only `suppress = false` rows yields
    * a k-anonymous release with respect to `quasiCols`.
    */
  /** Null-safe equi-join back to the group stats: `<=>` on every quasi
    * column, so NULL-valued combinations (their own group under GROUP BY)
    * keep their rows instead of falling out of a plain equi-join.
    */
  private def joinStats(
      df: DataFrame, stats: DataFrame, quasiCols: Seq[String]): DataFrame = {
    val statsR = quasiCols.foldLeft(stats)((d, c) => d.withColumnRenamed(c, s"_q_$c"))
    val cond = quasiCols.map(c => col(c) <=> col(s"_q_$c")).reduce(_ && _)
    df.join(statsR, cond).drop(quasiCols.map(c => s"_q_$c"): _*)
  }

  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k below 2 suppresses nothing, got $k")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
    joinStats(df, counts, quasiCols)
      .withColumn("suppress", col("group_n") < k)
  }

  /** Per-group l-diversity report: quasi-identifier values, group size,
    * the number of DISTINCT sensitive values, and `diverse = n_sensitive
    * >= l`. A group failing the check lets an attacker who knows a
    * member's quasi-identifiers infer its sensitive value (or narrow it
    * to < l candidates). NULL sensitive values don't count toward
    * diversity (count_distinct skips NULLs in both engines — a NULL
    * reveals nothing, so it cannot *provide* cover either).
    */
  def lDiversity(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l below 2 accepts uniform groups, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /** The composed release gate: a row survives iff its group passes BOTH
    * k-anonymity and l-diversity. One aggregation computes both group
    * statistics (same exchange), one keyed join applies them. Output:
    * input rows + `(group_n, n_sensitive, keep)`.
    */
  def releaseGate(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      k: Long,
      l: Long): DataFrame = {
    require(k >= 2 && l >= 2, s"k and l must both be >= 2, got k=$k l=$l")
    val stats = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
    joinStats(df, stats, quasiCols)
      .withColumn("keep", col("group_n") >= k && col("n_sensitive") >= l)
  }

  /** Numeric generalization helper: coarsen a numeric quasi-identifier to
    * its bucket floor (`floor(x / width) * width`) — the standard move to
    * ENLARGE groups until they pass the k gate. NULL stays NULL.
    */
  def generalize(c: Column, width: Double): Column = {
    require(width > 0.0, s"bucket width must be positive, got $width")
    floor(c.cast("double") / width) * width
  }
}
