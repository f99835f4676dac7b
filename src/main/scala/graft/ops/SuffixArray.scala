package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix arrays by prefix doubling (Manber & Myers 1990) —
  * the index structure behind exact-substring deduplication at scale
  * (Lee et al. 2022 build one over the whole training corpus; the
  * engine's windowed [[Dedup.repeatedSpansExact]] is the hash-grain
  * variant, this is the exact-rank variant).
  *
  * Algorithm: one row per (document, position) carrying the current rank
  * of the suffix's leading `k` characters; each round widens k → 2k by
  * pairing every rank with the rank `k` positions ahead (`lead(k)` over
  * the position order — out-of-range pairs rank −1, which is exactly the
  * "shorter suffix sorts first" rule) and re-densifying. ⌈log₂ maxLen⌉
  * rounds; every round is one window pass + one rank pass, all integer —
  * deterministic under any partitioning, and the FINAL order is plain
  * lexicographic suffix order, which the oracle recomputes by sorting
  * `substr(text, pos+1)` directly (q_sa_ranks — algorithm and oracle are
  * fully independent).
  *
  * Scale shape: rows = total corpus characters; per round, state is
  * (id, pos, rank) triples — ~24 bytes/char — shuffled twice. Windows
  * partition on the document id, so documents parallelize freely;
  * a SINGLE multi-terabyte document would serialize its window (the
  * known limit of this form — the corpus-grain variant replaces the
  * per-doc window with a range-partitioned global sort + two-phase
  * offset ranking, the [[Sampling]] `pos` pattern). Rounds
  * `localCheckpoint` — the loop output feeds the next round's windows,
  * the [[ConnectedComponents]] lineage rule.
  *
  * Reference analog: none (training-data extension).
  */
object SuffixArray {

  /** Per-document suffix ranks: `(idCol, pos, sa_rank)` — `pos` 0-based
    * character position, `sa_rank` the 1-based position of that suffix in
    * the document's sorted suffix order. Empty/NULL documents emit
    * nothing.
    */
  def ranks(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        length(col(textCol)) > 0)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
    val maxLenRow = base.agg(max(length(col("t")))).head()
    val maxLen = if (maxLenRow.isNullAt(0)) 0 else maxLenRow.getInt(0)
    // seed at k = 128, not 1: the initial rank is a dense_rank over the
    // 128-char prefix STRING (binary UTF-8 order = code-point order, the
    // same order per-char ascii seeding induces; a suffix shorter than the
    // prefix sorts before its extensions, exactly the -1 sentinel rule) —
    // one window pass over wider sort keys replaces the first SEVEN
    // doubling rounds, each of which costs two window passes plus a
    // checkpoint materialization of every (id, pos, rank) row. Rounds =
    // max(0, ⌈log₂(maxLen/128)⌉); typical web docs finish in 2-4 rounds.
    val seedK = 128
    var rows = base
      .select(col("id"), explode(sequence(lit(0), length(col("t")) - 1)).as("pos"),
        col("t"))
      .select(col("id"), col("pos"),
        expr(s"substring(t, pos + 1, $seedK)").as("_pfx"))
      .withColumn("rank",
        dense_rank().over(Window.partitionBy(col("id")).orderBy(col("_pfx"))).cast("long"))
      .drop("_pfx")
      .localCheckpoint()
    var k = seedK
    while (k < maxLen) {
      val byPos = Window.partitionBy(col("id")).orderBy(col("pos"))
      val byRank = Window.partitionBy(col("id")).orderBy(col("rank"), col("r2"))
      rows = rows
        .withColumn("r2", coalesce(lead(col("rank"), k).over(byPos), lit(-1L)))
        .withColumn("rank", dense_rank().over(byRank).cast("long"))
        .drop("r2")
        .localCheckpoint()
      k *= 2
    }
    rows.select(col("id").as(idCol), col("pos").cast("long").as("pos"),
      col("rank").as("sa_rank"))
  }

  /** Corpus-grain suffix ranks: the SAME output contract as [[ranks]] —
    * `(idCol, pos, sa_rank)` per-document suffix order — but with ZERO
    * per-document windows anywhere in the plan, so one pathologically
    * large document parallelizes across the whole cluster instead of
    * serializing a single window partition (the documented limit of
    * [[ranks]]). This is the variant a Lee-et-al-grain exact-substring
    * dedup runs when documents can be books, logs, or concatenated
    * shards.
    *
    * Mechanics — every ranking step is a RANGE-PARTITIONED global sort
    * + two-phase offset ranking ([[globalDenseRank]]):
    *   1. seed: global dense rank over `(id, 128-char prefix)` — id
    *      leads the sort key, so each document's ranks form a contiguous
    *      integer block, disjoint across documents (the invariant the
    *      loop preserves);
    *   2. doubling round: the `lead(k)` window of [[ranks]] becomes a
    *      keyed SELF-JOIN on `(id, pos + k)` — unique keys, no skew —
    *      and re-densification is another global rank over `(rank, r2)`
    *      (id can drop from the key: ranks are already doc-disjoint);
    *   3. final: per-doc rank = `rank − min(rank) + 1` per document —
    *      exact because each doc's final ranks are CONSECUTIVE (dense
    *      rank over doc-contiguous, within-doc-distinct keys). The min
    *      table is one row per doc; the join back is id-keyed with AQE
    *      skew-split handling the giant doc's row block.
    *
    * Cost vs [[ranks]]: ~2× the exchanges per round (self-join + two
    * rank exchanges vs two window passes) — the price of skew immunity.
    * Rows carry only (id, pos, rank) + a transient ≤128-char prefix;
    * the document text itself is never shuffled. Rounds
    * `localCheckpoint` (lineage control, the [[ranks]] rule).
    *
    * Reference analog: none (training-data extension).
    */
  def ranksGlobal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        length(col(textCol)) > 0)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
    val maxLenRow = base.agg(max(length(col("t")))).head()
    val maxLen = if (maxLenRow.isNullAt(0)) 0 else maxLenRow.getInt(0)
    val seedK = 128
    var rows = base
      .select(col("id"), explode(sequence(lit(0), length(col("t")) - 1)).as("pos"),
        col("t"))
      .select(col("id"), col("pos").cast("long").as("pos"),
        expr(s"substring(t, pos + 1, $seedK)").as("_pfx"))
    // lineage/determinism control lives INSIDE globalDenseRank (its one
    // localCheckpoint per call); the thin broadcast-join tail above it is
    // deterministic to recompute, so no second materialization out here
    rows = globalDenseRank(rows, Seq(col("id"), col("_pfx")))
      .drop("_pfx")
    var k = seedK
    while (k < maxLen) {
      // the lead(k) of the windowed variant as a keyed SELF-JOIN: the
      // right side's keys are freshly-aliased attributes (rid, rpos), so
      // the self-join can never silently resolve both sides to the same
      // expression id
      val ahead = rows.select(col("id").as("rid"), (col("pos") - k).as("rpos"),
        col("rank").as("r2"))
      val paired = rows
        .join(ahead, col("id") === col("rid") && col("pos") === col("rpos"), "left")
        .select(col("id"), col("pos"), col("rank").as("_r1"),
          coalesce(col("r2"), lit(-1L)).as("r2"))
      rows = globalDenseRank(paired, Seq(col("_r1"), col("r2")))
        .drop("_r1", "r2")
      k *= 2
    }
    val mins = rows.groupBy(col("id")).agg(min(col("rank")).as("_m"))
    rows.join(mins, Seq("id"))
      .select(col("id").as(idCol), col("pos"),
        (col("rank") - col("_m") + 1L).as("sa_rank"))
  }

  /** Two-phase global dense rank over `keys` — the scalable replacement
    * for an unpartitioned `dense_rank().over(orderBy(keys))` (which moves
    * everything to ONE partition): range-partition on the keys (equal
    * keys land together — the RangePartitioner contract that makes local
    * dense ranks compose), rank WITHIN each partition, then add each
    * partition's distinct-key count as an offset via a ≤numPartitions-row
    * broadcast. Output: input columns + `rank` (1-based, dense, global).
    * Range bounds come from sampling, so PARTITION SIZES vary run to run
    * — rank VALUES never do (the composition is exact for any bounds).
    */
  private[graft] def globalDenseRank(df: DataFrame, keys: Seq[Column]): DataFrame = {
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    // materialized ONCE: both consumers below (the offsets aggregate and
    // the final join) must see the SAME partition ids — the range
    // partitioner's sampled bounds are not deterministic across separate
    // computations, so an unmaterialized plan could hand each branch a
    // different _pid assignment and misalign the offsets
    val local = df
      .repartitionByRange(nPart, keys: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lrank",
        dense_rank().over(Window.partitionBy(col("_pid")).orderBy(keys: _*)).cast("long"))
      .localCheckpoint()
    // per-partition distinct-key counts → cumulative offsets: a
    // ≤numPartitions-row table (the epochShuffle offsets pattern) — the
    // single-partition window is bounded by construction
    val offsets = local
      .groupBy(col("_pid")).agg(max(col("_lrank")).as("_cnt"))
      .withColumn("_off",
        coalesce(
          sum(col("_cnt")).over(
            Window.orderBy(col("_pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_pid"), col("_off"))
    local
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn("rank", col("_lrank") + col("_off"))
      .drop("_pid", "_lrank", "_off")
  }

  /** Longest repeated substring length per document: the max longest
    * common prefix between lexicographically ADJACENT suffixes — the
    * suffix-array identity that makes "longest duplicated span" a
    * rank-join instead of an all-pairs compare. LCP of an adjacent pair
    * is evaluated by a character-compare array expression over the two
    * positions (cost O(doc · avgLcp); the corpus-grain variant derives
    * LCPs from the doubling round ranks instead — ⌈log n⌉ slim joins —
    * when documents outgrow per-row arrays).
    *
    * Output: `(idCol, lrs_len, capped)` — `lrs_len` 0 for documents with
    * no repeat (and for single-character documents); empty/NULL docs emit
    * nothing. `maxLcp` caps the per-pair compare window (the bound that
    * keeps per-row arrays from going quadratic in doc length); `capped`
    * is true iff the reported length hit the cap with BOTH suffixes still
    * unexhausted — i.e. the true LRS is ≥ `maxLcp` and the report may
    * understate it. A downstream exact-substring gate escalates exactly
    * the `capped` docs to a higher cap instead of guessing whether
    * `lrs_len == maxLcp` meant "exactly maxLcp" or "at least maxLcp".
    */
  def longestRepeat(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxLcp: Int = 256): DataFrame = {
    require(maxLcp >= 1, s"maxLcp must be >= 1, got $maxLcp")
    val sa = ranks(df, idCol, textCol)
    val texts = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        length(col(textCol)) > 0)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
    val a = sa.select(col(idCol).as("id"), col("pos").as("i"), col("sa_rank"))
    val b = sa.select(col(idCol).as("id"), col("pos").as("j"),
      (col("sa_rank") - 1).as("sa_rank"))
    val pairs = a.join(b, Seq("id", "sa_rank")) // adjacent suffixes (i, j)
    // the shorter remainder — when it exceeds the cap, a full-window match
    // means the true LCP is ≥ maxLcp and the pair's report is TRUNCATED
    val shorter = least(length(col("t")) - col("i"), length(col("t")) - col("j"))
    val lcp = {
      // longest shared prefix of suffixes at i and j: first mismatching
      // offset over the shorter remainder (array_position is 1-based and
      // 0 when no mismatch ⇒ whole shorter remainder is shared)
      val m = least(shorter, lit(maxLcp.toLong))
      val flags = transform(
        sequence(lit(1L), m),
        x => substring(col("t"), (col("i") + x).cast("int"), lit(1)) =!=
          substring(col("t"), (col("j") + x).cast("int"), lit(1)))
      when(m <= 0, lit(0L))
        .otherwise(
          coalesce(nullif(array_position(flags, true), lit(0L)) - 1, m.cast("long")))
    }
    texts
      .join(pairs, Seq("id"), "left")
      .select(col("id"),
        when(col("i").isNotNull, lcp).otherwise(lit(0L)).as("_l"),
        when(col("i").isNotNull && lcp === maxLcp.toLong &&
          shorter > maxLcp.toLong, 1L).otherwise(0L).as("_cap"))
      .groupBy(col("id"))
      .agg(max(col("_l")).as("lrs_len"), max(col("_cap")).as("_cm"))
      .select(col("id").as(idCol), col("lrs_len"), (col("_cm") === 1L).as("capped"))
  }
}
