package graft.ops

import org.apache.spark.sql.DataFrame
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
