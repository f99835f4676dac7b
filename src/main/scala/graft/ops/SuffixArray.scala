package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** One row per (document, position) carrying the `seedK`-char prefix of
    * that position's suffix — WITHOUT the quadratic trap: Spark's
    * `substring(t, pos+1, k)` seeks the character offset by scanning the
    * string from byte 0 (UTF8String has no char index), so per-position
    * substrings over one L-char document cost O(L²) total. Instead the
    * document explodes into 512-char chunks FIRST (each chunk overlaps
    * the next by seedK−1 chars so every position's full window is local),
    * and positions substring within their ≤639-char chunk — O(L) chunk
    * extraction + O(chunk) per-row seeks ⇒ linear in corpus characters.
    * The giant-document ScaleProbe (sa_skew) is the regression gate.
    */
  private val chunkStride = 512

  /** (id, c, tlen, chunk) — documents exploded into `chunkStride`-char
    * chunks, each overlapping the next by `window − 1` chars so every
    * position's `window`-char view is local to its own chunk. The linear
    * substring-extraction seam shared by [[seedPrefixRows]] and
    * [[crossDocSpans]]' verification pass.
    */
  private def chunkRows(base: DataFrame, window: Int): DataFrame = {
    val chunkLen = chunkStride + window - 1
    // explicit-count repartition by id BEFORE the explode (the shingleRows
    // discipline): per-window compute (substring copies, hashes) vastly
    // exceeds bytes per input row, and a scan with few input splits (one
    // small file locally; one skewed split at scale) would otherwise run
    // the whole extraction serially. Keyed on id, the exchange ALSO
    // satisfies every downstream per-document window/groupBy
    // (mergeCharIslands, ranks' rank windows) — for those consumers this
    // is the exchange they would have paid anyway, moved below the
    // compute-heavy generator.
    val parallelism = base.sparkSession.sparkContext.defaultParallelism
    base
      .repartition(parallelism, col("id"))
      .select(col("id"), col("t"), length(col("t")).as("tlen"))
      .select(col("id"), col("t"), col("tlen"),
        explode(expr(s"sequence(bigint(0), (tlen - 1) div $chunkStride)")).as("c"))
      .select(col("id"), col("c"), col("tlen"),
        expr(s"substring(t, cast(c * $chunkStride + 1 as int), $chunkLen)").as("chunk"))
  }

  private def seedPrefixRows(base: DataFrame, seedK: Int): DataFrame = {
    val stride = chunkStride
    chunkRows(base, seedK)
      .select(col("id"), col("c"), col("chunk"),
        explode(expr(
          s"sequence(bigint(0), least(bigint(${stride - 1}), bigint(tlen) - c * $stride - 1))"))
          .as("off"))
      .select(col("id"),
        (col("c") * stride + col("off")).as("pos"),
        expr(s"substring(chunk, cast(off + 1 as int), $seedK)").as("_pfx"))
  }

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
    var rows = seedPrefixRows(base, seedK)
      .withColumn("rank",
        dense_rank().over(Window.partitionBy(col("id")).orderBy(col("_pfx"))).cast("long"))
      .drop("_pfx")
      .localCheckpoint()
    var k = seedK
    // early exit: a round is only needed while some rank is still TIED
    // within its doc (the 128-char seed resolves typical prose corpora
    // outright — ⌈log₂(maxLen/128)⌉ full window rounds would all be
    // no-ops); the tie probe is one map-side-combinable aggregate with
    // limit(1), far cheaper than the two window passes it saves
    def tiesExist(r: DataFrame): Boolean =
      !r.groupBy(col("id"), col("rank")).agg(count(lit(1)).as("_n"))
        .filter(col("_n") > 1L).limit(1).isEmpty
    while (k < maxLen && tiesExist(rows)) {
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
    * Mechanics — MIN-rank bucket numbers (the Manber-Myers bucket form:
    * a tie group's rank is the global position of its first row, so a
    * resolved row's rank is FINAL and later rounds never renumber it)
    * with every ranking step a RANGE-PARTITIONED global sort + two-phase
    * offset ranking ([[globalMinRank]]):
    *   1. seed: global min-rank over `(id, 128-char prefix)` — id leads
    *      the sort key, so each document's ranks form a contiguous block,
    *      disjoint across documents (the invariant the loop preserves);
    *      rows whose tie group has size 1 are RESOLVED immediately;
    *   2. doubling round — over PENDING rows only: the `lead(k)` window
    *      of [[ranks]] becomes a keyed SELF-JOIN on `(id, pos + k)`
    *      against ALL rows (resolved ranks are valid order keys forever),
    *      then `rank += (within-group min-rank of (rank, r2)) − 1` —
    *      exact because splitting a tie group never moves rows of OTHER
    *      groups (the min-rank freeze property dense ranks lack). Newly
    *      singleton groups freeze. With one giant document among normal
    *      ones, the normal documents resolve in the first round or two
    *      and every later round touches only the giant's remaining ties —
    *      total work tracks Σ pending(round), not rows × rounds;
    *   3. final: per-doc rank = `rank − min(rank) + 1` per document —
    *      exact because final min-ranks are the distinct global positions
    *      1..n, doc-contiguous hence consecutive within each document.
    *      The min table is one row per doc; the join back is id-keyed
    *      with AQE skew-split handling the giant doc's row block.
    *
    * Cost vs [[ranks]]: more exchanges per round (self-join + rank + two
    * bounded keyed aggregates vs two window passes) — but over the
    * SHRINKING pending set, and skew-immune. Rows carry only
    * (id, pos, rank, resolved) + a transient ≤128-char prefix; the
    * document text itself is never shuffled. Rounds `localCheckpoint`
    * (lineage control, the [[ranks]] rule); the loop exits EARLY the
    * moment every suffix is resolved, not at ⌈log₂ maxLen⌉.
    *
    * Reference analog: none (training-data extension).
    */
  def ranksGlobal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = corpusBase(df, idCol, textCol)
    val maxLen = maxDocLen(base)
    // seed keyed (id, prefix) — doc-contiguous rank blocks — then the SAME
    // doubling loop as the corpus-grain variant ([[resolveLoop]], which this
    // method previously duplicated inline with one costly difference: the
    // inline loop re-materialized the ENTIRE row set per round via
    // `resolved ∪ updated → localCheckpoint`, while resolveLoop accumulates
    // frozen rows as already-materialized parts and checkpoints only the
    // SHRINKING pending set — per-round write volume tracks the tie
    // footprint, not the corpus (the r11/r14 lesson, guide §5)
    val rows = classifyFresh(
      globalMinRank(seedPrefixRows(base, corpusSeedK), Seq(col("id"), col("_pfx")),
        dropBeforeCheckpoint = Seq("_pfx"))
        .withColumn("_oldRank", lit(null).cast("long")))
      .localCheckpoint()
    val resolved = resolveLoop(rows, maxLen, Int.MaxValue, classifyFresh)
    // the final per-doc renumber stays the one-row-per-doc aggregate +
    // id-keyed join back (NOT an id-partitioned window): the join probe
    // side is AQE-skew-splittable, which is this variant's whole giant-doc
    // contract (sa_skew probe) — a window would serialize the giant doc's
    // block into one task
    val mins = resolved.groupBy(col("id")).agg(min(col("rank")).as("_m"))
    resolved.join(mins, Seq("id"))
      .select(col("id").as(idCol), col("pos"),
        (col("rank") - col("_m") + 1L).as("sa_rank"))
  }

  /** Corpus-order suffix buckets: every suffix of every document ranked in
    * ONE lexicographic order across the whole corpus — the index grain of
    * Lee et al. 2022's exact-substring dedup, where the thing being asked
    * is "which documents share long runs", not "what repeats within one
    * document". Output `(idCol, pos, corpus_rank)`: `corpus_rank` is the
    * min-rank BUCKET number (identical suffixes — which by construction
    * can only come from different documents — share a bucket; that
    * equality is the signal, not a defect).
    *
    * Same machinery as [[ranksGlobal]] minus the doc key in the seed:
    * seed buckets come from the 128-char prefix alone, doubling rounds
    * extend within each suffix's own document (`r2` looked up at
    * `(id, pos+k)`, −1 past the end), resolved buckets freeze, and the
    * loop runs to ⌈log₂ maxLen⌉ — surviving ties at that point are
    * character-for-character identical suffixes and correctly stay
    * bucketed together. Work per round is bounded by the surviving
    * pending set, i.e. by the corpus's DUPLICATED volume, not its size.
    *
    * Reference analog: none (training-data extension).
    */
  def corpusRanks(df: DataFrame, idCol: String, textCol: String): DataFrame =
    corpusRanksResolved(df, idCol, textCol)
      .select(col(idCol), col("pos"), col("corpus_rank"))

  /** [[corpusRanks]] plus the internal `resolved` flag (bucket size 1) —
    * what lets [[crossDocRepeat]] assign total-order positions by ranking
    * ONLY the tied rows (duplicate-volume-bounded) instead of the whole
    * corpus again: a resolved bucket's rank IS its global position.
    *
    * `resolveLcp` is the CONSUMER'S observation cap: a caller that
    * truncates every LCP report at `resolveLcp` chars cannot observe any
    * rank refinement past prefix length `resolveLcp` — suffixes still tied
    * once `k ≥ resolveLcp` share a ≥resolveLcp-char prefix, so every pair
    * among them already reports the cap (or, for identical-short-suffix
    * buckets, their exact common length), and every bucket-BOUNDARY LCP is
    * fully determined by the already-resolved prefix. Splitting such
    * buckets further only permutes tie order, which the consumer's
    * tied-rows total-order pass handles arbitrarily-but-deterministically.
    * The doubling loop therefore exits once `k ≥ max(seedK, resolveLcp)`
    * — for a 64-char cap the 128-char seed alone suffices and ZERO
    * doubling rounds run, dropping the loop's range exchanges +
    * checkpoint barriers entirely. Default `Int.MaxValue` = resolve fully
    * (the [[corpusRanks]] contract).
    */
  private[graft] def corpusRanksResolved(
      df: DataFrame, idCol: String, textCol: String,
      resolveLcp: Int = Int.MaxValue): DataFrame = {
    val base = corpusBase(df, idCol, textCol)
    val rows = classifyFresh(
      globalMinRank(seedPrefixRows(base, corpusSeedK), Seq(col("_pfx")),
        dropBeforeCheckpoint = Seq("_pfx"))
        .drop("_pfx")
        .withColumn("_oldRank", lit(null).cast("long")))
      .localCheckpoint()
    resolveLoop(rows, maxDocLen(base), resolveLcp, classifyFresh)
      .select(col("id").as(idCol), col("pos"), col("rank").as("corpus_rank"),
        col("resolved"))
  }

  private val corpusSeedK = 128

  private def corpusBase(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        length(col(textCol)) > 0)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"))

  private def maxDocLen(base: DataFrame): Int = {
    val row = base.agg(max(length(col("t")))).head()
    if (row.isNullAt(0)) 0 else row.getInt(0)
  }

  /** Bucket-size-1 ⇒ resolved — a singleton min-rank bucket's rank IS its
    * final global position. One rank-keyed window count (unbounded frame)
    * replaces the old groupBy + full-table join back: a single exchange.
    * NOTE the skew trade this makes: AQE's OptimizeSkewedJoin splits JOIN
    * exchanges only, never window partitions, so one pathological tie
    * group (an all-one-char giant document) lands in a single WindowExec
    * task, buffered/spilled. The sa_skew ScaleProbe gates exactly that
    * shape (giant-doc ratio ≤ 2): the rank windows sit over the PENDING
    * set, whose giant-doc ties shrink per round, which is why the probe
    * passes — if it ever trips, the fallback is the old aggregate + join
    * shape for this step.
    */
  private def withResolved(r: DataFrame): DataFrame =
    r.withColumn("_n", count(lit(1)).over(Window.partitionBy(col("rank"))))
      .withColumn("resolved", col("_n") === 1L)
      .drop("_n")

  /** The corpus-grain prefix-doubling loop over `(id, pos, rank, resolved,
    * frozen)` rows: each round refines ONLY `!frozen` rows (their tie
    * groups are wholly un-frozen by construction — the min-rank freeze
    * property) by pairing with the rank `k` ahead and min-ranking within
    * each group, then freezes newly-singleton buckets. `frozen` is the
    * loop-participation flag, DISTINCT from `resolved`:
    * [[appendCorpusRanks]] freezes all-old tie groups whose relative order
    * the persisted artifact already fixes — including genuinely tied
    * identical suffixes, which must neither re-enter the loop nor be
    * reported resolved. For a from-scratch build the two flags coincide.
    * Refinement keys of heterogeneous depth are safe: any current rank is
    * an order-consistent coarsening of true suffix order (r(a) < r(b) ⇒
    * a < b), so a more-refined `r2` can only split a group EARLIER than
    * the uniform-depth loop would, never differently.
    */
  /** Diagnostic: Σ pending rows entering each doubling round of the most
    * recent [[resolveLoop]] run — the data volume the loop actually moved
    * through its exchanges. ScaleProbe's sa_append gate reads this: at
    * cluster scale, bytes-through-exchanges is the cost driver, while a
    * 32-thread local run is dominated by fixed per-stage latency that
    * masks a 100× volume difference.
    */
  private[graft] var lastLoopVolume: Long = 0L

  private def resolveLoop(
      initial: DataFrame, maxLen: Int, resolveLcp: Int,
      reclassify: DataFrame => DataFrame): DataFrame = {
    // frozen rows accumulate as ALREADY-materialized parts and are never
    // re-checkpointed: each round materializes ONLY the refined pending
    // set, so per-round write volume tracks the shrinking tie footprint,
    // not the corpus (the r11 lesson — a corpus-wide localCheckpoint per
    // round cost more than the rounds themselves once pending was small)
    var frozenParts: List[DataFrame] = List(initial.filter(col("frozen")))
    var pendRows = initial.filter(!col("frozen"))
    var k = corpusSeedK
    var pending = if (k >= resolveLcp) 0L else pendRows.count()
    var volume = 0L
    while (k < maxLen && pending > 0) {
      volume += pending
      val all = (pendRows :: frozenParts).reduce(_ unionByName _)
      val pend = pendRows
        .select(col("id"), col("pos"), col("_oldRank"), col("rank").as("_r1"))
      // the r2 lookup table is semi-pruned to the rows pending suffixes
      // actually look at — (id, pos+k) keys — BEFORE it joins: the prune
      // is map-side (AQE broadcasts the pending key set once the pending
      // volume shrinks), so late rounds never re-shuffle the whole corpus
      // to resolve a residual tie set. Lookahead targets past the end of
      // a document are genuinely absent and fold to the −1 sentinel.
      val pendKeys = pendRows
        .select(col("id").as("kid"), (col("pos") + k).as("kpos"))
      // the driver KNOWS the pending count — below ~1M keys (≈16 MB) the
      // prune broadcasts explicitly, so the corpus side never even
      // shuffle-writes (AQE's runtime broadcast conversion would still pay
      // the map-stage write of the big side before deciding)
      val keysB = if (pending <= 1000000L) broadcast(pendKeys) else pendKeys
      val ahead = all
        .select(col("id").as("rid"), col("pos").as("rpos"), col("rank").as("r2"))
        .join(keysB, col("rid") === col("kid") && col("rpos") === col("kpos"),
          "left_semi")
        .select(col("rid"), (col("rpos") - k).as("rpos"), col("r2"))
      val paired = pend
        .join(ahead, col("id") === col("rid") && col("pos") === col("rpos"), "left")
        .select(col("id"), col("pos"), col("_oldRank"), col("_r1"),
          coalesce(col("r2"), lit(-1L)).as("r2"))
      // the group's first position via ONE _r1-keyed window min instead of
      // the old groupBy + join back — one exchange over the (shrinking)
      // pending set, pranked planned once
      val pranked = globalMinRank(paired, Seq(col("_r1"), col("r2")))
        .withColumnRenamed("rank", "_pr")
      val upd = pranked
        .withColumn("_g", min(col("_pr")).over(Window.partitionBy(col("_r1"))))
        .select(col("id"), col("pos"), col("_oldRank"),
          (col("_r1") + col("_pr") - col("_g")).as("rank"))
      val cls = reclassify(upd).localCheckpoint()
      frozenParts = cls.filter(col("frozen")) :: frozenParts
      pendRows = cls.filter(!col("frozen"))
      k *= 2
      pending = if (k >= resolveLcp) 0L else pendRows.count()
      if (sys.env.contains("GRAFT_SA_DEBUG"))
        println(s"[sa-corpus] round k=${k / 2} -> pending=$pending")
    }
    lastLoopVolume = volume
    (pendRows :: frozenParts).reduce(_ unionByName _)
  }

  /** The from-scratch round classification: singleton buckets freeze
    * resolved; everything else stays pending (`_oldRank` is the all-NULL
    * placeholder column — no prior order is known for anything).
    */
  private def classifyFresh(upd: DataFrame): DataFrame =
    withResolved(upd).withColumn("frozen", col("resolved"))

  /** The append-path classification, applied at the seed AND after every
    * round: a tie group whose rows are ALL history (`_oldRank` non-NULL —
    * new rows carry NULL, which groups apart under `<=>`) never needs
    * another doubling round — its internal order is already final in the
    * artifact's old ranks (inserting new suffixes cannot reorder old
    * ones, and tie groups only ever split) — so it freezes at
    * `rank + min-rank offset of its oldRank sub-group`, resolved iff that
    * sub-group is a singleton. Groups still containing a new row stay
    * pending. This bounds EVERY round's pending set by the batch's tie
    * footprint: history-only ties (including never-resolving identical
    * mirrors) exit the loop the moment the last new row splits away.
    */
  private def classifyAppend(upd: DataFrame): DataFrame = {
    val sub = upd.groupBy(col("rank"), col("_oldRank"))
      .agg(count(lit(1)).as("_gc"))
    val buck = sub.groupBy(col("rank"))
      .agg(sum(col("_gc")).as("_n"),
        max(col("_oldRank").isNull.cast("int")).as("_hn"))
    val goffR = sub
      .withColumn("_off",
        coalesce(
          sum(col("_gc")).over(
            Window.partitionBy(col("rank")).orderBy(col("_oldRank"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .join(buck, Seq("rank"))
      .select(col("rank").as("_grank"), col("_oldRank").as("_goldRank"),
        col("_off"), col("_gc"), col("_n"), col("_hn"))
    val allOldMulti = col("_n") > 1L && col("_hn") === 0
    upd
      .join(goffR,
        col("rank") === col("_grank") && col("_oldRank") <=> col("_goldRank"))
      .select(col("id"), col("pos"), col("_oldRank"),
        when(allOldMulti, col("rank") + col("_off"))
          .otherwise(col("rank")).as("rank"),
        (col("_n") === 1L || (allOldMulti && col("_gc") === 1L)).as("resolved"),
        (col("_n") === 1L || col("_hn") === 0).as("frozen"))
  }

  /** Longest substring each document shares with ANY OTHER document —
    * cross-document exact-substring detection at the Lee-et-al grain,
    * and the reason [[corpusRanks]] exists: in corpus suffix order, the
    * maximum cross-document LCP is always attained at some ADJACENT pair
    * whose documents differ (for any cross-doc pair (u, v), every
    * adjacency between them has LCP ≥ LCP(u, v), and at least one of
    * those adjacencies crosses a document change), so n−1 adjacent pairs
    * replace all-pairs comparison — pair volume is LINEAR in corpus
    * characters regardless of how much duplication exists.
    *
    * Output `(idCol, xdoc_len, capped)` — `xdoc_len` 0 for documents
    * sharing nothing ≥1 char with any other; `capped` as in
    * [[longestRepeat]]: the report hit `maxLcp` with both suffixes still
    * unexhausted, so the true shared run is ≥ the cap and the doc should
    * escalate (re-run at a higher cap, or straight to span removal).
    *
    * Scale shape: one global position assignment (all-distinct keys, the
    * [[globalMinRank]] two-phase), one keyed adjacent-pair self-join on
    * that position, and per-pair compares bounded by `maxLcp` over
    * remainder windows PRE-EXTRACTED per suffix row via the chunked
    * [[seedPrefixRows]] path — never a join that ships whole documents
    * to pair rows (which would shuffle O(L²) bytes for an L-char doc:
    * every one of its ~2L adjacencies would carry the full text), and
    * never a per-character seek into a full document.
    */
  def crossDocRepeat(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxLcp: Int = 64): DataFrame = {
    require(maxLcp >= 1, s"maxLcp must be >= 1, got $maxLcp")
    if (maxLcp < corpusSeedK) return crossDocRepeatFused(df, idCol, textCol, maxLcp)
    // cap-aware ranking: this consumer truncates every LCP report at
    // maxLcp, so bucket refinement past that prefix length is
    // unobservable (see corpusRanksResolved) — for the default 64-char
    // cap the 128-char seed pass alone ranks the corpus, zero doubling
    // rounds
    val sa = corpusRanksResolved(df, idCol, textCol, resolveLcp = maxLcp)
      .select(col(idCol).cast("long").as("id"), col("pos"),
        col("corpus_rank").as("_cr"), col("resolved"))
    crossDocRepeatTail(df, sa, idCol, textCol, maxLcp)
  }

  /** The cap-below-seed fast path of [[crossDocRepeat]]: when
    * `maxLcp + 1 <= corpusSeedK`, every byte the capped LCP compare (and
    * the `capped` exhaustion test) can touch already sits inside the
    * 128-char seed prefix — so the remainder window is `substring(_pfx, 1,
    * maxLcp+1)`, carried THROUGH the rank exchange instead of re-derived
    * by a second corpus-wide chunk-extraction pass plus an (id, pos) join
    * back (guide §2.4: content rides the one exchange the op pays anyway).
    * The +1 char distinguishes "suffix ends exactly at the cap" from
    * "extends past it": `length(_rem) == maxLcp+1  ⇔  suffix_len > maxLcp`,
    * which is exactly the old `_shorter > maxLcp` test.
    *
    * Total order in ONE rank pass: ranking by `(_pfx, id, pos)` directly
    * yields bucket-major order with (id, pos) tie-breaks — precisely the
    * order the resolved/tied split assembled in two passes (solo rows kept
    * their bucket min-rank = global position; tied rows added a
    * (id, pos)-ordered within-bucket offset) — and since every (id, pos)
    * is distinct, the rank IS the dense global position. The split, the
    * tie-group window count, the second rank pass, and the union all
    * collapse into the seed pass with two extra (already-present) sort
    * key columns.
    */
  private def crossDocRepeatFused(
      df: DataFrame, idCol: String, textCol: String, maxLcp: Int): DataFrame = {
    val base = corpusBase(df, idCol, textCol)
    val seed = seedPrefixRows(base, corpusSeedK)
      .withColumn("_rem", substring(col("_pfx"), 1, maxLcp + 1))
    // _pfx AND pos are rank keys no consumer reads afterwards — dropped
    // before the checkpoint so it materializes slim (id, _rem, rank) rows
    val ordered = globalMinRank(seed, Seq(col("_pfx"), col("id"), col("pos")),
      dropBeforeCheckpoint = Seq("_pfx", "pos"))
      .withColumnRenamed("rank", "_seq")
    val a = ordered.select(col("id").as("id_a"), col("_seq"), col("_rem").as("ra"))
    val b = ordered.select(col("id").as("id_b"), (col("_seq") - 1L).as("_seq"),
      col("_rem").as("rb"))
    // adjacent pairs meet on the unique _seq key: hash join (SHUFFLE_HASH)
    // skips the sort a sort-merge join would pay on both corpus-sized sides
    val pairs = a.join(b.hint("SHUFFLE_HASH"), Seq("_seq"))
      .filter(col("id_a") =!= col("id_b"))
    val la = length(col("ra")).cast("long") // = min(suffix_len, maxLcp+1)
    val lb = length(col("rb")).cast("long")
    val m = least(la, lb, lit(maxLcp.toLong))
    val lcp = graft.Functions.commonPrefixLen(col("ra"), col("rb"), m)
    val scored = pairs.select(col("id_a"), col("id_b"),
      lcp.as("_l"),
      when(lcp === maxLcp.toLong &&
        la === (maxLcp + 1).toLong && lb === (maxLcp + 1).toLong, 1L)
        .otherwise(0L).as("_cap"))
    val bothSides = scored.select(col("id_a").as("id"), col("_l"), col("_cap"))
      .unionByName(scored.select(col("id_b").as("id"), col("_l"), col("_cap")))
    base.select(col("id"))
      .join(
        bothSides.groupBy(col("id"))
          .agg(max(col("_l")).as("_ml"), max(col("_cap")).as("_mc")),
        Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("_ml"), lit(0L)).as("xdoc_len"),
        (coalesce(col("_mc"), lit(0L)) === 1L).as("capped"))
  }

  /** [[crossDocRepeat]] over PRECOMPUTED corpus ranks — the artifact
    * consumer: `ranks` is [[loadCorpusRanks]] output (or fresh
    * [[appendCorpusRanks]] deltas), so a daily-growing corpus re-detects
    * WITHOUT re-ranking what it already ranked. A deeper-resolved artifact
    * is fine (refinement past the cap only permutes tie order, which the
    * tied-rows pass handles arbitrarily — the [[corpusRanksResolved]] cap
    * argument); one resolved SHALLOWER than `maxLcp` must be refused by
    * the caller ([[crossDocRepeatFromArtifact]] checks the sidecar).
    */
  def crossDocRepeatFromRanks(
      df: DataFrame,
      ranks: DataFrame,
      idCol: String,
      textCol: String,
      maxLcp: Int = 64): DataFrame = {
    require(maxLcp >= 1, s"maxLcp must be >= 1, got $maxLcp")
    val sa = ranks.select(col(idCol).cast("long").as("id"), col("pos"),
      col("corpus_rank").as("_cr"), col("resolved"))
    crossDocRepeatTail(df, sa, idCol, textCol, maxLcp)
  }

  /** [[crossDocRepeatFromRanks]] against a persisted artifact directory,
    * refusing one whose resolution is shallower than this consumer's cap
    * (its tie buckets would be coarser than the LCP reports need).
    */
  def crossDocRepeatFromArtifact(
      df: DataFrame,
      dir: String,
      idCol: String,
      textCol: String,
      maxLcp: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val meta = MetaJson.readFields(spark, dir, SaMetaFile, Seq("seedK", "resolveLcp"),
      "an artifact written by saveCorpusRanks")
    require(meta("resolveLcp") >= maxLcp,
      s"artifact at $dir resolved to LCP ${meta("resolveLcp")} — shallower than " +
        s"this consumer's cap $maxLcp; rebuild with saveCorpusRanks(resolveLcp >= $maxLcp)")
    crossDocRepeatFromRanks(df, spark.read.parquet(dir), idCol, textCol, maxLcp)
  }

  private def crossDocRepeatTail(
      df: DataFrame,
      sa: DataFrame,
      idCol: String,
      textCol: String,
      maxLcp: Int): DataFrame = {
    val texts = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        length(col(textCol)) > 0)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
    // total order: bucket rank, then (id, pos) — ties are identical
    // suffixes, so any tie order is lexicographically valid. A RESOLVED
    // bucket's min-rank already IS its global position, so only the TIED
    // rows (bounded by the corpus's duplicated volume) go through a rank
    // pass: position = bucket rank + within-bucket offset
    val solo = sa.filter(col("resolved"))
      .select(col("id"), col("pos"), col("_cr").as("_seq"))
    // within-bucket offset via ONE _cr-keyed window min over the tied rows
    // (bounded by duplicated volume) instead of groupBy + join back
    val tiedRanked = globalMinRank(
      sa.filter(!col("resolved")).select(col("id"), col("pos"), col("_cr")),
      Seq(col("_cr"), col("id"), col("pos")))
      .withColumnRenamed("rank", "_pr")
    val tiedSeq = tiedRanked
      .withColumn("_g", min(col("_pr")).over(Window.partitionBy(col("_cr"))))
      .select(col("id"), col("pos"), (col("_cr") + col("_pr") - col("_g")).as("_seq"))
    val ordered = solo.unionByName(tiedSeq)
    // per-suffix maxLcp-char remainder window (linear chunked extraction),
    // carrying the doc length for the exhaustion test straight off the
    // chunk rows — no separate `lens` relation, one join instead of two
    val stride = chunkStride
    val rems = chunkRows(texts, maxLcp)
      .select(col("id"), col("c"), col("tlen"), col("chunk"),
        explode(expr(
          s"sequence(bigint(0), least(bigint(${stride - 1}), bigint(tlen) - c * $stride - 1))"))
          .as("off"))
      .select(col("id"),
        (col("c") * stride + col("off")).as("pos"),
        expr(s"substring(chunk, cast(off + 1 as int), $maxLcp)").as("rem"),
        col("tlen").cast("long").as("tlen"))
    val rows = ordered
      .join(rems, Seq("id", "pos"))
    val a = rows.select(col("id").as("id_a"), col("pos").as("i"), col("_seq"),
      col("rem").as("ra"), col("tlen").as("la"))
    val b = rows.select(col("id").as("id_b"), col("pos").as("j"),
      (col("_seq") - 1L).as("_seq"), col("rem").as("rb"), col("tlen").as("lb"))
    // adjacent pairs meet on the unique _seq key: hash join (SHUFFLE_HASH)
    // skips the sort a sort-merge join would pay on both corpus-sized sides
    val pairs = a.join(b.hint("SHUFFLE_HASH"), Seq("_seq"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        least(col("la") - col("i"), col("lb") - col("j")).as("_shorter"),
        col("ra"), col("rb"))
    // capped LCP as ONE codegen'd byte walk (cap <= 0 folds to 0 inside) —
    // the interpreted transform(sequence)/array_position composite this
    // replaces dispatched ~2m interpreted substring evals (each re-seeking
    // from byte 0) and built an m-element array PER PAIR
    val m = least(col("_shorter"), lit(maxLcp.toLong))
    val lcp = graft.Functions.commonPrefixLen(col("ra"), col("rb"), m)
    val scored = pairs.select(col("id_a"), col("id_b"),
      lcp.as("_l"),
      when(lcp === maxLcp.toLong && col("_shorter") > maxLcp.toLong, 1L)
        .otherwise(0L).as("_cap"))
    val bothSides = scored.select(col("id_a").as("id"), col("_l"), col("_cap"))
      .unionByName(scored.select(col("id_b").as("id"), col("_l"), col("_cap")))
    texts.select(col("id"))
      .join(
        bothSides.groupBy(col("id"))
          .agg(max(col("_l")).as("_ml"), max(col("_cap")).as("_mc")),
        Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("_ml"), lit(0L)).as("xdoc_len"),
        (coalesce(col("_mc"), lit(0L)) === 1L).as("capped"))
  }

  /** Cross-document shared spans at CHARACTER grain — the apply-side
    * companion of [[crossDocRepeat]], closing the Lee-et-al loop: detection
    * says "this document shares a ≥`minLen`-char run with another document";
    * this emits the exact maximal extents `(idCol, span_start, span_end)`
    * (char offsets, end exclusive) so [[Dedup.removeCharSpans]] can cut
    * them out of the raw text.
    *
    * Semantics: a position `p` is marked iff `text[p, p+minLen)` occurs in
    * at least `minDocs` DISTINCT documents; overlapping/adjacent marks merge
    * into maximal islands. That is exactly the suffix-bucket form at prefix
    * length `minLen` — suffixes sharing a `minLen`-char prefix across ≥2
    * docs — computed as one keyed group instead of doubling rounds (rank
    * refinement past `minLen` is unobservable here, the [[crossDocRepeat]]
    * cap argument taken to its limit). Adjacent-pair LCPs alone would NOT
    * be position-complete: when a run repeats k times in one document and
    * once in another, only ONE of the k+1 same-prefix suffix adjacencies
    * crosses documents, so k−1 duplicated positions would go unreported —
    * the bucket form marks all of them (proven against brute force in
    * SuffixArraySpec).
    *
    * Exactness and scale shape (the [[Dedup.repeatedSpansExact]] two-pass
    * discipline at char grain): pass 1 extracts one slim
    * `(id, pos, xxhash64(window))` row per character via the linear chunked
    * path — never an O(L) seek into a full document — and keys the
    * cross-doc test on the 64-bit hash; pass 2 re-extracts window CONTENT
    * only at surviving positions (bounded by duplicated volume plus hash
    * collisions) and re-verifies on the actual characters, so a hash
    * collision can never flag a span that is not truly shared. The island
    * merge windows per document — documents parallelize freely, and one
    * document's marked positions are bounded by its own duplicated volume.
    */
  def crossDocSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int,
      minDocs: Int = 2): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    require(minDocs >= 2, s"minDocs below 2 would flag every window, got $minDocs")
    val texts = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        length(col(textCol)) >= minLen)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
    // size-adaptive cross-doc test (graft.ops.SizeAdaptive.isLarge; the
    // same local-vs-scale boundary as Dedup.filterCrossDoc, measured there):
    //  - below the threshold (all local runs): the r14 key-partitioned
    //    window min/max — one keyed exchange, one pass, the compute-heavy
    //    extraction subtree planned ONCE (the pre-r14 broadcast-join-back
    //    planned it per join side: the chunk/window explode appeared six
    //    times in this query's plan).
    //  - above it: min/max aggregate + co-partitioned SHUFFLE_HASH
    //    join-back over ONE explicit key exchange shared by both sides —
    //    extraction still planned once (ReuseExchange), the duplicated-key
    //    set never broadcasts, and a HOT key (one window content repeated
    //    across ~10^5 documents) streams through a constant-state
    //    HashAggregate and a hash-join probe instead of serializing into
    //    one WindowExec task's sort+buffer (window partitions are not
    //    AQE-skew-splittable). The sa_hotkey ScaleProbe gates this shape.
    // minDocs > 2 keeps the plain aggregate shape (a distinct-count window
    // would hold per-key id sets in memory).
    def crossDocFiltered(rows: DataFrame, keyCol: String): DataFrame =
      if (minDocs == 2) {
        if (graft.ops.SizeAdaptive.isLarge(rows)) {
          val nPart = rows.sparkSession.sessionState.conf.numShufflePartitions
          val keyed = rows.repartition(nPart, col(keyCol))
          val dup = keyed.groupBy(col(keyCol))
            .agg(min(col("id")).as("_lo"), max(col("id")).as("_hi"))
            .filter(col("_lo") =!= col("_hi"))
            .select(col(keyCol))
          keyed.join(dup.hint("SHUFFLE_HASH"), Seq(keyCol))
            .select(col("id"), col("pos"))
        } else {
          val w = Window.partitionBy(col(keyCol))
          rows
            .withColumn("_lo", min(col("id")).over(w))
            .withColumn("_hi", max(col("id")).over(w))
            .filter(col("_lo") =!= col("_hi"))
            .select(col("id"), col("pos"))
        }
      } else
        rows.join(
          rows.groupBy(col(keyCol))
            .agg(count_distinct(col("id")).as("_df"))
            .filter(col("_df") >= minDocs)
            .select(col(keyCol)),
          Seq(keyCol))
          .select(col("id"), col("pos"))
    // pass 1: slim (id, pos, hash) per FULL window (trailing sub-window
    // prefixes are excluded — they cannot anchor a >= minLen match)
    val hashed = seedPrefixRows(texts, minLen)
      .filter(length(col("_pfx")) === minLen)
      .select(col("id"), col("pos"), xxhash64(col("_pfx")).as("_h"))
    val survivors = crossDocFiltered(hashed, "_h")
    // pass 2: window content re-derived ONLY at survivor positions, via the
    // same chunk seam as pass 1 (the two passes can never disagree on what
    // a window is), then re-verified on actual characters
    val chunks = chunkRows(texts, minLen)
      .select(col("id"), col("c"), col("chunk"))
    val content = survivors
      .withColumn("c", floor(col("pos") / chunkStride))
      .join(chunks, Seq("id", "c"))
      .select(col("id"), col("pos"),
        col("chunk").substr(
          (col("pos") - col("c") * chunkStride + 1L).cast("int"),
          lit(minLen)).as("_w"))
    val marked = crossDocFiltered(content, "_w")
    mergeCharIslands(marked, minLen).withColumnRenamed("id", idCol)
  }

  /** Island merge at char grain, shared by [[crossDocSpans]] and
    * [[crossDocSpansAgainstHistory]] (one code path — the two forms can
    * never disagree on extents): marks p, q (p < q) overlap or touch iff
    * q <= p + minLen ([p, p+minLen) meets [q, q+minLen)).
    */
  private def mergeCharIslands(marked: DataFrame, minLen: Int): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    marked
      .withColumn("_prev", lag(col("pos"), 1).over(w))
      .withColumn("_ns",
        when(col("_prev").isNull || col("pos") > col("_prev") + minLen, 1)
          .otherwise(0))
      .withColumn("_sid",
        sum(col("_ns")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id"), col("_sid"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + minLen).as("span_end"))
      .select(col("id"), col("span_start"), col("span_end"))
  }

  /** `(id, pos, win_hash)` — one md5 per FULL `minLen`-char window of every
    * document, via the same linear chunked extraction as [[crossDocSpans]]'
    * pass 1. The distinct `win_hash` set is the persistable history
    * artifact for [[crossDocSpansAgainstHistory]] — the char-grain twin of
    * [[Dedup.windowRows]]' token-grain artifact. md5 (128-bit) rather than
    * the in-batch xxhash64: the vs-history probe trusts the hash (history
    * content is not retained for re-verification — the same accepted
    * 2^-128 trade as the whole [[Dedup.repeatedSpansAgainstHistory]]
    * family).
    */
  def charWindowRows(
      df: DataFrame, idCol: String, textCol: String, minLen: Int): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val texts = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        length(col(textCol)) >= minLen)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("t"))
    seedPrefixRows(texts, minLen)
      .filter(length(col("_pfx")) === minLen)
      .select(col("id"), col("pos"), md5(col("_pfx")).as("win_hash"))
  }

  /** Incremental [[crossDocSpans]] for a growing corpus — char-grain
    * detection against history WITHOUT re-scanning it: spans in BATCH
    * documents whose `minLen`-char windows either already exist in
    * `historyHashes` (the persisted distinct `win_hash` artifact of
    * everything ingested so far — [[charWindowRows]]) or occur in at least
    * `minDocs` distinct batch documents. With disjoint doc ids and
    * `minDocs = 2` this is EXACTLY the full-corpus [[crossDocSpans]]
    * restricted to batch docs (spec-pinned), because a batch window is
    * cross-doc in the union iff some history doc holds it or a second
    * batch doc does.
    *
    * Scale shape — the [[Dedup.repeatedSpansAgainstHistory]] discipline at
    * char grain: history rows NEVER reshuffle; they are semi-pruned
    * map-side against the (broadcast) batch window keys, so the only
    * exchange on the history side is the distinct over the pruned
    * survivor set. `broadcastBatch = false` turns the prune into a keyed
    * shuffle join for batches too large to broadcast.
    */
  def crossDocSpansAgainstHistory(
      batch: DataFrame,
      historyHashes: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int,
      minDocs: Int = 2,
      broadcastBatch: Boolean = true): DataFrame = {
    require(minDocs >= 2, s"minDocs below 2 would flag every window, got $minDocs")
    // the batch window table feeds THREE consumers (the history prune key
    // set, the in-batch duplication aggregate, and the final mark join) —
    // localCheckpoint so the compute-heavy extraction runs once, not three
    // times (executed-plan audited). Batch-bounded rows (~48 B/window), so
    // the materialization is scale-safe; the HISTORY side stays a
    // never-materialized semi-pruned scan as before.
    val wins = charWindowRows(batch, idCol, textCol, minLen).localCheckpoint()
    val batchKeys = wins.select("win_hash").distinct()
    val histKeys = historyHashes.select("win_hash")
    val histTouched =
      if (broadcastBatch) histKeys.join(broadcast(batchKeys), Seq("win_hash"), "left_semi")
      else histKeys.join(batchKeys, Seq("win_hash"), "left_semi")
    val batchDup =
      if (minDocs == 2)
        wins.groupBy(col("win_hash"))
          .agg(min(col("id")).as("_lo"), max(col("id")).as("_hi"))
          .filter(col("_lo") =!= col("_hi"))
          .select(col("win_hash"))
      else
        wins.groupBy(col("win_hash"))
          .agg(count_distinct(col("id")).as("_df"))
          .filter(col("_df") >= minDocs)
          .select(col("win_hash"))
    val dup = histTouched.union(batchDup).distinct()
    mergeCharIslands(wins.join(dup, Seq("win_hash")).select(col("id"), col("pos")), minLen)
      .withColumnRenamed("id", idCol)
  }

  /** Char spans of `df` whose `minLen`-char windows appear in `hashes` —
    * the HISTORY-ONLY probe next to [[crossDocSpansAgainstHistory]]: no
    * in-batch duplication rule, a window flags iff the hash side holds it.
    * This is the decontamination primitive
    * ([[Decontaminate.exactSubstringOverlap]]): corpus-internal repetition
    * is not contamination, only overlap with the reference set is.
    *
    * Scale shape is the REVERSE of the vs-history dedup probe: the hash
    * side (a benchmark suite) is the small one, so it broadcasts and the
    * corpus NEVER shuffles — window extraction, the hash join, and the
    * island merge are all corpus-partition-local except the per-doc merge
    * window. `broadcastHashes = false` falls back to a keyed join for
    * reference sets too large to broadcast.
    */
  def charSpansMatchingHashes(
      df: DataFrame, hashes: DataFrame, idCol: String, textCol: String,
      minLen: Int, broadcastHashes: Boolean = true): DataFrame = {
    val wins = charWindowRows(df, idCol, textCol, minLen)
    val keys0 = hashes.select("win_hash").distinct()
    val keys = if (broadcastHashes) broadcast(keys0) else keys0
    mergeCharIslands(
      wins.join(keys, Seq("win_hash")).select(col("id"), col("pos")), minLen)
      .withColumnRenamed("id", idCol)
  }

  private val XdocMetaFile = "_xdoc_meta.json"

  /** Persist the distinct window-hash set of `df` as a reusable history
    * artifact for [[crossDocSpansAgainstHistory]]: parquet `(win_hash)`
    * plus a geometry sidecar (minLen) so a later probe or append can never
    * silently mix window lengths.
    */
  def saveCrossDocHashes(
      df: DataFrame, idCol: String, textCol: String, minLen: Int, dir: String): Unit = {
    charWindowRows(df, idCol, textCol, minLen)
      .select("win_hash").distinct()
      .write.mode("overwrite").parquet(dir)
    MetaJson.write(df.sparkSession, dir, XdocMetaFile, Seq("minLen" -> minLen.toLong))
  }

  /** Fold a new batch's window hashes into a persisted artifact — append
    * cost tracks the batch (history files are never read); duplicate
    * hashes across appends collapse at [[loadCrossDocHashes]] time (set
    * union is idempotent, the [[graft.ops.LangModel.append]] discipline).
    */
  def appendCrossDocHashes(
      batch: DataFrame, dir: String, idCol: String, textCol: String): Unit = {
    val minLen = crossDocHashesMinLen(batch.sparkSession, dir)
    charWindowRows(batch, idCol, textCol, minLen)
      .select("win_hash").distinct()
      .write.mode("append").parquet(dir)
  }

  /** Load a persisted window-hash artifact (distinct on read — appends may
    * duplicate); refuses a bare directory.
    */
  def loadCrossDocHashes(spark: SparkSession, dir: String): DataFrame = {
    crossDocHashesMinLen(spark, dir) // validates the sidecar
    spark.read.parquet(dir).select("win_hash").distinct()
  }

  /** Rewrite an append-heavy hash artifact as one-row-per-hash at `dest`
    * (a NEW directory — caller swaps pointers; the
    * [[graft.ops.LangModel.compactTo]] staging discipline).
    */
  def compactCrossDocHashes(spark: SparkSession, path: String, dest: String): Unit = {
    require(path != dest, "compactCrossDocHashes dest must differ from the source artifact")
    val minLen = crossDocHashesMinLen(spark, path)
    loadCrossDocHashes(spark, path).write.mode("overwrite").parquet(dest)
    MetaJson.write(spark, dest, XdocMetaFile, Seq("minLen" -> minLen.toLong))
  }

  /** The artifact's window length, from its geometry sidecar. */
  def crossDocHashesMinLen(spark: SparkSession, dir: String): Int =
    MetaJson.readFields(spark, dir, XdocMetaFile,
      Seq("minLen"), "a window-hash artifact written by saveCrossDocHashes")("minLen").toInt

  /** [[crossDocSpansAgainstHistory]] against a persisted artifact
    * directory — the window length comes from the artifact's own sidecar,
    * so probe geometry can never mismatch what was indexed.
    */
  def crossDocSpansAgainstHistoryDir(
      batch: DataFrame,
      dir: String,
      idCol: String,
      textCol: String,
      minDocs: Int = 2,
      broadcastBatch: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    // probe the RAW hash rows (no load-time distinct): append-duplicated
    // hashes collapse in the probe's own union-distinct anyway, and a
    // distinct here would re-aggregate + re-exchange the pruned survivor
    // set on every batch — the extra exchange the token-grain twin
    // explicitly refuses (Dedup.repeatedSpansAgainstHistory)
    val minLen = crossDocHashesMinLen(spark, dir) // validates the sidecar
    crossDocSpansAgainstHistory(
      batch, spark.read.parquet(dir).select("win_hash"), idCol, textCol,
      minLen, minDocs, broadcastBatch)
  }

  private val SaMetaFile = "_sa_meta.json"

  /** Build [[corpusRanksResolved]] over `df` and persist it as a reusable
    * artifact: parquet `(idCol, pos, corpus_rank, resolved)` plus a
    * `_sa_meta.json` geometry sidecar (seedK, resolveLcp) — the
    * [[SimilaritySearch.saveLshIndex]] contract, so a later
    * [[appendCorpusRanks]] can never silently mix resolution depths.
    */
  def saveCorpusRanks(
      df: DataFrame, idCol: String, textCol: String, dir: String,
      resolveLcp: Int = Int.MaxValue): Unit = {
    corpusRanksResolved(df, idCol, textCol, resolveLcp)
      .write.mode("overwrite").parquet(dir)
    MetaJson.write(df.sparkSession, dir, SaMetaFile,
      Seq("seedK" -> corpusSeedK.toLong, "resolveLcp" -> resolveLcp.toLong))
  }

  /** Load a persisted corpus-rank artifact; refuses a bare directory (no
    * `_sa_meta.json` — not something [[saveCorpusRanks]] wrote).
    */
  def loadCorpusRanks(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    MetaJson.readFields(spark, dir, SaMetaFile, Seq("seedK", "resolveLcp"),
      "an artifact written by saveCorpusRanks")
    spark.read.parquet(dir)
  }

  /** Incremental corpus-suffix-array maintenance for a growing corpus:
    * fold `batch` documents into the persisted rank artifact at `dir`
    * (built by [[saveCorpusRanks]] over `history`) WITHOUT re-running any
    * doubling round whose ties live wholly inside history. Returns — and
    * persists back to `dir` — the combined ranks, rank-for-rank identical
    * to a full [[corpusRanksResolved]] rebuild over `history ∪ batch` at
    * the artifact's own resolveLcp (proven in SuffixArraySpec).
    *
    * Why this is sound: inserting new suffixes never reorders old ones
    * (lexicographic order is absolute), so the artifact's rank is a valid
    * order key among history suffixes FOREVER. The combined seed re-buckets
    * everything by 128-char prefix (min-rank positions are dense, so every
    * row's NUMBER must shift — one slim range exchange, unavoidable for
    * dense output); then
    *   - a seed bucket containing ONLY history rows is ordered by the
    *     frozen old ranks directly — within-bucket min-rank offsets from a
    *     bounded (rank, oldRank) group table — and FREEZES without ever
    *     entering the loop. History's internal duplicated volume (the
    *     thing doubling rounds cost) is never re-resolved;
    *   - only buckets touched by a batch row run doubling rounds, with
    *     `r2` lookups against the combined current state (frozen ranks
    *     are valid order keys; deeper-than-round refinement only splits
    *     groups earlier, never differently — see [[resolveLoop]]).
    * Doubling volume therefore tracks the BATCH's tie footprint (batch
    * duplication + history suffixes sharing a ≥128-char prefix with some
    * batch suffix), not the corpus's.
    *
    * Refusals: bare dir (no sidecar), batch ids colliding with history
    * ids (ranks would alias), artifact/history coverage mismatch (the
    * artifact must hold exactly one row per history suffix — a drifted
    * history df would silently corrupt every rank after it).
    */
  def appendCorpusRanks(
      history: DataFrame,
      batch: DataFrame,
      dir: String,
      idCol: String,
      textCol: String): DataFrame = {
    val spark = history.sparkSession
    val debug = sys.env.contains("GRAFT_SA_DEBUG")
    val t0 = System.nanoTime()
    def dbg(stage: String): Unit =
      if (debug) println(f"[sa-append] $stage at ${(System.nanoTime() - t0) / 1e9}%.2fs")
    val meta = MetaJson.readFields(spark, dir, SaMetaFile,
      Seq("seedK", "resolveLcp"), "an artifact written by saveCorpusRanks")
    require(meta("seedK") == corpusSeedK,
      s"artifact seedK ${meta("seedK")} != engine seedK $corpusSeedK")
    val resolveLcp = meta("resolveLcp")
    val hist = corpusBase(history, idCol, textCol)
    val bat = corpusBase(batch, idCol, textCol)
    require(hist.select(col("id")).distinct()
        .join(bat.select(col("id")).distinct(), Seq("id")).isEmpty,
      "batch ids must be disjoint from history ids")
    val art = spark.read.parquet(dir)
      .select(col(idCol).cast("long").as("id"), col("pos"),
        col("corpus_rank").as("_oldRank"))
    // history prefixes re-extracted map-side (linear, no shuffle); the
    // artifact must cover exactly one row per history suffix
    val oldRows = seedPrefixRows(hist, corpusSeedK)
      .join(art, Seq("id", "pos"))
      .localCheckpoint()
    val nJoin = oldRows.count()
    val nArt = art.count()
    // one suffix per character: Σ length(t) counts history's suffix rows
    // without re-running the seed explode
    val nHist = hist.agg(coalesce(sum(length(col("t"))), lit(0L)))
      .head().getLong(0)
    require(nArt == nJoin && nHist == nJoin,
      s"artifact holds $nArt suffix rows, history df has $nHist, " +
        s"$nJoin match — history and artifact have drifted; rebuild instead")
    dbg("integrity checks done")
    val union = oldRows
      .select(col("id"), col("pos"), col("_pfx"), col("_oldRank"))
      .unionByName(seedPrefixRows(bat, corpusSeedK)
        .select(col("id"), col("pos"), col("_pfx"),
          lit(null).cast("long").as("_oldRank")))
    val seeded = globalMinRank(union, Seq(col("_pfx")), dropBeforeCheckpoint = Seq("_pfx"))
    // [[classifyAppend]] does the bucket triage — singleton / all-old
    // (freeze by old-rank offsets) / mixed (pending) — at the seed, and
    // the SAME triage re-runs after every doubling round, so history-only
    // ties exit the loop the moment the last new row splits away
    val initial = classifyAppend(seeded).localCheckpoint()
    dbg("seed + bucket classification done")
    val maxLen = math.max(maxDocLen(hist), maxDocLen(bat))
    val out = resolveLoop(initial, maxLen, resolveLcp, classifyAppend)
      .select(col("id").as(idCol), col("pos"), col("rank").as("corpus_rank"),
        col("resolved"))
      // materialize BEFORE overwriting the artifact the plan reads from
      .localCheckpoint()
    dbg("resolve loop done")
    out.write.mode("overwrite").parquet(dir)
    MetaJson.write(spark, dir, SaMetaFile,
      Seq("seedK" -> corpusSeedK.toLong, "resolveLcp" -> resolveLcp.toLong))
    out
  }

  /** Two-phase global MIN-rank over `keys` — the scalable replacement for
    * an unpartitioned `rank().over(orderBy(keys))` (which moves everything
    * to ONE partition): range-partition on the keys (equal keys land
    * together — the RangePartitioner contract that makes local ranks
    * compose), rank WITHIN each partition, then add each partition's ROW
    * count as an offset via a ≤numPartitions-row broadcast. Output: input
    * columns + `rank` (1-based; tied keys share the position of the
    * group's first row — the Manber-Myers bucket number, whose freeze
    * property [[ranksGlobal]]'s pending-only rounds depend on). Range
    * bounds come from sampling, so PARTITION SIZES vary run to run — rank
    * VALUES never do (the composition is exact for any bounds).
    */
  private[graft] def globalMinRank(
      df: DataFrame, keys: Seq[Column],
      dropBeforeCheckpoint: Seq[String] = Nil): DataFrame = {
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    // materialized ONCE: both consumers below (the offsets aggregate and
    // the final join) must see the SAME partition ids — the range
    // partitioner's sampled bounds are not deterministic across separate
    // computations, so an unmaterialized plan could hand each branch a
    // different _pid assignment and misalign the offsets.
    // `dropBeforeCheckpoint` names key-only columns (the ≤128-char seed
    // prefix) no consumer reads after the rank is assigned: dropping them
    // BEFORE the checkpoint materializes slim (id, pos, rank) rows instead
    // of re-writing the corpus-sized prefix payload to local disk.
    val local = df
      .repartitionByRange(nPart, keys: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lrank",
        rank().over(Window.partitionBy(col("_pid")).orderBy(keys: _*)).cast("long"))
      .drop(dropBeforeCheckpoint: _*)
      .localCheckpoint()
    // per-partition row counts → cumulative offsets: a ≤numPartitions-row
    // table (the epochShuffle offsets pattern) — the single-partition
    // window is bounded by construction
    val offsets = local
      .groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
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
      // longest shared prefix of suffixes at i and j, capped at maxLcp:
      // extract each suffix's cap window ONCE (two O(pos) seeks instead of
      // the old per-character substring(t, pos+x, 1) re-seek — O(m·pos)
      // per pair) and compare with the codegen'd single-walk LCP
      val m = least(shorter, lit(maxLcp.toLong))
      graft.Functions.commonPrefixLen(
        col("t").substr((col("i") + 1L).cast("int"), m.cast("int")),
        col("t").substr((col("j") + 1L).cast("int"), m.cast("int")),
        m)
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
