package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Deduplication operators for large-scale text corpora: exact, MinHash-LSH,
  * SimHash, and blocked n-gram Jaccard. All hashing is md5-based so every
  * result is reproducible in any SQL engine (see [[graft.Functions.md5Bits]]).
  *
  * Scale design: nothing here compares all pairs. Exact dedup is one
  * hash-`groupBy`; MinHash pairs only meet inside an LSH band bucket;
  * Jaccard pairs only meet inside caller-chosen blocking keys. At 100 TB the
  * only shuffles are keyed exchanges on (hash) or (band, signature).
  */
object Dedup {

  /** Whitespace tokens of lower-cased, trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Exact duplicate groups keyed by md5 of normalized text. Returns one row
    * per distinct content hash: the canonical (minimum) id, the duplicate
    * count, and the hash. Map-side combinable single shuffle.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(trim(lower(col(textCol)))).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_count"))

  /** Cross-document repeated-span detection — the exact-substring dedup of
    * Lee et al., "Deduplicating Training Data Makes Language Models Better"
    * (ACL 2022), at token-window grain: every `windowTokens`-token window
    * of every document is hashed; windows whose hash occurs in at least
    * `minDocs` DISTINCT documents are duplicated content, and each
    * document's overlapping/adjacent duplicated windows merge into maximal
    * spans `(id, span_start, span_end)` (token offsets, end exclusive) for
    * the caller to cut or mask.
    *
    * Scale shape: the window explode is the honest price of exactness —
    * ONE row per token (each token starts at most one window), linear in
    * corpus size, exactly how ExactSubstr deploys without a distributed
    * suffix array. Everything after is keyed: one hash-groupBy for
    * document frequency, one keyed join back, one per-document window for
    * the island merge. No driver state, no global sort.
    */
  def repeatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int,
      minDocs: Int = 2): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")
    require(minDocs >= 2, s"minDocs below 2 would flag every window, got $minDocs")
    val wins = windowRows(df, idCol, textCol, windowTokens)
    mergeIslands(filterCrossDoc(wins, "win_hash", idCol, minDocs),
      idCol, windowTokens)
  }

  /** Keys (window hashes or window contents) occurring in at least
    * `minDocs` distinct documents. At the default minDocs = 2, "two
    * distinct docs" is just min(id) ≠ max(id) — two map-side-combinable
    * aggregates instead of count_distinct's two-phase distinct expansion
    * over every (key, doc) pair, on the corpus-sized window table.
    */
  private def crossDocKeys(
      rows: DataFrame, keyCol: String, idCol: String, minDocs: Int): DataFrame =
    if (minDocs == 2)
      rows.groupBy(keyCol)
        .agg(min(col(idCol)).as("_lo"), max(col(idCol)).as("_hi"))
        .filter(col("_lo") =!= col("_hi"))
        .select(keyCol)
    else
      rows.groupBy(keyCol)
        .agg(count_distinct(col(idCol)).as("df"))
        .filter(col("df") >= minDocs)
        .select(keyCol)

  private def crossDocHashes(wins: DataFrame, idCol: String, minDocs: Int): DataFrame =
    crossDocKeys(wins, "win_hash", idCol, minDocs)

  /** `rows` filtered to keys occurring in at least `minDocs` distinct
    * documents. For `minDocs == 2` the shape is size-adaptive: `large` is
    * [[SizeAdaptive.isLarge]] of the op's SOURCE relation (the document
    * table — parquet-backed, so its stats are honest; the exploded
    * window/content streams fed here carry Catalyst explode-multiplied
    * estimates that read ~30 GB at sf0.1 and would flip the gate locally):
    *
    *  - BELOW the threshold (every local bench/oracle run): the r14
    *    key-partitioned window min/max — one keyed exchange, one pass, the
    *    (corpus-sized, compute-heavy) window-extraction subtree planned
    *    ONCE. Measured fastest locally (the join-back shape costs +0.3-0.8s
    *    on q_dd_spans/q_sa_crossdoc_spans at sf0.1).
    *  - ABOVE it: a min/max aggregate + co-partitioned SHUFFLE_HASH
    *    join-back over ONE explicit key exchange shared by both sides —
    *    extraction still planned once (ReuseExchange), the duplicated-key
    *    set never broadcasts, and a HOT key (one window content repeated
    *    across ~10^5 documents — cookie banners, license headers) streams
    *    through a constant-state HashAggregate and a hash-join probe
    *    instead of serializing into one WindowExec task's sort+buffer:
    *    window partitions are not AQE-skew-splittable. The sa_hotkey
    *    ScaleProbe gates this shape.
    *
    * `minDocs > 2` keeps the plain aggregate shape: a distinct-count window
    * would hold per-key id sets in memory, which the two-phase aggregate
    * deliberately avoids.
    */
  private def filterCrossDoc(
      rows: DataFrame, keyCol: String, idCol: String, minDocs: Int,
      large: Boolean): DataFrame =
    if (minDocs == 2) {
      if (large) {
        val nPart = rows.sparkSession.sessionState.conf.numShufflePartitions
        val keyed = rows.repartition(nPart, col(keyCol))
        val dup = keyed.groupBy(col(keyCol))
          .agg(min(col(idCol)).as("_lo"), max(col(idCol)).as("_hi"))
          .filter(col("_lo") =!= col("_hi"))
          .select(col(keyCol))
        keyed.join(dup.hint("SHUFFLE_HASH"), Seq(keyCol))
          .select(rows.columns.map(col).toIndexedSeq: _*)
      } else {
        val w = Window.partitionBy(col(keyCol))
        rows
          .withColumn("_lo", min(col(idCol)).over(w))
          .withColumn("_hi", max(col(idCol)).over(w))
          .filter(col("_lo") =!= col("_hi"))
          .drop("_lo", "_hi")
      }
    } else
      rows.join(crossDocKeys(rows, keyCol, idCol, minDocs), keyCol)

  /** (id, start_pos, win_hash) — one row per `windowTokens`-token window of
    * every document; the shared explode of the repeated-span family. The
    * distinct `win_hash` set is the persistable corpus artifact for
    * [[repeatedSpansAgainstHistory]].
    */
  def windowRows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int): DataFrame =
    windowTextRows(df, idCol, textCol, windowTokens)
      .select(col(idCol), col("start_pos"), col("win_hash"))

  /** Merge each document's flagged window start positions into maximal
    * (span_start, span_end) islands — overlapping or exactly adjacent
    * windows form one contiguous duplicated region.
    */
  private def mergeIslands(hits: DataFrame, idCol: String, windowTokens: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("start_pos"))
    hits
      .select(col(idCol), col("start_pos"))
      .withColumn("prev", lag(col("start_pos"), 1).over(w))
      // a window reaches start_pos + windowTokens: merge the next one when
      // it starts at or before that point
      .withColumn("new_span",
        when(col("prev").isNull || col("start_pos") > col("prev") + windowTokens, 1)
          .otherwise(0))
      .withColumn("span_id",
        sum(col("new_span")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("span_id"))
      .agg(min(col("start_pos")).as("span_start"),
        (max(col("start_pos")) + windowTokens).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  /** Incremental [[repeatedSpans]] for a growing corpus: spans in BATCH
    * documents whose windows either already exist in `historyHashes` (the
    * persisted distinct `win_hash` artifact of everything ingested so far —
    * see [[windowRows]]) or repeat across at least `minDocs` distinct batch
    * documents. The same never-reshuffle-history discipline as
    * [[newAgainstHistory]]: history rows are semi-joined map-side against
    * the (broadcast) batch window keys, so the only shuffle on the history
    * side is the distinct over the pruned survivor set; with
    * `broadcastBatch = false` the prune becomes a keyed shuffle join for
    * batches too large to broadcast.
    */
  def repeatedSpansAgainstHistory(
      batch: DataFrame,
      historyHashes: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int,
      minDocs: Int = 2,
      broadcastBatch: Boolean = true): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")
    require(minDocs >= 2, s"minDocs below 2 would flag every window, got $minDocs")
    // batch windows feed THREE consumers (history prune keys, in-batch
    // duplication, final mark join) — localCheckpoint so the explode runs
    // once. Batch-bounded, so materializing is scale-safe; history stays
    // the never-materialized semi-pruned scan.
    val wins = windowRows(batch, idCol, textCol, windowTokens).localCheckpoint()
    val batchKeys = wins.select("win_hash").distinct()
    val histKeys = historyHashes.select("win_hash")
    // no inner distinct on the survivors: the union's distinct below is the
    // single dedup shuffle — an extra one here would double the exchange
    val histTouched =
      if (broadcastBatch) histKeys.join(broadcast(batchKeys), Seq("win_hash"), "left_semi")
      else histKeys.join(batchKeys, Seq("win_hash"), "left_semi")
    val dup = histTouched.union(crossDocHashes(wins, idCol, minDocs)).distinct()
    mergeIslands(wins.join(dup, "win_hash"), idCol, windowTokens)
  }

  /** The shared tokenization of the repeated-span family: [[windowTextRows]]
    * (pass 1, hashing) and [[repeatedSpansExact]]'s verification rebuild
    * (pass 2, content) BOTH go through these expressions, so the two passes
    * can never disagree on what a token or a window string is. The joint is
    * the unit separator: token boundaries must survive the concat or
    * ("ab","c") and ("a","bc") would alias. */
  private def cleanTokens(text: Column): Column =
    filter(tokens(text), t => t =!= "")

  private def windowJoint(toks: Column, start0: Column, windowTokens: Int): Column =
    concat_ws("\u0001", slice(toks, start0 + 1, lit(windowTokens)))

  /** The single window-derivation source of truth: (id, start_pos,
    * win_text, win_hash) with `win_hash = md5(win_text)` — [[windowRows]]
    * projects the hash side; [[repeatedSpansExact]]'s verification pass
    * rebuilds the content side from the same [[cleanTokens]]/[[windowJoint]]
    * expressions, so the two can never drift apart.
    */
  private def windowTextRows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int): DataFrame = {
    // explicit-count repartition by id before the generator (the
    // shingleRows discipline): per-window compute (joins, md5) vastly
    // exceeds bytes per input row, so a scan with few input splits would
    // otherwise serialize the whole explode into one task
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val base = df
      .repartition(parallelism, col(idCol))
      .select(col(idCol), cleanTokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= windowTokens)
    // windows via posexplode(arrays_zip(shifted slices)) — the shingleRows
    // shape: n linear array ops ONCE per document inside the generator,
    // all codegen'd, where the old transform(sequence(...), windowJoint)
    // evaluated the slice+concat lambda INTERPRETED per window (~60 µs
    // each — the documented HOF cost this file's shingleRows already
    // avoids). Full windows only: the zip pads trailing rows with nulls in
    // field t{w-1}, exactly the start positions past size−w the old
    // sequence(0, size−w) never generated.
    val w = windowTokens
    val exploded =
      if (w == 1)
        base.select(col(idCol), posexplode(col("toks")).as(Seq("start_pos", "win_text")))
      else {
        val streams = col("toks").as("t0") +: (1 until w).map(k =>
          slice(col("toks"), lit(k + 1), size(col("toks"))).as(s"t$k"))
        base
          .select(col(idCol), posexplode(arrays_zip(streams: _*)).as(Seq("start_pos", "_z")))
          .filter(col(s"_z.t${w - 1}").isNotNull)
          .select(col(idCol), col("start_pos"),
            concat_ws("\u0001", (0 until w).map(k => col(s"_z.t$k")): _*).as("win_text"))
      }
    exploded.withColumn("win_hash", md5(col("win_text")))
  }

  /** Exact-substring spans at THRESHOLD grain — the suffix-array detection
    * semantics of Lee et al.'s ExactSubstr, closing [[repeatedSpans]]'
    * sub-window blind spot: that operator conflates its indexing window
    * with the match threshold, so duplicates SHORTER than `windowTokens`
    * (including whole documents below the window size, which its explode
    * skips outright) are invisible. Here `minMatchTokens` IS the match
    * threshold: every cross-document duplicated substring of at least
    * `minMatchTokens` tokens is found with exact maximal extents — a
    * duplicated run of length L ≥ t contains the stride-1 t-token window at
    * each of its L−t+1 start positions, and the island merge reconstructs
    * [s, s+L) exactly, which is the guarantee a suffix array gives by
    * construction (proven against the brute-force reference in
    * SpansPropertySpec, and against [[repeatedSpans]] at equal grain).
    *
    * Detection is also strictly exact, not 128-bit-probable: candidate
    * hashes from the first pass are RE-VERIFIED by grouping on the actual
    * window token content, so an md5 collision can never flag a span that
    * is not truly duplicated.
    *
    * Scale shape: the corpus is tokenized and window-hashed ONCE — pass 1
    * is [[windowRows]]' linear explode + the keyed cross-doc aggregate,
    * exactly as [[repeatedSpans]] (one row per token — the honest linear
    * cost). Pass 2 never re-walks the corpus: surviving (id, start_pos)
    * pairs aggregate per (document, bounded position chunk) — a long-only
    * exchange bounded by duplicated volume, with no single row holding an
    * unbounded array — join back to the RAW text keyed by id — pruning
    * the text side to documents that still hold a candidate — and window
    * content is rebuilt by slicing only at surviving positions. The
    * string-carrying exchange is therefore bounded by the corpus'
    * duplicated volume, not its size, and window strings are built for
    * survivors only instead of every window a second time. No driver
    * state, no global sort.
    */
  def repeatedSpansExact(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minMatchTokens: Int,
      minDocs: Int = 2): DataFrame = {
    require(minMatchTokens >= 1, s"minMatchTokens must be >= 1, got $minMatchTokens")
    require(minDocs >= 2, s"minDocs below 2 would flag every window, got $minDocs")
    val wins = windowRows(df, idCol, textCol, minMatchTokens)
    // verification pass: survivor positions per doc, then window text
    // re-derived ONLY for those positions — same tokens() pipeline as
    // windowTextRows, so pass-2 content can never drift from pass-1 hashes.
    // Positions aggregate per (doc, 4096-position chunk), not per doc: a
    // pathologically self-duplicated large document then spreads its
    // position set across many bounded rows instead of concentrating one
    // unbounded array (one long per token) on a single row. Typical docs
    // land in one chunk, so the text side is still replicated ~once.
    val posChunk = 4096L
    val survivorPos = filterCrossDoc(wins, "win_hash", idCol, minDocs)
      .groupBy(col(idCol), floor(col("start_pos") / posChunk).as("_chunk"))
      .agg(collect_list(col("start_pos")).as("_pos"))
      .drop("_chunk")
    val content = df.join(survivorPos, Seq(idCol))
      .select(col(idCol),
        cleanTokens(col(textCol)).as("_toks"),
        explode(col("_pos")).as("start_pos"))
      .select(col(idCol), col("start_pos"),
        windowJoint(col("_toks"), col("start_pos"), minMatchTokens).as("win_text"))
    mergeIslands(filterCrossDoc(content, "win_text", idCol, minDocs),
      idCol, minMatchTokens)
  }

  /** Per-document duplication coverage from a [[repeatedSpans]] result:
    * (id, dup_tokens, total_tokens, dup_ratio) — the curation-gate signal
    * ("drop documents that are mostly boilerplate") that pairs with
    * [[graft.ops.TextAnalysis.qualityMetrics]]. Spans are disjoint maximal
    * islands by construction, so their lengths sum without overlap. One
    * keyed left join; empty documents report ratio 0.
    */
  def spanCoverage(
      df: DataFrame,
      spans: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val perDoc = spans.groupBy(col(idCol))
      .agg(sum(col("span_end") - col("span_start")).as("_dup"))
    // null text counts as empty: size(NULL) is -1 under Spark's legacy
    // sizeOfNull, which would corrupt token totals and diverge from the
    // SQL oracle's NULL arithmetic
    df.select(col(idCol),
        size(filter(tokens(coalesce(col(textCol), lit(""))), t => t =!= ""))
          .as("total_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("_dup"), lit(0L)).cast("long").as("dup_tokens"),
        col("total_tokens"),
        when(col("total_tokens") === 0, lit(0.0))
          .otherwise(graft.Functions.roundHalfUp(
            coalesce(col("_dup"), lit(0L)) / col("total_tokens"), 6))
          .as("dup_ratio"))
  }

  /** Apply side of [[repeatedSpans]]: cut every flagged token span out of
    * each document, keeping first-token normalization (lower/trim/
    * whitespace-collapse) — the "deduplicate the training set in place"
    * step of Lee et al. Documents with no spans pass through with the same
    * normalization, so output text is a pure function of (tokens, spans).
    *
    * Shape: ONE keyed left join (doc → its span list, spans per doc are
    * few by construction) and per-row array lambdas — no explode, no
    * window, no second shuffle.
    */
  def removeSpans(
      df: DataFrame,
      spans: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val spansAgg = spans.groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("_spans"))
    df.join(spansAgg, Seq(idCol), "left")
      .select(col(idCol),
        // null text cleans to '' (not NULL) — flags surface, rows never vanish
        filter(tokens(coalesce(col(textCol), lit(""))), t => t =!= "").as("_toks"),
        col("_spans"))
      .select(
        col(idCol),
        concat_ws(" ", transform(
          filter(
            // pair every token with its index; spans address token offsets
            arrays_zip(
              col("_toks").as("tok"),
              sequence(lit(0), greatest(size(col("_toks")) - 1, lit(0))).as("idx")),
            z => coalesce(
              !exists(col("_spans"),
                s => z.getField("idx") >= s.getField("span_start") &&
                  z.getField("idx") < s.getField("span_end")),
              lit(true))),
          z => z.getField("tok"))).as("clean_text"))
  }

  /** Apply side of [[graft.ops.SuffixArray.crossDocSpans]]: cut every
    * flagged CHARACTER span `[span_start, span_end)` out of each document's
    * raw text — no tokenization, no normalization; documents with no spans
    * pass through byte-identical (NULL text cleans to '' so flags surface
    * and rows never vanish, the [[removeSpans]] rule).
    *
    * Shape: ONE keyed left join (doc → its sorted span list; spans per doc
    * are few by construction) and a per-row `aggregate` stitch over the
    * span array — cursor walks the text once appending the kept segment
    * before each span, then the tail. No explode, no window, no second
    * shuffle. Precondition: spans within a doc are disjoint (the island
    * merge guarantees it); an overlapping span would stitch a negative-
    * length segment, which substr treats as empty — over-removal, never
    * resurrection.
    */
  def removeCharSpans(
      df: DataFrame,
      spans: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val spansAgg = spans.groupBy(col(idCol))
      .agg(sort_array(collect_list(
        struct(col("span_start"), col("span_end")))).as("_spans"))
    val txt = coalesce(col(textCol), lit(""))
    val stitched = aggregate(
      col("_spans"),
      struct(lit(0L).as("cur"), lit("").as("acc")),
      (a, sp) => struct(
        sp.getField("span_end").as("cur"),
        concat(a.getField("acc"),
          txt.substr((a.getField("cur") + 1L).cast("int"),
            (sp.getField("span_start") - a.getField("cur")).cast("int")))
          .as("acc")),
      a => concat(a.getField("acc"),
        txt.substr((a.getField("cur") + 1L).cast("int"),
          length(txt) - a.getField("cur").cast("int"))))
    df.join(spansAgg, Seq(idCol), "left")
      .select(col(idCol),
        when(col("_spans").isNull, txt).otherwise(stitched).as("clean_text"))
  }

  /** Exploded (carryCols..., shingle) rows: `n`-word shingles built with
    * `posexplode` + window `lead`, NOT `transform`/`slice` higher-order
    * functions — every operator here is whole-stage-codegen'd, while
    * interpreted HOF shingling costs ~60 µs *per shingle*. Documents
    * shorter than `n` words yield their whole text as one (clipped)
    * shingle. Rows are NOT deduplicated (min-aggregates don't care;
    * set-consumers dedup downstream).
    */
  def shingleRows(
      df: DataFrame, idCol: String, textCol: String, n: Int,
      carryCols: Seq[Column] = Seq.empty): DataFrame = {
    require(n >= 1)
    val toks = tokens(col(textCol))
    val carried = carryCols.zipWithIndex.map { case (c, i) => c.as(s"_c$i") }
    val carriedNames = carryCols.indices.map(i => col(s"_c$i"))
    // explicit-count repartition by id: compute per shingle (md5s, window
    // sort) vastly exceeds bytes per shingle, so AQE's size-based
    // coalescing would otherwise serialize this pipeline into one task;
    // an explicit partition count is respected, and the window + any
    // downstream groupBy(id) reuse the same hash partitioning (no second
    // exchange)
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // NO size(toks) column here: a token-count projection alongside the
    // generator collapses ABOVE it, which forces the raw text through
    // GenerateExec's requiredChildOutput and re-evaluates the regex split
    // per OUTPUT row — O(doc_len) per shingle, ~1 ms/row on a 29 KB doc
    // (the r11 sa_skew e2e finding). And NO window lead either (the r11
    // interim fix — correct, but it bought skew robustness with a
    // per-document SORT every shingle consumer paid, q_tx_ppmi 2.5x):
    // the n token streams are aligned BEFORE the generator instead —
    // arrays_zip of the n−1 shifted slices, n linear array ops ONCE per
    // document, all inside the generator expression, so GenerateExec's
    // child carries only the zipped array (never the raw text) and nothing
    // re-evaluates per output row. Trailing-window structs carry nulls;
    // concat_ws skips them, producing exactly the clipped shingle, and
    // field (n−1)'s null-ness marks incomplete tails — completeness with
    // neither a sort nor a token count.
    val shingled =
      if (n == 1)
        df.repartition(parallelism, col(idCol))
          .select(col(idCol) +: carried :+ posexplode(toks): _*)
          .withColumn("shingle", col("col"))
      else {
        // tokenize ONCE into a column first: the zip references the token
        // array n+1 times, and CollapseProject keeps the split
        // un-duplicated because re-inlining a non-cheap expression n+1
        // times is exactly what it refuses to do
        val streams = col("_toks").as("t0") +: (1 until n).map(k =>
          slice(col("_toks"), lit(k + 1), size(col("_toks"))).as(s"t$k"))
        // pos 0 always survives (documents shorter than n words yield
        // their whole text as one clipped shingle — the documented
        // contract)
        df.repartition(parallelism, col(idCol))
          .select(col(idCol) +: carried :+ toks.as("_toks"): _*)
          .select(col(idCol) +: carriedNames :+ posexplode(arrays_zip(streams: _*)): _*)
          .filter(col(s"col.t${n - 1}").isNotNull || col("pos") === 0)
          .withColumn("shingle",
            concat_ws(" ", (0 until n).map(k => col(s"col.t$k")): _*))
      }
    shingled.select(col(idCol) +: carriedNames :+ col("shingle"): _*)
  }

  /** MinHash signatures over `shingle`-word shingles: `numHashes` columns
    * `mh0..mh{k-1}` per id — each the lexicographic minimum of seeded md5
    * hex digests over the document's distinct shingles (any total order over
    * a uniform hash is a valid MinHash permutation; hex strings keep it
    * engine-portable). Shingles (not unigrams) are essential for
    * selectivity: real corpora share most of their *vocabulary*, so
    * word-level minhashes collide constantly, while n-word sequences only
    * collide between genuinely similar documents. The per-seed minima are
    * computed by a hash aggregate over [[shingleRows]] — codegen'd and
    * map-side partial-aggregated.
    */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingle: Int = 3): DataFrame = {
    val rows = shingleRows(df, idCol, textCol, shingle)
    val aggs = (0 until numHashes)
      .map(i => min(md5(concat(lit(s"s$i:"), col("shingle")))).as(s"mh$i"))
    rows.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash-LSH candidate pairs: split the `numHashes` signature into
    * `bands`; ids sharing any band signature are candidates. Emits distinct
    * (id_a < id_b) pairs. The self-join is keyed on (band index, band
    * signature) — with r = numHashes/bands hash rows per band a pair
    * collides with probability jaccard^r per band, so the join side stays
    * tiny even over billions of documents. Defaults (8 hashes, 2 bands of 4)
    * target high-similarity near-dups; raise `bands` for higher recall.
    */
  /** One row per (document, band): `(idCol, band, sig)` with `sig` the
    * band's joined MinHash slots — the LSH bucket key. The shared banding
    * of [[minhashLshPairs]] and the persistable near-dup history artifact
    * of [[Curate.decideWebAgainstHistory]] (two docs are LSH candidates
    * iff they share a (band, sig) row, so the distinct (band, sig) set of
    * kept history IS the collision index).
    */
  def lshBandRows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      bands: Int = 2,
      shingle: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val sigs = minhashSignatures(df, idCol, textCol, numHashes, shingle)
    val bandCols = (0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        concat_ws("_", (0 until rows).map(r => col(s"mh${b * rows + r}")): _*).as("sig"))
    }
    sigs
      .select(col(idCol), explode(array(bandCols: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      bands: Int = 2,
      shingle: Int = 3): DataFrame = {
    val banded = lshBandRows(df, idCol, textCol, numHashes, bands, shingle)
    // Self-join as SHUFFLE_HASH, not broadcast: both sides then shuffle on
    // identical (band, sig) exchanges and ReuseExchange computes the
    // signature pipeline ONCE in parallel — a broadcast build would
    // re-evaluate it a second time, single-threaded, on the driver.
    val a = banded.alias("a")
    val b = banded.hint("SHUFFLE_HASH").alias("b")
    a.join(
        b,
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** SimHash fingerprint over distinct tokens: bit `b` of the fingerprint is
    * set when more token hashes have bit `b` set than clear. `bits` ≤ 32.
    * Computed as one `groupBy`-free projection plus per-document reduce —
    * no explode over bits, no shuffle at all (fingerprints are per-row).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame = {
    require(bits > 0 && bits <= 32)
    val toks = array_distinct(tokens(col(textCol)))
    // per-token 32-bit hash (md5 first 8 hex chars)
    val hashes = transform(toks, t => graft.Functions.md5Bits(t, 32))
    val fingerprint = (0 until bits)
      .map { b =>
        val votes = aggregate(
          hashes,
          lit(0L),
          (acc: Column, h: Column) => acc + shiftright(h, b).bitwiseAND(1L) * 2L - 1L)
        when(votes > 0, lit(1L << b)).otherwise(lit(0L))
      }
      .reduce(_ + _)
    df.select(col(idCol), fingerprint.as("simhash"))
  }

  /** SimHash near-duplicate pairs within Hamming distance `maxHamming` —
    * the Charikar/Google near-dup detector completed into a pair generator.
    * Pigeonhole banding makes it a keyed join, never all-pairs: split the
    * `bits`-bit fingerprint into `maxHamming + 1` contiguous bands; two
    * fingerprints within the radius MUST agree exactly on ≥1 band, so
    * candidates meet on (band index, band value) and only candidates pay
    * the popcount verify (`bit_count(a XOR b)` — codegen'd). Same
    * SHUFFLE_HASH/ReuseExchange shape as [[minhashLshPairs]]: the
    * fingerprint pipeline is computed once, exchanges are keyed, and a
    * radius-`k` corpus stays ~linear in rows at fixed duplicate density.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 16,
      maxHamming: Int = 3): DataFrame =
    hammingPairs(simhash(df, idCol, textCol, bits), idCol, "simhash", bits, maxHamming)

  /** Banded Hamming-distance pairs over ANY integer fingerprint column —
    * the pigeonhole join [[simhashPairs]] uses, factored out so other
    * fingerprints (image dHash, audio chromaprints) get the same scale
    * path: radius-k pairs must agree exactly on at least one of k+1
    * contiguous bit bands, so candidates meet in a KEYED equi-join on
    * (band, band value) and the popcount verify runs only on candidates.
    * NULL fingerprints (undecodable assets) are excluded.
    */
  def hammingPairs(
      df: DataFrame,
      idCol: String,
      hashCol: String,
      bits: Int,
      maxHamming: Int): DataFrame = {
    require(bits >= 1 && bits <= 64, s"bits=$bits out of [1, 64]")
    require(maxHamming >= 0 && maxHamming < bits, "need 0 <= maxHamming < bits")
    val nBands = maxHamming + 1
    // distribute bits floor/ceil across bands so EVERY band holds >= 1 real
    // bit: a uniform ceil width would push trailing bands past the
    // fingerprint (bits=16, maxHamming=4 → shifts 0,4,8,12,16 — the last
    // band is constant 0 for every document and the join degenerates into
    // an all-pairs cross product). Pigeonhole needs only contiguity and
    // full coverage, which floor/ceil widths preserve.
    val baseW = bits / nBands
    val widths = (0 until nBands).map(b => baseW + (if (b < bits % nBands) 1 else 0))
    val starts = widths.scanLeft(0)(_ + _)
    def mask(w: Int) = if (w >= 64) lit(-1L) else lit((1L << w) - 1)
    val banded = df
      .filter(col(hashCol).isNotNull)
      .select(col(idCol), col(hashCol),
        posexplode(array((0 until nBands).map { b =>
          shiftright(col(hashCol), starts(b)).bitwiseAND(mask(widths(b)))
        }: _*)))
      .select(col(idCol), col(hashCol), col("pos").as("band"), col("col").as("bval"))
    val a = banded.alias("a")
    val b = banded.hint("SHUFFLE_HASH").alias("b")
    a.join(
        b,
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(col(s"a.$hashCol").bitwiseXOR(col(s"b.$hashCol"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Blocked n-gram (word-shingle) Jaccard near-duplicate pairs: documents
    * are only compared within equal `blockCols` values (LSH-style blocking —
    * the caller picks cheap invariants such as language + length bucket),
    * and pairs survive when Jaccard over distinct `n`-word shingles ≥
    * `threshold`.
    *
    * Implementation: an inverted-index (set-similarity) join, not per-pair
    * set intersection. Shingles are hashed to 60-bit longs, exploded, and
    * pairs meet on (block, shingle-hash); a keyed count then yields |A∩B|
    * and `|A∪B| = |A|+|B|-|A∩B|`. Three wins over `array_intersect` per
    * pair: only pairs sharing ≥1 shingle are ever materialized (a positive
    * threshold implies intersection > 0), the shuffle key (block, shingle)
    * is high-cardinality so no skewed block serializes a quadratic loop,
    * and every stage is codegen'd — no interpreted set ops.
    */
  /** Shared inverted-index pair counting: distinct hashed shingles per id,
    * pairs meet on (block, shingle-hash), keyed count yields
    * (id_a, id_b, sz_a, sz_b, inter) — every set-similarity measure
    * (Jaccard, containment, overlap) is a thin projection on top.
    */
  private def countedShinglePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[Column],
      n: Int): DataFrame = {
    // distinct (id, block..., shingle-hash) rows; shingles hashed to 60-bit
    // longs (md5 collisions negligible) so all downstream keys are fixed-width
    val blockKeys = blockCols.indices.map(i => s"_c$i")
    val hashedRows = shingleRows(df, idCol, textCol, n, carryCols = blockCols)
      .select(
        col(idCol).as("id") +: blockKeys.map(col) :+
          graft.Functions.md5Bits(col("shingle"), 60).as("shh"): _*)
      .groupBy(col("id") +: blockKeys.map(col) :+ col("shh"): _*)
      .agg(count(lit(1)).as("_dup")) // dedup; count unused
      .drop("_dup")
    val wSz = Window.partitionBy(col("id"))
    val inv = hashedRows.withColumn("sz", count(lit(1)).over(wSz))
    val a = inv.alias("a")
    val b = inv.hint("SHUFFLE_HASH").alias("b")
    val joinCond = (blockKeys.map(k => col(s"a.$k") === col(s"b.$k")) :+
      (col("a.shh") === col("b.shh")) :+ (col("a.id") < col("b.id"))).reduce(_ && _)
    a.join(b, joinCond)
      .groupBy(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(count(lit(1)).cast("double").as("inter"))
  }

  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[Column],
      n: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    require(threshold > 0.0, "inverted-index jaccard requires a positive threshold")
    val counted = countedShinglePairs(df, idCol, textCol, blockCols, n)
    val union = (col("sz_a") + col("sz_b")).cast("double") - col("inter")
    val jac = when(union === 0.0, lit(1.0)).otherwise(col("inter") / union)
    counted
      .select(col("id_a"), col("id_b"), graft.Functions.roundHalfUp(jac, 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Near-containment pairs: how much of the SMALLER shingle set lives
    * inside the pair's intersection — `inter / min(|A|, |B|)`. Catches
    * subset duplicates (a document embedded in a longer one) that Jaccard
    * misses: a 100-line doc fully contained in a 1000-line doc has Jaccard
    * ≈ 0.1 but containment 1.0. Same inverted-index shape, same 100 TB
    * properties as [[ngramJaccardPairs]].
    */
  def ngramContainmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[Column],
      n: Int = 2,
      threshold: Double = 0.8): DataFrame = {
    require(threshold > 0.0, "inverted-index containment requires a positive threshold")
    val counted = countedShinglePairs(df, idCol, textCol, blockCols, n)
    val denom = least(col("sz_a"), col("sz_b")).cast("double")
    val cont = when(denom === 0.0, lit(1.0)).otherwise(col("inter") / denom)
    counted
      .select(col("id_a"), col("id_b"),
        graft.Functions.roundHalfUp(cont, 4).as("containment"))
      .filter(col("containment") >= threshold)
  }

  // ---- streaming ----------------------------------------------------------

  /** A unit of streamed document text: whole documents, or pieces of one
    * arriving over time (late supplements, multi-part fetches).
    */
  case class DocChunk(docId: Long, text: String)
  case class MinhashState(mins: Seq[String], updates: Long)

  /** Emitted signature snapshot; `updates` counts state revisions so a
    * consumer (or test) can pick each doc's LATEST signature from an
    * append-mode sink without relying on sink ordering.
    */
  case class MinhashSig(docId: Long, updates: Long, sig: Seq[String])

  /** SQL-semantics twins for the streaming path. Java's `String.trim` strips
    * every char <= U+0020 (tabs, newlines), while SQL `trim` strips ONLY the
    * space character; Java's no-arg `toLowerCase` consults the default
    * locale (on tr_TR, 'I' lowers to dotless 'ı'), while SQL `lower` is
    * locale-independent. Using the Java forms here would silently break the
    * "bit-identical to batch" contract on text with tab/newline padding or
    * on a non-English default locale.
    */
  private[ops] def sqlTrim(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  private[ops] def sqlLower(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)

  /** The content key of [[exact]] — md5(trim(lower(text))) — with SQL
    * semantics, shared by the batch oracle and [[firstSeenStream]].
    */
  private[ops] def contentKey(text: String): String = md5Hex(sqlTrim(sqlLower(text)))

  /** Scala twin of [[shingleRows]]'s shingling (same tokenization, same
    * clipped-shingle rule for documents shorter than `n` words) — used by
    * the streaming path, bit-identical to the batch column expressions:
    * SQL trim/lower (see [[sqlTrim]]/[[sqlLower]]) and `split` with
    * limit -1 (SQL `split` keeps trailing empty strings; Java's default
    * drops them, diverging on text with trailing non-space whitespace).
    */
  def shinglesOf(text: String, n: Int): Seq[String] = {
    val toks = sqlTrim(sqlLower(text)).split("\\s+", -1).toSeq
    if (n == 1) toks
    else (0 to math.max(toks.length - n, 0)).map(p => toks.slice(p, p + n).mkString(" "))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Streaming MinHash — the stateful twin of [[minhashSignatures]]:
    * documents arrive as [[DocChunk]]s on a stream; per-doc state carries
    * the running per-seed minimum, so the signature emitted after any
    * prefix of chunks is the MinHash of the shingle-set UNION seen so far.
    * With whole documents — or chunks overlapping by `shingle - 1` tokens,
    * so no cross-chunk shingle is lost — the final signature is
    * byte-identical to the batch operator's. Replayed chunks are absorbed
    * by the min (idempotent), which makes the operator at-least-once-safe
    * behind any source. State per doc is `numHashes` hex digests —
    * independent of document length, so total state is O(live docs), the
    * same bound [[Sessionize.assignStream]] has per user.
    */
  def minhashSignaturesStream(
      chunks: Dataset[DocChunk],
      numHashes: Int,
      shingle: Int = 3): Dataset[MinhashSig] = {
    import chunks.sparkSession.implicits._
    chunks
      // a null-text chunk contributes no shingles (batch parity: posexplode
      // over a null emits nothing) — it must not NPE the whole query
      .map(c => if (c.text == null) c.copy(text = "") else c)
      .groupByKey(_.docId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (id: Long, it: Iterator[DocChunk], state: GroupState[MinhashState]) => {
          val prior = state.getOption
          val mins: Array[String] =
            prior.map(_.mins.toArray).getOrElse(Array.fill[String](numHashes)(null))
          it.foreach { c =>
            shinglesOf(c.text, shingle).foreach { sh =>
              var i = 0
              while (i < numHashes) {
                val h = md5Hex(s"s$i:$sh")
                if (mins(i) == null || h < mins(i)) mins(i) = h
                i += 1
              }
            }
          }
          val updates = prior.map(_.updates).getOrElse(0L) + 1L
          state.update(MinhashState(mins.toSeq, updates))
          Iterator.single(MinhashSig(id, updates, mins.toSeq))
        })
  }

  /** A kept (first-seen) document: its id and content hash. */
  case class FirstSeen(docId: Long, contentHash: String)

  /** Streaming exact dedup — the stateful twin of [[exact]]: keyed by
    * content hash (same md5-of-normalized-text key as the batch operator),
    * per-hash state remembers whether the content was already emitted, so
    * each distinct content surfaces exactly once — the live-ingest "keep
    * first occurrence" filter. Within a micro-batch the kept id is the
    * minimum (matching the batch canonical rule); across batches first
    * arrival wins, which is the streaming-order semantics. Replays of an
    * already-kept document emit nothing (at-least-once-safe). State is one
    * long per distinct content ever seen — the inherent floor for exact
    * dedup without a TTL; bound it with a watermark/timeout when "duplicate"
    * only means "duplicate within N days".
    */
  def firstSeenStream(docs: Dataset[DocChunk]): Dataset[FirstSeen] = {
    import docs.sparkSession.implicits._
    docs
      // null text keys as '' instead of NPEing in contentKey — the one
      // divergence from batch exact (which groups nulls under a NULL hash):
      // on the stream, null-text and empty-text docs share a content key
      .map(d => if (d.text == null) d.copy(text = "") else d)
      .groupByKey(d => contentKey(d.text))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (hash: String, it: Iterator[DocChunk], state: GroupState[Long]) => {
          if (state.exists) Iterator.empty
          else {
            val canonical = it.map(_.docId).min
            state.update(canonical)
            Iterator.single(FirstSeen(canonical, hash))
          }
        })
  }

  /** Embedding near-duplicate pairs within equal `blockCol` (e.g. a cluster
    * or coarse-quantization id): cosine similarity ≥ `threshold`.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    // Vectors are L2-normalized once per row, so each pair costs a single
    // dot product instead of dot + two norms (the pair side is quadratic;
    // the per-row side is linear — always shift work to the linear side).
    val v = col(vecCol).cast("array<double>")
    val base = df.select(
      col(idCol).as("id"),
      col(blockCol).as("blk"),
      graft.Functions.vecNormalize(v).as("v"))
    val a = base.alias("a")
    val b = base.hint("SHUFFLE_HASH").alias("b")
    val dot = graft.Functions.vecDot(col("a.v"), col("b.v"))
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"),
        col("b.id").as("id_b"),
        graft.Functions.roundHalfUp(dot, 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Shifted-duplicate pairs via content-defined chunks: documents sharing
    * ≥ `minShared` CDC chunk hashes ([[TextAnalysis.chunkContentDefined]])
    * are paired with their shared-chunk count. Because CDC boundaries
    * realign after insertions/deletions, a lightly edited copy still shares
    * most chunk hashes with its original — the pair survives where
    * fixed-stride chunking or whole-document hashing would miss it.
    *
    * Same inverted-index shape as the shingle pairs: chunks explode to
    * (chunk_hash, id) rows, pairs meet ON the hash (high-cardinality key —
    * no skewed bucket), one keyed count yields the shared-chunk totals.
    * Single-chunk hashes that appear once never join anything, so cost
    * tracks true duplicate density, not corpus².
    *
    * `maxDocFreq` (0 = off) drops chunk hashes appearing in more than that
    * many documents before pairing — the stop-chunk guard: a boilerplate
    * chunk shared by 10⁶ documents would otherwise emit ~10¹² pairs on its
    * own (df² blowup on one hot key), exactly the stop-word hazard of any
    * inverted index. The filter is one combinable count + a semi-join,
    * both keyed by the hash.
    */
  def cdcChunkPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 4,
      avgTokens: Int = 16,
      minShared: Int = 2,
      maxDocFreq: Int = 0): DataFrame = {
    require(minShared >= 1)
    val allChunks = TextAnalysis
      .chunkContentDefined(df, idCol, textCol, window, avgTokens)
      .select(col(idCol), col("chunk_hash")).distinct()
    val chunks =
      if (maxDocFreq <= 0) allChunks
      else allChunks.join(
        allChunks.groupBy("chunk_hash").agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= maxDocFreq)
          .select("chunk_hash"),
        Seq("chunk_hash"), "left_semi")
    val a = chunks.alias("a")
    val b = chunks.hint("SHUFFLE_HASH").alias("b")
    a.join(b,
        col("a.chunk_hash") === col("b.chunk_hash") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("shared_chunks"))
      .filter(col("shared_chunks") >= minShared)
  }

  /** Incremental exact dedup of a new batch against an ever-growing history
    * (continuous corpus ingestion: "which of today's documents have we
    * already trained on?"). Two phases so the HISTORY — the 100 TB side —
    * never shuffles:
    *
    *   1. the batch's distinct content hashes broadcast to every history
    *      scan task, which semi-filters history map-side down to only the
    *      hashes the batch could collide with (≤ |batch| rows survive);
    *   2. an exact anti-join of the batch against that bounded survivor
    *      set marks each batch row seen/new.
    *
    * The result is EXACTLY `batch ANTI JOIN history` — phase 1 is invisible
    * to the answer, so the full SQL oracle is a plain anti-join. The
    * broadcast bound is the batch's distinct-hash count (daily batches:
    * millions of 16-byte hashes — tens of MB); batches too large to
    * broadcast fall back to `broadcastBatch = false`, a shuffled semi-join
    * that still touches only hash-matched history partitions after
    * predicate pushdown.
    */
  def newAgainstHistory(
      batch: DataFrame,
      history: DataFrame,
      idCol: String,
      textCol: String,
      broadcastBatch: Boolean = true): DataFrame = {
    val h = md5(trim(lower(col(textCol))))
    val batchHashed = batch.select(col(idCol), h.as("content_hash"))
    val batchKeys = batchHashed.select("content_hash").distinct()
    // semi-filter BEFORE distinct: the raw history rows are pruned map-side
    // against the broadcast batch hashes, so the only shuffle on the
    // history side is the distinct over the bounded survivor set
    val histKeys = history.select(h.as("content_hash"))
    val touched = (
      if (broadcastBatch) histKeys.join(broadcast(batchKeys), Seq("content_hash"), "left_semi")
      else histKeys.join(batchKeys, Seq("content_hash"), "left_semi")
    ).distinct()
    batchHashed.join(touched.withColumn("_seen", lit(true)), Seq("content_hash"), "left")
      .select(
        col(idCol), col("content_hash"),
        coalesce(col("_seen"), lit(false)).as("seen_before"))
  }

  /** Edit-distance similarity join over SHORT strings (titles, names,
    * labels): pairs with `levenshtein ≤ maxDist` — the fuzzy-dedup join
    * for the dimension-ish side of a corpus, where token-set measures
    * ([[ngramJaccardPairs]]) are too coarse to see a one-character typo.
    *
    * Candidate generation is LENGTH BANDING (the first filter of the
    * PassJoin family): every string is exploded to bands
    * `[len − maxDist, len]`, and a pair is taken from exactly one shared
    * band — the one equal to `min(len_a, len_b)`. Complete by the length
    * lemma (each edit changes length by at most 1, so `|len_a − len_b| >
    * maxDist` already implies distance > maxDist) and exactly-once by the
    * min-band pick, so no dedup shuffle follows. The verify step is the
    * codegen'd built-in `levenshtein`, which the DuckDB oracle reproduces
    * exactly.
    *
    * Scale shape: a keyed equi-join on the band (never a cartesian),
    * candidate volume Σ over bands of |band| × |within-maxDist lengths| —
    * for natural short-string length distributions this is a small
    * multiple of the true pair count. Positional q-gram count filtering
    * is the known next refinement if a corpus's length histogram
    * degenerates (one dominant length).
    */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      normalize: Boolean = true): DataFrame = {
    require(maxDist >= 0, s"maxDist=$maxDist must be non-negative")
    val raw = col(strCol).cast("string")
    val s = if (normalize) trim(lower(raw)) else raw
    val base = df
      .select(col(idCol).as("id"), s.as("s"))
      .filter(col("s").isNotNull)
      .withColumn("len", length(col("s")))
    val banded = base.withColumn("band",
      explode(sequence(greatest(col("len") - maxDist, lit(0)), col("len"))))
    // Length bands are few and skewed (real corpora cluster hard around a
    // modal length), and the banded relation is tiny in BYTES while the
    // verify work is quadratic in band population — exactly the
    // compute-heavy/small-bytes shape AQE coalesces onto one task. So:
    // salt the probe side, replicate the (tiny) build side across the
    // salts, and repartition BOTH sides explicitly on (band, salt) — the
    // join's equi-keys — so the hot band's pair verification spreads over
    // `salts` tasks and the explicit partitioning survives AQE untouched.
    // The salt never reaches the result, so murmur hash is fine here (the
    // md5 discipline binds result-affecting randomness only).
    val salts = 32
    val parallelism = df.sparkSession.sessionState.conf.numShufflePartitions
    val aS = banded.withColumn("_salt", pmod(hash(col("id")), lit(salts)))
      .repartition(parallelism, col("band"), col("_salt"))
      .alias("a")
    val bS = banded.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .repartition(parallelism, col("band"), col("_salt"))
      .hint("SHUFFLE_HASH")
      .alias("b")
    aS.join(bS,
        col("a.band") === col("b.band") &&
          col("a._salt") === col("b._salt") &&
          col("a.id") < col("b.id") &&
          col("a.band") === least(col("a.len"), col("b.len")))
      .select(
        col("a.id").as("id_a"),
        col("b.id").as("id_b"),
        // banded DP: O(maxDist·len) per pair instead of O(len²), returns -1
        // above the threshold — most candidates are rejections, so the
        // band is the fast path
        levenshtein(col("a.s"), col("b.s"), maxDist).cast("long").as("dist"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
  }

  /** Ratio-threshold similarity join — the corpus-scale form of the
    * reference's fuzzy device-resolution argmax (J10, `gs_ready.py`'s
    * difflib cascade, fine as a dim×dim cross at its ~100×100 scale but a
    * scale-killer for corpus-sized sides). Pairs with `similarity ≥
    * threshold`, candidates generated by LENGTH BANDING — the same
    * PassJoin discipline as [[editDistancePairs]], driven by the bound
    * the [[graft.plans.SequenceRatioLengthBound]] optimizer rule already
    * synthesizes for point predicates:
    *
    *   - `sim = "seq_ratio"` (difflib Ratcliff–Obershelp, the codegen'd
    *     [[graft.expressions.SequenceRatio]]): `ratio = 2·M/(la+lb)` with
    *     `M ≤ min(la,lb)`, so `ratio ≥ t ⟹ min ≥ t/(2−t) · max`.
    *   - `sim = "lev_ratio"` ([[graft.Functions.levRatio]], replayable in
    *     any engine with `levenshtein`): `lev ≥ |la−lb|`, so
    *     `ratio ≥ t ⟹ min ≥ t · max`.
    *
    * Each string explodes to bands `[⌊bound(len)⌋ .. len]` (floor, so a
    * boundary pair can never be lost to float rounding) and a pair is
    * taken from exactly one shared band — `min(la, lb)` — then verified
    * by the actual similarity expression. Complete by the length lemma,
    * exactly-once by the min-band pick, keyed equi-join throughout (the
    * salting/repartition discipline of [[editDistancePairs]] — never a
    * cartesian). Returns `(id_a, id_b, ratio)` with `id_a < id_b`.
    */
  def seqRatioPairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      threshold: Double,
      sim: String = "seq_ratio",
      normalize: Boolean = true): DataFrame = {
    // ONE banded subtree shared by both sides (canonically identical plans
    // let ReuseExchange compute the banding once — the editDistancePairs
    // shape)
    val banded = bandForRatio(df, idCol, strCol, threshold, sim, normalize)
    val (aS, bS, ratio) = ratioBandedSides(banded, banded, sim, df.sparkSession)
    aS.join(bS,
        col("a.band") === col("b.band") &&
          col("a._salt") === col("b._salt") &&
          col("a.id") < col("b.id") &&
          col("a.band") === least(col("a.len"), col("b.len")))
      .select(
        col("a.id").as("id_a"),
        col("b.id").as("id_b"),
        ratio.as("ratio"))
      .filter(col("ratio") >= threshold)
  }

  /** Bipartite form of [[seqRatioPairs]]: every `(left, right)` pair with
    * `similarity ≥ threshold` — the candidate generator a corpus-scale
    * fuzzy lookup ([[DeviceResolution.fuzzyArgmaxBanded]]) puts in front
    * of its argmax window. Same length banding, same exactly-once
    * min-band pick (band uniqueness holds regardless of which side is
    * shorter), same salted keyed join. Returns `(idLeft, idRight, ratio)`
    * under the CALLERS' column names. Put the larger side on the LEFT:
    * the right side replicates across the 32 skew salts.
    */
  def seqRatioJoin(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      threshold: Double,
      sim: String = "seq_ratio",
      normalize: Boolean = true): DataFrame = {
    val (aS, bS, ratio) = ratioBandedSides(
      bandForRatio(left, leftId, leftStr, threshold, sim, normalize),
      bandForRatio(right, rightId, rightStr, threshold, sim, normalize),
      sim, left.sparkSession)
    aS.join(bS,
        col("a.band") === col("b.band") &&
          col("a._salt") === col("b._salt") &&
          col("a.band") === least(col("a.len"), col("b.len")))
      .select(
        col("a.id").as(leftId),
        col("b.id").as(rightId),
        ratio.as("ratio"))
      .filter(col("ratio") >= threshold)
  }

  /** The sim's length-lemma fraction: `ratio ≥ t` implies
    * `min_len ≥ frac(t) · max_len`. Shared by the per-length banding, the
    * geometric long-string banding, and both ops' exact re-check.
    */
  private def fracOf(threshold: Double, sim: String): Double = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold=$threshold must be in (0, 1] — at 0 every pair is a candidate " +
        "and banding degenerates to the cross this operator exists to avoid")
    sim match {
      case "seq_ratio" => threshold / (2.0 - threshold)
      case "lev_ratio" => threshold
      case other => throw new IllegalArgumentException(
        s"unknown sim '$other' — supported: seq_ratio, lev_ratio")
    }
  }

  /** Long-string (document-grain) form of [[seqRatioPairs]] — identical
    * contract and result, different candidate generator: GEOMETRIC length
    * bucketing instead of per-length bands. [[seqRatioPairs]] explodes
    * each string to ≈(1−frac)·len band rows EACH CARRYING THE FULL STRING
    * — right for the fuzzy-join grain (names, titles), a byte blow-up at
    * document grain (a 10 k-char doc at t=0.7 would band ~4,600×). Here
    * buckets are integer boundaries `b₀=1, b₍g₊₁₎ = max(⌈b_g/frac⌉,
    * b_g+1)` (driver-computed literals — integer comparisons, no float
    * bucket math to disagree across the join), so `min ≥ frac·max`
    * implies the buckets differ by AT MOST ONE, and each string emits
    * exactly TWO band rows: {bucket(len)−1, bucket(len)}. A pair is taken
    * from exactly one shared band — `bucket(min(la, lb))` — and the EXACT
    * per-length lemma `min ≥ ⌊frac·max⌋` (the same floored expression
    * [[seqRatioPairs]] bands by) re-applies as a cheap join predicate, so
    * the set of pairs reaching the expensive ratio verify is IDENTICAL to
    * the per-length banding's. Same salting/SHUFFLE_HASH discipline, same
    * verify expressions. Returns `(id_a, id_b, ratio)` with `id_a < id_b`.
    *
    * Scale shape: banded bytes = 2× corpus (vs ≈(1−frac)·len ×), shuffle
    * keyed on (band, salt); the coarser buckets admit length-incompatible
    * probe pairs, but those exit on the integer length predicate before
    * any ratio evaluation.
    */
  def seqRatioPairsLong(
      df: DataFrame,
      idCol: String,
      strCol: String,
      threshold: Double,
      sim: String = "seq_ratio",
      normalize: Boolean = true): DataFrame = {
    val frac = fracOf(threshold, sim)
    val bounds = geoBounds(frac)
    val boundsCol = array(bounds.map(lit): _*)
    def bucketOf(len: Column): Column =
      size(filter(boundsCol, b => b <= len))
    val raw = col(strCol).cast("string")
    val s = if (normalize) trim(lower(raw)) else raw
    val banded = df
      .select(col(idCol).as("id"), s.as("s"))
      .filter(col("s").isNotNull)
      .withColumn("len", length(col("s")))
      .withColumn("band",
        explode(array(bucketOf(col("len")) - 1, bucketOf(col("len")))))
      .filter(col("band") >= 0)
    val (aS, bS, ratio) = ratioBandedSides(banded, banded, sim, df.sparkSession)
    aS.join(bS,
        col("a.band") === col("b.band") &&
          col("a._salt") === col("b._salt") &&
          col("a.id") < col("b.id") &&
          // exactly-once pick: the shorter side's own bucket
          col("a.band") === bucketOf(least(col("a.len"), col("b.len"))) &&
          // the EXACT length lemma, before any ratio evaluation — the
          // same floored expression seqRatioPairs bands by, so the
          // verified candidate set matches it exactly
          least(col("a.len"), col("b.len")) >=
            floor(greatest(col("a.len"), col("b.len")) * lit(frac)).cast("int"))
      .select(
        col("a.id").as("id_a"),
        col("b.id").as("id_b"),
        ratio.as("ratio"))
      .filter(col("ratio") >= threshold)
  }

  /** Geometric bucket boundaries for [[seqRatioPairsLong]]: integer,
    * strictly increasing, each ≥ the previous divided by `frac` — so two
    * lengths within the lemma (`min ≥ frac·max`) sit at most one bucket
    * apart. Bounded by O(log_{1/frac} maxInt) entries (35 at frac≈0.54,
    * ~1,500 at frac=0.99 — literal-array scale either way).
    */
  private[ops] def geoBounds(frac: Double): Seq[Int] = {
    val r = 1.0 / frac
    val out = Seq.newBuilder[Int]
    var b = 1L
    while (b <= Int.MaxValue) {
      out += b.toInt
      b = math.max(math.ceil(b * r).toLong, b + 1)
    }
    out.result()
  }

  /** One side's banded relation: `(id, s, len, band)` with bands
    * `[⌊bound(len)⌋ .. len]` per the sim's length lemma (floor, so a
    * boundary pair can never be lost to float rounding).
    */
  private def bandForRatio(
      df: DataFrame, idCol: String, strCol: String,
      threshold: Double, sim: String, normalize: Boolean): DataFrame = {
    val frac = fracOf(threshold, sim)
    val raw = col(strCol).cast("string")
    val s = if (normalize) trim(lower(raw)) else raw
    df.select(col(idCol).as("id"), s.as("s"))
      .filter(col("s").isNotNull)
      .withColumn("len", length(col("s")))
      .withColumn("band",
        explode(sequence(
          greatest(floor(col("len") * lit(frac)).cast("int"), lit(0)), col("len"))))
  }

  /** The salted/repartitioned sides + verify column shared by the self-
    * and bipartite ratio joins (the [[editDistancePairs]] AQE discipline).
    */
  private def ratioBandedSides(
      bandedA: DataFrame, bandedB: DataFrame, sim: String,
      session: org.apache.spark.sql.SparkSession): (DataFrame, DataFrame, Column) = {
    val salts = 32
    val parallelism = session.sessionState.conf.numShufflePartitions
    val aS = bandedA.withColumn("_salt", pmod(hash(col("id")), lit(salts)))
      .repartition(parallelism, col("band"), col("_salt"))
      .alias("a")
    val bS = bandedB.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .repartition(parallelism, col("band"), col("_salt"))
      .hint("SHUFFLE_HASH")
      .alias("b")
    val ratio = sim match {
      case "seq_ratio" => graft.Functions.seqRatio(col("a.s"), col("b.s"))
      case _ => graft.Functions.levRatio(col("a.s"), col("b.s"))
    }
    (aS, bS, ratio)
  }

  /** Distinct `n`-word shingles of [[tokens]] as a per-row ARRAY — the
    * array-expression twin of [[shingleRows]] for operators that stay
    * shuffle-free: index i ∈ 1..max(len−n+1, 1), shingle = the (clipped)
    * n-token slice starting at i, deduplicated. Identical contract to
    * [[shinglesOf]] / the oracle's `shinglesSql`.
    */
  private[ops] def shingleArray(text: Column, n: Int): Column = {
    require(n >= 1)
    val tt = tokens(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(tt) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(tt, i, lit(n)))))
  }

  /** One-permutation-hashing MinHash with rotation densification (Li, Owen
    * & Zhang, NIPS 2012; Shrivastava & Li, ICML 2014): ONE 32-bit hash per
    * distinct shingle — slot `j` of the signature is the minimum hash whose
    * value lands in bucket `j = h mod k` — versus [[minhashSignatures]]'
    * k independent md5 evaluations per shingle. Empty buckets (short
    * documents fill few of the k buckets) are densified by borrowing the
    * nearest non-empty bucket circularly to the RIGHT, offset-shifted
    * (`value + distance`): two documents collide on a borrowed slot only
    * when the borrow source AND distance agree, the rotation scheme's
    * unbiasedness device. A document with no shingles at all (NULL text)
    * emits NULL slots.
    *
    * Scale shape: the entire signature is ONE per-row projection — no
    * explode, no exchange, no window (the [[simhash]] shape; plan-pinned).
    * Per-shingle hashes are materialized once into an array; the k bucket
    * minima and k densified slots are array expressions over it, and the
    * two projections stay separate (the minima array is expensive and
    * multiply-referenced, so CollapseProject leaves it alone) — at 100 TB
    * this is a map-only pass where [[minhashSignatures]] pays a keyed
    * exchange AND k× the hashing. Reference analog: the reference hashes
    * each record body once for its dedup key, not once per comparison
    * (/root/reference/atd_data_lake/support/last_upd_fs.py:60) — the same
    * hash-once economics applied to MinHash permutations.
    *
    * Emits `oph0..oph{k-1}` LONG columns.
    */
  def ophSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      shingle: Int = 3): DataFrame = {
    require(k >= 2 && k <= 64, s"k=$k buckets must be in 2..64")
    // gate on text presence: concat_ws over a NULL token slice yields ""
    // (not NULL), so an ungated pipeline would hash phantom "" shingles
    // for NULL-text docs instead of emitting the contract's NULL slots
    val hs = when(col(textCol).isNotNull,
      transform(
        shingleArray(col(textCol), shingle),
        x => graft.Functions.md5Bits(x, 32)))
    // THREE projections, deliberately: higher-order array expressions are
    // interpreted (no whole-stage-codegen subexpression elimination), so if
    // `hs` were inlined into each bucket minimum the corpus would be
    // tokenized and md5-hashed k times per row — measured 8× slower at
    // sf0.1. A multiply-referenced non-cheap alias is exactly what
    // CollapseProject refuses to inline, so the hash array and the minima
    // array each materialize once per row.
    val mins = (0 until k).map(j =>
      array_min(filter(col("_hs"), v => pmod(v, lit(k.toLong)) === lit(j.toLong))))
    val slots = (0 until k).map { j =>
      coalesce((0 until k).map { off =>
        val src = element_at(col("_m"), (j + off) % k + 1)
        if (off == 0) src else src + lit(off.toLong)
      }: _*).as(s"oph$j")
    }
    df.select(col(idCol), hs.as("_hs"))
      .select(col(idCol), array(mins: _*).as("_m"))
      .select(col(idCol) +: slots: _*)
  }

  /** LSH candidate pairs over [[ophSignatures]] — [[minhashLshPairs]]'
    * banded SHUFFLE_HASH self-join (band index + band signature key,
    * ReuseExchange computes the signature pipeline once) fed by the
    * hash-once signature. Documents with NULL signatures (no shingles) are
    * excluded up front: `concat_ws` would silently skip their NULL slots
    * and collide every empty document into one band bucket, where the SQL
    * twin's NULL-propagating `||` matches nothing — dropping them keeps
    * both engines at "no pairs from empty docs".
    */
  def ophLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      bands: Int = 2,
      shingle: Int = 3): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    // NULL-text docs are exactly the NULL-signature docs — filter BEFORE
    // the signature so the predicate never rewrites through the projection
    // chain (a pushed isnotnull(oph0) would inline the full hash pipeline
    // into the Filter, paying it twice per row). The explicit repartition
    // is the shingleRows lesson: signature compute vastly exceeds bytes,
    // and the corpus often arrives as few input splits — without it the
    // heavy map runs in one task and AQE cannot help (the exchange sits
    // ABOVE this stage).
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val sigs = ophSignatures(
      df.filter(col(textCol).isNotNull).repartition(parallelism, col(idCol)),
      idCol, textCol, k, shingle)
    val bandCols = (0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        concat_ws("_", (0 until rows).map(r => col(s"oph${b * rows + r}")): _*).as("sig"))
    }
    val banded = sigs
      .select(col(idCol), explode(array(bandCols: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val a = banded.alias("a")
    val b = banded.hint("SHUFFLE_HASH").alias("b")
    a.join(
        b,
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Soft deduplication: every document keeps a training WEIGHT
    * `1/|its near-dup cluster|` instead of hard keep-one-drop-rest —
    * repeated content stops contributing n× gradient mass but each copy's
    * unique context (surrounding metadata, source mix) stays in the
    * corpus; summed weights per cluster are exactly 1, so the effective
    * epoch size equals the hard-deduped corpus. Clusters come from
    * [[minhashLshPairs]] + alternating-star connected components
    * (singletons weigh 1.0). Output: `(id, cluster_id, cluster_size,
    * weight)` — feed `weight` to [[graft.ops.Sampling.weightedSample]] or
    * a loss-weighting column.
    *
    * Scale shape: everything through clustering is the q_dd_clusters
    * plan; the size join is keyed on cluster_id over the id-sized
    * relation — no new shuffle class. Weight = round-half-up-9 of
    * `1/size`, oracle-exact.
    */
  def softDedupWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      bands: Int = 2,
      shingle: Int = 3): DataFrame = {
    val clusters = ConnectedComponents.assign(
      df.select(col(idCol)), idCol,
      minhashLshPairs(df, idCol, textCol, numHashes, bands, shingle),
      "id_a", "id_b")
    val sizes = clusters.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    clusters
      .join(sizes, Seq("cluster_id"))
      .select(
        col(idCol), col("cluster_id"), col("cluster_size"),
        graft.Functions.roundHalfUp(
          lit(1.0) / col("cluster_size").cast("double"), 9).as("weight"))
  }

  /** MinHash calibration report: for every LSH candidate pair, the
    * signature-estimated Jaccard (matching slots / k) NEXT TO the exact
    * shingle-set Jaccard and their absolute error — the measurement that
    * tells you whether a (numHashes, bands) configuration is honest
    * BEFORE a 100 TB dedup run commits to it (the MinHash estimator is
    * unbiased with sd ≈ 1/√k; k = 8 is deliberately coarse, and this
    * report is how that coarseness gets quantified rather than trusted).
    *
    * Exactness: slot matches and shingle-set sizes are integers; both
    * Jaccards round half-up 6 BEFORE the error subtraction, which then
    * rounds the same way — every step replayable. Zero-union pairs (two
    * empty-ish docs) read exact = 1.0, the [[ngramJaccardPairs]]
    * convention.
    *
    * Scale shape: pairs are LSH-bounded (never all-pairs); the exact side
    * prunes the distinct-shingle relation to candidate ids with a
    * LEFT-SEMI join BEFORE the intersection join, so shingle volume is
    * bounded by the candidates' text, not the corpus; sizes and
    * intersections are keyed aggregates.
    */
  def minhashCalibration(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      bands: Int = 2,
      shingle: Int = 3): DataFrame = {
    // pinned: the candidate-pair set feeds FOUR consumers (estimate join,
    // both sides of the candidate-id union, the exact-intersection join,
    // the final assembly) and each reference re-planned the whole
    // shingle+minhash+band pipeline (executed-plan audited: 28 source
    // scans in one calibration plan). Candidate pairs are bounded by LSH
    // collision volume — the op's own scale contract — so the
    // materialization is safe at any corpus size.
    val pairs = minhashLshPairs(df, idCol, textCol, numHashes, bands, shingle)
      .localCheckpoint(false)
    val sigs = minhashSignatures(df, idCol, textCol, numHashes, shingle)
    val aSide = sigs.select(
      col(idCol).as("id_a") +: (0 until numHashes).map(i => col(s"mh$i").as(s"_a$i")): _*)
    val bSide = sigs.select(
      col(idCol).as("id_b") +: (0 until numHashes).map(i => col(s"mh$i").as(s"_b$i")): _*)
    val matches = (0 until numHashes)
      .map(i => when(col(s"_a$i") === col(s"_b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val est = pairs
      .join(aSide, Seq("id_a"))
      .join(bSide, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.Functions.roundHalfUp(
          matches.cast("double") / numHashes, 6).as("est_jaccard"))

    val candidateIds = pairs.select(col("id_a").as("_id"))
      .unionByName(pairs.select(col("id_b").as("_id")))
      .distinct()
    // pinned for the same reason: three consumers (sizes, both sides of
    // the intersection join); bounded by the CANDIDATES' shingles, not the
    // corpus — the semi-join prunes before materialization
    val shingleSet = shingleRows(df, idCol, textCol, shingle)
      .select(col(idCol).as("_id"), col("shingle"))
      .join(candidateIds, Seq("_id"), "left_semi")
      .distinct()
      .localCheckpoint(false)
    val sizes = shingleSet.groupBy(col("_id")).agg(count(lit(1)).as("_sz"))
    val inter = pairs
      .join(shingleSet.select(col("_id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(shingleSet.select(col("_id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("_inter"))
    val unionSz = col("_sza") + col("_szb") - col("_i")
    est
      .join(pairs
        .join(sizes.select(col("_id").as("id_a"), col("_sz").as("_sza")), Seq("id_a"))
        .join(sizes.select(col("_id").as("id_b"), col("_sz").as("_szb")), Seq("id_b"))
        .join(inter, Seq("id_a", "id_b"), "left")
        .select(col("id_a"), col("id_b"), col("_sza"), col("_szb"),
          coalesce(col("_inter"), lit(0L)).as("_i")),
        Seq("id_a", "id_b"))
      .select(
        col("id_a"), col("id_b"), col("est_jaccard"),
        when(unionSz === 0L, lit(1.0))
          .otherwise(graft.Functions.roundHalfUp(
            col("_i").cast("double") / unionSz.cast("double"), 6)).as("exact_jaccard"))
      .withColumn("abs_err",
        graft.Functions.roundHalfUp(abs(col("est_jaccard") - col("exact_jaccard")), 6))
  }

  /** LSH parameter planner: for every (bands, rows) factorization of
    * `numHashes` and every probed Jaccard level, the candidate-collision
    * probability `1 − (1 − s^r)^b` — the S-curve a dedup run tunes
    * against BEFORE burning a corpus-scale pass (the r-selectivity lesson
    * from the OPH wave, as a table instead of a 58-second surprise).
    *
    * Exactness: both powers evaluate as LEFT-ASSOCIATED repeated
    * multiplication — `s·s·…` then `(1−s^r)·(1−s^r)·…` — the identical
    * IEEE sequence the SQL oracle replays as recursive-CTE multiply
    * chains (`pow()` would be libm-dependent and is never called).
    * Result rounds half-up 6.
    *
    * Scale shape: |divisors(k)| × |thresholds| rows of pure driver-free
    * projection — there is no data input at all; the table is the plan.
    */
  def lshPlan(
      spark: org.apache.spark.sql.SparkSession,
      numHashes: Int,
      thresholds: Seq[Double]): DataFrame = {
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    import spark.implicits._
    val pairs = (1 to numHashes).filter(numHashes % _ == 0).map(b => (b, numHashes / b))
    pairs
      .map { case (b, r) =>
        val base = thresholds.toDF("jaccard")
        val sr = (1 until r).foldLeft(col("jaccard"))((acc, _) => acc * col("jaccard"))
        val oneMinus = lit(1.0) - sr
        val qb = (1 until b).foldLeft(oneMinus)((acc, _) => acc * oneMinus)
        base.select(
          lit(b.toLong).as("bands"), lit(r.toLong).as("rows"), col("jaccard"),
          graft.Functions.roundHalfUp(lit(1.0) - qb, 6).as("p_collide"))
      }
      .reduce(_ unionByName _)
  }
}
