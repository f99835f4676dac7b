package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-corpus analysis operators for training-data pipelines: language
  * identification, quality scoring, token counting, and content
  * fingerprinting. Pure column expressions — whole-stage-codegen friendly,
  * no UDFs, no shuffle (all per-row).
  */
object TextAnalysis {

  /** Marker words per language for the n-gram/stopword language heuristic.
    * Deliberately tiny and deterministic; real deployments would swap in
    * frequency tables. Order defines the tiebreak (first wins).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "les", "des", "une", "est"),
    "de" -> Seq("der", "die", "und", "das", "ein"))

  /** Stopword set the quality composite thresholds on (shared with the
    * streaming twin in [[Curate.decideStream]]).
    */
  val QualityStopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is")

  // ONE tokenization contract for the whole family (metrics, search, and
  // the batch/stream bit-compatibility docs all lean on it)
  private def toks(text: Column): Column = Dedup.tokens(text)

  /** Normalize caller-supplied query tokens to the corpus tokenization
    * (trim + lower, the [[Dedup.sqlTrim]]/[[Dedup.sqlLower]] semantics) and
    * dedupe — an uppercase or padded query token would otherwise silently
    * match nothing against the lowercased corpus tokens.
    */
  private def normalizedQuery(queryTokens: Seq[String]): Seq[String] = {
    require(queryTokens.nonEmpty, "queryTokens must be non-empty")
    val norm = queryTokens.map(t => Dedup.sqlTrim(Dedup.sqlLower(t))).distinct
    require(norm.forall(_.nonEmpty), "queryTokens must not be blank")
    norm
  }

  /** Count of tokens that appear in `markers`. */
  private def hits(t: Column, markers: Seq[String]): Column =
    size(filter(t, x => markers.map(m => x === m).reduce(_ || _)))

  /** Language guess: the marker set with the most token hits; "und" when no
    * marker hits at all. Ties break by table order (argmax scan). The
    * marker table is caller-pluggable — swap in real per-language frequency
    * tables (top-N stopwords per language) for production use;
    * [[LangMarkers]] is the default demo set.
    */
  def langId(text: Column, langMarkers: Seq[(String, Seq[String])] = LangMarkers): Column = {
    val t = toks(text)
    val scored = langMarkers.map { case (lang, markers) => (lang, hits(t, markers)) }
    val best = scored
      .map(_._2)
      .reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, score), acc) =>
      when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Per-line language segmentation — the polyglot-document splitter web
    * corpora need before language routing: a crawled page is often mixed
    * (an English article over a French nav shell, code blocks under prose),
    * and per-DOCUMENT language id either drops the page or mislabels half
    * of it. Each line is classified with [[langId]]'s marker scoring, then
    * contiguous same-language runs merge into segments — downstream, each
    * segment routes to its language's pipeline (or the dominant segment
    * keeps the doc). Lines with no marker hits are `und` and form their own
    * segments (they are NOT attached to neighbors — a deterministic,
    * documented choice; attachment policy belongs to the consumer).
    *
    * Output: `(idCol, seg_idx, lang, line_start, line_end, n_lines,
    * n_chars)` — one row per segment, `seg_idx` dense per document in line
    * order, line indexes 0-based inclusive, `n_chars` the segment's summed
    * line lengths (newlines excluded). NULL-text documents emit nothing;
    * an empty text is one empty `und` line.
    *
    * Scale shape: ONE exchange keyed by document (the explicit repartition
    * defeats AQE's small-bytes coalescing, the shingleRows lesson); line
    * classification is a per-row codegen'd expression chain (no UDF); the
    * lag/running-sum island merge and the final segment aggregate both run
    * inside that same doc-keyed partitioning (hash(id) already clusters
    * (id, seg)), so segment width is bounded by a document's line count,
    * never the corpus.
    */
  def langSegments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langMarkers: Seq[(String, Seq[String])] = LangMarkers): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    df.repartition(parallelism, col(idCol))
      .select(col(idCol), posexplode(split(col(textCol), "\n")))
      .select(col(idCol), col("pos"),
        langId(col("col"), langMarkers).as("lg"),
        length(col("col")).cast("long").as("_nc"))
      .withColumn("_new",
        when(coalesce(lag(col("lg"), 1).over(w) === col("lg"), lit(false)), 0L)
          .otherwise(1L))
      .withColumn("_seg", sum(col("_new")).over(w) - 1L)
      .groupBy(col(idCol), col("_seg"))
      .agg(
        min(col("lg")).as("lang"), // constant within a segment
        min(col("pos")).cast("long").as("line_start"),
        max(col("pos")).cast("long").as("line_end"),
        count(lit(1)).as("n_lines"),
        sum(col("_nc")).as("n_chars"))
      .select(col(idCol), col("_seg").as("seg_idx"), col("lang"),
        col("line_start"), col("line_end"), col("n_lines"), col("n_chars"))
  }

  /** Quality metrics: word count, char count, average word length (rounded
    * 3), stopword ratio (rounded 4), and a composite [0,1] quality score —
    * the shape of the heuristics production corpus filters use (length
    * bounds + stopword density).
    */
  def qualityMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val wordCnt = size(t)
    val charCnt = length(trim(col(textCol)))
    val stopwords = QualityStopwords
    val stopRatio = when(wordCnt === 0, lit(0.0))
      .otherwise(hits(t, stopwords).cast("double") / wordCnt.cast("double"))
    val avgWordLen = when(wordCnt === 0, lit(0.0))
      .otherwise(
        aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") /
          wordCnt.cast("double"))
    // score: in-range length (20..400 words) 0.5 + bounded stopword density 0.5
    val lenScore = when(wordCnt.between(20, 400), lit(0.5)).otherwise(lit(0.0))
    val stopScore = when(stopRatio.between(0.01, 0.5), lit(0.5)).otherwise(lit(0.0))
    df.select(
      col(idCol),
      wordCnt.cast("long").as("word_count"),
      charCnt.cast("long").as("char_count"),
      graft.Functions.roundHalfUp(avgWordLen, 3).as("avg_word_len"),
      graft.Functions.roundHalfUp(stopRatio, 4).as("stopword_ratio"),
      graft.Functions.roundHalfUp(lenScore + stopScore, 2).as("quality_score"))
  }

  /** Token counts: whitespace tokens and regex word tokens (`[a-z0-9]+` over
    * lower-cased text — a BPE-ish pre-tokenizer's word-split pass).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(toks(col(textCol))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
        .cast("long").as("re_tokens"))

  /** Order-insensitive content fingerprint: md5 over the sorted distinct
    * token set — catches shuffled/duplicated-content documents that exact
    * hashing misses.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks(text)))))

  /** C4-style intra-document line dedup: drop repeated lines within a
    * document, keeping each line's FIRST occurrence, and rejoin in original
    * order (boilerplate/navigation lines repeat; prose doesn't). Pure
    * per-row array expressions — no explode, no shuffle: a line survives
    * iff its first occurrence index is its own (`array_position` returns
    * the first match, 1-based). Worst case O(L²) string compares per
    * document in line count L — fine for web-document line counts; a
    * corpus of pathologically line-heavy documents would explode lines and
    * take min-position per (doc, line-hash) instead.
    */
  def dedupLines(text: Column, sep: String = "\n"): Column = {
    val lines = split(text, java.util.regex.Pattern.quote(sep))
    val indexed = zip_with(
      lines, sequence(lit(1), size(lines)),
      (l, i) => struct(l.as("l"), i.as("i")))
    val kept = filter(indexed, e => array_position(lines, e.getField("l")) === e.getField("i"))
    concat_ws(sep, transform(kept, _.getField("l")))
  }

  /** CORPUS-WIDE line dedup (the RefinedWeb/C4 global pass): a line
    * survives only in the document where it first appears — ordered by
    * (id, position) — so shared boilerplate (cookie banners, navigation,
    * license headers) is kept exactly once across the whole corpus, not
    * once per document. Documents whose every line was already seen
    * elsewhere drop out entirely; empty lines are normalized away.
    *
    * Skew note: a window `row_number` over the line hash would serialize
    * the hottest line ("accept cookies" × 10⁹ docs) into one partition.
    * Instead the first occurrence is a map-side-combinable `min(struct(id,
    * pos))` per hash — partial aggregation absorbs the hot key on the map
    * side — followed by an equi-join back on the hash, where the hot key
    * matches exactly ONE build row (no pair explosion). Same two-level
    * trick as `Publish.firstSeenCounter`.
    *
    * Output: (id, clean_text, kept_lines) — one row per surviving document.
    */
  def dedupLinesGlobal(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = df
      // null ids are unaddressable here and sort FIRST inside min(struct):
      // a null-id doc would win first-occurrence for every line it contains
      // while the null-equality claim filter matches nobody — erasing those
      // lines corpus-wide. Same null-key safety rule as temperatureMix.
      .filter(col(idCol).isNotNull)
      .select(col(idCol), posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .filter(col("col") =!= "")
      .select(col(idCol), col("pos").cast("long").as("_pos"), col("col").as("_line"),
        md5(col("col")).as("_h"))
    val first = lines.groupBy("_h")
      .agg(min(struct(col(idCol).as("i"), col("_pos").as("p"))).as("f"))
    lines.join(first, Seq("_h"))
      .filter(col(idCol) === col("f.i") && col("_pos") === col("f.p"))
      .groupBy(idCol)
      .agg(
        concat_ws(sep,
          array_sort(collect_list(struct(col("_pos"), col("_line")))).getField("_line"))
          .as("clean_text"),
        count(lit(1)).as("kept_lines"))
  }

  /** CCNet's perplexity bucketing (Wenzek et al., "CCNet: Extracting High
    * Quality Monolingual Datasets from Web Crawl Data", 2020): per
    * language, split documents into equal head / middle / tail thirds by
    * LM perplexity ascending (head = most-fluent third — the slice CCNet
    * keeps for pretraining). `scored` carries one row per doc with
    * `langCol` and `pplCol` (e.g. [[stupidBackoffScore]]'s `sb_ppl`).
    *
    * This is the EXACT tercile form — one ntile window per language, ties
    * broken on the id so the assignment is deterministic and the DuckDB
    * oracle (q_tx_ccnet) reproduces it row-for-row. A language's window
    * partition carries all its rows, so at web scale use
    * [[perplexityBucketsApprox]] (CCNet itself cuts on histogram
    * thresholds); this exact twin is its oracle on bounded data — the
    * q_ann_brute / LSH relationship.
    */
  def perplexityBuckets(
      scored: DataFrame,
      idCol: String,
      langCol: String,
      pplCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol))
      .orderBy(col(pplCol).asc, col(idCol).asc)
    // NULL perplexity is "fluency unknown" → tail, HARD-mapped (matching
    // the approx twin) and EXCLUDED from the tercile window — inside it a
    // null row would still consume a tercile slot and shift real docs
    val scoredRows = scored.filter(col(pplCol).isNotNull)
      .withColumn("_t", ntile(3).over(w))
      .withColumn("ppl_bucket",
        when(col("_t") === 1, "head").when(col("_t") === 2, "middle")
          .otherwise("tail"))
      .drop("_t")
    scoredRows.unionByName(
      scored.filter(col(pplCol).isNull).withColumn("ppl_bucket", lit("tail")))
  }

  /** The web-scale twin of [[perplexityBuckets]]: per-language tercile
    * CUTOFFS from a mergeable bounded-memory sketch
    * (`approx_percentile`), broadcast back and applied per row — no
    * language-wide window, no skewed partition. Buckets can differ from
    * the exact form only for documents whose perplexity sits within the
    * sketch's error of a cutoff (the CCNet histogram-threshold shape).
    */
  def perplexityBucketsApprox(
      scored: DataFrame,
      idCol: String,
      langCol: String,
      pplCol: String,
      accuracy: Int = 10000): DataFrame = {
    val cuts = scored
      .filter(col(pplCol).isNotNull)
      .groupBy(col(langCol).as("_cut_lang"))
      .agg(percentile_approx(col(pplCol),
        array(lit(1.0 / 3), lit(2.0 / 3)), lit(accuracy)).as("_cuts"))
    // null-SAFE key match: a NULL language is a real group (undetected
    // language) and must tercile like any other, exactly as the exact form
    // windows it — a plain equi-join would drop its cutoffs and silently
    // sink every null-lang doc to tail
    scored.join(broadcast(cuts), col(langCol) <=> col("_cut_lang"), "left")
      .drop("_cut_lang")
      .withColumn("ppl_bucket",
        when(col(pplCol).isNull, lit("tail"))
          .when(col(pplCol) <= element_at(col("_cuts"), 1), "head")
          .when(col(pplCol) <= element_at(col("_cuts"), 2), "middle")
          .otherwise("tail"))
      // the key join put langCol first — restore the caller's column order
      .select(scored.columns.map(col).toSeq :+ col("ppl_bucket"): _*)
  }

  /** The Gopher required-word list: a kept document must contain at least
    * [[gopherRules]]' `minStopHits` of these (Rae et al. 2021, A.1.1). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher's rule-based document filter (Rae et al., "Scaling Language
    * Models: … Gopher", 2021, Appendix A.1.1) — the canonical web-corpus
    * heuristic gate, published thresholds as defaults:
    *
    *   - word count in [50, 100000]
    *   - mean word length in [3, 10]
    *   - symbol-to-word ratio ('#' or '…'/'...') ≤ 0.1
    *   - ≤ 90% of lines start with a bullet ('•', '-', '*')
    *   - ≤ 30% of lines end with an ellipsis
    *   - ≥ 80% of words contain ≥ 1 alphabetic character
    *   - ≥ `minStopHits` distinct words from [[GopherStopwords]]
    *
    * Returns the per-rule metrics plus the AND-ed `keep` — per-row array
    * expressions only (zero shuffle, whole-stage codegen'd), composing
    * with [[repetitionMetrics]] and [[graft.ops.Curate]] exactly like
    * [[qualityMetrics]]. Ratios round half-up 4 so the DuckDB oracle
    * (q_tx_gopher) reproduces them digit-for-digit.
    */
  def gopherRules(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3,
      minAlphaRatio: Double = 0.8,
      minStopHits: Int = 2): DataFrame =
    df.select(col(idCol) +: gopherExprs(textCol, minWords, maxWords,
      minMeanWordLen, maxMeanWordLen, maxSymbolRatio, maxBulletRatio,
      maxEllipsisRatio, minAlphaRatio, minStopHits)
      .map { case (n, c) => c.as(n) }: _*)

  /** The [[gopherRules]] output columns as named pure expressions — shared
    * with [[Curate.decideWeb]]'s single-projection composition. */
  private[ops] def gopherExprs(
      textCol: String,
      minWords: Int,
      maxWords: Int,
      minMeanWordLen: Double,
      maxMeanWordLen: Double,
      maxSymbolRatio: Double,
      maxBulletRatio: Double,
      maxEllipsisRatio: Double,
      minAlphaRatio: Double,
      minStopHits: Int): Seq[(String, Column)] = {
    // empty-token filter: Dedup.tokens("") is [""], which would count a
    // blank page as one word — the oracles filter empties, so must we
    val t = filter(toks(col(textCol)), x => x =!= "")
    val nW = size(t)
    def ratio(num: Column, den: Column) =
      when(den === 0, lit(0.0)).otherwise(num.cast("double") / den.cast("double"))
    val meanLen = ratio(aggregate(t, lit(0L), (acc, x) => acc + length(x)), nW)
    // occurrence counts via length deltas — '…' counts as one symbol,
    // '...' as one per three dots
    val hashes = length(col(textCol)) - length(regexp_replace(col(textCol), "#", ""))
    val dots = (length(col(textCol)) -
      length(regexp_replace(col(textCol), java.util.regex.Pattern.quote("..."), ""))) / 3
    val ell1 = length(col(textCol)) - length(regexp_replace(col(textCol), "…", ""))
    val symRatio = ratio(hashes + dots + ell1, nW)
    val lines = filter(transform(split(col(textCol), "\n"), l => trim(l)), l => l =!= "")
    val nLines = size(lines)
    val bulletLines = size(filter(lines, l =>
      l.startsWith("•") || l.startsWith("-") || l.startsWith("*")))
    val ellLines = size(filter(lines, l => l.endsWith("...") || l.endsWith("…")))
    val alphaWords = size(filter(t, w => w.rlike("[a-z]")))
    val stopHits = hits(array_distinct(t), GopherStopwords)
    val r = (c: Column) => graft.Functions.roundHalfUp(c, 4)
    val wordCount = nW.cast("long")
    val meanLenR = r(meanLen)
    val symR = r(symRatio)
    val bulletR = r(ratio(bulletLines, nLines))
    val ellR = r(ratio(ellLines, nLines))
    val alphaR = r(ratio(alphaWords, nW))
    val stopL = stopHits.cast("long")
    Seq(
      "word_count" -> wordCount,
      "mean_word_len" -> meanLenR,
      "symbol_ratio" -> symR,
      "bullet_ratio" -> bulletR,
      "ellipsis_ratio" -> ellR,
      "alpha_ratio" -> alphaR,
      "stop_hits" -> stopL,
      "keep" -> (wordCount.between(minWords, maxWords) &&
        meanLenR.between(minMeanWordLen, maxMeanWordLen) &&
        symR <= maxSymbolRatio && bulletR <= maxBulletRatio &&
        ellR <= maxEllipsisRatio && alphaR >= minAlphaRatio &&
        stopL >= minStopHits))
  }

  /** C4's line-level cleaner (Raffel et al., "Exploring the Limits of
    * Transfer Learning with a Unified Text-to-Text Transformer", 2020,
    * §2.2) — the other canonical web-corpus gate next to [[gopherRules]]:
    *
    *   - keep only lines ending in terminal punctuation (. ! ? ")
    *     that carry at least `minLineWords` words;
    *   - drop the whole page if it mentions "lorem ipsum" or contains a
    *     curly brace (code), or if fewer than `minSentences` sentences
    *     survive the line filter (sentences ≈ terminal-punctuation marks
    *     in the cleaned text, C4's own approximation).
    *
    * Returns (id, clean_text, lines_kept, lines_total, sentences, keep).
    * Per-row array expressions only — zero shuffle, codegen'd; the DuckDB
    * oracle (q_tx_c4) recomputes every column.
    */
  def c4Clean(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLineWords: Int = 3,
      minSentences: Int = 3): DataFrame =
    df.select(col(idCol) +: c4Exprs(textCol, minLineWords, minSentences)
      .map { case (n, c) => c.as(n) }: _*)

  /** The [[c4Clean]] output columns as named pure expressions — shared with
    * [[Curate.decideWeb]]'s single-projection composition. */
  private[ops] def c4Exprs(
      textCol: String,
      minLineWords: Int,
      minSentences: Int): Seq[(String, Column)] = {
    val lines = filter(transform(split(col(textCol), "\n"), l => trim(l)), l => l =!= "")
    val kept = filter(lines, l =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") || l.endsWith("\"")) &&
        size(filter(split(l, "\\s+"), w => w =!= "")) >= minLineWords)
    val cleanText = array_join(kept, "\n")
    val sentences = length(cleanText) -
      length(regexp_replace(cleanText, "[.!?]", ""))
    val lowered = lower(col(textCol))
    Seq(
      "clean_text" -> cleanText,
      "lines_kept" -> size(kept).cast("long"),
      "lines_total" -> size(lines).cast("long"),
      "sentences" -> sentences.cast("long"),
      "keep" -> (!lowered.contains("lorem ipsum") && !col(textCol).contains("{") &&
        sentences >= minSentences))
  }

  /** Repetition metrics — the Gopher-style within-document repetition
    * signals corpus filters threshold on (repeated boilerplate correlates
    * with low-quality web text). All per-row array expressions: no UDFs,
    * no shuffle, whole-stage codegen'd.
    *
    *   - `dup_line_ratio`: fraction of lines that are repeats of an earlier
    *     line.
    *   - `dup_line_char_ratio`: fraction of line characters living in those
    *     repeated lines (a 1-line footer repeated 50× scores high here even
    *     when long prose keeps `dup_line_ratio` low).
    *   - `dup_token_ratio`: fraction of tokens that are repeats.
    *   - `top_token_ratio`: the most frequent token's share of all tokens.
    *
    * The per-row cost is O(L²) line compares / O(T·D) token compares —
    * the same bound (and the same explode fallback, documented at
    * [[dedupLines]]) as the rest of the per-document family.
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String, sep: String = "\n"): DataFrame =
    df.select(col(idCol) +: repetitionExprs(textCol, sep)
      .map { case (n, c) => c.as(n) }: _*)

  /** The [[repetitionMetrics]] output columns as named pure expressions —
    * shared with [[Curate.decideWeb]]'s single-projection composition. */
  private[ops] def repetitionExprs(textCol: String, sep: String): Seq[(String, Column)] = {
    val lines = split(col(textCol), java.util.regex.Pattern.quote(sep))
    val nLines = size(lines)
    val dupLines = nLines - size(array_distinct(lines))
    val indexed = zip_with(
      lines, sequence(lit(1), nLines),
      (l, i) => struct(l.as("l"), i.as("i")))
    val dupLineChars = aggregate(
      filter(indexed, e => array_position(lines, e.getField("l")) =!= e.getField("i")),
      lit(0L), (acc, e) => acc + length(e.getField("l")))
    val allLineChars = aggregate(lines, lit(0L), (acc, l) => acc + length(l))
    val t = toks(col(textCol))
    val nToks = size(t)
    val dupToks = nToks - size(array_distinct(t))
    val topTok = array_max(transform(
      array_distinct(t), d => size(filter(t, x => x === d))))
    def ratio(num: Column, den: Column) =
      when(den === 0, lit(0.0)).otherwise(num.cast("double") / den.cast("double"))
    Seq(
      "dup_line_ratio" -> graft.Functions.roundHalfUp(ratio(dupLines, nLines), 4),
      "dup_line_char_ratio" -> graft.Functions.roundHalfUp(ratio(dupLineChars, allLineChars), 4),
      "dup_token_ratio" -> graft.Functions.roundHalfUp(ratio(dupToks, nToks), 4),
      "top_token_ratio" -> graft.Functions.roundHalfUp(
        when(nToks === 0, lit(0.0)).otherwise(ratio(topTok, nToks)), 4))
  }

  /** Corpus vocabulary statistics: per-token total frequency (tf) and
    * document frequency (df) over the whole corpus — the global-statistics
    * primitive behind tokenizer training and frequency-table construction.
    * One explode + one map-side-combinable hash aggregate: at 100 TB the
    * only shuffle is keyed by token, and the optional `topK` cut is a
    * partial top-k (ORDER BY … LIMIT pushes a per-partition limit below
    * the final sort).
    */
  def vocabStats(df: DataFrame, idCol: String, textCol: String, topK: Int = 0): DataFrame = {
    val perDoc = df.select(col(idCol).as("_doc"), explode(toks(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val stats = perDoc.groupBy("token")
      .agg(count(lit(1)).as("tf"), count_distinct(col("_doc")).as("df"))
    if (topK <= 0) stats
    else stats.orderBy(col("tf").desc, col("token")).limit(topK)
  }

  /** Top-k most frequent tokens per group (per language / source / quality
    * bucket): the grouped frequent-items primitive behind per-language
    * stopword tables and domain-vocabulary drift checks. One
    * map-side-combinable aggregate keyed by (group, token), then a
    * rank-k window over the group — the window partition carries at most
    * the group's distinct tokens, never its rows. Ties break
    * lexicographically so results are deterministic.
    */
  def topTokensPerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 1)
    val counted = df
      .select(col(groupCol).as("grp"), explode(toks(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("grp", "token")
      .agg(count(lit(1)).as("tf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("tf").desc, col("token"))
    counted
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("grp").as(groupCol), col("token"), col("tf"), col("rank").cast("long").as("rank"))
  }

  /** Per-(document, token) TF-IDF weights: `tf · ln(N / df)` over
    * whitespace tokens — the weighting behind classic sparse retrieval and
    * keyword extraction. Two map-side-combinable aggregates (term
    * frequency keyed by (doc, token); document frequency keyed by token)
    * and one keyed join — at 100 TB every shuffle is on the token
    * dimension, never all-pairs. `totalDocs` comes from the caller (one
    * bounded count) so the relation stays lazily composable.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String, totalDocs: Long): DataFrame = {
    require(totalDocs > 0)
    val perDoc = df
      .select(col(idCol).as("_doc"), explode(toks(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("_doc", "token")
      .agg(count(lit(1)).as("tf"))
    val docFreq = perDoc.groupBy("token").agg(count(lit(1)).as("df"))
    perDoc
      .join(docFreq, "token")
      .select(
        col("_doc").as(idCol), col("token"), col("tf"),
        graft.Functions.roundHalfUp(
          col("tf") * log(lit(totalDocs.toDouble) / col("df")), 6).as("tfidf"))
  }

  /** Unicode script blocks for [[scriptProfile]], as portable character
    * RANGES (not `\p{script=…}` classes — Java and RE2 spell those
    * differently, and the engine's oracle contract needs one regex both
    * evaluate identically). Each entry is the script's principal BMP block;
    * known approximations: the Latin-1 range includes × (U+00D7) and ÷
    * (U+00F7), and CJK covers the unified-ideograph block only.
    */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z\\x{00C0}-\\x{00FF}",
    "cyrillic" -> "\\x{0400}-\\x{04FF}",
    "greek" -> "\\x{0370}-\\x{03FF}",
    "arabic" -> "\\x{0600}-\\x{06FF}",
    "hebrew" -> "\\x{0590}-\\x{05FF}",
    "devanagari" -> "\\x{0900}-\\x{097F}",
    "cjk" -> "\\x{4E00}-\\x{9FFF}",
    "hangul" -> "\\x{AC00}-\\x{D7AF}",
    "kana" -> "\\x{3040}-\\x{30FF}")

  /** Per-document Unicode script profile: one character count per script
    * block plus the dominant `script` ('und' when no scripted character at
    * all) — the script-detection gate multilingual pipelines run BEFORE
    * language id (a Cyrillic page should never reach an n-gram model
    * trained on Latin text, and mixed-script spam shows up as a split
    * profile). Ties break by [[ScriptRanges]] order, so the answer is
    * deterministic and the DuckDB oracle reproduces it with the same CASE
    * chain. Pure per-row regexp projections — zero shuffle, scan-bound.
    */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val counts = ScriptRanges.map { case (name, r) =>
      name -> length(regexp_replace(t, s"[^$r]", "")).cast("long")
    }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    val dominant = counts.foldRight(lit("und"): Column) { case ((name, c), acc) =>
      when(c === best && best > 0L, lit(name)).otherwise(acc)
    }
    df.select(
      (col(idCol) +:
        counts.map { case (name, c) => c.as(s"n_$name") }) :+
        dominant.as("script"): _*)
  }

  /** All-pairs sparse cosine similarity over tf-idf vectors (the APSS /
    * similarity-join problem, Bayardo et al. 2007 shape): document pairs
    * whose LEXICAL cosine meets `threshold` — the sparse complement of
    * [[graft.ops.Dedup.embeddingNearDupPairs]] (no embedding model needed,
    * and exact rather than learned similarity).
    *
    * Exactness discipline: weights `tf·ln(N/df)` are quantized to a fixed
    * 1e-6 integer grid, so norms and dot products are ORDER-FREE exact
    * integer sums (DECIMAL(38,0)) — bit-identical under any partitioning,
    * and reproducible by the SQL oracle; only the final
    * `dot/(√na·√nb)` happens in floating point, on identical integers.
    *
    * Scale shape: an inverted-index self-join on token — pair volume
    * tracks Σ df², so `maxDocFreq` caps the blowup a stopword-grade token
    * would cause (the [[graft.ops.Dedup.cdcChunkPairs]] stop-chunk guard):
    * similarity is then DEFINED over the df-capped vocabulary, which is
    * also what discriminates — a token every document carries ranks no
    * pair above any other. No cap (`Long.MaxValue`) keeps the full measure
    * for bounded corpora.
    */
  def tfidfCosinePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      totalDocs: Long,
      threshold: Double,
      maxDocFreq: Long = Long.MaxValue): DataFrame = {
    require(totalDocs > 0 && threshold > 0.0 && maxDocFreq >= 1)
    val perDoc = df
      .select(col(idCol).as("_doc"), explode(toks(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("_doc", "token")
      .agg(count(lit(1)).as("tf"))
    val docFreq = perDoc.groupBy("token").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
    val w = perDoc.join(docFreq, "token")
      .select(col("_doc"), col("token"),
        floor(col("tf") * log(lit(totalDocs.toDouble) / col("df")) * 1e6 + 0.5)
          .cast("decimal(38,0)").as("wq"))
    val norms = w.groupBy("_doc").agg(sum(col("wq") * col("wq")).as("n2"))
    val a = w.alias("a")
    val b = w.hint("SHUFFLE_HASH").alias("b")
    val dots = a
      .join(b, col("a.token") === col("b.token") && col("a._doc") < col("b._doc"))
      .groupBy(col("a._doc").as("id_a"), col("b._doc").as("id_b"))
      .agg(sum(col("a.wq") * col("b.wq")).as("dot"))
    dots
      .join(norms.select(col("_doc").as("id_a"), col("n2").as("na2")), Seq("id_a"))
      .join(norms.select(col("_doc").as("id_b"), col("n2").as("nb2")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.Functions.roundHalfUp(
          col("dot").cast("double") /
            (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))), 4)
          .as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** BM25 relevance of every document to a fixed query (Robertson/Sparck
    * Jones with the Lucene idf: `ln((N − df + 0.5)/(df + 0.5) + 1)`) — the
    * sparse-retrieval scorer for RAG/search over a curated corpus.
    *
    * One explode + ONE hash aggregate keyed by document produces the
    * per-document length and a tf column per query token (conditional
    * sums — no per-token shuffle); the corpus statistics (avgdl, per-token
    * df) reduce that to a single broadcast row. The final score is a fixed
    * left-to-right expression over the query tokens, and avgdl is computed
    * as exact-integer `sum(dl)/N`, so scores are deterministic across
    * engines and partitionings (rounded half-up to 6). `totalDocs` comes
    * from the caller, the [[tfidf]] contract.
    */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTokens: Seq[String],
      totalDocs: Long,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val q = normalizedQuery(queryTokens)
    require(totalDocs > 0)
    val tfCols = q.zipWithIndex.map { case (t, i) =>
      sum(when(col("_tok") === t, 1L).otherwise(0L)).as(s"_tf$i")
    }
    val per = df
      .select(col(idCol), explode(toks(col(textCol))).as("_tok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_dl"), tfCols: _*)
    val dfCols = q.indices.map { i =>
      sum(when(col(s"_tf$i") > 0, 1L).otherwise(0L)).as(s"_df$i")
    }
    val global = per.agg(
      (sum(col("_dl")).cast("double") / lit(totalDocs.toDouble)).as("_avgdl"),
      dfCols: _*)
    val score = q.indices
      .map { i =>
        val idf = log(
          (lit(totalDocs.toDouble) - col(s"_df$i") + 0.5) / (col(s"_df$i") + 0.5) + 1.0)
        val tf = col(s"_tf$i").cast("double")
        idf * tf * lit(k1 + 1.0) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl").cast("double") / col("_avgdl")))
      }
      .reduce(_ + _)
    per.crossJoin(broadcast(global))
      .select(col(idCol), graft.Functions.roundHalfUp(score, 6).as("bm25"))
  }

  /** Pseudo-relevance-feedback query expansion (RM1-lite, Lavrenko &
    * Croft 2001): score the corpus with [[bm25]], take the top `fbDocs`
    * feedback documents, and weight every term by its summed normalized
    * term frequency Σ_d tf(t,d)/|d| across them; the top `fbTerms` terms
    * NOT already in the query become the expansion. Per-(doc, term)
    * weights quantize to integer pico-units (`tf·10¹² div dl` — exact,
    * so the cross-doc sum is order-free) and the final ranking breaks
    * ties on the term string.
    *
    * Output: `(term, weight_pico, rank)`, rank 1-based.
    *
    * Scale shape: the bm25 pass is the corpus cost; everything after runs
    * on the `fbDocs` feedback documents (left-semi join against the
    * broadcast top-doc ids), so expansion adds one bounded aggregation.
    */
  def expandQuery(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTokens: Seq[String],
      totalDocs: Long,
      fbDocs: Int = 10,
      fbTerms: Int = 5): DataFrame = {
    require(fbDocs >= 1 && fbTerms >= 1, "fbDocs and fbTerms must be >= 1")
    val qn = normalizedQuery(queryTokens)
    val top = bm25(df, idCol, textCol, queryTokens, totalDocs)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(fbDocs)
      .select(col(idCol))
    val tf = df
      .join(broadcast(top), Seq(idCol), "left_semi")
      .select(col(idCol),
        explode(filter(toks(col(textCol)), t => t =!= "")).as("_t"))
      .groupBy(col(idCol), col("_t"))
      .agg(count(lit(1)).as("_tf"))
    val dl = tf.groupBy(col(idCol)).agg(sum(col("_tf")).as("_dl"))
    val ranked = tf
      .join(dl, Seq(idCol))
      .select(col("_t"), expr("(_tf * 1000000000000) div _dl").as("_w"))
      .filter(!col("_t").isin(qn: _*))
      .groupBy(col("_t"))
      .agg(sum(col("_w")).as("weight_pico"))
      .orderBy(col("weight_pico").desc, col("_t"))
      .limit(fbTerms)
    ranked
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("weight_pico").desc, col("_t"))).cast("long"))
      .select(col("_t").as("term"), col("weight_pico"), col("rank"))
  }

  /** Training-sample chunking: split each document into sliding token
    * windows of `chunkTokens` tokens advancing by `chunkTokens -
    * overlapTokens` (consecutive chunks share `overlapTokens` tokens, so no
    * cross-chunk context is lost at window boundaries — the standard
    * context-window prep for LLM training/RAG corpora). One row per chunk:
    * (id, chunk_idx, chunk_text, chunk_tokens); the final chunk may be
    * short, but every chunk contributes at least one token beyond the
    * previous chunk's overlap (a tail shorter than the overlap would
    * otherwise emit a final chunk fully contained in its predecessor).
    * Pure per-row expressions + one generator — no UDF, no shuffle;
    * output partitioning inherits the input's, so a downstream
    * `repartition` is only needed when chunk fan-out skews partition sizes.
    */
  def chunkTokenWindows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens >= 1 && overlapTokens >= 0 && overlapTokens < chunkTokens,
      "need chunkTokens >= 1 and 0 <= overlapTokens < chunkTokens")
    val step = chunkTokens - overlapTokens
    val t = toks(col(textCol))
    // tokenization never yields an empty array (split of "" is [""]), so
    // every document emits >= 1 chunk and the sequence bound is safe;
    // ceil((n - overlap) / step) starts: the last chunk must reach past the
    // previous chunk's end, never sit inside its overlap
    val nChunks =
      floor((greatest(size(t) - overlapTokens, lit(1)) - 1) / step).cast("int") + 1
    df.select(col(idCol), t.as("_t"), posexplode(sequence(lit(0), nChunks - 1)))
      .select(
        col(idCol),
        col("pos").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("_t"), col("pos") * step + 1, lit(chunkTokens))).as("chunk_text"),
        least(size(col("_t")) - col("pos") * step, lit(chunkTokens))
          .cast("long").as("chunk_tokens"))
  }

  /** Content-defined chunking: cut a document after token `i` whenever the
    * md5 of the trailing `window`-token gram lands in the `1/avgTokens`
    * residue band — the shift-resistant alternative to fixed windows.
    * Because a cut decision depends only on the `window` tokens behind it,
    * inserting or deleting text perturbs chunk boundaries only until the
    * next surviving cut point, after which every downstream chunk (and its
    * `chunk_hash`) is byte-identical to the unedited document's — so
    * chunk-level exact dedup catches duplicated content that a fixed-stride
    * chunker would miss after any single-token edit (the same cut-point
    * trick rsync/LBFS-style dedup uses, re-expressed over tokens).
    *
    * Expected chunk length is `avgTokens` (geometric); the hash derivation
    * is [[graft.Functions.md5Bits]] so a SQL oracle reproduces cut points
    * bit-for-bit. Pure per-row array expressions + one generator — no UDF,
    * no shuffle, O(len) md5 calls per document.
    *
    * Output: (id, chunk_idx, chunk_start, chunk_tokens, chunk_text,
    * chunk_hash) with `chunk_start` the 0-based token offset.
    */
  def chunkContentDefined(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 4,
      avgTokens: Int = 16): DataFrame = {
    require(window >= 1 && avgTokens >= 2, "need window >= 1 and avgTokens >= 2")
    val t = toks(col(textCol))
    val n = size(t)
    // candidate cut positions: [window, n-1] — a document shorter than the
    // hash window is always a single chunk, and position n never cuts (it
    // would only emit an empty trailing chunk)
    val candidates =
      when(n - 1 >= window, sequence(lit(window), n - 1))
        .otherwise(array().cast("array<int>"))
    val cuts = filter(candidates, i =>
      graft.Functions.md5Bits(
        concat_ws(" ", slice(t, i - (window - 1), lit(window))), 32) % avgTokens === 0)
    // explicit-count repartition: O(len) md5 calls per row vastly exceed
    // bytes per row, so AQE's size-based coalescing would otherwise run the
    // whole corpus in a handful of tasks (same rationale as
    // Dedup.shingleRows)
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    df.repartition(parallelism, col(idCol))
      .select(col(idCol), t.as("_t"), cuts.as("_cuts"))
      .select(
        col(idCol), col("_t"),
        posexplode(zip_with(
          concat(array(lit(0)), col("_cuts")),
          concat(col("_cuts"), array(size(col("_t")))),
          (a, b) => struct(a.as("s"), b.as("e")))))
      .select(
        col(idCol),
        col("pos").cast("long").as("chunk_idx"),
        col("col.s").cast("long").as("chunk_start"),
        (col("col.e") - col("col.s")).cast("long").as("chunk_tokens"),
        concat_ws(" ",
          slice(col("_t"), col("col.s") + 1, col("col.e") - col("col.s"))).as("chunk_text"))
      .withColumn("chunk_hash", md5(col("chunk_text")))
  }

  /** Conjunctive boolean retrieval: documents containing EVERY query token
    * (the exact-match companion to [[bm25]] ranking). One explode filtered
    * to the query tokens — predicate pushdown carries `token IN (...)` to
    * the scan — then a doc-keyed distinct-count compared to the query
    * size. All shuffles keyed by document id; a hot stop-word in the query
    * costs rows proportional to its df, never pairs.
    */
  def booleanSearch(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTokens: Seq[String]): DataFrame = {
    val q = normalizedQuery(queryTokens)
    df.select(col(idCol), explode(toks(col(textCol))).as("_tok"))
      .filter(col("_tok").isin(q: _*))
      .groupBy(col(idCol))
      .agg(count_distinct(col("_tok")).as("matched"))
      .filter(col("matched") === q.size.toLong)
      .select(col(idCol), col("matched"))
  }

  /** A built inverted text index: distinct (token, id) postings plus the
    * hash-bucket count the postings are partitioned by. Carrying `buckets`
    * in the type (and persisting it) means a search against a reloaded
    * index can never hash a query token into the wrong partition layout —
    * the [[SimilaritySearch.LshIndex]] lesson applied to text.
    */
  case class TextIndex(relation: DataFrame, buckets: Int)

  private def tokenBucket(token: Column, buckets: Int): Column =
    pmod(graft.Functions.md5Bits(token, 32), lit(buckets)).cast("long")

  /** Build the inverted index: one explode + distinct, each posting tagged
    * with its token's md5 bucket. Partitioning by raw token would create a
    * directory per distinct token (millions); `buckets` hash directories
    * keep listings bounded while a query still prunes to ≤ |query| of them.
    */
  def buildTextIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 256): TextIndex = {
    require(buckets >= 1)
    TextIndex(
      df.select(col(idCol), explode(toks(col(textCol))).as("token"))
        .filter(col("token") =!= "")
        .distinct()
        .withColumn("tok_bucket", tokenBucket(col("token"), buckets)),
      buckets)
  }

  private val TextMetaFile = "_text_meta.json"

  /** Persist the index partitioned by token bucket; the bucket count rides
    * along so [[loadTextIndex]] validates instead of guessing.
    */
  def saveTextIndex(index: TextIndex, path: String): Unit = {
    index.relation.write.mode("overwrite").partitionBy("tok_bucket").parquet(path)
    val spark = index.relation.sparkSession
    val p = new org.apache.hadoop.fs.Path(path, TextMetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"""{"buckets":${index.buckets}}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def loadTextIndex(spark: org.apache.spark.sql.SparkSession, path: String): TextIndex = {
    val p = new org.apache.hadoop.fs.Path(path, TextMetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$path has no $TextMetaFile — not an index written by saveTextIndex")
    val in = fs.open(p)
    val json =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val m = """"buckets"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
    require(m.isDefined, s"$TextMetaFile at $path is missing field buckets: $json")
    TextIndex(spark.read.parquet(path), m.get.group(1).toInt)
  }

  /** Conjunctive search over a prebuilt/persisted index: the query tokens'
    * buckets are computed driver-side (the md5 twin of [[tokenBucket]]), so
    * the scan prunes to ≤ |query| partition directories before the token
    * filter even runs — build once, search many, never re-tokenize the
    * corpus per query.
    */
  def booleanSearchIndexed(
      index: TextIndex,
      idCol: String,
      queryTokens: Seq[String]): DataFrame = {
    val q = normalizedQuery(queryTokens)
    val buckets = q
      .map(t => SimilaritySearch.md5Bits32(t) % index.buckets).distinct
    index.relation
      .filter(col("tok_bucket").isin(buckets: _*) && col("token").isin(q: _*))
      .groupBy(col(idCol))
      .agg(count_distinct(col("token")).as("matched"))
      .filter(col("matched") === q.size.toLong)
      .select(col(idCol), col("matched"))
  }

  /** Per-document bigram occurrences (w1, w2) in token order — the n=2
    * sibling of [[Dedup.shingleRows]] keeping the components separate
    * (prefix counts need w1 on its own). posexplode + lead window, codegen'd
    * builtins throughout; the explicit-count repartition defeats AQE's
    * size-based coalescing for the same reason as shingleRows. Documents
    * with fewer than two tokens emit nothing.
    */
  private[ops] def bigramRows(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // no size(t) alongside the generator (it would collapse above the
    // explode, carry the raw text through GenerateExec, and re-split it
    // per OUTPUT row — the shingleRows skew trap) and no window lead
    // either (a per-document sort every consumer pays): the two token
    // streams zip BEFORE the generator — tokenize once into a column,
    // slice+zip once per document, trailing struct carries a null that
    // marks the incomplete tail (the Dedup.shingleRows discipline)
    df.repartition(parallelism, col(idCol))
      .select(col(idCol), t.as("_toks"))
      .select(col(idCol), posexplode(arrays_zip(
        col("_toks").as("t0"),
        slice(col("_toks"), lit(2), size(col("_toks"))).as("t1"))))
      .filter(col("col.t1").isNotNull)
      .select(col(idCol), col("col.t0").as("w1"), col("col.t1").as("w2"))
  }

  /** Bigram language-model perplexity — the KenLM-shaped quality signal
    * corpus filters threshold on (score every document against a model fit
    * on a trusted/clean corpus; gibberish, boilerplate, and wrong-language
    * text all score high). Add-k smoothing:
    *
    *   P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V)
    *
    * with `c` the train-corpus bigram counts, `c(w1)` the prefix counts, and
    * `V = vocabSize` the train vocabulary size (caller-supplied bounded
    * count, the [[tfidf]]/`totalDocs` contract — keeps this relation lazily
    * composable). An unseen prefix backs off to the uniform 1/V.
    *
    * Output per score-corpus document: `n_bigrams`, `avg_nll` (mean negative
    * natural-log likelihood per bigram, rounded half-up 6), `perplexity`
    * (e^avg_nll, rounded half-up 4); documents with < 2 tokens surface with
    * `n_bigrams = 0` and null scores rather than vanishing. Per-bigram
    * log-probs are scaled to integer nano-nats and summed EXACTLY as longs
    * — float sums are partition-order-dependent, integer sums are not — so
    * results are bit-identical across engines and partitionings (the same
    * exact-integer trick as [[bm25]]'s avgdl).
    *
    * Scale shape: model fitting is two map-side-combinable aggregates keyed
    * by bigram/prefix; scoring is two keyed joins (never all-pairs) + one
    * doc-keyed aggregate. A hot prefix ("the") skews the c1 join's probe
    * side only — one build row per key, AQE skew split applies.
    */
  def bigramPerplexity(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      score: DataFrame,
      scoreIdCol: String,
      scoreTextCol: String,
      vocabSize: Long,
      addK: Double = 0.5): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive (distinct train tokens)")
    require(addK > 0.0, "add-k smoothing needs k > 0")
    val c2 = bigramRows(train, trainIdCol, trainTextCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("_c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("_c2")).as("_c1"))
    val k = lit(addK)
    val p = (coalesce(col("_c2"), lit(0L)).cast("double") + k) /
      (coalesce(col("_c1"), lit(0L)).cast("double") + k * lit(vocabSize.toDouble))
    val perDoc = bigramRows(score, scoreIdCol, scoreTextCol)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .select(col(scoreIdCol), floor(-log(p) * 1e9 + 0.5).as("_nll"))
      .groupBy(scoreIdCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_nll")).as("_ss"))
    val mean = col("_ss").cast("double") / col("n_bigrams").cast("double") / 1e9
    score.select(col(scoreIdCol))
      .join(perDoc, Seq(scoreIdCol), "left")
      .select(
        col(scoreIdCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        graft.Functions.roundHalfUp(mean, 6).as("avg_nll"),
        graft.Functions.roundHalfUp(exp(mean), 4).as("perplexity"))
  }

  /** PMI collocation mining: pointwise mutual information of adjacent
    * token pairs,
    *
    *   pmi(x,y) = ln( (c(x,y)/N₂) / ((c(x)/N₁)·(c(y)/N₁)) )
    *
    * with c(x,y) corpus bigram counts, c(·) corpus unigram counts, N₂/N₁
    * their totals — the classic collocation detector (Church & Hanks
    * 1990), used on training corpora to spot glued-together artifacts
    * ("click here", "all rights reserved") and to audit tokenizer merge
    * candidates. Pairs below `minCount` are noise (PMI's low-count bias)
    * and are dropped BEFORE the joins.
    *
    * Output: `(w1, w2, pair_count, pmi)` with pmi half-up at 6 decimals,
    * computed per output row (no float aggregation — the only sums are
    * exact long counts, so the relation is hash-exact for the oracle).
    *
    * Scale shape: two map-side-combinable count aggregates keyed by
    * bigram/token, two vocab-keyed joins on the ≥minCount survivors, and
    * one broadcast of the two-scalar totals row. Never all-pairs.
    */
  def pmiCollocations(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    // both count tables pinned: c2 feeds the n2 total AND the thresholded
    // join, uni feeds the n1 total AND both unigram joins — without the
    // pins each reader re-runs a full corpus tokenization pass
    val c2 = bigramRows(df, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("pair_count"))
      .localCheckpoint(true)
    val uni = df
      .select(explode(filter(toks(col(textCol)), t => t =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val totals = c2.agg(sum(col("pair_count")).as("n2"))
      .crossJoin(uni.agg(sum(col("c")).as("n1")))
    c2.filter(col("pair_count") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c_w1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c_w2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(
        col("w1"), col("w2"), col("pair_count"),
        graft.Functions.roundHalfUp(
          log(col("pair_count").cast("double") * col("n1").cast("double") *
            col("n1").cast("double") /
            (col("n2").cast("double") * col("c_w1").cast("double") *
              col("c_w2").cast("double"))), 6).as("pmi"))
  }

  /** Windowed PPMI co-occurrence (the count-based word-association matrix
    * behind classical distributional embeddings — Levy & Goldberg 2014):
    * token pairs co-occurring within `window` positions (unordered,
    * canonical (min, max) spelling), scored
    *
    *   ppmi(x,y) = max(0, ln( (c(x,y)/N₂) / ((c(x)/N₁)·(c(y)/N₁)) ))
    *
    * with pair counts from one zipped-stream explode (no per-doc sort, no
    * positions self-join), unigram counts as in
    * [[pmiCollocations]], and pairs below `minCount` dropped before the
    * joins. Output: `(w1, w2, pair_count, ppmi)` with w1 ≤ w2 and ppmi
    * half-up 6 (0.0-floored — negative associations carry no signal at
    * these counts).
    */
  def ppmiCooccurrence(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 3,
      minCount: Long = 5L): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // windowless pair builder (the shingleRows discipline): the `window`+1
    // token streams zip BEFORE the first generator — tokenize once, k
    // linear slices per document — and each exploded position emits its
    // ≤window co-occurrence pairs through a SECOND codegen'd generator
    // (array of structs), so no per-document sort, no text through
    // GenerateExec, and no k-way unionAll re-running the explode per
    // offset (the pre-r12 shape recomputed the whole subtree per k)
    val streams = col("_toks").as("t0") +: (1 to window).map(k =>
      slice(col("_toks"), lit(k + 1), size(col("_toks"))).as(s"t$k"))
    // the UNIGRAM stream rides the same zipped explode as the pairs (t0
    // visits every token exactly once), so the corpus tokenizes and
    // explodes ONCE for both count tables — the former separate unigram
    // subtree was a second full corpus pass. One tagged generator, one
    // shuffle, one pin; the two tables split off the counted relation.
    val pairStructs = (1 to window).map { k =>
      val (a, b) = (col("col.t0"), col(s"col.t$k"))
      struct(
        lit("p").as("kind"), least(a, b).as("w1"), greatest(a, b).as("w2"),
        (b.isNotNull && a =!= "" && b =!= "").as("ok"))
    }
    val uniStruct = struct(
      lit("u").as("kind"), col("col.t0").as("w1"), lit("").as("w2"),
      (col("col.t0") =!= "").as("ok"))
    val emitted = df
      .repartition(parallelism, col(idCol))
      .select(col(idCol), toks(col(textCol)).as("_toks"))
      .select(col(idCol), posexplode(arrays_zip(streams: _*)))
      .select(explode(array(uniStruct +: pairStructs: _*)).as("p"))
      .filter(col("p.ok"))
      .select(col("p.kind").as("kind"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val counted = emitted.groupBy("kind", "w1", "w2")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val c2 = counted.filter(col("kind") === "p")
      .select(col("w1"), col("w2"), col("c").as("pair_count"))
    val uni = counted.filter(col("kind") === "u")
      .select(col("w1").as("w"), col("c"))
    val totals = c2.agg(sum(col("pair_count")).as("n2"))
      .crossJoin(uni.agg(sum(col("c")).as("n1")))
    c2.filter(col("pair_count") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c_w1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c_w2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(
        col("w1"), col("w2"), col("pair_count"),
        graft.Functions.roundHalfUp(
          greatest(
            log(col("pair_count").cast("double") * col("n1").cast("double") *
              col("n1").cast("double") /
              (col("n2").cast("double") * col("c_w1").cast("double") *
                col("c_w2").cast("double"))),
            lit(0.0)), 6).as("ppmi"))
  }

  /** Search-result snippet extraction: the `windowTokens`-token window of
    * each document with the most query-token hits (earliest window on
    * ties), as search engines render hit context. Output per document:
    * `(idCol, start_tok, n_hits, snippet)` — `start_tok` the 0-based token
    * offset of the chosen window, `snippet` its tokens space-joined.
    * Documents shorter than the window return the whole document;
    * hit-free documents return the leading window with `n_hits = 0`.
    *
    * Pure array expressions over the token list — no explode, no shuffle,
    * embarrassingly parallel per row. Cost is O(tokens · windowTokens)
    * per document (windowed hit-count via slice sums), the right trade
    * below ~10²-token windows; a prefix-sum rewrite saves nothing until
    * windows get much longer than snippets ever are.
    */
  def snippets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTokens: Seq[String],
      windowTokens: Int = 12): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")
    val qn = normalizedQuery(queryTokens)
    require(qn.nonEmpty, "query must contain at least one token")
    val pos = array_position(col("_scores"), array_max(col("_scores")))
    df
      .select(col(idCol),
        filter(toks(col(textCol)), t => t =!= "").as("_tk"))
      .select(col(idCol), col("_tk"),
        transform(col("_tk"),
          t => when(t.isin(qn: _*), 1).otherwise(0)).as("_hit"))
      .select(col(idCol), col("_tk"),
        transform(
          sequence(lit(0), greatest(size(col("_tk")) - windowTokens, lit(0))),
          i => aggregate(slice(col("_hit"), i + 1, lit(windowTokens)),
            lit(0), (a, x) => a + x))
          .as("_scores"))
      .select(
        col(idCol),
        (pos - 1).cast("long").as("start_tok"),
        array_max(col("_scores")).cast("long").as("n_hits"),
        array_join(slice(col("_tk"), pos.cast("int"), lit(windowTokens)), " ")
          .as("snippet"))
  }

  /** Per-document trigram occurrences (w1, w2, w3) in token order — the
    * n=3 sibling of [[bigramRows]] (posexplode + two lead windows over the
    * same sort, one window pass). Documents with fewer than three tokens
    * emit nothing.
    */
  private[ops] def trigramRows(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // windowless + size(t)-free for the same reasons as bigramRows: three
    // pre-zipped token streams, the third field's null-ness marks
    // incomplete tails
    df.repartition(parallelism, col(idCol))
      .select(col(idCol), t.as("_toks"))
      .select(col(idCol), posexplode(arrays_zip(
        col("_toks").as("t0"),
        slice(col("_toks"), lit(2), size(col("_toks"))).as("t1"),
        slice(col("_toks"), lit(3), size(col("_toks"))).as("t2"))))
      .filter(col("col.t2").isNotNull)
      .select(col(idCol), col("col.t0").as("w1"),
        col("col.t1").as("w2"), col("col.t2").as("w3"))
  }

  /** Trigram language-model scoring with STUPID BACKOFF (Brants et al.,
    * "Large Language Models in Machine Translation", EMNLP 2007) — the
    * web-scale LM recipe: relative frequencies with a fixed backoff factor
    * instead of normalized discounting, exactly because it needs only
    * count tables and keyed joins:
    *
    *   S(w3|w1w2) = c(w1w2w3)/c(w1w2)        if the trigram was seen
    *              = λ·c(w2w3)/c(w2)           else if the bigram was seen
    *              = λ²·c(w3)/N                else if the unigram was seen
    *              = λ²·1/(N + vocabSize)      else (OOV floor — S stays > 0)
    *
    * with λ = `lambda` (0.4 in the paper) and `N` the train token count.
    * Scores are not normalized probabilities (the paper's point); the
    * per-document mean negative log score is still a well-ordered quality
    * signal, and a trigram model with backoff separates fluent from
    * shuffled text far better than the bigram-only [[bigramPerplexity]].
    *
    * Output per score-corpus document: `n_trigrams`, `avg_nll` (mean
    * negative natural-log score per trigram, rounded half-up 6),
    * `sb_ppl` (e^avg_nll, rounded half-up 4); documents with < 3 tokens
    * surface with `n_trigrams = 0` and null scores. Per-trigram logs are
    * floored to integer nano-nats and summed as LONGs (the
    * [[bigramPerplexity]] determinism discipline).
    *
    * Scale shape: model fitting is three map-side-combinable count
    * aggregates (trigram/bigram/unigram); scoring is four keyed joins
    * (never all-pairs) + one doc-keyed aggregate; `N` rides a broadcast
    * one-row aggregate. Hot prefixes skew probe sides only.
    */
  def stupidBackoffScore(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      score: DataFrame,
      scoreIdCol: String,
      scoreTextCol: String,
      vocabSize: Long,
      lambda: Double = 0.4): DataFrame =
    stupidBackoffScoreFromCounts(
      df1(train, trainIdCol, trainTextCol),
      bigramCounts(train, trainIdCol, trainTextCol),
      trigramCounts(train, trainIdCol, trainTextCol),
      score, scoreIdCol, scoreTextCol, vocabSize, lambda)

  /** [[stupidBackoffScore]] from PRE-BUILT count tables — the artifact path
    * ([[LangModel]]): `c1 (token, _c1)`, `c2 (w1, w2, _c2)`,
    * `c3 (w1, w2, w3, _c3)`. The corpus total `N` is derived from `c1`, so
    * the three tables ARE the whole model and fit-then-score ≡
    * score-from-train exactly.
    */
  def stupidBackoffScoreFromCounts(
      c1: DataFrame,
      c2: DataFrame,
      c3: DataFrame,
      score: DataFrame,
      scoreIdCol: String,
      scoreTextCol: String,
      vocabSize: Long,
      lambda: Double = 0.4): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive (distinct train tokens)")
    require(lambda > 0.0 && lambda <= 1.0, s"backoff lambda must be in (0,1], got $lambda")
    val n = c1.agg(coalesce(sum(col("_c1")), lit(0L)).as("_n"))

    val st = trigramRows(score, scoreIdCol, scoreTextCol)
      .join(c3, Seq("w1", "w2", "w3"), "left")
      .join(c2.select(col("w1"), col("w2"), col("_c2").as("_c12")), Seq("w1", "w2"), "left")
      .join(c2.select(col("w1").as("w2"), col("w2").as("w3"), col("_c2").as("_c23")),
        Seq("w2", "w3"), "left")
      .join(c1.select(col("token").as("w3"), col("_c1").as("_c3u")), Seq("w3"), "left")
      .crossJoin(broadcast(n))
    val l = lit(lambda)
    val s = when(col("_c3").isNotNull && col("_c12").isNotNull,
        col("_c3").cast("double") / col("_c12").cast("double"))
      .when(col("_c23").isNotNull,
        l * col("_c23").cast("double") /
          // c(w2) = unigram count of w2; a seen bigram implies a seen w2
          col("_c2w").cast("double"))
      .when(col("_c3u").isNotNull,
        l * l * col("_c3u").cast("double") / col("_n").cast("double"))
      .otherwise(l * l / (col("_n").cast("double") + lit(vocabSize.toDouble)))
    val perDoc = st
      .join(c1.select(col("token").as("w2"), col("_c1").as("_c2w")), Seq("w2"), "left")
      .select(col(scoreIdCol), floor(-log(s) * 1e9 + 0.5).cast("long").as("_nll"))
      .groupBy(scoreIdCol)
      .agg(count(lit(1)).as("n_trigrams"), sum(col("_nll")).as("_ss"))
    val mean = col("_ss").cast("double") / col("n_trigrams").cast("double") / 1e9
    score.select(col(scoreIdCol))
      .join(perDoc, Seq(scoreIdCol), "left")
      .select(
        col(scoreIdCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        graft.Functions.roundHalfUp(mean, 6).as("avg_nll"),
        graft.Functions.roundHalfUp(exp(mean), 4).as("sb_ppl"))
  }

  /** Interpolated Kneser-Ney bigram LM scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999 §3) — the discount-and-continuation smoothing KenLM (and
    * therefore CCNet's fluency signal) is built on, completing the LM
    * family beside the add-k bigram and trigram stupid-backoff scorers.
    * The KN innovation is the backoff distribution: instead of unigram
    * FREQUENCY, a word's weight is how many distinct contexts it follows
    * (`N1+(·w)`), so "francisco" (frequent but glued to "san") stops
    * looking probable in novel contexts — the property the spec pins.
    *
    * With fixed discount D:
    * {{{
    *   P(w2|w1) = max(c(w1 w2) − D, 0)/c(w1·)
    *              + D·N1+(w1·)/c(w1·) · Pcont(w2)      if w1 seen
    *            = Pcont(w2)                             otherwise
    *   Pcont(w2) = (N1+(·w2) + 1) / (|bigram types| + V)
    * }}}
    * (`Pcont` is add-one smoothed over the V-token vocabulary so unseen
    * words carry uniform mass and every probability is strictly positive.)
    *
    * Scale shape: the count tables come from ONE pass over the train
    * corpus (`c2` and two bounded re-aggregations of it); scoring is three
    * keyed joins against those tables plus one broadcast one-row total —
    * the stupid-backoff plan shape exactly. Per-bigram NLLs accumulate as
    * integer nano-nats, so doc scores are partitioning-independent and the
    * DuckDB oracle (q_tx_kn_ppl) reproduces them digit-for-digit.
    */
  def kneserNeyScore(
      train: DataFrame,
      trainIdCol: String,
      trainTextCol: String,
      score: DataFrame,
      scoreIdCol: String,
      scoreTextCol: String,
      vocabSize: Long,
      discount: Double = 0.75): DataFrame =
    kneserNeyScoreFromCounts(
      bigramCounts(train, trainIdCol, trainTextCol),
      score, scoreIdCol, scoreTextCol, vocabSize, discount)

  /** [[kneserNeyScore]] from a PRE-BUILT bigram count table `(w1, w2, _c2)`
    * — the artifact path: fit the counts once ([[LangModel.fit]]), persist
    * them ([[LangModel.save]]), and score any number of later corpora
    * against the loaded model without touching the train corpus again
    * (KenLM's train/score split, which CCNet relies on: the wiki-trained
    * model is a fixed artifact, the web corpus only ever scores). Identical
    * arithmetic to the train-DataFrame form — ctx/cont/totals are
    * re-aggregations of `c2`, so fit-then-score ≡ score-from-train exactly.
    */
  def kneserNeyScoreFromCounts(
      c2: DataFrame,
      score: DataFrame,
      scoreIdCol: String,
      scoreTextCol: String,
      vocabSize: Long,
      discount: Double = 0.75): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive (distinct train tokens)")
    require(discount > 0.0 && discount < 1.0, s"KN discount must be in (0,1), got $discount")
    // left-context stats: c(w1·) and N1+(w1·) — re-aggregations of c2,
    // never a second corpus pass
    val ctx = c2.groupBy("w1").agg(sum("_c2").as("_c1x"), count(lit(1)).as("_n1f"))
    val cont = c2.groupBy("w2").agg(count(lit(1)).as("_n1b"))
    val totals = c2.agg(count(lit(1)).as("_bt"))
    val sb = bigramRows(score, scoreIdCol, scoreTextCol)
      .join(c2, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(totals))
    val d = lit(discount)
    val pcont = (coalesce(col("_n1b"), lit(0L)).cast("double") + lit(1.0)) /
      (col("_bt").cast("double") + lit(vocabSize.toDouble))
    val p = when(col("_c1x").isNotNull,
        greatest(coalesce(col("_c2"), lit(0L)).cast("double") - d, lit(0.0)) /
          col("_c1x").cast("double") +
          d * col("_n1f").cast("double") / col("_c1x").cast("double") * pcont)
      .otherwise(pcont)
    val perDoc = sb
      .select(col(scoreIdCol), floor(-log(p) * 1e9 + 0.5).cast("long").as("_nll"))
      .groupBy(scoreIdCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_nll")).as("_ss"))
    val mean = col("_ss").cast("double") / col("n_bigrams").cast("double") / 1e9
    score.select(col(scoreIdCol))
      .join(perDoc, Seq(scoreIdCol), "left")
      .select(
        col(scoreIdCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        graft.Functions.roundHalfUp(mean, 6).as("avg_nll"),
        graft.Functions.roundHalfUp(exp(mean), 4).as("kn_ppl"))
  }

  /** Train-corpus unigram occurrence counts `(token, _c1)`. */
  private[ops] def df1(train: DataFrame, idCol: String, textCol: String): DataFrame =
    train.select(explode(toks(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("_c1"))

  /** Train-corpus bigram occurrence counts `(w1, w2, _c2)` — the table the
    * KN scorer (and the stupid-backoff middle arm) is built from, exposed
    * so [[LangModel]] can persist it as an artifact.
    */
  private[ops] def bigramCounts(train: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramRows(train, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("_c2"))

  /** Train-corpus trigram occurrence counts `(w1, w2, w3, _c3)`. */
  private[ops] def trigramCounts(train: DataFrame, idCol: String, textCol: String): DataFrame =
    trigramRows(train, idCol, textCol)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("_c3"))

  /** PII/URL scrubbing: replace emails and URLs with placeholder tokens
    * (the normalization pass every web-scale corpus runs before training).
    * Patterns use the portable character-class subset shared by Java regex
    * and RE2, so SQL oracles reproduce them byte-for-byte.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def scrub(text: Column): Column =
    regexp_replace(regexp_replace(text, UrlPattern, "<URL>"), EmailPattern, "<EMAIL>")

  /** PII audit: per-document match COUNTS for each sensitive pattern plus
    * a release flag — the report a curation pipeline needs before deciding
    * to [[scrub]] or drop (counting, unlike replacement, also quantifies
    * leak density for dataset cards). Pure per-row `regexp_count`
    * projection, zero shuffles; the patterns are the shared
    * Java-regex/RE2-compatible dialect of the scrub/web family.
    */
  def piiAudit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nEmails = regexp_count(t, lit(EmailPattern)).cast("long")
    val nUrls = regexp_count(t, lit(UrlPattern)).cast("long")
    val nIps = regexp_count(t, lit(Ipv4Pattern)).cast("long")
    df.select(
      col(idCol),
      nEmails.as("n_emails"),
      nUrls.as("n_urls"),
      nIps.as("n_ips"),
      (nEmails + nUrls + nIps === 0L).as("clean"))
  }

  /** Span-level PII audit: one `(id, kind, span_start, span_end)` row per
    * sensitive match — the offsets [[piiAudit]]'s counts can't give a
    * redaction reviewer (slice the exact characters; verify the scrub
    * touched precisely them). Offsets are UTF-16 units (Java regex, the
    * [[graft.expressions.RegexSpans]] contract); kinds are the shared
    * email/url/ipv4 pattern family. One pass: a per-row literal
    * (kind, spans) array explodes twice — no joins, no shuffles; output
    * volume is the match count, never the corpus.
    */
  def piiSpans(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val kinds = array(
      struct(lit("email").as("kind"),
        graft.Functions.regexSpans(t, EmailPattern).as("spans")),
      struct(lit("url").as("kind"),
        graft.Functions.regexSpans(t, UrlPattern).as("spans")),
      struct(lit("ip").as("kind"),
        graft.Functions.regexSpans(t, Ipv4Pattern).as("spans")))
    df.filter(t.isNotNull)
      .select(col(idCol), explode(kinds).as("_k"))
      .select(col(idCol), col("_k.kind").as("kind"), explode(col("_k.spans")).as("_s"))
      .select(col(idCol), col("kind"),
        col("_s.start").cast("long").as("span_start"),
        col("_s.end").cast("long").as("span_end"))
  }

  /** Dictionary keyword tagging: one `(id, term)` row per dictionary term
    * present in the document's token set — topic tagging, allow/block-list
    * routing, eval-suite tagging. The dictionary enters as ONE literal
    * array (bounded by construction); matching is `array_intersect` on the
    * distinct token set — per-row, zero shuffles, output bounded by
    * |dictionary| per document.
    */
  def tagKeywords(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one dictionary term")
    val dict = terms.map(_.trim.toLowerCase(java.util.Locale.ROOT)).distinct
    val matched = array_intersect(array_distinct(toks(col(textCol))), typedlit(dict))
    df.select(col(idCol), explode(matched).as("term"))
  }

  /** Unicode canonicalization for tokenizer/dedup pipelines: normalize to
    * `form` (SentencePiece uses NFKC — Kudo & Richardson 2018 §2), with
    * optional accent stripping (NFD → drop combining marks → re-normalize,
    * the fastText/CCNet convention) and locale-independent lowercasing.
    * Visually identical strings collide again instead of forking vocabulary
    * entries or escaping exact-dedup.
    *
    * Pure per-row projection: one codegen'd
    * [[graft.expressions.UnicodeNormalize]] (+ builtin regexp/lower), zero
    * shuffles; NULLs pass through.
    */
  def normalizeText(
      text: Column,
      form: String = "NFKC",
      stripAccents: Boolean = false,
      toLower: Boolean = false): Column = {
    val base =
      if (stripAccents)
        graft.Functions.unicodeNormalize(
          regexp_replace(
            graft.Functions.unicodeNormalize(text, "NFD"), "\\p{Mn}+", ""),
          form)
      else graft.Functions.unicodeNormalize(text, form)
    if (toLower) lower(base) else base
  }
  /** Shannon character entropy per document (nats) — the
    * randomness/compressibility quality signal: boilerplate, repeated
    * padding, and base64/hex blobs sit at the entropy extremes that the
    * length/punctuation heuristics miss. `H = −Σ (c/n)·ln(c/n)` over the
    * document's character distribution.
    *
    * Determinism: each character class's term is floored to integer
    * nano-nats and the per-document total is a LONG sum — order-free under
    * any partitioning, mirrored exactly by the oracle (the
    * [[bigramPerplexity]] discipline). One explode + one keyed groupBy;
    * shuffle is one row per (doc, distinct char); the doc spine re-joins
    * so empty/NULL documents report (0, 0.0) instead of vanishing. A NULL
    * id is unaddressable by the spine join and likewise reports (0, 0.0).
    */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = docs
      .select(col(idCol), explode(split(coalesce(col(textCol), lit("")), "")).as("_ch"))
      .filter(col("_ch") =!= "")
    val counts = chars.groupBy(col(idCol), col("_ch")).agg(count(lit(1)).as("_c"))
    val withN = counts.withColumn("_n",
      sum(col("_c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))))
    val p = col("_c").cast("double") / col("_n").cast("double")
    val term = floor(-(p * log(p)) * lit(1e9) + lit(0.5)).cast("long")
    val per = withN
      .groupBy(col(idCol))
      .agg(max(col("_n")).as("_nc"), sum(term).as("_e"))
    docs.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("_nc"), lit(0L)).as("n_chars"),
        graft.Functions.roundHalfUp(
          coalesce(col("_e"), lit(0L)).cast("double") / lit(1e9), 6).as("entropy_nats"))
  }

  /** Exact phrase search: documents whose token stream contains the query
    * tokens CONSECUTIVELY, with the match count — the adjacency predicate
    * boolean token search ([[search]]) cannot express ("hash join" ≠ a doc
    * with "hash" here and "join" there). Query terms normalize through the
    * family tokenization (lower/trim), match positions are evaluated as a
    * per-row array filter over the token array — no explode, no join, no
    * shuffle; the `size ≥ phrase length` guard keeps `sequence` from
    * emitting its descending phantom range on short docs (the Pack
    * lesson). Returns `(id, n_matches)` for matching documents only.
    */
  def phraseSearch(
      df: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "need at least one phrase token")
    val terms = phrase.map(_.trim.toLowerCase(java.util.Locale.ROOT))
    val tt = toks(col(textCol))
    val l = terms.length
    // the token array must bind ONCE per row: a naked `element_at(tt, i)`
    // inside the position lambda re-evaluates the split() expression per
    // position per term — O(positions²) tokenizations per document,
    // measured 3 s at sf0.1. Wrapping the computation in a one-element
    // `transform` makes the array a LAMBDA VARIABLE (an evaluated value,
    // not an expression), so every inner reference is a cheap lookup; the
    // array_contains gate then keeps the positional scan to docs that
    // contain every phrase token at all.
    val n = element_at(
      transform(array(tt), a => {
        val hits = filter(
          sequence(lit(1), size(a) - (l - 1)),
          i => terms.zipWithIndex
            .map { case (w, o) => element_at(a, i + lit(o)) === lit(w) }
            .reduce(_ && _))
        val gate = terms.distinct.map(w => array_contains(a, w)).reduce(_ && _)
        when(size(a) >= l && gate, size(hits)).otherwise(lit(0))
      }),
      1).cast("long")
    df.select(col(idCol), n.as("n_matches"))
      .filter(col("n_matches") > 0L)
  }

  /** N-gram novelty against a reference corpus — the "how much of this
    * document has the model never seen" curation signal (the complement of
    * [[Decontaminate]]'s overlap: there the reference is a benchmark to
    * EXCLUDE against; here it is the already-trained corpus and HIGH
    * novelty is what upweighting wants). Per scored document: the count of
    * its distinct `shingle`-word shingles, how many are absent from the
    * reference's shingle set, and their ratio (round-half-up 9).
    *
    * Scale shape: both sides reduce to DISTINCT shingle relations first
    * (map-side partial aggregates), the membership probe is ONE keyed
    * left join on the shingle string — never doc×doc — and the reference
    * side carries no payload beyond the key, so at 100 TB the exchange is
    * bounded by distinct-shingle volume, not corpus volume. Hot
    * boilerplate shingles skew only the probe side of the join.
    * Documents with no shingles (NULL text) keep their spine row:
    * `n_shingles = 0`, `novelty` NULL.
    */
  def noveltyScore(
      docs: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      shingle: Int = 3): DataFrame = {
    val refSh = Dedup.shingleRows(reference, idCol, textCol, shingle)
      .select(col("shingle")).distinct()
      .withColumn("_seen", lit(1))
    val scored = Dedup.shingleRows(docs, idCol, textCol, shingle)
      .select(col(idCol), col("shingle")).distinct()
    val agg = scored
      .join(refSh, Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("_total"),
        sum(when(col("_seen").isNull, 1L).otherwise(0L)).as("_novel"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("_total"), lit(0L)).as("n_shingles"),
        coalesce(col("_novel"), lit(0L)).as("n_novel"),
        graft.Functions.roundHalfUp(
          col("_novel").cast("double") / col("_total").cast("double"), 9).as("novelty"))
  }

  /** Sentence-aware RAG chunking: split text into sentences (runs ending
    * in `.!?` terminators; the trailing unterminated run is its own
    * sentence), then GREEDY-pack consecutive sentences into chunks of at
    * most `maxTokens` whitespace tokens — sentences are never split, so
    * an oversized sentence becomes its own (over-budget) chunk. The
    * retrieval-standard chunker [[chunkTokens]]' fixed-stride token
    * windows can't express: chunk boundaries land on sentence boundaries,
    * and concatenating a doc's chunk texts restores the document
    * byte-for-byte (the sentence regex consumes every character exactly
    * once — alternation, no lookarounds, so Java regex and RE2 agree).
    *
    * One row per (doc, chunk): `(id, chunk_idx, n_sentences, n_tokens,
    * chunk_text)`. Docs with NULL/empty text yield no chunks.
    *
    * Scale shape: sentence split + per-sentence token counts + the greedy
    * fold all run in the per-row ARRAY domain (one `aggregate` HOF pass,
    * token counts precomputed once per sentence — the bind-once lesson);
    * only the final chunk assembly exchanges, keyed on (id, chunk_idx)
    * with ordered rebuild via array_sort (the Sft.render shape — no
    * window sort).
    */
  def sentenceChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    val sents = regexp_extract_all(col(textCol), lit("[^.!?]*[.!?]+|[^.!?]+"), lit(0))
    // precompute each sentence's token count ONCE (a naked size(split(...))
    // inside the fold would re-split per reference)
    val pre = transform(sents, s =>
      struct(s.as("s"), size(split(trim(s), "\\s+")).cast("long").as("nt")))
    // greedy fold: (current chunk idx, its fill, per-sentence assignments)
    val folded = aggregate(
      col("_pre"),
      struct(lit(0L).as("idx"), lit(0L).as("fill"),
        array().cast("array<long>").as("asg")),
      (acc, p) => {
        val over = acc.getField("fill") > 0L &&
          acc.getField("fill") + p.getField("nt") > maxTokens.toLong
        struct(
          when(over, acc.getField("idx") + 1L).otherwise(acc.getField("idx")).as("idx"),
          when(over, p.getField("nt"))
            .otherwise(acc.getField("fill") + p.getField("nt")).as("fill"),
          concat(acc.getField("asg"),
            array(when(over, acc.getField("idx") + 1L)
              .otherwise(acc.getField("idx")))).as("asg"))
      })
    df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), col(textCol))
      .withColumn("_pre", pre)
      .filter(size(col("_pre")) > 0)
      .withColumn("_asg", folded.getField("asg"))
      .select(col(idCol),
        posexplode(arrays_zip(col("_pre"), col("_asg"))).as(Seq("_pos", "_z")))
      .select(
        col(idCol),
        col("_z._asg").as("chunk_idx"),
        col("_pos"),
        col("_z._pre.s").as("_s"),
        col("_z._pre.nt").as("_nt"))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(
        count(lit(1)).as("n_sentences"),
        sum(col("_nt")).as("n_tokens"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("_pos"), col("_s")))),
          z => z.getField("_s"))).as("chunk_text"))
  }

  /** Tokenization-economics report — the dataset-card numbers that decide
    * whether a corpus is worth its training-token budget: per doc, the
    * whitespace word count, raw byte / code-point sizes, the byte-level
    * BPE floor token count (zero merges: every word costs its UTF-8 bytes
    * + 1 — the [[Bpe]] identity q_pk_ids already exploits, here used as
    * the tokenizer-independent upper bound), tokens-per-word fertility
    * and bytes-per-token compression rate.
    *
    * Conventions: NULL text reads as the empty string; the whitespace
    * split never yields zero words (empty → 1), so neither ratio can
    * divide by zero. All counts are integers; the two ratios are single
    * divides rounded half-up 6. Pure per-row projection — zero shuffles
    * at any corpus size.
    */
  def tokenizationStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val norm = trim(lower(t))
    val words = size(split(norm, "\\s+")).cast("long")
    val wordBytes = octet_length(regexp_replace(norm, "\\s+", ""))
    df.filter(col(idCol).isNotNull)
      .select(
        col(idCol),
        words.as("n_words"),
        octet_length(t).cast("long").as("n_bytes"),
        length(t).cast("long").as("n_cp"),
        (wordBytes + words).as("byte_tokens"))
      .select(
        col(idCol), col("n_words"), col("n_bytes"), col("n_cp"), col("byte_tokens"),
        graft.Functions.roundHalfUp(
          col("byte_tokens").cast("double") / col("n_words").cast("double"), 6)
          .as("tokens_per_word"),
        graft.Functions.roundHalfUp(
          col("n_bytes").cast("double") / col("byte_tokens").cast("double"), 6)
          .as("bytes_per_token"))
  }

  /** Ordinary least squares over `(x, y)` points, folded to ONE summary row
    * — the shared tail of the corpus scaling-law fits ([[zipfFit]],
    * [[heapsLaw]]). Exactness contract: each per-point moment (x, y, x·y,
    * x², y²) is quantized to integer nano-units BEFORE the sum, so the five
    * sums are order-independent LONG additions (the [[charEntropy]]
    * nano-nat discipline) and the closed-form slope/intercept/R² — a
    * single-row double computation over the five sums — is bit-identical
    * however Spark partitions the points. The SQL oracle replays the same
    * quantize-then-sum sequence term for term.
    *
    * Input frame must carry DOUBLE columns `x` and `y`; degenerate fits
    * (fewer than 2 points, or zero x-variance) answer NULL slope/
    * intercept/r2 rather than ±Inf.
    */
  private def olsFitRow(points: DataFrame, extraAggs: Seq[Column] = Nil): DataFrame = {
    def q(c: Column) = floor(c * lit(1e9) + lit(0.5)).cast("long")
    val sums = points.agg(
      count(lit(1)).as("n_points"),
      Seq(
        sum(q(col("x"))).as("_sx"),
        sum(q(col("y"))).as("_sy"),
        sum(q(col("x") * col("y"))).as("_sxy"),
        sum(q(col("x") * col("x"))).as("_sxx"),
        sum(q(col("y") * col("y"))).as("_syy")) ++ extraAggs: _*)
    val n = col("n_points").cast("double")
    def d(c: Column) = c.cast("double") / lit(1e9)
    val (sx, sy, sxy, sxx, syy) =
      (d(col("_sx")), d(col("_sy")), d(col("_sxy")), d(col("_sxx")), d(col("_syy")))
    val cov = n * sxy - sx * sy
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    val slope = when(col("n_points") >= 2 && varX =!= lit(0.0), cov / varX)
    val intercept = (sy - slope * sx) / n
    val r2 = when(varY =!= lit(0.0), (cov * cov) / (varX * varY))
    val internal = Set("n_points", "_sx", "_sy", "_sxy", "_sxx", "_syy")
    val extraNames = sums.columns.filterNot(internal).toSeq
    sums.select(
      col("n_points") +: extraNames.map(col) :+
        graft.Functions.roundHalfUp(slope, 6).as("slope") :+
        graft.Functions.roundHalfUp(intercept, 6).as("intercept") :+
        graft.Functions.roundHalfUp(r2, 6).as("r2"): _*)
  }

  /** Zipf's-law fit over the corpus token frequency table: OLS of
    * ln(frequency) against ln(rank) — the slope should sit near −1 for
    * natural text, and a corpus whose slope drifts toward 0 (flat, boiler-
    * plate-heavy) or below −1.5 (template spam dominating the head) is a
    * standard data-quality red flag before pretraining (Zipf 1949; used as
    * a corpus-health signal in e.g. the Pile and Gopher dataset analyses).
    *
    * Ranks are assigned over (tf DESC, token ASC) — a total order, so
    * min-rank equals row_number — through [[SuffixArray.globalMinRank]]:
    * range-exchange + per-partition rank + a bounded (≤ shuffle-partitions
    * rows) broadcast offset table, never a single-partition corpus-wide
    * window. The fit tail is [[olsFitRow]]'s order-independent nano-unit
    * sums.
    *
    * Output: ONE row `(n_types, n_tokens, slope, intercept, r2)`.
    * `minTf` drops the long tail of near-hapax types whose rank noise
    * otherwise dominates the regression (fit the law where it's linear).
    */
  def zipfFit(df: DataFrame, idCol: String, textCol: String, minTf: Long = 1L): DataFrame = {
    val tf = df
      .select(explode(toks(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("tf"))
      .filter(col("tf") >= minTf)
    val ranked = SuffixArray.globalMinRank(tf, Seq(col("tf").desc, col("token")))
    val points = ranked.select(
      log(col("rank").cast("double")).as("x"),
      log(col("tf").cast("double")).as("y"),
      col("tf"))
    olsFitRow(points,
      Seq(count(lit(1)).as("n_types"), sum(col("tf")).as("n_tokens")))
      .select("n_types", "n_tokens", "slope", "intercept", "r2")
  }

  /** Heaps'-law fit: vocabulary growth V(n) ≈ K·n^β over the corpus read
    * in document order (Heaps 1978). β far from its natural-text band
    * (~0.4–0.7) is a duplication/diversity signal — a heavily duplicated
    * crawl saturates V(n) early (β collapses), a synthetic-ID-ridden one
    * never saturates (β → 1) — making this the cheap scaling-law
    * companion to the dedup suite.
    *
    * Shape: one point per non-empty document — (ln N(d), ln V(d)) at the
    * doc-prefix grain, where N is cumulative tokens and V cumulative
    * distinct types over docs ordered by id. V is NOT a running
    * count-distinct: each type is attributed to its FIRST claiming doc
    * (min doc id — one bounded groupBy over the vocab), so the cumulative
    * is a plain prefix SUM of per-doc new-type counts. Both prefix sums
    * run through the [[SuffixArray.globalMinRank]] scan pattern — range
    * exchange, per-partition running sums, bounded broadcast offsets —
    * never a single-partition window over the doc spine.
    *
    * Output: ONE row `(n_docs, n_tokens, n_types, beta, k, r2)` with
    * β = slope and K = exp(intercept), both 6-dp quantized.
    */
  def heapsLaw(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df
      .select(col(idCol).cast("long").as("_doc"), explode(toks(col(textCol))).as("token"))
      .filter(col("token") =!= "" && col("_doc").isNotNull)
    val perDoc = tok.groupBy("_doc").agg(count(lit(1)).as("ntok"))
    val newTypes = tok.groupBy("token").agg(min(col("_doc")).as("_doc"))
      .groupBy("_doc").agg(count(lit(1)).as("ntyp"))
    val spine = perDoc.join(newTypes, Seq("_doc"), "left")
      .select(col("_doc"), col("ntok"), coalesce(col("ntyp"), lit(0L)).as("ntyp"))
    val cum = prefixSums(spine, col("_doc"), Seq("ntok", "ntyp"))
    val points = cum.select(
      log(col("_cum_ntok").cast("double")).as("x"),
      log(col("_cum_ntyp").cast("double")).as("y"),
      col("_cum_ntok"), col("_cum_ntyp"))
    olsFitRow(points, Seq(
      count(lit(1)).as("n_docs"),
      max(col("_cum_ntok")).as("n_tokens"),
      max(col("_cum_ntyp")).as("n_types")))
      .select(
        col("n_docs"), col("n_tokens"), col("n_types"),
        col("slope").as("beta"),
        graft.Functions.roundHalfUp(exp(col("intercept")), 6).as("k"),
        col("r2"))
  }

  /** Distributed prefix sums over a totally-ordered spine: range exchange
    * on the order key, per-partition running sums, then a bounded
    * (≤ shuffle-partitions rows) broadcast offset join — the
    * [[SuffixArray.globalMinRank]] two-phase scan, generalized from rank
    * to arbitrary LONG sums. The partitioned frame is materialized ONCE
    * (localCheckpoint) for the same reason globalMinRank's is: the range
    * partitioner's sampled bounds are not deterministic across separate
    * computations, and the offsets aggregate and the final join must see
    * identical _pid assignments. Order keys must be unique (callers pass
    * a doc id).
    */
  private def prefixSums(dfIn: DataFrame, orderKey: Column, sumCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nPart = dfIn.sparkSession.sessionState.conf.numShufflePartitions
    val w = Window.partitionBy(col("_pid")).orderBy(orderKey)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sumCols.foldLeft(
      dfIn.repartitionByRange(nPart, orderKey).withColumn("_pid", spark_partition_id())) {
      (d, c) => d.withColumn(s"_run_$c", sum(col(c)).over(w))
    }.localCheckpoint()
    val wOff = Window.orderBy(col("_pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sumCols.foldLeft(
      local.groupBy(col("_pid")).agg(
        sumCols.map(c => sum(col(c)).as(s"_tot_$c")).head,
        sumCols.map(c => sum(col(c)).as(s"_tot_$c")).tail: _*)) {
      (d, c) => d.withColumn(s"_off_$c", coalesce(sum(col(s"_tot_$c")).over(wOff), lit(0L)))
    }.select(col("_pid") +: sumCols.map(c => col(s"_off_$c")): _*)
    sumCols.foldLeft(local.join(broadcast(offsets), Seq("_pid"))) { (d, c) =>
      d.withColumn(s"_cum_$c", col(s"_run_$c") + col(s"_off_$c"))
        .drop(s"_run_$c", s"_off_$c")
    }.drop("_pid")
  }

  /** KL and Jensen-Shannon divergence between two corpora's unigram token
    * distributions — the mixture-monitoring companion to [[Skew]]/PSI at
    * the vocabulary grain: "how far has this domain/shard/day drifted from
    * the reference corpus", the quantity DSIR-style selection and
    * temperature mixing both steer on (Wenzek et al. 2020 monitor CCNet
    * shards this way; Xie et al. 2023 §3 defines DoReMi's domain weights
    * over exactly these distributions).
    *
    * Both distributions are Laplace-smoothed over the UNION vocabulary
    * (`α` added to every count, totals inflated by α·|V|), so KL is finite
    * on disjoint support. Per-token contributions are nano-nat-quantized
    * LONGs before the sum ([[charEntropy]] discipline) — order-independent
    * and SQL-replayable. One shuffle on token (the outer-join grain), one
    * single-row totals broadcast; output is ONE row
    * `(vocab, n_tokens_a, n_tokens_b, kl_ab, kl_ba, jsd)` in nats, 6-dp.
    */
  def distributionDivergence(
      a: DataFrame,
      b: DataFrame,
      textCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive for finite KL, got $alpha")
    def counts(df: DataFrame, out: String) = df
      .select(explode(toks(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as(out))
    val joined = counts(a, "_ca").join(counts(b, "_cb"), Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("_ca"), lit(0L)).as("_ca"),
        coalesce(col("_cb"), lit(0L)).as("_cb"))
    val totals = joined.agg(
      count(lit(1)).as("vocab"),
      sum(col("_ca")).as("n_tokens_a"),
      sum(col("_cb")).as("n_tokens_b"))
    val withTot = joined.crossJoin(broadcast(totals))
    val pa = (col("_ca").cast("double") + lit(alpha)) /
      (col("n_tokens_a").cast("double") + lit(alpha) * col("vocab").cast("double"))
    val pb = (col("_cb").cast("double") + lit(alpha)) /
      (col("n_tokens_b").cast("double") + lit(alpha) * col("vocab").cast("double"))
    val m = (pa + pb) / lit(2.0)
    def q(c: Column) = floor(c * lit(1e9) + lit(0.5)).cast("long")
    val terms = withTot.agg(
      max(col("vocab")).as("vocab"),
      max(col("n_tokens_a")).as("n_tokens_a"),
      max(col("n_tokens_b")).as("n_tokens_b"),
      sum(q(pa * log(pa / pb))).as("_klab"),
      sum(q(pb * log(pb / pa))).as("_klba"),
      sum(q((pa * log(pa / m) + pb * log(pb / m)) / lit(2.0))).as("_jsd"))
    terms.select(
      col("vocab"), col("n_tokens_a"), col("n_tokens_b"),
      graft.Functions.roundHalfUp(col("_klab").cast("double") / lit(1e9), 6).as("kl_ab"),
      graft.Functions.roundHalfUp(col("_klba").cast("double") / lit(1e9), 6).as("kl_ba"),
      graft.Functions.roundHalfUp(col("_jsd").cast("double") / lit(1e9), 6).as("jsd"))
  }
}
