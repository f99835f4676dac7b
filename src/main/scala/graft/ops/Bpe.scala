package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary learning and tokenization — the missing
  * middle of the tokenization story between [[TextAnalysis.tokenCounts]]'s
  * pre-tokenizer word split and [[Pack]]'s sequence packing (Sennrich et
  * al., "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016).
  *
  * Scale shape — the part that matters at 100 TB:
  *   - The ONLY corpus-scale pass is [[wordFrequencies]]: one map-side-
  *     combinable hash aggregate. Everything iterative runs over the
  *     DISTINCT-WORD table, which is vocabulary-sized (Heaps' law: ~10⁶ rows
  *     for a web corpus), not corpus-sized.
  *   - Each learning round is one tiny argmax over pair counts (a 1-row
  *     collect — the same bounded driver-side step as
  *     [[IvfIndex]]'s centroid pull) plus one narrow map over the word
  *     table, `localCheckpoint`ed to keep lineage flat across rounds (the
  *     [[ConnectedComponents]] lesson).
  *   - [[encode]] is a ZERO-SHUFFLE `mapPartitions`: merge ranks broadcast
  *     (bounded by the merge budget), per-partition word→tokens cache (word
  *     frequency is Zipfian, so the cache hit rate approaches 1), nothing
  *     driver-side, nothing quadratic.
  *
  * Word splitting matches [[Dedup.tokens]] (lower-cased, trimmed,
  * whitespace-split) so BPE composes with the dedup/quality family on
  * identical token boundaries. Symbols are Unicode code points (surrogate
  * pairs stay whole), each word closed by the [[EndOfWord]] marker so
  * token sequences decode unambiguously back to words.
  *
  * Reference analog: none (the reference has no tokenizer) — this is part
  * of the training-data-pipeline surface the engine adds, SURVEY §2's
  * text-analysis extension.
  */
/** One vocabulary row of the learning loop: a distinct word's corpus
  * frequency and its current symbol decomposition. Top-level (not nested in
  * the object) because Catalyst's generated deserializer needs public
  * constructor access.
  */
private[ops] case class BpeWord(freq: Long, syms: Array[String])

object Bpe {

  /** Closes every word's symbol sequence; never merges across words. */
  val EndOfWord = "</w>"

  private[ops] def codePoints(word: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** UTF-8 byte decomposition for byte-level mode: each byte renders as a
    * fixed-width lowercase hex block ("e2", "82", ...), so any text —
    * including code points never seen at training time — decomposes into
    * the same closed 256-symbol alphabet, and merge products (concatenated
    * blocks) parse back to bytes unambiguously. The default end-of-word
    * marker contains non-hex characters, so it can never collide with a
    * byte-symbol product.
    */
  private[ops] def byteSyms(word: String): Array[String] =
    word.getBytes(java.nio.charset.StandardCharsets.UTF_8).map(b => f"${b & 0xff}%02x")

  /** Inverse of [[byteSyms]] over a token sequence: strips `endOfWord`
    * markers, parses the remaining concatenated hex blocks back to bytes,
    * and decodes UTF-8 ONCE over the full byte run — a multi-byte code
    * point may straddle a token boundary (merges know bytes, not
    * characters), so per-token decoding would corrupt it. The default
    * marker contains non-hex characters, making its removal unambiguous.
    */
  def decodeByteTokens(tokens: Seq[String], endOfWord: String = EndOfWord): String = {
    requireByteMarker(endOfWord)
    val hexRun = tokens.mkString.replace(endOfWord, "")
    new String(
      hexRun.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray,
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** One greedy left-to-right merge pass of the adjacent pair (l, r):
    * `a a a` under (a,a) becomes `aa a`, exactly Sennrich's re.sub order.
    */
  private[ops] def mergePair(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Standard BPE encoding of one word: repeatedly merge the LOWEST-RANK
    * (earliest-learned) adjacent pair present until none applies.
    */
  private[ops] def encodeWord(
      word: String,
      ranks: Map[(String, String), Int],
      endOfWord: String = EndOfWord,
      byteLevel: Boolean = false): Array[String] = {
    var syms = (if (byteLevel) byteSyms(word) else codePoints(word)) :+ endOfWord
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        syms = mergePair(syms, syms(bestIdx), syms(bestIdx + 1))
        done = syms.length < 2
      }
    }
    syms
  }

  /** word → occurrence count over the corpus: the single corpus-scale pass
    * (map-side-combinable hash aggregate on the word).
    */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Frequency-weighted adjacent symbol-pair counts over character-initial
    * symbols (+ [[EndOfWord]]) — learning round 1's count table, exposed
    * declaratively (posexplode-free: two slices zipped, all codegen'd) so
    * the pair-counting core is DuckDB-oracle-checkable.
    */
  def initialPairCounts(
      docs: DataFrame,
      textCol: String,
      endOfWord: String = EndOfWord,
      byteLevel: Boolean = false): DataFrame = {
    val syms = wordFrequencies(docs, textCol)
      .select(col("freq"), symsOf(col("word"), endOfWord, byteLevel).as("s"))
      .filter(size(col("s")) >= 2)
    syms
      .select(col("freq"), explode(arrays_zip(
        slice(col("s"), lit(1), size(col("s")) - 1).as("l"),
        slice(col("s"), lit(2), size(col("s")) - 1).as("r"))).as("p"))
      .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      .agg(sum("freq").as("pair_count"))
  }

  /** Learn `numMerges` merges: each round takes the globally most frequent
    * adjacent symbol pair (ties broken lexicographically — deterministic
    * across partitionings and reruns) and rewrites the word table. Stops
    * early when the best pair's count falls below `minPairCount`.
    *
    * @return (rank, left_sym, right_sym, pair_count), rank 0 = first merge
    */
  def learn(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2L,
      endOfWord: String = EndOfWord,
      byteLevel: Boolean = false): DataFrame =
    // batchSize = 1 selects exactly the global argmax each round — the
    // sequential Sennrich algorithm (BpeSpec asserts the equivalence); one
    // loop implementation, two entry points
    learnBatched(docs, textCol, numMerges, batchSize = 1,
      minPairCount = minPairCount, endOfWord = endOfWord, byteLevel = byteLevel)

  /** Declarative symbol decomposition of a word column: code points (split
    * by empty pattern keeps surrogate pairs whole) or UTF-8 hex byte
    * blocks; always closed by the marker. Codegen'd — no UDF.
    */
  private def symsOf(word: org.apache.spark.sql.Column, endOfWord: String, byteLevel: Boolean) =
    concat(
      if (byteLevel)
        regexp_extract_all(
          lower(hex(org.apache.spark.sql.functions.encode(word, "UTF-8"))), lit(".."), lit(0))
      else split(word, ""),
      array(lit(endOfWord)))

  /** Byte-level mode leans on the marker being UNSPELLABLE in the hex-block
    * alphabet: a marker that parses as hex would collide with data bytes in
    * the base vocabulary (silently collapsing the 257-token contract) and
    * [[decodeByteTokens]]'s marker-stripping would eat legitimate bytes.
    * Every byte-level entry point validates once, loudly.
    */
  private def requireByteMarker(endOfWord: String): Unit =
    require(
      endOfWord.nonEmpty &&
        !endOfWord.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"byte-level end-of-word marker '$endOfWord' must be non-empty and contain a " +
        "non-hex character (it would otherwise be indistinguishable from data bytes)")

  /** [[learn]] at vocabulary scale: `batchSize` merges per round instead of
    * one, so a 32 k-merge vocabulary costs ~32k/B rounds, not 32 k
    * driver round-trips. Each round takes the pair-count table ONCE and
    * greedily selects the top pairs whose symbols are pairwise DISJOINT —
    * disjoint merges cannot interfere within a word (neither consumes a
    * symbol the other needs), so all of a round's merges apply in one map
    * pass and each selected pair's count is exactly what sequential
    * learning would have seen when its turn came *if no earlier same-round
    * merge touched its neighborhood*. With `batchSize = 1` the selection IS
    * sequential BPE (spec-asserted equal to [[learn]]); larger batches are
    * the standard fast-trainer approximation: merge ORDER can diverge from
    * strict greedy, but every emitted pair was a real adjacent pair with
    * the emitted corpus count, and encode/decode semantics are unchanged.
    *
    * `maxBatchSize > batchSize` opts into ADAPTIVE growth: the batch
    * doubles after every round that fills its quota from the 4× candidate
    * headroom (conflicts were sparse) and halves back toward `batchSize`
    * after a round that could not (dense conflicts or a thinning pair
    * tail). A 32 k-merge vocabulary then costs ~log₂(32k/B) + 32k/maxB
    * driver rounds instead of 32k/B — the sequential critical path the
    * round-5 review called out — while every round still applies only
    * symbol-disjoint merges, so the per-round validity argument above is
    * unchanged. The default (`maxBatchSize = 0`) keeps the batch fixed.
    */
  def learnBatched(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      batchSize: Int = 64,
      minPairCount: Long = 2L,
      endOfWord: String = EndOfWord,
      byteLevel: Boolean = false,
      maxBatchSize: Int = 0): DataFrame = {
    require(batchSize >= 1, "batchSize must be at least 1")
    val maxB = if (maxBatchSize <= 0) batchSize else maxBatchSize
    require(maxB >= batchSize, "maxBatchSize must be 0 (fixed) or >= batchSize")
    if (byteLevel) requireByteMarker(endOfWord)
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab: Dataset[BpeWord] = wordFrequencies(docs, textCol)
      .select(col("freq"), symsOf(col("word"), endOfWord, byteLevel).as("syms"))
      .as[BpeWord]
      .localCheckpoint(false)
    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    var b = batchSize
    while (merges.size < numMerges && !exhausted) {
      val want = math.min(b, numMerges - merges.size)
      // 4× headroom: conflicts strike adjacent ranks (e.g. (e,s) blocks
      // (s,t)), so the non-conflicting prefix of the top-4B list almost
      // always holds B picks; a shortfall only costs an extra round
      val top = vocab
        .flatMap(w =>
          if (w.syms.length < 2) Iterator.empty
          else w.syms.iterator.zip(w.syms.iterator.drop(1)).map { case (l, r) => (l, r, w.freq) })
        .toDF("l", "r", "f")
        .groupBy("l", "r").agg(sum("f").as("cnt"))
        .filter(col("cnt") >= minPairCount)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(want * 4).collect()
      val used = mutable.Set.empty[String]
      val picked = mutable.ArrayBuffer.empty[(String, String, Long)]
      top.iterator
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .foreach { case (l, r, c) =>
          if (picked.size < want && !used(l) && !used(r)) {
            picked += ((l, r, c)); used += l; used += r
          }
        }
      if (picked.isEmpty) exhausted = true
      else {
        picked.foreach { case (l, r, c) => merges += ((merges.size, l, r, c)) }
        val batch = picked.toArray
        vocab = vocab.map { w =>
          var s = w.syms
          var i = 0
          while (i < batch.length) { s = mergePair(s, batch(i)._1, batch(i)._2); i += 1 }
          BpeWord(w.freq, s)
        }.localCheckpoint(false)
        // adaptive pacing: a filled quota means the headroom absorbed all
        // conflicts → double; a shortfall means conflicts (or a thin tail)
        // bit → back off toward the configured floor
        b = if (picked.size == want) math.min(b * 2, maxB)
            else math.max(batchSize, b / 2)
      }
    }
    merges.toSeq.toDF("rank", "left_sym", "right_sym", "pair_count")
  }

  /** The 256 byte-fallback base tokens (SentencePiece `byte_fallback`
    * spelling): char-level vocabularies built with `byteFallback = true`
    * include them, and [[encodeIds]] expands any out-of-vocabulary symbol
    * into its UTF-8 bytes under these ids — char-level mode then never
    * emits UNK, the GPT-2 property byte-level mode has by construction.
    * The angle-bracket spelling keeps them out of the data alphabet: a
    * corpus that can spell `<0xNN>` itself trips [[vocabulary]]'s loud
    * collision check rather than silently aliasing.
    */
  val ByteFallbackTokens: IndexedSeq[String] = (0 until 256).map(b => f"<0x$b%02X>")

  /** The dense token-id table a trained model consumes: every symbol
    * [[encode]] can emit gets one id. Base symbols are the corpus's distinct
    * code points plus [[EndOfWord]] (ids 0.., lexicographic — deterministic
    * across partitionings); merge products follow in rank order (the
    * conventional BPE id layout: merge rank r ↦ id = |base| + r). Encoding
    * with a vocabulary built from the SAME corpus+merges can therefore
    * never emit an out-of-vocabulary token; unseen text at apply time can
    * (new code points), which callers map to an UNK id of their choosing —
    * or, with `byteFallback = true` (char-level only; byte-level is already
    * closed), to [[ByteFallbackTokens]] byte ids, which [[encodeIds]]
    * recognizes in any vocabulary that carries the complete fallback
    * alphabet, persisted tokenizers included.
    */
  def vocabulary(
      docs: DataFrame,
      textCol: String,
      merges: DataFrame,
      endOfWord: String = EndOfWord,
      byteLevel: Boolean = false,
      byteFallback: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    if (byteLevel) requireByteMarker(endOfWord)
    require(!(byteLevel && byteFallback),
      "byteFallback applies to char-level mode only — byte-level vocabularies " +
        "are already closed (every input decomposes into the 256 byte symbols)")
    // byte-level base is CLOSED (all 256 byte symbols + marker, no corpus
    // scan): every future input decomposes into it, so encodeIds can never
    // emit UNK — the GPT-2 property
    val baseTokens =
      if (byteLevel)
        ((0 until 256).map(b => f"$b%02x") :+ endOfWord).toDF("token")
      else {
        val corpusBase = wordFrequencies(docs, textCol)
          .select(explode(split(col("word"), "")).as("token"))
          .union(spark.range(1).select(lit(endOfWord).as("token")))
        if (byteFallback)
          corpusBase.union(ByteFallbackTokens.toDF("token"))
        else corpusBase
      }
    val base = baseTokens
      .distinct()
      .select(col("token"),
        (row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("token"))) - 1)
          .cast("long").as("token_id"))
      // the window above is single-partition but vocabulary-sized (distinct
      // code points, typically 10²-10⁵ rows) — never corpus-sized. EAGER
      // checkpoint: `base` is consumed twice (the count below and the
      // returned union), and without the barrier each consumer re-runs the
      // corpus-scale wordFrequencies aggregate
      .localCheckpoint()
    val nBase = base.count()
    val out = base.unionByName(
      merges.select(
        concat(col("left_sym"), col("right_sym")).as("token"),
        (col("rank").cast("long") + nBase).as("token_id")))
    // Token strings are only unambiguous if nothing COLLIDES: a corpus whose
    // text contains the marker's own characters can learn a merge product
    // equal to EndOfWord (e.g. "</w>" from '<','/','w','>'), and two merges
    // can concatenate to the same string ((x,yz) vs (xy,z) → "xyz"). A
    // silent duplicate would break the dense-id contract and make
    // encodeIds' inversion lossy — fail loudly instead; the fix is a
    // marker the corpus cannot form, or fewer merges.
    val dup = out.groupBy("token").count().filter(col("count") > 1).limit(1).collect()
    if (dup.nonEmpty)
      throw new IllegalArgumentException(
        s"vocabulary token collision on '${dup(0).getString(0)}' — the corpus can form " +
          "the end-of-word marker or two merges share a product; choose a marker the " +
          "corpus cannot spell or reduce the merge budget")
    out
  }

  /** [[encode]] to dense ids: (id, token_ids, n_tokens). Tokens outside
    * `vocab` (impossible when vocab and merges come from the same corpus;
    * possible for novel code points in new text) map to `unkId` — UNLESS
    * the vocabulary carries the complete [[ByteFallbackTokens]] alphabet
    * (built with `vocabulary(byteFallback = true)`), in which case each
    * unknown symbol expands GPT-2-style into its UTF-8 byte ids and
    * char-level encoding never emits UNK. Detection is on the collected id
    * map, so tokenizers persisted by [[saveTokenizer]] keep the property
    * with no artifact-format change. `n_tokens` counts the EMITTED ids
    * (fallback expansion can lengthen a word).
    */
  def encodeIds(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: DataFrame,
      vocab: DataFrame,
      unkId: Long = -1L,
      endOfWord: String = EndOfWord,
      byteLevel: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ids: Map[String, Long] = vocab.select("token", "token_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // byte-fallback ids indexed by byte value, present only when the vocab
    // holds ALL 256 — a partial alphabet would make coverage input-dependent
    val fallback: Option[Array[Long]] = {
      val arr = ByteFallbackTokens.map(ids.get)
      if (arr.forall(_.isDefined)) Some(arr.map(_.get).toArray) else None
    }
    val bIds = spark.sparkContext.broadcast(ids)
    val bFb = spark.sparkContext.broadcast(fallback)
    encode(docs, idCol, textCol, merges, endOfWord, byteLevel)
      .select(col(idCol).cast("long"), col("tokens"), col("n_tokens"))
      .as[(Long, Seq[String], Long)]
      .map { case (id, toks, _) =>
        val m = bIds.value
        val fb = bFb.value
        val out = toks.flatMap { t =>
          m.get(t) match {
            case Some(i) => Seq(i)
            case None =>
              fb match {
                case Some(byteIds) =>
                  t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
                    .toSeq.map(b => byteIds(b & 0xff))
                case None => Seq(unkId)
              }
          }
        }
        (id, out, out.length.toLong)
      }
      .toDF(idCol, "token_ids", "n_tokens")
  }

  /** Inverse of char-level token sequences back to text, byte-fallback
    * aware: maximal runs of [[ByteFallbackTokens]] decode as ONE UTF-8 byte
    * string (a multi-byte code point expands to several fallback tokens),
    * ordinary symbols concatenate as-is, and `endOfWord` markers become
    * word boundaries (single spaces). The byte-level twin is
    * [[decodeByteTokens]].
    */
  def decodeCharTokens(tokens: Seq[String], endOfWord: String = EndOfWord): String = {
    val Fb = "^<0x([0-9A-F]{2})>$".r
    val sb = new java.lang.StringBuilder
    val run = new java.io.ByteArrayOutputStream
    def flush(): Unit = if (run.size() > 0) {
      sb.append(new String(run.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      run.reset()
    }
    tokens.foreach {
      case Fb(h) => run.write(Integer.parseInt(h, 16))
      case t => flush(); sb.append(t)
    }
    flush()
    sb.toString.split(java.util.regex.Pattern.quote(endOfWord), -1)
      .mkString(" ").trim
  }

  /** Tokenize every document with a learned merge table: (id, tokens,
    * n_tokens). Null text encodes as zero tokens; rows whose id is null (or
    * fails the long cast) are dropped — the sampling module's null-key rule,
    * and kinder than failing the whole job at encoder deserialization.
    * The merge table is collected and broadcast — bounded by the merge
    * budget, the same build-once/apply-many pattern as the persisted ANN
    * indexes.
    */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: DataFrame,
      endOfWord: String = EndOfWord,
      byteLevel: Boolean = false): DataFrame = {
    if (byteLevel) requireByteMarker(endOfWord)
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] = merges
      .select(col("rank").cast("int"), col("left_sym"), col("right_sym"))
      .collect()
      .map(r => ((r.getString(1), r.getString(2)), r.getInt(0)))
      .toMap
    val bRanks = spark.sparkContext.broadcast(ranks)
    docs
      .select(col(idCol).cast("long").as("id"),
        Dedup.tokens(coalesce(col(textCol), lit(""))).as("words"))
      .filter(col("id").isNotNull)
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val rk = bRanks.value
        // Zipfian word frequencies ⇒ near-1 hit rate; capped so a
        // pathological all-unique partition can't hold every encoding
        val cache = new java.util.LinkedHashMap[String, Array[String]](1 << 12, 0.75f, true) {
          override def removeEldestEntry(e: java.util.Map.Entry[String, Array[String]]) =
            size() > (1 << 18)
        }
        it.map { case (id, words) =>
          val toks = words.iterator.filter(_.nonEmpty).flatMap { w =>
            var t = cache.get(w)
            if (t == null) { t = encodeWord(w, rk, endOfWord, byteLevel); cache.put(w, t) }
            t
          }.toArray
          (id, toks, toks.length.toLong)
        }
      }
      .toDF(idCol, "tokens", "n_tokens")
  }

  /** Corpus-scale inverse of [[encode]]: `(idCol, decoded)` with the
    * token sequence reassembled into text via [[decodeCharTokens]] /
    * [[decodeByteTokens]]. BPE is lossless ABOVE its normalization, so
    * `decode(encode(text))` equals the normalized text exactly — the
    * space-joined non-empty pieces of `split(trim(lower(text)), "\\s+")`
    * — which is what makes the round trip a REAL oracle (q_bpe_roundtrip:
    * the SQL side recomputes the normalization from the raw corpus and
    * never needs the tokenizer). Embarrassingly parallel per-row work,
    * zero shuffle.
    */
  def decode(
      encoded: DataFrame,
      idCol: String,
      endOfWord: String = EndOfWord,
      byteLevel: Boolean = false): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    encoded
      .select(col(idCol).cast("long"), col("tokens"))
      .as[(Long, Seq[String])]
      .map { case (id, toks) =>
        val text =
          if (byteLevel) decodeByteTokens(toks, endOfWord)
          else decodeCharTokens(toks, endOfWord)
        (id, text)
      }
      .toDF(idCol, "decoded")
  }

  /** [[encode]] that additionally reports, for every emitted token, the
    * code-point range of its source WORD in the document text — the
    * coordinate bridge between character-level annotations (PII spans,
    * [[Sft.lossMaskSpans]] loss masks, dedup span removal) and token
    * space. Output is one row per token:
    * `(idCol, token_pos, token, word_start, word_end, offsets_exact)` —
    * `token_pos` 0-based over the document, offsets 0-based end-exclusive
    * code points.
    *
    * Tokens of a multi-token word all carry the WORD's range (sub-word
    * boundaries inside a merged symbol are not meaningful post-merge, and
    * word grain is what span intersection needs). Parity contract with
    * [[encode]]: the token sequence is IDENTICAL (spec-asserted) — words
    * here are the maximal non-whitespace runs of the lowered text, which
    * is exactly `split(trim(lower(text)), "\\s+")`'s non-empty pieces.
    * Offsets assume case-folding preserves length (true outside a handful
    * of Unicode special cases like İ, whose lowercase is i + combining
    * dot — TWO code points). That assumption is now GUARDED, not just
    * documented: each row carries `offsets_exact` — whether the document's
    * code-point length survived lowering unchanged. When it is false the
    * token TEXT is still correct (both sides lowercase with the same JVM
    * rules) but offsets index the LOWERED text and may drift from the
    * original; downstream span-intersection consumers
    * ([[Sft.lossMaskTokens]]) should gate on the flag and re-derive spans
    * over the lowered text (or drop the document) instead of silently
    * shifting masks.
    *
    * Same scale shape as [[encode]]: broadcast ranks, per-partition word
    * cache, zero shuffles; one output row per token (the honest linear
    * cost of token-grain downstream work).
    */
  def encodeWithOffsets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: DataFrame,
      endOfWord: String = EndOfWord,
      byteLevel: Boolean = false): DataFrame = {
    if (byteLevel) requireByteMarker(endOfWord)
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] = merges
      .select(col("rank").cast("int"), col("left_sym"), col("right_sym"))
      .collect()
      .map(r => ((r.getString(1), r.getString(2)), r.getInt(0)))
      .toMap
    val bRanks = spark.sparkContext.broadcast(ranks)
    docs
      .select(col(idCol).cast("long").as("id"),
        lower(coalesce(col(textCol), lit(""))).as("text"),
        // code-point length preserved under case folding ⇒ offsets into
        // the lowered text equal offsets into the original
        (length(lower(coalesce(col(textCol), lit("")))) ===
          length(coalesce(col(textCol), lit("")))).as("exact"))
      .filter(col("id").isNotNull)
      .as[(Long, String, Boolean)]
      .mapPartitions { it =>
        val rk = bRanks.value
        // the encode() per-partition LRU — same Zipfian-hit-rate rationale
        val cache = new java.util.LinkedHashMap[String, Array[String]](1 << 12, 0.75f, true) {
          override def removeEldestEntry(e: java.util.Map.Entry[String, Array[String]]) =
            size() > (1 << 18)
        }
        // EXACTLY the regex \s class the tokenizer splits on — NOT
        // Character.isWhitespace, which additionally matches U+001C-1F and
        // U+2028/2029 and would shift word boundaries vs encode()
        def isWs(c: Int): Boolean =
          c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'
        it.flatMap { case (id, text, exact) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Long, Long, Boolean)]
          var tokenPos = 0L
          var i = 0 // UTF-16 index
          var cp = 0L // code-point index
          val n = text.length
          while (i < n) {
            var c = text.codePointAt(i)
            if (isWs(c)) { i += Character.charCount(c); cp += 1 }
            else {
              val start = cp
              val wordStart = i
              while (i < n && { c = text.codePointAt(i); !isWs(c) }) {
                i += Character.charCount(c); cp += 1
              }
              val word = text.substring(wordStart, i)
              var toks = cache.get(word)
              if (toks == null) {
                toks = encodeWord(word, rk, endOfWord, byteLevel); cache.put(word, toks)
              }
              var t = 0
              while (t < toks.length) {
                out += ((id, tokenPos, toks(t), start, cp, exact))
                tokenPos += 1; t += 1
              }
            }
          }
          out
        }
      }
      .toDF(idCol, "token_pos", "token", "word_start", "word_end", "offsets_exact")
  }

  /** A complete trained tokenizer: the merge table, its dense id
    * vocabulary, and the geometry both were built with.
    */
  case class BpeTokenizer(
      merges: DataFrame,
      vocab: DataFrame,
      endOfWord: String,
      byteLevel: Boolean)

  private val MetaFile = "_bpe_meta.json"
  private val MarkerFile = "_bpe_marker.txt"

  /** Persist a trained tokenizer — the build-once/apply-many artifact
    * pattern of the persisted ANN indexes ([[SimilaritySearch.saveLshIndex]],
    * [[IvfIndex]]): merges and vocabulary as parquet, geometry as sidecar
    * metadata, so any later job (or cluster) re-encodes IDENTICALLY without
    * re-learning.
    */
  def saveTokenizer(t: BpeTokenizer, path: String): Unit = {
    val spark = t.merges.sparkSession
    t.merges.write.mode("overwrite").parquet(s"$path/merges")
    t.vocab.write.mode("overwrite").parquet(s"$path/vocab")
    MetaJson.write(spark, path, MetaFile,
      Seq("byte_level" -> (if (t.byteLevel) 1L else 0L)))
    val p = new org.apache.hadoop.fs.Path(path, MarkerFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(t.endOfWord.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load a tokenizer written by [[saveTokenizer]]; refuses a bare
    * directory rather than guessing geometry.
    */
  def loadTokenizer(spark: org.apache.spark.sql.SparkSession, path: String): BpeTokenizer = {
    val f = MetaJson.readFields(spark, path, MetaFile,
      Seq("byte_level"), "a tokenizer written by saveTokenizer")
    val p = new org.apache.hadoop.fs.Path(path, MarkerFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$path has no $MarkerFile — not a tokenizer written by saveTokenizer")
    val in = fs.open(p)
    val endOfWord =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](4096)
        var n = in.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    BpeTokenizer(
      spark.read.parquet(s"$path/merges"),
      spark.read.parquet(s"$path/vocab"),
      endOfWord,
      f("byte_level") == 1)
  }

  /** [[encodeIds]] under a (possibly loaded) tokenizer artifact. */
  def encodeWith(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      t: BpeTokenizer,
      unkId: Long = -1L): DataFrame =
    encodeIds(docs, idCol, textCol, t.merges, t.vocab, unkId, t.endOfWord, t.byteLevel)
}
