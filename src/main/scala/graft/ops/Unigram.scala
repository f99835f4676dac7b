package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Unigram language-model tokenizer — the SentencePiece algorithm (Kudo,
  * "Subword Regularization", ACL 2018): a piece vocabulary learned by EM
  * over the segmentation lattice, pruned to a target size by likelihood
  * loss, applied with Viterbi decoding. Together with [[Bpe]] this closes
  * the two dominant subword-tokenizer families.
  *
  * Scale shape — identical discipline to [[Bpe]]:
  *   - The ONLY corpus-scale pass is [[Bpe.wordFrequencies]] (one map-side-
  *     combinable hash aggregate). Everything else — seed substring
  *     counting, every EM round, pruning — runs over the DISTINCT-WORD
  *     table (vocabulary-sized by Heaps' law), with the candidate piece
  *     vocabulary BROADCAST (bounded by `seedSize`).
  *   - The E-step emits per-(word, piece) expected counts as
  *     DECIMAL(38,18): decimal addition is exact and commutative, so the
  *     aggregated counts — and therefore the learned probabilities, the
  *     prune decisions, and the final vocabulary — are bit-identical under
  *     any partitioning (the [[IvfIndex]] decimal-means lesson). The
  *     per-edge contributions themselves are plain JVM doubles, computed
  *     identically on every executor.
  *   - [[encode]] is a ZERO-SHUFFLE `mapPartitions`: vocabulary broadcast,
  *     per-partition word→pieces cache (Zipfian hit rate), no driver state.
  *
  * The learned artifact is golden-oracled against an INDEPENDENT Python
  * implementation of the same contract (tools/gen_unigram_golden.py — the
  * [[Bpe]] golden pattern): q_ug_vocab and q_ug_encode_gold are hash-exact,
  * q_ug_seed is plain-SQL-oracled.
  *
  * Word splitting matches [[Dedup.tokens]] (lower-cased, trimmed,
  * whitespace-split), so the tokenizer composes with the dedup/quality
  * family on identical boundaries. Each word is prefixed with the
  * SentencePiece word-boundary marker [[Boundary]] ("▁"), so every piece
  * carries word-position information and token sequences decode
  * unambiguously (`concat → replace ▁ with space → trim`).
  *
  * Reference analog: none (the reference has no tokenizer) — part of the
  * training-data-pipeline surface, SURVEY §2's text-analysis extension.
  */
object Unigram {

  /** SentencePiece word-boundary marker, prefixed to every word before
    * segmentation. Lower one-eighth block U+2581 — loudly rejected if the
    * corpus can spell it itself (see [[learn]]).
    */
  val Boundary = "▁"

  private val NegInf = Double.NegativeInfinity

  /** log(exp(a) + exp(b)) without overflow; -inf is the additive zero. */
  private[ops] def logAdd(a: Double, b: Double): Double =
    if (a == NegInf) b
    else if (b == NegInf) a
    else if (a >= b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  /** Code-point-grain substrings of `s` with length 1..maxLen, as
    * (piece, occurrences). Code points, not UTF-16 chars, to agree with
    * SQL `substring` semantics (surrogate pairs stay whole).
    */
  private[ops] def substrings(s: String, maxLen: Int): Map[String, Int] = {
    val cps = Bpe.codePoints(s)
    val out = mutable.Map.empty[String, Int]
    var i = 0
    while (i < cps.length) {
      val sb = new java.lang.StringBuilder
      var l = 0
      while (l < maxLen && i + l < cps.length) {
        sb.append(cps(i + l))
        val p = sb.toString
        out.update(p, out.getOrElse(p, 0) + 1)
        l += 1
      }
      i += 1
    }
    out.toMap
  }

  /** Frequency-weighted substring occurrence counts over the
    * boundary-marked distinct words: (piece, weight) where weight =
    * Σ_words freq(word) × occurrences(piece, ▁word) — the seed-candidate
    * statistic. One typed flatMap over the DISTINCT-WORD table (never
    * corpus-scale); exact long arithmetic, so the q_ug_seed DuckDB oracle
    * reproduces it in plain SQL.
    */
  def seedCounts(docs: DataFrame, textCol: String, maxPieceLen: Int = 8): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val spark = docs.sparkSession
    import spark.implicits._
    Bpe.wordFrequencies(docs, textCol)
      .select(col("word"), col("freq"))
      .as[(String, Long)]
      .flatMap { case (w, f) =>
        substrings(Boundary + w, maxPieceLen).map { case (p, n) => (p, n.toLong * f) }
      }
      .toDF("piece", "w")
      .groupBy("piece").agg(sum(col("w")).as("weight"))
  }

  /** Seed piece selection: all single code points (segmentation coverage —
    * every corpus word must remain segmentable after any prune), plus the
    * top multi-character substrings by SentencePiece's freq × length score,
    * up to `seedSize` multi-character pieces. Deterministic tiebreak
    * (score desc, piece asc) over exact integer scores; top-k via
    * orderBy+limit (TakeOrderedAndProject — no global sort materializes).
    * Returns (piece, weight, is_char).
    */
  def seedVocab(
      docs: DataFrame,
      textCol: String,
      seedSize: Int = 2000,
      maxPieceLen: Int = 8): DataFrame = {
    require(seedSize >= 1, s"seedSize must be >= 1, got $seedSize")
    val counts = seedCounts(docs, textCol, maxPieceLen)
      .withColumn("is_char", length(col("piece")) === 1)
    val chars = counts.filter(col("is_char"))
    val multi = counts.filter(!col("is_char"))
      .orderBy((col("weight") * length(col("piece"))).desc, col("piece").asc)
      .limit(seedSize)
    chars.unionByName(multi)
  }

  /** Forward–backward over one marked word's segmentation lattice: returns
    * (expected piece counts for this word, log-likelihood of the word).
    * O(len × maxPieceLen) per word. `cps` is the word's code points.
    */
  private[ops] def forwardBackward(
      cps: Array[String],
      logp: collection.Map[String, Double],
      maxPieceLen: Int): (mutable.Map[String, Double], Double) = {
    val n = cps.length
    val pieceAt = Array.ofDim[String](n, maxPieceLen) // piece starting at i, length l+1
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder
      var l = 0
      while (l < maxPieceLen && i + l < n) {
        sb.append(cps(i + l))
        pieceAt(i)(l) = sb.toString
        l += 1
      }
      i += 1
    }
    val alpha = Array.fill(n + 1)(NegInf)
    alpha(0) = 0.0
    i = 1
    while (i <= n) {
      var l = 1
      while (l <= maxPieceLen && l <= i) {
        val p = pieceAt(i - l)(l - 1)
        val lp = logp.getOrElse(p, NegInf)
        if (lp != NegInf && alpha(i - l) != NegInf)
          alpha(i) = logAdd(alpha(i), alpha(i - l) + lp)
        l += 1
      }
      i += 1
    }
    val ll = alpha(n)
    val counts = mutable.Map.empty[String, Double]
    if (ll != NegInf) {
      val beta = Array.fill(n + 1)(NegInf)
      beta(n) = 0.0
      i = n - 1
      while (i >= 0) {
        var l = 1
        while (l <= maxPieceLen && i + l <= n) {
          val p = pieceAt(i)(l - 1)
          val lp = logp.getOrElse(p, NegInf)
          if (lp != NegInf && beta(i + l) != NegInf)
            beta(i) = logAdd(beta(i), lp + beta(i + l))
          l += 1
        }
        i -= 1
      }
      i = 0
      while (i < n) {
        var l = 1
        while (l <= maxPieceLen && i + l <= n) {
          val p = pieceAt(i)(l - 1)
          val lp = logp.getOrElse(p, NegInf)
          if (lp != NegInf && alpha(i) != NegInf && beta(i + l) != NegInf) {
            val c = math.exp(alpha(i) + lp + beta(i + l) - ll)
            if (c > 0.0) counts.update(p, counts.getOrElse(p, 0.0) + c)
          }
          l += 1
        }
        i += 1
      }
    }
    (counts, ll)
  }

  /** Viterbi best segmentation of one marked word. Ties break
    * deterministically: at equal path score, the LONGER incoming piece
    * wins (fewer, larger pieces — SentencePiece's preference), then
    * lexicographic. Positions no vocabulary piece covers (novel code
    * points at apply time) take a single-char UNK edge at `unkLogp`,
    * emitting the raw character — [[encodeIds]] maps it to the UNK id.
    * If the end position is UNREACHABLE (possible when `unkLogp` is -inf,
    * as in [[pruneLosses]]' alternative-segmentation probe), returns an
    * EMPTY array rather than looping on a zero back-pointer.
    */
  private[graft] def viterbiSegment(
      cps: Array[String],
      logp: collection.Map[String, Double],
      maxPieceLen: Int,
      unkLogp: Double): Array[String] = {
    val n = cps.length
    val best = Array.fill(n + 1)(NegInf)
    val bkLen = Array.fill(n + 1)(0)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      val sb = new java.lang.StringBuilder
      // build pieces ending at i from the longest start backward so the
      // StringBuilder grows forward: piece = cps[j..i)
      var l = 1
      while (l <= maxPieceLen && l <= i) {
        // piece of length l ending at i
        if (l == 1) { sb.setLength(0); sb.append(cps(i - 1)) }
        else sb.insert(0, cps(i - l))
        val p = sb.toString
        val lp = logp.get(p) match {
          case Some(v) => v
          case None => if (l == 1) unkLogp else NegInf
        }
        if (lp != NegInf && best(i - l) != NegInf) {
          val s = best(i - l) + lp
          if (s > best(i) || (s == best(i) && l > bkLen(i))) {
            best(i) = s; bkLen(i) = l
          }
        }
        l += 1
      }
      i += 1
    }
    if (best(n) == NegInf) return Array.empty
    val out = mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val l = bkLen(pos)
      if (l == 0) return Array.empty // defensive: corrupt backtrack
      out += cps.slice(pos - l, pos).mkString
      pos -= l
    }
    out.reverseIterator.toArray
  }

  /** One E-step: expected piece counts over the distinct-word table, summed
    * as DECIMAL(38,18) (exact, commutative — partitioning-independent),
    * plus the corpus log-likelihood under the current vocabulary. `words`
    * is (word, freq); the vocabulary map is broadcast.
    */
  def expectedCounts(
      words: DataFrame,
      logp: Map[String, Double],
      maxPieceLen: Int = 8): (DataFrame, Double) = {
    val spark = words.sparkSession
    import spark.implicits._
    val bV = spark.sparkContext.broadcast(logp)
    val contrib = words.select(col("word"), col("freq").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val v = bV.value
        it.flatMap { case (w, f) =>
          val (c, ll) = forwardBackward(Bpe.codePoints(Boundary + w), v, maxPieceLen)
          val rows = c.iterator.map { case (p, e) => (p, e * f, 0.0) }
          // one sentinel row per word carries freq-weighted log-likelihood
          rows ++ Iterator(("", 0.0, if (ll == NegInf) 0.0 else ll * f))
        }
      }
      .toDF("piece", "e", "ll")
      .select(col("piece"),
        col("e").cast(DecimalType(38, 18)).as("e"),
        col("ll").cast(DecimalType(38, 18)).as("ll"))
      .groupBy("piece")
      .agg(sum(col("e")).as("e_count"), sum(col("ll")).as("ll"))
      .localCheckpoint() // one job; consumed twice below
    val llTotal = contrib.filter(col("piece") === "")
      .select(sum(col("ll"))).collect()(0) match {
        case r if r.isNullAt(0) => 0.0
        case r => r.getDecimal(0).doubleValue()
      }
    (contrib.filter(col("piece") =!= "").select(col("piece"), col("e_count")), llTotal)
  }

  /** One full EM round on the driver-held vocabulary: E over the word
    * table, M on the (vocabulary-sized) collected counts. Pieces whose
    * expected count underflows to zero keep a floor probability so
    * coverage never collapses mid-iteration. Returns (new logp map,
    * corpus log-likelihood under the OLD parameters, the E-step's
    * expected counts — the prune-decision weights, so [[learn]] never
    * pays a second E-step for them).
    */
  private def emRound(
      words: DataFrame,
      logp: Map[String, Double],
      maxPieceLen: Int): (Map[String, Double], Double, Map[String, Double]) = {
    val (cdf, ll) = expectedCounts(words, logp, maxPieceLen)
    val counts: Seq[(String, java.math.BigDecimal)] =
      cdf.collect().map(r => r.getString(0) -> r.getDecimal(1)).toSeq.sortBy(_._1)
    val countsMap: Map[String, Double] =
      counts.map { case (p, v) => p -> v.doubleValue() }.toMap
    val total = counts.map(_._2.doubleValue()).sum
    val floor = 1e-10 // pieces unreachable this round keep epsilon mass
    val updated = logp.keys.toSeq.sorted.map { p =>
      p -> math.log(math.max(countsMap.getOrElse(p, 0.0), floor) / total)
    }.toMap
    (updated, ll, countsMap)
  }

  /** A read-only view of `m` with one key hidden — O(1) to build, so
    * [[pruneLosses]]' leave-one-out probes cost O(V) total instead of the
    * O(V²) map copies `m - key` per piece would.
    */
  private final class Masked(m: Map[String, Double], hide: String)
      extends scala.collection.AbstractMap[String, Double] {
    def get(k: String): Option[Double] = if (k == hide) None else m.get(k)
    def iterator: Iterator[(String, Double)] = m.iterator.filter(_._1 != hide)
    // the two `-` overloads below are abstract members of 2.13's
    // collection.MapOps (the compiler demands them); nothing here calls
    // them — pruneLosses only reads get/getOrElse
    def -(key: String): scala.collection.Map[String, Double] =
      iterator.filter(_._1 != key).toMap
    def -(key1: String, key2: String, keys: String*): scala.collection.Map[String, Double] = {
      val drop = (Seq(key1, key2) ++ keys).toSet
      iterator.filterNot(kv => drop(kv._1)).toMap
    }
  }

  /** Likelihood loss of dropping each multi-char piece: expected_count ×
    * (logp(piece) − best alternative segmentation of the piece's own
    * surface without itself). Driver-side but vocabulary-sized (each
    * alternative is a ≤maxPieceLen Viterbi over the masked map).
    */
  private def pruneLosses(
      logp: Map[String, Double],
      counts: Map[String, Double],
      maxPieceLen: Int): Seq[(String, Double)] =
    logp.toSeq.collect { case (p, lp) if Bpe.codePoints(p).length > 1 =>
      val without = new Masked(logp, p)
      val alt = {
        val cps = Bpe.codePoints(p)
        val seg = viterbiSegment(cps, without, maxPieceLen, NegInf)
        if (seg.isEmpty) NegInf else seg.map(s => without.getOrElse(s, NegInf)).sum
      }
      val c = counts.getOrElse(p, 0.0)
      val loss = if (alt == NegInf) Double.MaxValue else c * (lp - alt)
      p -> loss
    }

  /** Learn a `vocabSize`-piece unigram vocabulary: seed → (EM × emIters →
    * prune keep-top `shrink`) until the target, final EM, exact trim.
    * Returns (piece, logp, piece_id) with dense ids in lexicographic piece
    * order (deterministic across partitionings — all aggregation is
    * decimal-exact, all driver reductions sorted). Golden-oracled against
    * tools/gen_unigram_golden.py (q_ug_vocab).
    */
  def learn(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int,
      seedSize: Int = 2000,
      maxPieceLen: Int = 8,
      emIters: Int = 2,
      shrink: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(shrink > 0 && shrink < 1, s"shrink must be in (0,1), got $shrink")
    require(seedSize >= vocabSize,
      s"seedSize ($seedSize) must be >= vocabSize ($vocabSize)")
    // the single corpus-scale pass; the word table feeds every round below
    val words = Bpe.wordFrequencies(docs, textCol).localCheckpoint()
    val markered = words.filter(col("word").contains(Boundary)).limit(1).collect()
    if (markered.nonEmpty)
      throw new IllegalArgumentException(
        s"corpus contains the word-boundary marker '$Boundary' " +
          s"(word '${markered(0).getString(0)}') — segmentation would be ambiguous")
    val seed = seedVocab(docs, textCol, seedSize, maxPieceLen)
      .select(col("piece"), col("weight").cast("double"), col("is_char"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
      .sortBy(_._1)
    val charPieces = seed.collect { case (p, _, true) => p }.toSet
    require(charPieces.nonEmpty, "empty corpus — no characters to seed")
    val wTotal = seed.map(_._2).sum
    var logp: Map[String, Double] = seed.map { case (p, w, _) =>
      p -> math.log(w / wTotal)
    }.toMap
    // EM + prune until the multi-char budget fits
    val charBudget = charPieces.size
    require(vocabSize > charBudget,
      s"vocabSize ($vocabSize) must exceed the single-character alphabet " +
        s"($charBudget) or no multi-char piece survives")
    var done = false
    while (!done) {
      var lastCounts = Map.empty[String, Double]
      for (_ <- 1 to emIters) {
        val (next, _, counts) = emRound(words, logp, maxPieceLen)
        logp = next
        lastCounts = counts
      }
      val multi = logp.size - charBudget
      if (multi <= vocabSize - charBudget) done = true
      else {
        val keepMulti = math.max(vocabSize - charBudget, (multi * shrink).toInt)
        val losses = pruneLosses(logp, lastCounts, maxPieceLen)
        // keep the HIGHEST-loss pieces (dropping them would hurt most);
        // deterministic tiebreak on the piece string
        val kept = losses.sortBy { case (p, l) => (-l, p) }.take(keepMulti).map(_._1).toSet
        logp = logp.filter { case (p, _) => charPieces.contains(p) || kept.contains(p) }
      }
    }
    // final re-estimation on the trimmed vocabulary
    for (_ <- 1 to emIters) {
      val (next, _, _) = emRound(words, logp, maxPieceLen)
      logp = next
    }
    logp.toSeq.sortBy(_._1).zipWithIndex
      .map { case ((p, lp), i) => (p, lp, i.toLong) }
      .toDF("piece", "logp", "piece_id")
  }

  /** Tokenize every document with a learned vocabulary: (id, tokens,
    * n_tokens). Zero-shuffle `mapPartitions` with the vocabulary broadcast
    * and a per-partition word→pieces cache ([[Bpe.encode]]'s shape). Null
    * text → zero tokens; null/uncastable ids drop (the sampling module's
    * null-key rule). Novel code points emit themselves as single-char
    * pieces at a penalty below every vocabulary piece (UNK edges).
    * Lower-casing is Locale.ROOT — locale-independent, matching the
    * Spark-side `lower` the training word frequencies use.
    */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame,
      maxPieceLen: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val logp: Map[String, Double] = vocab.select("piece", "logp").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    require(logp.nonEmpty, "empty vocabulary")
    val unkLogp = logp.values.min - 10.0
    val bV = spark.sparkContext.broadcast(logp)
    docs
      .filter(col(idCol).isNotNull && col(idCol).cast("long").isNotNull)
      .select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val v = bV.value
        val cache = new java.util.LinkedHashMap[String, Array[String]](1 << 14, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, Array[String]]): Boolean = size() > 50000
        }
        it.map { case (id, text) =>
          val toks = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").iterator
            .filter(_.nonEmpty)
            .flatMap { w =>
              val hit = cache.get(w)
              if (hit != null) hit
              else {
                val seg = viterbiSegment(Bpe.codePoints(Boundary + w), v, maxPieceLen, unkLogp)
                cache.put(w, seg)
                seg
              }
            }.toSeq
          (id, toks, toks.length.toLong)
        }
      }
      .toDF(idCol, "tokens", "n_tokens")
  }

  /** [[encode]] to dense piece ids: (id, token_ids, n_tokens). Pieces
    * outside the vocabulary (UNK edges for novel code points) map to
    * `unkId`.
    */
  def encodeIds(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame,
      unkId: Long = -1L,
      maxPieceLen: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ids: Map[String, Long] = vocab.select("piece", "piece_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bIds = spark.sparkContext.broadcast(ids)
    encode(docs, idCol, textCol, vocab, maxPieceLen)
      .select(col(idCol).cast("long"), col("tokens"), col("n_tokens"))
      .as[(Long, Seq[String], Long)]
      .map { case (id, toks, n) =>
        val m = bIds.value
        (id, toks.map(t => m.getOrElse(t, unkId)), n)
      }
      .toDF(idCol, "token_ids", "n_tokens")
  }

  /** Decode a token sequence back to text: concatenate, boundary markers
    * become spaces. Inverse of [[encode]] up to the tokenizer's
    * normalization (trim/lower/whitespace-collapse).
    */
  def decode(tokens: Seq[String]): String =
    tokens.mkString.replace(Boundary, " ").trim

  /** A persisted unigram tokenizer: the learned (piece, logp, piece_id)
    * vocabulary plus the lattice geometry it was learned under —
    * segmentation at a different `maxPieceLen` than training would silently
    * change every encoding, so the artifact carries it.
    */
  case class UnigramTokenizer(vocab: DataFrame, maxPieceLen: Int)

  private val MetaFile = "_unigram_meta.json"

  /** Persist a learned tokenizer — the build-once/apply-many artifact
    * pattern of [[Bpe.saveTokenizer]] / [[Classify]]'s NB model: vocabulary
    * as parquet, geometry as a sidecar, so any later job (or cluster)
    * re-encodes IDENTICALLY without re-learning.
    */
  def saveTokenizer(t: UnigramTokenizer, path: String): Unit = {
    val spark = t.vocab.sparkSession
    t.vocab.select("piece", "logp", "piece_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/vocab")
    MetaJson.write(spark, path, MetaFile, Seq("max_piece_len" -> t.maxPieceLen.toLong))
  }

  /** Load a tokenizer written by [[saveTokenizer]]; refuses a bare
    * directory rather than guessing geometry.
    */
  def loadTokenizer(spark: SparkSession, path: String): UnigramTokenizer = {
    val f = MetaJson.readFields(spark, path, MetaFile,
      Seq("max_piece_len"), "a tokenizer written by Unigram.saveTokenizer")
    UnigramTokenizer(spark.read.parquet(s"$path/vocab"), f("max_piece_len"))
  }

  /** [[encodeIds]] under a (possibly loaded) tokenizer artifact. */
  def encodeWith(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      t: UnigramTokenizer,
      unkId: Long = -1L): DataFrame =
    encodeIds(docs, idCol, textCol, t.vocab, unkId, t.maxPieceLen)
}
