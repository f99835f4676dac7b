package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (Schuster & Nakajima 2012; the BERT tokenizer) —
  * the third of the three dominant subword families next to [[Bpe]]
  * (merge-frequency) and [[Unigram]] (likelihood/EM). WordPiece is BPE's
  * sibling with a LIKELIHOOD-RATIO merge objective: each round merges the
  * adjacent symbol pair maximizing `count(l,r) / (count(l)·count(r))` —
  * the pair whose merge most increases corpus likelihood under a unigram
  * LM — and continuation symbols carry the `##` prefix instead of an
  * end-of-word marker.
  *
  * Scale shape (the [[Bpe.learn]] discipline): the ONLY corpus-scale pass
  * is [[Bpe.wordFrequencies]]; every learning round re-aggregates the
  * DISTINCT-WORD symbol table (vocabulary-sized by Heaps' law) — one pair
  * aggregate, one symbol aggregate, two bounded joins, a 1-row distributed
  * argmax (TakeOrdered, never a global sort). For realistic (30 k-merge)
  * vocabularies use [[learnBatched]] — symbol-disjoint B merges per round,
  * the [[Bpe.learnBatched]] pattern — so latency is ~merges/B driver
  * rounds, not one per merge. [[encode]] is a zero-shuffle
  * `mapPartitions` with the vocabulary broadcast (BERT's greedy
  * longest-match-first, whole word → UNK on any uncoverable position).
  * Scores divide exact Long counts as `cnt / (lc.toDouble * rc.toDouble)`
  * — one IEEE op order, so ranks are reproducible bit-for-bit anywhere and
  * the learning loop is golden-oracled against an independent Python
  * implementation (tools/gen_wordpiece_golden.py, the [[Bpe]] pattern).
  *
  * Reference analog: none (training-data extension) — SURVEY §2's
  * text-analysis surface; [[Bpe]]/[[Unigram]]'s sibling.
  */
object WordPiece {

  /** BERT's continuation prefix. */
  val Continuation = "##"

  /** BERT's unknown-word token: greedy matching maps a word with ANY
    * uncoverable position to this single token (never a partial spell).
    */
  val Unk = "[UNK]"

  /** WordPiece decomposition of one word: first code point bare, the rest
    * `##`-prefixed. */
  private[graft] def wpSyms(word: String): Array[String] = {
    val cps = Bpe.codePoints(word)
    cps.zipWithIndex.map { case (c, i) => if (i == 0) c else Continuation + c }
  }

  /** Merge product: the right symbol sheds its continuation prefix (the
    * left one keeps its word-position marking). */
  private[graft] def wpProduct(l: String, r: String): String =
    l + r.stripPrefix(Continuation)

  /** One left-to-right merge pass of the exact adjacent pair (l, r). */
  private[graft] def wpMergePair(syms: Array[String], l: String, r: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += wpProduct(l, r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Learn `numMerges` merges: each round takes the pair with the highest
    * likelihood-ratio score `cnt / (count(l)·count(r))` among pairs at or
    * above `minPairCount`, ties broken lexicographically on (l, r).
    * Returns (rank, left_sym, right_sym, pair_count) — counts exact Longs,
    * so the table is hash-exact across engines (q_wp_merges).
    */
  def learn(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      minPairCount: Long = 2L): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab: Dataset[BpeWord] = Bpe.wordFrequencies(docs, textCol)
      .select(col("freq"), col("word")).as[(Long, String)]
      .map { case (f, w) => BpeWord(f, wpSyms(w)) }
      .localCheckpoint(false)
    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val pairs = vocab
        .flatMap(w =>
          if (w.syms.length < 2) Iterator.empty
          else w.syms.iterator.zip(w.syms.iterator.drop(1)).map { case (l, r) => (l, r, w.freq) })
        .toDF("l", "r", "f")
        .groupBy("l", "r").agg(sum("f").as("cnt"))
        .filter(col("cnt") >= minPairCount)
      val syms = vocab
        .flatMap(w => w.syms.iterator.map(s => (s, w.freq)))
        .toDF("s", "f")
        .groupBy("s").agg(sum("f").as("scnt"))
      val top = pairs
        .join(syms.select(col("s").as("l"), col("scnt").as("_lc")), Seq("l"))
        .join(syms.select(col("s").as("r"), col("scnt").as("_rc")), Seq("r"))
        // ONE IEEE op order — double(product) then divide — mirrored
        // exactly by the Python golden generator
        .withColumn("_score",
          col("cnt").cast("double") / (col("_lc").cast("double") * col("_rc").cast("double")))
        .orderBy(col("_score").desc, col("l"), col("r"))
        .limit(1).select("l", "r", "cnt").collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((merges.size, l, r, c))
        vocab = vocab.map(w => BpeWord(w.freq, wpMergePair(w.syms, l, r)))
          .localCheckpoint(false)
      }
    }
    merges.toSeq.toDF("rank", "left_sym", "right_sym", "pair_count")
  }

  /** [[learn]] at vocabulary scale — the [[Bpe.learnBatched]] shape ported
    * to the likelihood-ratio objective: `batchSize` merges per round, so a
    * 30 k-merge vocabulary costs ~30k/B driver rounds instead of 30 k
    * sequential round-trips. Each round computes the scored pair table ONCE
    * (pair counts joined to both symbol counts, `cnt/(lc·rc)`) and greedily
    * selects the top-scored pairs whose symbols are pairwise DISJOINT.
    * Disjointness makes same-round picks exactly non-interfering: merging
    * (a,b) only consumes occurrences of a and b and only destroys pairs
    * overlapping an (a,b) occurrence — all of which share a or b — so a
    * disjoint pick's count, BOTH its symbol counts, and hence its score are
    * bit-identical to what sequential learning would have seen. The `used`
    * set also holds each pick's PRODUCT, so no same-round pick's symbol can
    * be an earlier pick's product — without that exclusion a later merge
    * would consume occurrences created mid-batch and its emitted round-start
    * count would understate what was merged. With `batchSize = 1` the
    * selection IS sequential WordPiece (spec-asserted equal to [[learn]]);
    * larger batches are the standard fast-trainer approximation — merge
    * ORDER can diverge from strict greedy (an early merge's product may
    * spawn a higher-scoring pair mid-batch), but every emitted pair carries
    * its true corpus count and encode semantics are unchanged.
    *
    * `maxBatchSize > batchSize` opts into the same ADAPTIVE pacing as
    * [[Bpe.learnBatched]]: double after a round that fills its quota from
    * the 4× candidate headroom, halve back toward `batchSize` after one
    * that cannot — ~log₂(30k/B) + 30k/maxB rounds for a realistic
    * vocabulary. Default (`maxBatchSize = 0`) keeps the batch fixed.
    */
  def learnBatched(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      batchSize: Int = 64,
      minPairCount: Long = 2L,
      maxBatchSize: Int = 0): DataFrame = {
    require(batchSize >= 1, "batchSize must be at least 1")
    val maxB = if (maxBatchSize <= 0) batchSize else maxBatchSize
    require(maxB >= batchSize, "maxBatchSize must be 0 (fixed) or >= batchSize")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab: Dataset[BpeWord] = Bpe.wordFrequencies(docs, textCol)
      .select(col("freq"), col("word")).as[(Long, String)]
      .map { case (f, w) => BpeWord(f, wpSyms(w)) }
      .localCheckpoint(false)
    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    var b = batchSize
    while (merges.size < numMerges && !exhausted) {
      val want = math.min(b, numMerges - merges.size)
      val pairs = vocab
        .flatMap(w =>
          if (w.syms.length < 2) Iterator.empty
          else w.syms.iterator.zip(w.syms.iterator.drop(1)).map { case (l, r) => (l, r, w.freq) })
        .toDF("l", "r", "f")
        .groupBy("l", "r").agg(sum("f").as("cnt"))
        .filter(col("cnt") >= minPairCount)
      val syms = vocab
        .flatMap(w => w.syms.iterator.map(s => (s, w.freq)))
        .toDF("s", "f")
        .groupBy("s").agg(sum("f").as("scnt"))
      // 4× headroom (the Bpe.learnBatched rationale): conflicts strike
      // adjacent ranks, so the disjoint prefix of the top-4B list almost
      // always holds B picks; a shortfall only costs an extra round
      val top = pairs
        .join(syms.select(col("s").as("l"), col("scnt").as("_lc")), Seq("l"))
        .join(syms.select(col("s").as("r"), col("scnt").as("_rc")), Seq("r"))
        // ONE IEEE op order — double(product) then divide — the learn()
        // order, mirrored by the Python golden generator
        .withColumn("_score",
          col("cnt").cast("double") / (col("_lc").cast("double") * col("_rc").cast("double")))
        .orderBy(col("_score").desc, col("l"), col("r"))
        .limit(want * 4).select("l", "r", "cnt").collect()
      // `used` holds each pick's symbols AND its product: a later pick whose
      // symbol equals an earlier pick's product would consume occurrences
      // created mid-batch, so its round-start count would understate what
      // gets merged — excluding products keeps every emitted pair_count
      // exactly the corpus count at the moment the merge applies
      val used = mutable.Set.empty[String]
      val picked = mutable.ArrayBuffer.empty[(String, String, Long)]
      top.iterator
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .foreach { case (l, r, c) =>
          if (picked.size < want && !used(l) && !used(r)) {
            picked += ((l, r, c)); used += l; used += r; used += wpProduct(l, r)
          }
        }
      if (picked.isEmpty) exhausted = true
      else {
        picked.foreach { case (l, r, c) => merges += ((merges.size, l, r, c)) }
        val batch = picked.toArray
        vocab = vocab.map { w =>
          var s = w.syms
          var i = 0
          while (i < batch.length) { s = wpMergePair(s, batch(i)._1, batch(i)._2); i += 1 }
          BpeWord(w.freq, s)
        }.localCheckpoint(false)
        b = if (picked.size == want) math.min(b * 2, maxB)
            else math.max(batchSize, b / 2)
      }
    }
    merges.toSeq.toDF("rank", "left_sym", "right_sym", "pair_count")
  }

  /** The dense token-id table: base symbols are the corpus's distinct
    * word-start code points and `##`-continuations plus [[Unk]] (ids 0..,
    * lexicographic), merge products follow in rank order (rank r ↦ id =
    * |base| + r) — the [[Bpe.vocabulary]] layout.
    */
  def vocabulary(docs: DataFrame, textCol: String, merges: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = Bpe.wordFrequencies(docs, textCol)
      .select(col("word")).as[String]
      .flatMap(w => wpSyms(w).iterator)
      .distinct()
      .collect().toSeq
    val baseSorted = (base :+ Unk).sorted
    val products = merges.select("rank", "left_sym", "right_sym").collect()
      .sortBy(_.getInt(0))
      .map(r => wpProduct(r.getString(1), r.getString(2)))
    val rows = baseSorted.zipWithIndex.map { case (t, i) => (t, i.toLong) } ++
      products.zipWithIndex.map { case (t, i) => (t, (baseSorted.size + i).toLong) }
    val dup = rows.groupBy(_._1).filter(_._2.size > 1).keys
    require(dup.isEmpty,
      s"vocabulary collision: ${dup.take(3).mkString(",")} — a merge product " +
        "collides with a base symbol (or two merges share a product)")
    rows.toDF("token", "token_id")
  }

  /** Greedy longest-match-first tokenization (BERT's WordPiece algorithm):
    * per word, repeatedly take the LONGEST vocabulary piece matching at the
    * cursor (continuation positions must match `##`-prefixed pieces); if no
    * piece fits at some position the WHOLE word becomes [[Unk]]. Returns
    * (id, tokens, n_tokens). Zero-shuffle `mapPartitions`, vocabulary
    * broadcast, per-partition word cache ([[Bpe.encode]]'s shape); null
    * text → zero tokens, null/uncastable ids drop.
    */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tokens: Set[String] = vocab.select("token").collect().map(_.getString(0)).toSet
    require(tokens.nonEmpty, "empty vocabulary")
    val maxLen = tokens.iterator.map(t => Bpe.codePoints(t.stripPrefix(Continuation)).length)
      .max
    val bV = spark.sparkContext.broadcast((tokens, maxLen))
    docs
      .filter(col(idCol).isNotNull && col(idCol).cast("long").isNotNull)
      .select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val (v, mx) = bV.value
        val cache = new java.util.LinkedHashMap[String, Array[String]](1 << 14, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, Array[String]]): Boolean = size() > 50000
        }
        def segment(word: String): Array[String] = {
          val cps = Bpe.codePoints(word)
          val out = mutable.ArrayBuffer.empty[String]
          var pos = 0
          while (pos < cps.length) {
            val prefix = if (pos == 0) "" else Continuation
            var len = math.min(mx, cps.length - pos)
            var found: String = null
            while (found == null && len >= 1) {
              val cand = prefix + cps.slice(pos, pos + len).mkString
              if (v.contains(cand)) found = cand else len -= 1
            }
            if (found == null) return Array(Unk)
            out += found
            pos += len
          }
          out.toArray
        }
        it.map { case (id, text) =>
          val toks = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").iterator
            .filter(_.nonEmpty)
            .flatMap { w =>
              val hit = cache.get(w)
              if (hit != null) hit
              else { val seg = segment(w); cache.put(w, seg); seg }
            }.toSeq
          (id, toks, toks.length.toLong)
        }
      }
      .toDF(idCol, "tokens", "n_tokens")
  }

  /** [[encode]] to dense ids under a [[vocabulary]] table; [[Unk]] rides
    * its own vocabulary id (it is always in the base). */
  def encodeIds(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ids: Map[String, Long] = vocab.select("token", "token_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(ids.contains(Unk), s"vocabulary must carry $Unk")
    val bIds = spark.sparkContext.broadcast(ids)
    encode(docs, idCol, textCol, vocab)
      .select(col(idCol).cast("long"), col("tokens"), col("n_tokens"))
      .as[(Long, Seq[String], Long)]
      .map { case (id, toks, n) =>
        val m = bIds.value
        (id, toks.map(t => m(t)), n)
      }
      .toDF(idCol, "token_ids", "n_tokens")
  }

  /** A persisted WordPiece tokenizer: the dense [[vocabulary]] table is the
    * whole geometry (greedy matching derives its max piece length from the
    * vocabulary itself). */
  case class WordPieceTokenizer(vocab: DataFrame)

  private val MetaFile = "_wordpiece_meta.json"

  /** Persist a tokenizer — the build-once/apply-many artifact pattern of
    * [[Bpe.saveTokenizer]]/[[Unigram.saveTokenizer]]: vocabulary as
    * parquet plus a marker sidecar, so any later job re-encodes
    * IDENTICALLY without re-learning. */
  def saveTokenizer(t: WordPieceTokenizer, path: String): Unit = {
    val spark = t.vocab.sparkSession
    t.vocab.select("token", "token_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/vocab")
    MetaJson.write(spark, path, MetaFile, Seq("wordpiece_v" -> 1L))
  }

  /** Load a tokenizer written by [[saveTokenizer]]; refuses a bare
    * directory. */
  def loadTokenizer(spark: org.apache.spark.sql.SparkSession, path: String): WordPieceTokenizer = {
    MetaJson.readFields(spark, path, MetaFile,
      Seq("wordpiece_v"), "a tokenizer written by WordPiece.saveTokenizer")
    WordPieceTokenizer(spark.read.parquet(s"$path/vocab"))
  }

  /** [[encodeIds]] under a (possibly loaded) tokenizer artifact. */
  def encodeWith(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      t: WordPieceTokenizer): DataFrame =
    encodeIds(docs, idCol, textCol, t.vocab)

  /** Decode: continuations glue to their predecessor, other boundaries are
    * spaces. Inverse of [[encode]] up to normalization, except [[Unk]]
    * (lossy by design). */
  def decode(tokens: Seq[String]): String = {
    val sb = new StringBuilder
    tokens.foreach { t =>
      if (t.startsWith(Continuation)) sb.append(t.stripPrefix(Continuation))
      else {
        if (sb.nonEmpty) sb.append(' ')
        sb.append(t)
      }
    }
    sb.toString
  }
}
