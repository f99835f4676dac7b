package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** BPE learning + encoding: the Sennrich golden sequence, equivalence with
  * an independent single-machine reference implementation on real corpus
  * data, decode round-trips, and partitioning-independence.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  /** Independent in-memory BPE learner (dictionary-of-tuples style, no
    * shared code with the operator) for cross-checking.
    */
  private def referenceLearn(
      wordFreq: Map[String, Long], k: Int, minCount: Long = 2L): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toVector :+ Bpe.EndOfWord) -> f }
    val out = mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (out.size < k && !done) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) += f)
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        if (c < minCount) done = true
        else {
          out += ((l, r, c))
          vocab = vocab.map { case (syms, f) =>
            val merged = mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                merged += (l + r); i += 2
              } else { merged += syms(i); i += 1 }
            }
            merged.toVector -> f
          }.groupMapReduce(_._1)(_._2)(_ + _)
        }
      }
    }
    out.toSeq
  }

  private def fixture(rows: (String, Long)*) =
    rows.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")

  test("Sennrich corpus: first merges are (e,s), (es,t), (est,</w>), then (l,o)") {
    val docs = fixture(("low", 5), ("lower", 2), ("newest", 6), ("widest", 3))
    val merges = Bpe.learn(docs, "text", 4)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges(0) === (("e", "s", 9L)))
    assert(merges(1) === (("es", "t", 9L)))
    assert(merges(2) === (("est", Bpe.EndOfWord, 9L)))
    assert(merges(3) === (("l", "o", 7L)))
  }

  test("learn matches an independent reference implementation on sf0.001 documents") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val wf = Bpe.wordFrequencies(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceLearn(wf, 12)
    val got = Bpe.learn(docs, "text", 12)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === expected)
  }

  test("initialPairCounts agrees with the first learned merge's argmax") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val topPair = Bpe.initialPairCounts(docs, "text")
      .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
      .limit(1).collect()(0)
    val firstMerge = Bpe.learn(docs, "text", 1).collect()(0)
    assert(topPair.getString(0) === firstMerge.getString(1))
    assert(topPair.getString(1) === firstMerge.getString(2))
    assert(topPair.getLong(2) === firstMerge.getLong(3))
  }

  test("encode round-trips: joined tokens reproduce the normalized words") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(50)
    val merges = Bpe.learn(docs, "text", 20)
    val decoded = Bpe.encode(docs, "doc_id", "text", merges)
      .select(col("doc_id"),
        // strip the markers, re-join: tokens concatenate back to the words
        regexp_replace(concat_ws("", col("tokens")), java.util.regex.Pattern.quote(Bpe.EndOfWord), " ")
          .as("rejoined"))
    val orig = docs.select(col("doc_id"),
      concat_ws(" ", graft.ops.Dedup.tokens(col("text"))).as("norm"))
    val mismatches = decoded.join(orig, "doc_id")
      .filter(trim(col("rejoined")) =!= col("norm"))
      .count()
    assert(mismatches === 0L)
  }

  test("encode is partitioning-independent; no merges means chars+1 per word; merges only shrink") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val merges = Bpe.learn(docs, "text", 20)
    val base = Bpe.encode(docs, "doc_id", "text", merges)
      .select("doc_id", "n_tokens").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val repart = Bpe.encode(docs.repartition(17, col("doc_id")), "doc_id", "text", merges)
      .select("doc_id", "n_tokens").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base === repart)

    val empty = Bpe.encode(docs, "doc_id", "text", merges.limit(0))
      .agg(sum("n_tokens")).collect()(0).getLong(0)
    val expectedBase = docs
      .select(explode(graft.ops.Dedup.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .agg(sum(length(col("w")) + 1)).collect()(0).getLong(0)
    assert(empty === expectedBase, "zero merges = one symbol per char + end marker")
    assert(base.values.sum <= empty, "a merge can only shorten encodings")
  }

  test("learnBatched(batchSize=1) IS sequential BPE; larger batches stay valid") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val seq1 = Bpe.learn(docs, "text", 10).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val bat1 = Bpe.learnBatched(docs, "text", 10, batchSize = 1).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(bat1 === seq1)

    val batched = Bpe.learnBatched(docs, "text", 24, batchSize = 8)
    val rows = batched.orderBy("rank").collect()
    assert(rows.map(_.getInt(0)).toSeq === (0 until rows.length), "ranks contiguous from 0")
    assert(rows.forall(_.getLong(3) >= 2L), "every merge met the min pair count")
    // rounds select symbol-disjoint pairs: within each batch no symbol repeats
    // (weaker global check: a (l,r) pair never appears twice)
    val pairs = rows.map(r => (r.getString(1), r.getString(2)))
    assert(pairs.distinct.length === pairs.length)

    // the batched table still encodes losslessly and compresses
    val enc = Bpe.encode(docs, "doc_id", "text", batched)
    val noMerge = Bpe.encode(docs, "doc_id", "text", batched.limit(0))
    assert(enc.agg(sum("n_tokens")).collect()(0).getLong(0) <
      noMerge.agg(sum("n_tokens")).collect()(0).getLong(0))
    val rejoined = enc.select(col("doc_id"),
      regexp_replace(concat_ws("", col("tokens")),
        java.util.regex.Pattern.quote(Bpe.EndOfWord), " ").as("rejoined"))
    val orig = docs.select(col("doc_id"),
      concat_ws(" ", graft.ops.Dedup.tokens(col("text"))).as("norm"))
    assert(rejoined.join(orig, "doc_id")
      .filter(trim(col("rejoined")) =!= col("norm")).count() === 0L)
  }

  test("adaptive batch growth: same validity as fixed-batch, far fewer driver rounds") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val grown = Bpe.learnBatched(docs, "text", 256, batchSize = 4, maxBatchSize = 128)
    val rows = grown.orderBy("rank").collect()
    // growth ran well past several doublings of the batch (the corpus's
    // pair tail exhausts before the 256 budget — that early stop is the
    // contract, not a failure)
    assert(rows.length > 64 && rows.length <= 256)
    assert(rows.map(_.getInt(0)).toSeq === (0 until rows.length), "ranks contiguous from 0")
    assert(rows.forall(_.getLong(3) >= 2L), "every merge met the min pair count")
    val pairs = rows.map(r => (r.getString(1), r.getString(2)))
    assert(pairs.distinct.length === pairs.length)

    // grown merges build a collision-free vocabulary and encode losslessly —
    // the same contract the fixed-batch trainer meets
    val vocab = Bpe.vocabulary(docs, "text", grown)
    val ids = vocab.collect().map(_.getLong(1))
    assert(ids.sorted.toSeq === (0L until ids.length).toSeq)
    val enc = Bpe.encode(docs, "doc_id", "text", grown)
    val rejoined = enc.select(col("doc_id"),
      regexp_replace(concat_ws("", col("tokens")),
        java.util.regex.Pattern.quote(Bpe.EndOfWord), " ").as("rejoined"))
    val orig = docs.select(col("doc_id"),
      concat_ws(" ", graft.ops.Dedup.tokens(col("text"))).as("norm"))
    assert(rejoined.join(orig, "doc_id")
      .filter(trim(col("rejoined")) =!= col("norm")).count() === 0L)

    // maxBatchSize = 0 (default) stays fixed: batchSize=1 remains exactly
    // sequential even when growth is available elsewhere
    intercept[IllegalArgumentException] {
      Bpe.learnBatched(docs, "text", 8, batchSize = 16, maxBatchSize = 4)
    }
  }

  test("null and empty text encode to zero tokens") {
    val docs = Seq((1L, "low low"), (2L, null.asInstanceOf[String]), (3L, "  "))
      .toDF("doc_id", "text")
    val got = Bpe.encode(docs, "doc_id", "text", Bpe.learn(docs, "text", 2))
      .select("doc_id", "n_tokens").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) === 0L && got(3L) === 0L)
    assert(got(1L) > 0L)
  }

  test("vocabulary + encodeIds: dense ids, no OOV on the training corpus, rank layout") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val merges = Bpe.learnBatched(docs, "text", 24, batchSize = 8)
    val vocab = Bpe.vocabulary(docs, "text", merges)
    val rows = vocab.collect().map(r => r.getString(0) -> r.getLong(1))
    // dense, collision-free id space
    assert(rows.map(_._2).sorted.toSeq === (0L until rows.length).toSeq)
    assert(rows.map(_._1).distinct.length === rows.length)
    // merge products occupy |base| + rank
    val nBase = rows.length - merges.count().toInt
    val byToken = rows.toMap
    merges.collect().foreach { m =>
      assert(byToken(m.getString(1) + m.getString(2)) === nBase + m.getInt(0))
    }
    // ids invert losslessly back to the token strings on the training corpus
    val inv = rows.map { case (t, i) => i -> t }.toMap
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
      .select("doc_id", "tokens").collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val encIds = Bpe.encodeIds(docs, "doc_id", "text", merges, vocab)
      .select("doc_id", "token_ids").collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(encIds.keySet === enc.keySet)
    encIds.foreach { case (d, idseq) =>
      assert(idseq.forall(_ >= 0L), s"doc $d emitted an UNK on its own training corpus")
      assert(idseq.map(inv) === enc(d))
    }
    // a novel code point at apply time maps to unkId
    val novel = Seq((99L, "\u00e9tude")).toDF("doc_id", "text")
    val got = Bpe.encodeIds(novel, "doc_id", "text", merges, vocab, unkId = -7L)
      .select("token_ids").collect()(0).getSeq[Long](0)
    assert(got.contains(-7L))
  }

  test("byte fallback: char-level vocabulary closes over novel code points, round-trips") {
    val train = fixture(("low", 5), ("lower", 2), ("newest", 6), ("widest", 3))
    val merges = Bpe.learn(train, "text", 8)
    val vocab = Bpe.vocabulary(train, "text", merges, byteFallback = true)
    // the fallback alphabet is fully present, on dense collision-free ids
    val rows = vocab.collect().map(r => r.getString(0) -> r.getLong(1))
    assert(rows.map(_._2).sorted.toSeq === (0L until rows.length).toSeq)
    assert(Bpe.ByteFallbackTokens.forall(rows.map(_._1).toSet))

    // text full of symbols the char-level trainer never saw: accents, CJK,
    // an emoji outside the BMP \u2014 no UNK anywhere
    val novel = Seq(
      (1L, "caf\u00e9 \ud83c\udf89 low"),
      (2L, "\u65e5\u672c\u8a9e newest")).toDF("doc_id", "text")
    val enc = Bpe.encodeIds(novel, "doc_id", "text", merges, vocab, unkId = -7L)
      .select("doc_id", "token_ids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(enc.values.forall(_.forall(_ != -7L)), "fallback must leave no UNK")

    // ids invert through the vocabulary and decodeCharTokens reassembles the
    // normalized text, multi-byte code points reassembled across tokens
    val inv = rows.map { case (t, i) => i -> t }.toMap
    val expected = novel.select(col("doc_id"),
        concat_ws(" ", graft.ops.Dedup.tokens(col("text"))).as("norm"))
      .collect().map(r => r.getLong(0) -> r.getString(1).trim).toMap
    enc.foreach { case (id, idseq) =>
      assert(Bpe.decodeCharTokens(idseq.map(inv)) === expected(id), s"doc $id round-trip")
    }

    // without fallback the same novel corpus DOES emit UNK (the guard this
    // feature removes), and byte-level mode refuses the redundant flag
    val plain = Bpe.vocabulary(train, "text", merges)
    val unk = Bpe.encodeIds(novel, "doc_id", "text", merges, plain, unkId = -7L)
      .select("token_ids").collect().flatMap(_.getSeq[Long](0))
    assert(unk.contains(-7L))
    intercept[IllegalArgumentException] {
      Bpe.vocabulary(train, "text", Bpe.learn(train, "text", 2, byteLevel = true),
        byteLevel = true, byteFallback = true)
    }
  }

  test("byte-level mode: lossless on emoji/CJK, closed vocabulary, no UNK on novel text") {
    val train = fixture(("low", 5), ("lower", 2), ("newest", 6), ("widest", 3))
    val merges = Bpe.learn(train, "text", 8, byteLevel = true)
    // pure-ASCII corpus: byte symbols == char symbols 1:1, so the first
    // merge count must equal char mode's ((e,s) with count 9)
    assert(merges.orderBy("rank").collect()(0).getLong(3) === 9L)

    // apply to text FULL of symbols the trainer never saw
    val novel = Seq(
      (1L, "caf\u00e9 na\u00efve"),
      (2L, "\u65e5\u672c\u8a9e \ud83d\ude00 mixed"),
      (3L, "plain low")).toDF("doc_id", "text")
    val enc = Bpe.encode(novel, "doc_id", "text", merges, byteLevel = true)
    val decoded = enc.select("doc_id", "tokens").collect()
      .map(r => r.getLong(0) -> Bpe.decodeByteTokens(r.getSeq[String](1))).toMap
    val expected = novel.select(col("doc_id"),
        concat_ws(" ", graft.ops.Dedup.tokens(col("text"))).as("norm"))
      .collect().map(r => r.getLong(0) -> r.getString(1).trim).toMap
    // decodeByteTokens drops word boundaries' markers; compare space-free
    decoded.foreach { case (id, d) =>
      assert(d === expected(id).replace(" ", ""), s"doc $id byte round-trip")
    }

    // closed vocabulary: 256 byte symbols + marker + merges, and encodeIds
    // never emits UNK even on the novel corpus
    val vocab = Bpe.vocabulary(train, "text", merges, byteLevel = true)
    assert(vocab.count() === 257L + merges.count())
    val ids = Bpe.encodeIds(novel, "doc_id", "text", merges, vocab, unkId = -7L, byteLevel = true)
      .select("token_ids").collect().flatMap(_.getSeq[Long](0))
    assert(!ids.contains(-7L), "byte-level vocabulary must be closed — no UNK ever")
  }

  test("marker collision: char-level vocabulary fails loudly; byte-level is immune") {
    // a corpus that SPELLS the end-of-word marker: merges along < / w >
    // eventually form the product "</w>", colliding with the marker token
    val hostile = fixture(("</w>", 50), ("</wx", 10), ("low", 5))
    val merges = Bpe.learn(hostile, "text", 12)
    val products = merges.collect().map(r => r.getString(1) + r.getString(2))
    assume(products.contains("</w>"), "fixture must actually form the marker")
    val e = intercept[IllegalArgumentException] {
      Bpe.vocabulary(hostile, "text", merges)
    }
    assert(e.getMessage.contains("collision"))

    // same corpus in byte-level mode: symbols are hex blocks, the marker
    // contains non-hex characters, no collision is possible
    val bMerges = Bpe.learn(hostile, "text", 12, byteLevel = true)
    val bVocab = Bpe.vocabulary(hostile, "text", bMerges, byteLevel = true)
    assert(bVocab.count() === 257L + bMerges.count())
    val dec = Bpe.encode(hostile, "doc_id", "text", bMerges, byteLevel = true)
      .select("tokens").collect()
      .map(r => Bpe.decodeByteTokens(r.getSeq[String](0)))
    assert(dec.count(_ == "</w>") === 50)
  }

  test("encode applies to a stream unchanged (stateless mapPartitions): stream == batch") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(60)
    val merges = Bpe.learn(docs, "text", 12)
    val batch = Bpe.encode(docs, "doc_id", "text", merges)
      .select("doc_id", "n_tokens").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = Bpe.encode(source.toDF().toDF("doc_id", "text"), "doc_id", "text", merges)
      .select("doc_id", "n_tokens")
      .writeStream.outputMode("append").format("memory").queryName("bpe_stream_out").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      source.addData(a.toSeq); q.processAllAvailable()
      source.addData(b.toSeq); q.processAllAvailable()
      val streamed = spark.table("bpe_stream_out")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("byte-level rejects hex-parsable markers loudly") {
    val docs = fixture(("low", 3))
    val e = intercept[IllegalArgumentException] {
      Bpe.learn(docs, "text", 2, endOfWord = "ff", byteLevel = true)
    }
    assert(e.getMessage.contains("non-hex"))
    intercept[IllegalArgumentException] { Bpe.decodeByteTokens(Seq("61"), endOfWord = "0a") }
    intercept[IllegalArgumentException] {
      Bpe.vocabulary(docs, "text",
        Bpe.learn(docs, "text", 0, byteLevel = true), endOfWord = "abc", byteLevel = true)
    }
    // char mode is unaffected: hex-looking markers are legal there
    assert(Bpe.learn(docs, "text", 1, endOfWord = "ff").count() >= 0)
  }

  test("tokenizer artifact: save -> load -> encode is identical; bare dirs refused") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val merges = Bpe.learnBatched(docs, "text", 24, batchSize = 8, byteLevel = true)
    val vocab = Bpe.vocabulary(docs, "text", merges, byteLevel = true)
    val t = Bpe.BpeTokenizer(merges, vocab, Bpe.EndOfWord, byteLevel = true)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_tok").toString

    val inMem = Bpe.encodeWith(docs, "doc_id", "text", t)
      .select("doc_id", "token_ids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    Bpe.saveTokenizer(t, dir)
    val loaded = Bpe.loadTokenizer(spark, dir)
    assert(loaded.byteLevel && loaded.endOfWord === Bpe.EndOfWord)
    val viaDisk = Bpe.encodeWith(docs, "doc_id", "text", loaded)
      .select("doc_id", "token_ids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaDisk === inMem, "a loaded tokenizer must encode bit-identically")

    val bare = java.nio.file.Files.createTempDirectory("graft_bpe_bare").toString
    val e = intercept[IllegalArgumentException] { Bpe.loadTokenizer(spark, bare) }
    assert(e.getMessage.contains("saveTokenizer"))
  }

  test("decode(encode) == normalized text, corpus-scale and per-row") {
    val docs = Seq(
      (1L, "  The   QUICK brown\tfox  "),
      (2L, "internationalization nation station"),
      (3L, ""),
      (4L, "single")).toDF("doc_id", "text")
    val merges = Bpe.learn(docs, "text", numMerges = 8)
    val decoded = Bpe.decode(Bpe.encode(docs, "doc_id", "text", merges), "doc_id")
      .as[(Long, String)].collect().toMap
    val expect = Map(
      1L -> "the quick brown fox",
      2L -> "internationalization nation station",
      3L -> "",
      4L -> "single")
    assert(decoded === expect, s"got $decoded")
  }
}
