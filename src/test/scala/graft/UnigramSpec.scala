package graft

import org.apache.spark.sql.functions._
import graft.ops.Unigram

/** Unigram (SentencePiece) tokenizer contracts. The learned vocabulary and
  * the Viterbi encode are ALSO golden-oracled against the independent
  * Python implementation (tools/gen_unigram_golden.py) via q_ug_vocab /
  * q_ug_encode_gold; this suite covers the operator-level properties the
  * oracle can't see: determinism under repartitioning, round-trip decode,
  * UNK handling, null hygiene, the artifact contract, and the unreachable-
  * position Viterbi guard.
  */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the cat ran to the mat"),
    (2L, "a cat and a mat and a hat"),
    (3L, "the hat sat on the cat"),
    (4L, "mats and hats and cats")
  ).toDF("doc_id", "text")

  test("seedCounts: frequency-weighted marked-word substring counts, exact") {
    val docs = Seq((0L, "ab ab b")).toDF("doc_id", "text")
    val got = Unigram.seedCounts(docs, "text", maxPieceLen = 3)
      .as[(String, Long)].collect().toMap
    // words: ab(2), b(1); marked: ▁ab ×2, ▁b ×1
    // substrings of ▁ab: ▁, ▁a, ▁ab, a, ab, b; of ▁b: ▁, ▁b, b
    assert(got == Map(
      "▁" -> 3L, "▁a" -> 2L, "▁ab" -> 2L, "a" -> 2L, "ab" -> 2L,
      "b" -> 3L, "▁b" -> 1L))
  }

  test("seedVocab: chars always kept; multi ranked by weight×len, capped") {
    val docs = Seq((0L, "aaa aaa bb")).toDF("doc_id", "text")
    val rows = Unigram.seedVocab(docs, "text", seedSize = 2, maxPieceLen = 4)
      .as[(String, Long, Boolean)].collect()
    val chars = rows.filter(_._3).map(_._1).toSet
    assert(chars == Set("▁", "a", "b"))
    assert(rows.count(!_._3) == 2)
    // ▁aaa: weight 2 × len 4 = 8; aa: weight 4 × len 2 = 8 → tie, piece asc
    assert(rows.filter(!_._3).map(_._1).toSet == Set("▁aaa", "aa"))
  }

  test("learn: exact vocab size, chars covered, logp is a distribution") {
    val vocab = Unigram.learn(corpus, "text", vocabSize = 20, seedSize = 24,
      maxPieceLen = 4)
    val rows = vocab.as[(String, Double, Long)].collect().sortBy(_._3)
    assert(rows.length == 20)
    // dense lexicographic ids
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    assert(rows.map(_._3).toSeq == (0L until 20L))
    // every corpus character survives as a piece
    val chars = corpus.as[(Long, String)].collect()
      .flatMap(_._2.toLowerCase.split("\\s+")).flatMap(w => ("▁" + w).map(_.toString))
      .toSet
    assert(chars.subsetOf(rows.map(_._1).toSet))
    // probabilities are finite and (sub-)normalized (floor mass aside)
    assert(rows.forall(r => r._2 < 0 && !r._2.isInfinite))
    assert(math.abs(rows.map(r => math.exp(r._2)).sum - 1.0) < 1e-6)
  }

  test("learn is invariant under repartitioning (decimal-exact E-step)") {
    val a = Unigram.learn(corpus, "text", vocabSize = 18, seedSize = 20,
      maxPieceLen = 4).as[(String, Double, Long)].collect().sortBy(_._1)
    val b = Unigram.learn(corpus.repartition(7), "text", vocabSize = 18,
      seedSize = 20, maxPieceLen = 4).as[(String, Double, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq) // bit-identical, logp included
  }

  test("encode round-trips through decode; n_tokens matches; no shuffle") {
    val vocab = Unigram.learn(corpus, "text", vocabSize = 20, seedSize = 24,
      maxPieceLen = 4)
    val enc = Unigram.encode(corpus, "doc_id", "text", vocab, maxPieceLen = 4)
    assert(enc.queryExecution.executedPlan.toString.indexOf("Exchange") < 0)
    val byId = enc.as[(Long, Seq[String], Long)].collect().map(r => r._1 -> r).toMap
    val orig = corpus.as[(Long, String)].collect().toMap
    orig.foreach { case (id, text) =>
      val (_, toks, n) = byId(id)
      assert(n == toks.length.toLong)
      val norm = text.trim.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(Unigram.decode(toks) == norm, s"doc $id")
    }
  }

  test("encode: novel code points become single-char UNK pieces; ids map to unkId") {
    val vocab = Unigram.learn(corpus, "text", vocabSize = 18, seedSize = 20,
      maxPieceLen = 4)
    val novel = Seq((9L, "cat ☃☃ mat")).toDF("doc_id", "text")
    val toks = Unigram.encode(novel, "doc_id", "text", vocab, maxPieceLen = 4)
      .as[(Long, Seq[String], Long)].collect()(0)._2
    assert(toks.count(_ == "☃") == 2) // marker-less single-char UNK edges
    assert(Unigram.decode(toks) == "cat ☃☃ mat")
    val ids = Unigram.encodeIds(novel, "doc_id", "text", vocab, unkId = -1L,
      maxPieceLen = 4).as[(Long, Seq[Long], Long)].collect()(0)._2
    assert(ids.count(_ == -1L) == 2)
    assert(ids.forall(i => i == -1L || (i >= 0 && i < 18)))
  }

  test("encode: null text → zero tokens; null id drops") {
    val vocab = Unigram.learn(corpus, "text", vocabSize = 18, seedSize = 20,
      maxPieceLen = 4)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(Row(7L, "the cat"), Row(8L, null), Row(null, "dropped")),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val got = Unigram.encode(docs, "doc_id", "text", vocab, maxPieceLen = 4)
      .as[(Long, Seq[String], Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(7L -> 2L, 8L -> 0L))
  }

  test("viterbiSegment: unreachable end position returns empty, not a hang") {
    // vocabulary covers 'a' only — 'b' is uncoverable at unkLogp = -inf
    val seg = Unigram.viterbiSegment(Array("a", "b"), Map("a" -> -1.0), 2,
      Double.NegativeInfinity)
    assert(seg.isEmpty)
    // with a finite UNK the same input segments fine
    val seg2 = Unigram.viterbiSegment(Array("a", "b"), Map("a" -> -1.0), 2, -5.0)
    assert(seg2.toSeq == Seq("a", "b"))
  }

  test("learn rejects a corpus that can spell the boundary marker") {
    val bad = Seq((0L, "plain text"), (1L, s"sneaky${Unigram.Boundary}word here"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Unigram.learn(bad, "text", vocabSize = 10, seedSize = 12, maxPieceLen = 3)
    }
    assert(e.getMessage.contains("boundary marker"))
  }

  test("tokenizer artifact: save/load round trip is bit-identical; bare dir refused") {
    val dir = java.nio.file.Files.createTempDirectory("unigram-art").toString
    try {
      val vocab = Unigram.learn(corpus, "text", vocabSize = 18, seedSize = 20,
        maxPieceLen = 4)
      val t = Unigram.UnigramTokenizer(vocab, maxPieceLen = 4)
      Unigram.saveTokenizer(t, s"$dir/tok")
      val loaded = Unigram.loadTokenizer(spark, s"$dir/tok")
      assert(loaded.maxPieceLen == 4)
      val direct = Unigram.encodeWith(corpus, "doc_id", "text", t)
        .as[(Long, Seq[Long], Long)].collect().sortBy(_._1)
      val reloaded = Unigram.encodeWith(corpus, "doc_id", "text", loaded)
        .as[(Long, Seq[Long], Long)].collect().sortBy(_._1)
      assert(direct.toSeq == reloaded.toSeq)
      // a bare directory is not a tokenizer
      val bare = s"$dir/bare"
      new java.io.File(bare).mkdirs()
      val e = intercept[IllegalArgumentException] {
        Unigram.loadTokenizer(spark, bare)
      }
      assert(e.getMessage.contains("saveTokenizer"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("q_ug queries run and agree with their documented shapes") {
    val dir = "/root/testdata/sf0.001"
    val seed = SparkEntry.queries("q_ug_seed")(spark, dir)
    assert(seed.columns.toSeq == Seq("piece", "weight"))
    assert(seed.count() > 0)
    val vocab = SparkEntry.queries("q_ug_vocab")(spark, dir)
    assert(vocab.columns.toSeq == Seq("piece", "piece_id"))
    assert(vocab.count() == 40)
    val enc = SparkEntry.queries("q_ug_encode_gold")(spark, dir)
    assert(enc.columns.toSeq == Seq("doc_id", "token_str", "n_tokens"))
    assert(enc.count() == 25)
  }
}
