package graft

import org.apache.spark.sql.functions._
import graft.ops.WordPiece

/** WordPiece tokenizer contracts; the learning loop and greedy encode are
  * ALSO golden-oracled (q_wp_merges/q_wp_vocab/q_wp_encode_gold vs
  * tools/gen_wordpiece_golden.py) — this suite covers the operator-level
  * properties the goldens can't see.
  */
class WordPieceSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (0L, "unhappy unhappy runner runs"),
    (1L, "happy runner runs unhappily"),
    (2L, "the happy runner runs")
  ).toDF("doc_id", "text")

  test("decomposition and merge product carry the continuation marker") {
    assert(WordPiece.wpSyms("abc").toSeq === Seq("a", "##b", "##c"))
    assert(WordPiece.wpProduct("a", "##b") === "ab")
    assert(WordPiece.wpProduct("##a", "##b") === "##ab")
    assert(WordPiece.wpMergePair(Array("a", "##b", "##b"), "a", "##b").toSeq
      === Seq("ab", "##b"))
  }

  test("learn merges by likelihood ratio, not raw frequency") {
    // 'xy' appears 3x and 'ab' 4x, but x/y occur ONLY together while
    // a/b also occur apart — the ratio must prefer (x, ##y)
    val docs = Seq(
      (0L, "xy xy xy ab ab ab ab az bz az bz")
    ).toDF("doc_id", "text")
    val first = WordPiece.learn(docs, "text", numMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).head
    assert(first === ("x", "##y"))
  }

  test("greedy encode is longest-match-first; uncoverable words become one [UNK]") {
    val merges = WordPiece.learn(corpus, "text", numMerges = 10)
    val vocab = WordPiece.vocabulary(corpus, "text", merges)
    val novel = Seq((7L, "runner ☃melt runs")).toDF("doc_id", "text")
    val toks = WordPiece.encode(novel, "doc_id", "text", vocab)
      .as[(Long, Seq[String], Long)].collect()(0)._2
    // the snowman word has an uncoverable first position → single [UNK],
    // never a partial spell of the rest
    assert(toks.count(_ == WordPiece.Unk) === 1)
    assert(!toks.exists(t => t.contains("melt") && t != WordPiece.Unk || t == "##m"))
    // coverable words round-trip through decode
    val clean = WordPiece.encode(corpus, "doc_id", "text", vocab)
      .as[(Long, Seq[String], Long)].collect().sortBy(_._1)
    corpus.as[(Long, String)].collect().sortBy(_._1).zip(clean).foreach {
      case ((_, text), (_, ts, n)) =>
        assert(n === ts.length.toLong)
        val norm = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ")
        assert(WordPiece.decode(ts) === norm)
    }
  }

  test("learnBatched(batchSize=1) IS sequential WordPiece; larger batches stay valid") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    // a GENUINE check (learn does not delegate): both code paths run
    val seq1 = WordPiece.learn(docs, "text", 10).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val bat1 = WordPiece.learnBatched(docs, "text", 10, batchSize = 1)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(bat1 === seq1)

    val batched = WordPiece.learnBatched(docs, "text", 24, batchSize = 8)
    val rows = batched.orderBy("rank").collect()
    assert(rows.map(_.getInt(0)).toSeq === (0 until rows.length), "ranks contiguous from 0")
    assert(rows.forall(_.getLong(3) >= 2L), "every merge met the min pair count")
    // a (l, r) pair never repeats (each round's picks are symbol-disjoint,
    // and a merged pair cannot recur with the same spelling)
    val pairs = rows.map(r => (r.getString(1), r.getString(2)))
    assert(pairs.distinct.length === pairs.length)
    // the batched merge SET at batch=8 equals sequential's for this corpus
    // depth (order may interleave within score plateaus — the documented
    // fast-trainer approximation), and encode under either table agrees on
    // every doc: identical vocabularies segment identically
    val seqFull = WordPiece.learn(docs, "text", 24)
    val vSeq = WordPiece.vocabulary(docs, "text", seqFull)
    val vBat = WordPiece.vocabulary(docs, "text", batched)
    val eSeq = WordPiece.encode(docs, "doc_id", "text", vSeq)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val eBat = WordPiece.encode(docs, "doc_id", "text", vBat)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(eBat.map(_._1) === eSeq.map(_._1))

    // adaptive growth reaches the same merge count
    val grown = WordPiece.learnBatched(docs, "text", 24, batchSize = 2, maxBatchSize = 16)
    assert(grown.count() === 24L)
  }

  test("learn is invariant under repartitioning") {
    val a = WordPiece.learn(corpus, "text", numMerges = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val b = WordPiece.learn(corpus.repartition(7), "text", numMerges = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(a === b)
  }

  test("encodeIds maps through the dense table; [UNK] rides its own id") {
    val merges = WordPiece.learn(corpus, "text", numMerges = 6)
    val vocab = WordPiece.vocabulary(corpus, "text", merges)
    val ids = vocab.as[(String, Long)].collect().toMap
    val got = WordPiece.encodeIds(
        Seq((1L, "runner ☃")).toDF("doc_id", "text"), "doc_id", "text", vocab)
      .as[(Long, Seq[Long], Long)].collect()(0)._2
    assert(got.contains(ids(WordPiece.Unk)))
    assert(got.forall(i => i >= 0 && i < vocab.count()))
  }

  test("tokenizer artifact: save/load encodes bit-identically; bare dir refused") {
    val dir = java.nio.file.Files.createTempDirectory("wp-art").toString
    try {
      val vocab = WordPiece.vocabulary(corpus, "text",
        WordPiece.learn(corpus, "text", numMerges = 8))
      val t = WordPiece.WordPieceTokenizer(vocab)
      WordPiece.saveTokenizer(t, s"$dir/tok")
      val loaded = WordPiece.loadTokenizer(spark, s"$dir/tok")
      val direct = WordPiece.encodeWith(corpus, "doc_id", "text", t)
        .as[(Long, Seq[Long], Long)].collect().sortBy(_._1).toSeq
      val reloaded = WordPiece.encodeWith(corpus, "doc_id", "text", loaded)
        .as[(Long, Seq[Long], Long)].collect().sortBy(_._1).toSeq
      assert(direct === reloaded)
      val bare = s"$dir/bare"
      new java.io.File(bare).mkdirs()
      val e = intercept[IllegalArgumentException] {
        WordPiece.loadTokenizer(spark, bare)
      }
      assert(e.getMessage.contains("saveTokenizer"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("null text → zero tokens; null id drops; empty vocab refused") {
    val merges = WordPiece.learn(corpus, "text", numMerges = 4)
    val vocab = WordPiece.vocabulary(corpus, "text", merges)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(Row(7L, "runs"), Row(8L, null), Row(null, "dropped")),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val got = WordPiece.encode(docs, "doc_id", "text", vocab)
      .as[(Long, Seq[String], Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got.keySet === Set(7L, 8L)) // the null id dropped
    assert(got(7L) >= 1L && got(8L) === 0L)
    intercept[IllegalArgumentException] {
      WordPiece.encode(docs, "doc_id", "text", vocab.limit(0))
    }
  }
}
