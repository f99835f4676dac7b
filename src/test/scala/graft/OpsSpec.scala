package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{AsOf, Dedup, Publish, TextAnalysis, TrafficAgg}

/** Unit semantics of the core ops: as-of join direction/ties, exact-moment
  * traffic stats, dedup building blocks, first-seen counter.
  */
class OpsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("AsOf backward picks latest snapshot <= fact time, ties by greatest tiebreak") {
    val facts = Seq((1L, "k", ts("2020-01-05 00:00:00"))).toDF("fid", "k", "ft")
    val snaps = Seq(
      ("k", ts("2020-01-01 00:00:00"), 10L),
      ("k", ts("2020-01-05 00:00:00"), 20L), // exactly at fact time → applies
      ("k", ts("2020-01-05 00:00:00"), 21L), // tie → greatest id wins
      ("k", ts("2020-01-06 00:00:00"), 30L)) // after → ignored
      .toDF("k", "st", "sid")
    val got = AsOf.join(facts, snaps, "k", "ft", "st",
      snapCols = Seq("sid"), forward = false, tiebreak = Some("sid"))
      .select("fid", "snap_sid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 21L)))
  }

  test("AsOf: null field in the nearest snapshot stays null (no row tearing)") {
    val facts = Seq((1L, "k", ts("2020-01-05 00:00:00"))).toDF("fid", "k", "ft")
    val snaps = Seq(
      ("k", ts("2020-01-01 00:00:00"), 10L, "active"),
      ("k", ts("2020-01-04 00:00:00"), 20L, null)) // nearest has null status
      .toDF("k", "st", "sid", "status")
    val got = AsOf.join(facts, snaps, "k", "ft", "st",
      snapCols = Seq("sid", "status"), tiebreak = Some("sid"))
      .select("snap_sid", "snap_status").head()
    assert(got.getLong(0) == 20L)
    assert(got.isNullAt(1), "null field must not be backfilled from an older snapshot")
  }

  test("AsOf: string tiebreak keeps native ordering") {
    val facts = Seq((1L, "k", ts("2020-01-05 00:00:00"))).toDF("fid", "k", "ft")
    val snaps = Seq(
      ("k", ts("2020-01-04 00:00:00"), "alpha"),
      ("k", ts("2020-01-04 00:00:00"), "beta")) // tie → greatest string wins
      .toDF("k", "st", "name")
    val got = AsOf.join(facts, snaps, "k", "ft", "st",
      snapCols = Seq("name"), tiebreak = Some("name"))
      .select("snap_name").as[String].head()
    assert(got == "beta")
  }

  test("AsOf forward picks earliest snapshot >= fact time; no snapshot → null") {
    val facts = Seq(
      (1L, "k", ts("2020-01-05 00:00:00")),
      (2L, "k", ts("2020-01-07 00:00:00"))).toDF("fid", "k", "ft")
    val snaps = Seq(
      ("k", ts("2020-01-04 00:00:00"), 10L),
      ("k", ts("2020-01-06 00:00:00"), 20L),
      ("k", ts("2020-01-06 00:00:00"), 21L)) // tie → least id wins
      .toDF("k", "st", "sid")
    val got = AsOf.join(facts, snaps, "k", "ft", "st",
      snapCols = Seq("sid"), forward = true, tiebreak = Some("sid"))
      .select("fid", "snap_sid").as[(Long, java.lang.Long)].collect().toMap
    assert(got(1L) == 20L)
    assert(got(2L) == null)
  }

  test("TrafficAgg: sample stddev, single-row group yields 0.0, 15-min buckets") {
    val rows = Seq(
      (ts("2020-01-01 00:01:00"), "a", 1.0),
      (ts("2020-01-01 00:14:59"), "a", 3.0), // same bucket as above
      (ts("2020-01-01 00:15:00"), "a", 5.0)) // next bucket, single row
      .toDF("t", "g", "v")
    val got = TrafficAgg.aggregate(rows, "t", Seq("g"), Seq("v"))
      .orderBy("bucket_start")
      .select("volume", "v_avg", "v_std")
      .as[(Long, Double, Double)].collect().toSeq
    // stddev_samp(1,3) = sqrt(2) ≈ 1.414
    assert(got == Seq((2L, 2.0, 1.414), (1L, 5.0, 0.0)))
  }

  test("Dedup.shingleRows clips short documents and builds n-grams in order") {
    val df = Seq((1L, "a b c d"), (2L, "x"), (3L, "p q")).toDF("id", "text")
    val got = Dedup.shingleRows(df, "id", "text", 3)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a b c"), (1L, "b c d"), (2L, "x"), (3L, "p q")))
  }

  test("piiAudit: per-pattern counts and the clean flag") {
    val df = Seq(
      (1L, "plain text nothing here"),
      (2L, "mail me at a.b@x.org or c@y.io today"),
      (3L, "see https://a.b/c and http://d.e 192.168.0.1 10.0.0.2"),
      (4L, "edge 999.1.2.3 still counts as ipv4 shape"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.piiAudit(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)), r.getBoolean(4))).toMap
    assert(got(1L) == (((0L, 0L, 0L), true)))
    assert(got(2L) == (((2L, 0L, 0L), false)))
    assert(got(3L) == (((0L, 2L, 2L), false)))
    assert(got(4L) == (((0L, 0L, 1L), false)))
  }

  test("tagKeywords: case-normalized dictionary intersect, no-match docs vanish") {
    val df = Seq(
      (1L, "the HASH and the join"),
      (2L, "nothing relevant at all"),
      (3L, Seq.fill(3)("join").mkString(" "))) // dup tokens tag once
      .toDF("doc_id", "text")
    val got = TextAnalysis.tagKeywords(df, "doc_id", "text", Seq("Hash", "JOIN"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "hash"), (1L, "join"), (3L, "join")))
  }

  test("phraseSearch: adjacency required, overlaps counted, short docs safe") {
    val df = Seq(
      (1L, "fast hash join beats sort"),     // one match
      (2L, "hash of the join column"),       // tokens present, not adjacent
      (3L, "hash join hash join again"),     // two matches
      (4L, "HASH  JOIN"),                    // case + multi-space normalize
      (5L, "join"),                          // shorter than the phrase
      (6L, "a a a"))                         // overlap: "a a" matches twice
      .toDF("doc_id", "text")
    val got = TextAnalysis.phraseSearch(df, "doc_id", "text", Seq("hash", "join"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 3L -> 2L, 4L -> 1L))
    val overlaps = TextAnalysis.phraseSearch(df, "doc_id", "text", Seq("a", "a"))
      .as[(Long, Long)].collect().toMap
    assert(overlaps == Map(6L -> 2L), "overlapping occurrences both count")
  }

  test("noveltyScore: novel-shingle fraction vs reference; NULL text keeps its spine row") {
    val ref = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val scored = Seq(
      (1L, Some("a b c d")),  // every shingle seen → novelty 0
      (2L, Some("x y z w")),  // fully novel → novelty 1
      (3L, Some("a b c x")),  // "a b c" seen, "b c x" novel → 0.5
      (4L, Option.empty[String])) // no shingles → nulls
      .toDF("doc_id", "text")
    val got = TextAnalysis.noveltyScore(scored, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(got(1L) == ((2L, 0L, Some(0.0))))
    assert(got(2L) == ((2L, 2L, Some(1.0))))
    assert(got(3L) == ((2L, 1L, Some(0.5))))
    assert(got(4L) == ((0L, 0L, None)))
  }

  test("Dedup: identical docs share all minhashes, LSH pairs them") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content with other words entirely here now"))
      .toDF("id", "text")
    val pairs = Dedup.minhashLshPairs(df, "id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhashCalibration: identical pair reads 1/1/0; exact side matches a driver recompute") {
    val texts = Map(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and again",
      // shares a long prefix with 1/2 so the LSH may or may not pair it —
      // whatever pairs come out, the exact side must equal the recompute
      4L -> "the quick brown fox jumps over the lazy dog again and never",
      3L -> "completely different content with other words entirely here now")
    val df = texts.toSeq.toDF("id", "text")
    val got = Dedup.minhashCalibration(df, "id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.contains((1L, 2L)))
    assert(got((1L, 2L)) == ((1.0, 1.0, 0.0)))
    // exact jaccard of every emitted pair equals the driver-side set math
    got.foreach { case ((a, b), (_, exact, err)) =>
      val sa = Dedup.shinglesOf(texts(a), 3).toSet
      val sb = Dedup.shinglesOf(texts(b), 3).toSet
      val inter = (sa & sb).size.toDouble
      val expected =
        math.floor(inter / (sa.size + sb.size - inter) * 1e6 + 0.5) / 1e6
      assert(exact == expected, s"pair ($a,$b)")
      assert(err >= 0.0 && err <= 1.0)
    }
  }

  test("CMS inner product: exact join size at collision-free width, one-sided otherwise") {
    // A tokens {x×3, y×2}, B {x×4, z}: true join size on token = 3·4 = 12
    val a = Seq((1L, "x x x y y")).toDF("doc_id", "text")
    val b = Seq((2L, "x x x x z")).toDF("doc_id", "text")
    val wide = graft.ops.CountMin.innerProductEstimate(
      graft.ops.CountMin.sketch(a, "text", 3, 4096),
      graft.ops.CountMin.sketch(b, "text", 3, 4096), depth = 3).head().getLong(0)
    assert(wide == 12L, "3 tokens in 4096 buckets: no collisions, estimate is exact")
    // tiny width forces collisions: the estimate stays one-sided (≥ true)
    val narrow = graft.ops.CountMin.innerProductEstimate(
      graft.ops.CountMin.sketch(a, "text", 3, 2),
      graft.ops.CountMin.sketch(b, "text", 3, 2), depth = 3).head().getLong(0)
    assert(narrow >= 12L)
    // disjoint vocabularies at wide geometry: estimate 0
    val disj = graft.ops.CountMin.innerProductEstimate(
      graft.ops.CountMin.sketch(Seq((1L, "p q")).toDF("doc_id", "text"), "text", 3, 4096),
      graft.ops.CountMin.sketch(Seq((2L, "r s")).toDF("doc_id", "text"), "text", 3, 4096),
      depth = 3).head().getLong(0)
    assert(disj == 0L)
  }

  test("keySkewReport: hand Gini, uniform is 0, NULL keys counted apart") {
    // a×6, b×2, c×1, d×1, NULL×2 → counts [1,1,2,6]: S=33, G=(66−50)/40=0.4
    val rows = Seq.fill(6)(Some("a")) ++ Seq.fill(2)(Some("b")) ++
      Seq(Some("c"), Some("d"), None, None)
    val got = graft.ops.Skew.keySkewReport(rows.toDF("k"), "k").head()
    assert(got.getAs[Long]("n_rows") == 12L && got.getAs[Long]("n_null") == 2L)
    assert(got.getAs[Long]("n_keys") == 4L && got.getAs[Long]("top1_cnt") == 6L)
    assert(got.getAs[Double]("top1_share") == 0.6)
    assert(got.getAs[Double]("gini") == 0.4)
    // perfectly uniform: gini 0
    val uni = graft.ops.Skew.keySkewReport(
      Seq("a", "a", "b", "b", "c", "c").toDF("k"), "k").head()
    assert(uni.getAs[Double]("gini") == 0.0)
    // all keys NULL: everything undefined except the counts
    val nil = graft.ops.Skew.keySkewReport(
      Seq(Option.empty[String], None).toDF("k"), "k").head()
    assert(nil.getAs[Long]("n_keys") == 0L)
    assert(nil.isNullAt(nil.fieldIndex("gini")) && nil.isNullAt(nil.fieldIndex("top1_share")))
  }

  test("sentenceChunks: greedy packing, oversized sentence isolated, byte-exact reconstruction") {
    val text = "One two. Three four five. Six."
    val df = Seq(
      (1L, text),
      (2L, "a b c d e f."),          // 6 tokens, budget 3 → one oversized chunk
      (3L, "no terminator here"),    // trailing run is its own sentence
      (4L, ""))                      // empty → no chunks
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.sentenceChunks(df, "doc_id", "text", maxTokens = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // doc 1: "One two."(2) | " Three four five."(3) + " Six."(1) pack to 4
    assert(got((1L, 0L)) == ((1L, 2L, "One two.")))
    assert(got((1L, 1L)) == ((2L, 4L, " Three four five. Six.")))
    // reconstruction: chunks in order restore the document byte-for-byte
    val rebuilt = got.toSeq.filter(_._1._1 == 1L).sortBy(_._1._2).map(_._2._3).mkString
    assert(rebuilt == text)
    val over = graft.ops.TextAnalysis.sentenceChunks(df, "doc_id", "text", maxTokens = 3)
      .filter("doc_id = 2").collect()
    assert(over.length == 1 && over(0).getLong(3) == 6L,
      "oversized sentence gets its own over-budget chunk, never splits")
    assert(!got.keySet.exists(_._1 == 4L), "empty docs yield no chunks")
    assert(got((3L, 0L))._3 == "no terminator here")
  }

  test("tokenizationStats: byte-BPE floor identity, multibyte text, NULL/empty conventions") {
    val df = Seq(
      (1L, "Hello  world"),       // 2 words, 10 word bytes → 12 byte tokens
      (2L, "héllo"),              // 1 word, 6 bytes / 5 code points → 7 tokens
      (3L, ""),                   // empty → 1 word (split convention), 1 token
      (4L, null.asInstanceOf[String])) // NULL reads as empty
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.tokenizationStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(got(1L) == ((2L, 12L, 12L, 12L, 6.0, 1.0)))
    assert(got(2L) == ((1L, 6L, 5L, 7L, 7.0, 0.857143)))
    assert(got(3L)._1 == 1L && got(3L)._4 == 1L && got(3L)._5 == 1.0)
    assert(got(4L) == got(3L).copy(), "NULL text ≡ empty text")
  }

  test("lshPlan: S-curve endpoints, monotonicity, and the multiply-chain values") {
    val plan = Dedup.lshPlan(spark, numHashes = 8, thresholds = Seq(0.2, 0.5, 0.9))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)) -> r.getDouble(3))
      .toMap
    // all 4 factorizations of 8 × 3 thresholds
    assert(plan.size == 12)
    assert(plan.keys.map(k => (k._1, k._2)).toSet ==
      Set((1L, 8L), (2L, 4L), (4L, 2L), (8L, 1L)))
    // driver recompute with the same left-associated chains
    def p(b: Int, r: Int, s: Double): Double = {
      val sr = (1 until r).foldLeft(s)((acc, _) => acc * s)
      val om = 1.0 - sr
      val qb = (1 until b).foldLeft(om)((acc, _) => acc * om)
      math.floor((1.0 - qb) * 1e6 + 0.5) / 1e6
    }
    plan.foreach { case ((b, r, s), got) =>
      assert(got == p(b.toInt, r.toInt, s), s"($b,$r,$s)")
    }
    // more bands at fixed k = higher recall at every s; curve rises in s
    assert(plan((8L, 1L, 0.5)) > plan((2L, 4L, 0.5)))
    assert(plan((2L, 4L, 0.9)) > plan((2L, 4L, 0.5)))
  }

  test("softDedupWeights: per-cluster weights sum to 1, singletons weigh 1.0") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content with other words entirely here now"))
      .toDF("doc_id", "text")
    val got = graft.ops.Dedup.softDedupWeights(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 0.5)) && got(2L) == ((2L, 0.5)))
    assert(got(3L) == ((1L, 1.0)))
  }

  test("Dedup.repeatedSpans: maximal cross-document spans, window merge, minDocs gate") {
    // docs 1 and 2 share a 10-token run (tokens 2..11 of doc 1, 0..9 of
    // doc 2); doc 3 is unrelated; doc 4 repeats the run INTERNALLY only
    val shared = (1 to 10).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared tail1 tail2"),
      (2L, s"$shared other words here"),
      (3L, "nothing in common with anything at all here today"),
      (4L, "solo text that appears just once in the corpus")
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(docs, "doc_id", "text", windowTokens = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // 10 shared tokens at window 4 → overlapping windows merge into ONE
    // maximal span per doc, exactly covering the run
    assert(got === Set((1L, 2, 12), (2L, 0, 10)))

    // windows of a doc with itself never pair (distinct-doc frequency)
    val selfRep = Seq((9L, s"$shared filler $shared")).toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(selfRep, "doc_id", "text", windowTokens = 4).count() === 0L)

    // minDocs raises the bar: the run must appear in >= 3 docs
    val got3 = Dedup.repeatedSpans(docs, "doc_id", "text", windowTokens = 4, minDocs = 3)
    assert(got3.count() === 0L)

    // token-boundary integrity: ("ab","c") vs ("a","bc") must NOT match
    val tricky = Seq((1L, "ab c x y z"), (2L, "a bc x y z")).toDF("doc_id", "text")
    val trickySpans = Dedup.repeatedSpans(tricky, "doc_id", "text", windowTokens = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // only the genuinely shared "x y z" region pairs (windows at 2..3 /
    // 2..3), never the boundary-shifted prefix
    assert(trickySpans === Set((1L, 2, 5), (2L, 2, 5)))
  }

  test("Dedup.repeatedSpansAgainstHistory: history windows flag batch spans; empty history == batch-only") {
    val shared = (1 to 10).map(i => s"dup$i").mkString(" ")
    val histDocs = Seq((100L, s"archive prefix $shared archive suffix")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, s"fresh words then $shared and more"),
      (2L, "entirely novel content nothing repeated anywhere today")).toDF("doc_id", "text")
    val histHashes = Dedup.windowRows(histDocs, "doc_id", "text", 4)
      .select("win_hash").distinct()
    // doc 1's run appears once in the batch — only history can flag it
    val got = Dedup.repeatedSpansAgainstHistory(batch, histHashes, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got === Set((1L, 3, 13)))
    // both prune strategies agree
    val shuffled = Dedup.repeatedSpansAgainstHistory(
        batch, histHashes, "doc_id", "text", 4, broadcastBatch = false)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(shuffled === got)
    // empty history degenerates to plain repeatedSpans
    val empty = histHashes.limit(0)
    val incrEmpty = Dedup.repeatedSpansAgainstHistory(batch, empty, "doc_id", "text", 4)
      .collect().toSet
    val plain = Dedup.repeatedSpans(batch, "doc_id", "text", 4).collect().toSet
    assert(incrEmpty.map(_.toString) === plain.map(_.toString))
  }

  test("Dedup.spanCoverage: duplicated-token ratio per doc, empty and span-free edges") {
    val shared = (1 to 10).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared tail1 tail2"), // 14 tokens, 10 duplicated
      (2L, s"$shared"),                        // 10 tokens, all duplicated
      (3L, "independent words only"),          // no spans
      (4L, "   "),                             // empty after normalization
      (5L, null.asInstanceOf[String])          // null text counts as empty
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, "doc_id", "text", windowTokens = 4)
    val got = Dedup.spanCoverage(docs, spans, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((10L, 14, 0.714286)))
    assert(got(2L) === ((10L, 10, 1.0)))
    assert(got(3L) === ((0L, 3, 0.0)))
    assert(got(4L) === ((0L, 0, 0.0)), "empty doc must not divide by zero")
    assert(got(5L) === ((0L, 0, 0.0)), "null text is zero tokens, never -1")
  }

  test("Dedup.removeSpans cuts exactly the flagged tokens; span-free docs normalize only") {
    val shared = (1 to 10).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared tail1 tail2"),
      (2L, s"  $shared   OTHER words here "),
      (3L, "untouched text stays as is"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, "doc_id", "text", windowTokens = 4)
    val got = Dedup.removeSpans(docs, spans, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "alpha beta tail1 tail2")
    assert(got(2L) === "other words here", "normalization + cut compose")
    assert(got(3L) === "untouched text stays as is")
    assert(got(4L) === "", "null text cleans to empty string, row never vanishes")
    // idempotence: a deduplicated corpus has no cross-doc spans left at
    // the same window size
    val clean = Dedup.removeSpans(docs, spans, "doc_id", "text")
      .withColumnRenamed("clean_text", "text")
    assert(Dedup.repeatedSpans(clean, "doc_id", "text", windowTokens = 4).count() === 0L)
  }

  test("Dedup.exact groups identical normalized text") {
    val df = Seq((1L, "Hello  World"), (2L, "hello  world"), (3L, "other"))
      .toDF("id", "text")
    val got = Dedup.exact(df, "id", "text")
      .select("canonical_id", "dup_count").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 1L)))
  }

  test("Dedup.ngramJaccardPairs computes exact jaccard within blocks") {
    val df = Seq(
      (1L, "a b c d e", "blk"), // shingles(2): ab bc cd de
      (2L, "a b c d x", "blk"), // ab bc cd dx → inter 3, union 5 → 0.6
      (3L, "zz yy", "other"))
      .toDF("id", "text", "b")
    val got = Dedup.ngramJaccardPairs(df, "id", "text", Seq(col("b")), n = 2, threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 0.6)))
  }

  test("chunkTokenWindows: coverage, overlap, and short-document invariants") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 tokens → 3 chunks at step 32
      (2L, "tiny doc"),                                // shorter than one chunk
      (3L, (1 to 40).map(i => s"x$i").mkString(" ")),  // exactly one full chunk
      (4L, ""))                                        // empty → one empty chunk
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokenWindows(docs, "doc_id", "text", 40, 8)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }

    // every token of every doc appears in order; consecutive chunks share
    // exactly the 8-token overlap
    val c1 = got(1L)
    assert(c1.length == 3) // ceil((100 - 8) / 32) — no chunk inside the overlap tail
    c1.sliding(2).foreach { case Array(a, b) =>
      val at = a._3.split(" ").toSeq
      val bt = b._3.split(" ").toSeq
      assert(at.takeRight(8) == bt.take(8), s"overlap broken between ${a._2} and ${b._2}")
    }
    val reassembled = c1.head._3.split(" ").toSeq ++
      c1.tail.flatMap(_._3.split(" ").toSeq.drop(8))
    assert(reassembled == (1 to 100).map(i => s"w$i"))
    assert(c1.map(_._4).toSeq == Seq(40L, 40L, 100L - 2 * 32))

    assert(got(2L).toSeq == Seq((2L, 0L, "tiny doc", 2L)))
    assert(got(3L).toSeq.map(c => (c._2, c._4)) == Seq((0L, 40L)))
    assert(got(4L).toSeq == Seq((4L, 0L, "", 1L))) // split("") = [""] — one empty token
  }

  test("simhashPairs: banding finds exactly the brute-force Hamming-radius pairs") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(120)
    val banded = graft.ops.Dedup.simhashPairs(docs, "doc_id", "text", bits = 32, maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSet
    // brute force over the same fingerprints: every pair within the radius
    // MUST be found (pigeonhole: radius-k pairs agree on >= 1 of k+1 bands)
    val sh = graft.ops.Dedup.simhash(docs, "doc_id", "text", bits = 32)
    val a = sh.select(col("doc_id").as("id_a"), col("simhash").as("sa"))
    val b = sh.select(col("doc_id").as("id_b"), col("simhash").as("sb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == brute, s"banded=${banded.size} brute=${brute.size}")
    assert(brute.nonEmpty, "fixture has no near-dup pairs — test is vacuous")
  }

  test("simhashPairs: ceil-width degenerate banding (bits=16, maxHamming=4) stays correct and keyed") {
    // 5 bands over 16 bits with a uniform ceil width of 4 would place the
    // last band entirely past the fingerprint — constant 0 for every doc,
    // collapsing the join into all-pairs. floor/ceil widths keep every band
    // on real bits; result must still equal brute force.
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(120)
    val banded = graft.ops.Dedup.simhashPairs(docs, "doc_id", "text", bits = 16, maxHamming = 4)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSet
    val sh = graft.ops.Dedup.simhash(docs, "doc_id", "text", bits = 16)
    val a = sh.select(col("doc_id").as("id_a"), col("simhash").as("sa"))
    val b = sh.select(col("doc_id").as("id_b"), col("simhash").as("sb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == brute, s"banded=${banded.size} brute=${brute.size}")
  }

  test("search and bm25 normalize query tokens to the corpus tokenization") {
    import graft.ops.TextAnalysis
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val clean = TextAnalysis.booleanSearch(docs, "doc_id", "text", Seq("scan", "join"))
      .collect().map(_.getLong(0)).toSet
    val messy = TextAnalysis.booleanSearch(docs, "doc_id", "text", Seq(" Scan", "JOIN "))
      .collect().map(_.getLong(0)).toSet
    assert(messy === clean && clean.nonEmpty,
      "padded/uppercase query tokens must match like their normalized forms")
    val b1 = TextAnalysis.bm25(docs, "doc_id", "text", Seq("scan"), totalDocs = 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b2 = TextAnalysis.bm25(docs, "doc_id", "text", Seq("  SCAN"), totalDocs = 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(b1 === b2 && b1.nonEmpty)
  }

  test("dedupLinesGlobal: a null-id document cannot erase shared lines corpus-wide") {
    val docs = Seq(
      (Some(1L), "alpha\nshared line\nbeta"),
      (Some(2L), "shared line\ngamma"),
      (None: Option[Long], "shared line\nonly here"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.dedupLinesGlobal(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    // doc 1 (lowest addressable id) keeps the shared line; doc 2 loses it;
    // the null-id doc is excluded rather than silently erasing the line
    assert(got(1L).contains("shared line"))
    assert(!got(2L).contains("shared line") && got(2L).contains("gamma"))
    assert(got.keySet === Set(1L, 2L))
  }

  test("persisted text index: indexed search equals direct, buckets prune partitions") {
    import graft.ops.TextAnalysis
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val query = Seq("scan", "join", "window")
    val direct = TextAnalysis.booleanSearch(docs, "doc_id", "text", query)
      .as[(Long, Long)].collect().toSet

    val dir = java.nio.file.Files.createTempDirectory("graft_tix_").toString
    TextAnalysis.saveTextIndex(
      TextAnalysis.buildTextIndex(docs, "doc_id", "text", buckets = 64), dir)
    val loaded = TextAnalysis.loadTextIndex(spark, dir)
    assert(loaded.buckets == 64)
    val viaIndex = TextAnalysis.booleanSearchIndexed(loaded, "doc_id", query)
    assert(viaIndex.as[(Long, Long)].collect().toSet == direct)
    assert(direct.nonEmpty)

    // the driver-computed token buckets must reach the scan as partition
    // filters — that is the build-once/search-many payoff
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tok_bucket"),
      s"expected tok_bucket partition pruning in:\n$plan")

    // a bare parquet dir without the meta file refuses to load
    intercept[IllegalArgumentException] {
      TextAnalysis.loadTextIndex(
        spark, java.nio.file.Files.createTempDirectory("graft_tix_bare_").toString)
    }
  }

  test("cdcChunkPairs: maxDocFreq drops boilerplate chunks from pairing") {
    // two real near-dups plus a boilerplate chunk present in EVERY doc
    val rng = new scala.util.Random(13)
    val boiler = Vector.fill(120)(s"b${rng.nextInt(100)}")
    def doc(seed: Int) =
      (boiler ++ Vector.fill(200)(s"t${seed}_${rng.nextInt(4000)}")).mkString(" ")
    val base = doc(1)
    val docs = Seq(
      (1L, base), (2L, ("x1 " + base)), (3L, doc(3)), (4L, doc(4)))
      .toDF("doc_id", "text")
    val open = graft.ops.Dedup.cdcChunkPairs(docs, "doc_id", "text", minShared = 1)
      .as[(Long, Long, Long)].collect().toSet
    // without the guard the shared boilerplate pairs everything with everything
    assert(open.size >= 5, s"fixture should over-pair: $open")
    val guarded = graft.ops.Dedup
      .cdcChunkPairs(docs, "doc_id", "text", minShared = 1, maxDocFreq = 2)
      .as[(Long, Long, Long)].collect().toSet
    // with it, only the true edited-copy pair survives
    assert(guarded.map(p => (p._1, p._2)) == Set((1L, 2L)), s"got $guarded")
  }

  test("cdcChunkPairs finds an edited copy that fixed-stride chunk hashing misses") {
    val rng = new scala.util.Random(11)
    val base = Vector.fill(400)(s"w${rng.nextInt(4000)}")
    val edited = Vector("x1", "x2", "x3") ++ base // shifted copy
    val other = Vector.fill(400)(s"z${rng.nextInt(4000)}")
    val docs = Seq(
      (1L, base.mkString(" ")), (2L, edited.mkString(" ")), (3L, other.mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.cdcChunkPairs(docs, "doc_id", "text", minShared = 2)
      .as[(Long, Long, Long)].collect()
    // the edited copy pairs with its original on most chunks...
    val hit = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(hit.nonEmpty, "edited copy not detected")
    assert(hit.get._3 >= 10, s"only ${hit.get._3} shared chunks")
    // ...and the unrelated doc pairs with nothing
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))

    // contrast: fixed-stride 16-token chunk hashes share NOTHING after the
    // 3-token shift (every boundary moved) — the reason CDC exists
    val fixedShared = graft.ops.TextAnalysis
      .chunkTokenWindows(docs, "doc_id", "text", chunkTokens = 16)
      .select(col("doc_id"), md5(col("chunk_text")).as("h"))
      .groupBy("h").agg(collect_set("doc_id").as("ids"))
      .filter(array_contains(col("ids"), 1L) && array_contains(col("ids"), 2L))
      .count()
    assert(fixedShared == 0, "fixture too easy: fixed-stride also matched")
  }

  test("bm25: query-term docs outrank term-free docs; rarer terms weigh more") {
    val docs = Seq(
      (1L, "scan scan scan filler filler"),
      (2L, "scan filler filler filler filler"),
      (3L, "filler words only here today"),
      (4L, "rare filler filler filler filler"))
      .toDF("doc_id", "text")
    val scored = graft.ops.TextAnalysis
      .bm25(docs, "doc_id", "text", Seq("scan", "rare"), totalDocs = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(3L) == 0.0)                  // no query terms
    assert(scored(1L) > scored(2L))            // higher tf, same term
    assert(scored(4L) > scored(2L))            // df(rare)=1 < df(scan)=2 → bigger idf
    assert(scored.values.forall(_ >= 0.0))
  }

  test("dedupLinesGlobal: first doc keeps a shared line, later docs lose it, no Window node") {
    val docs = Seq(
      (1L, "alpha\nbeta"),
      (2L, "beta\ngamma"),   // beta first seen in doc 1 → only gamma survives
      (3L, "alpha"),          // fully duplicate → doc drops out
      (4L, "delta\n\ndelta")) // empty line normalized away; repeat dropped
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.dedupLinesGlobal(docs, "doc_id", "text")
    val byId = got.collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byId == Map(
      1L -> ("alpha\nbeta", 2L),
      2L -> ("gamma", 1L),
      4L -> ("delta", 1L)))
    // skew-safety is structural: first-occurrence must be the two-level
    // min-struct aggregate, never a row_number window over the line hash
    assert(!got.queryExecution.executedPlan.toString.contains("Window"),
      "dedupLinesGlobal must not use a window over the line hash")
  }

  test("newAgainstHistory: matches direct anti-join; history is broadcast-semi-filtered") {
    val history = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon"), (3L, "Alpha  Beta Gamma "))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "ALPHA BETA GAMMA"),  // normalizes to a seen hash
      (11L, "zeta eta"),          // novel
      (12L, "delta epsilon"),     // seen verbatim
      (13L, "zeta eta"))          // novel, duplicated within the batch
      .toDF("doc_id", "text")
    val got = graft.ops.Dedup.newAgainstHistory(batch, history, "doc_id", "text")
    val seen = got.select("doc_id", "seen_before").as[(Long, Boolean)].collect().toMap
    assert(seen == Map(10L -> true, 11L -> false, 12L -> true, 13L -> false))

    // but for whitespace normalization, 10L would be "new": the hash is over
    // trim(lower(text)) — same contract as Dedup.exact
    assert(got.filter(col("doc_id") === 10L).select("content_hash").head().getString(0) ==
      got.sparkSession.sql("SELECT md5('alpha beta gamma')").head().getString(0))

    // the history side must reach the semi join through a broadcast, never
    // an exchange: at 100 TB the history shuffle is the whole cost
    val plan = got.queryExecution.executedPlan.toString
    val semiIdx = plan.indexOf("LeftSemi")
    assert(semiIdx >= 0 && plan.substring(semiIdx).contains("BroadcastExchange") ||
      plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"history semi-filter is not broadcast:\n$plan")
  }

  test("chunkContentDefined: reassembly, boundary determinism, shift resistance") {
    // deterministic pseudo-random token stream (seeded) — md5-driven cut
    // points land every ~16 tokens
    val rng = new scala.util.Random(7)
    val base = Vector.fill(400)(s"t${rng.nextInt(5000)}")
    val edited = Vector("ins1", "ins2", "ins3") ++ base // 3-token prefix insertion
    val docs = Seq((1L, base.mkString(" ")), (2L, edited.mkString(" ")), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkContentDefined(docs, "doc_id", "text", window = 4, avgTokens = 16)
      .as[(Long, Long, Long, Long, String, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }

    // chunks tile the document exactly: contiguous offsets, lossless reassembly
    val c1 = got(1L)
    assert(c1.head._3 == 0L && c1.map(_._4).sum == 400L)
    c1.sliding(2).foreach { case Array(a, b) => assert(a._3 + a._4 == b._3); case _ => }
    assert(c1.flatMap(_._5.split(" ")).toVector == base)

    // shift resistance: after a 3-token prefix insertion the cut decisions
    // (trailing 4-gram hashes) realign at the first shared cut point, so all
    // but the earliest chunks are byte-identical — fixed-stride chunking
    // would shift EVERY boundary and share ~nothing
    val h1 = c1.map(_._6).toSet
    val h2 = got(2L).map(_._6).toSet
    val shared = h1.intersect(h2).size.toDouble / c1.length
    assert(shared >= 0.7, s"only ${h1.intersect(h2).size}/${c1.length} chunks survived the edit")
    // and the divergence is confined to the front: last 80% of chunks all match
    val tail1 = c1.drop(math.max(2, c1.length / 5)).map(_._6)
    assert(tail1.forall(h2.contains), "a chunk past the realignment point changed")

    // empty document → single empty chunk, same contract as chunkTokenWindows
    assert(got(3L).toSeq.map(c => (c._2, c._3, c._4, c._5)) == Seq((0L, 0L, 1L, "")))
  }

  test("bigramPerplexity: fluent text scores below gibberish; short docs surface with nulls") {
    val fluent = (1 to 30).map(_ => "the cat sat on the mat and the dog ran").mkString(" ")
    val train = Seq((1L, fluent), (2L, fluent), (3L, fluent)).toDF("doc_id", "text")
    val score = Seq(
      (10L, "the cat sat on the mat"), // in-distribution
      (11L, "zqx vbn mkl pqr wsd jkl"), // every bigram unseen
      (12L, "solo"), // 1 token → no bigrams
      (13L, "")) // empty → no bigrams
      .toDF("doc_id", "text")
    val vocab = TextAnalysis.vocabStats(train, "doc_id", "text").count()
    val got = TextAnalysis.bigramPerplexity(
        train, "doc_id", "text", score, "doc_id", "text", vocabSize = vocab)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(got.keySet == Set(10L, 11L, 12L, 13L), "every scored doc surfaces")
    assert(got(10L)._1 == 5 && got(11L)._1 == 5)
    assert(got(10L)._3.get < got(11L)._3.get,
      s"in-distribution ppl ${got(10L)._3} must beat gibberish ${got(11L)._3}")
    // unseen-prefix bigrams back off to uniform 1/V: ppl(gibberish) == V
    assert(math.abs(got(11L)._3.get - vocab.toDouble) < 1e-3)
    assert(got(12L) == ((0L, None, None)) && got(13L) == ((0L, None, None)))
    // perplexity = e^avg_nll (up to the two roundings)
    assert(math.abs(got(10L)._3.get - math.exp(got(10L)._2.get)) < 1e-3)
    // partition-layout independence: integer nano-nat sums are order-free
    val again = TextAnalysis.bigramPerplexity(
        train.repartition(7), "doc_id", "text", score.repartition(5), "doc_id", "text",
        vocabSize = vocab)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(again == got)
  }

  test("stupidBackoffScore walks the full backoff ladder with hand-computed scores") {
    // train: one doc, 4 tokens -> trigrams {(a b c), (b c a)}... keep it
    // countable: "a b c a b" gives trigrams (a,b,c),(b,c,a),(c,a,b);
    // bigrams (a,b)x2,(b,c),(c,a); unigrams a:2 b:2 c:1, N=5, V=3
    val train = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val score = Seq(
      (10L, "a b c"), // seen trigram: S = c3/c12 = 1/2
      (11L, "x b c"), // unseen trigram, seen bigram (b,c): S = 0.4 * 1/2
      (12L, "x y c"), // unseen bigram (y,c), seen unigram c: S = 0.16 * 1/5
      (13L, "x y z"), // OOV w3: S = 0.16 / (5 + 3)
      (14L, "a b")) // < 3 tokens -> no trigrams
      .toDF("doc_id", "text")
    val got = TextAnalysis.stupidBackoffScore(
        train, "doc_id", "text", score, "doc_id", "text", vocabSize = 3L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    def nll(s: Double) = -math.log(s)
    assert(got(10L)._1 === 1L)
    assert(math.abs(got(10L)._2.get - nll(0.5)) < 1e-5)
    assert(math.abs(got(11L)._2.get - nll(0.4 * 0.5)) < 1e-5)
    assert(math.abs(got(12L)._2.get - nll(0.16 * 1.0 / 5.0)) < 1e-5)
    assert(math.abs(got(13L)._2.get - nll(0.16 / 8.0)) < 1e-5)
    assert(got(14L) === ((0L, None)))
    // the ladder is monotone: each backoff level scores worse
    assert(got(10L)._2.get < got(11L)._2.get)
    assert(got(11L)._2.get < got(12L)._2.get)
    assert(got(12L)._2.get < got(13L)._2.get)
  }

  test("kneserNeyScore: hand-computed discount + continuation interpolation") {
    // train "a b c a b": c2 = {(a,b):2, (b,c):1, (c,a):1}; ctx(a)=(2,1),
    // ctx(b)=ctx(c)=(1,1); every seen token follows exactly 1 distinct
    // context so Pcont = (1+1)/(3+3) = 1/3; unseen tokens get 1/6. D=0.75.
    val train = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val score = Seq(
      (10L, "a b"), // seen bigram: (2-.75)/2 + .75*(1/2)*(1/3) = 0.75
      (11L, "a c"), // unseen bigram, seen context a: 0 + .75*(1/2)*(1/3) = 0.125
      (12L, "x a"), // unseen context: pure continuation = 1/3
      (13L, "x z"), // unseen context AND word: 1/6
      (14L, "a")) // single token -> no bigrams
      .toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyScore(
        train, "doc_id", "text", score, "doc_id", "text", vocabSize = 3L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    def nll(p: Double) = -math.log(p)
    assert(got(10L)._1 === 1L)
    assert(math.abs(got(10L)._2.get - nll(0.75)) < 1e-5)
    assert(math.abs(got(11L)._2.get - nll(0.125)) < 1e-5)
    assert(math.abs(got(12L)._2.get - nll(1.0 / 3.0)) < 1e-5)
    assert(math.abs(got(13L)._2.get - nll(1.0 / 6.0)) < 1e-5)
    assert(got(14L) === ((0L, None)))
    assert(got(10L)._2.get < got(11L)._2.get)
    assert(got(12L)._2.get < got(13L)._2.get)
  }

  test("kneserNeyScore: continuation counts beat raw frequency (the 'francisco' property)") {
    // 'francisco' and 'glasses' are equally frequent (3 each), but
    // francisco follows ONE distinct context while glasses follows three.
    // In a novel context KN must prefer glasses — the signature that
    // distinguishes it from frequency-backoff smoothing (stupid backoff
    // scores these two identically here).
    val train = Seq(
      (1L, "san francisco"), (2L, "san francisco"), (3L, "san francisco"),
      (4L, "new glasses"), (5L, "old glasses"), (6L, "my glasses"))
      .toDF("doc_id", "text")
    val score = Seq((10L, "qq francisco"), (11L, "qq glasses")).toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyScore(
        train, "doc_id", "text", score, "doc_id", "text", vocabSize = 6L)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(11L) < got(10L),
      s"glasses (3 contexts) must score better than francisco (1 context): $got")
    // exact values: Pcont(francisco) = 2/10, Pcont(glasses) = 4/10
    val gotNll = TextAnalysis.kneserNeyScore(
        train, "doc_id", "text", score, "doc_id", "text", vocabSize = 6L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(gotNll(10L) - -math.log(0.2)) < 1e-5)
    assert(math.abs(gotNll(11L) - -math.log(0.4)) < 1e-5)
  }

  test("TimeSeries: forward fill carries last non-null; grid resample slots + dedup") {
    import spark.implicits._
    val rows = Seq(
      (1L, 7L, 100L, Some(1.0)),
      (2L, 7L, 200L, None),        // hole → carries 1.0
      (3L, 7L, 300L, Some(3.0)),
      (4L, 7L, 300L, None),        // same second, higher id → still 3.0 after fill
      (5L, 9L, 100L, None))        // leading null stays null
      .toDF("id", "k", "sec", "v")
    val ff = graft.ops.TimeSeries.forwardFill(rows, "k", "sec", "id", Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(ff(1L).contains(1.0) && ff(2L).contains(1.0))
    assert(ff(3L).contains(3.0) && ff(4L).contains(3.0))
    assert(ff(5L).isEmpty)

    // grid: key 7 observed at 100..1000; step 250 → slots 250, 500, 750, 1000
    val obs = Seq(
      (1L, 7L, 100L, 10.0),
      (2L, 7L, 400L, 40.0),
      (3L, 7L, 400L, 41.0),   // same second, HIGHER id wins the dedup
      (4L, 7L, 1000L, 99.0),
      (5L, 9L, 50L, 5.0))     // span < step → no slots for key 9
      .toDF("id", "k", "sec", "v")
    val grid = graft.ops.TimeSeries.resampleGrid(obs, "k", "sec", "v", "id", 250L)
      .select(col("k"), col("grid_ts"), col("snap_sec"), col("snap_v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(grid.keySet == Set((7L, 250L), (7L, 500L), (7L, 750L), (7L, 1000L)))
    assert(grid((7L, 250L)) == ((100L, 10.0)))
    assert(grid((7L, 500L)) == ((400L, 41.0)), "tiebreak must pick the higher id at 400")
    assert(grid((7L, 750L)) == ((400L, 41.0)))
    assert(grid((7L, 1000L)) == ((1000L, 99.0)), "slot equal to an observation is inclusive")
  }

  test("TimeSeries.interpolateGrid: linear values between bracketing observations") {
    import spark.implicits._
    val obs = Seq(
      (1L, 7L, 100L, 10.0),
      (2L, 7L, 500L, 50.0),
      (3L, 7L, 1000L, 0.0),
      (4L, 9L, 0L, 1.0),
      (5L, 9L, 100L, 3.0))
      .toDF("id", "k", "sec", "v")
    val got = graft.ops.TimeSeries.interpolateGrid(obs, "k", "sec", "v", "id", 250L)
      .select(col("k"), col("grid_ts"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // key 7 slots: 250, 500, 750, 1000
    assert(math.abs(got((7L, 250L)) - (10.0 + 40.0 * 150.0 / 400.0)) < 1e-12)
    assert(got((7L, 500L)) == 50.0, "slot on an observation returns it exactly")
    assert(math.abs(got((7L, 750L)) - (50.0 - 50.0 * 250.0 / 500.0)) < 1e-12)
    assert(got((7L, 1000L)) == 0.0)
    // key 9 spans 0..100: only slot 0 (grid starts at ceil(0)=0)
    assert(got((9L, 0L)) == 1.0)
    assert(got.keySet == Set((7L, 250L), (7L, 500L), (7L, 750L), (7L, 1000L), (9L, 0L)))
  }

  test("TimeSeries.ewma: hand-computed recursion, null drop, partition invariance") {
    import spark.implicits._
    val rows = Seq(
      (1L, 7L, 100L, Some(10.0)),
      (2L, 7L, 200L, None), // dropped
      (3L, 7L, 300L, Some(20.0)),
      (4L, 7L, 400L, Some(0.0)),
      (5L, 9L, 100L, Some(4.0)))
      .toDF("id", "k", "sec", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.TimeSeries.ewma(df, "k", "sec", "id", "v", alpha = 0.5)
        .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val got = run(rows)
    assert(got == Map(1L -> 10.0, 3L -> 15.0, 4L -> 7.5, 5L -> 4.0))
    assert(run(rows.repartition(7)) == got, "partitioning must not change the recursion")
  }

  test("TimeSeries.trend: exact slope/intercept; degenerate keys null out") {
    import spark.implicits._
    val rows = Seq(
      (7L, 1000000L, 1.0), (7L, 1000010L, 2.0), (7L, 1000020L, 3.0), // slope 0.1/s
      (8L, 500L, 42.0),                    // single point → nulls
      (9L, 600L, 1.0), (9L, 600L, 5.0))    // zero x-variance → nulls
      .toDF("k", "sec", "v")
    val got = graft.ops.TimeSeries.trend(rows, "k", "sec", "v")
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      }.toMap
    assert(got(7L) == ((3L, 1000000L, Some(0.1), Some(1.0))),
      "fit of (0,1),(10,2),(20,3) is v = 1 + 0.1·xc")
    assert(got(8L) == ((1L, 500L, None, None)))
    assert(got(9L) == ((2L, 600L, None, None)))
  }

  test("AsOf.joinWithTolerance: fresh attaches, stale nulls whole, missing stays null") {
    import spark.implicits._
    val facts = Seq(
      (1L, 7L, 1000L),  // nearest snap at 990 (10s old) -> fresh at tol=60
      (2L, 7L, 5000L),  // nearest snap at 990 (4010s old) -> stale
      (3L, 9L, 1000L))  // no snapshot at all
      .toDF("fid", "k", "ft")
    val snaps = Seq((7L, 990L, 100L, "a"), (7L, 400L, 101L, "b"))
      .toDF("k", "st", "sid", "tag")
    val got = graft.ops.AsOf.joinWithTolerance(
        facts, snaps, "k", "ft", "st", Seq("sid", "tag"),
        toleranceSeconds = 60L, forward = false, tiebreak = Some("sid"))
      .collect().map { r =>
        r.getLong(0) -> ((
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getString(5))))
      }.toMap
    assert(got(1L) == ((Some(990L), Some(100L), Some("a"))))
    assert(got(2L) == ((None, None, None)), "stale match must null EVERY snap column")
    assert(got(3L) == ((None, None, None)))
    // forward direction: snapshot 10s ahead fresh, 4010s ahead stale
    val fwd = graft.ops.AsOf.joinWithTolerance(
        Seq((1L, 7L, 980L), (2L, 7L, 400L)).toDF("fid", "k", "ft"),
        Seq((7L, 990L, 100L, "a")).toDF("k", "st", "sid", "tag"),
        "k", "ft", "st", Seq("sid", "tag"),
        toleranceSeconds = 60L, forward = true, tiebreak = Some("sid"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(3)).toMap
    assert(!fwd(1L) && fwd(2L))
  }

  test("Profile.histogramEquiWidth: bucket math, top edge, constant column, empties") {
    import spark.implicits._
    val df = Seq(Some(0.0), Some(2.5), Some(5.0), Some(9.9), Some(10.0), None)
      .toDF("v")
    val got = graft.ops.Profile.histogramEquiWidth(df, "v", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // [0,10] in 4 buckets of 2.5: 0→b0, 2.5→b1, 5→b2, 9.9→b3, 10→b3 (top edge)
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
    val const = graft.ops.Profile.histogramEquiWidth(
      Seq(7.0, 7.0, 7.0).toDF("v"), "v", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(const == Map(0L -> 3L), "constant column lands whole in bucket 0")
    assert(graft.ops.Profile.histogramEquiWidth(df.limit(0), "v", 4).count() == 0)
    // a NaN is excluded like a NULL (it would otherwise poison max() and
    // silently dump every row in the last bucket)
    val withNan = graft.ops.Profile.histogramEquiWidth(
      (df.as[Option[Double]].collect().toSeq :+ Some(Double.NaN)).toDF("v"), "v", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(withNan == got, "NaN must not change the histogram")
  }

  test("Profile.gridQuantiles: mergeable counts, clamping, error bound vs exact") {
    val vals = (1 to 100).map(_.toDouble)
    val df = vals.toDF("v")
    // counts with explicit bounds merge by addition across arbitrary splits
    val whole = graft.ops.Profile.gridCounts(df, "v", 0.0, 100.0, 10)
      .as[(Long, Long)].collect().toMap
    val partA = graft.ops.Profile.gridCounts(df.filter(col("v") <= 37), "v", 0.0, 100.0, 10)
      .as[(Long, Long)].collect().toMap
    val partB = graft.ops.Profile.gridCounts(df.filter(col("v") > 37), "v", 0.0, 100.0, 10)
      .as[(Long, Long)].collect().toMap
    val merged = (partA.keySet ++ partB.keySet)
      .map(b => b -> (partA.getOrElse(b, 0L) + partB.getOrElse(b, 0L))).toMap
    assert(merged == whole, "fixed-grid counts must be additive")
    // out-of-range values clamp into edge buckets, never drop
    val clamped = graft.ops.Profile.gridCounts(
      Seq(-5.0, 0.5, 999.0).toDF("v"), "v", 0.0, 100.0, 10)
      .as[(Long, Long)].collect().toMap
    assert(clamped == Map(0L -> 2L, 9L -> 1L))
    // estimates: upper bucket edges, within one grid width of the truth
    val est = graft.ops.Profile.gridQuantiles(df, "v", 0.0, 100.0, 10,
      Seq(0.5, 0.9, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(3)).toMap
    // the 50th order statistic (50.0) lands in bucket 5 → upper edge 60;
    // the 90th (90.0) in bucket 9 (cum(b8)=89 < 90) → upper edge 100
    assert(est(0.5) == 60.0 && est(0.9) == 100.0 && est(1.0) == 100.0)
    val exact50 = 50.0
    assert(est(0.5) >= exact50 && est(0.5) - exact50 <= 10.0, "error bound: one width")
  }

  test("Profile.psi: zero on identical, large on shifted, clamps and empties") {
    import spark.implicits._
    val refD = (0 until 200).map(i => (i % 100).toDouble).toDF("v")
    val sameD = (0 until 400).map(i => (i % 100).toDouble).toDF("v")
    def psiOf(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) = {
      val r = graft.ops.Profile.psi(a, b, "v", 10).head()
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }
    val (nr, nc, same) = psiOf(refD, sameD)
    assert(nr == 200L && nc == 400L)
    assert(same.exists(math.abs(_) < 1e-4), s"identical shape must be ~0, got $same")
    // shifted: current values clamp into the top reference bucket
    val shifted = (0 until 200).map(_ => 500.0).toDF("v")
    val (_, _, drift) = psiOf(refD, shifted)
    assert(drift.exists(_ > 0.25), s"total shift must alarm, got $drift")
    assert(psiOf(refD, refD.limit(0))._3.isEmpty, "empty current -> NULL psi")
    assert(psiOf(refD.limit(0), refD)._3.isEmpty, "empty reference -> NULL psi")
    intercept[IllegalArgumentException] {
      // constant baseline: bucketing would report total drift as stable —
      // the monitor must refuse loudly, not reassure
      graft.ops.Profile.psi((0 until 50).map(_ => 7.0).toDF("v"), shifted, "v", 10).head()
    }
  }

  test("Hll: estimate within sketch error, linear-counting regime near-exact, registers merge") {
    import spark.implicits._
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
      .filter(col("event_id").isNotNull)
    val exact = events.select("event_id").distinct().count()
    val est = graft.ops.Hll.estimate(events, "event_id", p = 8)
      .select("est").as[Long].head()
    // m=256 → standard error 1.04/√256 = 6.5%; allow 3σ
    assert(math.abs(est - exact).toDouble / exact < 0.20,
      s"est $est vs exact $exact out of sketch error")
    // small-cardinality regime: linear counting is near-exact
    val small = (1L to 60L).toDF("v")
    val estSmall = graft.ops.Hll.estimate(small, "v", p = 8)
      .select("est").as[Long].head()
    assert(math.abs(estSmall - 60L) <= 3L, s"linear counting drifted: $estSmall")
    // merge law: registers(A ∪ B) ≡ merge(registers(A), registers(B)),
    // and the merged estimate equals the union's estimate exactly
    val a = events.filter(col("event_id") % 2 === 0)
    val b = events.filter(col("event_id") % 3 === 0) // overlaps a
    val direct = graft.ops.Hll.registers(a.unionByName(b), "event_id", p = 8)
      .as[(Long, Long)].collect().toSet
    val merged = graft.ops.Hll.mergeRegisters(
      graft.ops.Hll.registers(a, "event_id", p = 8),
      graft.ops.Hll.registers(b, "event_id", p = 8))
      .as[(Long, Long)].collect().toSet
    assert(direct == merged)
    // duplicated input never moves a register (insert idempotence)
    val doubled = graft.ops.Hll.registers(
      events.unionByName(events), "event_id", p = 8).as[(Long, Long)].collect().toSet
    val once = graft.ops.Hll.registers(events, "event_id", p = 8)
      .as[(Long, Long)].collect().toSet
    assert(doubled == once)
  }

  test("psiCategorical: zero on identical mix, alarms on class shift, cur-only class is drift") {
    import spark.implicits._
    val refC = ((0 until 80).map(_ => "en") ++ (0 until 20).map(_ => "de")).toDF("lang")
    val sameC = ((0 until 160).map(_ => "en") ++ (0 until 40).map(_ => "de")).toDF("lang")
    def psiOf(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) = {
      val r = graft.ops.Profile.psiCategorical(a, b, "lang").head()
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }
    val (nr, nc, same) = psiOf(refC, sameC)
    assert(nr == 100L && nc == 200L)
    assert(same.exists(math.abs(_) < 1e-4), s"identical mix must be ~0, got $same")
    val flipped = ((0 until 20).map(_ => "en") ++ (0 until 80).map(_ => "de")).toDF("lang")
    assert(psiOf(refC, flipped)._3.exists(_ > 0.25), "flipped mix must alarm")
    // a category absent from ref is legitimate drift, not an error
    val novel = (0 until 100).map(_ => "fr").toDF("lang")
    assert(psiOf(refC, novel)._3.exists(_ > 1.0), "novel class must alarm hard")
    assert(psiOf(refC, refC.limit(0))._3.isEmpty, "empty current -> NULL psi")
  }

  test("embeddingDrift: ~0 on a self-split, alarms when clusters empty out") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb
      .select(col("vec_id").cast("long").as("cell"),
        col("embedding").cast("array<double>").as("cv"),
        md5(col("vec_id").cast("string")).as("_h"))
      .orderBy("_h").limit(8).select("cell", "cv")
    val ref = emb.filter(col("vec_id") % 2 === 0)
    val cur = emb.filter(col("vec_id") % 2 === 1)
    val r = graft.ops.Profile.embeddingDrift(ref, cur, "embedding", cents).head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(math.abs(r.getDouble(2)) < 0.2,
      s"random halves of one corpus must read stable, got ${r.getDouble(2)}")
    // restrict cur to ONE cluster: membership mix collapses -> alarm
    val idx = graft.ops.IvfIndex.build(emb, "vec_id", "embedding", nCells = 8)
    val oneCell = emb.join(
      idx.assignments.groupBy("cell").count().orderBy(desc("count")).limit(1)
        .join(idx.assignments, "cell").select("vec_id"), "vec_id")
    val d = graft.ops.Profile.embeddingDrift(emb, oneCell, "embedding", cents).head()
    assert(d.getDouble(2) > 0.5, s"collapsed membership must alarm, got ${d.getDouble(2)}")
  }

  test("charEntropy: analytic values, padding extreme, empty/null spine rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"),           // one symbol: H = 0
      (2L, "ab"),             // two equiprobable: H = ln 2
      (3L, "abcd"),           // four equiprobable: H = ln 4
      (4L, "aaaaaaaab"),      // skewed: H = -(8/9)ln(8/9) - (1/9)ln(1/9)
      (5L, ""),
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((4L, 0.0)))
    assert(math.abs(got(2L)._2 - math.log(2)) < 1e-6)
    assert(math.abs(got(3L)._2 - math.log(4)) < 1e-6)
    val h4 = -(8.0 / 9) * math.log(8.0 / 9) - (1.0 / 9) * math.log(1.0 / 9)
    assert(got(4L)._1 == 9L && math.abs(got(4L)._2 - h4) < 1e-6)
    assert(got(5L) == ((0L, 0.0)) && got(6L) == ((0L, 0.0)),
      "empty and null docs must surface as zero rows, not vanish")
    assert(got(4L)._2 < got(3L)._2, "padding-skewed text reads lower entropy")
  }

  test("normalizeText: NFC/NFKC goldens, accent strip, lower, null, codegen parity") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cafe\u0301"),        // decomposed e + combining acute -> composes
      (2L, "\uFB01ne \u00BD"),   // fi ligature + vulgar half: NFC keeps, NFKC expands
      (3L, "A\u0308 \u00C5"),    // A + combining diaeresis, precomposed A-ring
      (4L, "\u00F8 stra\u00DFe"),// o-slash and sharp-s: accent strip must NOT touch them
      (5L, null.asInstanceOf[String]))
      .toDF("id", "t")
    def run(form: String, strip: Boolean = false, lower: Boolean = false) =
      docs.select(col("id"),
          graft.ops.TextAnalysis.normalizeText(col("t"), form, strip, lower).as("n"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getString(1))).toMap
    val nfc = run("NFC")
    assert(nfc(1L) == "caf\u00E9")
    assert(nfc(2L) == "\uFB01ne \u00BD", "NFC keeps compatibility chars")
    assert(nfc(3L) == "\u00C4 \u00C5")
    assert(nfc(5L) == null)
    val nfkc = run("NFKC")
    assert(nfkc(2L) == "fine 1\u20442", "NFKC expands the ligature and the fraction")
    val stripped = run("NFC", strip = true)
    assert(stripped(1L) == "cafe" && stripped(3L) == "A A")
    assert(stripped(4L) == "\u00F8 stra\u00DFe", "\u00F8/\u00DF carry no combining marks")
    val lowered = run("NFKC", strip = true, lower = true)
    assert(lowered(2L) == "fine 1\u20442" && lowered(3L) == "a a")
    // codegen and interpreted paths must agree (the SequenceRatio contract)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run("NFKC", strip = true, lower = true) == lowered)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("Profile.describe: exact per-column stats from ONE scan, nulls counted") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), 10L), (2L, Some("b"), 10L),
      (3L, None, 30L), (4L, Some("a"), 40L))
      .toDF("id", "tag", "v")
    val got = graft.ops.Profile.describe(df, Seq("id", "tag", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("tag") == ((4L, 1L, 2L, "a", "b")))
    assert(got("v") == ((4L, 0L, 3L, "10", "40")))
    // the whole report is one aggregate over one scan — no per-column jobs
    val plan = graft.ops.Profile.describe(df, Seq("id", "tag", "v"))
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan|Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"profile must read the table once, found $scans scans:\n$plan")
  }

  test("scriptProfile: per-block counts, dominance, ties by declared order, und fallback") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world"),                    // latin 10
      (2L, "привет мир"),                     // cyrillic 9
      (3L, "hello привет"),                   // 5 latin vs 6 cyrillic → cyrillic
      (4L, "αβγ אבג"),                        // greek 3, hebrew 3 → tie → greek (declared order)
      (5L, "日本語 と かな"),                  // cjk 3, kana 3 → tie → cjk
      (6L, "1234 !?"),                        // no scripted chars → und
      (7L, null.asInstanceOf[String]))        // null → und, zero counts
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.scriptProfile(docs, "doc_id", "text")
      .collect().map { r =>
        r.getLong(0) -> (r.getString(r.length - 1),
          graft.ops.TextAnalysis.ScriptRanges.zipWithIndex
            .map { case ((n, _), i) => n -> r.getLong(i + 1) }.toMap)
      }.toMap
    assert(got(1L)._1 == "latin" && got(1L)._2("latin") == 10L)
    assert(got(2L)._1 == "cyrillic" && got(2L)._2("cyrillic") == 9L)
    assert(got(3L)._1 == "cyrillic" && got(3L)._2("latin") == 5L && got(3L)._2("cyrillic") == 6L)
    assert(got(4L)._1 == "greek", "ties must break by ScriptRanges order")
    assert(got(4L)._2("greek") == 3L && got(4L)._2("hebrew") == 3L)
    assert(got(5L)._1 == "cjk" && got(5L)._2("cjk") == 3L && got(5L)._2("kana") == 3L)
    assert(got(6L)._1 == "und" && got(6L)._2.values.sum == 0L)
    assert(got(7L)._1 == "und" && got(7L)._2.values.sum == 0L)
  }

  test("editDistancePairs: banded candidates == naive theta join, exactly once, known values") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "kitten"), (2L, "sitting"),       // the classic dist-3 pair
      (3L, "red bolt"), (4L, "red bolts"),   // dist 1
      (5L, "Red  Bolt"), (6L, "zzzzzzzzzzzzzz"), // normalization; an outlier
      (7L, "a"), (8L, ""), (9L, "ab"))       // short/empty edges
      .toDF("id", "name")
    val got = graft.ops.Dedup.editDistancePairs(fixture, "id", "name", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 2L)) == 3L)
    assert(got((3L, 4L)) == 1L)
    assert(got((7L, 8L)) == 1L && got((7L, 9L)) == 1L && got((8L, 9L)) == 2L)
    assert(!got.keySet.exists(p => p._1 == 6L || p._2 == 6L), "outlier pairs with nothing")
    // "Red  Bolt" normalizes to "red  bolt": one extra space -> dist 1 to "red bolt"
    assert(got((3L, 5L)) == 1L)

    // randomized completeness + exactly-once vs the naive theta join
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    val rows = (1 to 120).map(i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(7))(alphabet(rnd.nextInt(3))).mkString))
    val df = rows.toDF("id", "name").repartition(5)
    val banded = graft.ops.Dedup.editDistancePairs(df, "id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(banded.length == banded.distinct.length, "a pair must be emitted exactly once")
    val naive = {
      val a = df.select(col("id").as("ia"), trim(lower(col("name"))).as("sa"))
      val bb = df.select(col("id").as("ib"), trim(lower(col("name"))).as("sb"))
      a.crossJoin(bb).filter(col("ia") < col("ib"))
        .select(col("ia"), col("ib"), levenshtein(col("sa"), col("sb")).cast("long").as("d"))
        .filter(col("d") <= 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(banded.toSet == naive, "length banding must lose no pair and add none")

    // the plan is a keyed band join, never a cartesian
    val plan = graft.ops.Dedup.editDistancePairs(df, "id", "name", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"edit-distance join must stay keyed:\n$plan")
  }

  test("seqRatioPairs: banded == naive cross for BOTH sims; difflib values; never a cartesian") {
    import spark.implicits._
    // difflib goldens: ratio("kitten","sitting") = 2*4/13; ("abcd","bcde") = 2*3/8
    val fixture = Seq((1L, "kitten"), (2L, "sitting"), (3L, "abcd"), (4L, "bcde"),
      (5L, "zzzzzzzzzzzzzzzzzz"), (6L, "a"), (7L, ""))
      .toDF("id", "name")
    val got = graft.ops.Dedup.seqRatioPairs(fixture, "id", "name", threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(got((1L, 2L)) - 8.0 / 13.0) < 1e-12)
    assert(math.abs(got((3L, 4L)) - 6.0 / 8.0) < 1e-12)
    assert(!got.keySet.exists(p => p._1 >= 5L),
      "the outlier, the 1-char and the empty string pair with nothing at 0.6")

    // randomized completeness + exactly-once vs the naive cross, both sims
    val rnd = new scala.util.Random(13)
    val alphabet = "abc"
    val rows = (1 to 120).map(i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(7))(alphabet(rnd.nextInt(3))).mkString))
    val df = rows.toDF("id", "name").repartition(5)
    for (sim <- Seq("seq_ratio", "lev_ratio")) {
      val banded = graft.ops.Dedup.seqRatioPairs(df, "id", "name", 0.7, sim)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(banded.length == banded.distinct.length,
        s"$sim: a pair must be emitted exactly once")
      val a = df.select(col("id").as("ia"), trim(lower(col("name"))).as("sa"))
      val bb = df.select(col("id").as("ib"), trim(lower(col("name"))).as("sb"))
      val simCol =
        if (sim == "seq_ratio") graft.Functions.seqRatio(col("sa"), col("sb"))
        else graft.Functions.levRatio(col("sa"), col("sb"))
      val naive = a.crossJoin(bb).filter(col("ia") < col("ib"))
        .select(col("ia"), col("ib"), simCol.as("r"))
        .filter(col("r") >= 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(banded.toSet == naive,
        s"$sim: length banding must lose no pair and add none")
    }

    // plan pin: keyed band join, never a cartesian
    val plan = graft.ops.Dedup.seqRatioPairs(df, "id", "name", 0.7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"ratio join must stay keyed:\n$plan")
    // the degenerate threshold is refused, not silently crossed
    val e = intercept[IllegalArgumentException](
      graft.ops.Dedup.seqRatioPairs(df, "id", "name", 0.0))
    assert(e.getMessage.contains("threshold"))
  }

  test("seqRatioPairsLong: ≡ seqRatioPairs on every fixture; O(1) band rows; keyed plan") {
    import spark.implicits._
    // the short-string fixtures seqRatioPairs is pinned against...
    val rnd = new scala.util.Random(29)
    val shorts = (1 to 120).map(i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(7))("abc"(rnd.nextInt(3))).mkString))
    // ...plus document-grain strings: shared prefixes with small edits,
    // lengths straddling bucket boundaries, an empty and a 1-char string
    val base = "lorem ipsum dolor sit amet " * 40 // ~1080 chars
    val longs = Seq(
      (201L, base), (202L, base + "tail"), (203L, base.drop(17)),
      (204L, base.take(600)), (205L, base.take(600) + base.take(9)),
      (206L, ("z" * 300) + base.take(300)), (207L, ""), (208L, "a"))
    for ((df, t) <- Seq(
        (shorts.toDF("id", "name").repartition(5), 0.7),
        (longs.toDF("id", "name").toDF(), 0.9),
        (longs.toDF("id", "name").toDF(), 0.62))) {
      for (sim <- Seq("seq_ratio", "lev_ratio")) {
        def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        val perLen = graft.ops.Dedup.seqRatioPairs(df, "id", "name", t, sim)
          .collect().map(key).toSet
        val geo = graft.ops.Dedup.seqRatioPairsLong(df, "id", "name", t, sim)
          .collect().map(key)
        assert(geo.length == geo.distinct.length, s"$sim@$t: exactly-once")
        assert(geo.toSet == perLen,
          s"$sim@$t: geometric bucketing must equal per-length banding")
      }
    }
    // the whole point: band rows are 2/string regardless of length (vs
    // ≈(1−frac)·len for per-length bands — ~460 rows/string here)
    val docs = longs.toDF("id", "name")
    val geoPlan = graft.ops.Dedup.seqRatioPairsLong(docs, "id", "name", 0.7)
      .queryExecution.executedPlan.toString
    assert(!geoPlan.contains("CartesianProduct") &&
      !geoPlan.contains("BroadcastNestedLoopJoin"),
      s"geometric ratio join must stay keyed:\n$geoPlan")
    val e = intercept[IllegalArgumentException](
      graft.ops.Dedup.seqRatioPairsLong(docs, "id", "name", 0.0))
    assert(e.getMessage.contains("threshold"))
  }

  test("tfidfCosinePairs: exact quantized cosine, stopword cap, partition invariance") {
    import spark.implicits._
    // every doc carries the stopword 'the'; discrimination lives in the
    // rare terms. d1/d2 share {alpha, beta}; d3 shares nothing rare.
    val docs = Seq(
      (1L, "the alpha beta gamma"),
      (2L, "the alpha beta delta"),
      (3L, "the zeta eta theta"),
      (4L, "the alpha alpha beta gamma")) // d1 with doubled alpha
      .toDF("doc_id", "text")
    val n = 4L

    // local mirror of the quantized measure (df-capped vocabulary)
    def wq(tf: Long, df: Long): Long =
      math.floor(tf * math.log(n.toDouble / df) * 1e6 + 0.5).toLong
    // dfs over the rare terms: alpha 3, beta 3, gamma 2, delta 1, zeta/eta/theta 1
    def cos(a: Map[String, Long], b: Map[String, Long], df: Map[String, Long]): Double = {
      val wa = a.map { case (t, tf) => t -> wq(tf, df(t)) }
      val wb = b.map { case (t, tf) => t -> wq(tf, df(t)) }
      val dot = wa.keySet.intersect(wb.keySet).toSeq.map(t => wa(t) * wb(t)).sum.toDouble
      val na = math.sqrt(wa.values.map(x => x * x).sum.toDouble)
      val nb = math.sqrt(wb.values.map(x => x * x).sum.toDouble)
      math.floor(dot / (na * nb) * 1e4 + 0.5) / 1e4
    }
    val df = Map("alpha" -> 3L, "beta" -> 3L, "gamma" -> 2L, "delta" -> 1L,
      "zeta" -> 1L, "eta" -> 1L, "theta" -> 1L)
    val d1 = Map("alpha" -> 1L, "beta" -> 1L, "gamma" -> 1L)
    val d2 = Map("alpha" -> 1L, "beta" -> 1L, "delta" -> 1L)
    val d4 = Map("alpha" -> 2L, "beta" -> 1L, "gamma" -> 1L)

    // cap at df<=3 excludes only 'the' (df 4)
    val got = graft.ops.TextAnalysis.tfidfCosinePairs(
        docs, "doc_id", "text", totalDocs = n, threshold = 0.01, maxDocFreq = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 2L)) == cos(d1, d2, df))
    assert(got((1L, 4L)) == cos(d1, d4, df))
    assert(!got.contains((1L, 3L)), "docs sharing only the capped stopword must not pair")
    assert(!got.contains((2L, 3L)))
    assert(got((1L, 4L)) > got((1L, 2L)), "near-duplicate outranks partial overlap")

    // without the cap, 'the' (idf ln(1) = 0 → weight 0) still cannot rank
    // anything: zero-weight pairs surface with cosine 0 and fall to threshold
    val uncapped = graft.ops.TextAnalysis.tfidfCosinePairs(
        docs, "doc_id", "text", totalDocs = n, threshold = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(!uncapped.contains((1L, 3L)), "an every-doc token carries zero idf weight")
    assert(uncapped((1L, 2L)) == got((1L, 2L)))

    // bit-identical under repartitioning (integer-exact sums)
    val one = graft.ops.TextAnalysis.tfidfCosinePairs(
        docs.repartition(1), "doc_id", "text", n, 0.01, 3L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val seven = graft.ops.TextAnalysis.tfidfCosinePairs(
        docs.repartition(7), "doc_id", "text", n, 0.01, 3L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(one == seven)
  }

  test("Publish.firstSeenCounter numbers by first appearance and resets daily") {
    val rows = Seq(
      (ts("2020-01-01 08:00:00"), "u2"),
      (ts("2020-01-01 09:00:00"), "u1"),
      (ts("2020-01-01 10:00:00"), "u2"), // repeat → same number
      (ts("2020-01-02 01:00:00"), "u1")) // next day → counter resets
      .toDF("t", "u")
    val got = Publish.firstSeenCounter(rows, "t", "u")
      .select(col("day").cast("string"), col("u"), col("daily_counter"))
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(("2020-01-01", "u2", 1), ("2020-01-01", "u1", 2), ("2020-01-02", "u1", 1)))
  }

  test("firstSeenCounter two-level rank equals a day-wide dense_rank on random data") {
    // randomized equivalence: the bucketed implementation must match the
    // naive single-partition formulation for arbitrary timestamps/keys,
    // at several bucket granularities (including bucket boundaries hit by
    // construction: timestamps cluster at hour edges)
    val rnd = new scala.util.Random(20260812)
    val rows = (1 to 2000).map { _ =>
      val day = 1 + rnd.nextInt(3)
      val sec = if (rnd.nextBoolean()) rnd.nextInt(86400) else rnd.nextInt(24) * 3600
      (java.sql.Timestamp.valueOf(f"2020-01-0$day 00:00:00").toInstant
        .plusSeconds(sec).toString.replace("T", " ").replace("Z", ""),
        s"u${rnd.nextInt(120)}")
    }.map { case (t, u) => (java.sql.Timestamp.valueOf(t), u) }
      .toDF("t", "u")

    val naive = {
      val fs = rows.groupBy(to_date(col("t")).as("day"), col("u"))
        .agg(min(col("t")).as("first_seen"))
      fs.withColumn("daily_counter",
        dense_rank().over(org.apache.spark.sql.expressions.Window
          .partitionBy("day").orderBy(col("first_seen"), col("u"))))
        .select(col("day").cast("string"), col("u"), col("daily_counter"))
        .as[(String, String, Int)].collect().toSet
    }
    Seq(1, 24, 1440).foreach { buckets =>
      val got = Publish.firstSeenCounter(rows, "t", "u", bucketsPerDay = buckets)
        .select(col("day").cast("string"), col("u"), col("daily_counter"))
        .as[(String, String, Int)].collect().toSet
      assert(got == naive, s"mismatch at bucketsPerDay=$buckets")
    }
  }

  test("gopherRules: each published rule trips on its own fixture") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    val longOk = (1 to 60).map(i => s"the of and that word$i").mkString(" ") // 300 words, stopwords
    val docs = Seq(
      (0L, longOk),                                       // passes every rule
      (1L, "too short to keep with the rest"),            // word count < 50
      (2L, (1 to 60).map(_ => "# the of #").mkString(" ")), // symbol ratio > 0.1
      (3L, (1 to 60).map(i => s"• the of item$i\n").mkString), // all lines bulleted
      (4L, (1 to 60).map(i => s"the of trail$i...\n").mkString), // all lines ellipsis
      (5L, (1 to 30).map(_ => "the of 123 456 789 000").mkString(" ")), // alpha < 0.8
      (6L, (1 to 60).map(i => s"zz$i yy$i xx$i ww$i").mkString(" ")) // no stopwords
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(8)).toMap
    assert(got(0L), "the clean long document must pass")
    Seq(1L, 2L, 3L, 4L, 5L, 6L).foreach(id => assert(!got(id), s"doc $id must fail"))
    // and the failing docs fail for the RIGHT rule
    val rows = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(1) < 50)
    assert(rows(2L).getDouble(3) > 0.1, "symbol_ratio")
    assert(rows(3L).getDouble(4) > 0.9, "bullet_ratio")
    assert(rows(4L).getDouble(5) > 0.3, "ellipsis_ratio")
    assert(rows(5L).getDouble(6) < 0.8, "alpha_ratio")
    assert(rows(6L).getLong(7) < 2, "stop_hits")
    // zero shuffle: a per-row projection must stay exchange-free
    val plan = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("perplexityBuckets: per-language terciles; approx twin agrees off-cutoff") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    // two languages, six docs each, distinct perplexities
    val scored = (0 until 6).map(i => (i.toLong, "en", 10.0 + i)) ++
      (10 until 16).map(i => (i.toLong, "de", 100.0 - i))
    val df = scored.toDF("doc_id", "lang", "ppl")
    val exact = TextAnalysis.perplexityBuckets(df, "doc_id", "lang", "ppl")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // en ascending by ppl: 0,1 head; 2,3 middle; 4,5 tail
    assert(exact(0L) === "head" && exact(1L) === "head")
    assert(exact(2L) === "middle" && exact(3L) === "middle")
    assert(exact(4L) === "tail" && exact(5L) === "tail")
    // de ppl DESCENDS with id: 15,14 head … 11,10 tail
    assert(exact(15L) === "head" && exact(10L) === "tail")
    val approx = TextAnalysis.perplexityBucketsApprox(df, "doc_id", "lang", "ppl")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(approx === exact, "with distinct values and n % 3 == 0 the twins agree")
    // null perplexity sinks to tail in both forms AND does not consume a
    // tercile slot: the en terciles must be unchanged by the null row
    val withNull = df.unionByName(Seq((99L, "en", null.asInstanceOf[java.lang.Double]))
      .toDF("doc_id", "lang", "ppl"))
    val exactN = TextAnalysis.perplexityBuckets(withNull, "doc_id", "lang", "ppl")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(exactN(99L) === "tail")
    assert(exactN.filterKeys(_ != 99L).toMap === exact, "null must not shift real terciles")
    assert(TextAnalysis.perplexityBucketsApprox(withNull, "doc_id", "lang", "ppl")
      .filter(col("doc_id") === 99L).head().getString(3) === "tail")
    // a NULL language is a real group (undetected language): both forms
    // tercile it rather than defaulting it to tail
    val nullLang = (20 until 26).map(i => (i.toLong, null.asInstanceOf[String], 5.0 + i))
      .toDF("doc_id", "lang", "ppl")
    val ex = TextAnalysis.perplexityBuckets(nullLang, "doc_id", "lang", "ppl")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val ap = TextAnalysis.perplexityBucketsApprox(nullLang, "doc_id", "lang", "ppl")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(ex === ap)
    assert(ex(20L) === "head" && ex(25L) === "tail")
  }

  test("c4Clean: line gate + page gates behave per the published rules") {
    import spark.implicits._
    import graft.ops.TextAnalysis
    val docs = Seq(
      (0L, "A good first sentence here.\nShort one.\nAnother full sentence follows!\nno terminal punctuation line\nAnd a questioning sentence, truly?"),
      (1L, "Contains lorem ipsum filler text.\nSecond sentence is fine.\nThird sentence stands here."),
      (2L, "Code page with braces.\nfunction f() { return 1 }\nMore prose sentences here.\nEven more prose right here."),
      (3L, "Only one surviving sentence here.\nnope\nnah")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.c4Clean(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    // doc 0: "Short one." has 2 words (< 3) and the bare line has no
    // terminal punctuation — both drop; 3 sentences survive → keep
    val (clean0, kept0, total0, sent0, keep0) = got(0L)
    assert(kept0 === 3L && total0 === 5L && sent0 === 3L && keep0)
    assert(!clean0.contains("Short one") && !clean0.contains("no terminal"))
    // doc 1: three clean sentences but the lorem-ipsum page gate trips
    assert(got(1L)._2 === 3L && !got(1L)._5)
    // doc 2: curly brace page gate
    assert(!got(2L)._5)
    // doc 3: only one sentence survives (< 3)
    assert(got(3L)._2 === 1L && !got(3L)._5)
  }

  test("langSegments: polyglot docs split into contiguous same-language runs") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      // en ×2, fr ×1, blank (und), de ×1 → 4 segments
      (0L, "the cat and the dog\nof all the things\nle chat est les une\n\nder hund und das ein"),
      // single-language doc → one segment
      (1L, "the a and of to\nthe cat of a dog"),
      // empty text → one empty und line
      (2L, ""),
      // NULL text → no rows
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val segs = TextAnalysis.langSegments(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap

    assert(segs.keys.count(_._1 == 0L) == 4)
    assert(segs((0L, 0L)) == (("en", 0L, 1L, 2L, 36L)))
    assert(segs((0L, 1L))._1 == "fr" && segs((0L, 1L))._2 == 2L && segs((0L, 1L))._3 == 2L)
    assert(segs((0L, 2L)) == (("und", 3L, 3L, 1L, 0L)), "blank line is its own und segment")
    assert(segs((0L, 3L))._1 == "de" && segs((0L, 3L))._3 == 4L)
    assert(segs.keys.count(_._1 == 1L) == 1 && segs((1L, 0L))._1 == "en")
    assert(segs((2L, 0L)) == (("und", 0L, 0L, 1L, 0L)))
    assert(!segs.keys.exists(_._1 == 3L), "NULL text emits nothing")

    // partitioning invariance: 1 partition ≡ default
    val one = TextAnalysis.langSegments(docs.repartition(1), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(one == segs.map { case ((d, s), (l, a, b, n, c)) =>
      Seq[Any](d, s, l, a, b, n, c) }.toSet)
  }
}
