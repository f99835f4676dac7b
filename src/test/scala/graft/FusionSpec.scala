package graft

import org.apache.spark.sql.functions._

import graft.ops.{Fusion, TextAnalysis}

/** RRF fusion and PMI collocations: hand-computable fixtures. */
class FusionSpec extends SparkSpec {

  import spark.implicits._

  test("rrf: ranks fuse reciprocally; ids missing from one list still score") {
    val lex = Seq((1L, 10.0), (2L, 9.0), (3L, 8.0)).toDF("id", "s1")
    val sem = Seq((2L, 0.9), (4L, 0.8)).toDF("id", "s2")
    val out = Fusion.rrf(Seq((lex, "s1"), (sem, "s2")), "id",
      kRrf = 60, perListTopN = 10, topK = 10)
      .as[(Long, Double, Long)].collect().toSeq
    val m = out.map(r => r._1 -> ((r._2, r._3))).toMap
    def rr(r: Int) = 1.0 / (60.0 + r)
    def round9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    assert(m(2L) == ((round9(rr(2) + rr(1)), 2L)), "rank 2 lexical + rank 1 semantic")
    assert(m(1L) == ((round9(rr(1)), 1L)))
    assert(m(4L) == ((round9(rr(2)), 1L)))
    // fused order: 2 (two lists) first, then 1, then 3/4 (rank-3 lex vs rank-2 sem)
    assert(out.map(_._1) == Seq(2L, 1L, 4L, 3L), s"got ${out.map(_._1)}")
  }

  test("rrf: perListTopN truncates before ranking; topK truncates after") {
    val lex = (1 to 10).map(i => (i.toLong, 100.0 - i)).toDF("id", "s")
    val out = Fusion.rrf(Seq((lex, "s")), "id", kRrf = 60, perListTopN = 3, topK = 2)
      .as[(Long, Double, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L), "only the top-3 ranked, top-2 returned")
  }

  test("rrf: score ties break on ascending id in rank AND output order") {
    val lex = Seq((5L, 1.0), (3L, 1.0), (4L, 1.0)).toDF("id", "s")
    val out = Fusion.rrf(Seq((lex, "s")), "id", kRrf = 60, perListTopN = 10, topK = 3)
      .as[(Long, Double, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(3L, 4L, 5L))
  }

  test("pmi: collocated pair scores ln(c2*N1²/(N2*c1*c1'))") {
    // "x y" always adjacent; "a"/"b" never adjacent to each other
    val docs = Seq(
      (1L, "x y a"), (2L, "x y b"), (3L, "a x y"), (4L, "b x y"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "doc_id", "text", minCount = 4L)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out.map(p => (p._1, p._2)).toSet == Set(("x", "y")),
      s"only the 4-count pair survives minCount=4, got $out")
    val (_, _, c, pmi) = out.head
    assert(c == 4L)
    // N2 = 8 bigrams, N1 = 12 tokens, c(x)=c(y)=4
    val expected = math.floor(
      math.log(4.0 * 12.0 * 12.0 / (8.0 * 4.0 * 4.0)) * 1e6 + 0.5) / 1e6
    assert(pmi == expected, s"got $pmi, want $expected")
  }

  test("pmi: pairs below minCount never reach the joins") {
    val docs = Seq((1L, "p q"), (2L, "p q"), (3L, "r s")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "doc_id", "text", minCount = 2L)
      .select("w1", "w2").as[(String, String)].collect().toSet
    assert(out == Set(("p", "q")))
  }

  test("ppmi: window-2 pairs are unordered, counted once per occurrence, 0-floored") {
    // "a b a b": window 2 pairs → (a,b)×3 [pos12, 23, 34], (a,a)×1, (b,b)×1
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val out = TextAnalysis.ppmiCooccurrence(docs, "doc_id", "text",
      window = 2, minCount = 1L)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out.keySet == Set(("a", "b"), ("a", "a"), ("b", "b")), s"got $out")
    assert(out(("a", "b"))._1 == 3L && out(("a", "a"))._1 == 1L)
    // N2 = 5, N1 = 4, c(a) = c(b) = 2
    def ppmi(c2: Long) = math.max(0.0,
      math.log(c2.toDouble * 4.0 * 4.0 / (5.0 * 2.0 * 2.0)))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out(("a", "b"))._2 == r6(ppmi(3)), s"got ${out(("a", "b"))._2}")
    assert(out(("a", "a"))._2 == r6(ppmi(1)) && out(("a", "a"))._2 == 0.0,
      "ln(16/20) < 0 floors to 0")
  }

  test("snippets: densest window wins, earliest on ties, short docs whole") {
    val docs = Seq(
      // hits at 0, 7, 8 → windows starting at 6 and 7 both hold two
      // hits; earliest max window is index 6 ("f scan join")
      (1L, "scan a b c d e f scan join g"),
      (2L, "no hits anywhere at all"),
      (3L, "tiny scan")).toDF("doc_id", "text")
    val out = TextAnalysis.snippets(docs, "doc_id", "text",
      Seq("scan", "join"), windowTokens = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((6L, 2L, "f scan join")), s"got ${out(1L)}")
    assert(out(2L) == ((0L, 0L, "no hits anywhere")), s"got ${out(2L)}")
    assert(out(3L) == ((0L, 1L, "tiny scan")), s"short doc returns whole: ${out(3L)}")
  }

  test("domainReweight: lagging domain up-weights; weights sum to ~1") {
    val docs = Seq(
      ("en", 3.0, 2.0), ("en", 3.0, 2.0), // excess +1
      ("de", 2.0, 2.0), ("de", 2.0, 2.0), // excess 0
      ("fr", 1.0, 2.0)) // excess -1
      .toDF("lang", "cur", "ref")
    val out = graft.ops.Sampling.domainReweight(docs, "lang", "cur", "ref", eta = 1.0)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("en")._2 == 1.0 && out("de")._2 == 0.0 && out("fr")._2 == -1.0)
    assert(out("en")._3 > out("de")._3 && out("de")._3 > out("fr")._3)
    val total = out.values.map(_._3).sum
    assert(math.abs(total - 1.0) < 1e-6, s"weights must normalize, got $total")
    // e / (e + 1 + 1/e) etc — check the en weight analytically at 9dp
    val u9 = (x: Double) => math.floor(math.exp(x) * 1e9 + 0.5)
    val expectedEn = math.floor(
      u9(1.0) / (u9(1.0) + u9(0.0) + u9(-1.0)) * 1e9 + 0.5) / 1e9
    assert(out("en")._3 == expectedEn, s"got ${out("en")._3}, want $expectedEn")
  }

  test("expandQuery: feedback-doc terms rank by exact pico tf/dl, query terms excluded") {
    val docs = Seq(
      (1L, "q a a b"), (2L, "q a c"), (3L, "z z z z"), (4L, "y"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.expandQuery(docs, "doc_id", "text",
      queryTokens = Seq("q"), totalDocs = 4L, fbDocs = 2, fbTerms = 2)
      .as[(String, Long, Long)].collect().toSeq
    // feedback docs are 1 and 2 (the only q-carriers); a = 2/4 + 1/3,
    // c = 1/3, b = 1/4 — in exact pico units
    assert(out == Seq(
      ("a", 500000000000L + 333333333333L, 1L),
      ("c", 333333333333L, 2L)), s"got $out")
  }

  test("domainReweight: base weights multiply in; null losses drop") {
    val docs = Seq(
      ("a", Some(1.0), Some(1.0)), ("b", Some(1.0), Some(1.0)),
      ("b", None, Some(1.0))) // dropped row
      .toDF("lang", "cur", "ref")
    val out = graft.ops.Sampling
      .domainReweight(docs, "lang", "cur", "ref", baseWeights = Map("a" -> 3.0))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    assert(out("a")._1 == 1L && out("b")._1 == 1L, "null-loss row must drop")
    assert(math.abs(out("a")._2 - 0.75) < 1e-9 && math.abs(out("b")._2 - 0.25) < 1e-9,
      s"equal excess ⇒ base ratio 3:1, got $out")
  }
}
