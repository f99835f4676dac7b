package graft

import graft.ops.RankEval

/** Retrieval-metric semantics: graded NDCG, rank derivation, unjudged-as-0,
  * and the NULL conventions for undefined recall/NDCG.
  */
class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Double)]) =
    rows.toDF("qid", "doc", "score")
  private def rels(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("qid", "doc", "rel")

  test("metricsAtK: perfect ranking scores ndcg 1, reversed ranking less") {
    val qrels = rels(Seq((1L, 10L, 2L), (1L, 11L, 1L)))
    val perfect = RankEval.metricsAtK(
      run(Seq((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.1))),
      "qid", "doc", "score", qrels, "qid", "doc", "rel", k = 3).head()
    assert(perfect.getAs[Double]("ndcg") == 1.0)
    assert(perfect.getAs[Long]("n_hits") == 2L && perfect.getAs[Long]("n_rel") == 2L)
    assert(perfect.getAs[Double]("rr") == 1.0)
    assert(perfect.getAs[Double]("recall") == 1.0)
    val reversed = RankEval.metricsAtK(
      run(Seq((1L, 10L, 0.1), (1L, 11L, 0.8), (1L, 12L, 0.9))),
      "qid", "doc", "score", qrels, "qid", "doc", "rel", k = 3).head()
    assert(reversed.getAs[Double]("ndcg") < 1.0)
    assert(reversed.getAs[Double]("rr") == 0.5, "first relevant at rank 2")
    // hand value: DCG = 1/log2(3) + 2/log2(4) = 0.630930 + 1.0; IDCG =
    // 2/log2(2) + 1/log2(3) = 2.630930 (nano-quantized per term)
    assert(math.abs(reversed.getAs[Double]("dcg") - 1.630930) < 1e-6)
    assert(math.abs(reversed.getAs[Double]("idcg") - 2.630930) < 1e-6)
  }

  test("metricsAtK: cutoff excludes late hits, unjudged docs count 0, no-rel query is NULL") {
    val qrels = rels(Seq((1L, 12L, 1L), (2L, 99L, 1L)))
    val got = RankEval.metricsAtK(
      run(Seq(
        (1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.1),   // hit ranked 3rd
        (2L, 10L, 0.9))),                                 // judged set disjoint
      "qid", "doc", "score", qrels, "qid", "doc", "rel", k = 2)
      .collect().map(r => r.getAs[Long]("query") -> r).toMap
    val q1 = got(1L)
    assert(q1.getAs[Long]("n_hits") == 0L, "relevant doc ranked below the cutoff")
    assert(q1.getAs[Double]("rr") == 0.0)
    assert(q1.getAs[Double]("recall") == 0.0, "n_rel counts ALL judged-relevant docs")
    assert(q1.isNullAt(q1.fieldIndex("ndcg")) == false && q1.getAs[Double]("ndcg") == 0.0,
      "judged query with idcg > 0 gets ndcg 0, not NULL")
    val q2 = got(2L)
    assert(q2.getAs[Long]("n_rel") == 1L && q2.getAs[Long]("n_hits") == 0L)
    // a query with NO judged-relevant docs at all: recall and ndcg NULL
    val none = RankEval.metricsAtK(
      run(Seq((3L, 10L, 0.9))), "qid", "doc", "score",
      rels(Seq((3L, 10L, 0L))), "qid", "doc", "rel", k = 2).head()
    assert(none.isNullAt(none.fieldIndex("recall")))
    assert(none.isNullAt(none.fieldIndex("ndcg")))
  }

  test("metricsAtK: score ties break on doc ascending, results partition-invariant") {
    val qrels = rels(Seq((1L, 11L, 1L)))
    val r = run(Seq((1L, 10L, 0.5), (1L, 11L, 0.5), (1L, 12L, 0.5)))
    val got = RankEval.metricsAtK(r, "qid", "doc", "score",
      qrels, "qid", "doc", "rel", k = 2).head()
    assert(got.getAs[Double]("rr") == 0.5, "tie canon puts doc 10 first, hit at rank 2")
    val many = RankEval.metricsAtK(r.repartition(13), "qid", "doc", "score",
      qrels, "qid", "doc", "rel", k = 2).head()
    assert(got.toString == many.toString)
  }

  test("aucByGroup: tie-corrected hand value, perfect separation, single-class NULL") {
    // group g: pos scores {0.9, 0.5}, neg {0.5, 0.1} — the 0.5 tie spans
    // classes. Avg ranks asc: 0.1→1, 0.5→2.5 (×2), 0.9→4.
    // U = (2.5 + 4) − 2·3/2 = 3.5; AUC = 3.5/(2·2) = 0.875.
    val df = Seq(
      ("g", 0.9, 1), ("g", 0.5, 1), ("g", 0.5, 0), ("g", 0.1, 0),
      ("h", 1.0, 1), ("h", 0.9, 1), ("h", 0.2, 0),   // perfect separation
      ("i", 0.3, 1), ("i", 0.7, 1))                  // positives only
      .toDF("grp", "score", "label")
    val got = RankEval.aucByGroup(df, "grp", "score", "label")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("g").getAs[Double]("auc") == 0.875)
    assert(got("g").getAs[Long]("n_pos") == 2L && got("g").getAs[Long]("n_neg") == 2L)
    assert(got("h").getAs[Double]("auc") == 1.0)
    assert(got("i").isNullAt(got("i").fieldIndex("auc")), "single-class AUC is undefined")
    // partition invariance (the rank windows key on the group)
    val many = RankEval.aucByGroup(df.repartition(11), "grp", "score", "label")
      .collect().map(_.toString).sorted.toSeq
    assert(many == got.values.map(_.toString).toSeq.sorted)
  }

  test("calibrationBins + ece: hand-computed bins, p=1.0 lands in the last bin") {
    val df = Seq(
      ("g", 0.05, 0), ("g", 0.15, 1), ("g", 0.95, 1), ("g", 1.0, 1))
      .toDF("grp", "p", "label")
    val bins = RankEval.calibrationBins(df, "grp", "p", "label", bins = 10)
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(bins.keySet == Set(0L, 1L, 9L), "p = 1.0 clamps into bin 9")
    assert(bins(0L).getAs[Long]("n") == 1L && bins(0L).getAs[Double]("acc") == 0.0 &&
      bins(0L).getAs[Double]("conf") == 0.05)
    assert(bins(1L).getAs[Double]("acc") == 1.0 && bins(1L).getAs[Double]("conf") == 0.15)
    assert(bins(9L).getAs[Long]("n") == 2L && bins(9L).getAs[Double]("conf") == 0.975)
    // ECE = (|0−0.05| + |1−0.15| + |2−1.95|)/4 = 0.95/4 = 0.2375
    val e = RankEval.ece(df, "grp", "p", "label", bins = 10).head()
    assert(e.getAs[Long]("n") == 4L && e.getAs[Double]("ece") == 0.2375)
  }

  test("averagePrecisionAtK: hand value, below-cutoff relevants still cost, no-rel NULL") {
    // run for q1: docs 10(rel), 11, 12(rel), ranked by score desc.
    // P@1 = 1, P@3 = 2/3 → AP = (1 + 0.666667)/n_rel
    val qrels = rels(Seq((1L, 10L, 1L), (1L, 12L, 1L)))
    val got = RankEval.averagePrecisionAtK(
      run(Seq((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.7))),
      "qid", "doc", "score", qrels, "qid", "doc", "rel", k = 3).head()
    val expected = math.floor(
      (math.floor(1.0 / 1.0 * 1e9 + 0.5) + math.floor(2.0 / 3.0 * 1e9 + 0.5)) / (2.0 * 1e9)
        * 1e6 + 0.5) / 1e6
    assert(got.getAs[Double]("ap") == expected && expected == 0.833333)
    // a third relevant doc never retrieved: denominator grows to 3
    val m = RankEval.averagePrecisionAtK(
      run(Seq((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.7))),
      "qid", "doc", "score", rels(Seq((1L, 10L, 1L), (1L, 12L, 1L), (1L, 99L, 1L))),
      "qid", "doc", "rel", k = 3).head()
    assert(m.getAs[Long]("n_rel") == 3L)
    assert(m.getAs[Double]("ap") < got.getAs[Double]("ap"))
    // zero judged-relevant → NULL
    val none = RankEval.averagePrecisionAtK(
      run(Seq((2L, 10L, 0.9))), "qid", "doc", "score",
      rels(Seq((2L, 10L, 0L))), "qid", "doc", "rel", k = 3).head()
    assert(none.isNullAt(none.fieldIndex("ap")))
  }

  test("calibrationCounts merge law: two halves folded equal the whole") {
    val all = Seq(
      ("g", 0.05, 0), ("g", 0.15, 1), ("g", 0.95, 1), ("g", 1.0, 1),
      ("h", 0.42, 0), ("h", 0.44, 1), ("h", 0.91, 1))
      .toDF("grp", "p", "label")
    val h1 = all.limit(3)
    val h2 = all.exceptAll(h1)
    val whole = RankEval.calibrationCounts(all, "grp", "p", "label", 10)
      .collect().map(_.toString).sorted.toSeq
    val merged = RankEval.mergeCalibrationCounts(
      RankEval.calibrationCounts(h1, "grp", "p", "label", 10),
      RankEval.calibrationCounts(h2, "grp", "p", "label", 10))
      .collect().map(_.toString).sorted.toSeq
    assert(merged == whole)
    // and the derived diagram over merged counts equals the batch diagram
    val viaMerge = RankEval.calibrationFromCounts(
      RankEval.mergeCalibrationCounts(
        RankEval.calibrationCounts(h1, "grp", "p", "label", 10),
        RankEval.calibrationCounts(h2, "grp", "p", "label", 10)))
      .collect().map(_.toString).sorted.toSeq
    val batch = RankEval.calibrationBins(all, "grp", "p", "label", 10)
      .collect().map(_.toString).sorted.toSeq
    assert(viaMerge == batch)
  }

  test("brierScore: hand mean of squared errors; perfect predictions score 0") {
    val df = Seq(("g", 0.8, 1), ("g", 0.5, 0)).toDF("grp", "p", "label")
    val got = RankEval.brierScore(df, "grp", "p", "label").head()
    // (0.04 + 0.25)/2 = 0.145
    assert(got.getAs[Long]("n") == 2L && got.getAs[Double]("brier") == 0.145)
    val perfect = RankEval.brierScore(
      Seq(("g", 1.0, 1), ("g", 0.0, 0)).toDF("grp", "p", "label"),
      "grp", "p", "label").head()
    assert(perfect.getAs[Double]("brier") == 0.0)
  }

  test("cochranQ: textbook 3-system value, incomplete items drop, unanimity is NULL") {
    // G = (4,2,1), T = 7, ΣL² = 15, ΣG² = 21 → Q = 2·(63−49)/(21−15) = 28/6
    val rows = Seq(
      (1L, "a", true), (1L, "b", true), (1L, "c", false),
      (2L, "a", true), (2L, "b", false), (2L, "c", false),
      (3L, "a", true), (3L, "b", true), (3L, "c", true),
      (4L, "a", true), (4L, "b", false), (4L, "c", false))
    val got = RankEval.cochranQ(rows.toDF("item", "sys", "ok"), "item", "sys", "ok").head()
    assert(got.getAs[Long]("n_items") == 4L && got.getAs[Long]("k") == 3L)
    assert(got.getAs[Double]("q_stat") == 4.666667)
    // an item missing one system's verdict is excluded entirely
    val withPartial = RankEval.cochranQ(
      (rows ++ Seq((5L, "a", true))).toDF("item", "sys", "ok"), "item", "sys", "ok").head()
    assert(withPartial.getAs[Long]("n_items") == 4L)
    assert(withPartial.getAs[Double]("q_stat") == 4.666667)
    // every item unanimous: denominator 0 → NULL, not 0
    val unanimous = RankEval.cochranQ(
      Seq((1L, "a", true), (1L, "b", true), (2L, "a", false), (2L, "b", false))
        .toDF("item", "sys", "ok"), "item", "sys", "ok").head()
    assert(unanimous.isNullAt(unanimous.fieldIndex("q_stat")))
  }

  test("splitConformal: order-statistic threshold, coverage count, tiny-cal infinity") {
    val cal = (1 to 9).map(i => Tuple1(i.toDouble)).toDF("score")
    val test = Seq(1.0, 5.5, 10.0).map(Tuple1(_)).toDF("score")
    // α = 0.5: k = ceil(10·0.5) = 5 → qhat = 5.0; only score 1.0 ≤ 5
    val mid = RankEval.splitConformal(cal, test, "score", alpha = 0.5).head()
    assert(mid.getAs[Long]("n_cal") == 9L && mid.getAs[Long]("k") == 5L)
    assert(mid.getAs[Double]("qhat") == 5.0)
    assert(mid.getAs[Long]("n_covered") == 1L)
    assert(mid.getAs[Double]("coverage") == 0.333333)
    // α = 0.1: k = ceil(10·0.9) = 9 → qhat = max = 9.0; covers 1.0 and 5.5
    val tight = RankEval.splitConformal(cal, test, "score", alpha = 0.1).head()
    assert(tight.getAs[Long]("k") == 9L && tight.getAs[Double]("qhat") == 9.0)
    assert(tight.getAs[Long]("n_covered") == 2L)
    // calibration too small for α: k > n → infinite threshold, full coverage
    val tiny = RankEval.splitConformal(
      Seq(1.0, 2.0).map(Tuple1(_)).toDF("score"), test, "score", alpha = 0.1).head()
    assert(tiny.getAs[Long]("k") == 3L && tiny.isNullAt(tiny.fieldIndex("qhat")))
    assert(tiny.getAs[Long]("n_covered") == 3L && tiny.getAs[Double]("coverage") == 1.0)
  }

  test("classificationReport + summary: hand contingency, zero-division convention") {
    val pairs =
      Seq.fill(3)(("a", "a")) ++ Seq(("a", "b")) ++
      Seq.fill(2)(("b", "b")) ++ Seq(("b", "a")) ++ Seq(("c", "a"))
    val df = pairs.toDF("label", "pred")
    val rep = RankEval.classificationReport(df, "label", "pred")
    val got = rep.collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("a", "b", "c"), "never-predicted class c still gets a row")
    val a = got("a")
    assert(a.getAs[Long]("tp") == 3L && a.getAs[Long]("fp") == 2L && a.getAs[Long]("fn") == 1L)
    assert(a.getAs[Double]("precision") == 0.6 && a.getAs[Double]("recall") == 0.75)
    assert(a.getAs[Double]("f1") == 0.666667)
    val c = got("c")
    assert(c.getAs[Double]("precision") == 0.0 && !c.getAs[Boolean]("precision_defined"),
      "zero-division reports 0.0 with the defined flag false")
    assert(c.getAs[Boolean]("recall_defined") && c.getAs[Double]("recall") == 0.0)
    val s = RankEval.classificationSummary(rep).head()
    assert(s.getAs[Long]("n_classes") == 3L)
    assert(s.getAs[Double]("accuracy") == 0.625)
    assert(s.getAs[Double]("macro_precision") == 0.422222)
    assert(s.getAs[Double]("macro_recall") == 0.472222)
    assert(s.getAs[Double]("macro_f1") == 0.444445)
  }

  test("pairedPermutationTest: driver md5 recompute matches; zero-sum deltas give p = 1") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sign(b: Long, item: String): Long =
      if (Integer.parseInt(md5hex(s"perm:$b:$item").substring(0, 1), 16) % 2 == 1) 1L else -1L
    val deltas = Map("a" -> 0.3, "b" -> 0.2, "c" -> -0.1)
    val df = deltas.toSeq.toDF("item", "delta")
    val got = RankEval.pairedPermutationTest(df, "item", "delta", replicates = 16).head()
    val dm = deltas.map { case (k, v) => k -> math.floor(v * 1e6 + 0.5).toLong }
    val s = dm.values.sum
    val hits = (0L until 16L).count { b =>
      math.abs(dm.map { case (k, v) => sign(b, k) * v }.sum) >= math.abs(s)
    }
    assert(got.getAs[Long]("n") == 3L && got.getAs[Long]("replicates") == 16L)
    assert(got.getAs[Long]("hits") == hits.toLong)
    assert(got.getAs[Double]("p_value") == math.floor((hits + 1.0) / 17.0 * 1e6 + 0.5) / 1e6)
    assert(got.getAs[Double]("mean_delta") == math.floor(s / (3.0 * 1e6) * 1e6 + 0.5) / 1e6)
    // exactly offsetting deltas: |S| = 0, every replicate ties or beats → p = 1
    val sym = RankEval.pairedPermutationTest(
      Seq(("x", 0.5), ("y", -0.5)).toDF("item", "delta"),
      "item", "delta", replicates = 32).head()
    assert(sym.getAs[Long]("hits") == 32L && sym.getAs[Double]("p_value") == 1.0)
  }

  test("mcnemar: textbook discordant cells, no-discordance is NULL") {
    // 10 items A-only-right, 5 items B-only-right, 3 both, 2 neither
    val rows =
      (1 to 10).map(i => (i.toLong, true, false)) ++
      (11 to 15).map(i => (i.toLong, false, true)) ++
      (16 to 18).map(i => (i.toLong, true, true)) ++
      (19 to 20).map(i => (i.toLong, false, false))
    val got = RankEval.mcnemar(rows.toDF("item", "a_ok", "b_ok"),
      "item", "a_ok", "b_ok").head()
    assert(got.getAs[Long]("n") == 20L)
    assert(got.getAs[Long]("b_only") == 10L && got.getAs[Long]("c_only") == 5L)
    assert(got.getAs[Double]("chi2") == 1.666667)       // 25/15
    assert(got.getAs[Double]("chi2_cc") == 1.066667)    // 16/15
    val agree = RankEval.mcnemar(
      Seq((1L, true, true), (2L, false, false)).toDF("item", "a_ok", "b_ok"),
      "item", "a_ok", "b_ok").head()
    assert(agree.isNullAt(agree.fieldIndex("chi2")), "b + c = 0 is undefined, not 0")
  }

  // ---- pass@k ----------------------------------------------------------

  /** Exact BigInt twin: 1 − C(n−c,k)/C(n,k). */
  private def passExact(n: Int, c: Int, k: Int): Double = {
    def choose(a: Int, b: Int): BigInt =
      if (b > a) BigInt(0)
      else (0 until b).map(i => BigInt(a - i)).product /
        (1 to b).map(BigInt(_)).product
    val ratio = BigDecimal(choose(n - c, k)) / BigDecimal(choose(n, k))
    math.floor((1.0 - ratio.toDouble) * 1e6 + 0.5) / 1e6
  }

  test("passAtK: hand values, n<k NULL, all-fail 0, any-needed 1") {
    val samples = Seq(
      // problem 1: n=5, c=2 → pass@3 = 1 − C(3,3)/C(5,3) = 1 − 1/10 = 0.9
      (1L, true), (1L, true), (1L, false), (1L, false), (1L, false),
      // problem 2: n=2 (< 3), c=1 → pass@3 NULL, pass@1 = 0.5
      (2L, true), (2L, false),
      // problem 3: n=4, c=0 → 0.0 at every defined k
      (3L, false), (3L, false), (3L, false), (3L, false),
      // problem 4: n=4, c=2, k=3 > n−c → exactly 1
      (4L, true), (4L, true), (4L, false), (4L, false))
      .toDF("problem", "ok")
    val got = RankEval.passAtK(samples, "problem", "ok", Seq(1, 3))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Double]("pass_at_3") == 0.9)
    assert(got(1L).getAs[Double]("pass_at_1") == 0.4)
    assert(got(2L).isNullAt(got(2L).fieldIndex("pass_at_3")), "k > n is undefined")
    assert(got(2L).getAs[Double]("pass_at_1") == 0.5)
    assert(got(3L).getAs[Double]("pass_at_1") == 0.0)
    assert(got(3L).getAs[Double]("pass_at_3") == 0.0)
    assert(got(4L).getAs[Double]("pass_at_3") == 1.0, "n−c < k forces a correct draw")
  }

  test("passAtK matches the exact BigInt binomial on fuzzed (n, c, k)") {
    val rng = new scala.util.Random(421)
    val cases = (0 until 60).map { p =>
      val n = 1 + rng.nextInt(200)
      val c = rng.nextInt(n + 1)
      (p.toLong, n, c)
    }
    val samples = cases.flatMap { case (p, n, c) =>
      (0 until n).map(i => (p, i < c))
    }.toDF("problem", "ok")
    val ks = Seq(1, 2, 5, 10, 12)
    val got = RankEval.passAtK(samples, "problem", "ok", ks)
      .collect().map(r => r.getLong(0) -> r).toMap
    cases.foreach { case (p, n, c) =>
      val row = got(p)
      assert(row.getAs[Long]("n_samples") == n && row.getAs[Long]("n_correct") == c)
      ks.foreach { k =>
        val idx = row.fieldIndex(s"pass_at_$k")
        if (n < k) assert(row.isNullAt(idx), s"n=$n c=$c k=$k")
        else assert(row.getDouble(idx) == passExact(n, c, k), s"n=$n c=$c k=$k")
      }
    }
  }

  // ---- corpus BLEU -----------------------------------------------------

  /** Independent scala twin of corpus BLEU (plain doubles, no
    * quantization — agreement within 1e-4 is the assertion).
    */
  private def bleuTwin(pairs: Seq[(String, String)], maxN: Int): (Double, Seq[Double]) = {
    def toks(s: String) = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def grams(t: Seq[String], n: Int) = t.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
    val ps = (1 to maxN).map { n =>
      var clip = 0L; var tot = 0L
      pairs.foreach { case (cand, ref) =>
        val cg = grams(toks(cand), n).groupBy(identity).view.mapValues(_.size)
        val rg = grams(toks(ref), n).groupBy(identity).view.mapValues(_.size)
        cg.foreach { case (g, cc) => clip += math.min(cc, rg.getOrElse(g, 0)); tot += cc }
      }
      if (tot == 0) -1.0 else clip.toDouble / tot
    }
    val cLen = pairs.map(p => toks(p._1).size).sum
    val rLen = pairs.map(p => toks(p._2).size).sum
    val bleu =
      if (cLen == 0 || ps.exists(_ <= 0.0)) 0.0
      else {
        val bp = if (cLen >= rLen) 1.0 else math.exp(1.0 - rLen.toDouble / cLen)
        bp * math.exp(ps.map(math.log).sum / maxN)
      }
    (bleu, ps)
  }

  test("bleuCorpus: the Papineni clipping example and a hand BLEU-2") {
    // clipping: cand 'the'×7 vs ref with two 'the' → p1 = 2/7
    val clip = RankEval.bleuCorpus(
      Seq((1L, "the the the the the the the", "the cat is on the mat"))
        .toDF("id", "cand", "ref"), "id", "cand", "ref", maxN = 1).head()
    assert(clip.getAs[Double]("p_1") == math.floor(2.0 / 7.0 * 1e6 + 0.5) / 1e6)
    assert(clip.getAs[Double]("bleu") == math.floor(2.0 / 7.0 * 1e4 + 0.5) / 1e4)

    // BLEU-2 hand case: cand = 'the cat sat' vs ref = 'the cat is sat'
    // p1 = 3/3, p2 = 1/2 ('the cat' matches, 'cat sat' doesn't)
    // bp = exp(1 − 4/3); bleu = bp · exp((ln 1 + ln 0.5)/2)
    val got = RankEval.bleuCorpus(
      Seq((1L, "the cat sat", "the cat is sat")).toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxN = 2).head()
    assert(got.getAs[Long]("cand_tokens") == 3L && got.getAs[Long]("ref_tokens") == 4L)
    assert(got.getAs[Double]("p_1") == 1.0)
    assert(got.getAs[Double]("p_2") == 0.5)
    val expected = math.exp(1.0 - 4.0 / 3.0) * math.exp(math.log(0.5) / 2.0)
    assert(math.abs(got.getAs[Double]("bleu") - expected) < 1e-4)
  }

  test("bleuCorpus: zero-gram orders, empty candidate, and identity") {
    // a 1-token corpus has NO bigrams: p_2 NULL, bleu 0 (unsmoothed)
    val short = RankEval.bleuCorpus(
      Seq((1L, "word", "word")).toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxN = 2).head()
    assert(short.getAs[Double]("p_1") == 1.0)
    assert(short.isNullAt(short.fieldIndex("p_2")))
    assert(short.getAs[Double]("bleu") == 0.0)
    // empty candidate corpus
    val empty = RankEval.bleuCorpus(
      Seq((1L, "", "ref text")).toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxN = 2).head()
    assert(empty.getAs[Long]("cand_tokens") == 0L && empty.getAs[Double]("bleu") == 0.0)
    assert(empty.getAs[Double]("bp") == 0.0)
    // identical corpora score exactly 1
    val same = RankEval.bleuCorpus(
      Seq((1L, "a b c d e", "a b c d e"), (2L, "f g h i", "f g h i"))
        .toDF("id", "cand", "ref"), "id", "cand", "ref").head()
    assert(same.getAs[Double]("bleu") == 1.0 && same.getAs[Double]("bp") == 1.0)
  }

  // ---- LCS / ROUGE-L -----------------------------------------------------

  /** Exponential-free brute twin: classic full-matrix DP, independently
    * written (the expression uses a two-row rolling variant).
    */
  private def lcsBrute(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.ofDim[Int](a.size + 1, b.size + 1)
    for (i <- 1 to a.size; j <- 1 to b.size)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.size)(b.size)
  }

  test("lcs_len: hand values, SQL surface, and a fuzzed brute-DP twin") {
    val hand = Seq(
      (Seq("a", "b", "c", "d"), Seq("b", "d"), 2),
      (Seq("a", "b", "c"), Seq("c", "b", "a"), 1),
      (Seq.empty[String], Seq("x"), 0),
      (Seq("x", "y"), Seq("x", "y"), 2),
      (Seq("a", "a", "b"), Seq("a", "b", "a"), 2))
    def arr(xs: Seq[String]) =
      if (xs.isEmpty) "CAST(array() AS ARRAY<STRING>)"
      else s"array(${xs.map("'" + _ + "'").mkString(",")})"
    hand.foreach { case (a, b, want) =>
      val got = spark.sql(s"SELECT lcs_len(${arr(a)}, ${arr(b)})").head().getInt(0)
      assert(got == want, s"$a vs $b")
    }
    val rng = new scala.util.Random(5)
    val vocab = Vector("p", "q", "r", "s")
    (0 until 200).foreach { _ =>
      val a = Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
      val b = Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
      import org.apache.spark.sql.catalyst.util.ArrayData
      import org.apache.spark.unsafe.types.UTF8String
      val got = graft.expressions.LcsLength.lcs(
        ArrayData.toArrayData(a.map(UTF8String.fromString).toArray),
        ArrayData.toArrayData(b.map(UTF8String.fromString).toArray))
      assert(got == lcsBrute(a, b), s"$a vs $b")
    }
  }

  /** Independent full-matrix Levenshtein twin. */
  private def editBrute(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.ofDim[Int](a.size + 1, b.size + 1)
    for (i <- 0 to a.size) dp(i)(0) = i
    for (j <- 0 to b.size) dp(0)(j) = j
    for (i <- 1 to a.size; j <- 1 to b.size)
      dp(i)(j) = math.min(
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1),
        math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1))
    dp(a.size)(b.size)
  }

  test("ter: hand values, empty conventions, fuzzed brute-DP twin") {
    val got = RankEval.ter(
      Seq(
        (1L, "the cat sat", "the cat is sat"),  // 1 insertion / ref 4
        (2L, "a b c", "x y z"),                  // 3 substitutions / ref 3
        (3L, "", ""),                            // both empty → 0.0
        (4L, "some cand", "")).toDF("id", "cand", "ref"),
      "id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("edits") == 1L)
    assert(got(1L).getAs[Double]("ter") == 0.25)
    assert(got(2L).getAs[Double]("ter") == 1.0)
    assert(got(3L).getAs[Double]("ter") == 0.0)
    assert(got(4L).isNullAt(got(4L).fieldIndex("ter")), "empty ref is undefined")
    val rng = new scala.util.Random(11)
    val vocab = Vector("p", "q", "r", "s")
    (0 until 150).foreach { _ =>
      val a = Seq.fill(rng.nextInt(10))(vocab(rng.nextInt(vocab.size)))
      val b = Seq.fill(rng.nextInt(10))(vocab(rng.nextInt(vocab.size)))
      import org.apache.spark.sql.catalyst.util.ArrayData
      import org.apache.spark.unsafe.types.UTF8String
      val gotD = graft.expressions.TokenEditDistance.dist(
        ArrayData.toArrayData(a.map(UTF8String.fromString).toArray),
        ArrayData.toArrayData(b.map(UTF8String.fromString).toArray))
      assert(gotD == editBrute(a, b), s"$a vs $b")
    }
  }

  test("rougeL: hand precision/recall/F1 and empty-side conventions") {
    val got = RankEval.rougeL(
      Seq(
        (1L, "the cat sat on the mat", "the cat on a mat"),
        (2L, "", "some ref"),
        (3L, "some cand", "")).toDF("id", "cand", "ref"),
      "id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    // LCS('the cat sat on the mat', 'the cat on a mat') = the,cat,on,mat...
    // tokens: [the cat sat on the mat] vs [the cat on a mat]: LCS = 5? check:
    // common subsequence the,cat,on,the?  ref has one 'the'; a=the cat sat on the mat
    // b=the cat on a mat → the,cat,on,mat = 4; can we get 5? b has 5 tokens;
    // 'a' unmatched → max 4.
    assert(got(1L).getAs[Long]("lcs") == 4L)
    assert(got(1L).getAs[Double]("prec") == math.floor(4.0 / 6.0 * 1e6 + 0.5) / 1e6)
    assert(got(1L).getAs[Double]("rec") == math.floor(4.0 / 5.0 * 1e6 + 0.5) / 1e6)
    val p = 4.0 / 6.0; val r = 4.0 / 5.0
    assert(got(1L).getAs[Double]("f1") == math.floor(2 * p * r / (p + r) * 1e6 + 0.5) / 1e6)
    assert(got(2L).getAs[Double]("prec") == 0.0 && got(2L).getAs[Double]("f1") == 0.0)
    assert(got(3L).getAs[Double]("rec") == 0.0 && got(3L).getAs[Double]("f1") == 0.0)
  }

  test("chrF: identity is 1, vowel-stripped ref keeps recall 1, zero-overlap is 0") {
    val same = RankEval.chrF(
      Seq((1L, "abcdef gh", "abcdef gh")).toDF("id", "cand", "ref"),
      "id", "cand", "ref").head()
    assert(same.getAs[Double]("chrf") == 1.0)
    assert(same.getAs[Long]("cand_chars") == 8L)
    // ref ⊂ cand at char grain: every ref gram appears in cand →
    // recall averages 1 across orders present in the ref
    val sub = RankEval.chrF(
      Seq((1L, "abcdefgh", "abcd")).toDF("id", "cand", "ref"),
      "id", "cand", "ref", maxN = 2).head()
    assert(sub.getAs[Double]("rec") == 1.0)
    assert(sub.getAs[Double]("prec") < 1.0)
    val disjoint = RankEval.chrF(
      Seq((1L, "aaaa", "bbbb")).toDF("id", "cand", "ref"),
      "id", "cand", "ref").head()
    assert(disjoint.getAs[Double]("chrf") == 0.0)
  }

  test("distinctN: hand ratios, missing orders NULL") {
    val got = RankEval.distinctN(
      Seq((1L, "a a a"), (2L, "a b")).toDF("id", "text"), "id", "text", maxN = 3)
      .collect().map(r => r.getInt(0) -> r).toMap
    // unigrams: a×4, b×1 → total 5, distinct 2
    assert(got(1).getAs[Long]("total_grams") == 5L)
    assert(got(1).getAs[Long]("distinct_grams") == 2L)
    assert(got(1).getAs[Double]("ratio") == 0.4)
    // bigrams: 'a a'×2, 'a b'×1 → total 3, distinct 2
    assert(got(2).getAs[Long]("total_grams") == 3L)
    assert(got(2).getAs[Long]("distinct_grams") == 2L)
    // trigrams: only doc 1 has one ('a a a') → total 1, distinct 1
    assert(got(3).getAs[Long]("total_grams") == 1L)
    assert(got(3).getAs[Double]("ratio") == 1.0)
    val empty = RankEval.distinctN(
      Seq((1L, "solo")).toDF("id", "text"), "id", "text", maxN = 2)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(empty(2).isNullAt(empty(2).fieldIndex("ratio")), "no bigrams → NULL")
  }

  test("passAtK counts merge law: two halves folded equal the whole") {
    val samples = (0 until 40).map(i => (i.toLong % 5, i % 3 == 0)).toDF("p", "ok")
    val h1 = samples.limit(17)
    val h2 = samples.exceptAll(h1)
    val whole = RankEval.passAtK(samples, "p", "ok", Seq(1, 3))
      .collect().map(_.toString).sorted.toSeq
    val merged = RankEval.passAtKFromCounts(
      RankEval.mergePassAtKCounts(
        RankEval.passAtKCounts(h1, "p", "ok"),
        RankEval.passAtKCounts(h2, "p", "ok")),
      Seq(1, 3)).collect().map(_.toString).sorted.toSeq
    assert(whole == merged)
  }

  test("bleu counts merge law: two document waves folded equal the whole corpus") {
    val pairs = Seq(
      (1L, "the cat sat on the mat", "the cat is on a mat"),
      (2L, "a b c d", "a b x d"),
      (3L, "hello world again", "hello world again"),
      (4L, "p q r s t", "p q r")).toDF("id", "cand", "ref")
    val w1 = pairs.filter(pairs("id") <= 2)
    val w2 = pairs.filter(pairs("id") > 2)
    val whole = RankEval.bleuCorpus(pairs, "id", "cand", "ref").head().toString
    val merged = RankEval.bleuFromCounts(
      RankEval.mergeBleuCounts(
        RankEval.bleuCounts(w1, "id", "cand", "ref"),
        RankEval.bleuCounts(w2, "id", "cand", "ref"))).head().toString
    assert(whole == merged)
  }

  test("bleuCorpus matches the independent twin on a fuzzed corpus") {
    val rng = new scala.util.Random(77)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val pairs = (0 until 40).map { i =>
      def sent(len: Int) = (0 until len).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
      val cand = sent(3 + rng.nextInt(12))
      val ref = if (i % 4 == 0) cand else sent(3 + rng.nextInt(12))
      (cand, ref)
    }
    val df = pairs.zipWithIndex.map { case ((c, r), i) => (i.toLong, c, r) }
      .toDF("id", "cand", "ref")
    val got = RankEval.bleuCorpus(df, "id", "cand", "ref").head()
    val (twin, ps) = bleuTwin(pairs, 4)
    assert(math.abs(got.getAs[Double]("bleu") - twin) < 1e-4,
      s"got ${got.getAs[Double]("bleu")} twin $twin ps $ps")
    (1 to 4).foreach { n =>
      if (ps(n - 1) >= 0)
        assert(math.abs(got.getAs[Double](s"p_$n") - ps(n - 1)) < 1e-6, s"p_$n")
    }
  }
}
