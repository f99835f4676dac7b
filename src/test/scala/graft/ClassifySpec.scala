package graft

import org.apache.spark.sql.functions._

import graft.ops.{Classify, ImportanceSampling, SemanticDedup}

/** NB classifier, DSIR importance weighting, and SemDeDup on hand-built
  * fixtures: hand-computed posteriors, separability recovery, weight
  * ordering, Gumbel-sample determinism, and the k-means-composed dedup.
  */
class ClassifySpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "spam", "buy cheap pills now"),
      (1L, "spam", "cheap pills cheap deals"),
      (2L, "ham", "meeting notes for the quarter"),
      (3L, "ham", "the quarterly report notes"),
      (4L, "ham", "notes from the board meeting"))
      .toDF("id", "label", "text")
  }

  test("nbTokenLogProbs matches a hand-computed add-one estimate") {
    val vocab = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .filter(col("t") =!= "").distinct().count()
    val got = Classify.nbTokenLogProbs(docs, "label", "text", vocabSize = vocab)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // spam corpus: 8 tokens total; "cheap" appears 3x; V distinct tokens
    val (cnt, lp) = got(("spam", "cheap"))
    assert(cnt === 3L)
    val expect = math.log((3.0 + 1.0) / (8.0 + vocab.toDouble))
    assert(math.abs(lp - expect) < 1e-6)
    // a ham-only token never appears under spam (sparse table, not zero rows)
    assert(!got.contains(("spam", "meeting")))
  }

  test("nbPredict recovers the training labels on a separable corpus") {
    val vocab = 14L // distinct tokens in the fixture
    val got = Classify.nbPredict(docs, "label", "text", docs, "id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(0L -> "spam", 1L -> "spam", 2L -> "ham", 3L -> "ham", 4L -> "ham"))
  }

  test("nbScores: zero-token and unseen-token docs surface with prior-shaped scores") {
    import spark.implicits._
    val score = Seq((10L, ""), (11L, "zzz qqq")).toDF("id", "text")
    val got = Classify.nbScores(docs, "label", "text", score, "id", "text", 14L)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // empty doc: score is exactly the prior, n_tokens 0
    val (n0, s0) = got((10L, "ham"))
    assert(n0 === 0L)
    assert(math.abs(s0 - math.log(3.0 / 5.0)) < 1e-6)
    // both labels present for every doc (the cross join), unseen tokens
    // score at the smoothed default, more tokens -> lower score
    val (n1, s1) = got((11L, "ham"))
    assert(n1 === 2L)
    assert(s1 < s0)
  }

  test("persisted NB model scores bit-identically to the in-memory fit; bare dirs refused") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_nb").toString
    val model = Classify.nbFit(docs, "label", "text", vocabSize = 14L)
    Classify.saveNbModel(model, s"$tmp/model")
    val loaded = Classify.loadNbModel(spark, s"$tmp/model")
    val direct = Classify.nbScoresWith(model, docs, "id", "text")
      .collect().map(_.toString).sorted.toSeq
    val viaDisk = Classify.nbScoresWith(loaded, docs, "id", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(direct === viaDisk, "loaded model must reproduce every score exactly")
    assert(Classify.nbPredictWith(loaded, docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      === Map(0L -> "spam", 1L -> "spam", 2L -> "ham", 3L -> "ham", 4L -> "ham"))
    intercept[IllegalArgumentException] {
      Classify.loadNbModel(spark, tmp) // no marker sidecar
    }
  }

  test("importanceWeights ranks target-like docs above raw-like docs") {
    import spark.implicits._
    val target = Seq((100L, "alpha beta alpha beta")).toDF("id", "text")
    val raw = Seq(
      (0L, "alpha beta alpha beta"),
      (1L, "gamma delta gamma delta"),
      (2L, "alpha beta gamma delta")).toDF("id", "text")
    val w = ImportanceSampling.importanceWeights(
      raw, "id", "text",
      ImportanceSampling.featureCounts(target, "text", n = 2, buckets = 32),
      ImportanceSampling.featureCounts(raw, "text", n = 2, buckets = 32),
      n = 2, buckets = 32)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(0L) > w(2L), "pure target-gram doc must outweigh the mixed doc")
    assert(w(2L) > w(1L), "mixed doc must outweigh the pure off-target doc")
  }

  test("importanceWeights: docs below the gram order surface with n_feats 0") {
    import spark.implicits._
    val one = Seq((0L, "solo"), (1L, "two tokens")).toDF("id", "text")
    val counts = ImportanceSampling.featureCounts(one, "text", n = 2, buckets = 8)
    val got = ImportanceSampling.importanceWeights(
      one, "id", "text", counts, counts, n = 2, buckets = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(0L) === ((0L, 0.0)))
    assert(got(1L)._1 === 1L)
    // identical target/raw histograms: every log ratio is exactly 0
    assert(got(1L)._2 === 0.0)
  }

  test("importanceWeights: features unseen in BOTH corpora get the smoothed ratio, not dropped") {
    import spark.implicits._
    // histograms built from a disjoint corpus: every feature of the scored
    // docs is absent from both → each carries ln((R+aB)/(T+aB)), and with
    // R > T that is a POSITIVE constant per feature (visible, not zero)
    val histCorpus = Seq((100L, "aa bb aa bb aa bb")).toDF("id", "text")
    val target = ImportanceSampling.featureCounts(histCorpus, "text", n = 2, buckets = 16)
    val raw = ImportanceSampling.featureCounts(
      Seq((200L, "aa bb aa bb aa bb aa bb aa bb aa bb")).toDF("id", "text"),
      "text", n = 2, buckets = 16)
    val docs = Seq((0L, "zz yy xx")).toDF("id", "text")
    val got = ImportanceSampling.importanceWeights(
      docs, "id", "text", target, raw, n = 2, buckets = 16)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).head
    assert(got._1 === 2L, "both bigrams must count as features")
    // T=5, R=11, B=16, alpha=1: per-feature ratio = ln((11+16)/(5+16))
    val expect = 2.0 * math.log(27.0 / 21.0)
    assert(math.abs(got._2 - expect) < 1e-5,
      s"unseen-everywhere features must carry the smoothed both-zero ratio, got ${got._2}")
  }

  test("nbScores: NULL text scores as an empty document") {
    import spark.implicits._
    val score = Seq((20L, Option.empty[String]), (21L, Some(""))).toDF("id", "text")
    val got = Classify.nbScores(docs, "label", "text", score, "id", "text", 14L)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got((20L, "ham")) === got((21L, "ham")),
      "NULL text must score identically to empty text")
    assert(got((20L, "ham"))._1 === 0L)
  }

  test("gumbelTopK is deterministic, without replacement, and salt-sensitive") {
    import spark.implicits._
    val w = (0L until 200L).map(i => (i, (i % 7).toDouble)).toDF("id", "weight")
    val a = ImportanceSampling.gumbelTopK(w, "id", "weight", k = 30, salt = "s1")
      .collect().map(_.getLong(0)).toSeq
    val b = ImportanceSampling.gumbelTopK(w, "id", "weight", k = 30, salt = "s1")
      .collect().map(_.getLong(0)).toSeq
    assert(a === b, "same salt must reproduce the same sample in the same order")
    assert(a.distinct.size === 30, "sampling is without replacement")
    val c = ImportanceSampling.gumbelTopK(w, "id", "weight", k = 30, salt = "s2")
      .collect().map(_.getLong(0)).toSeq
    assert(a !== c, "a different salt must draw a different sample")
    // weight dominates noise on average: the top-30 skews to high weights
    val meanW = a.map(i => (i % 7).toDouble).sum / 30.0
    assert(meanW > 3.0, s"expected weight-skewed sample, got mean weight $meanW")
  }

  test("semanticKeep drops exactly the lower-id-covered cluster-mates") {
    import spark.implicits._
    val df = Seq(
      // cluster 1: 10 and 11 nearly parallel (cos ~ 1), 12 orthogonal
      (10L, 1, Seq(1.0f, 0.0f)),
      (11L, 1, Seq(0.999f, 0.01f)),
      (12L, 1, Seq(0.0f, 1.0f)),
      // cluster 2: same direction as 10 but different cluster -> untouched
      (20L, 2, Seq(1.0f, 0.0f)))
      .toDF("id", "cluster", "vec")
    val got = SemanticDedup.semanticKeep(df, "id", "vec", "cluster", eps = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(10L -> true, 11L -> false, 12L -> true, 20L -> true))
  }

  test("semanticDedupKMeans keeps one representative per tight direction bundle") {
    import spark.implicits._
    // two tight bundles of near-identical vectors; enough spread for k-means
    val rows =
      (0L until 6L).map(i => (i, Seq(1.0f, (i * 1e-4).toFloat))) ++
        (10L until 16L).map(i => (i, Seq(-1e-4f * (i - 10), 1.0f)))
    val df = rows.toDF("id", "vec")
    val got = SemanticDedup.semanticDedupKMeans(df, "id", "vec", nClusters = 2, eps = 0.999)
    assert(got.count() === 12L, "every vector surfaces with a verdict")
    val kept = got.filter(col("keep")).collect().map(_.getLong(0)).toSet
    // each bundle collapses to its min id within its cluster; cluster count
    // is k-means-dependent but near-identical vectors always share a cell
    assert(kept.contains(0L) && kept.contains(10L))
    assert(kept.size <= 4, s"near-identical bundles must collapse, kept $kept")
  }

  // ---- logistic-regression quality classifier (graft.ops.Logistic) ----
  // the learning loop itself is golden-gated (q_lr_model/q_lr_predict vs
  // tools/gen_lr_golden.py); these cover the operator-level properties

  private def lrCorpus = {
    import spark.implicits._
    // class-1 docs speak of databases, class-0 of weather — distinctive
    // bigrams on both sides, plus shared filler
    Seq(
      (0L, 0, "sunny sky with light clouds today"),
      (1L, 0, "heavy rain and strong wind today"),
      (2L, 0, "light clouds then heavy rain"),
      (3L, 1, "query plan joins the sorted table"),
      (4L, 1, "sorted table scan feeds the query plan"),
      (5L, 1, "the query plan prunes every partition")
    ).toDF("doc_id", "label", "text")
  }

  test("lrFit separates a separable corpus; margins decide classes exactly") {
    val model = graft.ops.Logistic.lrFit(lrCorpus, "label", "text",
      n = 2, buckets = 128, iters = 60)
    val preds = graft.ops.Logistic.lrPredict(lrCorpus, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    lrCorpus.select("doc_id", "label").collect().foreach { r =>
      assert(preds(r.getLong(0)) === r.getInt(1).toLong, s"doc ${r.getLong(0)}")
    }
    // scores live in (0,1) and agree with the margin sign
    val scores = graft.ops.Logistic.lrScores(lrCorpus, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    scores.foreach { case (id, m, s) =>
      assert(s > 0.0 && s < 1.0)
      assert((m >= 0) === (preds(id) == 1L), s"doc $id")
    }
  }

  test("lrFit is invariant under repartitioning (decimal-exact gradients)") {
    val a = graft.ops.Logistic.lrFit(lrCorpus, "label", "text",
        n = 2, buckets = 64, iters = 25)
      .weights.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = graft.ops.Logistic.lrFit(lrCorpus.repartition(7), "label", "text",
        n = 2, buckets = 64, iters = 25)
      .weights.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b) // bit-identical, every weight and the intercept
  }

  test("lr model artifact: save/load scores bit-identically; bare dir refused") {
    val dir = java.nio.file.Files.createTempDirectory("lr-art").toString
    try {
      val model = graft.ops.Logistic.lrFit(lrCorpus, "label", "text",
        n = 2, buckets = 64, iters = 25)
      graft.ops.Logistic.saveLrModel(model, s"$dir/m")
      val loaded = graft.ops.Logistic.loadLrModel(spark, s"$dir/m")
      assert(loaded.n === 2 && loaded.buckets === 64)
      val direct = graft.ops.Logistic.lrScores(lrCorpus, "doc_id", "text", model)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      val reloaded = graft.ops.Logistic.lrScores(lrCorpus, "doc_id", "text", loaded)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      assert(direct === reloaded)
      val bare = s"$dir/bare"
      new java.io.File(bare).mkdirs()
      val e = intercept[IllegalArgumentException] {
        graft.ops.Logistic.loadLrModel(spark, bare)
      }
      assert(e.getMessage.contains("saveLrModel"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("lrFit rejects null/non-binary labels; short docs ride the intercept") {
    import spark.implicits._
    val bad = Seq((0L, 2, "two label"), (1L, 0, "fine doc")).toDF("doc_id", "label", "text")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Logistic.lrFit(bad, "label", "text", iters = 1)
    }
    assert(e.getMessage.contains("0/1"))
    // a one-token doc has no bigram: it still trains (intercept gradient)
    // and scores (margin = intercept alone)
    val short = lrCorpus.unionByName(Seq((9L, 1, "word")).toDF("doc_id", "label", "text"))
    val model = graft.ops.Logistic.lrFit(short, "label", "text",
      n = 2, buckets = 64, iters = 5)
    val nine = graft.ops.Logistic.lrScores(short, "doc_id", "text", model)
      .filter(col("doc_id") === 9L).collect()
    assert(nine.length === 1)
    val b0 = model.weights.filter(col("bucket") === -1L).head().getDouble(1)
    assert(math.abs(nine(0).getDouble(1) - b0) < 1e-12, "margin must be the intercept")
  }
  test("chiSquareTokens: hand-computed 2x2, per-doc distinctness, minDf prune") {
    import spark.implicits._
    // 6 docs: 'spam' appears in all 3 bad docs and 1 good doc; 'meeting'
    // only in good docs; 'the' everywhere (chi2 = 0); 'rare' in one doc
    val docs = Seq(
      (1L, "bad", "spam spam the offer"),   // repeated token counts once
      (2L, "bad", "spam the offer"),
      (3L, "bad", "spam the rare"),
      (4L, "good", "meeting the spam"),
      (5L, "good", "meeting the notes"),
      (6L, "good", "the notes"))
      .toDF("doc_id", "label", "text")
    val got = graft.ops.Classify.chiSquareTokens(docs, "label", "text", minDf = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    // spam/bad: A=3 B=1 C=0 D=2, n=6: chi2 = 6*(3*2-1*0)^2/(4*2*3*3) = 216/72 = 3.0
    assert(got(("spam", "bad")) == ((3L, Some(3.0))))
    assert(got(("spam", "good")) == ((1L, Some(3.0))), "one-vs-rest is symmetric for 2 labels")
    // the: present in every doc -> D column empty -> denom 0 -> NULL
    assert(got(("the", "bad")) == ((3L, None)))
    // meeting/good: A=2 B=0 C=1 D=3: chi2 = 6*(6-0)^2/(2*4*3*3) = 216/72 = 3.0
    assert(got(("meeting", "good")) == ((2L, Some(3.0))))
    assert(!got.keySet.exists(_._1 == "rare"), "df=1 pruned by minDf=2")
    assert(!got.keySet.exists(_._1 == "offer") || got(("offer", "bad"))._1 == 2L)
  }
}
