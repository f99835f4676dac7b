package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Properties of the deterministic sampling/splitting operators that the
  * DuckDB oracles can't express: monotone growth, split disjointness/
  * exhaustiveness, and partition-independence.
  */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("hashSample is monotone in rate: a grown sample keeps every prior row") {
    val at25 = Sampling.hashSample(docs, "doc_id", 0.25)
      .select("doc_id").as[Long].collect().toSet
    val at50 = Sampling.hashSample(docs, "doc_id", 0.50)
      .select("doc_id").as[Long].collect().toSet
    assert(at25.subsetOf(at50))
    assert(at25.nonEmpty && at50.size > at25.size)
    // rate ≈ observed fraction (hash is uniform; generous tolerance)
    val total = docs.count().toDouble
    assert(math.abs(at25.size / total - 0.25) < 0.1)
  }

  test("split is disjoint, exhaustive, and stable under repartitioning") {
    val fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s1 = Sampling.split(docs, "doc_id", fractions)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(s1.size == docs.count()) // every row labeled exactly once
    assert(s1.values.toSet == Set("train", "val", "test"))
    // physical layout must not change any assignment
    val s2 = Sampling.split(docs.repartition(17, col("lang")), "doc_id", fractions)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(s1 == s2)
  }

  test("perStratumSample keeps exactly the k min-uniform rows per stratum, rerun-stable") {
    val k = 30
    val got = Sampling.perStratumSample(docs, "lang", "doc_id", k)
      .select("lang", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (l, v) => l -> v.map(_._2).toSet }
    val strata = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(got.keySet == strata.keySet)
    got.foreach { case (l, ids) =>
      assert(ids.size == math.min(k.toLong, strata(l)), s"stratum $l wrong size")
    }
    // the selection is exactly the k smallest md5-uniforms (min-wise):
    // recompute driver-side from the same derivation
    val byU = docs.select(col("lang"), col("doc_id"),
        Sampling.hashUniform(col("doc_id")).as("u"))
      .as[(String, Long, Double)].collect()
      .groupBy(_._1).map { case (l, v) =>
        l -> v.sortBy(r => (r._3, r._2)).take(k).map(_._2).toSet
      }
    assert(got == byU)
    // rerun over a different physical layout picks identical rows
    val again = Sampling.perStratumSample(docs.repartition(13), "lang", "doc_id", k)
      .select("lang", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (l, v) => l -> v.map(_._2).toSet }
    assert(again == got)
  }

  test("stratified rates apply per stratum; salt decorrelates decisions") {
    val mixed = Sampling.stratifiedSample(
      docs, "lang", "doc_id", rates = Map("en" -> 1.0), defaultRate = 0.0)
    // rate 1.0 keeps every en row, rate 0.0 drops every other row
    assert(mixed.count() == docs.filter(col("lang") === "en").count())
    // different salts make genuinely different (but each deterministic) picks
    val a = Sampling.hashSample(docs, "doc_id", 0.3, salt = "a")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.3, salt = "b")
      .select("doc_id").as[Long].collect().toSet
    assert(a != b)
    assert(Sampling.hashSample(docs, "doc_id", 0.3, salt = "a")
      .select("doc_id").as[Long].collect().toSet == a)
  }

  test("weightedSample: keep rate tracks weight, zero weights never keep, deterministic") {
    import spark.implicits._
    val rows = Sampling.weightedSample(docs, "doc_id", "n_chars", targetRate = 0.8, salt = "ws")
    val total = docs.count().toDouble
    // empirical keep fraction ≈ 0.8 · E[w]/w_max
    val stats = docs.agg(avg(col("n_chars").cast("double")), max(col("n_chars").cast("double")))
      .as[(Double, Double)].head()
    val want = 0.8 * stats._1 / stats._2
    assert(math.abs(rows.count() / total - want) < 0.1,
      s"keep fraction ${rows.count() / total} vs expected $want")
    // heavier rows keep more often: compare top vs bottom weight halves
    val median = docs.stat.approxQuantile("n_chars", Array(0.5), 0.0).head
    def rate(cond: org.apache.spark.sql.Column): Double =
      rows.filter(cond).count().toDouble / math.max(docs.filter(cond).count(), 1L).toDouble
    assert(rate(col("n_chars") > median) > rate(col("n_chars") <= median))
    // zero/negative weights are never kept
    val withZero = docs.withColumn("w0", when(col("doc_id") % 2 === 0, 0).otherwise(col("n_chars")))
    val kept0 = Sampling.weightedSample(withZero, "doc_id", "w0", 0.8)
    assert(kept0.filter(col("doc_id") % 2 === 0).count() == 0)
    // rerun-deterministic
    assert(Sampling.weightedSample(docs, "doc_id", "n_chars", 0.8, salt = "ws")
      .select("doc_id").as[Long].collect().toSet ==
      rows.select("doc_id").as[Long].collect().toSet)
  }

  test("null keys: perStratumSample drops them, split routes them to the first label") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (Some("a"), "s1"), (Some("b"), "s1"), (Some("c"), "s1"),
      (None: Option[String], "s1"), (None, "s1"), (None, "s1"))
      .toDF("k", "stratum")
    val sampled = Sampling.perStratumSample(df, "stratum", "k", k = 2)
      .select("k").collect().map(_.getString(0))
    assert(sampled.length === 2 && !sampled.contains(null),
      "null keys must not crowd out sampled rows (null uniform sorts first)")

    val splits = Sampling.split(df, "k", Seq(("train", 0.9), ("test", 0.1)))
      .select("k", "split").collect()
      .map(r => Option(r.getString(0)) -> r.getString(1))
    splits.filter(_._1.isEmpty).foreach { case (_, s) =>
      assert(s === "train", "null keys route to the FIRST (largest) split, not the last")
    }
  }

  test("weightedSample gives the contract error on empty input, not an NPE") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "w")
    val e = intercept[IllegalArgumentException] {
      Sampling.weightedSample(empty, "id", "w", 0.5)
    }
    assert(e.getMessage.contains("max weight must be positive"))
  }

  test("weightedSample fails loudly when targetRate/wMax underflows the 9-decimal grid") {
    // byte-size-scale weights: targetRate/wMax ≈ 1e-16 rounds to scale 0.0,
    // which would silently keep nothing — must throw instead
    val huge = docs.withColumn("w", col("n_chars").cast("double") * 1e13)
    val ex = intercept[IllegalArgumentException] {
      Sampling.weightedSample(huge, "doc_id", "w", targetRate = 0.001)
    }
    assert(ex.getMessage.contains("underflow"))
  }

  test("temperatureMix: alpha=1 is identity, smallest stratum kept whole, flattening monotone") {
    // alpha = 1 → every stratum rate (n/nmin)^0 = 1 → no row dropped
    assert(Sampling.temperatureMix(docs, "lang", "doc_id", alpha = 1.0).count() == docs.count())

    val counts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = counts.minBy(_._2)._1
    val mixed = Sampling.temperatureMix(docs, "lang", "doc_id", alpha = 0.5, salt = "mix")
    val mixedCounts = mixed.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the smallest language is never downsampled
    assert(mixedCounts(minLang) == counts(minLang))
    // every stratum's observed keep-rate is within noise of (n/nmin)^(alpha-1)
    counts.foreach { case (lang, n) =>
      val want = math.pow(n.toDouble / counts(minLang), -0.5)
      val got = mixedCounts.getOrElse(lang, 0L).toDouble / n
      assert(math.abs(got - want) < 0.15, s"$lang keep-rate $got vs expected $want")
    }
    // lower alpha flattens harder: total kept shrinks as alpha drops
    val flatter = Sampling.temperatureMix(docs, "lang", "doc_id", alpha = 0.25, salt = "mix")
    assert(flatter.count() <= mixed.count())
    // and the selection is rerun-deterministic
    assert(Sampling.temperatureMix(docs, "lang", "doc_id", alpha = 0.5, salt = "mix")
      .select("doc_id").as[Long].collect().toSet ==
      mixed.select("doc_id").as[Long].collect().toSet)
  }

  test("epochShuffle: positions are a permutation, epoch-distinct, partitioning-stable") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val n = docs.count()
    val e3 = graft.ops.Sampling.epochShuffle(docs, "doc_id", epoch = 3L)
      .select("doc_id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact permutation 0..n-1
    assert(e3.values.toSeq.sorted === (0L until n).toSeq)
    // stable under repartitioning
    val repart = graft.ops.Sampling
      .epochShuffle(docs.repartition(13, org.apache.spark.sql.functions.col("lang")), "doc_id", epoch = 3L)
      .select("doc_id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(repart === e3)
    // a different epoch is a genuinely different permutation
    val e4 = graft.ops.Sampling.epochShuffle(docs, "doc_id", epoch = 4L)
      .select("doc_id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e4.values.toSeq.sorted === (0L until n).toSeq)
    assert(e4 !== e3)
    // no whole-dataset window partition in the plan: the only row_number
    // partitions by the hash bucket
    val plan = graft.ops.Sampling.epochShuffle(docs, "doc_id", 3L)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition(_sk"),
      "position rank must partition by bucket, not run globally over the sort key")
  }

  test("budgetMix: hits the target mix, keeps under-supplied strata whole, monotone in budget") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val props = Map("en" -> 0.6, "de" -> 0.25, "fr" -> 0.15)
    val got = graft.ops.Sampling.budgetMix(docs, "lang", "doc_id", "n_chars",
      budget = 4000.0, proportions = props, salt = "bm")
    // absent-from-target strata drop entirely
    assert(got.filter(!col("lang").isin("en", "de", "fr")).count() === 0)
    // achieved per-stratum weight lands near budget*p (hash sampling noise)
    val weights = got.groupBy("lang").agg(sum("n_chars").as("w")).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    props.foreach { case (lang, p) =>
      val target = 4000.0 * p
      assert(weights(lang) > target * 0.4 && weights(lang) < target * 2.2,
        s"$lang weight ${weights(lang)} should be near $target")
    }
    // a budget exceeding the corpus keeps every targeted stratum whole
    val whole = graft.ops.Sampling.budgetMix(docs, "lang", "doc_id", "n_chars",
      budget = 1e9, proportions = props, salt = "bm")
    val fullCounts = docs.filter(col("lang").isin("en", "de", "fr"))
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wholeCounts = whole.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wholeCounts === fullCounts, "over-budget must keep targeted strata whole")
    // monotone: growing the budget only ADDS docs
    val small = got.select("doc_id").collect().map(_.getLong(0)).toSet
    val big = graft.ops.Sampling.budgetMix(docs, "lang", "doc_id", "n_chars",
      budget = 8000.0, proportions = props, salt = "bm")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big), "incremental budget growth must keep earlier rows")
  }

  test("tieredShuffle: tiers in order, shuffled within; empty tiers degenerate to epochShuffle") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("band", org.apache.spark.sql.functions.floor(col("n_chars") / 500))
    val got = graft.ops.Sampling.tieredShuffle(docs, Seq("band"), "doc_id", epoch = 2L)
      .select("doc_id", "band", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact permutation
    assert(got.map(_._3).sorted.toSeq === (0L until got.length))
    // every position in band b precedes every position in band b+1
    val maxByBand = got.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    val minByBand = got.groupBy(_._2).view.mapValues(_.map(_._3).min).toMap
    val bands = maxByBand.keys.toSeq.sorted
    bands.sliding(2).foreach {
      case Seq(a, b) => assert(maxByBand(a) < minByBand(b), s"band $a must precede $b")
      case _ =>
    }
    // with no tiers it IS epochShuffle
    val plain = graft.ops.Sampling.epochShuffle(docs, "doc_id", epoch = 2L)
      .select("doc_id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaTiered = graft.ops.Sampling.tieredShuffle(docs, Seq.empty, "doc_id", epoch = 2L)
      .select("doc_id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaTiered === plain)
  }

  test("upsample: dense per-row epochs, copy counts bracket the rate, rate<=1 degenerates") {
    val rates = Map("en" -> 2.5, "de" -> 1.0, "fr" -> 0.5)
    val up = Sampling.upsample(docs, "lang", "doc_id", rates, defaultRate = 0.0)
      .select("doc_id", "lang", "epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byDoc = up.groupBy(_._1)
    byDoc.foreach { case (_, rows) =>
      val epochs = rows.map(_._3).sorted
      assert(epochs.toSeq == (0L until rows.length.toLong), s"epochs not dense: ${epochs.toSeq}")
      val lang = rows.head._2
      val r = rates(lang)
      assert(rows.length >= math.floor(r).toInt && rows.length <= math.ceil(r).toInt,
        s"$lang copies=${rows.length} outside [floor, ceil] of $r")
    }
    // every de doc appears exactly once at epoch 0
    val deIn = docs.where(col("lang") === "de").count()
    assert(byDoc.count { case (_, rows) => rows.head._2 == "de" } == deIn)
    assert(up.filter(_._2 == "de").forall(_._3 == 0L))
    // unknown strata (defaultRate 0) contribute nothing
    assert(up.forall(t => rates.contains(t._2)))
    // rate <= 1 is exactly stratifiedSample + epoch 0
    val viaStrat = Sampling.stratifiedSample(docs, "lang", "doc_id",
        Map("fr" -> 0.5), defaultRate = 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaUp = up.filter(_._2 == "fr").map(_._1).toSet
    assert(viaUp == viaStrat)
  }

  test("upsample is monotone in rate: (row, epoch) pairs only ever grow") {
    def pairs(r: Double): Set[(Long, Long)] =
      Sampling.upsample(docs, "lang", "doc_id", Map("en" -> r))
        .select("doc_id", "epoch").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val grid = Seq(0.3, 1.0, 1.3, 1.7, 2.0, 2.7, 3.0)
    grid.sliding(2).foreach { case Seq(lo, hi) =>
      assert(pairs(lo).subsetOf(pairs(hi)), s"rate $lo not a subset of $hi")
    }
  }

  test("weightedPerStratumSample: exact k, zero/null weights out, weight monotone") {
    import spark.implicits._
    val rows = (1L to 60L).map(i =>
      (i, if (i % 2 == 0) "a" else "b",
        if (i % 10 == 0) 0.0 else 1.0 + (i % 5))) :+ ((61L, "a", -3.0)) :+ ((62L, "b", 0.0))
    val df = rows.toDF("id", "grp", "w")
    val got = Sampling.weightedPerStratumSample(df, "grp", "id", "w", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.count(_._2 == "a") == 10 && got.count(_._2 == "b") == 10)
    assert(got.forall(_._3 > 0.0), "non-positive weights must never sample")
    // tiny stratum: kept whole
    val tiny = Sampling.weightedPerStratumSample(
        Seq((1L, "x", 2.0), (2L, "x", 5.0)).toDF("id", "grp", "w"), "grp", "id", "w", 10)
      .count()
    assert(tiny == 2L)
    // monotone in weight: growing a selected doc's weight keeps it selected
    val base = Sampling.weightedPerStratumSample(df, "grp", "id", "w", 10)
      .collect().map(_.getLong(0)).toSet
    val someSelected = base.head
    val boosted = df.withColumn("w",
      when(col("id") === someSelected, col("w") * 100).otherwise(col("w")))
    val after = Sampling.weightedPerStratumSample(boosted, "grp", "id", "w", 10)
      .collect().map(_.getLong(0)).toSet
    assert(after.contains(someSelected), "raising a selected doc's weight must keep it")
    // deterministic
    val again = Sampling.weightedPerStratumSample(df, "grp", "id", "w", 10)
      .collect().map(_.getLong(0)).toSet
    assert(again == base)
  }

  test("upsample drops NULL keys (module-wide convention)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "en"), Row(null, "en")),
      StructType(Seq(StructField("doc_id", LongType), StructField("lang", StringType))))
    val out = Sampling.upsample(withNull, "lang", "doc_id", Map("en" -> 2.0))
      .select("doc_id").collect().map(_.getLong(0))
    assert(out.forall(_ == 1L), "NULL-key rows drop, never replicate")
    assert(out.length === 2)
  }

  test("upsample guards absurd rates loudly") {
    intercept[IllegalArgumentException] {
      Sampling.upsample(docs, "lang", "doc_id", Map("en" -> 65.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.upsample(docs, "lang", "doc_id", Map("en" -> 2.0), defaultRate = -0.1)
    }
  }

  test("unimaxAllocation: water-fill caps small strata, releases budget to larger ones") {
    import spark.implicits._
    val df = ((1 to 10).map(i => (i.toLong, "a")) ++
      (11 to 50).map(i => (i.toLong, "b")) ++
      (51 to 150).map(i => (i.toLong, "c"))).toDF("id", "s")
    val got = Sampling.unimaxAllocation(df, "s", budget = 120L, maxEpochs = 1.5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // caps: a 15, b 60, c 150. Fill ascending: a min(15, 120/3)=15 (capped),
    // b min(60, 105/2)=52, c min(150, 53)=53 — a's unused share flowed on
    assert(got == Map(
      "a" -> ((10L, 15L, 15L)),
      "b" -> ((40L, 60L, 52L)),
      "c" -> ((100L, 150L, 53L))))
    assert(got.values.map(_._3).sum == 120L, "this fill spends the whole budget")
    // budget above total caps: every stratum capped, budget not exceeded
    val capped = Sampling.unimaxAllocation(df, "s", budget = 10000L, maxEpochs = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(capped == Map("a" -> 10L, "b" -> 40L, "c" -> 100L))
  }

  test("takeQuotas: per-stratum md5-rank take, min(quota, size) rows, unlisted strata drop") {
    import spark.implicits._
    val df = ((1 to 10).map(i => (i.toLong, "a")) ++
      (11 to 50).map(i => (i.toLong, "b")) ++
      (51 to 60).map(i => (i.toLong, "z"))).toDF("id", "s")
    val got = Sampling.takeQuotas(df, "s", "id", Map("a" -> 15L, "b" -> 7L), salt = "t")
    val byStratum = got.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(byStratum == Map("a" -> 10L, "b" -> 7L)) // quota>size keeps all; z unlisted
    // deterministic: rerun picks the identical rows
    val ids1 = got.select("id").as[Long].collect().toSet
    val ids2 = Sampling.takeQuotas(df, "s", "id", Map("a" -> 15L, "b" -> 7L), salt = "t")
      .select("id").as[Long].collect().toSet
    assert(ids1 == ids2)
  }

  test("temporalSplitEmbargo: cutoff at ceil(frac·n), embargo gap excluded, cutoff ties are test") {
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // 10 rows at seconds 1..9 with second 8 duplicated — ceil(0.8·10)=8, the
    // 8th row by time is the FIRST second-8 row, so cutoff = t8 and both
    // t8 rows (ties) land in test
    val rows = ((1 to 9).map(i => (i.toLong, Option(ts(i)))) :+ (10L, Option(ts(8)))) :+
      (99L, Option.empty[java.sql.Timestamp])
    val df = rows.toDF("event_id", "ts")
    val got = Sampling.temporalSplitEmbargo(df, "ts", frac = 0.8, embargoSeconds = 2L)
      .select("event_id", "split").as[(Long, String)].collect().toMap
    assert(!got.contains(99L), "NULL-time row must be dropped")
    assert(got.filter(_._2 == "test").keySet == Set(8L, 10L, 9L))
    // train is STRICTLY before cutoff − embargo = 8 − 2 = 6
    assert(got.filter(_._2 == "train").keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(got.filter(_._2 == "embargo").keySet == Set(6L, 7L))
  }

  test("temporalSplitEmbargo: zero embargo leaves no gap; frac bounds enforced") {
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val df = (1 to 10).map(i => (i.toLong, ts(i))).toDF("event_id", "ts")
    val got = Sampling.temporalSplitEmbargo(df, "ts", frac = 0.5, embargoSeconds = 0L)
      .select("event_id", "split").as[(Long, String)].collect().toMap
    assert(got.values.toSet == Set("train", "test"))
    assert(got.filter(_._2 == "train").keySet == (1L to 4L).toSet)
    intercept[IllegalArgumentException] {
      Sampling.temporalSplitEmbargo(df, "ts", frac = 1.0, embargoSeconds = 0L)
    }
  }

  test("topFractionPerGroup: exactly ceil(frac·n) per group, score-desc with key tie canon") {
    import spark.implicits._
    val df = Seq(
      // group A, 5 rows: scores 9, 7, 7, 3, 1 — frac 0.4 keeps ceil(2) = 2
      ("A", 1L, 9.0), ("A", 5L, 7.0), ("A", 2L, 7.0), ("A", 3L, 3.0), ("A", 4L, 1.0),
      // group B, 1 row: ceil(0.4) = 1 keeps it
      ("B", 10L, 0.5),
      // dropped rows: NULL key, NaN score
      ("A", 0L, Double.NaN))
      .toDF("grp", "id", "score")
      .unionByName(Seq(("A", Option.empty[Long], 99.0)).toDF("grp", "id", "score"))
    val got = Sampling.topFractionPerGroup(df, "grp", "id", "score", frac = 0.4)
      .select("grp", "id").as[(String, Long)].collect().toSet
    // the 7.0 tie breaks toward the smaller id: 2 beats 5
    assert(got == Set(("A", 1L), ("A", 2L), ("B", 10L)))
    // frac = 1.0 keeps every valid row
    val all = Sampling.topFractionPerGroup(df, "grp", "id", "score", frac = 1.0)
    assert(all.count() == 6)
    // partition invariance
    val many = Sampling.topFractionPerGroup(df.repartition(9), "grp", "id", "score", 0.4)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(many == got)
  }
}
