package graft

import graft.ops.Preference

/** DPO pair construction: tie canon, margin gating, degenerate groups,
  * unusable scores, and the top/bottom-k pruning bound.
  */
class PreferenceSpec extends SparkSpec {

  import spark.implicits._

  private def cand(rows: (Long, Long, Double)*) =
    rows.toDF("prompt", "id", "score")

  test("pairs: extremes with smaller-id tie canon on both sides") {
    val df = cand(
      (1L, 10L, 5.0), (1L, 11L, 5.0), // tied best — 10 wins
      (1L, 12L, 1.0), (1L, 13L, 1.0), // tied worst — 12 wins
      (2L, 20L, 9.0), (2L, 21L, 2.0))
    val out = Preference.pairs(df, "prompt", "id", "score")
      .as[(Long, Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 10L, 12L, 5.0, 1.0, 4.0),
      (2L, 20L, 21L, 9.0, 2.0, 7.0)))
  }

  test("pairs: margin gate, single-candidate prompts, and NaN/NULL scores drop") {
    val df = Seq(
      (1L, Some(10L), Some(4.0)), (1L, Some(11L), Some(3.5)), // margin 0.5 < 1.0
      (2L, Some(20L), Some(9.0)), (2L, Some(21L), Some(1.0)), // margin 8.0
      (3L, Some(30L), Some(5.0)),                             // lone candidate
      (4L, Some(40L), Some(Double.NaN)), (4L, Some(41L), None), // all unusable
      (5L, Some(50L), Some(2.0)), (5L, Some(51L), Some(Double.NaN)) // NaN out → lone
    ).toDF("prompt", "id", "score")
    val out = Preference.pairs(df, "prompt", "id", "score", minMargin = 1.0)
      .select("prompt").as[Long].collect().toSeq
    assert(out == Seq(2L))
  }

  test("pairsTopBottom: k² bound, strict score inequality, overlap never self-pairs") {
    val df = cand(
      (1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0), (1L, 4L, 4.0), (1L, 5L, 5.0),
      // prompt 2: two candidates, both in top-3 AND bottom-3
      (2L, 20L, 1.0), (2L, 21L, 1.0))
    val out = Preference.pairsTopBottom(df, "prompt", "id", "score", k = 3)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    val p1 = out.filter(_._1 == 1L)
    // top-3 = {5,4,3}, bottom-3 = {1,2,3}; pairs need chosen > rejected strictly
    assert(p1.map(r => (r._2, r._3)).toSet ==
      Set((5L, 1L), (5L, 2L), (5L, 3L), (4L, 1L), (4L, 2L), (4L, 3L), (3L, 1L), (3L, 2L)))
    assert(p1.forall(r => r._4 > r._5 && r._6 == r._4 - r._5))
    // equal scores never pair, identical candidate never self-pairs
    assert(!out.exists(_._1 == 2L))
  }

  test("groupAdvantage: z-scores sum to ~0 per group, degenerate groups get 0.0") {
    val df = cand(
      (1L, 10L, 2.0), (1L, 11L, 4.0), (1L, 12L, 6.0), // mean 4, pop-std sqrt(8/3)
      (2L, 20L, 5.0),                                  // lone candidate
      (3L, 30L, 7.0), (3L, 31L, 7.0))                  // zero variance
    val out = Preference.groupAdvantage(df, "prompt", "id", "score")
      .as[(Long, Long, Double, Double)].collect().map(r => r._2 -> r._4).toMap
    // the operator's exact op order: (s2·n − s1²)/n² then sqrt
    val std = math.sqrt((56.0 * 3.0 - 144.0) / 9.0)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out(10L) == r6((2.0 - 4.0) / std) && out(11L) == 0.0 &&
      out(12L) == r6((6.0 - 4.0) / std))
    assert(out(20L) == 0.0 && out(30L) == 0.0 && out(31L) == 0.0)
  }

  test("bestOfN: per-prompt argmax with tie canon, absolute threshold gate") {
    val df = cand(
      (1L, 10L, 9.0), (1L, 11L, 9.0), (1L, 12L, 1.0), // tie — 10 wins
      (2L, 20L, 3.0), (2L, 21L, 4.9))                  // best below threshold
    val out = Preference.bestOfN(df, "prompt", "id", "score", minScore = 5.0)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 10L, 9.0)))
  }

  test("pairsStream: latest emission per prompt equals batch pairs over everything seen") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.Preference.{Cand, PairUpdate}
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Cand]
    val q = Preference.pairsStream(source.toDS())
      .writeStream.outputMode("append").format("memory").queryName("dpo_stream").start()
    try {
      source.addData(Seq(Cand(1L, 10L, 5.0), Cand(1L, 11L, 2.0), Cand(2L, 20L, 1.0)))
      q.processAllAvailable()
      // wave 2: a new extreme on prompt 1, prompt 2 completes, NaN dropped
      source.addData(Seq(Cand(1L, 12L, 9.0), Cand(2L, 21L, 8.0),
        Cand(2L, 22L, Double.NaN)))
      q.processAllAvailable()
      val emissions = spark.table("dpo_stream").as[PairUpdate].collect()
      // deterministic replay: the per-prompt LAST emission is the live pair
      val latest = emissions.groupBy(_.promptId).map { case (p, es) => p -> es.last }
      val batch = Preference.pairs(
        Seq((1L, 10L, 5.0), (1L, 11L, 2.0), (1L, 12L, 9.0),
          (2L, 20L, 1.0), (2L, 21L, 8.0)).toDF("prompt", "id", "score"),
        "prompt", "id", "score")
        .as[(Long, Long, Long, Double, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      latest.foreach { case (p, u) =>
        val b = batch(p)
        assert((u.chosenId, u.rejectedId, u.chosenScore, u.rejectedScore) ==
          ((b._2, b._3, b._4, b._5)), s"prompt $p stream/batch disagree")
      }
      assert(latest.keySet == batch.keySet)
      // wave-1 lone candidate on prompt 2 must emit nothing (no pair yet)
      val wave1P2 = emissions.filter(e => e.promptId == 2L)
      assert(wave1P2.length == 1, "prompt 2 pairs only once both extremes exist")
    } finally q.stop()
  }

  test("pairsTopBottom with k=1 ≡ pairs at the same margin") {
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
      .filter($"user_id".isNotNull && $"event_id".isNotNull)
      .select($"user_id", $"event_id", $"value")
    val a = Preference.pairs(events, "user_id", "event_id", "value", minMargin = 10.0)
      .select("user_id", "chosen_id", "rejected_id")
      .as[(Long, Long, Long)].collect().toSet
    val b = Preference
      .pairsTopBottom(events, "user_id", "event_id", "value", k = 1, minMargin = 10.0)
      .select("user_id", "chosen_id", "rejected_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("bradleyTerry: winners rise, losers fall, symmetric fixture is antisymmetric") {
    // 1 beats 2 three times, loses once → θ1 > 0 > θ2, and with only these
    // two items the update is exactly antisymmetric
    val m = Seq((1L, 2L, 1L), (1L, 2L, 1L), (1L, 2L, 1L), (1L, 2L, 0L))
      .toDF("a", "b", "w")
    val got = Preference.bradleyTerry(m, "a", "b", "w")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L)._1 == 4L && got(2L)._1 == 4L)
    assert(got(1L)._2 > 0L && got(2L)._2 < 0L)
    assert(got(1L)._2 == -got(2L)._2, "two-item BT is exactly antisymmetric")
    // transitive chain: A beats B, B beats C (twice each) → θA > θB > θC
    val chain = Seq((10L, 20L, 1L), (10L, 20L, 1L), (20L, 30L, 1L), (20L, 30L, 1L))
      .toDF("a", "b", "w")
    val th = Preference.bradleyTerry(chain, "a", "b", "w")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(th(10L) > th(20L) && th(20L) > th(30L))
  }

  test("bradleyTerry: self-matches and NULL labels drop; partitioning never changes θ") {
    val m = Seq(
      (Some(1L), Some(2L), Some(1L)), (Some(1L), Some(1L), Some(1L)),
      (Some(1L), Some(2L), None), (None, Some(2L), Some(0L)),
      (Some(1L), Some(2L), Some(1L)))
      .toDF("a", "b", "w")
    val one = Preference.bradleyTerry(m.repartition(1), "a", "b", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val many = Preference.bradleyTerry(m.repartition(13), "a", "b", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(one == many, "integer gradient sums make the fixpoint partition-invariant")
    // only the two usable matches count as games
    assert(one.map(t => t._1 -> t._2).toMap == Map(1L -> 2L, 2L -> 2L))
  }

  test("cohenKappa: perfect agreement is 1, textbook fixture matches, constant raters are NULL") {
    def ratings(rows: Seq[(Long, String, Long)]) =
      rows.toDF("item", "rater", "label")
    // perfect agreement
    val perfect = Preference.cohenKappa(
      ratings((1L to 6L).flatMap(i => Seq((i, "a", i % 2), (i, "b", i % 2)))),
      "item", "rater", "label", "a", "b").head()
    assert(perfect.getAs[Double]("kappa") == 1.0 && perfect.getAs[Double]("po") == 1.0)
    // the classic 2x2 worked example: n=50, agree=20+15=35, marginals
    // a:(25,25) b:(30,20) -> pe=(25*30+25*20)/2500=0.5, kappa=(0.7-0.5)/0.5=0.4
    val rows =
      (1L to 20L).flatMap(i => Seq((i, "a", 1L), (i, "b", 1L))) ++        // yes/yes
      (21L to 25L).flatMap(i => Seq((i, "a", 1L), (i, "b", 0L))) ++       // yes/no
      (26L to 35L).flatMap(i => Seq((i, "a", 0L), (i, "b", 1L))) ++       // no/yes
      (36L to 50L).flatMap(i => Seq((i, "a", 0L), (i, "b", 0L)))          // no/no
    val classic = Preference.cohenKappa(ratings(rows), "item", "rater", "label", "a", "b").head()
    assert(classic.getAs[Long]("n_items") == 50L && classic.getAs[Long]("n_agree") == 35L)
    assert(classic.getAs[Double]("po") == 0.7 && classic.getAs[Double]("pe") == 0.5)
    assert(classic.getAs[Double]("kappa") == 0.4)
    // both raters constant -> pe = 1 -> undefined, reported NULL not 0
    val const = Preference.cohenKappa(
      ratings((1L to 4L).flatMap(i => Seq((i, "a", 1L), (i, "b", 1L)))),
      "item", "rater", "label", "a", "b").head()
    assert(const.isNullAt(const.fieldIndex("kappa")))
    // items missing one rater's label are excluded from every count
    val partial = Preference.cohenKappa(
      ratings(Seq((1L, "a", 1L), (1L, "b", 1L), (2L, "a", 0L), (3L, "b", 1L))),
      "item", "rater", "label", "a", "b").head()
    assert(partial.getAs[Long]("n_items") == 1L)
  }

  test("fleissKappa: hand-worked 3-rater panel, incomplete items drop, one-class NULL") {
    def ratings(rows: Seq[(Long, String, String)]) =
      rows.toDF("item", "rater", "label")
    // N=4, n=3: AAA / AAB / BBB / ABC.
    // Σn² = 9+5+9+3 = 26, A = 26−12 = 14, D1 = 24 → P̄ = 14/24 = 0.583333
    // col sums A=6 B=5 C=1 → S2 = 62, D2 = 144 → Pe = 62/144 = 0.430556
    // κ = (14·144 − 62·24)/(24·(144−62)) = 528/1968 = 0.268293
    val rows = Seq(
      (1L, "r1", "A"), (1L, "r2", "A"), (1L, "r3", "A"),
      (2L, "r1", "A"), (2L, "r2", "A"), (2L, "r3", "B"),
      (3L, "r1", "B"), (3L, "r2", "B"), (3L, "r3", "B"),
      (4L, "r1", "A"), (4L, "r2", "B"), (4L, "r3", "C"))
    val got = Preference.fleissKappa(ratings(rows), "item", "rater", "label", 3).head()
    assert(got.getAs[Long]("n_items") == 4L && got.getAs[Long]("n_raters") == 3L)
    assert(got.getAs[Double]("p_bar") == 0.583333)
    assert(got.getAs[Double]("p_e") == 0.430556)
    assert(got.getAs[Double]("kappa") == 0.268293)
    // an item rated by only 2 of the 3 panelists is excluded entirely
    val withPartial = Preference.fleissKappa(
      ratings(rows ++ Seq((5L, "r1", "A"), (5L, "r2", "A"))),
      "item", "rater", "label", 3).head()
    assert(withPartial.getAs[Long]("n_items") == 4L)
    assert(withPartial.getAs[Double]("kappa") == 0.268293)
    // every rating one class → Pe = 1 → undefined
    val oneClass = Preference.fleissKappa(
      ratings(Seq((1L, "r1", "A"), (1L, "r2", "A"), (1L, "r3", "A"))),
      "item", "rater", "label", 3).head()
    assert(oneClass.isNullAt(oneClass.fieldIndex("kappa")))
  }

  test("krippendorffAlpha: hand values with a missing rating, perfect = 1, one-class NULL") {
    def ratings(rows: Seq[(Long, String, String)]) = rows.toDF("item", "rater", "label")
    // i1: A,A  i2: A,B  i3: B,B  i4: B alone (unpairable, drops)
    // n = 6, margins A=3 B=3; D_o = 0 + 2 + 0 = 2; D_e = (36−18)/5 = 3.6
    // α = 1 − 2·5/18 = 0.444444̄ → 0.444444
    val rows = Seq(
      (1L, "r1", "A"), (1L, "r2", "A"),
      (2L, "r1", "A"), (2L, "r2", "B"),
      (3L, "r1", "B"), (3L, "r2", "B"),
      (4L, "r1", "B"))
    val got = Preference.krippendorffAlpha(ratings(rows), "item", "rater", "label").head()
    assert(got.getAs[Long]("n_items") == 3L && got.getAs[Long]("n_pairable") == 6L)
    assert(got.getAs[Long]("n_values") == 2L)
    assert(got.getAs[Double]("d_o") == 2.0 && got.getAs[Double]("d_e") == 3.6)
    assert(got.getAs[Double]("alpha") == 0.444444)
    // perfect agreement, variable panel sizes: D_o = 0 → α = 1 exactly
    val perfect = Preference.krippendorffAlpha(
      ratings(Seq((1L, "r1", "A"), (1L, "r2", "A"), (1L, "r3", "A"),
        (2L, "r1", "B"), (2L, "r2", "B"))),
      "item", "rater", "label").head()
    assert(perfect.getAs[Double]("alpha") == 1.0)
    // every pairable rating one value: D_e = 0 → undefined
    val oneClass = Preference.krippendorffAlpha(
      ratings(Seq((1L, "r1", "A"), (1L, "r2", "A"))),
      "item", "rater", "label").head()
    assert(oneClass.isNullAt(oneClass.fieldIndex("alpha")))
  }

  test("winRates: wilson lower bound demotes the lucky 2-0 below the solid 70-100") {
    // x beats y twice (2 games each); p beats q 70 of 100
    val matches =
      Seq(("x", "y", 1L), ("x", "y", 1L)) ++
      (1 to 70).map(_ => ("p", "q", 1L)) ++
      (1 to 30).map(_ => ("p", "q", 0L))
    val got = Preference.winRates(matches.toDF("item_a", "item_b", "win_a"),
      "item_a", "item_b", "win_a")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("x").getAs[Long]("games") == 2L && got("x").getAs[Long]("wins") == 2L)
    assert(got("x").getAs[Double]("win_rate") == 1.0)
    assert(got("p").getAs[Double]("win_rate") == 0.7)
    // raw rate ranks x first; the wilson bound flips the order
    assert(got("x").getAs[Double]("wilson_lb") < got("p").getAs[Double]("wilson_lb"))
    // exact replay of the fixed expression shape for the 2-0 case
    val z = 1.96; val zz = z * z; val n = 2.0; val ph = 1.0
    val lb = (ph + zz / (2.0 * n) - z * math.sqrt((ph * (1.0 - ph) + zz / (4.0 * n)) / n)) /
      (1.0 + zz / n)
    assert(got("x").getAs[Double]("wilson_lb") == math.floor(lb * 1e6 + 0.5) / 1e6)
    // zero-win item: bound clamps at (numerically) zero, never negative
    assert(got("y").getAs[Long]("wins") == 0L && got("y").getAs[Double]("wilson_lb") >= 0.0)
    assert(got("q").getAs[Double]("wilson_lb") < got("q").getAs[Double]("win_rate"))
  }
}
