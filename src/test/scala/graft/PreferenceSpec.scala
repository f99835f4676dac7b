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
}
