package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** Bucketed interval joins (RangeJoin): result equivalence against the
  * naive theta-join, exactly-once pair emission across bucket boundaries,
  * and the plan shape that makes them scale — a keyed equi-join, not the
  * BroadcastNestedLoop plan a raw range predicate gets.
  */
class RangeJoinSpec extends SparkSpec {

  private def intervals(rows: Seq[(Long, Long, Long, Long)], p: String): DataFrame = {
    import spark.implicits._
    rows.toDF(s"${p}_key", s"${p}_id", s"${p}_start", s"${p}_end")
  }

  /** Ground truth via the plain (nested-loop) theta join. The nonempty
    * guards are part of the semantics: the pairwise predicate alone
    * wrongly matches empty intervals sitting inside another interval.
    */
  private def naiveOverlap(l: DataFrame, r: DataFrame): Set[(Long, Long)] =
    l.join(r, col("l_key") === col("r_key")
        && col("l_start") < col("l_end") && col("r_start") < col("r_end")
        && col("l_start") < col("r_end") && col("r_start") < col("l_end"))
      .select(col("l_id"), col("r_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet

  private def pairs(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq

  test("overlap matches the naive theta join on a deterministic random mix") {
    // md5-derived pseudo-random intervals: dense keys, lengths 0..~3 buckets
    val rnd = (i: Int, salt: String) =>
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$salt:$i".getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString, 16)
    val left = intervals((0 until 300).map { i =>
      val s = rnd(i, "ls") % 10000
      (rnd(i, "lk") % 7, i.toLong, s, s + rnd(i, "ll") % 3000)
    }, "l")
    val right = intervals((0 until 300).map { i =>
      val s = rnd(i, "rs") % 10000
      (rnd(i, "rk") % 7, 1000L + i, s, s + rnd(i, "rl") % 3000)
    }, "r")

    val got = pairs(RangeJoin.overlap(left, right, "l_start", "l_end", "r_start", "r_end",
      Seq("l_key"), Seq("r_key"), bucketWidth = 1000L).select("l_id", "r_id"))
    assert(got.size === got.toSet.size, "each overlapping pair must be emitted exactly once")
    assert(got.toSet === naiveOverlap(left, right))
  }

  test("overlap is exactly-once when intervals span many buckets") {
    // bucketWidth 10 forces both intervals across ~40 shared buckets;
    // the pair must still appear once
    val l = intervals(Seq((1L, 1L, 0L, 400L)), "l")
    val r = intervals(Seq((1L, 2L, 50L, 350L)), "r")
    val got = pairs(RangeJoin.overlap(l, r, "l_start", "l_end", "r_start", "r_end",
      Seq("l_key"), Seq("r_key"), bucketWidth = 10L).select("l_id", "r_id"))
    assert(got === Seq((1L, 2L)))
  }

  test("half-open semantics: touching endpoints do not overlap, empty intervals drop") {
    val l = intervals(Seq((1L, 1L, 0L, 100L), (1L, 2L, 500L, 500L)), "l")
    val r = intervals(Seq((1L, 10L, 100L, 200L), (1L, 11L, 400L, 600L)), "r")
    val got = pairs(RangeJoin.overlap(l, r, "l_start", "l_end", "r_start", "r_end",
      Seq("l_key"), Seq("r_key"), bucketWidth = 86400L).select("l_id", "r_id"))
    assert(got.isEmpty) // [0,100) vs [100,200) touch; [500,500) is empty
  }

  test("negative epochs bucket correctly (floor, not truncate-toward-zero)") {
    val l = intervals(Seq((1L, 1L, -150L, -50L)), "l")
    val r = intervals(Seq((1L, 2L, -100L, 10L)), "r")
    val got = pairs(RangeJoin.overlap(l, r, "l_start", "l_end", "r_start", "r_end",
      Seq("l_key"), Seq("r_key"), bucketWidth = 100L).select("l_id", "r_id"))
    assert(got === Seq((1L, 2L)))
  }

  test("pointInInterval matches the naive containment join") {
    import spark.implicits._
    val points = (0 until 500).map(i => (i.toLong % 5, i.toLong, (i * 37L) % 10000))
      .toDF("p_key", "p_id", "p_ts")
    val iv = intervals((0 until 100).map { i =>
      val s = (i * 211L) % 9000
      (i.toLong % 5, i.toLong, s, s + 700)
    }, "l")
    val got = pairs(RangeJoin.pointInInterval(points, iv, "p_ts", "l_start", "l_end",
      Seq("p_key"), Seq("l_key"), bucketWidth = 1000L).select("p_id", "l_id"))
    val want = points.join(iv, col("p_key") === col("l_key")
        && col("l_start") <= col("p_ts") && col("p_ts") < col("l_end"))
      .select(col("p_id"), col("l_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got.size === got.toSet.size)
    assert(got.toSet === want)
  }

  test("plan is a keyed equi-join — no nested-loop, no cartesian") {
    val l = intervals(Seq((1L, 1L, 0L, 100L)), "l")
    val r = intervals(Seq((1L, 2L, 50L, 150L)), "r")
    val plan = RangeJoin.overlap(l, r, "l_start", "l_end", "r_start", "r_end",
      Seq("l_key"), Seq("r_key"), bucketWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
