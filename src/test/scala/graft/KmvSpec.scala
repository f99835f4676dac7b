package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Kmv

class KmvSpec extends SparkSpec {

  import spark.implicits._

  private val k = 16

  private def rows(pairs: (String, String)*): DataFrame =
    pairs.toDF("g", "item")

  /** Items g0..g{n-1} under one group. */
  private def group(g: String, n: Int): Seq[(String, String)] =
    (0 until n).map(i => (g, s"item$i"))

  private def collectSketch(sk: DataFrame): Seq[(String, Int, Long)] =
    sk.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq.sorted

  test("below k distinct: sketch holds every hash and the estimate is exact") {
    val df = rows(group("a", 7) ++ group("b", 3): _*)
    val sk = Kmv.sketch(df, "g", "item", k)
    assert(sk.filter(col("g") === "a").count() === 7)
    assert(sk.filter(col("g") === "b").count() === 3)
    val est = Kmv.estimate(sk, "g", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("a" -> 7L, "b" -> 3L))
  }

  test("duplicates don't inflate: distinct hashing makes the sketch multiplicity-blind") {
    val once = rows(group("a", 10): _*)
    val thrice = rows((group("a", 10) ++ group("a", 10) ++ group("a", 10)): _*)
    assert(collectSketch(Kmv.sketch(once, "g", "item", k)) ===
      collectSketch(Kmv.sketch(thrice, "g", "item", k)))
  }

  test("partition invariance: 1, 3, and 11 partitions produce the identical sketch") {
    val df = rows(group("a", 200) ++ group("b", 50): _*)
    val base = collectSketch(Kmv.sketch(df.repartition(1), "g", "item", k))
    assert(base === collectSketch(Kmv.sketch(df.repartition(3), "g", "item", k)))
    assert(base === collectSketch(Kmv.sketch(df.repartition(11), "g", "item", k)))
    assert(base.count(_._1 == "a") === k)
  }

  test("merge of shard sketches equals the whole-corpus sketch exactly") {
    val all = group("a", 300) ++ group("b", 40)
    val (shard1, shard2) = all.splitAt(137)
    val whole = Kmv.sketch(rows(all: _*), "g", "item", k)
    val merged = Kmv.merge(
      Kmv.sketch(rows(shard1: _*), "g", "item", k),
      Kmv.sketch(rows(shard2: _*), "g", "item", k),
      "g", k)
    assert(collectSketch(whole) === collectSketch(merged))
  }

  test("overlapping shards merge without double counting (union semantics)") {
    val all = group("a", 120)
    val whole = Kmv.sketch(rows(all: _*), "g", "item", k)
    val merged = Kmv.merge(
      Kmv.sketch(rows(all.take(90): _*), "g", "item", k),
      Kmv.sketch(rows(all.drop(30): _*), "g", "item", k), // 60 items overlap
      "g", k)
    assert(collectSketch(whole) === collectSketch(merged))
  }

  test("estimate accuracy on a known cardinality (deterministic, not a luck assert)") {
    // 5000 distinct items at k=64: the estimator's relative standard error
    // is ~1/sqrt(k-2) ≈ 12.7%. The md5 hash stream is fixed, so the
    // observed error is a constant of the implementation — assert a bound
    // comfortably above the theoretical RSE but far below uselessness.
    val big = 64
    val df = rows((0 until 5000).map(i => ("a", s"x$i")): _*)
    val est = Kmv.estimateAll(df, "g", "item", big)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rel = math.abs(est("a") - 5000.0) / 5000.0
    assert(rel < 0.3, s"estimate ${est("a")} off by ${rel * 100}%")
  }

  test("null groups and null items are excluded") {
    val df = Seq[(String, String)](("a", "x"), ("a", null), (null, "y"), ("b", "z"))
      .toDF("g", "item")
    val sk = Kmv.sketch(df, "g", "item", k)
    assert(sk.select("g").distinct().as[String].collect().toSet === Set("a", "b"))
    assert(sk.count() === 2) // only (a,x) and (b,z) hashed
  }

  test("pos is 1-based ascending by hash within each group") {
    val df = rows(group("a", 40): _*)
    val sk = Kmv.sketch(df, "g", "item", k).orderBy("pos")
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(sk.map(_._1).toSeq === (1 to k))
    assert(sk.map(_._2).toSeq === sk.map(_._2).sorted.toSeq)
  }

  test("k guard") {
    intercept[IllegalArgumentException] {
      Kmv.sketch(rows(("a", "x")), "g", "item", 1)
    }
  }

  test("jaccardEstimate: identical sets → jaccard 1, disjoint small sets → exact") {
    val a = Kmv.sketch(rows(group("a", 10): _*), "g", "item", k)
    val same = Kmv.jaccardEstimate(a, a, "g", k)
      .select("n_merged", "n_both", "jaccard", "est_union", "est_intersection")
      .head()
    assert(same.getLong(0) == 10L && same.getLong(1) == 10L)
    assert(same.getDouble(2) == 1.0)
    assert(same.getLong(3) == 10L, "sub-k union sketch is exact")
    assert(same.getLong(4) == 10L)

    // disjoint 10+10 = 20 distinct hashes with k=32: union stays exact
    val a32 = Kmv.sketch(rows(group("a", 10): _*), "g", "item", 32)
    val b32 = Kmv.sketch(
      rows((0 until 10).map(i => ("a", s"other$i")): _*), "g", "item", 32)
    val disj = Kmv.jaccardEstimate(a32, b32, "g", 32)
      .select("n_merged", "n_both", "jaccard", "est_union", "est_intersection")
      .head()
    assert(disj.getLong(0) == 20L && disj.getLong(1) == 0L)
    assert(disj.getDouble(2) == 0.0 && disj.getLong(4) == 0L)
    assert(disj.getLong(3) == 20L, "20 < k ⇒ union exact")
  }

  test("jaccardEstimate: 50% overlap estimates near truth above k") {
    // A = 0..599, B = 300..899: |A∪B| = 900, |A∩B| = 300, J = 1/3
    val a = Kmv.sketch(rows((0 until 600).map(i => ("a", s"v$i")): _*), "g", "item", 64)
    val b = Kmv.sketch(rows((300 until 900).map(i => ("a", s"v$i")): _*), "g", "item", 64)
    val r = Kmv.jaccardEstimate(a, b, "g", 64)
      .select("jaccard", "est_union", "est_intersection").head()
    val j = r.getDouble(0); val u = r.getLong(1); val i = r.getLong(2)
    assert(math.abs(j - 1.0 / 3.0) < 0.2, s"jaccard $j far from 1/3")
    assert(math.abs(u - 900.0) / 900.0 < 0.35, s"union est $u far from 900")
    assert(math.abs(i - 300.0) / 300.0 < 0.6, s"intersection est $i far from 300")
  }

  test("jaccardEstimate: group present in only one sketch gets jaccard 0") {
    val a = Kmv.sketch(rows(("a", "x"), ("a", "y")), "g", "item", k)
    val b = Kmv.sketch(rows(("b", "z")), "g", "item", k)
    val out = Kmv.jaccardEstimate(a, b, "g", k)
      .select("g", "n_both").as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 0L, "b" -> 0L))
  }
}
