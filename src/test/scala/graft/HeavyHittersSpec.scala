package graft

import org.apache.spark.sql.functions._

import graft.ops.HeavyHitters

/** Misra-Gries heavy hitters: exact equivalence to the full groupBy,
  * partitioning-independence, and behavior under adversarial decrement
  * pressure (many distinct light items).
  */
class HeavyHittersSpec extends SparkSpec {

  private def itemsDf(items: Seq[String], parts: Int) = {
    import spark.implicits._
    spark.sparkContext.parallelize(items, parts).toDF("item")
  }

  /** Ground truth: full shuffle groupBy + threshold. */
  private def exact(items: Seq[String], k: Int): Set[(String, Long)] = {
    val n = items.size
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }
      .toSet
  }

  test("matches the exact groupBy result on a skewed mix") {
    // 3 heavy items + a long tail of distinct light ones
    val items = Seq.fill(400)("a") ++ Seq.fill(250)("b") ++ Seq.fill(120)("c") ++
      (0 until 230).map(i => s"tail$i")
    val got = HeavyHitters.frequent(itemsDf(items, 5), "item", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === exact(items, 10))
    assert(got.map(_._1) === Set("a", "b", "c"))
  }

  test("result is independent of partitioning") {
    val items = Seq.fill(100)("x") ++ Seq.fill(60)("y") ++ (0 until 140).map(i => s"t$i")
    val expected = exact(items, 8)
    Seq(1, 3, 11).foreach { parts =>
      val got = HeavyHitters.frequent(itemsDf(items, parts), "item", k = 8)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got === expected, s"parts=$parts")
    }
  }

  test("adversarial tail cannot evict a true heavy hitter (no false negatives)") {
    // one item at just over n/k, drowned in distinct singletons that force
    // constant decrements; MG must still surface it. Interleaved so the
    // decrement pressure hits the heavy counter throughout the stream:
    // every 4th slot pairs an "h" with a fresh singleton → 200 h in 1000.
    val items = (0 until 800).flatMap(i => if (i % 4 == 0) Seq("h", s"u$i") else Seq(s"u$i"))
    val n = items.size
    val k = 6
    assert(items.count(_ == "h").toLong * k > n, "fixture: h must be a true heavy hitter")
    val got = HeavyHitters.frequent(itemsDf(items, 4), "item", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === exact(items, k))
    assert(got.exists(_._1 == "h"))
  }

  test("NULL items are excluded from both the candidates and the threshold base") {
    import spark.implicits._
    // 40 "a" + 60 nulls: among non-null items "a" is 100%; against an
    // inflated n=100 at k=2 it would wrongly fail the 50% bar
    val df = (Seq.fill(40)(Some("a")) ++ Seq.fill(60)(None: Option[String]))
      .toDF("item")
    val got = HeavyHitters.frequent(df, "item", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("a", 40L)))
  }

  test("frequentTokens equals the exact token computation on real documents") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val toks = docs.select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val n = toks.count()
    val expected = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 30 > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = HeavyHitters.frequentTokens(docs, "text", k = 30)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expected && got.nonEmpty)
  }
}
