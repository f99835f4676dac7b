package graft

import org.apache.spark.sql.functions._

import graft.ops.CountMin

class CountMinSpec extends SparkSpec {

  import spark.implicits._

  private val depth = 3
  private val width = 64

  private def docs = spark.read.parquet(sf("documents"))

  private def exactCounts: Map[String, Long] =
    docs.select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

  test("one-sided error: estimate >= true count for every corpus token") {
    val exact = exactCounts
    val est = CountMin.estimateAll(docs, "text", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (tok, cnt) =>
      assert(est(tok) >= cnt, s"token '$tok': est=${est(tok)} < true=$cnt")
    }
  }

  test("collision-free tokens are estimated exactly (per-row audit, no luck involved)") {
    val exact = exactCounts
    val toks = exact.keySet.toSeq
    // Recompute each token's buckets with the same md5 derivation,
    // driver-side: a token whose bucket in SOME row is shared with no other
    // token must be estimated exactly (that row's counter holds only it).
    def bucket(r: Int, tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cms$r:$tok".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % width
    }
    val collisionFree = toks.filter { tok =>
      (0 until depth).exists { r =>
        val b = bucket(r, tok)
        !toks.exists(o => o != tok && bucket(r, o) == b)
      }
    }
    assert(collisionFree.nonEmpty, "fixture corpus too dense for the audit to bite")
    val est = CountMin.estimateAll(docs, "text", depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    collisionFree.foreach { tok =>
      assert(est(tok) == exact(tok), s"collision-free '$tok' not exact")
    }
  }

  test("sketch total per row == total token count (counters are a partition of mass)") {
    val total = exactCounts.values.sum
    val perRow = CountMin.sketch(docs, "text", depth, width)
      .groupBy("row").agg(sum("cnt").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRow.keySet == (0 until depth).map(_.toLong).toSet)
    perRow.values.foreach(s => assert(s == total))
  }

  test("merge(sketch(A), sketch(B)) == sketch(A ∪ B) counter-for-counter") {
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 =!= 0)
    val merged = CountMin.merge(
        CountMin.sketch(a, "text", depth, width),
        CountMin.sketch(b, "text", depth, width))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = CountMin.sketch(docs, "text", depth, width)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("partitioning-invariant: 1-partition and 7-partition sketches identical") {
    val one = CountMin.sketch(docs.repartition(1), "text", depth, width)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val seven = CountMin.sketch(docs.repartition(7), "text", depth, width)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(one == seven)
  }

  test("estimate handles unseen tokens (0) and null probes (dropped)") {
    val sk = CountMin.sketch(docs, "text", depth, width)
    // A token absent from the corpus can still collide into touched
    // counters, so its estimate is >= 0 — but with a WIDE sketch over a
    // tiny corpus a zero row proves the untouched-counter path coalesces.
    val wide = CountMin.sketch(docs.limit(1), "text", depth, width = 65536)
    val probes = Seq("zzz-never-in-corpus", null).toDF("token")
    val est = CountMin.estimate(wide, probes, "token", depth, width = 65536)
      .collect()
    assert(est.length == 1) // null probe dropped
    assert(est.head.getLong(1) >= 0L)
    val narrow = CountMin.estimate(sk, Seq("zzz-never-in-corpus").toDF("token"),
      "token", depth, width).collect()
    assert(narrow.head.getLong(1) >= 0L)
  }

  test("geometry guards fail loudly") {
    intercept[IllegalArgumentException] {
      CountMin.sketch(docs, "text", depth = 0, width = 64)
    }
    intercept[IllegalArgumentException] {
      CountMin.estimate(CountMin.sketch(docs, "text", 2, 8), docs.select(lit("a").as("t")),
        "t", depth = 2, width = 0)
    }
  }
}
