package graft

import graft.ops.PageRank

/** Integer-quantized PageRank: known geometries, mass conservation bound,
  * partitioning determinism, and the guard rails.
  */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int = 10): Map[Long, Long] =
    PageRank.run(edges.toDF("s", "d"), "s", "d", iterations = iters)
      .as[(Long, Long)].collect().toMap

  test("star graph: the 0↔1 cycle holds the mass, spokes tie at base") {
    // 1,2,3,4 all link to 0; 0 links back to 1 — mass oscillates inside
    // the 0↔1 two-cycle (period-2 fixpoint of damped iteration), but both
    // cycle members dominate the feed-only spokes at every iteration count
    val r = ranksOf(Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L)))
    assert(r(0L) > r(2L) && r(1L) > r(2L), s"cycle members > plain spokes: $r")
    assert(r(2L) == r(3L) && r(3L) == r(4L), s"symmetric spokes tie exactly: $r")
  }

  test("ring graph: perfect symmetry gives exactly equal ranks") {
    val n = 6L
    val r = ranksOf((0L until n).map(i => (i, (i + 1) % n)))
    assert(r.values.toSet.size == 1, s"ring ranks must all be equal: $r")
    // total mass ≈ scale, short only by integer truncation
    val total = r.values.sum
    assert(total <= 1000000000000L && total > 999999000000L,
      s"mass conserved up to truncation, got $total")
  }

  test("deterministic under repartitioning: 1-partition ≡ 17-partition run") {
    val edges = (0L until 60L).flatMap(i => Seq((i, (i * 7 + 1) % 60L), (i, (i * 13 + 5) % 60L)))
    val df1 = edges.toDF("s", "d").repartition(1)
    val df17 = edges.toDF("s", "d").repartition(17)
    val a = PageRank.run(df1, "s", "d", iterations = 6).as[(Long, Long)].collect().toMap
    val b = PageRank.run(df17, "s", "d", iterations = 6).as[(Long, Long)].collect().toMap
    assert(a == b, "integer arithmetic must make the fixpoint partition-invariant")
  }

  test("duplicate edges and null endpoints are dropped") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (1L, 2L), (2L, 1L), (null, 1L), (1L, null))
      .toDF("s", "d")
    val r = PageRank.run(df, "s", "d", iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(r.keySet == Set(1L, 2L))
    assert(r(1L) == r(2L), "the deduped 2-cycle is symmetric")
  }

  test("guards: empty graph, bad damping, unscaled scale") {
    intercept[IllegalArgumentException] {
      PageRank.run(Seq((1L, 2L)).toDF("s", "d"), "s", "d", iterations = 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.run(Seq((1L, 2L)).toDF("s", "d"), "s", "d", 1, dampingPct = 101)
    }
    intercept[IllegalArgumentException] {
      PageRank.run(Seq((1L, 2L)).toDF("s", "d"), "s", "d", 1, scale = 999L)
    }
  }
}
