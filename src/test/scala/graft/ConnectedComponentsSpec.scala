package graft

import org.apache.spark.sql.functions._

import graft.ops.{ConnectedComponents, Dedup}

/** Alternating-star connected components: equivalence with a driver-side
  * union-find on random graphs, logarithmic convergence on a pathological
  * chain, and the dedup-cluster contract over LSH pairs.
  */
class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(i => i)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the component minimum (union always roots the min)
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("matches union-find on random graphs across densities") {
    val rnd = new scala.util.Random(42)
    Seq(0.2, 1.0, 3.0).foreach { density =>
      val n = 200
      val edges = (1 to (n * density).toInt)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expected = unionFind(n, edges)
      val vertices = (0 until n).map(_.toLong).toDF("id")
      val pairs = edges.toDF("id_a", "id_b")
      val got = ConnectedComponents.assign(vertices, "id", pairs, "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"mismatch at density $density")
    }
  }

  test("a bridge node pointing at two roots must not stop the iteration early") {
    // {(1,5),(3,5),(2,7),(3,7)} is ONE component (1-5-3-7-2), but after one
    // large/small round the edge set {(5,1),(7,2),(3,1),(3,2)} has disjoint
    // source/target sets while node 3 still bridges roots 1 and 2 — a probe
    // checking only "no target is a source" declares convergence here and
    // splits the component. Regression for the unique-parent condition.
    val vertices = Seq(1L, 2L, 3L, 5L, 7L).toDF("id")
    val pairs = Seq((1L, 5L), (3L, 5L), (2L, 7L), (3L, 7L)).toDF("id_a", "id_b")
    val got = ConnectedComponents.assign(vertices, "id", pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 7L -> 1L))
  }

  test("matches union-find on many small random graphs (bridge-prone shapes)") {
    // small sparse graphs hit the bridge-node early-stop case far more often
    // than the dense 200-node graphs above
    (1 to 30).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 30
      val edges = (1 to n)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expected = unionFind(n, edges)
      val vertices = (0 until n).map(_.toLong).toDF("id")
      val got = ConnectedComponents.assign(
          vertices, "id", edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"mismatch at seed $seed")
    }
  }

  test("a duplicate chain collapses to one cluster (star contraction, not propagation)") {
    // a 4096-node path is the worst case for min-label propagation (4096
    // rounds); star contraction must finish within the default round budget
    val n = 4096
    val vertices = (0 until n).map(_.toLong).toDF("id")
    val pairs = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    val got = ConnectedComponents.assign(vertices, "id", pairs, "id_a", "id_b")
      .as[(Long, Long)].collect()
    assert(got.length == n && got.forall(_._2 == 0L))
  }

  test("no pairs: every vertex is its own singleton cluster") {
    val vertices = Seq(5L, 7L, 9L).toDF("id")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = ConnectedComponents.assign(vertices, "id", pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((5L, 5L), (7L, 7L), (9L, 9L)))
  }

  test("incremental merge over prior stars equals batch over all pairs") {
    val rnd = new scala.util.Random(7)
    val n = 300
    val all = (1 to 600)
      .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val vertices = (0 until n).map(_.toLong).toDF("id")
    // batch over everything
    val batch = ConnectedComponents.assign(
        vertices, "id", all.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    // first half clustered, then the second half merged in — including
    // pairs that BRIDGE two prior components
    val (h1, h2) = all.splitAt(all.length / 2)
    val prior = ConnectedComponents.assign(
      vertices, "id", h1.toDF("id_a", "id_b"), "id_a", "id_b")
    val merged = ConnectedComponents.merge(prior, "id", h2.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(merged == batch)
  }

  test("dedup clusters over LSH pairs: transitive closure of the pair relation") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", numHashes = 8, bands = 2)
      .as[(Long, Long)].collect()
    val clusters = ConnectedComponents.assign(
        docs.select(col("doc_id")), "doc_id",
        Dedup.minhashLshPairs(docs, "doc_id", "text", numHashes = 8, bands = 2),
        "id_a", "id_b")
      .as[(Long, Long)].collect().toMap

    // every doc is labeled; paired docs share a label; the label is the
    // component minimum, so canonical docs label themselves
    assert(clusters.size == docs.count())
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    clusters.values.foreach(c => assert(clusters(c) == c, s"root $c not self-labeled"))
    // and the clustering is no coarser than the pairs' transitive closure
    val ids = clusters.keys.toSeq.sorted
    val idx = ids.zipWithIndex.toMap
    val uf = unionFind(ids.length, pairs.map { case (a, b) => (idx(a).toLong, idx(b).toLong) })
    val expected = ids.map(i => i -> ids(uf(idx(i).toLong).toInt)).toMap
    assert(clusters == expected)
  }
}
