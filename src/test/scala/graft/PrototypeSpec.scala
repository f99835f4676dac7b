package graft

import org.apache.spark.sql.functions._

import graft.ops.{IvfIndex, Prototype, SemanticDedup}

/** D4 prototypicality pruning: assignment/rank determinism on a known
  * geometry, the floor-fraction drop counts, and composition with
  * SemDeDup (the full D4 recipe).
  */
class PrototypeSpec extends SparkSpec {

  import spark.implicits._

  // two obvious clusters on the axes; ids ordered so ties are visible
  private lazy val vecs = Seq(
    (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.8, 0.2)),
    (10L, Seq(0.0, 1.0)), (11L, Seq(0.1, 0.9)), (12L, Seq(0.2, 0.8)),
    (13L, Seq(0.3, 0.7))
  ).toDF("id", "vec")

  private lazy val centroids = Seq(
    (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))
  ).toDF("cell", "cv")

  test("prototypicality: nearest-centroid assignment and in-cluster rank") {
    val out = Prototype.prototypicality(vecs, "id", "vec", centroids)
      .select("id", "cell", "rank", "n_cluster")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // cluster 0: 0 (cos 1.0) > 1 > 2 ; cluster 1: 10 > 11 > 12 > 13
    assert(out(0L) == ((0L, 1L, 3L)))
    assert(out(1L) == ((0L, 2L, 3L)))
    assert(out(2L) == ((0L, 3L, 3L)))
    assert(out(10L) == ((1L, 1L, 4L)))
    assert(out(11L) == ((1L, 2L, 4L)))
    assert(out(12L) == ((1L, 3L, 4L)))
    assert(out(13L) == ((1L, 4L, 4L)))
  }

  test("prototypicality: rounded-cosine ties break on the smaller id") {
    val tied = Seq((5L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0)), (7L, Seq(0.5, 0.5)))
      .toDF("id", "vec")
    val out = Prototype.prototypicality(tied, "id", "vec",
      Seq((0L, Seq(1.0, 0.0))).toDF("cell", "cv"))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(out(3L) == 1L && out(5L) == 2L && out(7L) == 3L)
  }

  test("prune: floor-fraction drops from both ends, keep respects rank order") {
    // cluster 1 has 4 members: dropTop 0.25 → floor(1) = rank 1 out;
    // dropBottom 0.25 → rank 4 out; keep = ranks 2..3
    val out = Prototype.prune(vecs, "id", "vec", centroids,
      dropTopFrac = 0.25, dropBottomFrac = 0.25)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out(10L) == false && out(11L) == true && out(12L) == true && out(13L) == false)
    // cluster 0 has 3 members: floor(0.75) = 0 top, floor(0.75) = 0 bottom — all kept
    assert(out(0L) && out(1L) && out(2L))
    // zero fractions keep everything
    val all = Prototype.prune(vecs, "id", "vec", centroids, 0.0, 0.0)
      .filter(!col("keep")).count()
    assert(all == 0)
  }

  test("D4 composition: SemDeDup then prototype-prune on the sf0.001 embeddings") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = IvfIndex.build(emb, "vec_id", "embedding", nCells = 8)
    val cents = spark.createDataFrame(idx.centroids.map { case (c, v) => (c, v) })
      .toDF("cell", "cv")
    val withCluster = emb.join(
      idx.assignments.withColumnRenamed("cell", "cluster"), "vec_id")
    val afterSem = SemanticDedup
      .semanticKeep(withCluster, "vec_id", "embedding", "cluster", eps = 0.99)
      .filter(col("keep")).select("vec_id")
    val pruned = Prototype.prune(emb.join(afterSem, "vec_id"), "vec_id", "embedding",
      cents, dropTopFrac = 0.2)
    val n = afterSem.count()
    val kept = pruned.filter(col("keep")).count()
    assert(kept > 0 && kept < n)
    // per-cluster drop count is exactly floor(0.2 · n_cluster)
    val perCluster = Prototype
      .prototypicality(emb.join(afterSem, "vec_id"), "vec_id", "embedding", cents)
      .groupBy("cell").count().as[(Long, Long)].collect().toMap
    val dropped = pruned.filter(!col("keep")).groupBy("cell").count()
      .as[(Long, Long)].collect().toMap
    perCluster.foreach { case (cell, cnt) =>
      assert(dropped.getOrElse(cell, 0L) == math.floor(0.2 * cnt).toLong,
        s"cell $cell: ${dropped.getOrElse(cell, 0L)} dropped of $cnt")
    }
  }
}
