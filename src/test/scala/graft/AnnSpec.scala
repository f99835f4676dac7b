package graft

import org.apache.spark.sql.functions._

import graft.ops.{IvfIndex, SimilaritySearch, Skew}

/** ANN quality + skew utilities. */
class AnnSpec extends SparkSpec {

  import spark.implicits._

  lazy val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
  lazy val queryVec: Seq[Double] = emb.filter(col("vec_id") === 0)
    .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)

  test("IVF with all cells probed equals brute force; fewer probes keep recall") {
    val exact = SimilaritySearch.bruteForceTopK(emb, "vec_id", "embedding", queryVec, 10)
      .select("vec_id").as[Long].collect().toSet

    val index = IvfIndex.build(emb, "vec_id", "embedding", nCells = 16)
    assert(index.assignments.count() == emb.count()) // every vector assigned
    assert(index.assignments.select("cell").distinct().count() <= 16)

    // probing every cell must reproduce the exact result
    val all = IvfIndex.search(index, emb, "vec_id", "embedding", queryVec, 10, nProbe = 16)
      .select("vec_id").as[Long].collect().toSet
    assert(all == exact)

    // 4 of 16 probes: at least half the true top-10 should survive
    val approx = IvfIndex.search(index, emb, "vec_id", "embedding", queryVec, 10, nProbe = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(approx.intersect(exact).size >= 5,
      s"recall too low: ${approx.intersect(exact).size}/10")
  }

  test("IVF Lloyd refinement: deterministic, exact at nProbe=all, recall not worse") {
    val index = IvfIndex.build(emb, "vec_id", "embedding", nCells = 16)
    val refined = IvfIndex.refine(index, emb, "vec_id", "embedding", iterations = 3)
    // bit-identical across reruns AND physical layouts (DECIMAL-exact means)
    val again = IvfIndex.refine(
      IvfIndex.build(emb.repartition(13), "vec_id", "embedding", nCells = 16),
      emb.repartition(7), "vec_id", "embedding", iterations = 3)
    assert(refined.centroids == again.centroids)

    // probing every cell is still exact
    val exact = SimilaritySearch.bruteForceTopK(emb, "vec_id", "embedding", queryVec, 10)
      .select("vec_id").as[Long].collect().toSet
    val all = IvfIndex.search(refined, emb, "vec_id", "embedding", queryVec, 10, nProbe = 16)
      .select("vec_id").as[Long].collect().toSet
    assert(all == exact)

    // refined recall at nProbe=4 at least matches the unrefined index's
    def recall(i: IvfIndex.Index): Int =
      IvfIndex.search(i, emb, "vec_id", "embedding", queryVec, 10, nProbe = 4)
        .select("vec_id").as[Long].collect().toSet.intersect(exact).size
    assert(recall(refined) >= recall(index) - 1) // deterministic fixture; -1 slack for tie shifts
    assert(recall(refined) >= 5)
  }

  test("IVF index persists as a lake artifact: load == build, cells prune as partitions") {
    val index = IvfIndex.build(emb, "vec_id", "embedding", nCells = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_").toString
    IvfIndex.save(index, dir)
    val loaded = IvfIndex.load(spark, dir)

    assert(loaded.centroids.toSet == index.centroids.toSet)
    val built = IvfIndex.search(index, emb, "vec_id", "embedding", queryVec, 10, nProbe = 4)
      .as[(Long, Double)].collect().toSeq
    val reloaded = IvfIndex.search(loaded, emb, "vec_id", "embedding", queryVec, 10, nProbe = 4)
      .as[(Long, Double)].collect().toSeq
    assert(reloaded == built)

    // the probe filter must reach the scan as a partition filter — that's
    // the point of partitioning assignments by cell
    val probedPlan = loaded.assignments.filter(col("cell").isin(1L, 2L))
      .queryExecution.executedPlan.toString
    assert(probedPlan.contains("PartitionFilters") && probedPlan.contains("cell"),
      s"expected cell partition pruning in:\n$probedPlan")
  }

  test("LSH top-k returns plausible neighbors from the query bucket") {
    val got = SimilaritySearch.lshTopK(emb, "vec_id", "embedding", queryVec, 10, planes = 4)
    val rows = got.collect()
    assert(rows.nonEmpty)
    // query vector itself lands in its own bucket with cosine 1
    assert(rows.head.getAs[Long]("vec_id") == 0L)
    assert(rows.head.getAs[Double]("cos") == 1.0)
  }

  test("LSH index persists as a lake artifact: search over it == in-memory, bucket prunes") {
    val mem = SimilaritySearch.lshTopK(emb, "vec_id", "embedding", queryVec, 10, planes = 4)
      .as[(Long, Double)].collect().toSeq

    val index = SimilaritySearch.buildLshIndex(
      emb, "vec_id", "embedding", planes = 4, dims = queryVec.length)
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_").toString
    SimilaritySearch.saveLshIndex(index, dir)
    val loaded = SimilaritySearch.loadLshIndex(spark, dir)
    val persisted = SimilaritySearch.lshTopKIndexed(loaded, "vec_id", queryVec, 10)
      .as[(Long, Double)].collect().toSeq
    assert(persisted == mem)

    // the persisted geometry survives the round trip, and a wrong-length
    // query ERRORS instead of probing a confidently wrong bucket
    assert(loaded.planes == 4 && loaded.dims == queryVec.length)
    intercept[IllegalArgumentException] {
      SimilaritySearch.lshTopKIndexed(loaded, "vec_id", queryVec :+ 0.0, 10)
    }
    // a bare parquet dir without the meta file refuses to load
    intercept[IllegalArgumentException] {
      SimilaritySearch.loadLshIndex(
        spark, java.nio.file.Files.createTempDirectory("graft_lsh_bare_").toString)
    }

    // the driver-side bucket must be bit-identical to the column expression
    val qb = SimilaritySearch.lshBucketOf(queryVec, planes = 4)
    val colQb = emb.filter(col("vec_id") === 0)
      .select(SimilaritySearch.lshBucket(
        col("embedding").cast("array<double>"), 4, queryVec.length))
      .head().getLong(0)
    assert(qb == colQb)

    // the bucket filter must reach the scan as a partition filter — that's
    // the point of partitioning the index by bucket
    val plan = SimilaritySearch.lshTopKIndexed(loaded, "vec_id", queryVec, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition pruning in:\n$plan")
  }

  test("multi-probe LSH: zero probes == single bucket, more probes recover recall") {
    val index = SimilaritySearch.buildLshIndex(
      emb, "vec_id", "embedding", planes = 4, dims = queryVec.length)

    val single = SimilaritySearch.lshTopKIndexed(index, "vec_id", queryVec, 10)
      .as[(Long, Double)].collect().toSeq
    val zeroProbe = SimilaritySearch.lshTopKMultiProbe(index, "vec_id", queryVec, 10, 0)
      .as[(Long, Double)].collect().toSeq
    assert(zeroProbe == single)

    val exact = SimilaritySearch.bruteForceTopK(emb, "vec_id", "embedding", queryVec, 10)
      .select("vec_id").as[Long].collect().toSet
    def recall(extra: Int): Int = SimilaritySearch
      .lshTopKMultiProbe(index, "vec_id", queryVec, 10, extra)
      .select("vec_id").as[Long].collect().toSet.intersect(exact).size
    // probing is monotone: each added bucket can only add candidates
    val r = (0 to 4).map(recall)
    assert(r.zip(r.tail).forall { case (a, b) => b >= a }, s"recall not monotone: $r")
    // all 4 boundary flips probed (5 of 16 buckets) must materially beat
    // single-bucket recall on this fixture (neighbors beyond Hamming 1 of
    // the query's bucket remain out of reach by design — that's the
    // probes-vs-recall dial, not a defect)
    assert(r.last >= r.head + 2, s"multi-probe gained too little: $r")
    assert(r.last >= 4, s"Hamming-1 probing recall too low: $r")
  }

  test("salted aggregation equals plain aggregation") {
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    val plain = events.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .as[(String, Long, Double)].collect()
      .map { case (k, c, s) => (k, c, math.round(s * 100)) }.toSet
    val salted = Skew.saltedSumCount(events, Seq("event_type"), Seq("value"))
      .as[(String, Long, Double)].collect()
      .map { case (k, c, s) => (k, c, math.round(s * 100)) }.toSet
    assert(salted == plain)
  }

  test("salted join equals plain join, including unmatched left rows") {
    val facts = Seq((1, "x"), (1, "y"), (2, "z"), (9, "w")).toDF("k", "payload")
    val dim = Seq((1, "one"), (2, "two"), (3, "three")).toDF("k", "label")
    val plain = facts.join(dim, Seq("k"), "left")
      .select("k", "payload", "label").as[(Int, String, String)].collect().toSet
    val salted = Skew.saltedJoin(facts, dim, "k", salts = 8, joinType = "left")
      .select("k", "payload", "label").as[(Int, String, String)].collect().toSet
    assert(salted == plain)
  }
}
