package graft

import org.apache.spark.sql.functions._

import graft.ops.{IvfIndex, ProductQuantize, SimilaritySearch, Skew}

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

  test("IVFADC: full probe + full shortlist == exact sq-L2 top-k; partial probes keep recall") {
    val n = emb.count().toInt
    val q = array(queryVec.map(lit): _*)
    // the exact squared-L2 top-10 (the IVFADC distance contract)
    val exact = emb
      .select(col("vec_id"),
        Functions.roundHalfUp(
          Functions.vecSqDist(col("embedding").cast("array<double>"), q), 6).as("d2"))
      .orderBy(col("d2"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSet

    val idx = graft.ops.IvfAdc.build(emb, "vec_id", "embedding", nCells = 16, m = 4, k = 8)
    assert(idx.codes.count() == n, "every vector must carry codes")

    // probing every cell with a corpus-sized shortlist IS the exact search:
    // ADC only orders the shortlist cut, and the cut keeps everything
    val full = graft.ops.IvfAdc.search(idx, emb, "vec_id", "embedding", queryVec,
      k = 10, nProbe = 16, shortlist = n)
      .select("vec_id").as[Long].collect().toSet
    assert(full == exact, "full probe + full shortlist must equal exact sq-L2 top-k")

    // the production shape: 4/16 probes. Shortlist is the ADC-error dial:
    // at shortlist = corpus the rerank sees every probed candidate, so
    // recall equals pure-IVF cell recall (>= 5 on this fixture, matching
    // the IvfIndex test above); a tight 3x shortlist may drop a few more
    // to code coarseness (m=4, k=8 here) but must stay within 2 of it
    def recall(nProbe: Int, shortlist: Int): Int =
      graft.ops.IvfAdc.search(idx, emb, "vec_id", "embedding", queryVec,
        k = 10, nProbe = nProbe, shortlist = shortlist)
        .select("vec_id").as[Long].collect().toSet.intersect(exact).size
    // shortlist is the ADC-error dial: at shortlist = corpus the rerank
    // sees every probed candidate, so recall IS pure IVF cell recall
    // (>= 5 on this fixture, matching the IvfIndex test above); tighter
    // shortlists can only lose candidates — recall must be monotone in
    // the dial. (No absolute bound on tight shortlists here: these
    // synthetic embeddings are i.i.d. noise, the known worst case for PQ
    // compression — there is no cluster structure for codewords to
    // exploit, so the ADC ordering is weak by construction and the
    // operator's contract is the dial, not a constant.)
    val cellRecall = recall(4, n)
    assert(cellRecall >= 5, s"IVF cell recall too low: $cellRecall/10")
    val dial = Seq(10, 20, 30, n).map(recall(4, _))
    assert(dial.zip(dial.tail).forall { case (a, b) => b >= a },
      s"recall must be monotone in shortlist: $dial")
    assert(dial.last == cellRecall)

    // Lloyd-refined codebooks (refinePq) keep every deterministic
    // contract: full probe + full shortlist is still the exact answer
    val refined = graft.ops.IvfAdc.build(emb, "vec_id", "embedding",
      nCells = 16, m = 4, k = 8, refinePq = 2)
    val refinedFull = graft.ops.IvfAdc.search(refined, emb, "vec_id", "embedding",
      queryVec, k = 10, nProbe = 16, shortlist = n)
      .select("vec_id").as[Long].collect().toSet
    assert(refinedFull == exact,
      "refined codebooks must not break the full-probe exactness contract")
  }

  test("IVFADC artifact: searchSaved == search; unprobed cell bytes are never read; bare dir refused") {
    val idx = graft.ops.IvfAdc.build(emb, "vec_id", "embedding", nCells = 16, m = 4, k = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfadc_").toString
    graft.ops.IvfAdc.save(idx, dir)

    val direct = graft.ops.IvfAdc.search(idx, emb, "vec_id", "embedding", queryVec,
      k = 10, nProbe = 4, shortlist = 20).as[(Long, Double, Double)].collect().toSeq
    val saved = graft.ops.IvfAdc.searchSaved(spark, dir, emb, "vec_id", "embedding",
      queryVec, k = 10, nProbe = 4, shortlist = 20).as[(Long, Double, Double)].collect().toSeq
    assert(saved == direct, "the persisted artifact must reproduce the in-memory search")

    // probe cost is pinned to probed-cell code bytes BY CONSTRUCTION: the
    // legs scan explicit cell directories — so physically deleting every
    // UNPROBED cell's codes must not change the result
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val probed = idx.ivf.centroids
      .map { case (c, cv) => (c, cos(queryVec, cv)) }
      .sortBy { case (c, s) => (-s, c) }.take(4).map(_._1).toSet
    idx.ivf.centroids.map(_._1).filterNot(probed.contains).foreach { cell =>
      val p = java.nio.file.Paths.get(dir, "codes", s"cell=$cell")
      if (java.nio.file.Files.exists(p)) {
        val w = java.nio.file.Files.walk(p)
        try w.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally w.close()
      }
    }
    val afterDelete = graft.ops.IvfAdc.searchSaved(spark, dir, emb, "vec_id", "embedding",
      queryVec, k = 10, nProbe = 4, shortlist = 20).as[(Long, Double, Double)].collect().toSeq
    assert(afterDelete == direct,
      "unprobed cells' code bytes must never be read by a probed search")

    // a bare directory is refused loudly, not guessed at
    val bare = java.nio.file.Files.createTempDirectory("graft_ivfadc_bare_").toString
    val e = intercept[Exception](graft.ops.IvfAdc.searchSaved(
      spark, bare, emb, "vec_id", "embedding", queryVec, 10, 4, 20))
    assert(e.getMessage.contains("artifact") || e.getMessage.contains("save"),
      s"unexpected refusal message: ${e.getMessage}")
  }

  test("IVFADC append: incremental vectors join the persisted artifact without a rebuild") {
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    val idx = graft.ops.IvfAdc.build(half1, "vec_id", "embedding", nCells = 16, m = 4, k = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfadc_app_").toString
    graft.ops.IvfAdc.save(idx, dir)
    graft.ops.IvfAdc.append(spark, dir, half2, "vec_id", "embedding")

    // every appended vector is findable with correct ranking: at full probe
    // + full shortlist the grown artifact IS the exact sq-L2 top-k over the
    // WHOLE corpus — the functional form of "append ≡ build over the union
    // with the same frozen geometry" (assignment and encoding are
    // deterministic given centroids + codebooks)
    val grown = graft.ops.IvfAdc.searchSaved(spark, dir, emb, "vec_id", "embedding",
      queryVec, k = 10, nProbe = 16, shortlist = emb.count().toInt)
      .as[(Long, Double, Double)].collect().toSeq
    val q = array(queryVec.map(lit): _*)
    val exact = emb.select(col("vec_id"),
      Functions.roundHalfUp(
        Functions.vecSqDist(col("embedding").cast("array<double>"), q), 6).as("d2"))
      .orderBy(col("d2"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSeq
    assert(grown.map(_._1) == exact,
      "full probe + full shortlist over the grown artifact must be the exact top-k")
    // append is rerun-stable (same frozen geometry, same result)
    val again = graft.ops.IvfAdc.searchSaved(spark, dir, emb, "vec_id", "embedding",
      queryVec, k = 10, nProbe = 16, shortlist = emb.count().toInt)
      .as[(Long, Double, Double)].collect().toSeq
    assert(again == grown)
  }

  test("IVFADC artifact: a probed-but-EMPTY cell is skipped, not a crash") {
    import spark.implicits._
    // all vectors share ONE direction (cosine ties against every centroid
    // resolve to the lowest cell), so the other sampled cell has no
    // members — no partition directory exists for it. Probing both cells
    // must skip the empty one (recorded at save time) and answer.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.1f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.2f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(1.3f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val idx = graft.ops.IvfAdc.build(vecs, "vec_id", "embedding", nCells = 2, m = 2, k = 2)
    val cellsUsed = idx.codes.select("cell").distinct().count()
    assert(cellsUsed < 2, "fixture must actually leave a cell empty")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfadc_empty_").toString
    graft.ops.IvfAdc.save(idx, dir)
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val got = graft.ops.IvfAdc.searchSaved(spark, dir, vecs, "vec_id", "embedding",
      q, k = 2, nProbe = 2, shortlist = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(0L, 1L), s"empty probed cell must contribute nothing, got $got")
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

  test("IVF append: incremental vectors join the persisted index without a rebuild") {
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    val index = IvfIndex.build(half1, "vec_id", "embedding", nCells = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app_").toString
    IvfIndex.save(index, dir)

    IvfIndex.append(spark, dir, half2, "vec_id", "embedding")
    val grown = IvfIndex.load(spark, dir)
    assert(grown.assignments.count() === emb.count(),
      "appended index must cover the whole corpus")
    assert(grown.centroids.toSet === index.centroids.toSet, "centroids stay frozen")

    // assignment is deterministic per (vector, frozen centroids), so
    // probing every cell of the grown index is still exact over the corpus
    val appended = IvfIndex.search(grown, emb, "vec_id", "embedding", queryVec, 10, nProbe = 16)
      .as[(Long, Double)].collect().toSeq
    val exact = SimilaritySearch.bruteForceTopK(emb, "vec_id", "embedding", queryVec, 10)
      .as[(Long, Double)].collect().toSeq
    assert(appended === exact)

    // appending an EMPTY batch is a clean no-op
    IvfIndex.append(spark, dir, half2.limit(0), "vec_id", "embedding")
    assert(IvfIndex.load(spark, dir).assignments.count() === emb.count())

    // a bare directory refuses
    val bare = java.nio.file.Files.createTempDirectory("graft_ivf_bare_").toString
    intercept[Exception] { IvfIndex.append(spark, bare, half2, "vec_id", "embedding") }
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

  test("LSH append: new vectors hash into the persisted index's own geometry") {
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_app_").toString
    SimilaritySearch.saveLshIndex(
      SimilaritySearch.buildLshIndex(half1, "vec_id", "embedding",
        planes = 4, dims = queryVec.length), dir)

    SimilaritySearch.appendLshIndex(spark, dir, half2, "vec_id", "embedding")
    val grown = SimilaritySearch.loadLshIndex(spark, dir)
    assert(grown.relation.count() === emb.count())

    // planes are plan-time constants, so the grown index equals a full
    // rebuild bucket-for-bucket, and indexed search equals in-memory search
    val rebuilt = SimilaritySearch.buildLshIndex(
      emb, "vec_id", "embedding", planes = 4, dims = queryVec.length)
    val a = grown.relation.select("vec_id", "bucket").as[(Long, Long)].collect().toSet
    val b = rebuilt.relation.select("vec_id", "bucket").as[(Long, Long)].collect().toSet
    assert(a === b)
    val viaIndex = SimilaritySearch.lshTopKIndexed(grown, "vec_id", queryVec, 10)
      .as[(Long, Double)].collect().toSeq
    val inMem = SimilaritySearch.lshTopK(emb, "vec_id", "embedding", queryVec, 10, planes = 4)
      .as[(Long, Double)].collect().toSeq
    assert(viaIndex === inMem)

    // a bare directory has no geometry to hash against — refuse
    intercept[IllegalArgumentException] {
      SimilaritySearch.appendLshIndex(
        spark, java.nio.file.Files.createTempDirectory("graft_lsh_abare_").toString,
        half2, "vec_id", "embedding")
    }
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

  test("PQ: Lloyd refinement cuts reconstruction error; layout-independent codes") {
    val cb = ProductQuantize.fit(emb, "vec_id", "embedding", m = 4, k = 8)
    assert(cb.dims == queryVec.length && cb.dsub == cb.dims / 4)

    def mse(b: ProductQuantize.Codebooks): Double = {
      val codes = ProductQuantize.encode(col("embedding").cast("array<double>"), b)
      emb.select(
          aggregate(
            zip_with(col("embedding").cast("array<double>"),
              ProductQuantize.decode(codes, b),
              (x, r) => (x - r) * (x - r)),
            lit(0.0), (acc, t) => acc + t).as("se"))
        .agg(avg(col("se"))).head().getDouble(0)
    }
    val refined = ProductQuantize.refine(emb, "embedding", cb, iterations = 3)
    val before = mse(cb)
    val after = mse(refined)
    assert(after <= before,
      s"Lloyd refinement must not increase quantization error: $before -> $after")

    // codes are pure per-row expressions over literal books: physical layout
    // cannot change an assignment
    def codesOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"),
        ProductQuantize.encode(col("embedding").cast("array<double>"), refined).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(codesOf(emb) == codesOf(emb.repartition(13)))

    // refine is rerun-deterministic (DECIMAL-exact means)
    val again = ProductQuantize.refine(emb.repartition(7), "embedding", cb, iterations = 3)
    assert(again.books == refined.books)
  }

  test("PQ ADC: high recall on clustered data; codebooks persist and validate") {
    // ADC approximates squared L2, so recall is only meaningful where L2
    // neighborhoods exist: a clustered fixture (4 anchors + small noise).
    // The sf embeddings are near-uniform noise — neighbor gaps there are
    // smaller than ANY quantizer's distortion, which is a property of that
    // data, not of PQ.
    val rnd = new scala.util.Random(42)
    val dims = 64
    val anchors = Array.fill(4)(Array.fill(dims)(rnd.nextDouble() * 10 - 5))
    val rows = (1 to 400).map { i =>
      val a = anchors(i % 4)
      (i.toLong, a.toSeq.map(_ + (rnd.nextDouble() - 0.5) * 0.2))
    }
    val fixture = rows.toDF("vec_id", "embedding")
    val query = anchors(0).toSeq.map(_ + 0.01) // firmly inside cluster 0
    val q = array(query.map(lit): _*)
    val exact = fixture
      .select(col("vec_id"),
        aggregate(
          zip_with(col("embedding"), q, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, t) => acc + t).as("d2"))
      .orderBy(col("d2"), col("vec_id"))
      .limit(10)
      .select("vec_id").as[Long].collect().toSet
    val cb = ProductQuantize.refine(
      fixture, "embedding",
      ProductQuantize.fit(fixture, "vec_id", "embedding", m = 4, k = 8), iterations = 2)
    val adc = ProductQuantize.adcTopK(fixture, "vec_id", "embedding", cb, query, topK = 10)
      .select("vec_id").as[Long].collect().toSet
    // every ADC hit must come from the right cluster (within-cluster ADC
    // distances TIE by construction — members share codewords — so raw ADC
    // can locate the cluster but not order its members)
    assert(adc.forall(_ % 4 == 0), s"ADC returned off-cluster vectors: $adc")
    // the production two-stage search (ADC shortlist → exact re-rank)
    // recovers the exact top-10: the 100-member cluster fits the shortlist
    val reranked = ProductQuantize.adcRerankTopK(
        fixture, "vec_id", "embedding", cb, query, topK = 10, shortlist = 100)
      .select("vec_id").as[Long].collect().toSet
    assert(reranked == exact, s"re-ranked ADC must equal exact: $reranked vs $exact")

    val dir = java.nio.file.Files.createTempDirectory("graft_pq_").toString
    ProductQuantize.save(cb, spark, dir)
    val loaded = ProductQuantize.load(spark, dir)
    assert(loaded == cb, "codebooks must survive the round trip bit-identically")
    // wrong-shape queries error instead of scoring garbage
    intercept[IllegalArgumentException] {
      ProductQuantize.adcTable(loaded, query :+ 0.0)
    }
    intercept[IllegalArgumentException] {
      ProductQuantize.load(
        spark, java.nio.file.Files.createTempDirectory("graft_pq_bare_").toString)
    }
  }

  test("hard negatives: every negative crosses labels; LSH at planes=0 == exact; recall") {
    val dims = queryVec.length
    val exact = SimilaritySearch.hardNegatives(emb, "vec_id", "embedding", "label", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(exact.nonEmpty)
    exact.foreach { case (id, neg, _, rank) =>
      assert(labels(id) != labels(neg), s"$id -> $neg shares a label")
      assert(rank >= 1 && rank <= 5)
    }
    // per-anchor ranks are dense from 1
    exact.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length.toLong),
        s"anchor $id ranks not dense")
    }
    // degenerate geometry: one bucket -> identical to the exact form
    val degenerate = SimilaritySearch
      .hardNegativesLsh(emb, "vec_id", "embedding", "label", k = 5, planes = 0, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(degenerate.toSet == exact.toSet)
    // real geometry: a meaningful fraction of the true hard negatives
    // survive bucket pruning (same-bucket = similar direction, which is
    // exactly where hard negatives live)
    val lsh = SimilaritySearch
      .hardNegativesLsh(emb, "vec_id", "embedding", "label", k = 5, planes = 4, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPairs = exact.map(t => (t._1, t._2)).toSet
    val recall = lsh.count(exactPairs).toDouble / exactPairs.size
    assert(lsh.nonEmpty, "LSH mining returned nothing")
    assert(recall > 0.1, s"LSH hard-negative recall degenerate: $recall")
    // and every LSH pair is label-crossing too
    lsh.foreach { case (id, neg) => assert(labels(id) != labels(neg)) }
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

  test("recallAtK: identical lists 1.0, half overlap 0.5, disjoint 0.0") {
    def lst(ids: Long*) = ids.map(Tuple1(_)).toDF("vec_id")
    def recall(a: org.apache.spark.sql.DataFrame, e: org.apache.spark.sql.DataFrame) =
      SimilaritySearch.recallAtK(a, e, "vec_id")
        .select("k", "hits", "recall").head()
    val full = recall(lst(1, 2, 3, 4), lst(1, 2, 3, 4))
    assert(full.getLong(0) == 4L && full.getLong(1) == 4L && full.getDouble(2) == 1.0)
    val half = recall(lst(1, 2, 9, 8), lst(1, 2, 3, 4))
    assert(half.getLong(1) == 2L && half.getDouble(2) == 0.5)
    val none = recall(lst(7, 8), lst(1, 2, 3, 4))
    assert(none.getLong(1) == 0L && none.getDouble(2) == 0.0)
  }

  test("mmrRerank: a duplicate of the first pick loses to a diverse lower-rel hit") {
    // query = (1,0); ids 1,2 identical max-relevance vectors; id 3 diverse
    val emb = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(0.6, 0.8)))
      .toDF("vec_id", "embedding")
    val out = SimilaritySearch.mmrRerank(emb, "vec_id", "embedding",
      query = Seq(1.0, 0.0), candidates = 3, k = 2, lambdaPct = 30)
      .select("rank", "vec_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 3L)),
      s"step 1 takes min-id max-rel, step 2 must diversify: $out")
    // relevance-heavy lambda keeps the duplicate instead
    val rel = SimilaritySearch.mmrRerank(emb, "vec_id", "embedding",
      query = Seq(1.0, 0.0), candidates = 3, k = 2, lambdaPct = 90)
      .select("rank", "vec_id").as[(Long, Long)].collect().toSeq
    assert(rel == Seq((1L, 1L), (2L, 2L)), s"lambda=90 is relevance-first: $rel")
  }

  test("mmrRerank: a pool smaller than k returns what exists, no failure") {
    val emb = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))).toDF("vec_id", "embedding")
    val out = SimilaritySearch.mmrRerank(emb, "vec_id", "embedding",
      Seq(1.0, 0.0), candidates = 5, k = 5)
      .select("rank", "vec_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 2L)), s"two rows in, two picks out: $out")
  }

  test("mmrRerank: k = candidates returns a full permutation, deterministic") {
    val emb = (1L to 6L).map(i => (i, Seq(math.cos(i * 0.4), math.sin(i * 0.4))))
      .toDF("vec_id", "embedding")
    val a = SimilaritySearch.mmrRerank(emb, "vec_id", "embedding",
      Seq(1.0, 0.0), candidates = 6, k = 6)
      .select("vec_id").as[Long].collect().toSeq
    assert(a.sorted == (1L to 6L), s"must be a permutation: $a")
    val b = SimilaritySearch.mmrRerank(emb.repartition(7), "vec_id", "embedding",
      Seq(1.0, 0.0), candidates = 6, k = 6)
      .select("vec_id").as[Long].collect().toSeq
    assert(a == b, "integer scores make the greedy order partition-invariant")
  }

  test("kCenterGreedy: one pick per cluster on a 3-cluster corpus; seed is min id") {
    // three tight clusters around axes; ids interleaved across clusters
    def jitter(base: Seq[Double], eps: Double) = base.map(_ + eps)
    val emb = Seq(
      1L -> Seq(1.0, 0.0, 0.0), 4L -> jitter(Seq(1.0, 0.0, 0.0), 0.01),
      7L -> jitter(Seq(1.0, 0.0, 0.0), 0.02),
      2L -> Seq(0.0, 1.0, 0.0), 5L -> jitter(Seq(0.0, 1.0, 0.0), 0.01),
      8L -> jitter(Seq(0.0, 1.0, 0.0), 0.02),
      3L -> Seq(0.0, 0.0, 1.0), 6L -> jitter(Seq(0.0, 0.0, 1.0), 0.01),
      9L -> jitter(Seq(0.0, 0.0, 1.0), 0.02)).toDF("vec_id", "embedding")
    val picks = SimilaritySearch.kCenterGreedy(emb, "vec_id", "embedding", k = 3)
      .select("rank", "vec_id").as[(Long, Long)].collect().toSeq
    assert(picks.head == ((1L, 1L)), "seed is the pool's minimum id")
    val clusters = picks.map(_._2 % 3).toSet
    assert(clusters.size == 3, s"one exemplar per cluster, got $picks")
  }

  test("kCenterGreedy: coverage similarity non-decreasing; partition-invariant") {
    val out = SimilaritySearch.kCenterGreedy(emb, "vec_id", "embedding",
      k = 8, candidates = 40)
      .select("rank", "vec_id", "near_u").as[(Long, Long, Option[Long])].collect().toSeq
    assert(out.size == 8 && out.map(_._2).distinct.size == 8)
    assert(out.head._3.isEmpty, "seed has no nearest center")
    val nears = out.tail.map(_._3.get)
    assert(nears == nears.sorted,
      s"greedy max-min: each later pick is nearer to the selected set: $nears")
    val again = SimilaritySearch.kCenterGreedy(emb.repartition(11), "vec_id",
      "embedding", k = 8, candidates = 40)
      .select("rank", "vec_id", "near_u").as[(Long, Long, Option[Long])].collect().toSeq
    assert(again == out, "micro-unit similarities make the loop partition-invariant")
  }

  test("kCenterGreedy: pool smaller than k returns what exists; k guard") {
    val emb2 = Seq((5L, Seq(1.0, 0.0)), (9L, Seq(0.0, 1.0))).toDF("vec_id", "embedding")
    val out = SimilaritySearch.kCenterGreedy(emb2, "vec_id", "embedding", k = 4, candidates = 4)
      .select("rank", "vec_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 5L), (2L, 9L)))
    intercept[IllegalArgumentException] {
      SimilaritySearch.kCenterGreedy(emb2, "vec_id", "embedding", k = 5, candidates = 4)
    }
  }

  test("bruteForceTopKBatch: per-query results equal the single-query scan") {
    val queries = emb.filter(col("vec_id") < 3)
    val docs = emb.filter(col("vec_id") >= 3)
    val batch = graft.ops.SimilaritySearch.bruteForceTopKBatch(
        docs, "vec_id", "embedding", queries, "vec_id", "embedding", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    assert(batch.keySet == Set(0L, 1L, 2L))
    queries.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().foreach { qr =>
        val qid = qr.getLong(0)
        val single = graft.ops.SimilaritySearch.bruteForceTopK(
            docs, "vec_id", "embedding", qr.getSeq[Double](1), k = 5)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val got = batch(qid).map(t => t._2 -> t._3).toMap
        assert(got == single, s"query $qid batch != single")
      }
  }

  test("maxSimTopK: each query vector matches its best doc vector independently") {
    // doc 1 covers BOTH query directions across two different vectors;
    // doc 2 nails only the first; doc 3 is diagonal noise
    val docs = Seq(
      (1L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0)),
      (2L, Seq(1.0, 0.0, 0.0)), (2L, Seq(1.0, 0.0, 0.0)),
      (3L, Seq(0.6, 0.6, 0.6)), (3L, Seq(0.6, 0.6, 0.6)))
      .toDF("doc_id", "v")
    val q = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))
    val got = SimilaritySearch.maxSimTopK(docs, "doc_id", "v", q, k = 3)
      .as[(Long, Double)].collect()
    // doc1: 1 + 1 = 2; doc3: 2·cos(diag, axis) = 2·0.57735 ≈ 1.154698;
    // doc2: 1 + 0 = 1 — multi-vector coverage beats repeating one match
    assert(got.map(_._1).toSeq == Seq(1L, 3L, 2L))
    assert(got.head._2 == 2.0)
    assert(math.abs(got(1)._2 - 1.154700) < 1e-5)
    // a single pooled vector could not rank doc1 over doc3: mean-pooled
    // doc1 = (0.5, 0.5, 0) scores the same on both query directions
  }

  // ---- margin-based bitext mining ---------------------------------------

  test("marginMine: hand margins, perfect pairs mine, mid-cos pair normalizes away") {
    val src = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))).toDF("id", "v")
    val tgt = Seq((10L, Seq(1.0, 0.0)), (11L, Seq(0.6, 0.8)), (12L, Seq(0.0, 1.0)))
      .toDF("id", "v")
    val got = SimilaritySearch.marginMine(
      src, "id", "v", tgt, "id", "v", k = 1, threshold = 0.9, mutual = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("margin"))).toSet
    // k=1 sums: a_s1 = b_t10 = a_s2 = b_t12 = 1.0 → exact pairs margin
    // 1·2/(1+1) = 1.0; t11's best raw cos (0.8 to s2) normalizes to
    // 0.8·2/(1+0.8) = 0.888889 < 0.9 and is not anyone's forward best
    assert(got == Set((1L, 10L, 1.0), (2L, 12L, 1.0)))
  }

  test("marginMine: mutual intersection drops a one-directional best; forward-only keeps it") {
    val src = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.43588989435406733)))
      .toDF("id", "v")
    val tgt = Seq((10L, Seq(1.0, 0.0))).toDF("id", "v")
    // both sources' forward best is t10; t10's backward best is s1
    val mutual = SimilaritySearch.marginMine(
      src, "id", "v", tgt, "id", "v", k = 1, threshold = 0.5, mutual = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mutual == Set((1L, 10L)))
    val fwd = SimilaritySearch.marginMine(
      src, "id", "v", tgt, "id", "v", k = 1, threshold = 0.5, mutual = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fwd == Set((1L, 10L), (2L, 10L)))
    // hand margin for the rejected direction: cos = 0.9 →
    // 0.9·2/(0.9+1.0) = 0.947368
    val m2 = SimilaritySearch.marginMine(
      src, "id", "v", tgt, "id", "v", k = 1, threshold = 0.5, mutual = false)
      .filter(col("src_id") === 2L).head().getAs[Double]("margin")
    assert(m2 == 0.947368)
  }

  test("marginMine: zero denominator (all-orthogonal) yields no pairs; threshold gates") {
    val src = Seq((1L, Seq(1.0, 0.0))).toDF("id", "v")
    val tgt = Seq((10L, Seq(0.0, 1.0))).toDF("id", "v")
    assert(SimilaritySearch.marginMine(
      src, "id", "v", tgt, "id", "v", k = 1, threshold = -10.0).count() == 0)
    val near = Seq((10L, Seq(0.8, 0.6))).toDF("id", "v")
    // single pair: margin = c·2/(c+c) = 1.0 regardless of c > 0
    assert(SimilaritySearch.marginMine(
      src, "id", "v", near, "id", "v", k = 1, threshold = 1.0001).count() == 0)
    assert(SimilaritySearch.marginMine(
      src, "id", "v", near, "id", "v", k = 1, threshold = 1.0).count() == 1)
  }

  test("marginMineWithCandidates: full-cross candidates == exact marginMine (100%-recall fixture)") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val src = emb.filter(col("label") === 0)
    val tgt = emb.filter(col("label") === 1)
    val cross = src.select(col("vec_id").as("s")).crossJoin(
      tgt.select(col("vec_id").as("t")))
    for (mutual <- Seq(true, false)) {
      val exact = SimilaritySearch.marginMine(
        src, "vec_id", "embedding", tgt, "vec_id", "embedding",
        k = 4, threshold = 1.05, mutual = mutual)
      val viaCand = SimilaritySearch.marginMineWithCandidates(
        src, "vec_id", "embedding", tgt, "vec_id", "embedding",
        cross, "s", "t", k = 4, threshold = 1.05, mutual = mutual)
      assert(viaCand.exceptAll(exact).isEmpty && exact.exceptAll(viaCand).isEmpty,
        s"candidate path diverged from exact (mutual=$mutual)")
      assert(exact.count() > 0, "fixture must actually mine pairs")
    }
  }

  test("marginMineLsh at planes=0 == exact marginMine; duplicate candidates score once") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val src = emb.filter(col("label") === 0)
    val tgt = emb.filter(col("label") === 1)
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    val exact = SimilaritySearch.marginMine(
      src, "vec_id", "embedding", tgt, "vec_id", "embedding",
      k = 4, threshold = 1.05)
    val lsh0 = SimilaritySearch.marginMineLsh(
      src, "vec_id", "embedding", tgt, "vec_id", "embedding",
      k = 4, threshold = 1.05, planes = 0, dims = dims)
    assert(lsh0.exceptAll(exact).isEmpty && exact.exceptAll(lsh0).isEmpty)
    // duplicated candidate rows must not double-count neighborhood sums
    val cross = src.select(col("vec_id").as("s")).crossJoin(
      tgt.select(col("vec_id").as("t")))
    val doubled = SimilaritySearch.marginMineWithCandidates(
      src, "vec_id", "embedding", tgt, "vec_id", "embedding",
      cross.unionAll(cross), "s", "t", k = 4, threshold = 1.05)
    assert(doubled.exceptAll(exact).isEmpty && exact.exceptAll(doubled).isEmpty)
  }

  test("marginMineIvf at nCells=1 == exact marginMine; more cells mine a reproducible subset") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val src = emb.filter(col("label") === 0)
    val tgt = emb.filter(col("label") === 1)
    val exact = SimilaritySearch.marginMine(
      src, "vec_id", "embedding", tgt, "vec_id", "embedding",
      k = 4, threshold = 1.05)
    val oneCell = SimilaritySearch.marginMineIvf(
      src, "vec_id", "embedding", tgt, "vec_id", "embedding",
      k = 4, threshold = 1.05, nCells = 1, nProbe = 1)
    assert(oneCell.exceptAll(exact).isEmpty && exact.exceptAll(oneCell).isEmpty)
    // pruned geometry: deterministic (two runs identical), non-empty,
    // and probing MORE cells can only grow the candidate set
    val pruned = SimilaritySearch.marginMineIvf(
      src, "vec_id", "embedding", tgt, "vec_id", "embedding",
      k = 4, threshold = 1.0, nCells = 4, nProbe = 2)
    val prunedAgain = SimilaritySearch.marginMineIvf(
      src, "vec_id", "embedding", tgt, "vec_id", "embedding",
      k = 4, threshold = 1.0, nCells = 4, nProbe = 2)
    assert(pruned.exceptAll(prunedAgain).isEmpty && prunedAgain.exceptAll(pruned).isEmpty)
    assert(pruned.count() > 0)
  }

  test("marginMineLsh: bucketed mining subsets scale; candidate volume tracks buckets") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val src = emb.filter(col("label") === 0)
    val tgt = emb.filter(col("label") === 1)
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    val mined = SimilaritySearch.marginMineLsh(
      src, "vec_id", "embedding", tgt, "vec_id", "embedding",
      k = 4, threshold = 1.0, planes = 3, dims = dims)
    // every mined pair is same-bucket by construction
    val sb = src.select(col("vec_id").as("src_id"),
      SimilaritySearch.lshBucket(col("embedding").cast("array<double>"), 3, dims).as("sb"))
    val tb = tgt.select(col("vec_id").as("tgt_id"),
      SimilaritySearch.lshBucket(col("embedding").cast("array<double>"), 3, dims).as("tb"))
    val joined = mined.join(sb, Seq("src_id")).join(tb, Seq("tgt_id"))
    assert(joined.filter(col("sb") =!= col("tb")).count() == 0)
    assert(mined.count() > 0)
    // the candidate join is a strict subset of the cross
    val candCount = sb.join(tb, col("sb") === col("tb")).count()
    assert(candCount < src.count() * tgt.count())
  }
}
