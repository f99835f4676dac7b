package graft

import graft.ops.Curate

/** The composed curation decision on a crafted corpus where every flag is
  * discriminative (the synthetic documents table leaves lang_ok and
  * exact_canonical constant — the oracle checks their computation, this
  * spec checks their semantics).
  */
class CurateSpec extends SparkSpec {

  import spark.implicits._

  test("each flag flips on its designed document; keep is the conjunction") {
    // 280 words, stopword ratio 1/7 ≈ 0.14, "the" dominates markers → en
    val good = (1 to 40).map(i => s"the quick word$i brown fox jumps high").mkString(" ")
    val docs = Seq(
      (1L, good),                          // passes everything
      (2L, good),                          // exact dup of 1 → not exact canonical
      (3L, "el la de que los el la de"),   // spanish → lang_ok false
      (4L, "tiny"),                        // 1 word → quality_ok false
      // appending an exact copy of segment 1 changes the TEXT (distinct
      // content hash) but adds no new 3-shingles (every boundary shingle
      // already occurs between consecutive segments), so doc 5's minhash
      // equals doc 1's and the LSH pair is guaranteed
      (5L, good + " the quick word1 brown fox jumps high"))
      .toDF("doc_id", "text")
    val got = Curate.decide(
        docs, "doc_id", "text",
        minQuality = 0.5, acceptLangs = Seq("en", "und"), sampleRate = 1.0)
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap

    // (id, quality_ok, lang_ok, exact_canonical, near_canonical, sampled, keep)
    assert(got(1L) == ((1L, true, true, true, true, true, true)))
    // doc 2 is byte-identical to doc 1: loses BOTH canonical flags (the LSH
    // near-dup pair 1-2 clusters to min id 1)
    assert(!got(2L)._4 && !got(2L)._5 && !got(2L)._7)
    assert(!got(3L)._3 && !got(3L)._7, "spanish doc must fail lang gate")
    assert(!got(4L)._2 && !got(4L)._7, "one-word doc must fail quality gate")
    // doc 5 shares doc 1's long prefix → near-dups into cluster 1 but is
    // exact-canonical for its own distinct content
    assert(got(5L)._4 && !got(5L)._5 && !got(5L)._7)

    // keep ≡ conjunction of the five flags, for every row
    got.values.foreach { r =>
      assert(r._7 == (r._2 && r._3 && r._4 && r._5 && r._6), s"keep != AND for $r")
    }

    // sampling flag: rate 0 drops everything, deterministically
    val none = Curate.decide(docs, "doc_id", "text", sampleRate = 0.0)
      .filter(org.apache.spark.sql.functions.col("sampled")).count()
    assert(none == 0)
  }

  test("maxDupRatio gate: boilerplate-heavy docs drop; default leaves schema unchanged") {
    val boiler = (1 to 12).map(i => s"legal$i").mkString(" ")
    def unique(tag: String) = (1 to 30).map(i => s"the ${tag}word$i of text").mkString(" ")
    val docs = Seq(
      (1L, s"${unique("a")} $boiler"),          // ~9% dup — passes the gate
      (2L, s"$boiler ${unique("b")} $boiler"),  // same boilerplate twice, still < limit
      (3L, s"$boiler $boiler $boiler tiny tail here now also fine ok yes")) // mostly dup
      .toDF("doc_id", "text")
    val got = Curate.decide(docs, "doc_id", "text",
        acceptLangs = Seq("en", "und"), maxDupRatio = Some(0.5), dupWindowTokens = 4)
      .select("doc_id", "dup_ok", "keep")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(got(1L)._1, "minor boilerplate passes the dup gate")
    assert(got(2L)._1)
    assert(!got(3L)._1 && !got(3L)._2, "mostly-boilerplate doc fails dup gate and keep")

    // default None: no dup pass, no dup_ok column — q_cr_keep's contract
    val plain = Curate.decide(docs, "doc_id", "text")
    assert(!plain.columns.contains("dup_ok"))
  }

  test("null-text documents surface with flags instead of vanishing") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again " * 4),
      (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String])) // null == null: docs 2,3 are exact dups
      .toDF("doc_id", "text")
    val got = Curate.decide(docs, "doc_id", "text", sampleRate = 1.0)
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L), "null-text docs must not be dropped")
    // (id, quality_ok, lang_ok, exact_canonical, near_canonical, sampled, keep)
    assert(!got(2L)._2 && !got(2L)._7, "empty text fails the quality gate")
    // both nulls hash to the same '' content: min id 2 is the canonical
    assert(got(2L)._3 && got(2L)._4 && !got(3L)._4)
  }

  test("decideStream flags null-text chunks like the batch side (no NPE)") {
    import graft.ops.Dedup
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Dedup.DocChunk]
    val q = Curate.decideStream(source.toDS(), sampleRate = 1.0)
      .writeStream.outputMode("append").format("memory").queryName("cr_null_stream").start()
    try {
      source.addData(Seq(Dedup.DocChunk(1L, null), Dedup.DocChunk(2L, null)))
      q.processAllAvailable()
      val got = spark.table("cr_null_stream").as[Curate.StreamFlags]
        .collect().map(f => f.docId -> f).toMap
      assert(got.keySet == Set(1L, 2L))
      assert(!got(1L).qualityOk && !got(1L).keep, "empty text fails the quality gate")
      // both nulls share the '' content key: min id is the canonical
      assert(got(1L).firstSeen && !got(2L).firstSeen)
    } finally q.stop()
  }

  test("a precomputed cluster map missing new docs defaults them to self, not drops them") {
    val clustersOnlyDoc1 = Seq((1L, 1L)).toDF("doc_id", "cluster_id")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again " * 4),
      (9L, "a genuinely different document with plenty of the usual words " * 4))
      .toDF("doc_id", "text")
    val got = Curate.decide(docs, "doc_id", "text", sampleRate = 1.0,
        precomputedClusters = Some(clustersOnlyDoc1))
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 9L), "uncovered doc must not vanish")
    assert(got(9L)._5, "uncovered doc defaults to its own near-dup cluster")
  }

  test("precomputedClusters gives identical flags and skips the eager CC pass") {
    import graft.ops.{ConnectedComponents, Dedup}
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val clusters = ConnectedComponents.assign(
      docs.select($"doc_id"), "doc_id",
      Dedup.minhashLshPairs(docs, "doc_id", "text", 8, 2), "id_a", "id_b")
    val direct = Curate.decide(docs, "doc_id", "text", sampleRate = 0.9, sampleSalt = "cr")
    val reused = Curate.decide(docs, "doc_id", "text", sampleRate = 0.9, sampleSalt = "cr",
      precomputedClusters = Some(clusters))
    assert(direct.collect().toSet == reused.collect().toSet)
  }

  test("decideStream twins the batch flags; replays re-emit identically") {
    import graft.ops.Dedup
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val batch = Curate.decide(docs, "doc_id", "text", sampleRate = 0.6, sampleSalt = "st")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap

    val rows = docs.select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Dedup.DocChunk]
    val q = Curate.decideStream(source.toDS(), sampleRate = 0.6, sampleSalt = "st")
      .writeStream.outputMode("append").format("memory").queryName("cr_stream").start()
    try {
      source.addData(rows.map { case (id, tx) => Dedup.DocChunk(id, tx) })
      q.processAllAvailable()
      val first = spark.table("cr_stream").as[Curate.StreamFlags].collect()
      assert(first.length == rows.length)
      first.foreach { f =>
        val b = batch(f.docId)
        // (id, quality_ok, lang_ok, exact_canonical, near_canonical, sampled, keep)
        assert(f.qualityOk == b._2 && f.langOk == b._3 && f.sampled == b._6,
          s"per-row flags diverge for ${f.docId}: $f vs $b")
        // one micro-batch: min-docId canonical — identical to batch
        assert(f.firstSeen == b._4, s"firstSeen diverges for ${f.docId}")
        assert(f.keep == (f.qualityOk && f.langOk && f.firstSeen && f.sampled))
      }
      // full replay: every row re-emits with IDENTICAL flags (canonical
      // remembered in state, not re-derived from arrival order)
      source.addData(rows.map { case (id, tx) => Dedup.DocChunk(id, tx) })
      q.processAllAvailable()
      val all = spark.table("cr_stream").as[Curate.StreamFlags].collect()
      assert(all.length == rows.length * 2)
      all.groupBy(_.docId).values.foreach { g =>
        assert(g.toSet.size == 1, s"replay changed flags: $g")
      }
    } finally q.stop()
  }

  test("decideWebStream twins the batch flags; replays re-emit identically") {
    import graft.ops.Dedup
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val batch = Curate.decideWeb(docs, "doc_id", "text")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap

    val rows = docs.select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Dedup.DocChunk]
    val q = Curate.decideWebStream(source.toDS())
      .writeStream.outputMode("append").format("memory").queryName("cr_web_stream").start()
    try {
      source.addData(rows.map { case (id, tx) => Dedup.DocChunk(id, tx) })
      q.processAllAvailable()
      val first = spark.table("cr_web_stream").as[Curate.WebStreamFlags].collect()
      assert(first.length == rows.length)
      first.foreach { f =>
        val b = batch(f.docId)
        // (id, gopher_ok, c4_ok, rep_ok, exact_canonical, keep)
        assert(f.gopherOk == b._2 && f.c4Ok == b._3 && f.repOk == b._4,
          s"heuristic gates diverge for ${f.docId}: $f vs $b")
        // one micro-batch: min-docId canonical — identical to batch
        assert(f.exactCanonical == b._5, s"exactCanonical diverges for ${f.docId}")
        assert(f.keep == b._6 &&
          f.keep == (f.gopherOk && f.c4Ok && f.repOk && f.exactCanonical))
      }
      // full replay: identical flags (canonical remembered in state)
      source.addData(rows.map { case (id, tx) => Dedup.DocChunk(id, tx) })
      q.processAllAvailable()
      val all = spark.table("cr_web_stream").as[Curate.WebStreamFlags].collect()
      assert(all.length == rows.length * 2)
      all.groupBy(_.docId).values.foreach { g =>
        assert(g.toSet.size == 1, s"replay changed flags: $g")
      }
    } finally q.stop()
  }

  test("decideWebStream flags null-text chunks like the batch side (no NPE)") {
    import graft.ops.Dedup
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Dedup.DocChunk]
    val q = Curate.decideWebStream(source.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("cr_web_null_stream").start()
    try {
      source.addData(Seq(Dedup.DocChunk(1L, null), Dedup.DocChunk(2L, null)))
      q.processAllAvailable()
      val got = spark.table("cr_web_null_stream").as[Curate.WebStreamFlags]
        .collect().map(f => f.docId -> f).toMap
      assert(got.keySet == Set(1L, 2L))
      assert(!got(1L).gopherOk && !got(1L).keep, "empty text fails the gopher gate")
      // both nulls share the '' content key: min id is the canonical
      assert(got(1L).exactCanonical && !got(2L).exactCanonical)
    } finally q.stop()
  }

  test("decideWeb: each gate trips independently; heuristics stay one projection") {
    import spark.implicits._
    val goodText = (1 to 60)
      .map(i => s"unit$i the alpha$i of bravo$i charlie$i delta$i echo$i ok$i.")
      .mkString("\n")
    val docs = Seq(
      (0L, goodText),                                   // passes everything
      (1L, goodText),                                   // exact dup of 0 → not canonical
      (2L, "short no keep."),                           // gopher word count
      (3L, goodText + "\nfunction f() { broken }"),     // c4 brace gate
      (4L, (1 to 200).map(_ => "the of and that same same") // repetition caps
        .mkString(" ") + ".")
    ).toDF("doc_id", "text")
    val df = graft.ops.Curate.decideWeb(docs, "doc_id", "text")
    val got = df.collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
    assert(got(0L) === ((true, true, true, true, true)))
    assert(got(1L)._4 === false && got(1L)._5 === false, "dup must lose canonicality")
    assert(got(2L)._1 === false && got(2L)._5 === false, "gopher gate")
    assert(got(3L)._2 === false && got(3L)._5 === false, "c4 gate")
    assert(got(4L)._3 === false && got(4L)._5 === false, "repetition gate")
    // the three heuristic gates must NOT fan out into per-flag joins: the
    // only joins in the plan belong to the exact-dedup canonical lookup
    df.collect()
    // AQE's toString carries Final AND Initial plan sections — count the
    // final one only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"))
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(plan).size
    assert(joins <= 1, s"flag fan-out joins detected ($joins):\n$plan")
  }

  test("leakageSafeSplit: dup clusters move as units; singletons equal the plain split") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => Tuple1(i)).toDF("doc_id")
    // chains {0,1,2}, {10,11}, everything else singleton
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Curate.leakageSafeSplit(docs, "doc_id", pairs, "id_a", "id_b", fr)
      .select("doc_id", "cluster_id", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length == 100)
    // clusters resolve to min member, and every member shares its split
    val byId = got.map(t => t._1 -> t).toMap
    assert(Seq(0L, 1L, 2L).map(byId(_)._2).distinct == Seq(0L))
    assert(Seq(0L, 1L, 2L).map(byId(_)._3).distinct.length == 1)
    assert(Seq(10L, 11L).map(byId(_)._2).distinct == Seq(10L))
    assert(Seq(10L, 11L).map(byId(_)._3).distinct.length == 1)
    // singletons: identical to the plain md5 split on their own id
    val plain = graft.ops.Sampling.split(docs, "doc_id", fr)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.filter(t => !Seq(0L, 1L, 2L, 10L, 11L).contains(t._1)).foreach { case (id, cid, s) =>
      assert(cid == id)
      assert(s == plain(id), s"singleton $id diverged from plain split")
    }
    // all three labels appear over 100 keys
    assert(got.map(_._3).distinct.toSet == Set("train", "val", "test"))
  }
}
