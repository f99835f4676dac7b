package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.Streaming

/** Structured Streaming restatement (SURVEY §2.9): the windowed streaming
  * aggregation over the events parquet must agree with the equivalent batch
  * aggregation.
  */
class StreamingSpec extends SparkSpec {

  test("AvailableNow windowed agg equals batch A1 on sf0.001 events") {
    // stream source needs the pre-converted schema: read via Tables once to
    // learn it, then re-feed the converted frame through a temp parquet dir
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_").toString
    events.write.mode("overwrite").parquet(dir)

    val streamed = Streaming.runAvailableNow(
      spark, dir, events.schema,
      df => Streaming.windowedAgg(df, "ts", Seq("event_type"), Seq("value")),
      outputMode = "complete")

    val batch = graft.ops.TrafficAgg
      .aggregate(events, "ts", Seq("event_type"), Seq("value"))
      .select("bucket_start", "event_type", "volume", "value_avg")

    val s = streamed.select("bucket_start", "event_type", "volume", "value_avg")
      .collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(s == b)
    assert(s.nonEmpty)
  }

  test("streaming minhash signatures equal the batch operator across batches, replay, chunks") {
    import spark.implicits._
    import graft.ops.Dedup

    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val batchSigs = Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 4)
      .collect()
      .map(r => r.getLong(0) -> (1 to 4).map(i => r.getString(i)).toSeq)
      .toMap

    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val (firstHalf, secondHalf) = rows.splitAt(rows.length / 2)
    // one doc from the second half arrives CHUNKED: split at a token
    // boundary with a (shingle-1)-token overlap, so the union of chunk
    // shingle sets equals the whole document's
    val (chunkedId, chunkedText) = secondHalf.last
    val toks = chunkedText.trim.split("\\s+")
    val cut = toks.length / 2
    val chunkA = toks.slice(0, cut + 2).mkString(" ") // +2 = shingle-1 overlap
    val chunkB = toks.slice(cut, toks.length).mkString(" ")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Dedup.DocChunk]
    val name = "mh_stream_out"
    val q = Dedup.minhashSignaturesStream(source.toDS(), numHashes = 4).writeStream
      .outputMode("append").format("memory").queryName(name).start()
    try {
      source.addData(firstHalf.map { case (id, tx) => Dedup.DocChunk(id, tx) })
      q.processAllAvailable()
      // second micro-batch: rest of the corpus, a REPLAY of an already-seen
      // doc (at-least-once delivery), and the chunked doc's two pieces
      source.addData(
        secondHalf.dropRight(1).map { case (id, tx) => Dedup.DocChunk(id, tx) } ++
          Seq(
            Dedup.DocChunk(firstHalf.head._1, firstHalf.head._2),
            Dedup.DocChunk(chunkedId, chunkA)))
      q.processAllAvailable()
      // third micro-batch: the chunked doc completes
      source.addData(Seq(Dedup.DocChunk(chunkedId, chunkB)))
      q.processAllAvailable()
    } finally q.stop()

    // latest signature per doc (max state revision) must equal batch
    val streamed = spark.table(name).as[Dedup.MinhashSig].collect()
      .groupBy(_.docId)
      .map { case (id, sigs) => id -> sigs.maxBy(_.updates).sig }
    assert(streamed.keySet == batchSigs.keySet)
    assert(streamed.forall { case (id, sig) => sig == batchSigs(id) },
      "streamed final signatures diverge from batch")
    // and the replayed doc's signature was NOT corrupted by double counting
    assert(streamed(firstHalf.head._1) == batchSigs(firstHalf.head._1))
  }

  test("content-defined chunking runs unchanged on a stream and equals batch") {
    import spark.implicits._
    import graft.ops.{Dedup, TextAnalysis}

    // stateless per-row operator: the SAME function body must be legal on a
    // streaming DataFrame (no twin needed) and chunk identically
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(50)
    val batch = TextAnalysis.chunkContentDefined(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet

    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Dedup.DocChunk]
    val name = "cdc_stream_out"
    val q = TextAnalysis.chunkContentDefined(
        source.toDS().toDF().withColumnRenamed("docId", "doc_id"),
        "doc_id", "text")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      source.addData(a.map { case (id, tx) => Dedup.DocChunk(id, tx) })
      q.processAllAvailable()
      source.addData(b.map { case (id, tx) => Dedup.DocChunk(id, tx) })
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(name).collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("streaming twins match batch on tab/newline padding and locale-sensitive chars") {
    import spark.implicits._
    import graft.ops.Dedup

    // Java String.trim strips \t\n (SQL trim does not); Java toLowerCase on a
    // tr_TR default locale lowers 'I' to dotless 'ı' (SQL lower does not);
    // Java split drops trailing empty tokens (SQL split keeps them). Each doc
    // below trips one of those divergences.
    val hostile = Seq(
      (1L, "\tIstanbul VISIT in springtime\n"),
      (2L, "trailing tab after final word\t"),
      (3L, "  ordinary spaces only doc  "),
      (4L, "mixed nbsp and\ttab separated words"))
    val docs = hostile.toDF("doc_id", "text")
    val batchSigs = Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 4)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString).toSeq).toMap
    val batchKept = Dedup.exact(docs, "doc_id", "text")
      .select("canonical_id", "content_hash").as[(Long, String)].collect().toSet

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mhSource = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Dedup.DocChunk]
    val mhq = Dedup.minhashSignaturesStream(mhSource.toDS(), numHashes = 4).writeStream
      .outputMode("append").format("memory").queryName("mh_hostile").start()
    val fsSource = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Dedup.DocChunk]
    val fsq = Dedup.firstSeenStream(fsSource.toDS()).writeStream
      .outputMode("append").format("memory").queryName("fs_hostile").start()
    try {
      mhSource.addData(hostile.map { case (id, tx) => Dedup.DocChunk(id, tx) })
      fsSource.addData(hostile.map { case (id, tx) => Dedup.DocChunk(id, tx) })
      mhq.processAllAvailable()
      fsq.processAllAvailable()
    } finally { mhq.stop(); fsq.stop() }

    val streamedSigs = spark.table("mh_hostile").as[Dedup.MinhashSig].collect()
      .groupBy(_.docId).map { case (id, sigs) => id -> sigs.maxBy(_.updates).sig }
    assert(streamedSigs == batchSigs,
      "streamed signatures diverge from batch on hostile whitespace")
    val streamedKept = spark.table("fs_hostile").as[Dedup.FirstSeen].collect()
      .map(f => (f.docId, f.contentHash)).toSet
    assert(streamedKept == batchKept,
      "streamed first-seen content hashes diverge from batch exact")
  }

  test("streaming first-seen dedup equals batch exact canonicals; replay emits nothing") {
    import spark.implicits._
    import graft.ops.Dedup

    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val batchKept = Dedup.exact(docs, "doc_id", "text")
      .select("canonical_id", "content_hash").as[(Long, String)].collect().toSet

    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Dedup.DocChunk]
    val name = "fs_stream_out"
    val q = Dedup.firstSeenStream(source.toDS()).writeStream
      .outputMode("append").format("memory").queryName(name).start()
    try {
      source.addData(rows.map { case (id, tx) => Dedup.DocChunk(id, tx) })
      q.processAllAvailable()
      val afterFirst = spark.table(name).count()
      // full replay (at-least-once delivery): nothing new may surface
      source.addData(rows.map { case (id, tx) => Dedup.DocChunk(id, tx) })
      q.processAllAvailable()
      assert(spark.table(name).count() == afterFirst)
    } finally q.stop()

    val streamed = spark.table(name).as[Dedup.FirstSeen].collect()
      .map(f => (f.docId, f.contentHash)).toSet
    assert(streamed == batchKept)
    assert(streamed.nonEmpty)
  }

  test("null-text chunks do not kill the streaming dedup queries") {
    import spark.implicits._
    import graft.ops.Dedup
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mh = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Dedup.DocChunk]
    val q1 = Dedup.minhashSignaturesStream(mh.toDS(), numHashes = 2).writeStream
      .outputMode("append").format("memory").queryName("mh_null_stream").start()
    try {
      mh.addData(Seq(Dedup.DocChunk(1L, null), Dedup.DocChunk(2L, "real text here")))
      q1.processAllAvailable() // would have NPE'd in shinglesOf before the guard
      val ids = spark.table("mh_null_stream").select("docId")
        .collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L))
    } finally q1.stop()

    val fs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Dedup.DocChunk]
    val q2 = Dedup.firstSeenStream(fs.toDS()).writeStream
      .outputMode("append").format("memory").queryName("fs_null_stream").start()
    try {
      fs.addData(Seq(Dedup.DocChunk(5L, null), Dedup.DocChunk(3L, null)))
      q2.processAllAvailable()
      val kept = spark.table("fs_null_stream").select("docId")
        .collect().map(_.getLong(0)).toSet
      assert(kept === Set(3L), "null texts share the '' content key; min id wins")
    } finally q2.stop()
  }

  test("checkpointed AvailableNow processes each file exactly once across runs") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_incr_src_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_incr_out_").toString + "/sink"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_incr_ck_").toString

    def runOnce(): Unit = {
      val q = spark.readStream.schema("id LONG").parquet(src)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    Seq(1L, 2L, 3L).toDF("id").write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(out).count() == 3)
    // rerun with nothing new: no duplicates (the checkpoint is the catalog)
    runOnce()
    assert(spark.read.parquet(out).count() == 3)
    // new file arrives: only its rows append
    Seq(4L, 5L).toDF("id").write.mode("append").parquet(src)
    runOnce()
    val ids = spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("streaming span dedup: foreachBatch + window-hash history equals the batch operator") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_span_src_").toString
    val spansOut = java.nio.file.Files.createTempDirectory("graft_span_out_").toString + "/spans"
    val histDir = java.nio.file.Files.createTempDirectory("graft_span_hist_").toString + "/hist"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_span_ck_").toString

    val shared = (1 to 10).map(i => s"dup$i").mkString(" ")
    val wave1 = Seq((1L, s"first sighting of $shared here"), (2L, "unrelated opening text"))
    val wave2 = Seq((3L, s"second use of $shared again"), (4L, "still nothing repeated"))

    // seed an empty history (schema only)
    graft.ops.Dedup.windowRows(
        wave1.toDF("doc_id", "text").limit(0), "doc_id", "text", 4)
      .select("win_hash").write.mode("overwrite").parquet(histDir)

    // each micro-batch: spans vs history so far, then append the batch's
    // hashes — repeatedSpansAgainstHistory IS the streaming operator; the
    // only state is the persisted win_hash artifact
    def runOnce(): Unit = {
      val q = spark.readStream.schema("doc_id LONG, text STRING").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val hist = spark.read.parquet(histDir)
          graft.ops.Dedup.repeatedSpansAgainstHistory(
              batch, hist, "doc_id", "text", windowTokens = 4)
            .write.mode("append").parquet(spansOut)
          graft.ops.Dedup.windowRows(batch, "doc_id", "text", 4)
            .select("win_hash").distinct()
            .write.mode("append").parquet(histDir)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    wave1.toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()
    // the run appeared once so far: nothing to flag yet
    assert(!new java.io.File(spansOut).exists() ||
      spark.read.parquet(spansOut).count() === 0L)

    wave2.toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()
    val got = spark.read.parquet(spansOut)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 3's run is flagged by wave 1's history, exactly where the batch
    // operator over the union says a cross-wave duplicate lives
    val batchAll = graft.ops.Dedup.repeatedSpans(
        (wave1 ++ wave2).toDF("doc_id", "text"), "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got === batchAll.filter { case (id, _, _) => id == 3L },
      "stream flags exactly the later-wave half of the batch result")
  }

  test("streaming char-grain cross-doc dedup: foreachBatch + hash artifact equals full-corpus spans") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_xd_src_").toString
    val spansOut = java.nio.file.Files.createTempDirectory("graft_xd_out_").toString + "/spans"
    val histDir = java.nio.file.Files.createTempDirectory("graft_xd_hist_").toString + "/hist"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_xd_ck_").toString

    val minLen = 20
    val run = "a shared character run long enough to flag"
    val wave1 = Seq((1L, s"first sighting: $run [end one]"), (2L, "wholly original number two"))
    val wave2 = Seq((3L, s"second sighting: $run [end two]"), (4L, "also original, nothing shared"))

    // seed an EMPTY artifact (geometry sidecar only) — the artifact IS the
    // stream's state, so a lost checkpoint never loses dedup history
    graft.ops.SuffixArray.saveCrossDocHashes(
      wave1.toDF("doc_id", "text").limit(0), "doc_id", "text", minLen, histDir)

    def runOnce(): Unit = {
      val q = spark.readStream.schema("doc_id LONG, text STRING").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.ops.SuffixArray.crossDocSpansAgainstHistoryDir(
              batch, histDir, "doc_id", "text")
            .write.mode("append").parquet(spansOut)
          graft.ops.SuffixArray.appendCrossDocHashes(batch, histDir, "doc_id", "text")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    wave1.toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()
    assert(!new java.io.File(spansOut).exists() ||
      spark.read.parquet(spansOut).count() === 0L,
      "first sighting alone must not flag")

    wave2.toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()
    val got = spark.read.parquet(spansOut)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the stream flags exactly what full-corpus crossDocSpans reports for
    // the later wave's docs
    val fullAll: Set[(Long, Long, Long)] = graft.ops.SuffixArray.crossDocSpans(
        (wave1 ++ wave2).toDF("doc_id", "text"), "doc_id", "text", minLen)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = fullAll.filter { case (id, _, _) => id >= 3L }
    assert(got === full && got.nonEmpty,
      s"stream=$got fullRestricted=$full")
  }

  test("streaming span coverage: per-batch coverage over history spans equals batch") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_cov_src_").toString
    val covOut = java.nio.file.Files.createTempDirectory("graft_cov_out_").toString + "/cov"
    val histDir = java.nio.file.Files.createTempDirectory("graft_cov_hist_").toString + "/hist"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cov_ck_").toString

    val shared = (1 to 10).map(i => s"dup$i").mkString(" ")
    val wave1 = Seq((1L, s"first sighting of $shared here"), (2L, "unrelated opening text"))
    val wave2 = Seq((3L, s"second use of $shared again"), (4L, "still nothing repeated"))

    graft.ops.Dedup.windowRows(
        wave1.toDF("doc_id", "text").limit(0), "doc_id", "text", 4)
      .select("win_hash").write.mode("overwrite").parquet(histDir)

    // the curation-gate twin: each micro-batch derives its spans against
    // the accumulated window-hash history, then spanCoverage — the same
    // pure function as batch — flags the batch's docs; the only state is
    // the persisted win_hash artifact
    def runOnce(): Unit = {
      val q = spark.readStream.schema("doc_id LONG, text STRING").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val hist = spark.read.parquet(histDir)
          val spans = graft.ops.Dedup.repeatedSpansAgainstHistory(
            batch, hist, "doc_id", "text", windowTokens = 4)
          graft.ops.Dedup.spanCoverage(batch, spans, "doc_id", "text")
            .write.mode("append").parquet(covOut)
          graft.ops.Dedup.windowRows(batch, "doc_id", "text", 4)
            .select("win_hash").distinct()
            .write.mode("append").parquet(histDir)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    wave1.toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()
    wave2.toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()

    val got = spark.read.parquet(covOut)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L), "every streamed doc gets a coverage row")
    // batch reference: spans over the union, coverage over the same docs —
    // the stream twin must agree wherever cross-wave flags are visible to
    // it (wave-2 docs see wave-1 history; wave-1 docs streamed first, so
    // their coverage is 0 — the first-sighting semantics)
    val allDocs = (wave1 ++ wave2).toDF("doc_id", "text")
    val batchCov = graft.ops.Dedup.spanCoverage(
        allDocs,
        graft.ops.Dedup.repeatedSpans(allDocs, "doc_id", "text", 4),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got(3L) === batchCov(3L), "wave-2 dup coverage equals the batch operator")
    assert(got(4L) === batchCov(4L))
    assert(got(1L)._1 === 0L, "first sighting carries zero dup coverage")
    assert(got(1L)._2 === batchCov(1L)._2, "token totals agree regardless of wave")
  }

  test("micro-batch shuffle: epochShuffle(epoch = batchId) runs unchanged on a stream") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_shuf_src_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_shuf_out_").toString + "/shuffled"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_shuf_ck_").toString

    val wave1 = (0L until 50L).map(i => (i, s"w1 doc $i"))
    val wave2 = (100L until 160L).map(i => (i, s"w2 doc $i"))

    // online fine-tuning feed: each micro-batch gets its own reproducible
    // training order — epochShuffle with epoch = batchId IS the streaming
    // operator (stateless per batch, deterministic given ids)
    def runOnce(): Unit = {
      val q = spark.readStream.schema("doc_id LONG, text STRING").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          graft.ops.Sampling.epochShuffle(batch, "doc_id", epoch = batchId)
            .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
            .write.mode("append").parquet(out)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    wave1.toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()
    wave2.toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()

    val got = spark.read.parquet(out)
      .select("batch_id", "doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byBatch = got.groupBy(_._1)
    assert(byBatch.keySet === Set(0L, 1L))
    byBatch.foreach { case (bid, rows) =>
      // positions form a 0..n-1 permutation within each micro-batch
      assert(rows.map(_._3).sorted.toSeq === rows.indices.map(_.toLong).toSeq,
        s"batch $bid positions must be a dense permutation")
      // and equal the batch operator run at that epoch over the same rows
      val wave = if (bid == 0L) wave1 else wave2
      val batchTwin = graft.ops.Sampling.epochShuffle(
          wave.toDF("doc_id", "text"), "doc_id", epoch = bid)
        .select("doc_id", "pos")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.foreach { case (_, id, pos) =>
        assert(batchTwin(id) === pos, s"batch $bid doc $id")
      }
    }
  }

  test("streaming forward fill: per-key state carries readings across micro-batches") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_ff_src_").toString
    val name = "ff_out"
    // wave 1 ends with key 7 holding 2.0; wave 2's leading hole must fill
    // from the STATE, not from anything inside its own batch
    val wave1 = Seq(
      graft.ops.TimeSeries.FfEvent(7L, 100L, 1L, Some(1.0)),
      graft.ops.TimeSeries.FfEvent(7L, 200L, 2L, None),
      graft.ops.TimeSeries.FfEvent(7L, 300L, 3L, Some(2.0)))
    val wave2 = Seq(
      graft.ops.TimeSeries.FfEvent(7L, 400L, 4L, None),
      graft.ops.TimeSeries.FfEvent(7L, 500L, 5L, Some(9.0)),
      graft.ops.TimeSeries.FfEvent(8L, 100L, 6L, None)) // fresh key, no state

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("key LONG, tsSec LONG, id LONG, v DOUBLE")
        .parquet(src)
        .as[graft.ops.TimeSeries.FfEvent]
      val q = graft.ops.TimeSeries.forwardFillStream(stream).writeStream
        .outputMode("append").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    wave1.toDF().write.mode("append").parquet(src)
    runOnce()
    wave2.toDF().write.mode("append").parquet(src)
    runOnce()

    val got = spark.table(name)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val batchTwin = graft.ops.TimeSeries.forwardFill(
        (wave1 ++ wave2).toDF(), "key", "tsSec", "id", Seq("v"))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got == batchTwin, s"stream must equal batch fill: $got vs $batchTwin")
    assert(got(4L).contains(2.0), "wave-2 hole must fill from wave-1 state")
    assert(got(6L).isEmpty, "a fresh key with no reading stays null")
  }

  test("streaming CMS maintenance: per-batch sketch merge equals the batch sketch") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_cms_src_").toString
    val base = java.nio.file.Files.createTempDirectory("graft_cms_sk_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cms_ck_").toString
    val (depth, width) = (3, 64)

    val wave1 = (0L until 40L).map(i => (i, s"alpha beta tok$i gamma"))
    val wave2 = (100L until 130L).map(i => (i, s"beta delta tok$i"))

    // counts are linear, so the running sketch is maintained by building a
    // sketch of each micro-batch and counter-merging it with the persisted
    // one — no reprocessing of history, the per-shard roll-up story applied
    // to time instead of space. Versioned dirs keep the read/write paths
    // disjoint (never overwrite what you are reading).
    def runOnce(): Unit = {
      val q = spark.readStream.schema("doc_id LONG, text STRING").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val inc = graft.ops.CountMin.sketch(batch, "text", depth, width)
          val prev = new java.io.File(s"$base/v${batchId - 1}")
          val merged =
            if (prev.exists()) graft.ops.CountMin.merge(
              batch.sparkSession.read.parquet(prev.toString), inc)
            else inc
          merged.write.mode("overwrite").parquet(s"$base/v$batchId")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    wave1.toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()
    wave2.toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()

    val streamed = spark.read.parquet(s"$base/v1")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batchTwin = graft.ops.CountMin.sketch(
        (wave1 ++ wave2).toDF("doc_id", "text"), "text", depth, width)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batchTwin,
      "incrementally merged stream sketch must equal the batch sketch counter-for-counter")
  }

  test("streaming grid-quantile maintenance: per-batch count merge equals the batch sketch") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_gq_src_").toString
    val base = java.nio.file.Files.createTempDirectory("graft_gq_sk_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_gq_ck_").toString

    val wave1 = (1 to 400).map(i => Tuple1(i * 0.7))
    val wave2 = (200 to 900).map(i => Tuple1(i * 0.7)) // overlaps wave 1

    def runOnce(): Unit = {
      val q = spark.readStream.schema("v DOUBLE").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val inc = graft.ops.Profile.gridCounts(batch, "v", 0.0, 700.0, 20)
          val prev = new java.io.File(s"$base/v${batchId - 1}")
          val merged =
            if (prev.exists()) graft.ops.Profile.mergeGridCounts(
              batch.sparkSession.read.parquet(prev.toString), inc)
            else inc
          merged.write.mode("overwrite").parquet(s"$base/v$batchId")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    wave1.toDF("v").write.mode("append").parquet(src)
    runOnce()
    wave2.toDF("v").write.mode("append").parquet(src)
    runOnce()

    val streamed = spark.read.parquet(s"$base/v1")
      .as[(Long, Long)].collect().toMap
    val all = (wave1 ++ wave2).toDF("v")
    val batchTwin = graft.ops.Profile.gridCounts(all, "v", 0.0, 700.0, 20)
      .as[(Long, Long)].collect().toMap
    assert(streamed === batchTwin,
      "incrementally merged counts must equal the batch sketch bucket-for-bucket")
    // and quantiles over the maintained sketch equal the batch quantiles
    val qs = Seq(0.5, 0.95)
    val estStream = graft.ops.Profile.quantilesFromCounts(
        spark.read.parquet(s"$base/v1"), 0.0, 700.0, 20, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(3)).toMap
    val estBatch = graft.ops.Profile.gridQuantiles(all, "v", 0.0, 700.0, 20, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(3)).toMap
    assert(estStream == estBatch)
  }

  test("streaming HLL maintenance: per-batch register merge equals the batch sketch") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_hll_src_").toString
    val base = java.nio.file.Files.createTempDirectory("graft_hll_sk_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_hll_ck_").toString

    val wave1 = (0L until 400L).map(i => Tuple1(i * 7))
    val wave2 = (300L until 700L).map(i => Tuple1(i * 7)) // overlaps wave 1

    // registers merge by per-bucket max — the CMS maintenance story with
    // max instead of plus, same versioned-dir discipline
    def runOnce(): Unit = {
      val q = spark.readStream.schema("v LONG").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val inc = graft.ops.Hll.registers(batch, "v", p = 8)
          val prev = new java.io.File(s"$base/v${batchId - 1}")
          val merged =
            if (prev.exists()) graft.ops.Hll.mergeRegisters(
              batch.sparkSession.read.parquet(prev.toString), inc)
            else inc
          merged.write.mode("overwrite").parquet(s"$base/v$batchId")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    wave1.toDF("v").write.mode("append").parquet(src)
    runOnce()
    wave2.toDF("v").write.mode("append").parquet(src)
    runOnce()

    val streamed = spark.read.parquet(s"$base/v1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchTwin = graft.ops.Hll.registers(
        (wave1 ++ wave2).toDF("v"), "v", p = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batchTwin,
      "incrementally merged registers must equal the batch sketch register-for-register")
    // and the estimate over the maintained registers equals the batch estimate
    val estStream = graft.ops.Hll
      .estimateFromRegisters(spark.read.parquet(s"$base/v1"), p = 8)
      .select("est").as[Long].head()
    val estBatch = graft.ops.Hll.estimate((wave1 ++ wave2).toDF("v"), "v", p = 8)
      .select("est").as[Long].head()
    assert(estStream == estBatch)
  }

  test("streaming EWMA: per-key smoothed state carries across micro-batches ≡ batch") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_ew_src_").toString
    val name = "ewma_out"
    val wave1 = Seq(
      graft.ops.TimeSeries.EwEvent("7", 100L, 1L, 10.0),
      graft.ops.TimeSeries.EwEvent("7", 300L, 2L, 20.0))
    val wave2 = Seq(
      graft.ops.TimeSeries.EwEvent("7", 400L, 3L, 0.0), // continues from s=15
      graft.ops.TimeSeries.EwEvent("8", 100L, 4L, 4.0)) // fresh key seeds with x₁

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("key STRING, tsSec LONG, id LONG, v DOUBLE")
        .parquet(src)
        .as[graft.ops.TimeSeries.EwEvent]
      val q = graft.ops.TimeSeries.ewmaStream(stream, alpha = 0.5).writeStream
        .outputMode("append").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    wave1.toDF().write.mode("append").parquet(src)
    runOnce()
    wave2.toDF().write.mode("append").parquet(src)
    runOnce()

    val got = spark.table(name)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val batchTwin = graft.ops.TimeSeries.ewma(
        (wave1 ++ wave2).map(e => (e.key, e.tsSec, e.id, e.v))
          .toDF("key", "tsSec", "id", "v"),
        "key", "tsSec", "id", "v", alpha = 0.5)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got == batchTwin, s"stream must equal batch EWMA: $got vs $batchTwin")
    assert(got(3L) == 7.5, "wave-2 step must continue from wave-1 state (0.5·0 + 0.5·15)")
  }

  test("streaming KMV maintenance: per-batch sketch merge equals the batch sketch") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_kmv_src_").toString
    val base = java.nio.file.Files.createTempDirectory("graft_kmv_sk_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_kmv_ck_").toString
    val k = 16

    val wave1 = (0L until 60L).map(i => (i, "en", s"alpha tok$i"))
    val wave2 = (100L until 140L).map(i => (i, if (i % 2 == 0) "en" else "de", s"tok$i beta"))

    // the bottom-k of distinct hashes is a function of the per-shard
    // bottom-ks, so the running sketch is maintained by sketching each
    // micro-batch and bottom-k-merging with the persisted one — the CMS
    // roll-up story with min-order union instead of counter addition
    def runOnce(): Unit = {
      val q = spark.readStream.schema("doc_id LONG, lang STRING, text STRING").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val inc = graft.ops.Kmv.sketchTokens(batch, "lang", "text", k)
          val prev = new java.io.File(s"$base/v${batchId - 1}")
          val merged =
            if (prev.exists()) graft.ops.Kmv.merge(
              batch.sparkSession.read.parquet(prev.toString), inc, "lang", k)
            else inc
          merged.write.mode("overwrite").parquet(s"$base/v$batchId")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    wave1.toDF("doc_id", "lang", "text").write.mode("append").parquet(src)
    runOnce()
    wave2.toDF("doc_id", "lang", "text").write.mode("append").parquet(src)
    runOnce()

    val streamed = spark.read.parquet(s"$base/v1")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val batchTwin = graft.ops.Kmv.sketchTokens(
        (wave1 ++ wave2).toDF("doc_id", "lang", "text"), "lang", "text", k)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(streamed === batchTwin,
      "incrementally merged stream sketch must equal the batch sketch hash-for-hash")
  }

  test("streaming top-k maintenance: per-batch winners merged with state equal batch top-k") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_tk_src_").toString
    val base = java.nio.file.Files.createTempDirectory("graft_tk_sk_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tk_ck_").toString
    val k = 3

    val wave1 = (0L until 50L).map(i => (i, s"g${i % 4}", (i * 37 % 101).toDouble))
    val wave2 = (100L until 140L).map(i => (i, s"g${i % 4}", (i * 53 % 101).toDouble))

    // top-k over row sets is mergeable: top-k(A ∪ B) = top-k(top-k(A) ∪ B),
    // so the running winner table is maintained by folding each micro-batch
    // into the persisted winners — the KMV/CMS roll-up pattern for rankings
    def runOnce(): Unit = {
      val q = spark.readStream.schema("id LONG, g STRING, v DOUBLE").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val prev = new java.io.File(s"$base/v${batchId - 1}")
          val pool =
            if (prev.exists())
              batch.sparkSession.read.parquet(prev.toString).unionByName(batch)
            else batch
          graft.ops.TopK.groupTopK(pool, "g", "v", "id", k)
            .write.mode("overwrite").parquet(s"$base/v$batchId")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    wave1.toDF("id", "g", "v").write.mode("append").parquet(src)
    runOnce()
    wave2.toDF("id", "g", "v").write.mode("append").parquet(src)
    runOnce()

    val streamed = spark.read.parquet(s"$base/v1")
      .select("id").as[Long].collect().toSet
    val batchTwin = graft.ops.TopK.groupTopK(
        (wave1 ++ wave2).toDF("id", "g", "v"), "g", "v", "id", k)
      .select("id").as[Long].collect().toSet
    assert(streamed === batchTwin,
      "incrementally folded winners must equal the batch top-k row-for-row")
  }

  test("streaming span corruption: stateless per-row transform streams unchanged") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_t5_src_").toString
    val name = "t5_out"
    val docs = (0L until 40L).map(i =>
      (i, (0 until 20).map(j => s"w${i}_$j").mkString(" ")))
    docs.toDF("doc_id", "text").write.mode("append").parquet(src)
    val q = spark.readStream.schema("doc_id LONG, text STRING").parquet(src)
      .transform(df =>
        graft.ops.Fim.spanCorrupt(df, "doc_id", "text", blockTokens = 8, spanTokens = 3))
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(name)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getString(3)))).toMap
    val batch = graft.ops.Fim.spanCorrupt(
        docs.toDF("doc_id", "text"), "doc_id", "text", blockTokens = 8, spanTokens = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getString(3)))).toMap
    assert(streamed == batch, "stream must equal batch string-for-string")
  }

  test("streaming web extraction: stateless per-row chains stream unchanged") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_web_src_").toString
    val name = "web_out"
    val docs = (0L until 30L).map(i =>
      (i, s"<div><p>body $i &amp; tail</p><script>1<2</script></div>\n" +
        s"Home | About | Contact\nreal content line number $i here"))
    docs.toDF("doc_id", "text").write.mode("append").parquet(src)
    def shape(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      graft.ops.WebExtract.htmlToText(col("text")).as("extracted"),
      graft.ops.WebExtract.removeBoilerplate(col("text")).as("cleaned"))
    val q = spark.readStream.schema("doc_id LONG, text STRING").parquet(src)
      .transform(shape)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table(name)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val batch = shape(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(streamed == batch, "stream must equal batch string-for-string")
  }

  test("streaming domain-rollup maintenance: per-batch fold equals the batch rollup") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_dom_src_").toString
    val base = java.nio.file.Files.createTempDirectory("graft_dom_st_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dom_ck_").toString

    def rollup(df: org.apache.spark.sql.DataFrame) = df
      .select(graft.ops.WebExtract.registeredDomain(
        graft.ops.WebExtract.urlHost(col("url"))).as("domain"),
        col("n_chars"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("tot_chars"))

    // counts/sums are mergeable: fold each micro-batch's rollup into the
    // persisted one by pointwise addition — the CMS/KMV roll-up pattern
    def runOnce(): Unit = {
      val q = spark.readStream.schema("url STRING, n_chars LONG").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val inc = rollup(batch)
          val prev = new java.io.File(s"$base/v${batchId - 1}")
          val merged =
            if (prev.exists())
              batch.sparkSession.read.parquet(prev.toString)
                .unionByName(inc)
                .groupBy("domain")
                .agg(sum(col("n_docs")).as("n_docs"),
                  sum(col("tot_chars")).as("tot_chars"))
            else inc
          merged.write.mode("overwrite").parquet(s"$base/v$batchId")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    val wave1 = (0L until 40L).map(i => (s"https://www.site${i % 4}.com/p$i", i))
    val wave2 = (0L until 30L).map(i => (s"https://cdn.site${i % 6}.co.uk/q$i", i + 100L))
    wave1.toDF("url", "n_chars").write.mode("append").parquet(src)
    runOnce()
    wave2.toDF("url", "n_chars").write.mode("append").parquet(src)
    runOnce()

    val streamed = spark.read.parquet(s"$base/v1")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val batchTwin = rollup((wave1 ++ wave2).toDF("url", "n_chars"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamed === batchTwin,
      "incrementally folded domain rollup must equal the batch rollup")
  }

  test("streaming nearest-geo against a persisted tile index equals the batch join") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_geo_src_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_geo_out_").toString + "/nn"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_geo_ck_").toString
    val idxDir = java.nio.file.Files.createTempDirectory("graft_geo_idx_").toString + "/tiles"

    // a static candidate dimension, tiled ONCE into the persisted index —
    // including an antimeridian and a polar candidate so the wrap/clamp
    // normalization is exercised through the artifact too
    val cands = Seq(
      (100L, 30.30, -97.70), (101L, 30.80, -97.20), (102L, 44.00, 10.00),
      (103L, 64.10, 179.95), (104L, -89.99, 0.0))
      .toDF("cand_id", "clat", "clon")
    graft.ops.GeoJoin.saveTileIndex(cands, "cand_id", "clat", "clon", zoom = 4, idxDir)

    val wave1 = Seq((1L, 30.31, -97.71), (2L, 64.15, -179.99))
    val wave2 = Seq((3L, -89.90, 5.0), (4L, 44.01, 10.01))
    def runOnce(): Unit = {
      val q = spark.readStream.schema("pt_id LONG, plat DOUBLE, plon DOUBLE").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.ops.GeoJoin.nearestByTileIndexed(
              batch, "pt_id", "plat", "plon", idxDir, "cand_id")
            .write.mode("append").parquet(out)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    wave1.toDF("pt_id", "plat", "plon").write.mode("append").parquet(src)
    runOnce()
    wave2.toDF("pt_id", "plat", "plon").write.mode("append").parquet(src)
    runOnce()

    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batchTwin = graft.ops.GeoJoin.nearestByTile(
        (wave1 ++ wave2).toDF("pt_id", "plat", "plon"), "pt_id", "plat", "plon",
        cands, "cand_id", "clat", "clon", zoom = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === batchTwin,
      "per-point results depend only on the point and the index — stream must equal batch")
    assert(streamed.map(_._1) === Set(1L, 2L, 3L, 4L))
    // the antimeridian point found its wrapped neighbor, the polar one its pole
    val byPoint = streamed.map(t => t._1 -> t._2).toMap
    assert(byPoint(2L) == 103L && byPoint(3L) == 104L)

    // a bare directory is refused, not guessed at
    val bare = java.nio.file.Files.createTempDirectory("graft_geo_bare_").toString
    val e = intercept[IllegalArgumentException](graft.ops.GeoJoin.nearestByTileIndexed(
      wave1.toDF("pt_id", "plat", "plon"), "pt_id", "plat", "plon", bare, "cand_id"))
    assert(e.getMessage.contains("saveTileIndex"))
  }

  test("streaming NB scoring against a persisted model equals batch scoring") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_nbs_src_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_nbs_out_").toString + "/scored"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_nbs_ck_").toString
    val modelDir = java.nio.file.Files.createTempDirectory("graft_nbs_m_").toString + "/model"

    val train = Seq(
      (1L, "spam", "buy cheap pills now"),
      (2L, "ham", "meeting notes for the quarter"),
      (3L, "ham", "notes from the board meeting")).toDF("id", "label", "text")
    graft.ops.Classify.saveNbModel(
      graft.ops.Classify.nbFit(train, "label", "text", vocabSize = 12L), modelDir)

    val docs = Seq((10L, "cheap pills"), (11L, "board meeting notes"), (12L, ""))
    docs.toDF("doc_id", "text").write.mode("append").parquet(src)
    // the model loads ONCE outside the per-batch closure — scoring is a
    // stateless join against the loaded artifact, so it streams unchanged
    val model = graft.ops.Classify.loadNbModel(spark, modelDir)
    val q = spark.readStream.schema("doc_id LONG, text STRING").parquet(src)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ops.Classify.nbPredictWith(model, batch, "doc_id", "text")
          .write.mode("append").parquet(out)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val batchTwin = graft.ops.Classify.nbPredictWith(
        model, docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(streamed === batchTwin, "stream and batch must agree score-for-score")
    assert(streamed.map(_._1) === Set(10L, 11L, 12L), "empty docs surface too")
  }

  test("streaming LR scoring against a persisted model equals batch scoring") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_lrs_src_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_lrs_out_").toString + "/scored"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_lrs_ck_").toString
    val modelDir = java.nio.file.Files.createTempDirectory("graft_lrs_m_").toString + "/model"

    val train = Seq(
      (1L, 1, "buy cheap pills now"),
      (2L, 0, "meeting notes for the quarter"),
      (3L, 0, "notes from the board meeting")).toDF("id", "label", "text")
    graft.ops.Logistic.saveLrModel(
      graft.ops.Logistic.lrFit(train, "label", "text", n = 2, buckets = 64, iters = 20),
      modelDir)

    val docs = Seq((10L, "buy cheap pills"), (11L, "board meeting notes"), (12L, ""))
    docs.toDF("doc_id", "text").write.mode("append").parquet(src)
    // the model loads ONCE outside the per-batch closure — scoring is a
    // stateless broadcast-weights pass, so it streams unchanged
    val model = graft.ops.Logistic.loadLrModel(spark, modelDir)
    val q = spark.readStream.schema("doc_id LONG, text STRING").parquet(src)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ops.Logistic.lrScores(batch, "doc_id", "text", model)
          .write.mode("append").parquet(out)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val batchTwin = graft.ops.Logistic.lrScores(
        docs.toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(streamed === batchTwin, "stream and batch must agree margin-for-margin")
    assert(streamed.map(_._1) === Set(10L, 11L, 12L), "empty docs surface too")
  }

  test("streaming EtlRun: exactly-once across restarts, replay, and checkpoint loss") {
    import spark.implicits._
    import java.sql.Timestamp
    val src = java.nio.file.Files.createTempDirectory("graft_setl_src_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_setl_ck_").toString
    val catDir = java.nio.file.Files.createTempDirectory("graft_setl_cat_").toString
    val cat = new graft.catalog.LakeCatalog(spark, catDir)

    var processed = 0L
    def stage(df: org.apache.spark.sql.DataFrame): Unit = processed += df.count()
    def items(rows: (String, String, String)*) =
      rows.toSeq.map { case (b, e, d) => (b, e, Timestamp.valueOf(d)) }
        .toDF("id_base", "id_ext", "collection_date")
    val schema = items().schema
    def run(checkpoint: String = ckpt): Unit =
      graft.streaming.StreamingEtlRun.run(
        spark, src, schema, cat, "rawjson", "gs", checkpoint)(stage)

    // batch 1: two items flow through the gate
    items(("siteA", "counts.json", "2020-01-15 00:00:00"),
      ("siteB", "counts.json", "2020-01-15 00:00:00"))
      .write.mode("append").parquet(src)
    run()
    assert(processed == 2 && cat.read().count() == 2)

    // restart with nothing new: the checkpoint yields an empty (or no)
    // batch; nothing reprocesses
    run()
    assert(processed == 2 && cat.read().count() == 2)

    // a new file arrives carrying one novel item AND a replay of an already
    // processed one — the checkpoint can't help here (new file), the
    // CATALOG gate rejects the duplicate
    items(("siteA", "counts.json", "2020-01-16 00:00:00"),
      ("siteA", "counts.json", "2020-01-15 00:00:00"))
      .write.mode("append").parquet(src)
    run()
    assert(processed == 3 && cat.read().count() == 3)

    // catastrophic restart: the checkpoint is LOST, every file replays from
    // scratch — the catalog gate still yields zero novel items
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_setl_ck2_").toString
    run(ckpt2)
    assert(processed == 3 && cat.read().count() == 3)
  }

  test("watermark bounds state in append mode") {
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream2_").toString
    events.write.mode("overwrite").parquet(dir)
    // append mode only emits closed windows — with AvailableNow + 1h
    // watermark every window except the last hour's closes
    val appended = Streaming.runAvailableNow(
      spark, dir, events.schema,
      df => Streaming.windowedAgg(df, "ts", Seq("event_type"), Seq("value"),
        watermark = "1 hour"),
      outputMode = "append")
    val total = Streaming.runAvailableNow(
      spark, dir, events.schema,
      df => Streaming.windowedAgg(df, "ts", Seq("event_type"), Seq("value"),
        watermark = "1 hour"),
      outputMode = "complete")
    assert(appended.count() > 0)
    assert(appended.count() <= total.count())
  }

  test("streaming sentence chunking: per-batch chunking over whole docs equals batch") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_sch_src_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sch_out_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sch_ck_").toString
    val wave1 = (0L until 20L).map(i =>
      (i, (0 until 15).map(j => s"w${i}_$j" + (if (j % 4 == 3) "." else "")).mkString(" ")))
    val wave2 = (20L until 35L).map(i =>
      (i, (0 until 9).map(j => s"s${i}_$j" + (if (j % 3 == 2) "!" else "")).mkString(" ")))
    def runOnce(): Unit = {
      // docs arrive WHOLE, so chunking each batch independently is exact —
      // the per-doc operator commutes with any batch split
      val q = spark.readStream.schema("doc_id LONG, text STRING").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.ops.TextAnalysis.sentenceChunks(batch, "doc_id", "text", maxTokens = 6)
            .write.mode("append").parquet(out)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    wave1.toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()
    wave2.toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()
    val streamed = spark.read.parquet(out).collect().map(_.toString).sorted.toSeq
    val batch = graft.ops.TextAnalysis.sentenceChunks(
        (wave1 ++ wave2).toDF("doc_id", "text"), "doc_id", "text", maxTokens = 6)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch, "per-batch chunking must equal whole-corpus chunking")
  }

  test("streaming calibration maintenance: per-batch cell merge equals the batch diagram") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_cal_src_").toString
    val base = java.nio.file.Files.createTempDirectory("graft_cal_sk_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cal_ck_").toString

    val wave1 = (1 to 300).map(i => ("m", (i % 100) / 100.0, i % 2))
    val wave2 = (50 to 500).map(i => ("m", (i % 97) / 97.0, (i + 1) % 2))

    def runOnce(): Unit = {
      val q = spark.readStream.schema("grp STRING, p DOUBLE, label INT").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val inc = graft.ops.RankEval.calibrationCounts(batch, "grp", "p", "label", 10)
          val prev = new java.io.File(s"$base/v${batchId - 1}")
          val merged =
            if (prev.exists()) graft.ops.RankEval.mergeCalibrationCounts(
              batch.sparkSession.read.parquet(prev.toString), inc)
            else inc
          merged.write.mode("overwrite").parquet(s"$base/v$batchId")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    wave1.toDF("grp", "p", "label").write.mode("append").parquet(src)
    runOnce()
    wave2.toDF("grp", "p", "label").write.mode("append").parquet(src)
    runOnce()

    val all = (wave1 ++ wave2).toDF("grp", "p", "label")
    val streamedDiagram = graft.ops.RankEval.calibrationFromCounts(
        spark.read.parquet(s"$base/v1"))
      .collect().map(_.toString).sorted.toSeq
    val batchDiagram = graft.ops.RankEval.calibrationBins(all, "grp", "p", "label", 10)
      .collect().map(_.toString).sorted.toSeq
    assert(streamedDiagram == batchDiagram,
      "reliability diagram over maintained counts must equal the batch diagram")
    // and the maintained ECE: derive from the same counts
    val ones = graft.ops.RankEval.ece(all, "grp", "p", "label", 10).head()
    assert(ones.getAs[Double]("ece") >= 0.0)
  }

  test("streaming e2e curation: two-wave gate/dedup/pack chain equals batch, replay-idempotent through checkpoint loss") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = java.nio.file.Files.createTempDirectory("graft_e2es_src_").toString
    val base = java.nio.file.Files.createTempDirectory("graft_e2es_state_").toString
    val lakeDir = s"$base/lake"
    val hashDir = s"$base/hashes"
    val bandDir = s"$base/bands"
    var ckpt = java.nio.file.Files.createTempDirectory("graft_e2es_ck_").toString

    // fixture that PASSES the decideWeb gates: >= 50 words, mean word
    // length 3-10, >= 2 stopword hits, 5 distinct period-terminated lines
    // of >= 3 words, no braces, all tokens distinct (repetition ratios ok)
    def body(seed: String, variant: String): String =
      (0 until 5).map { l =>
        val ws = (0 until 12).map(w => s"${seed}w${l * 12 + w}")
        (if (l == 0) "the " + ws.tail.mkString(" ")
         else if (l == 1) "and " + ws.tail.mkString(" ")
         else ws.mkString(" ")) + (if (l == 4) s" $variant." else ".")
      }.mkString("\n")
    // near-dup groups are band-CLIQUES with the minimum id in the earliest
    // wave — the documented equivalence domain (transitive chains split
    // across waves may differ, as for exact dedup's first-arrival rule)
    val wave1 = Seq(
      10L -> body("alpha", "variantone"),   // near-dup group A, canonical
      11L -> body("beta", "variantone"),    // near-dup group B, canonical
      12L -> body("beta", "varianttwo"),    // group B, same wave
      13L -> body("gamma", "variantone"),   // exact-dup group C, canonical
      14L -> body("delta", "variantone"),   // unique
      15L -> (body("eps", "variantone") + " {json}")) // gate-failing (c4 brace)
    val wave2 = Seq(
      20L -> body("alpha", "varianttwo"),   // group A, later wave -> dropped
      21L -> body("gamma", "variantone"),   // exact dup of 13 -> dropped
      22L -> body("zeta", "variantone"))    // unique
    val allDocs = (wave1 ++ wave2).toDF("doc_id", "text")

    // fixture sanity: every non-brace doc passes the gates; each near-dup
    // group is a band clique (shares at least one (band, sig) row)
    val webAll = graft.ops.Curate.decideWeb(allDocs, "doc_id", "text")
    assert(webAll.filter(col("gopher_ok") && col("c4_ok") && col("rep_ok"))
      .count() == 8L, "all docs except the brace doc must pass the heuristic gates")
    val bandsAll = graft.ops.Dedup.lshBandRows(allDocs, "doc_id", "text")
    def bandSet(id: Long) = bandsAll.filter(col("doc_id") === id)
      .select("band", "sig").collect().map(_.toString).toSet
    assert(bandSet(10L).intersect(bandSet(20L)).nonEmpty, "group A must collide")
    assert(bandSet(11L).intersect(bandSet(12L)).nonEmpty, "group B must collide")

    // seed empty state (schema-only artifacts + lake)
    allDocs.limit(0).write.mode("overwrite").parquet(lakeDir)
    allDocs.limit(0).select(md5(col("text")).as("content_hash"))
      .write.mode("overwrite").parquet(hashDir)
    graft.ops.Dedup.lshBandRows(allDocs.limit(0), "doc_id", "text")
      .select("band", "sig").write.mode("overwrite").parquet(bandDir)

    def runOnce(): Unit = {
      val q = spark.readStream.schema("doc_id LONG, text STRING").parquet(src)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val flags = graft.ops.Curate.decideWebAgainstHistory(
            batch,
            spark.read.parquet(hashDir),
            spark.read.parquet(bandDir),
            "doc_id", "text")
          // materialize ONCE: every union below re-executes kept's plan
          // otherwise, and the later ones would re-read state dirs this
          // very batch has already overwritten
          val kept = batch.join(
            flags.filter(col("keep")).select("doc_id"), Seq("doc_id"))
            .localCheckpoint()
          // idempotent set-union rewrites (materialize BEFORE overwriting
          // the dir being read — the appendCorpusRanks rule): a replayed
          // batch re-derives the same rows and the union dedups them away
          val newLake = spark.read.parquet(lakeDir).unionByName(kept)
            .dropDuplicates("doc_id").localCheckpoint()
          newLake.write.mode("overwrite").parquet(lakeDir)
          val newHashes = spark.read.parquet(hashDir)
            .unionByName(kept.select(
              md5(trim(lower(coalesce(col("text"), lit(""))))).as("content_hash")))
            .distinct().localCheckpoint()
          newHashes.write.mode("overwrite").parquet(hashDir)
          val newBands = spark.read.parquet(bandDir)
            .unionByName(graft.ops.Dedup.lshBandRows(kept, "doc_id", "text")
              .select("band", "sig"))
            .distinct().localCheckpoint()
          newBands.write.mode("overwrite").parquet(bandDir)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    wave1.toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()
    wave2.toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()

    def lakeIds = spark.read.parquet(lakeDir)
      .select("doc_id").as[Long].collect().toSet

    // batch twin: decideWeb keep -> LSH clusters -> keep canonical
    val kept1 = allDocs.join(
      webAll.filter(col("keep")).select("doc_id"), Seq("doc_id"))
    val clusters = graft.ops.ConnectedComponents.assign(
      kept1.select(col("doc_id")), "doc_id",
      graft.ops.Dedup.minhashLshPairs(kept1, "doc_id", "text"), "id_a", "id_b")
    val batchKept = clusters.filter(col("doc_id") === col("cluster_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(lakeIds == batchKept,
      s"stream lake $lakeIds must equal batch composition $batchKept")
    assert(lakeIds == Set(10L, 11L, 13L, 14L, 22L))

    // the pack stage runs over the SAME kept set on both sides -> equal
    def packed(docs: org.apache.spark.sql.DataFrame) = {
      val toks = split(trim(lower(col("text"))), "\\s+")
      graft.ops.Pack.packTokenIdsWithMask(
          docs.select(col("doc_id"), toks.as("ids"),
            transform(sequence(lit(0), size(toks) - 1), i => i % 3 === 0).as("mask")),
          "doc_id", "ids", "mask", budget = 128, numShards = 8)
        .collect().map(_.toString).sorted.toSeq
    }
    assert(packed(spark.read.parquet(lakeDir)) ==
      packed(allDocs.join(batchKept.toSeq.toDF("doc_id"), Seq("doc_id"))))

    // checkpoint LOSS: both waves replay against the already-updated state
    // — the set-union rewrites and pure-function flags make it a no-op
    ckpt = java.nio.file.Files.createTempDirectory("graft_e2es_ck2_").toString
    runOnce()
    assert(lakeIds == batchKept, "replay after checkpoint loss must not change the lake")
    assert(spark.read.parquet(hashDir).count() == 5L)
  }
}
