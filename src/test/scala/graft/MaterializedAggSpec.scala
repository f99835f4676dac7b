package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.{MaterializedAgg, SnapshotLake}

/** Incremental materialized-aggregate maintenance: after ANY commit
  * sequence (inserts, upserts that retract-and-readd, partition deletes),
  * the maintained rollup must equal the rollup recomputed from the live
  * table — and a crash between state flip and ack must replay without
  * double-counting, including when new commits land after the crash.
  */
class MaterializedAggSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(): (SnapshotLake, MaterializedAgg) = {
    val dir = Files.createTempDirectory("graft_magg_lake").toString
    val lake = new SnapshotLake(spark, dir)
    val agg = MaterializedAgg(spark, lake,
      Files.createTempDirectory("graft_magg_state").toString,
      consumerId = "rollup", pk = Seq("k", "part"), partitionCols = Seq("part"),
      groupCols = Seq("grp"), sumCols = Seq("v"))
    (lake, agg)
  }

  private def rows(t: (Long, String, String, Double)*) =
    t.toDF("k", "part", "grp", "v")

  private def recomputed(lake: SnapshotLake) =
    lake.read(Seq("part"))
      .groupBy("grp")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast("decimal(28,6)")).cast("decimal(28,6)").as("v_sum"))

  private def same(agg: MaterializedAgg, lake: SnapshotLake): Unit = {
    val a = agg.read().select("grp", "cnt", "v_sum").collect().toSet
    val b = recomputed(lake).select("grp", "cnt", "v_sum").collect().toSet
    assert(a == b, s"maintained $a != recomputed $b")
  }

  test("maintained rollup tracks inserts, upsert retractions, and deletes exactly") {
    val (lake, agg) = fresh()
    lake.commit(rows((1L, "p1", "a", 1.5), (2L, "p1", "b", 2.0), (3L, "p2", "a", 4.0)),
      Seq("part"))
    agg.refresh(); same(agg, lake)

    // upsert moves k=2 from grp b to grp a and changes its value — the CDF
    // update_pre retracts (b, 2.0) and update_post adds (a, 10.0)
    lake.upsert(rows((2L, "p1", "a", 10.0), (4L, "p2", "b", 7.0)),
      Seq("k", "part"), "v", Seq("part"))
    agg.refresh(); same(agg, lake)

    // delete all of p1: grp b must vanish entirely (cnt back to 0)
    lake.deleteWhere(col("part") === "p1", Seq("part"))
    agg.refresh(); same(agg, lake)
    assert(agg.read().filter(col("cnt") === 0).count() == 0)

    // caught-up refresh is a no-op
    val v = agg.refresh()
    assert(agg.appliedVersion.contains(v)); same(agg, lake)
  }

  test("crash between state flip and ack: replay never double-counts, even with new commits") {
    val (lake, agg) = fresh()
    lake.commit(rows((1L, "p1", "a", 1.0), (2L, "p1", "b", 2.0)), Seq("part"))
    agg.refresh()

    lake.commit(rows((3L, "p1", "a", 5.0)), Seq("part"))
    // crash: state reflects v2, consumer offset still v1
    val v2 = agg.refreshCrashBeforeAck()
    assert(agg.appliedVersion.contains(v2))
    assert(lake.consumerOffset("rollup").exists(_ < v2), "ack must not have happened")

    // new commit lands AFTER the crash — the stale offset's delta would
    // overlap the applied range; the heal-first ack must prevent a double
    // count of (3, a, 5.0)
    lake.commit(rows((4L, "p2", "b", 9.0)), Seq("part"))
    agg.refresh(); same(agg, lake)

    // plain replay with no new commits: fold skipped, offset healed
    val v = agg.refreshCrashBeforeAck()
    agg.refresh(); same(agg, lake)
    assert(lake.consumerOffset("rollup").contains(v))
  }

  test("refresh cost is delta-bounded: a one-row commit folds one-row delta, not the base") {
    val (lake, agg) = fresh()
    val base = (1L to 500L).map(i => (i, s"p${i % 4}", s"g${i % 7}", i * 0.5))
    lake.commit(base.toDF("k", "part", "grp", "v"), Seq("part"))
    agg.refresh()
    val v1 = lake.latestVersion.get
    // upsert (not commit — commit REPLACES partitions, so its honest delta
    // is the partition) merges one row in; its CDF delta is exactly that row
    lake.upsert(rows((1001L, "p1", "g3", 100.0)), Seq("k", "part"), "v", Seq("part"))
    val v2 = lake.latestVersion.get
    assert(lake.changes(v1, v2, Seq("k", "part"), Seq("part")).count() == 1)
    agg.refresh(); same(agg, lake)
    // state vacuum keeps the pointer's directory readable
    agg.vacuumState(keepLast = 0)
    same(agg, lake)
  }

  test("streaming composition: exactly-once lake sink + per-wave refresh keep the rollup live") {
    import org.apache.spark.sql.streaming.Trigger
    val (lake, agg) = fresh()
    val src = Files.createTempDirectory("graft_magg_src").toString
    val ckpt = Files.createTempDirectory("graft_magg_ck").toString

    def runWave(): Unit = {
      val q = graft.streaming.Streaming.snapshotSink(
        spark.readStream.schema("k LONG, part STRING, grp STRING, v DOUBLE").parquet(src),
        lake, Seq("part"), appId = "magg_stream", checkpoint = ckpt,
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
      agg.refresh()
    }

    rows((1L, "p1", "a", 1.0), (2L, "p1", "b", 2.0))
      .write.mode("append").parquet(src)
    runWave(); same(agg, lake)
    rows((3L, "p2", "a", 5.0), (4L, "p2", "b", 0.5))
      .write.mode("append").parquet(src)
    runWave(); same(agg, lake)
    // replay the whole stream from a FRESH checkpoint: commitIfNew dedups
    // the lake commits, so the rollup must not double
    val q2 = graft.streaming.Streaming.snapshotSink(
      spark.readStream.schema("k LONG, part STRING, grp STRING, v DOUBLE").parquet(src),
      lake, Seq("part"), appId = "magg_stream",
      checkpoint = Files.createTempDirectory("graft_magg_ck2").toString,
      trigger = Trigger.AvailableNow())
    q2.awaitTermination()
    agg.refresh(); same(agg, lake)
    assert(agg.read().agg(sum(col("cnt"))).head().getLong(0) == 4L,
      "replayed stream must not inflate the rollup")
  }

  test("zero-state read before the first refresh has the rollup schema") {
    val (lake, agg) = fresh()
    lake.commit(rows((1L, "p1", "a", 1.0)), Seq("part"))
    val empty = agg.read()
    assert(empty.columns.toSeq == Seq("grp", "cnt", "v_sum"))
    assert(empty.count() == 0)
  }
}
