package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.SnapshotLake

/** Manifest-level partition stats (Delta-style log data skipping): commit
  * promotes parquet-footer min/max into `#meta stats:` lines, so
  * partition-grain pruning costs zero file I/O; absence of stats always
  * degrades to "candidate", never to a wrong exclusion.
  */
class ManifestStatsSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(): SnapshotLake =
    new SnapshotLake(spark, Files.createTempDirectory("graft_mstats").toString)

  private def seed(lake: SnapshotLake): Long =
    lake.commit(
      Seq(
        (1L, 10.0, "p1"), (2L, 20.0, "p1"),    // p1: score ∈ [10, 20]
        (3L, 100.0, "p2"), (4L, 200.0, "p2"),  // p2: score ∈ [100, 200]
        (5L, 1000.0, "p3"))                     // p3: score ∈ [1000, 1000]
        .toDF("id", "score", "part"),
      Seq("part"))

  test("prunePartitions answers range queries from the manifest alone") {
    val lake = fresh()
    seed(lake)
    assert(lake.prunePartitions("score", 15.0, 25.0) == Seq("p1"))
    assert(lake.prunePartitions("score", 150.0, 9999.0).toSet == Set("p2", "p3"))
    assert(lake.prunePartitions("score", 5000.0, 6000.0).isEmpty)
    // id stats exist too
    assert(lake.prunePartitions("id", 3.0, 4.0) == Seq("p2"))
  }

  test("readPruned result is exact and the empty-candidate case short-circuits") {
    val lake = fresh()
    seed(lake)
    val got = lake.readPruned(Seq("score"), "score", 15.0, 150.0)
      .select("score").collect().map(_.getDouble(0)).toSet
    assert(got == Set(20.0, 100.0))
    val none = lake.readPruned(Seq("score"), "score", 5000.0, 6000.0)
    assert(none.count() == 0L)
    assert(none.columns.contains("score"))
  }

  test("rewrites refresh stats; replaced partitions leave no stale entries") {
    val lake = fresh()
    seed(lake)
    // replace p1 with a much larger range
    lake.commit(Seq((6L, 5000.0, "p1")).toDF("id", "score", "part"), Seq("part"))
    assert(lake.prunePartitions("score", 4000.0, 6000.0) == Seq("p1"))
    assert(lake.prunePartitions("score", 10.0, 20.0).isEmpty,
      "old p1 stats must not linger")
    // the previous version still answers with ITS stats (time travel)
    assert(lake.prunePartitions("score", 10.0, 20.0, Some(1L)) == Seq("p1"))
  }

  test("deleteWhere and upsert keep stats truthful for rewritten partitions") {
    val lake = fresh()
    seed(lake)
    lake.deleteWhere(col("score") === 20.0, Seq("part"))
    // p1 now holds only 10.0: a [15, 25] query excludes it
    assert(lake.prunePartitions("score", 15.0, 25.0).isEmpty)
    assert(lake.read(Seq("part")).count() == 4L)
    lake.upsert(
      Seq((1L, 99.0, "p1", 2L)).toDF("id", "score", "part", "ver"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    assert(lake.prunePartitions("score", 90.0, 99.5) == Seq("p1"))
  }

  test("stats follow the PHYSICAL column across a rename; logical queries keep pruning") {
    val lake = fresh()
    seed(lake)
    lake.renameColumn("score", "quality")
    assert(lake.prunePartitions("quality", 15.0, 25.0) == Seq("p1"))
    // a write after the rename regenerates stats under the physical name
    lake.commit(Seq((7L, 7.0, "p4")).toDF("id", "quality", "part"), Seq("part"))
    assert(lake.prunePartitions("quality", 6.0, 8.0) == Seq("p4"))
    val got = lake.readPruned(Seq("quality"), "quality", 6.0, 8.0)
      .select("quality").collect().map(_.getDouble(0)).toSet
    assert(got == Set(7.0))
  }

  test("optimize carries stats to rewritten dirs (row-preserving rewrite keeps them true)") {
    val lake = fresh()
    seed(lake)
    // force a compaction rewrite of every partition (targetBytes tiny →
    // numOut 1, zorder forces rewrite even when file counts match)
    lake.optimize(targetBytes = 1L, zorderCols = Seq("id"))
    // stats carried across the rewrite: pruning stays manifest-only
    assert(lake.prunePartitions("score", 15.0, 25.0) == Seq("p1"))
    val got = lake.readPruned(Seq("score"), "score", 15.0, 25.0)
      .select("score").collect().map(_.getDouble(0)).toSet
    assert(got == Set(20.0))
  }

  test("missing stats degrade to candidate: an all-null column stores none, stays scannable") {
    val lake = fresh()
    lake.commit(
      Seq((1L, Option.empty[Double], "p1"), (2L, Option.empty[Double], "p1"),
        (3L, Some(5.0), "p2"))
        .toDF("id", "score", "part"),
      Seq("part"))
    // p1's score is all-null → no stats entry → always a candidate
    assert(lake.prunePartitions("score", 100.0, 200.0) == Seq("p1"))
    // and the scan stays exact: no rows in range
    assert(lake.readPruned(Seq("score"), "score", 100.0, 200.0).count() == 0L)
  }
}
