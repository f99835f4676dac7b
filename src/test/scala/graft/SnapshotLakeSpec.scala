package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.SnapshotLake

/** Snapshot-isolated versioned lake: partition-grain overwrite semantics,
  * time travel, optimistic concurrent commits without lost updates, and
  * vacuum keeping exactly the live data.
  */
class SnapshotLakeSpec extends SparkSpec {

  private def fresh(): (SnapshotLake, String) = {
    val dir = Files.createTempDirectory("graft_snap").toString
    (new SnapshotLake(spark, dir), dir)
  }

  private def batch(status: String*)(pointer: String) = {
    import spark.implicits._
    Tables(spark, "/root/testdata/sf0.001", "orders")
      .filter(col("o_orderstatus").isin(status: _*))
      .select(col("o_orderkey"), col("o_orderstatus"), lit(pointer).as("pointer"))
  }

  test("commits replace whole partitions; time travel reads old snapshots") {
    val (lake, _) = fresh()
    val v1 = lake.commit(batch("F", "O", "P")("first"), Seq("o_orderstatus"))
    val v2 = lake.commit(batch("F")("second"), Seq("o_orderstatus"))
    assert(v1 === 1L && v2 === 2L)

    val latest = lake.read(Seq("o_orderstatus"))
    val byStatus = latest.groupBy("o_orderstatus", "pointer").count()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(byStatus === Set(("F", "second"), ("O", "first"), ("P", "first")))

    val old = lake.read(Seq("o_orderstatus"), Some(v1))
    assert(old.select("pointer").distinct().collect().map(_.getString(0)).toSet === Set("first"))
    // row counts preserved exactly per snapshot
    assert(old.count() === batch("F", "O", "P")("x").count())
    assert(latest.count() === old.count())
  }

  test("concurrent disjoint-partition commits both land (optimistic retry)") {
    val (lake, _) = fresh()
    lake.commit(batch("F", "O")("base"), Seq("o_orderstatus"))
    val t1 = new Thread(() => lake.commit(batch("F")("writer1"), Seq("o_orderstatus")))
    val t2 = new Thread(() => lake.commit(batch("O")("writer2"), Seq("o_orderstatus")))
    t1.start(); t2.start(); t1.join(); t2.join()

    val got = lake.read(Seq("o_orderstatus"))
      .groupBy("o_orderstatus", "pointer").count()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("F", "writer1"), ("O", "writer2")),
      "neither concurrent writer may lose its partition")
    assert(lake.versions === Seq(1L, 2L, 3L), "both commits must take distinct versions")
  }

  test("a reader's resolved snapshot is immune to later commits") {
    val (lake, _) = fresh()
    val v1 = lake.commit(batch("F")("first"), Seq("o_orderstatus"))
    val snapshot = lake.read(Seq("o_orderstatus"), Some(v1)) // resolve BEFORE the next commit
    lake.commit(batch("F")("second"), Seq("o_orderstatus"))
    assert(snapshot.select("pointer").distinct().collect().map(_.getString(0)).toSet
      === Set("first"))
  }

  test("vacuum drops unreferenced data but keeps surviving snapshots readable") {
    val (lake, dir) = fresh()
    lake.commit(batch("F")("v1"), Seq("o_orderstatus"))
    lake.commit(batch("F")("v2"), Seq("o_orderstatus"))
    val v3 = lake.commit(batch("O")("v3"), Seq("o_orderstatus"))
    lake.vacuum(keepLast = 1)
    assert(lake.versions === Seq(v3))
    val got = lake.read(Seq("o_orderstatus"))
      .select("pointer").distinct().collect().map(_.getString(0)).toSet
    assert(got === Set("v2", "v3"), "latest manifest references v2's F dir and v3's O dir")
    // only live data dirs remain on disk
    val s = Files.list(java.nio.file.Paths.get(dir, "data"))
    val nDirs = try s.count() finally s.close()
    assert(nDirs === 2, "exactly the two referenced partition dirs survive")
  }
}
