package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.SnapshotLake

/** Deletion vectors: zero-rewrite row-level deletes. Reads anti-join the
  * scan against the persisted position relation; data dirs never rewrite;
  * everything versions with the manifest.
  */
class DeletionVectorSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(): (SnapshotLake, String) = {
    val root = Files.createTempDirectory("graft_dv").toString
    (new SnapshotLake(spark, root), root)
  }

  private def seed(lake: SnapshotLake): Long =
    lake.commit(
      Seq((1L, "a", 10.0, "p1"), (2L, "b", 20.0, "p1"), (3L, "c", 30.0, "p2"),
        (4L, "d", 40.0, "p2"), (5L, "e", 50.0, "p3"))
        .toDF("id", "name", "score", "part"),
      Seq("part"))

  private def dirExpr = regexp_replace(col("file"), "/[^/]+$", "")

  private def dirsOf(lake: SnapshotLake, v: Long): Set[String] =
    lake.files(Seq("part"), Some(v)).select(dirExpr)
      .collect().map(_.getString(0)).toSet

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").as[Long].collect().toSet

  test("dv delete removes rows with ZERO rewrite; time travel sees them; stacking composes") {
    val (lake, _) = fresh()
    val v1 = seed(lake)
    val v2 = lake.deleteWhereDv(col("score") > 35.0, Seq("part"))
    assert(ids(lake.read(Seq("part"))) == Set(1L, 2L, 3L))
    // zero rewrite: the SAME data dirs back both versions
    assert(dirsOf(lake, v1) == dirsOf(lake, v2))
    // time travel before the DV commit sees every row
    assert(ids(lake.read(Seq("part"), Some(v1))) == Set(1L, 2L, 3L, 4L, 5L))
    // second DV stacks
    lake.deleteWhereDv(col("name") === "a", Seq("part"))
    assert(ids(lake.read(Seq("part"))) == Set(2L, 3L))
    // NULL-evaluating predicates keep their rows (SQL DELETE semantics)
    lake.deleteWhereDv(col("name") === lit(null).cast("string"), Seq("part"))
    assert(ids(lake.read(Seq("part"))) == Set(2L, 3L))
  }

  test("no-match dv delete is a no-op, not a version; predicates may span partition+data cols") {
    val (lake, _) = fresh()
    seed(lake)
    val before = lake.latestVersion.get
    assert(lake.deleteWhereDv(col("score") > 1e9, Seq("part")) == before)
    assert(lake.latestVersion.get == before)
    // partition-column predicate composes with data columns
    lake.deleteWhereDv(col("part") === "p2" && col("score") < 35.0, Seq("part"))
    assert(ids(lake.read(Seq("part"))) == Set(1L, 2L, 4L, 5L))
  }

  test("commits after a DV keep it; rewrites materialize deletes for touched partitions") {
    val (lake, _) = fresh()
    seed(lake)
    lake.deleteWhereDv(col("id") === 3L, Seq("part"))
    // a later commit to ANOTHER partition leaves the DV applied
    lake.commit(Seq((6L, "f", 60.0, "p4")).toDF("id", "name", "score", "part"), Seq("part"))
    assert(ids(lake.read(Seq("part"))) == Set(1L, 2L, 4L, 5L, 6L))
    // upsert touching p2 rewrites it THROUGH the DV filter: id=3 stays gone
    lake.upsert(
      Seq((4L, "d2", 41.0, "p2", 2L)).toDF("id", "name", "score", "part", "ver"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val got = lake.read(Seq("part"))
    assert(ids(got) == Set(1L, 2L, 4L, 5L, 6L))
    assert(got.filter(col("id") === 4L).head().getAs[String]("name") == "d2")
    // optimize (forced rewrite via z-order) MATERIALIZES the deletes:
    // row set unchanged, and the rewritten files no longer need the DV
    lake.optimize(zorderCols = Seq("id"))
    assert(ids(lake.read(Seq("part"))) == Set(1L, 2L, 4L, 5L, 6L))
  }

  test("compactDeletes folds stacked DVs to one relation; reads unchanged; dead addresses shed") {
    val (lake, _) = fresh()
    seed(lake)
    lake.deleteWhereDv(col("id") === 1L, Seq("part"))
    lake.deleteWhereDv(col("id") === 3L, Seq("part"))
    lake.deleteWhereDv(col("id") === 5L, Seq("part"))
    val before = ids(lake.read(Seq("part")))
    assert(before == Set(2L, 4L))
    // rewrite p1 (materializes id=1's delete there): its DV address dies
    lake.upsert(
      Seq((2L, "b2", 21.0, "p1", 2L)).toDF("id", "name", "score", "part", "ver"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val v = lake.compactDeletes()
    assert(lake.latestVersion.get == v)
    assert(ids(lake.read(Seq("part"))) == Set(2L, 4L))
    // idempotent: a second compaction is a no-op version-wise
    assert(lake.compactDeletes() == v)
    // time travel across the compaction boundary still sees the same rows
    assert(ids(lake.read(Seq("part"), Some(v - 1))) == Set(2L, 4L))
  }

  test("CDF across a DV commit reports exactly the deleted rows") {
    val (lake, _) = fresh()
    val v1 = seed(lake)
    val v2 = lake.deleteWhereDv(col("id").isin(2L, 4L), Seq("part"))
    val delta = lake.changes(v1, v2, Seq("id", "part"), Seq("part"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(delta == Set(("delete", 2L), ("delete", 4L)))
  }

  test("vacuum keeps DV dirs live; reads survive keepLast=1 + minAgeMs=0") {
    val (lake, _) = fresh()
    seed(lake)
    lake.deleteWhereDv(col("id") === 5L, Seq("part"))
    lake.commit(Seq((7L, "g", 70.0, "p5")).toDF("id", "name", "score", "part"), Seq("part"))
    lake.vacuum(keepLast = 1, minAgeMs = 0L)
    assert(ids(lake.read(Seq("part"))) == Set(1L, 2L, 3L, 4L, 7L))
  }

  test("relocation: leaf-based row addresses keep DVs attached after moving the lake") {
    val (lake, root) = fresh()
    seed(lake)
    lake.deleteWhereDv(col("id") <= 2L, Seq("part"))
    val newRoot = Files.createTempDirectory("graft_dv_moved").toString + "/lake"
    Files.move(java.nio.file.Paths.get(root), java.nio.file.Paths.get(newRoot),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val moved = new SnapshotLake(spark, newRoot)
    assert(ids(moved.read(Seq("part"))) == Set(3L, 4L, 5L))
  }

  test("clone carries DVs (absolute); restore reverts them with the data") {
    val (lake, _) = fresh()
    val v1 = seed(lake)
    lake.deleteWhereDv(col("id") === 1L, Seq("part"))
    val dst = Files.createTempDirectory("graft_dv_clone").toString + "/c"
    lake.cloneTo(dst)
    val clone = new SnapshotLake(spark, dst)
    assert(ids(clone.read(Seq("part"))) == Set(2L, 3L, 4L, 5L))
    // restore to pre-DV state brings the row back as a NEW commit
    lake.restore(v1)
    assert(ids(lake.read(Seq("part"))) == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("DV composes with rename and widen (row addresses are physical, schema is logical)") {
    import org.apache.spark.sql.types._
    val (lake, _) = fresh()
    lake.commit(
      Seq((1, 100, "p1"), (2, 200, "p1"), (3, 300, "p2")).toDF("id", "cnt", "part"),
      Seq("part"))
    lake.renameColumn("cnt", "hits")
    lake.widenColumn("hits", "bigint")
    lake.deleteWhereDv(col("hits") === 200L, Seq("part"))
    val out = lake.read(Seq("part"))
    assert(out.schema("hits").dataType == LongType)
    assert(out.select("id").as[Int].collect().toSet == Set(1, 3))
    // readPruned applies DVs too
    val pruned = lake.readPruned(Seq("hits"), "hits", 50.0, 250.0)
    assert(pruned.select("id").as[Int].collect().toSet == Set(1))
  }
}
