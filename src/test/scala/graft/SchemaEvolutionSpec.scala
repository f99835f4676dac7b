package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.SnapshotLake

/** Rename-safe column mapping (the Delta/Iceberg column-mapping shape):
  * zero-rewrite renames and lazy drops carried as versioned manifest
  * metadata — physical parquet names never change, reads translate
  * physical→logical, writes translate logical→physical, and retired
  * storage names are refused for reuse.
  */
class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(): SnapshotLake =
    new SnapshotLake(spark, Files.createTempDirectory("graft_evo").toString)

  private def seed(lake: SnapshotLake): Long =
    lake.commit(
      Seq((1L, "a", 10.0, "p1"), (2L, "b", 20.0, "p1"), (3L, "c", 30.0, "p2"))
        .toDF("id", "name", "score", "part"),
      Seq("part"))

  private def dirExpr = regexp_replace(col("file"), "/[^/]+$", "")

  private def dirsOf(lake: SnapshotLake, v: Long): Set[String] =
    lake.files(Seq("part"), Some(v)).select(dirExpr)
      .collect().map(_.getString(0)).toSet

  test("rename is metadata-only: new name at latest, old name under time travel, zero rewrite") {
    val lake = fresh()
    val v1 = seed(lake)
    val v2 = lake.renameColumn("score", "quality")
    assert(lake.read(Seq("part")).columns.toSet ==
      Set("id", "name", "quality", "part"))
    assert(lake.read(Seq("part"), Some(v1)).columns.toSet ==
      Set("id", "name", "score", "part"))
    // values ride along untouched
    assert(lake.read(Seq("part")).filter(col("id") === 1L)
      .head().getAs[Double]("quality") == 10.0)
    // ZERO data rewrite: the new version references the exact same dirs
    assert(dirsOf(lake, v1) == dirsOf(lake, v2))
    assert(lake.columnMapping()._1 == Map("quality" -> "score"))
  }

  test("writes after a rename use the logical name; files keep the physical one") {
    val lake = fresh()
    seed(lake)
    lake.renameColumn("score", "quality")
    lake.commit(
      Seq((4L, "d", 40.0, "p3")).toDF("id", "name", "quality", "part"),
      Seq("part"))
    val out = lake.read(Seq("part"))
    assert(out.count() == 4L)
    assert(out.filter(col("id") === 4L).head().getAs[Double]("quality") == 40.0)
    // the NEW file stores the PHYSICAL name, so mergeSchema sees ONE column
    val newDir = lake.files(Seq("part")).filter(col("part") === "p3")
      .select(dirExpr).head().getString(0)
    assert(spark.read.parquet(newDir).columns.contains("score"))
    assert(!spark.read.parquet(newDir).columns.contains("quality"))
  }

  test("upsert after a rename merges by logical name against pre-rename files") {
    val lake = fresh()
    seed(lake)
    lake.renameColumn("score", "quality")
    lake.upsert(
      Seq((1L, "a2", 11.0, "p1", 2L)).toDF("id", "name", "quality", "part", "ver")
        .withColumn("ver", col("ver")),
      pk = Seq("id", "part"), versionCol = "ver",
      partitionCols = Seq("part"))
    val got = lake.read(Seq("part")).filter(col("id") === 1L).head()
    assert(got.getAs[String]("name") == "a2")
    assert(got.getAs[Double]("quality") == 11.0)
    assert(lake.read(Seq("part")).count() == 3L)
  }

  test("drop hides the column at latest, keeps it under time travel, refuses reuse") {
    val lake = fresh()
    val v1 = seed(lake)
    lake.dropColumn("name")
    assert(lake.read(Seq("part")).columns.toSet == Set("id", "score", "part"))
    assert(lake.read(Seq("part"), Some(v1)).columns.toSet ==
      Set("id", "name", "score", "part"))
    // a batch reintroducing the dropped name is refused (storage reserved)
    val err = intercept[IllegalArgumentException] {
      lake.commit(
        Seq((9L, "zz", 90.0, "p9")).toDF("id", "name", "score", "part"),
        Seq("part"))
    }
    assert(err.getMessage.contains("retired"))
  }

  test("renamed-away originals are retired: rename onto one refused, rename-back frees it") {
    val lake = fresh()
    seed(lake)
    lake.renameColumn("score", "quality")
    // 'score' storage is reserved
    val err = intercept[IllegalArgumentException] {
      lake.renameColumn("name", "score")
    }
    assert(err.getMessage.contains("retired"))
    val errCommit = intercept[IllegalArgumentException] {
      lake.commit(Seq((9L, 99.0, "p9")).toDF("id", "score", "part"), Seq("part"))
    }
    assert(errCommit.getMessage.contains("retired"))
    // rename back removes the mapping and frees the name
    lake.renameColumn("quality", "score")
    assert(lake.columnMapping()._1.isEmpty)
    lake.renameColumn("name", "label") // unrelated rename still fine
    assert(lake.read(Seq("part")).columns.toSet == Set("id", "label", "score", "part"))
  }

  test("rename validation: unknown column, existing target, chained renames collapse") {
    val lake = fresh()
    seed(lake)
    intercept[IllegalArgumentException](lake.renameColumn("nope", "x"))
    intercept[IllegalArgumentException](lake.renameColumn("score", "name"))
    lake.renameColumn("score", "quality")
    lake.renameColumn("quality", "grade")
    // chain collapses to ONE physical→logical entry
    assert(lake.columnMapping()._1 == Map("grade" -> "score"))
    assert(lake.read(Seq("part")).columns.contains("grade"))
  }

  test("changes() across a rename boundary is empty; after it, aligns by logical name") {
    val lake = fresh()
    val v1 = seed(lake)
    val v2 = lake.renameColumn("score", "quality")
    // metadata-only commit: no partition changed, no change events
    assert(lake.changes(v1, v2, Seq("id", "part"), Seq("part")).count() == 0L)
    // an update after the rename surfaces under the LOGICAL schema
    val v3 = lake.upsert(
      Seq((1L, "a", 99.0, "p1", 2L)).toDF("id", "name", "quality", "part", "ver"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val evs = lake.changes(v2, v3, Seq("id", "part"), Seq("part"))
    assert(evs.columns.contains("quality"))
    val post = evs.filter(col("_change") === "update_post" && col("id") === 1L).head()
    assert(post.getAs[Double]("quality") == 99.0)
  }

  test("statsFor and readPruned answer in logical names after a rename") {
    val lake = fresh()
    seed(lake)
    lake.renameColumn("score", "quality")
    val pruned = lake.readPruned(Seq("quality"), "quality", 15.0, 25.0)
    assert(pruned.columns.contains("quality"))
    assert(pruned.select("quality").collect().map(_.getDouble(0)).toSet == Set(20.0))
  }

  test("cloneTo and restore carry the mapping; restore reverts the schema with the data") {
    val lake = fresh()
    val v1 = seed(lake)
    lake.renameColumn("score", "quality")
    // clone sees the renamed schema
    val dstRoot = Files.createTempDirectory("graft_evo_dst").toString
    lake.cloneTo(dstRoot)
    val dst = new SnapshotLake(spark, dstRoot)
    assert(dst.read(Seq("part")).columns.contains("quality"))
    // restore to v1 brings the OLD schema back (and the name frees up)
    lake.restore(v1)
    assert(lake.read(Seq("part")).columns.contains("score"))
    assert(lake.columnMapping()._1.isEmpty)
  }

  test("deleteWhere predicate in logical names; rewrite sheds dropped columns physically") {
    val lake = fresh()
    seed(lake)
    lake.renameColumn("score", "quality")
    lake.dropColumn("name")
    lake.deleteWhere(col("quality") === 20.0, Seq("part"))
    val out = lake.read(Seq("part"))
    assert(out.count() == 2L)
    assert(out.columns.toSet == Set("id", "quality", "part"))
    // the rewritten partition's file no longer stores the dropped column
    val p1dir = lake.files(Seq("part")).filter(col("part") === "p1")
      .select(dirExpr).head().getString(0)
    assert(!spark.read.parquet(p1dir).columns.contains("name"))
    // and keeps the physical name for the renamed one
    assert(spark.read.parquet(p1dir).columns.contains("score"))
  }
}
