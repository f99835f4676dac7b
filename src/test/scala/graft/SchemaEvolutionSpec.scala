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

  // ---- type widening ----------------------------------------------------

  private def seedNarrow(lake: SnapshotLake): Long =
    lake.commit(
      Seq((1, 100, 1.5f, "p1"), (2, 200, 2.5f, "p1"), (3, 300, 3.5f, "p2"))
        .toDF("id", "cnt", "ratio", "part"),
      Seq("part"))

  test("widen int->long is metadata-only: wide at latest, narrow under time travel, zero rewrite") {
    import org.apache.spark.sql.types._
    val lake = fresh()
    val v1 = seedNarrow(lake)
    val v2 = lake.widenColumn("cnt", "bigint")
    val latest = lake.read(Seq("part"))
    assert(latest.schema("cnt").dataType == LongType)
    assert(latest.filter(col("id") === 2).head().getAs[Long]("cnt") == 200L)
    assert(latest.count() == 3L)
    // time travel before the widen still reads the narrow type
    val old = lake.read(Seq("part"), Some(v1))
    assert(old.schema("cnt").dataType == IntegerType)
    assert(old.filter(col("id") === 2).head().getAs[Int]("cnt") == 200)
    // ZERO data rewrite
    assert(dirsOf(lake, v1) == dirsOf(lake, v2))
    assert(lake.typeMapping() == Map("cnt" -> LongType))
    assert(lake.typeMapping(Some(v1)).isEmpty)
  }

  test("writes after a widen store the wide type; beyond-int values land; narrow batches up-cast") {
    import org.apache.spark.sql.types._
    val lake = fresh()
    seedNarrow(lake)
    lake.widenColumn("cnt", "bigint")
    // a value only a LONG can hold
    val big = Int.MaxValue.toLong + 7L
    lake.commit(
      Seq((4, big, 4.5f, "p3")).toDF("id", "cnt", "ratio", "part"),
      Seq("part"))
    val out = lake.read(Seq("part"))
    assert(out.count() == 4L)
    assert(out.filter(col("id") === 4).head().getAs[Long]("cnt") == big)
    assert(out.filter(col("id") === 1).head().getAs[Long]("cnt") == 100L)
    // the new file physically stores the WIDE type
    val newDir = lake.files(Seq("part")).filter(col("part") === "p3")
      .select(dirExpr).head().getString(0)
    assert(spark.read.parquet(newDir).schema("cnt").dataType == LongType)
    // a producer still emitting the narrow type up-casts losslessly
    lake.commit(
      Seq((5, 500, 5.5f, "p4")).toDF("id", "cnt", "ratio", "part"),
      Seq("part"))
    assert(lake.read(Seq("part")).filter(col("id") === 5)
      .head().getAs[Long]("cnt") == 500L)
  }

  test("widen float->double; chained widening re-registers the wider target") {
    import org.apache.spark.sql.types._
    val lake = fresh()
    val v1 = lake.commit(
      Seq((1, 1.toShort, 1.5f, "p1")).toDF("id", "s", "ratio", "part"), Seq("part"))
    lake.widenColumn("ratio", "double")
    assert(lake.read(Seq("part")).schema("ratio").dataType == DoubleType)
    assert(lake.read(Seq("part")).head().getAs[Double]("ratio") == 1.5)
    // chain: short -> int, then int -> long (the map keeps ONE entry, the widest)
    lake.widenColumn("s", "int")
    assert(lake.read(Seq("part")).schema("s").dataType == IntegerType)
    lake.widenColumn("s", "bigint")
    assert(lake.read(Seq("part")).schema("s").dataType == LongType)
    assert(lake.typeMapping() == Map("ratio" -> DoubleType, "s" -> LongType))
    assert(lake.read(Seq("part"), Some(v1)).schema("s").dataType == ShortType)
  }

  test("widen refusals: narrowing, cross-family, unknown, no-op, and bad batch types") {
    val lake = fresh()
    seedNarrow(lake)
    // narrowing
    val e1 = intercept[IllegalArgumentException](lake.widenColumn("cnt", "smallint"))
    assert(e1.getMessage.contains("lossless"))
    // cross-family (int -> double would silently lose precision past 2^53... and
    // the other way corrupts outright)
    val e2 = intercept[IllegalArgumentException](lake.widenColumn("cnt", "double"))
    assert(e2.getMessage.contains("lossless"))
    val e3 = intercept[IllegalArgumentException](lake.widenColumn("ratio", "bigint"))
    assert(e3.getMessage.contains("lossless"))
    // string is not a widening target
    val e4 = intercept[IllegalArgumentException](lake.widenColumn("cnt", "string"))
    assert(e4.getMessage.contains("lossless"))
    // unknown column
    val e5 = intercept[IllegalArgumentException](lake.widenColumn("nope", "bigint"))
    assert(e5.getMessage.contains("unknown column"))
    // no-op
    val e6 = intercept[IllegalArgumentException](lake.widenColumn("cnt", "int"))
    assert(e6.getMessage.contains("already"))
    // post-widen, a batch with an unrelated type for the widened column is refused
    lake.widenColumn("cnt", "bigint")
    val e7 = intercept[Exception] {
      lake.commit(Seq((9, "oops", 9.5f, "p9")).toDF("id", "cnt", "ratio", "part"),
        Seq("part"))
    }
    assert(e7.getMessage.contains("widened"))
  }

  test("widen composes with rename (either order), keyed by logical name") {
    import org.apache.spark.sql.types._
    val lake = fresh()
    seedNarrow(lake)
    lake.renameColumn("cnt", "hits")
    lake.widenColumn("hits", "bigint")
    val out = lake.read(Seq("part"))
    assert(out.schema("hits").dataType == LongType)
    assert(out.filter(col("id") === 3).head().getAs[Long]("hits") == 300L)
    assert(lake.typeMapping() == Map("hits" -> LongType))
    // rename AFTER the widen keeps the widening (typemap rides the physical name)
    lake.renameColumn("hits", "visits")
    assert(lake.read(Seq("part")).schema("visits").dataType == LongType)
    assert(lake.typeMapping() == Map("visits" -> LongType))
  }

  test("changes() across a widen boundary: metadata-only commit emits no rows; later edits align wide") {
    import org.apache.spark.sql.types._
    val lake = fresh()
    val v1 = seedNarrow(lake)
    val v2 = lake.widenColumn("cnt", "bigint")
    // pure widen: no partition changed, no row events
    assert(lake.changes(v1, v2, Seq("id", "part"), Seq("part")).count() == 0L)
    val v3 = lake.upsert(
      Seq((2, Int.MaxValue.toLong + 1L, 2.5f, "p1", 2L))
        .toDF("id", "cnt", "ratio", "part", "ver"),
      pk = Seq("id", "part"), versionCol = "ver", partitionCols = Seq("part"))
    val delta = lake.changes(v1, v3, Seq("id", "part"), Seq("part"))
    assert(delta.schema("cnt").dataType == LongType)
    val posts = delta.filter(col("_change") === "update_post").collect()
    assert(posts.length == 1 && posts.head.getAs[Long]("cnt") == Int.MaxValue.toLong + 1L)
    // the untouched row in the same partition compares equal across the
    // int/long representations and stays suppressed
    assert(!delta.select("id").collect().map(_.getInt(0)).contains(1))
  }

  test("decimal widening: precision and scale may grow, never shrink") {
    import org.apache.spark.sql.types._
    val lake = fresh()
    lake.commit(
      spark.sql("""SELECT * FROM VALUES
        (1, CAST(12.34 AS DECIMAL(10,2)), 'p1'),
        (2, CAST(-5.67 AS DECIMAL(10,2)), 'p1')
        AS t(id, amt, part)"""),
      Seq("part"))
    lake.widenColumn("amt", "decimal(16,4)")
    val out = lake.read(Seq("part"))
    assert(out.schema("amt").dataType == DecimalType(16, 4))
    assert(out.filter(col("id") === 1).head().getAs[java.math.BigDecimal]("amt")
      .compareTo(new java.math.BigDecimal("12.34")) == 0)
    // a value only the widened type can hold
    lake.commit(
      spark.sql("""SELECT * FROM VALUES
        (3, CAST(123456789012.3456 AS DECIMAL(16,4)), 'p2') AS t(id, amt, part)"""),
      Seq("part"))
    assert(lake.read(Seq("part")).count() == 3L)
    // shrinking the scale (12 integer digits kept, scale 4 -> 2) loses
    // fraction digits; shrinking integer digits loses magnitude — refused
    val e1 = intercept[IllegalArgumentException](lake.widenColumn("amt", "decimal(18,2)"))
    assert(e1.getMessage.contains("lossless"))
    val e2 = intercept[IllegalArgumentException](lake.widenColumn("amt", "decimal(14,4)"))
    assert(e2.getMessage.contains("lossless"))
    // cross-family from decimal refused
    val e3 = intercept[IllegalArgumentException](lake.widenColumn("amt", "double"))
    assert(e3.getMessage.contains("lossless"))
  }

  test("dropColumn after widen + post-widen write: lake stays readable at latest") {
    import org.apache.spark.sql.types._
    // pre-widen (narrow) and post-widen (wide) files for `cnt` coexist on
    // disk forever; dropColumn strips the typemap entry, so the read must
    // EXCLUDE the dropped physical from the scan schema instead of asking
    // its disagreeing footers to agree (mergeSchema would throw
    // CANNOT_MERGE_INCOMPATIBLE_DATA_TYPE, the explicit-schema merge would
    // hit the conflicting-types require — either way the lake bricked)
    val lake = fresh()
    val v1 = seedNarrow(lake)
    lake.widenColumn("cnt", "bigint")
    lake.commit(Seq((4, Int.MaxValue.toLong + 7L, 4.5f, "p3"))
      .toDF("id", "cnt", "ratio", "part"), Seq("part"))
    val vDrop = lake.dropColumn("cnt")
    // no typemap residue for the dropped column...
    assert(lake.typeMapping().isEmpty)
    // ...and every read path still works at latest
    val out = lake.read(Seq("part"))
    assert(out.columns.toSet == Set("id", "ratio", "part"))
    assert(out.count() == 4L)
    // time travel BEFORE the drop still reads the widened column
    val preDrop = lake.read(Seq("part"), Some(vDrop - 1))
    assert(preDrop.schema("cnt").dataType == LongType)
    assert(preDrop.filter(col("id") === 4).head().getAs[Long]("cnt") ==
      Int.MaxValue.toLong + 7L)
    assert(lake.read(Seq("part"), Some(v1)).schema("cnt").dataType == IntegerType)
    // the other-typemap-entries variant: a SECOND widened column keeps its
    // entry, and the explicit-schema path must still skip the dropped one
    lake.widenColumn("ratio", "double")
    lake.commit(Seq((5, 5.5, "p4")).toDF("id", "ratio", "part"), Seq("part"))
    val out2 = lake.read(Seq("part"))
    assert(out2.schema("ratio").dataType == DoubleType)
    assert(out2.count() == 5L)
    assert(lake.typeMapping() == Map("ratio" -> DoubleType))
    // post-drop writes may still not reuse the retired physical name
    val e = intercept[IllegalArgumentException](
      lake.commit(Seq((6, 1L, 6.5, "p5")).toDF("id", "cnt", "ratio", "part"), Seq("part")))
    assert(e.getMessage.contains("retired"))
  }

  test("statsFor and readPruned work through a widen") {
    import org.apache.spark.sql.types._
    val lake = fresh()
    seedNarrow(lake)
    lake.widenColumn("cnt", "bigint")
    lake.commit(Seq((4, Int.MaxValue.toLong + 7L, 4.5f, "p3"))
      .toDF("id", "cnt", "ratio", "part"), Seq("part"))
    val pruned = lake.readPruned(Seq("cnt"), "cnt", 150.0, 250.0)
    assert(pruned.schema("cnt").dataType == LongType)
    assert(pruned.collect().map(_.getAs[Long]("cnt")).toSet == Set(200L))
  }
}
