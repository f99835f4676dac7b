package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sinks.{Compact, Sinks}

/** Lake small-file compaction: content preserved exactly, file counts
  * bin-packed to the target, already-compact leaves left byte-identical.
  */
class CompactSpec extends SparkSpec {

  private def freshLake(): String = {
    val tmp = Files.createTempDirectory("graft_compact_spec").toString
    // month-grain partitioning so every leaf holds rows from all 5
    // repartition tasks → 5 small files per leaf (the post-append shape)
    Sinks.writeLake(
      Tables(spark, "/root/testdata/sf0.001", "orders")
        .withColumn("o_month", date_trunc("month", col("o_orderdate")))
        .repartition(5),
      "o_month", "src_a", tmp)
    tmp
  }

  test("compaction preserves rows exactly and packs leaves to one file") {
    val lake = freshLake()
    val before = spark.read.parquet(lake)
    val beforeRows = before.collect().toSet
    val statsBefore = Compact.leafStats(lake)
    // dense months collect one file per repartition task; sparse ones fewer
    val smallFileLeaves = statsBefore.filter(_.files > 2).map(_.dir).toSet
    assert(smallFileLeaves.nonEmpty, s"fixture produced no small-file leaves: $statsBefore")

    val report = Compact.compact(spark, lake, targetBytes = 512L * 1024 * 1024)
    assert(report.rewrittenDirs === smallFileLeaves, "exactly the small-file leaves rewritten")

    val statsAfter = Compact.leafStats(lake)
    assert(statsAfter.map(_.dir) === statsBefore.map(_.dir), "no leaf lost")
    statsAfter.filter(s => smallFileLeaves(s.dir)).foreach(s =>
      assert(s.files === 1, s"expected 1 packed file in $s"))

    val after = spark.read.parquet(lake)
    assert(after.schema === before.schema)
    assert(after.collect().toSet === beforeRows)
  }

  test("targetBytes splits a leaf into multiple packed files") {
    val lake = freshLake()
    val biggest = Compact.leafStats(lake).maxBy(_.bytes)
    // a target of half the leaf's bytes must yield ~2 output files
    Compact.compact(spark, lake, targetBytes = math.max(1, biggest.bytes / 2))
    val after = Compact.leafStats(lake).find(_.dir == biggest.dir).get
    assert(after.files >= 2 && after.files < 5, s"expected 2-4 packed files, got $after")
  }

  test("already-compact leaves are skipped byte-identically") {
    val lake = freshLake()
    Compact.compact(spark, lake, targetBytes = 512L * 1024 * 1024)
    val files = Compact.leaves(lake).flatMap { l =>
      val s = Files.list(l)
      try s.iterator().asScala.toSeq.map(p => p -> Files.getLastModifiedTime(p))
      finally s.close()
    }
    val report = Compact.compact(spark, lake, targetBytes = 512L * 1024 * 1024)
    assert(report.rewritten.isEmpty, "second pass must be a no-op")
    files.foreach { case (p, mtime) =>
      assert(Files.getLastModifiedTime(p) === mtime, s"$p was touched")
    }
  }

  test("sortBy restores within-file ordering that plain coalesce would destroy") {
    val lake = freshLake()
    Compact.compact(spark, lake, targetBytes = 512L * 1024 * 1024,
      sortBy = Seq("o_orderkey"))
    // every packed file must be internally sorted on the cluster key
    Compact.leaves(lake).foreach { leaf =>
      val s = Files.list(leaf)
      val files = try s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toSeq
        finally s.close()
      files.foreach { f =>
        val keys = spark.read.parquet(f.toString)
          .select("o_orderkey").collect().map(_.getLong(0))
        assert(keys.sameElements(keys.sorted), s"unsorted rows in $f")
      }
    }
    // and the data still round-trips exactly
    val got = spark.read.parquet(lake).count()
    assert(got === Tables(spark, "/root/testdata/sf0.001", "orders").count())
  }

  test("recover restores a leaf stranded mid-swap and drops stale staging copies") {
    val lake = freshLake()
    val before = spark.read.parquet(lake).count()
    val leaf = Compact.leaves(lake).head
    val rel = java.nio.file.Paths.get(lake).relativize(leaf)

    // simulate a crash between the two swap moves: leaf sits in trash,
    // plus an abandoned staging copy of another leaf
    val work = java.nio.file.Paths.get(lake, "_compact")
    val trash = work.resolve("old-deadbeef")
    Files.createDirectories(trash.resolve(rel).getParent)
    Files.move(leaf, trash.resolve(rel))
    val staging = work.resolve("staging-cafe")
    Files.createDirectories(staging)
    Files.write(staging.resolve("part-junk.parquet"), Array[Byte](1, 2, 3))

    // the lake is still readable (staging/trash invisible to discovery)…
    assert(spark.read.parquet(lake).count() < before)
    // …and the next compact() run reconciles before doing anything else
    Compact.compact(spark, lake, targetBytes = 512L * 1024 * 1024)
    assert(Files.exists(leaf), "stranded leaf must be restored")
    assert(!Files.exists(work.resolve("old-deadbeef")) && !Files.exists(staging))
    assert(spark.read.parquet(lake).count() === before)
  }

  test("minFiles keeps leaves at or below the threshold untouched") {
    val lake = freshLake()
    val report = Compact.compact(spark, lake, targetBytes = 512L * 1024 * 1024, minFiles = 5)
    assert(report.rewritten.isEmpty && report.skipped.nonEmpty)
  }
}
