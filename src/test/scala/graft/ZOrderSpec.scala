package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.ZOrder
import graft.sources.DataSkipping

/** Z-order write + file-stats skipping: bit-interleave correctness, pruning
  * effectiveness on BOTH clustered dimensions (vs a linear sort's one), and
  * exact result equivalence through the pruned scan.
  */
class ZOrderSpec extends SparkSpec {

  private lazy val events =
    Tables(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "value")

  test("zkey interleaves bits round-robin, first column most significant") {
    import spark.implicits._
    // a = 101b, b = 011b → a2 b2 a1 b1 a0 b0 = 1 0 0 1 1 1 = 39
    val got = Seq(1).toDF("x")
      .select(ZOrder.zkey(Seq(lit(5L), lit(3L)), bits = 3).as("z"))
      .head().getLong(0)
    assert(got === 39L)
    // single column degenerates to the identity on its low bits
    val single = Seq(1).toDF("x")
      .select(ZOrder.zkey(Seq(lit(13L)), bits = 4).as("z")).head().getLong(0)
    assert(single === 13L)
  }

  test("z-ordered lake prunes on both dimensions; linear sort only on its own") {
    val zdir = Files.createTempDirectory("graft_zorder").toString + "/lake"
    val ldir = Files.createTempDirectory("graft_linear").toString + "/lake"
    ZOrder.writeZOrdered(events, Seq("user_id", "value"), zdir, nFiles = 16)
    events.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.parquet(ldir)

    val zStats = DataSkipping.scanStats(spark, zdir, Seq("user_id", "value"))
    val lStats = DataSkipping.scanStats(spark, ldir, Seq("user_id", "value"))
    val zTotal = zStats.count()
    assert(zTotal === 16L)

    // mid-range predicates on each dimension (~1/5 of each span)
    val zByUser = DataSkipping.pruneFiles(zStats, "user_id", 40, 70).size
    val zByValue = DataSkipping.pruneFiles(zStats, "value", 100, 200).size
    val lByUser = DataSkipping.pruneFiles(lStats, "user_id", 40, 70).size
    val lByValue = DataSkipping.pruneFiles(lStats, "value", 100, 200).size

    assert(zByUser < 16, s"z-order must prune on user_id, kept $zByUser/16")
    assert(zByValue < 16, s"z-order must prune on value, kept $zByValue/16")
    assert(lByUser < 16, s"linear sort must prune on its own sort key, kept $lByUser/16")
    // the linear layout spreads value across (nearly) every file — a couple
    // may miss the range by chance on the 1k-row fixture
    assert(lByValue >= 14, s"linear files should span value, kept $lByValue/16")
    assert(zByValue * 2 <= lByValue,
      s"z-order should prune ≥2× better on the non-sort dim: z=$zByValue linear=$lByValue")
  }

  test("pruned scan returns exactly the full-scan filter result") {
    val dir = Files.createTempDirectory("graft_zorder_eq").toString + "/lake"
    ZOrder.writeZOrdered(events, Seq("user_id", "value"), dir, nFiles = 8)
    val stats = DataSkipping.scanStats(spark, dir, Seq("user_id", "value"))
    val pruned = DataSkipping.readPruned(spark, dir, stats, "value", 100, 200)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val full = spark.read.parquet(dir)
      .filter(col("value") >= 100 && col("value") <= 200)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val original = events
      .filter(col("value") >= 100 && col("value") <= 200)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(pruned === full)
    assert(pruned === original)
  }

  test("footer stats equal scan stats and drive the same pruned result") {
    val dir = Files.createTempDirectory("graft_footer").toString + "/lake"
    ZOrder.writeZOrdered(events, Seq("user_id", "value"), dir, nFiles = 8)

    // key by basename: scanStats carries file: URIs, footerStats plain
    // paths; part-file names are unique within the lake. Numeric types
    // widen to double on the scan side to match the footer schema.
    def byName(df: org.apache.spark.sql.DataFrame) = df
      .select(
        element_at(split(col("file"), "/"), -1).as("name"),
        col("cnt"),
        col("min_user_id").cast("double"), col("max_user_id").cast("double"),
        col("min_value").cast("double"), col("max_value").cast("double"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val scan = byName(DataSkipping.scanStats(spark, dir, Seq("user_id", "value")))
    val footer = byName(DataSkipping.footerStats(spark, dir, Seq("user_id", "value")))
    assert(footer.keySet === scan.keySet)
    footer.foreach { case (f, stats) => assert(scan(f) === stats, s"stats differ for $f") }

    val viaFooter = DataSkipping.readPruned(
        spark, dir, DataSkipping.footerStats(spark, dir, Seq("user_id", "value")),
        "value", 100, 200)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val full = spark.read.parquet(dir)
      .filter(col("value") >= 100 && col("value") <= 200)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(viaFooter === full)
  }

  test("string-typed stats never prune against numeric bounds (conservative)") {
    val dir = Files.createTempDirectory("graft_str_stats").toString + "/lake"
    Tables(spark, "/root/testdata/sf0.001", "documents")
      .repartition(4).write.parquet(dir)
    val stats = DataSkipping.scanStats(spark, dir, Seq("lang"))
    val total = stats.count()
    // a type mismatch must degrade to keep-everything, never drop files
    assert(DataSkipping.pruneFiles(stats, "lang", 0, 1).size === total)
  }

  test("empty input and all-NULL columns fail with a named error, not an NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("a", "b")
    val e1 = intercept[IllegalArgumentException] {
      graft.ops.ZOrder.withZKey(empty, Seq("a", "b"))
    }
    assert(e1.getMessage.contains("'a'"))
    val allNull = Seq((1L, None: Option[Double]), (2L, None)).toDF("a", "b")
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.ZOrder.withZKey(allNull, Seq("a", "b"))
    }
    assert(e2.getMessage.contains("'b'"))
  }

  test("fully-pruned range yields an empty frame with the lake schema") {
    val dir = Files.createTempDirectory("graft_zorder_empty").toString + "/lake"
    ZOrder.writeZOrdered(events, Seq("user_id", "value"), dir, nFiles = 4)
    val stats = DataSkipping.scanStats(spark, dir, Seq("value"))
    val out = DataSkipping.readPruned(spark, dir, stats, "value", 1e9, 2e9)
    assert(out.count() === 0L)
    assert(out.schema.fieldNames.toSet === Set("event_id", "user_id", "value"))
  }
}
