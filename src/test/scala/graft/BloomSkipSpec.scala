package graft

import org.apache.spark.sql.functions._

import graft.sources.DataSkipping

/** Per-file Bloom equality skipping: files actually skip, pruning never
  * loses a row, absent values and all-NULL files behave.
  */
class BloomSkipSpec extends SparkSpec {

  import spark.implicits._

  private lazy val lake: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bloomspec_").toString + "/lake"
    // 8 files clustered on the key: each key lands in exactly one file
    (0L until 4000L).map(i => (i, s"key${i % 200}", i * 1.5))
      .toDF("id", "k", "v")
      .repartition(8, col("k"))
      .write.mode("overwrite").parquet(tmp)
    tmp
  }

  private lazy val stats = DataSkipping.bloomStats(spark, Seq(lake), "k").cache()

  test("pruning actually skips files for a point probe") {
    val total = spark.read.parquet(lake)
      .select(input_file_name()).distinct().count()
    val kept = DataSkipping.bloomPruneFiles(stats, "key7")
    assert(total == 8L, s"fixture must spread over 8 files, got $total")
    assert(kept.nonEmpty && kept.size < total,
      s"bloom must keep the key's file(s) and skip most others: ${kept.size}/$total")
  }

  test("pruned read is row-identical to the full filter (no false negatives)") {
    for (probe <- Seq("key0", "key7", "key199")) {
      val pruned = DataSkipping.readBloomPruned(spark, Seq(lake), stats, "k", probe)
        .select("id", "k", "v").as[(Long, String, Double)].collect().toSet
      val full = spark.read.parquet(lake).filter(col("k") === probe)
        .select("id", "k", "v").as[(Long, String, Double)].collect().toSet
      assert(pruned == full, s"probe $probe lost/gained rows")
      assert(pruned.size == 20, s"each key has 20 rows, got ${pruned.size}")
    }
  }

  test("absent value returns empty (usually zero files opened)") {
    val out = DataSkipping.readBloomPruned(spark, Seq(lake), stats, "k", "no-such-key")
    assert(out.count() == 0L)
  }

  test("a file whose column is all NULL is never kept") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bloomnull_").toString + "/lake"
    Seq((1L, Option("a")), (2L, Option("a"))).toDF("id", "k")
      .coalesce(1).write.parquet(tmp)
    Seq((3L, Option.empty[String]), (4L, Option.empty[String])).toDF("id", "k")
      .coalesce(1).write.mode("append").parquet(tmp)
    val st = DataSkipping.bloomStats(spark, Seq(tmp), "k")
    val kept = DataSkipping.bloomPruneFiles(st, "a")
    assert(kept.size == 1, s"only the value-bearing file may survive: $kept")
    val rows = DataSkipping.readBloomPruned(spark, Seq(tmp), st, "k", "a")
      .select("id").as[Long].collect().toSet
    assert(rows == Set(1L, 2L))
  }

  test("stats persist and reload without changing decisions") {
    val path = java.nio.file.Files.createTempDirectory("graft_bloomsave_").toString + "/st"
    DataSkipping.save(stats, path)
    val reloaded = DataSkipping.load(spark, path)
    assert(DataSkipping.bloomPruneFiles(reloaded, "key7").toSet ==
      DataSkipping.bloomPruneFiles(stats, "key7").toSet)
  }
}
