package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.apps.{EtlRun, Pipelines}
import graft.catalog.LakeCatalog
import graft.model.Schemas
import graft.sinks.Sinks
import graft.sources.Sources

/** The full Bluetooth pipeline exactly as a reference user would run it
  * nightly (SURVEY §3.1): date-named raw CSVs on disk → date-directory scan
  * → catalog-gated incremental diff → standardize (tz parse) → ready
  * (device joins) → publish (pseudonymization + record ids) → partitioned
  * lake write + catalog upsert + ordered CSV publish. Then the reference's
  * own correctness ritual (`docs/appendix_testing.md:76-87`): run it again
  * — the second run must process nothing and change nothing; a new day's
  * file arrives — only it processes.
  */
class BtEndToEndSpec extends SparkSpec {

  import spark.implicits._

  test("nightly bt run: end to end, idempotent, incremental") {
    val rawDir = Files.createTempDirectory("graft_bt_raw_").toString
    val lakeDir = Files.createTempDirectory("graft_bt_lake_").toString
    val pubDir = Files.createTempDirectory("graft_bt_pub_").toString
    val catDir = Files.createTempDirectory("graft_bt_cat_").toString
    val cat = new LakeCatalog(spark, catDir)

    def writeRaw(date: String, rows: Seq[String]): Unit =
      Files.write(
        Paths.get(rawDir, s"Austin_bt_$date.txt"),
        String.join("\n", rows: _*).getBytes("UTF-8"))

    // two days of unmatched sightings (reference headerless 5-col CSV)
    writeRaw("01-15-2020", Seq(
      "01/15/2020 08:00:01 AM,10.0.0.1,01/15/2020 08:00:00 AM,r1,AbC=",
      "01/15/2020 08:00:05 AM,10.0.0.1,01/15/2020 08:00:04 AM,r1,DeF=",
      "01/15/2020 08:01:00 AM,10.0.0.2,01/15/2020 08:00:59 AM,r2,AbC="))
    writeRaw("01-16-2020", Seq(
      "01/16/2020 09:00:00 AM,10.0.0.1,01/16/2020 08:59:59 AM,r1,DeF="))

    val devices = Pipelines.Bt.deviceDim(
      Seq((1, "r1"), (2, "r2")).toDF("atd_device_id", "device_name"))

    var runsProcessed = Vector.empty[Long]
    def nightly(): Long = {
      val items = Sources
        .dateDirScan(spark, rawDir, "Austin_bt_", "MM-dd-yyyy", ".txt",
          base = "austin", ext = "unmatched.txt")
        .select(
          col("id_base"), col("id_ext"),
          col("collection_date").cast("timestamp").as("collection_date"), col("path"))
      EtlRun.run(spark, items, cat, "ready", "bt",
        today = lit("2020-06-01").cast("date")) { todo =>
        val paths = todo.select("path").as[String].collect()
        val raw = Sources.headerlessCsv(spark, Schemas.btUnmatchedRaw, paths: _*)
        val ready = Pipelines.Bt.readyUnmatched(
          Pipelines.Bt.standardizeUnmatched(raw), devices)
        val pub = Pipelines.Bt.publishUnmatched(ready)
        runsProcessed :+= pub.count()
        Sinks.writeLake(ready, "host_timestamp", "bt", lakeDir, mode = "append")
        Sinks.writeCsv(
          Sinks.ordered(pub, col("host_timestamp"), col("reader_id")),
          s"$pubDir/${java.util.UUID.randomUUID()}")
      }
    }

    // night 1: both days process
    assert(nightly() == 2)
    assert(runsProcessed.last == 4)
    // the lake holds both days, partitioned by date parts
    val lake = spark.read.parquet(lakeDir)
    assert(lake.count() == 4)
    assert(Files.exists(Paths.get(lakeDir, "year=2020", "month=1", "day=15", "data_source=bt")))
    // pseudonymization: day-1 counter assigned in first-seen order; resets day 2
    val pub = Pipelines.Bt.publishUnmatched(
      Pipelines.Bt.readyUnmatched(
        Pipelines.Bt.standardizeUnmatched(
          Sources.headerlessCsv(spark, Schemas.btUnmatchedRaw,
            s"$rawDir/Austin_bt_01-15-2020.txt", s"$rawDir/Austin_bt_01-16-2020.txt")),
        devices))
    val counters = pub
      .select(to_date(col("host_timestamp")).cast("string"), col("device_number"))
      .as[(String, Int)].collect().toSet
    assert(counters == Set(
      ("2020-01-15", 1), ("2020-01-15", 2), ("2020-01-16", 1)))

    // night 2: nothing new — the catalog gate makes it a no-op
    assert(nightly() == 0)
    assert(spark.read.parquet(lakeDir).count() == 4)

    // a new day's file lands: only it processes, lake appends only its rows
    writeRaw("01-17-2020", Seq(
      "01/17/2020 07:00:00 AM,10.0.0.2,01/17/2020 06:59:59 AM,r2,AbC="))
    assert(nightly() == 1)
    assert(runsProcessed.last == 1)
    assert(spark.read.parquet(lakeDir).count() == 5)
    // the catalog now tracks all three days for (ready, bt)
    assert(cat.query("ready", dataSource = Some("bt")).count() == 3)
  }
}
