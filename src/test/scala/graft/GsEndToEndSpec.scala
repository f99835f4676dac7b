package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.sql.Timestamp
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.apps.{GsReady, Pipelines}
import graft.model.Schemas
import graft.sources.Sources

/** The GRIDSMART chain end to end from the wire format up (reference
  * `gs_insert_lake.py` → `gs_json_standard.py` → `gs_ready.py` →
  * `gs_ready_agg.py` → `gs_agg_extract_soc.py`): per-device day ZIPs of
  * per-zone v8 CSVs → executor-side unzip → typed parse → composed ready
  * stage (as-of snapshot, drift, day regroup, device cascade) → day window
  * → 15-min aggregation → publish recodes + idempotent record ids.
  */
class GsEndToEndSpec extends SparkSpec {

  import spark.implicits._

  private def v8Row(hhmmss: Double, turn: String, len: Double, speed: Double): String =
    s"8,v1,$hhmmss,-360,$turn,$len,$speed,G,2.5,1,1.0,5.0,30.0,30.0"

  private def writeZip(dir: String, name: String, entries: Map[String, Seq[String]]): Unit = {
    val out = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(out)
    entries.foreach { case (entry, lines) =>
      zos.putNextEntry(new ZipEntry(entry))
      zos.write(lines.mkString("\n").getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    val f = new FileOutputStream(s"$dir/$name")
    try f.write(out.toByteArray) finally f.close()
  }

  test("gs chain: zip -> parse -> ready -> agg15 -> publish") {
    val dir = Files.createTempDirectory("graft_gs_e2e_").toString
    // one site, one day, two zones; one row late enough to cross midnight
    // after the -360 utc_offset (+6 h)
    writeZip(dir, "siteA_2020-01-15.zip", Map(
      "aaaa-bbbb.csv" -> Seq(
        v8Row(80000.5, "S", 12.0, 35.0),
        v8Row(80001.0, "L", 25.0, 20.0),
        v8Row(235930.0, "S", 10.0, 40.0)),
      "cccc-dddd.csv" -> Seq(
        v8Row(80002.0, "S", 11.0, 31.0))))

    // wire → relational: executor unzip, per-entry zone from the filename,
    // site/day from the archive name, typed v8 parse per line
    val entries = Sources.zipScan(spark, s"$dir/*.zip", recurse = false)
    val counts = entries
      .select(
        regexp_extract(col("archive"), "([A-Za-z0-9]+)_(\\d{4}-\\d{2}-\\d{2})\\.zip", 1)
          .as("base"),
        regexp_extract(col("archive"), "([A-Za-z0-9]+)_(\\d{4}-\\d{2}-\\d{2})\\.zip", 2)
          .cast("timestamp").as("collection_date"),
        lower(regexp_replace(regexp_extract(col("entry"), "(.+)\\.csv", 1), "-", ""))
          .as("zone"),
        explode(split(col("text"), "\n")).as("line"))
      .withColumn("r", from_csv(col("line"), Schemas.gsCountsV8, Map.empty[String, String]))
      .select(col("base"), col("collection_date"), col("zone"), col("r.*"))
    assert(counts.count() == 4)

    val siteSnaps = Seq(
      ("siteA", Timestamp.valueOf("2020-01-10 00:00:00"), "Lamar Blvd", "Justin Ln",
        "10.0.0.1", 30.30, -97.70, "2020-01-10 07:30:00", "2020-01-10 08:00:00"))
      .toDF("base", "snap_date", "street1", "street2", "net_addr", "lat", "lon",
        "device_time", "host_time_utc")
    val devices = Seq(("d_A", "Lamar Blvd", "Justin Ln", "10.1.1.1", 30.30, -97.60))
      .toDF("device_id", "primary_st", "cross_st", "device_ip", "lat", "lon")

    val ready = GsReady.ready(counts, siteSnaps, devices)
    // drift +1800 s: the 23:59:30 local row regroups onto Jan 16
    assert(ready.filter($"event_day" === "2020-01-16").count() == 1)
    assert(ready.select("device_id").distinct().as[String].collect().toSeq == Seq("d_A"))

    // aggregate exactly the Jan 15 window (reference gs_ready_agg)
    val movements = Seq(
      ("aaaabbbb", "Northbound", "S"), ("ccccdddd", "Southbound", "L"))
      .toDF("zone", "zone_approach", "turn_type")
    val agg = Pipelines.Gs.agg15(
      Pipelines.Gs.dayWindow(ready, lit("2020-01-15")), movements)
    val rows = agg.orderBy("zone_approach", "turn").collect()
    // NB zone: turn L (heavy 25ft) + turn S (light 12ft); SB zone: turn S
    assert(rows.length == 3)
    val nbS = rows(1)
    assert(nbS.getAs[String]("zone_approach") == "Northbound")
    assert(nbS.getAs[Long]("volume") == 1L && nbS.getAs[Double]("speed_avg") == 35.0)

    // publish: recodes + deterministic idempotent record ids
    val pub = Pipelines.Gs.publishAgg(agg, lit("LAMAR / JUSTIN"))
    assert(pub.count() == 3)
    assert(pub.select("movement").as[String].collect().toSet == Set("straight", "left turn"))
    val ids = pub.select("record_id").as[String].collect().toSeq
    assert(ids.distinct.size == 3 && ids.forall(_.length == 32))
    assert(Pipelines.Gs.publishAgg(agg, lit("LAMAR / JUSTIN"))
      .select("record_id").as[String].collect().toSeq.sorted == ids.sorted)
  }
}
