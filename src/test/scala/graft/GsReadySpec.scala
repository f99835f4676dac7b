package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.apps.GsReady

/** The composed GRIDSMART ready stage: as-of site snapshots, drift
  * application, adjusted-day regrouping (the day_covered replacement), and
  * cascade-resolved devices — end to end on a two-day fixture.
  */
class GsReadySpec extends SparkSpec {

  import spark.implicits._

  test("full ready chain: snapshots, drift, day regrouping, device ids") {
    def countRow(base: String, day: String, hhmmss: Double) =
      (base, Timestamp.valueOf(s"$day 00:00:00"), 8, hhmmss, -360, "S", 12.0, 35.0, 2.5, "z1")
    val counts = Seq(
      countRow("siteA", "2020-01-15", 80000.5), // ordinary mid-day row
      countRow("siteA", "2020-01-15", 235930.0), // pushed into Jan 16 by offset+drift
      countRow("siteA", "2020-01-16", 90000.0), // next nominal day
      countRow("siteB", "2020-01-15", 100000.0)) // site with an older snapshot only
      .toDF("base", "collection_date", "count_version", "timestamp", "utc_offset",
        "turn", "vehicle_length", "speed", "seconds_in_zone", "zone")

    val siteSnaps = Seq(
      // siteA: two snapshots; Jan 15 file must pick the Jan 10 one, Jan 16
      // file the Jan 16 one (as-of backward)
      ("siteA", Timestamp.valueOf("2020-01-10 00:00:00"), "Lamar Blvd", "Justin Ln",
        "10.0.0.1", 30.30, -97.70, "2020-01-10 07:30:00", "2020-01-10 08:00:00"),
      ("siteA", Timestamp.valueOf("2020-01-16 00:00:00"), "Lamar Blvd", "Justin Ln",
        "10.0.0.1", 30.30, -97.70, "2020-01-16 08:00:00", "2020-01-16 08:00:00"),
      ("siteB", Timestamp.valueOf("2020-01-01 00:00:00"), "Burnet Rd", "Braker Ln",
        "10.0.0.2", 30.31, -97.71, "2020-01-01 08:00:00", "2020-01-01 08:00:00"))
      .toDF("base", "snap_date", "street1", "street2", "net_addr", "lat", "lon",
        "device_time", "host_time_utc")

    val devices = Seq(
      ("d_A", "Lamar Blvd", "Justin Ln", "10.1.1.1", 30.30, -97.60),
      ("d_B", "Burnet Rd", "Braker Ln", "10.1.1.2", 30.31, -97.61))
      .toDF("device_id", "primary_st", "cross_st", "device_ip", "lat", "lon")

    val out = GsReady.ready(counts, siteSnaps, devices)

    // drift: siteA Jan-10 snapshot implies +1800 s; Jan-16 snapshot 0 s
    val a15 = out.filter($"base" === "siteA" && $"collection_date" === "2020-01-15 00:00:00")
      .select($"timestamp_adj".cast("string"), $"event_day".cast("string"))
      .as[(String, String)].collect().toSet
    assert(a15.contains(("2020-01-15 14:30:00.5", "2020-01-15")))
    // the 23:59:30 row crosses midnight after offset+drift → regrouped to Jan 16
    assert(a15.exists { case (t, d) => t.startsWith("2020-01-16") && d == "2020-01-16" })

    // Jan-16 nominal file picked the newer snapshot (drift 0): 09:00 local
    // → 15:00 UTC exactly
    val a16 = out.filter($"base" === "siteA" && $"collection_date" === "2020-01-16 00:00:00")
      .select($"timestamp_adj".cast("string")).as[String].head()
    assert(a16 == "2020-01-16 15:00:00")

    // devices resolved through the cascade for both sites
    val dev = out.select("base", "device_id", "resolution_stage")
      .distinct().as[(String, String, String)].collect().toMap2
    assert(dev("siteA") == (("d_A", "fuzzy")))
    assert(dev("siteB") == (("d_B", "fuzzy")))
  }

  implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map { case (a, b, c) => a -> ((b, c)) }.toMap
  }

  test("q_gs_ready executed plan: dims broadcast, nested-loop only for the dim×dim fuzzy cross, no range exchange") {
    val df = QueriesGsReady.queries("q_gs_ready")(spark, "/root/testdata/sf0.001")
    df.collect() // drive AQE to its final plan before inspecting
    val plan = df.queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq

    // the ONLY nested-loop join allowed is the fuzzy similarity argmax —
    // a dimension×dimension candidate cross (SURVEY §2.4's prescription);
    // a nested-loop or cartesian against the fact side is a scale killer
    // (fuzzy: seq_ratio; geo: haversine — RADIANS/ATAN2)
    val nested = lines.filter(_.contains("BroadcastNestedLoopJoin"))
    assert(nested.nonEmpty, "fuzzy stage should plan as a dim×dim nested-loop cross")
    assert(nested.forall(l => l.contains("seq_ratio") || l.contains("RADIANS")),
      s"nested-loop join outside the fuzzy/geo dim×dim stages:\n${nested.mkString("\n")}")
    assert(!plan.contains("CartesianProduct"), "no cartesian product anywhere")

    // every fact-side dim join must broadcast; a range exchange mid-chain
    // would mean some stage sorted the whole fact globally
    assert(lines.exists(_.contains("BroadcastHashJoin")),
      "cascade dim joins must be broadcast hash joins")
    assert(!plan.contains("rangepartitioning"),
      "no global range exchange may appear in the ready chain")
  }
}
