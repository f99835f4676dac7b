package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.apps.Pipelines
import graft.ops.TrafficAgg

/** SURVEY §7.5 risk 1: timezone semantics across DST boundaries. The
  * reference dodges a DST grouping bug by aggregating in UTC
  * (gs_ready_agg.py:71-73); this engine stores UTC instants from the parse
  * edge, so the dodge holds by construction. Golden expectations locked for
  * the US/Central fall-back (2020-11-01, 02:00 → 01:00) and spring-forward
  * (2020-03-08, 02:00 → 03:00) transitions.
  */
class DstBoundarySpec extends SparkSpec {

  import spark.implicits._

  test("fall-back: wall clock around the repeated hour maps to strictly increasing UTC") {
    val raw = Seq(
      ("2020-11-01 00:30:00"), // CDT (UTC-5) → 05:30 UTC
      ("2020-11-01 01:30:00"), // ambiguous (occurs twice); java.time resolves
      // overlaps to the EARLIER offset (CDT, UTC-5) → 06:30 — locked here as
      // the engine's documented semantic
      ("2020-11-01 02:30:00")) // CST (UTC-6) → 08:30 UTC
      .toDF("curDateTime")
      .withColumn("detID", lit(1)).withColumn("intID", lit(1L))
      .withColumn("intName", lit("X")).withColumn("detName", lit("NB_1"))
      .withColumn("volume", lit(1)).withColumn("occupancy", lit(1))
      .withColumn("speed", lit(30))
    val utc = Pipelines.Wt.standardize(raw)
      .select(col("timestamp").cast("string")).as[String].collect().sorted.toSeq
    assert(utc == Seq(
      "2020-11-01 05:30:00",
      "2020-11-01 06:30:00",
      "2020-11-01 08:30:00"))
    // 25-hour local day, but UTC instants stay strictly ordered — windowed
    // aggregation over them can never double-bucket the repeated hour
  }

  test("spring-forward: the nonexistent local hour shifts forward, UTC stays monotone") {
    val raw = Seq(
      ("2020-03-08 01:30:00"), // CST (UTC-6) → 07:30 UTC
      ("2020-03-08 02:30:00"), // nonexistent local time; Spark shifts → 08:30 UTC
      ("2020-03-08 03:30:00")) // CDT (UTC-5) → 08:30 UTC
      .toDF("curDateTime")
      .withColumn("detID", lit(1)).withColumn("intID", lit(1L))
      .withColumn("intName", lit("X")).withColumn("detName", lit("NB_1"))
      .withColumn("volume", lit(1)).withColumn("occupancy", lit(1))
      .withColumn("speed", lit(30))
    val utc = Pipelines.Wt.standardize(raw)
      .select(col("timestamp").cast("string")).as[String].collect().sorted.toSeq
    assert(utc == Seq(
      "2020-03-08 07:30:00",
      "2020-03-08 08:30:00",
      "2020-03-08 08:30:00"))
  }

  test("15-min aggregation buckets by UTC instant across the fall-back day") {
    // one event in each local "01:15" — the repeated local quarter-hour must
    // land in two DIFFERENT UTC buckets (06:15 CDT-relative and 07:15 CST)
    val events = Seq(
      (Timestamp.valueOf("2020-11-01 06:15:00"), "x", 1.0), // 01:15 CDT as UTC
      (Timestamp.valueOf("2020-11-01 07:15:00"), "x", 1.0)) // 01:15 CST as UTC
      .toDF("ts", "event_type", "value")
    val agg = TrafficAgg.aggregate(events, "ts", Seq("event_type"), Seq("value"))
    assert(agg.count() == 2, "repeated local hour must not collapse into one bucket")
  }
}
