package graft

import graft.apps.Pipelines
import graft.model.Typed

/** Typed Dataset facade: standardized rows round-trip into case classes and
  * typed aggregation matches the untyped plan.
  */
class TypedSpec extends SparkSpec {

  import spark.implicits._

  test("wt standardized rows bind to Dataset[WtObs]") {
    val raw = Seq(
      (1, 100L, "2020-01-15 08:00:00", "LAMAR/KOENIG", "NB_1", 12, 3, 35))
      .toDF("detID", "intID", "curDateTime", "intName", "detName",
        "volume", "occupancy", "speed")
    val typed = Typed.wtObs(Pipelines.Wt.standardize(raw))
    val obs = typed.head()
    assert(obs.intName == "LAMAR/KOENIG" && obs.volume == 12)
    assert(obs.timestamp == java.sql.Timestamp.valueOf("2020-01-15 14:00:00"))
  }

  test("typed edge aggregation over the matched feed") {
    val matched = Seq(
      ("AbC=", "r1", "r2", "01/15/2020 08:05:00 AM", "01/15/2020 08:09:00 AM", 240, 35, "valid", 1),
      ("DeF=", "r1", "r2", "01/15/2020 08:20:00 AM", "01/15/2020 08:26:00 AM", 360, 28, "valid", 1),
      ("GhI=", "r2", "r3", "01/15/2020 08:06:00 AM", "01/15/2020 08:11:00 AM", 300, 30, "valid", 1))
      .toDF("dev_addr", "origin_reader_id", "dest_reader_id", "start_time", "end_time",
        "travel_time_secs", "speed", "match_validity", "filter_id")
    val edges = Typed.travelEdges(Pipelines.Bt.standardizeMatched(matched))
    val stats = Typed.edgeStats(edges).collect()
      .map(s => (s.origin_reader_id, s.dest_reader_id) -> s).toMap
    assert(stats(("r1", "r2")).n == 2)
    assert(stats(("r1", "r2")).mean_travel_secs == 300.0)
    assert(stats(("r1", "r2")).max_speed == 35)
    assert(stats(("r2", "r3")).n == 1)
  }
}
