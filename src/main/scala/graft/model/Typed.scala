package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` facade over the well-known row shapes (SURVEY §1.3:
  * case-class Encoders where the schema is fixed and type safety pays —
  * standardized sensor records and derived stats). `DataFrame` stays the
  * currency for schema-dynamic work (envelopes, catalog rows).
  */
object Typed {

  /** A standardized Wavetronix observation (post-standardize: UTC instant,
    * typed counters — the KITSDBRec analog, reference
    * `drivers/devices/wt_mssql_db.py:14`).
    */
  case class WtObs(
      detID: Int,
      intID: Long,
      timestamp: Timestamp,
      intName: String,
      detName: String,
      volume: Int,
      occupancy: Int,
      speed: Int)

  /** A standardized Bluetooth sighting (bt IAF row). */
  case class BtSighting(
      host_timestamp: Timestamp,
      reader_id: String,
      dev_addr: String)

  /** One travel-time edge from the matched feed (the reference's implicit
    * graph: readers are vertices, matches are edges, SURVEY §1.1).
    */
  case class TravelEdge(
      origin_reader_id: String,
      dest_reader_id: String,
      start_time: Timestamp,
      travel_time_secs: Int,
      speed: Int)

  /** Per-edge travel-time summary. */
  case class EdgeStat(
      origin_reader_id: String,
      dest_reader_id: String,
      n: Long,
      mean_travel_secs: Double,
      max_speed: Int)

  def wtObs(standardized: DataFrame): Dataset[WtObs] = {
    import standardized.sparkSession.implicits._
    standardized
      .select("detID", "intID", "timestamp", "intName", "detName",
        "volume", "occupancy", "speed")
      .as[WtObs]
  }

  def travelEdges(standardizedMatched: DataFrame): Dataset[TravelEdge] = {
    import standardizedMatched.sparkSession.implicits._
    standardizedMatched
      .select("origin_reader_id", "dest_reader_id", "start_time",
        "travel_time_secs", "speed")
      .as[TravelEdge]
  }

  /** Typed per-edge aggregation via `groupByKey` — compile-time-checked key
    * and fields; still plans to a hash aggregate with map-side combine
    * (Catalyst sees through the typed API here).
    */
  def edgeStats(edges: Dataset[TravelEdge]): Dataset[EdgeStat] = {
    import edges.sparkSession.implicits._
    edges
      .groupByKey(e => (e.origin_reader_id, e.dest_reader_id))
      .agg(
        count(lit(1)).as[Long],
        avg(col("travel_time_secs")).as[Double],
        max(col("speed")).as[Int])
      .map { case ((o, d), n, mean, maxSpeed) => EdgeStat(o, d, n, mean, maxSpeed) }
  }
}
