package graft

import org.apache.spark.sql.functions._

import graft.ops.GeoJoin

/** Tile-bucketed nearest-geo join: exactness at zoom 0 (one world tile ==
  * the exhaustive cross), NULL surfacing for empty 3×3 blocks, and the
  * antimeridian wrap.
  */
class GeoJoinSpec extends SparkSpec {

  import spark.implicits._

  private def pts(rows: (Long, Double, Double)*) =
    rows.toSeq.toDF("pid", "plat", "plon")

  private def cds(rows: (Long, Double, Double)*) =
    rows.toSeq.toDF("cid", "clat", "clon")

  test("zoom 0 equals the exhaustive cross argmin (q_j12 shape)") {
    val cust = Tables(spark, "/root/testdata/sf0.001", "customer").select(
      col("c_custkey"),
      (col("c_custkey") * 7 % 120 - 60 + 0.25).as("c_lat"),
      (col("c_custkey") * 13 % 340 - 170 + 0.25).as("c_lon"))
    val supp = Tables(spark, "/root/testdata/sf0.001", "supplier").select(
      col("s_suppkey"),
      (col("s_suppkey") * 11 % 120 - 60 + 0.75).as("s_lat"),
      (col("s_suppkey") * 17 % 340 - 170 + 0.75).as("s_lon"))
    val exact = SparkEntry.queries("q_j12_geo_nn")(spark, "/root/testdata/sf0.001")
    val tiled = GeoJoin.nearestByTile(
      cust, "c_custkey", "c_lat", "c_lon",
      supp, "s_suppkey", "s_lat", "s_lon", zoom = 0)
    assert(tiled.exceptAll(exact).isEmpty && exact.exceptAll(tiled).isEmpty)
  }

  test("nearest within the block is found; an empty block surfaces NULLs") {
    val p = pts((1L, 10.0, 10.0), (2L, -80.0, 120.0))
    // one candidate near point 1; nothing anywhere near point 2's block
    // at zoom 6 (tiles ~5.6 degrees)
    val c = cds((100L, 10.2, 10.3), (101L, 10.1, 9.8), (102L, 60.0, -120.0))
    val got = GeoJoin.nearestByTile(p, "pid", "plat", "plon",
      c, "cid", "clat", "clon", zoom = 6)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // 101 is closer to (10,10) than 100 (0.1°+0.2° vs 0.2°+0.3°)
    assert(got(1L) == Some(101L))
    assert(got(2L) == None)
    // every point surfaces exactly once
    assert(got.size == 2)
  }

  test("antimeridian: tiles wrap in x, so near-dateline neighbors match") {
    val p = pts((1L, 0.0, 179.9))
    val c = cds((200L, 0.0, -179.9), (201L, 0.0, 170.0))
    // at zoom 4 (22.5-degree tiles) the wrap puts -179.9 in the x-neighbor
    // of 179.9's tile; 200 is ~0.2 degrees away vs 201's ~9.9
    val got = GeoJoin.nearestByTile(p, "pid", "plat", "plon",
      c, "cid", "clat", "clon", zoom = 4).head()
    assert(got.getLong(1) == 200L)
  }

  test("boundary candidates: lon exactly 180 wraps, polar latitudes clamp, zoom 0 stays exact") {
    // candidate at exactly +180 degrees: tileX = n (one past the edge) —
    // must wrap into tile 0's x and stay reachable from a near-dateline point
    val p = pts((1L, 0.0, 179.9), (2L, -85.5, 10.0))
    val c = cds((400L, 0.0, 180.0), (401L, -89.0, 10.0))
    val got = GeoJoin.nearestByTile(p, "pid", "plat", "plon",
      c, "cid", "clat", "clon", zoom = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 400L, "a lon-180 candidate must wrap into the probe's reach")
    // a candidate past the Web-Mercator edge clamps into the edge row and
    // stays reachable from a point in that row
    assert(got(2L) == 401L, "a polar candidate must clamp into the edge tile row")
    // zoom 0 with polar/antimeridian inputs is still the exact cross
    val exact = Seq((1L, 400L), (2L, 401L))
    val z0 = GeoJoin.nearestByTile(p, "pid", "plat", "plon",
      c, "cid", "clat", "clon", zoom = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(z0 == exact)
  }

  test("ties break on (rounded distance, candidate id) — the q_j12 convention") {
    val p = pts((1L, 0.0, 0.0))
    // two candidates symmetric about the point: identical distance
    val c = cds((301L, 0.5, 0.0), (300L, -0.5, 0.0))
    val got = GeoJoin.nearestByTile(p, "pid", "plat", "plon",
      c, "cid", "clat", "clon", zoom = 2).head()
    assert(got.getLong(1) == 300L)
  }
}
