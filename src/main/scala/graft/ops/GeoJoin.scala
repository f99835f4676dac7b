package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Functions

/** Tile-bucketed geo joins — the 100 TB path for the nearest-geo argmin
  * family. The reference's device resolution scans all candidate pairs
  * (fine for its ~100-sensor dimension, and the engine keeps that exact
  * broadcast-cross form in `DeviceResolution`/q_j12); at corpus scale the
  * candidate side is millions of rows and the cross is the textbook
  * scale-killer. Here both sides bucket into slippy-map tiles
  * ([[Functions.tileX]]/[[Functions.tileY]] — the SharedStreets/OSM
  * convention, reference `docs/sharedstreets.md`), each point probes its
  * 3×3 tile neighborhood, and the match becomes a KEYED equi-join on the
  * tile key with a per-point haversine argmin behind it.
  */
object GeoJoin {

  /** Nearest candidate per point by haversine distance, comparing only
    * candidates in the point's tile and its 8 neighbors at `zoom` —
    * `(pIdCol, cIdCol, dist_ft)`, one row per point, NULL candidate when
    * the 3×3 block holds none.
    *
    * Contract: EXACT nearest whenever the true nearest lies within the
    * neighbor block — pick `zoom` so a tile is comfortably wider than the
    * expected match distance (a zoom-z tile spans 360/2^z degrees of
    * longitude). A point whose block is empty surfaces with NULLs rather
    * than silently paying a rescan; the caller escalates (coarser zoom,
    * or the exact cross on the residual — typically a vanishing
    * fraction). `zoom = 0` is one world tile == the exact form
    * (spec-pinned against the q_j12 cross).
    *
    * Scale shape: the probe side explodes 9× (slim id+coords rows, never
    * payload), x wraps at the antimeridian, y clamps at the poles; the
    * join is a keyed equi-join on (tile_x, tile_y) — SHUFFLE_HASH hinted,
    * never a cross — and the argmin is one keyed window over
    * block-bounded pair rows. Ties break on (rounded distance, candidate
    * id), the q_j12 convention, so results replay exactly in SQL.
    */
  def nearestByTile(
      points: DataFrame, pIdCol: String, pLatCol: String, pLonCol: String,
      cands: DataFrame, cIdCol: String, cLatCol: String, cLonCol: String,
      zoom: Int): DataFrame =
    nearestAgainstTiled(points, pIdCol, pLatCol, pLonCol,
      tiledCands(cands, cIdCol, cLatCol, cLonCol, zoom), cIdCol, zoom)

  // BOTH sides normalize the same way — x wraps (lon 180 is lon −180's
  // tile; tileX of exactly +180 is n, one past the edge), y clamps into
  // [0, n−1] (latitudes past the Web-Mercator range land in the edge
  // row). A one-sided normalization would strand boundary candidates in
  // tiles no probe can reach and silently break the zoom-0 == exact
  // contract for polar/antimeridian inputs.
  private def normX(x: org.apache.spark.sql.Column, n: Long) = pmod(x, lit(n))
  private def clampY(y: org.apache.spark.sql.Column, n: Long) =
    least(greatest(y, lit(0L)), lit(n - 1))

  /** The candidate side's normalized tile relation
    * `(_cid, _clat, _clon, _jx, _jy)` — computed once per join, or once
    * EVER via [[saveTileIndex]] when candidates are static and points
    * stream.
    */
  private def tiledCands(
      cands: DataFrame, cIdCol: String, cLatCol: String, cLonCol: String,
      zoom: Int): DataFrame = {
    require(zoom >= 0 && zoom <= 22, s"tile zoom $zoom out of range [0, 22]")
    val n = 1L << zoom
    cands.select(
      col(cIdCol).as("_cid"), col(cLatCol).as("_clat"), col(cLonCol).as("_clon"),
      normX(Functions.tileX(col(cLonCol), zoom), n).as("_jx"),
      clampY(Functions.tileY(col(cLatCol), zoom), n).as("_jy"))
  }

  /** The probe + keyed join + argmin tail shared by the direct and the
    * indexed forms (one code path — the two can never disagree).
    */
  private def nearestAgainstTiled(
      points: DataFrame, pIdCol: String, pLatCol: String, pLonCol: String,
      c: DataFrame, cIdCol: String, zoom: Int): DataFrame = {
    require(zoom >= 0 && zoom <= 22, s"tile zoom $zoom out of range [0, 22]")
    val n = 1L << zoom
    val p = points.select(
      col(pIdCol).as("_pid"), col(pLatCol).as("_plat"), col(pLonCol).as("_plon"),
      Functions.tileX(col(pLonCol), zoom).as("_tx"),
      clampY(Functions.tileY(col(pLatCol), zoom), n).as("_ty"))
    // 9 probe tiles per point. Low zooms (and pole rows) produce duplicate
    // probe tiles after the wrap/clamp — harmless, the argmin window is
    // duplicate-tolerant
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val probes = p
      .select(col("_pid"), col("_plat"), col("_plon"), col("_tx"), col("_ty"),
        explode(array(offsets: _*)).as("_o"))
      .select(col("_pid"), col("_plat"), col("_plon"),
        normX(col("_tx") + col("_o.dx"), n).as("_jx"),
        clampY(col("_ty") + col("_o.dy"), n).as("_jy"))
    // The tile join is the compute-heavy/small-bytes shape AQE coalesces
    // onto one task (slim coordinate rows in, a haversine per joined pair
    // out) — measured 2.3× slower under coalescing at sf0.1. The
    // editDistancePairs discipline: salt the probe side, replicate the
    // (slim) candidate side across the salts, and repartition BOTH sides
    // explicitly on the join's equi-keys so the partitioning survives AQE.
    // Each (probe, cand) tile pair meets at exactly one salt, so results
    // are unchanged; the salt never reaches the output, so murmur hash is
    // fine (the md5 discipline binds result-affecting randomness only).
    val salts = 32
    val parallelism = points.sparkSession.sessionState.conf.numShufflePartitions
    val probesS = probes
      .withColumn("_salt", pmod(hash(col("_pid")), lit(salts)))
      .repartition(parallelism, col("_jx"), col("_jy"), col("_salt"))
    val candsS = c
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .repartition(parallelism, col("_jx"), col("_jy"), col("_salt"))
      .hint("SHUFFLE_HASH")
    val scored = probesS
      .join(candsS, Seq("_jx", "_jy", "_salt"))
      .select(col("_pid"), col("_cid"),
        Functions.roundHalfUp(
          Functions.haversineFeet(
            col("_plat"), col("_plon"), col("_clat"), col("_clon")), 0)
          .as("dist_ft"))
    val w = Window.partitionBy(col("_pid")).orderBy(col("dist_ft"), col("_cid"))
    val best = scored
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("_pid"), col("_cid"), col("dist_ft"))
    points.select(col(pIdCol).as("_pid"))
      .join(best, Seq("_pid"), "left")
      .select(col("_pid").as(pIdCol), col("_cid").as(cIdCol), col("dist_ft"))
  }

  private val MetaFile = "_geotile_meta.json"

  /** Persist the candidate tile index: the normalized
    * `(_cid, _clat, _clon, _jx, _jy)` relation plus a zoom sidecar, so a
    * streaming consumer ([[nearestByTileIndexed]] under `foreachBatch`)
    * tiles the candidate dimension ONCE and every micro-batch pays only
    * its own probe side — the lshTopK-index pattern for geo.
    */
  def saveTileIndex(
      cands: DataFrame, cIdCol: String, cLatCol: String, cLonCol: String,
      zoom: Int, path: String): Unit = {
    tiledCands(cands, cIdCol, cLatCol, cLonCol, zoom)
      .write.mode("overwrite").parquet(path)
    graft.ops.MetaJson.write(cands.sparkSession, path, MetaFile,
      Seq("zoom" -> zoom.toLong))
  }

  /** [[nearestByTile]] against a persisted tile index — zoom comes from
    * the artifact's own sidecar (a bare directory is refused), geometry
    * can never mismatch what was indexed. Per-point results depend only
    * on the point and the index, so a `foreachBatch` stream of points
    * equals the batch join wave-for-wave (spec-pinned).
    */
  def nearestByTileIndexed(
      points: DataFrame, pIdCol: String, pLatCol: String, pLonCol: String,
      indexPath: String, cIdCol: String): DataFrame = {
    val spark = points.sparkSession
    val zoom = graft.ops.MetaJson.readFields(spark, indexPath, MetaFile,
      Seq("zoom"), "a tile index written by GeoJoin.saveTileIndex")("zoom").toInt
    nearestAgainstTiled(points, pIdCol, pLatCol, pLonCol,
      spark.read.parquet(indexPath), cIdCol, zoom)
  }
}
