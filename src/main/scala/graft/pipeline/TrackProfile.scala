package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fn.GeoFns
import graft.io.SyntheticGrid.GridSpec
import graft.ops.{AsofJoin, NearestJoin, Stencil, Idw}

/** §3.1 flagship query: the HYCOM depth/time profile along a hurricane
  * track — the reference's whole `trackplot_hycom.py` main path,
  * restated as one lazy Spark plan:
  *
  *   track → as-of time (J2) → NN snap (J1) → 3×3 stencil (J3)
  *         → vincenty distances (F4) → grid gather join (J4)
  *         → depth truncation (P5) → IDW per (point, depth) (A1)
  *
  * Scale shape: the track side stays tiny after the stencil expansion
  * (|track|·9 rows) and is BROADCAST into the join against the grid —
  * the grid (the 100 TB side) is never shuffled; partition pruning on
  * `time` plus row-group skipping on (lat_idx, lon_idx) reduce the scan
  * to the touched cells, the relational equivalent of the reference's
  * per-point OPeNDAP hyperslabs (trackplot_hycom.py:110) without the
  * per-point round-trips.
  *
  * Both measures (water_temp + salinity) aggregate in ONE pass — the
  * notebook re-runs the whole pipeline per variable (SURVEY.md §3.2).
  */
object TrackProfile {

  final case class Config(
      interp: String = "idw",          // "idw" | "nearest" (§2.9 item 4)
      distance: String = "vincenty",   // "vincenty" | "haversine"
      maxDepthLevels: Int = 25,        // P5 (trackplot_hycom.py:148)
      tileSize: Int = 32)              // tile geometry of a tiled grid layout

  /** @param track  canonical track (point_id, hour, lat, lon, ...)
    * @param grid   long-format grid (Schemas.gridSchema), sentinels
    *               already cleaned (SyntheticGrid.cleanSentinels)
    * @param spec   the grid's regular-axis geometry (enables the O(1)
    *               arithmetic snap; snapByAxis covers irregular grids)
    */
  def profile(track: DataFrame, grid: DataFrame, spec: GridSpec,
              cfg: Config = Config()): DataFrame = {

    // J2: nearest grid time per fix (broadcast argmin over the time axis)
    val timeAxis = track.sparkSession
      .createDataFrame(spec.times.zipWithIndex.map { case (t, i) => (i, t) })
      .toDF("t_idx", "t_val")
    val withTime = AsofJoin.nearestBroadcast(
      track, Seq("point_id"), "hour", timeAxis, "t_idx", "t_val", "gtime")

    // J1: O(1) arithmetic snap onto the regular lat/lon axes
    val snappedLat = NearestJoin.snapRegular(
      withTime, col("lat"), spec.latMin, spec.latStep, spec.nLat, "glat")
    val snapped = NearestJoin.snapRegular(
      snappedLat, col("lon"), spec.lonMin, spec.lonStep, spec.nLon, "glon")

    // J3: 3×3 stencil expansion (explode — no shuffle)
    val stencil = Stencil.expand(snapped, "glat_idx", "glon_idx",
        spec.nLat, spec.nLon)
      .withColumn("n_lat", lit(spec.latMin) + col("n_i") * spec.latStep)
      .withColumn("n_lon", lit(spec.lonMin) + col("n_j") * spec.lonStep)

    // F4/F5: distance fix → neighbor cell (km). Vincenty runs as the
    // native codegen expression (VincentyKm) — the one ScalaUDF that
    // used to break the flagship's whole-stage-codegen span is gone.
    val distCol = cfg.distance match {
      case "haversine" =>
        GeoFns.haversineKm(col("lat"), col("lon"), col("n_lat"), col("n_lon"))
      case _ =>
        GeoFns.vincentyKmNative(col("lat"), col("lon"), col("n_lat"), col("n_lon"))
    }
    val withDist = stencil.withColumn("d_km", distCol)
      .select("point_id", "hour", "gtime_t", "n_i", "n_j", "d_km")

    // J4 gather: equi-join the tiny stencil side against the grid on
    // exact integer keys; broadcast the stencil so the grid side never
    // shuffles. P5 depth truncation pushes into the grid scan. When the
    // grid carries a `tile` partition column (writeGridTiled layout),
    // the stencil side computes the same tile and joins on it too —
    // Dynamic Partition Pruning then skips every untouched (time, tile)
    // partition, reducing the scan from the full field to the ~|track|
    // tiles the stencils touch (the hyperslab-read equivalent, no
    // driver-side coordination).
    val tiled = grid.columns.contains("tile")
    val stencilSide =
      if (tiled)
        withDist.withColumn("n_tile",
          graft.io.SyntheticGrid.tileId(col("n_i"), col("n_j"), cfg.tileSize))
      else withDist
    val baseCond =
      grid("time") === stencilSide("gtime_t") &&
      grid("lat_idx") === stencilSide("n_i") &&
      grid("lon_idx") === stencilSide("n_j")
    val joinCond =
      if (tiled) baseCond && grid("tile") === stencilSide("n_tile") else baseCond
    val gathered = grid
      .filter(col("depth_idx") < cfg.maxDepthLevels)
      .join(broadcast(stencilSide), joinCond)

    // A1: IDW (or nearest) per (point, depth) — multi-measure, one pass
    val (tempAgg, salAgg) = cfg.interp match {
      case "nearest" =>
        (Idw.nearestValue(col("water_temp"), col("d_km")),
         Idw.nearestValue(col("salinity"), col("d_km")))
      case _ =>
        (Idw.idw(col("water_temp"), col("d_km")),
         Idw.idw(col("salinity"), col("d_km")))
    }
    gathered
      .groupBy(col("point_id"), col("hour"), col("gtime_t").as("grid_time"),
               col("depth_idx"), col("depth"))
      .agg(tempAgg.as("water_temp"), salAgg.as("salinity"))
      // presentation-only global sort: the profile is ~|track|·25 rows
      // (2 000 for Hermine) regardless of grid size, so the range
      // exchange is O(output), never O(data); drop it for headless
      // sinks that don't care about order
      .orderBy("point_id", "depth_idx")
  }
}
