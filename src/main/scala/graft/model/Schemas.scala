package graft.model

import org.apache.spark.sql.types._

/** Typed data model for the engine (SURVEY.md §1.3).
  *
  * The reference is schema-on-read with positional column access
  * (`trackplot_hycom.py:165-167`); here every source gets a declared
  * `StructType` so Catalyst can prune/push down, plus case classes for
  * `Dataset[T]` boundaries.
  */
object Schemas {

  /** NHC best-track CSV (`kmz2csv.py:20-21`, consumed by
    * `trackplot_hycom.py:158-171`). 12 named columns, header row.
    */
  val nhcTrackSchema: StructType = StructType(Seq(
    StructField("atcfdtg", StringType),          // yyyyMMddHH, UTC
    StructField("stormnum", StringType),
    StructField("stormname", StringType),
    StructField("basin", StringType),
    StructField("stormtype", StringType),
    StructField("intensity", IntegerType),
    StructField("intensitymph", IntegerType),
    StructField("intensitykph", IntegerType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("minsealevelpres", IntegerType),
    StructField("dtg", StringType)
  ))

  /** IBTrACS-style headerless track CSV (`Hermine_track.csv` /
    * `Sandy_track.csv`; FIXTURES.md §1b). Sandy adds 6 trailing columns;
    * the reader declares the superset and tolerates missing tails.
    */
  val ibtracsTrackSchema: StructType = StructType(Seq(
    StructField("serial", StringType),
    StructField("season", IntegerType),
    StructField("num", IntegerType),
    StructField("basin", StringType),
    StructField("subbasin", StringType),
    StructField("name", StringType),
    StructField("iso_time", StringType),         // M/d/yy H:mm
    StructField("nature", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("wind_kt", IntegerType),
    StructField("pres_mb", IntegerType),
    StructField("source", StringType),
    StructField("val1", DoubleType),
    StructField("val2", DoubleType),
    StructField("track_type", StringType)
  ))

  /** Long-format relational encoding of the 4-D gridded model field
    * (SURVEY.md §1.3): one row per (time, depth, lat, lon) cell. Integer
    * axis indices are carried so joins/snaps are exact (no double
    * equality), and parquet is partitioned by `time` for pruning.
    */
  val gridSchema: StructType = StructType(Seq(
    StructField("time", LongType),               // hours since 2000-01-01T00Z
    StructField("depth_idx", IntegerType),
    StructField("depth", DoubleType),            // meters, positive down
    StructField("lat_idx", IntegerType),
    StructField("lat", DoubleType),
    StructField("lon_idx", IntegerType),
    StructField("lon", DoubleType),              // [0, 360)
    StructField("water_temp", DoubleType),       // null = land/masked
    StructField("salinity", DoubleType)
  ))

  // --- case classes (Dataset[T] API boundaries) ---

  /** One storm advisory fix; `hour` = hours since 2000-01-01T00Z
    * (`hurrtimeconv`, trackplot_hycom.py:150-156). Lon already wrapped
    * to [0,360).
    */
  final case class TrackPoint(point_id: Long, hour: Long, lat: Double, lon: Double)

  /** One cell of the long-format grid. */
  final case class GridCell(time: Long, depth_idx: Int, depth: Double,
                            lat_idx: Int, lat: Double, lon_idx: Int, lon: Double,
                            water_temp: Option[Double], salinity: Option[Double])

  /** One row of the flagship output profile (`zip_variable3D` flatten,
    * trackplot_hycom.py:217-223): per (track point × depth level).
    */
  final case class ProfileSample(point_id: Long, hour: Long, depth: Double,
                                 water_temp: Option[Double], salinity: Option[Double])
}
