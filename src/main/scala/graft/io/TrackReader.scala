package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Schemas
import graft.fn.{TimeFns, GeoFns}

/** S1 track sources (SURVEY.md §2.1): both track CSV schemas present in
  * the reference repo, normalized to one canonical shape:
  *
  *   (point_id, ts, hour, lat, lon, stormname)
  *
  * with lon wrapped to [0,360) (P3, trackplot_hycom.py:167-170) and
  * `hour` = integer hours since 2000-01-01T00Z (F1).
  */
object TrackReader {

  /** NHC best-track CSV (header row; `hurricane_track`,
    * trackplot_hycom.py:158-171). Declared schema → CSV reader prunes to
    * the consumed columns only (the reference materializes 3 of 12).
    */
  def readNhc(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .schema(Schemas.nhcTrackSchema)
      .csv(path)
    normalize(
      raw.select(
        to_timestamp(col("atcfdtg"), "yyyyMMddHH").as("ts"),
        col("lat"), col("lon"), col("stormname")))
  }

  /** IBTrACS-style headerless CSV (Hermine_track.csv / Sandy_track.csv,
    * FIXTURES.md §1b — a second schema `hurricane_track` silently
    * misreads; supported explicitly here). Handles both lon conventions
    * (Hermine already [0,360), Sandy signed).
    */
  def readIbtracs(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "false")
      .option("mode", "PERMISSIVE")   // Hermine rows lack the 6 Sandy tail cols
      .schema(Schemas.ibtracsTrackSchema)
      .csv(path)
    normalize(
      raw.select(
        to_timestamp(trim(col("iso_time")), "M/d/yy H:mm").as("ts"),
        col("lat"), col("lon"), trim(col("name")).as("stormname")))
  }

  /** Shared canonicalization: lon wrap, hour offset, deterministic
    * point_id by time order (the reference relies on file order; an
    * explicit sort key is the distributed-safe equivalent).
    */
  private def normalize(df: DataFrame): DataFrame = {
    val w = Window.orderBy(col("ts"))
    df.withColumn("lon", GeoFns.wrapLon360(col("lon")))
      .withColumn("hour", TimeFns.hoursSince2000(col("ts")))
      .withColumn("point_id", row_number().over(w).cast("long") - 1)
      .select("point_id", "ts", "hour", "lat", "lon", "stormname")
  }
}
