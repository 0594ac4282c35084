package graft.tools
import org.apache.spark.sql.SparkSession
import graft.io.{SyntheticGrid, TrackReader}
import graft.pipeline.TrackProfile
/** Dev probe: flagship at the reference's REAL grid resolution
  * (GLBu0.08: 0.08°), ~38M grid cells — generator vs time-partitioned
  * parquet vs (time, tile)-partitioned parquet with DPP.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val track = TrackReader.readNhc(spark, "/root/repo/data/al092016_track.csv")
    val spec = SyntheticGrid.hermineSpec(step = 0.08)
    val cells = spec.nLat.toLong * spec.nLon * spec.depths.size * spec.times.size
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $label%-26s ${(System.nanoTime()-t0)/1e9}%.2f s")
      r
    }
    val grid = SyntheticGrid.cleanSentinels(SyntheticGrid.generate(spark, spec))
    timed("profile over generator")(
      println(s"[scale] rows=" + TrackProfile.profile(track, grid, spec).count()))
    val pqT = java.nio.file.Files.createTempDirectory("gridpq_t").toString
    timed(s"write time-partitioned")(SyntheticGrid.writeGrid(grid, pqT))
    timed("profile over time-parquet")(
      println(s"[scale] rows=" + TrackProfile.profile(track, spark.read.parquet(pqT), spec).count()))
    val pqTile = java.nio.file.Files.createTempDirectory("gridpq_tile").toString
    timed(s"write tiled")(SyntheticGrid.writeGridTiled(grid, pqTile))
    timed("profile over tiled+DPP")(
      println(s"[scale] rows=" + TrackProfile.profile(track, spark.read.parquet(pqTile), spec).count()))
    spark.stop()
  }
}
