package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order clustering: same answers, far fewer rows surfaced by the
  * parquet reader under a 2-D box predicate (row-group min/max stats
  * become selective once the data is Morton-clustered).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("morton interleave round-trips bit positions") {
    val df = Seq((3L, 0L), (0L, 3L), (1L, 2L)).toDF("x", "y")
      .select(Layout.interleave(Seq($"x", $"y"), 2).as("z"))
    // x bits land at even positions, y at odd: (3,0)->0b0101=5,
    // (0,3)->0b1010=10, (1,2)->0b1001=9
    assert(df.as[Long].collect().toSeq === Seq(5L, 10L, 9L))
  }

  test("z-ordered layout prunes row groups under a box predicate") {
    val pts = spark.range(200000).select(
      $"id",
      (pmod(xxhash64($"id", lit(1)), lit(1000000L)) / 1000000.0 * 180 - 90).as("lat"),
      (pmod(xxhash64($"id", lit(2)), lit(1000000L)) / 1000000.0 * 360 - 180).as("lon"))

    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val sDir = java.nio.file.Files.createTempDirectory("scatter").toString
    Layout.zorder(pts, Seq(($"lat", -90, 90), ($"lon", -180, 180)),
        bits = 16, numFiles = 32)
      .write.mode("overwrite").parquet(zDir)
    pts.repartition(32, $"id").write.mode("overwrite").parquet(sDir)

    def box(df: DataFrame): DataFrame =
      df.where($"lat".between(10, 20) && $"lon".between(30, 50))

    val zq = box(spark.read.parquet(zDir))
    val sq = box(spark.read.parquet(sDir))

    // identical answers…
    val zIds = zq.select($"id").as[Long].collect().sorted
    val sIds = sq.select($"id").as[Long].collect().sorted
    assert(zIds.nonEmpty && zIds.toSeq === sIds.toSeq)

    // …but the clustered layout's reader surfaces a fraction of the
    // rows (stats-based row-group / page skipping), while the
    // scattered layout's every row group spans the whole space.
    val (zRows, sRows) = (scanRows(zq), scanRows(sq))
    assert(sRows > 100000L, s"scattered layout should read ~everything, read $sRows")
    assert(zRows * 3 < sRows, s"z-ordered read $zRows vs scattered $sRows")
  }
}
