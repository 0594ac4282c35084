package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the round-8 H.264 decode family: a synthetic
  * corpus of N single-keyframe MP4s (I_PCM 16x16) driven through
  * keyframe dHash, keyframe features, and the near-dup pair stage at
  * local[32] — the per-row decode cost and plan shape a 100 TB asset
  * scan would amortize. `sbt "runMain graft.tools.VideoDecodeProbe [n]"`.
  */
object VideoDecodeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.install(spark)
    import spark.implicits._

    val assets = spark.range(n).select($"id".as("vid_id"))
      .as[Long]
      .map { i =>
        val h = i * 2654435761L
        (i, graft.ext.VideoFixtures.pcmKeyframeMp4((x, y) =>
          (127 + 90 * math.sin((1 + (h % 5).toInt.abs) * x / 2.5 +
            y / 2.0 + (h % 628).toInt / 100.0)).toInt & 0xFF))
      }.toDF("vid_id", "content")
      .repartition(32)
      .cache()
    val total = assets.count()

    def timed(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[vdec-probe] $name%-24s ${ts.min}%6.2f s (min of 3, $total videos, ${total / ts.min}%8.0f videos/s)")
    }
    timed("keyframe_dhash") {
      graft.ext.Multimodal.withKeyframeDhash(assets)
        .agg(count($"kf_dhash")).collect()
    }
    timed("keyframe_features") {
      assets.selectExpr("mp4_keyframe_thumb(content, 9, 8) t")
        .agg(count(lit(1))).collect()
    }
    timed("neardup_pairs_full") {
      graft.ext.Multimodal.nearDupVideoPairs(assets, "vid_id").count()
    }
    spark.stop()
  }
}
