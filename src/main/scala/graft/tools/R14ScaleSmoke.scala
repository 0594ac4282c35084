package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 scale smokes (the R13ScaleSmoke convention: checksum
  * gates so "fast" can never mean "skipped"):
  *
  *  1. VP8 END-TO-END — N WebMs, each a REAL 32×32 VP8 keyframe
  *     (encode → EBML → track walk → keyframe decode → dHash), hash
  *     count checksummed.
  *  2. BOILERPLATE — M synthesized pages through segmentation + both
  *     classification passes; block count is exactly 8/page.
  *  3. MANIFESTS — M HLS playlists (both kinds by parity) + M MPDs;
  *     row counts are closed forms.
  *  4. AUDIO PROFILE — N WAV/FLAC decodes through the mono profile;
  *     Σ clip_n is a closed form of the id stream.
  *  5. AV1 META — M av1C sequence-header parses; Σ level is a closed
  *     form.
  *
  * Run twice with different N to read the scaling exponent.
  */
object R14ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.install(spark)
    import org.apache.spark.sql.{graftbridge => gb}

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[r14scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val n = if (args.nonEmpty) args(0).toLong else 50000L
    val m = 5 * n

    // 1. VP8 encode→container→decode→hash, end to end
    val id = col("id")
    val vp8Hashes = timed(f"vp8 encode+decode+hash x$n") {
      spark.range(n).select(size(gb.column(graft.fn.WebmVp8Dhashes(
          graft.fn.Vp8WebmSynth(gb.expression(id)), 4))).as("c"))
        .agg(sum("c")).head.getLong(0)
    }
    assert(vp8Hashes == n, s"vp8 hash checksum $vp8Hashes != $n")

    // 2. boilerplate: 8 blocks per synthesized page, every page
    val blocks = timed(f"justext segment+classify x$m") {
      spark.range(m).select(size(gb.column(graft.fn.JustextBlocks(
          graft.fn.JustextSynth(gb.expression(id))))).as("c"))
        .agg(sum("c")).head.getLong(0)
    }
    assert(blocks == 8 * m, s"block checksum $blocks != ${8 * m}")

    // 3. manifests: HLS both kinds by parity + MPD representations
    val hlsRows = timed(f"hls parse x$m") {
      spark.range(m).select((when(id % 2 === 0,
          size(gb.column(graft.fn.HlsVariants(
            graft.fn.M3u8Synth(gb.expression(id))))))
        .otherwise(size(gb.column(graft.fn.HlsSegments(
          graft.fn.M3u8Synth(gb.expression(id))))))).as("c"))
        .agg(sum("c")).head.getLong(0)
    }
    val hlsExpect = (0L until m).map(i =>
      if (i % 2 == 0) 2 + i % 3 else 3 + i % 4).sum
    assert(hlsRows == hlsExpect, s"hls checksum $hlsRows != $hlsExpect")
    val mpdRows = timed(f"mpd parse x$m") {
      spark.range(m).select(size(gb.column(graft.fn.MpdRepresentations(
          graft.fn.MpdSynth(gb.expression(id))))).as("c"))
        .agg(sum("c")).head.getLong(0)
    }
    val mpdExpect = (0L until m).map(i => 3 + i % 2).sum
    assert(mpdRows == mpdExpect, s"mpd checksum $mpdRows != $mpdExpect")

    // 4. audio profile over real WAV/FLAC decodes
    val clipSum = timed(f"audio profile x$n") {
      spark.range(n).select(gb.column(graft.fn.AudioProfile(
          graft.fn.AudioProfileSynth(gb.expression(id))))(2).as("c"))
        .agg(sum("c")).head.getDouble(0).toLong
    }
    val clipExpect = (0L until n).map(i => if (i % 4 == 0) 300L else 0L).sum
    assert(clipSum == clipExpect, s"clip checksum $clipSum != $clipExpect")

    // 5. AV1 sequence-header meta
    val levelSum = timed(f"av1 meta x$m") {
      spark.range(m).select(gb.column(graft.fn.Av1Meta(
          graft.fn.Av1Synth(gb.expression(id))))(3).as("l"))
        .agg(sum("l")).head.getDouble(0).toLong
    }
    val levelExpect = (0L until m).map(_ % 12).sum
    assert(levelSum == levelExpect, s"level checksum $levelSum != $levelExpect")

    println("[r14scale] all checksums green")
    spark.stop()
  }
}
