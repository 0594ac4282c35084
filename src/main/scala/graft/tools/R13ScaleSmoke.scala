package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 scale smokes (the PdfScaleSmoke convention: unbounded
  * shapes verified sub-linear with checksum gates so "fast" can
  * never mean "skipped"):
  *
  *  1. SUBTITLE EXTRACTION across all three carriages — N docs per
  *     carriage (standalone WebVTT/SRT, MP4 wvtt, MP4 stpp/TTML,
  *     WebM S_TEXT) parsed to cues, total cue count checksummed
  *     against the closed form.
  *  2. LANGUAGE-ID at classifier width 9 — M synthetic docs
  *     featurized + scored + argmaxed in one codegen pass, class
  *     histogram checksummed.
  *  3. ELST GOP DECODE — K edit-listed B GOPs through the full
  *     avcC → DPB → MC → edit-mapping chain, pts sums checksummed.
  *
  * Run twice with N ratios to read the scaling exponent.
  */
object R13ScaleSmoke {
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
      println(f"[r13scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val n = if (args.nonEmpty) args(0).toLong else 250000L
    // 1. subtitles, all carriages (ids cycle the per-carriage variants)
    for ((label, cues) <- Seq(
      "standalone" -> gb.column(graft.fn.SubtitleCues(
        graft.fn.SubtitleSynth(gb.expression(col("id"))))),
      "mp4-wvtt" -> gb.column(graft.fn.Mp4SubtitleCues(
        graft.fn.Mp4SubtitleSynth(gb.expression(col("id"))))),
      "mp4-stpp" -> gb.column(graft.fn.Mp4SubtitleCues(
        graft.fn.Mp4TtmlSynth(gb.expression(col("id"))))),
      "webm-stext" -> gb.column(graft.fn.WebmSubtitleCues(
        graft.fn.WebmSubtitleSynth(gb.expression(col("id")))))
    )) {
      val total = timed(f"$label x$n") {
        spark.range(n).select(size(cues).as("c"))
          .agg(sum("c")).head.getLong(0)
      }
      // closed form: sum over ids of 2 + id % 4 = 3.5 per doc
      val expect = (0L until n).map(i => 2 + i % 4).sum
      assert(total == expect, s"$label cue checksum $total != $expect")
    }
    // 2. language-ID at width 9
    val m = 4 * n
    val hist = timed(f"langid x$m") {
      spark.range(m).select(
        graft.ext.LangId.classify(
          graft.ext.LangId.features(
            concat(lit("the people and the water of house "), col("id"))),
          graft.ext.LangId.PinnedW).as("lang"))
        .groupBy("lang").count().collect()
    }
    assert(hist.length == 1 && hist.head.getString(0) == "en" &&
      hist.head.getLong(1) == m, s"langid histogram ${hist.mkString(",")}")
    // 3. elst GOP decode (4-frame B GOP each → 4n frame decodes)
    val k = n / 5
    val pts = timed(f"elst-gop x$k (${4 * k} frame decodes)") {
      val gop = graft.fn.H264GopFrames(
        graft.fn.Mp4ElstSynth(gb.expression(col("id"))), 4, 1, 4)
      spark.range(k)
        .select(explode(gb.column(gop)).as("f"))
        .agg(sum(element_at(col("f"), 9))).head.getDouble(0)
    }
    val expectPts = (0L until k)
      .map(i => 3000.0 - 4 * 500.0 * (i % 2) + 4 * 500.0 * (i % 3)).sum
    assert(math.abs(pts - expectPts) < 1e-6, s"pts checksum $pts != $expectPts")
    spark.stop()
  }
}
