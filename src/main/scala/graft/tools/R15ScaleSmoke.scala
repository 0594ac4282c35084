package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 scale smokes (the R14ScaleSmoke convention: checksum
  * gates so "fast" can never mean "skipped"):
  *
  *  1. AV1 END-TO-END — N gray scenes through the test-side lossless
  *     encoder → AVIF wrap → container item extract → full keyframe
  *     decode (MSAC + partitions + intra + WHT) → dHash; hash count
  *     checksummed.
  *  2. WEBM VORBIS — N q141-family streams re-laced into WebM and
  *     decoded through the shared Vorbis core with the Ogg/WebM
  *     agreement flag summed (must equal N).
  *  3. AVIF TRIAGE — M codec-profile walks (dims + av1C fields), Σ
  *     profile a closed form.
  *
  * Run twice with different N to read the scaling exponent.
  */
object R15ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.install(spark)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[r15scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val n = if (args.nonEmpty) args(0).toLong else 20000L
    val m = 10 * n

    // 1. AV1 encode→AVIF→extract→decode→hash, end to end (plain
    // dataset map: the per-row kernel IS the measurement target)
    import spark.implicits._
    val av1Hashes = timed(f"av1 encode+avif+decode+hash x$n") {
      spark.range(n).as[Long].map { id =>
        val w = 48; val h = 32
        val g = Array.tabulate(w * h) { p =>
          val x = p % w; val y = p / w
          (127 + (x * 3 + y * 5 + id).toInt % 97) & 0xFF
        }
        val obu = graft.ext.Av1Enc.encodeGray(g, w, h)
        val avif = graft.ext.Av1Enc.avifWrap(obu, w, h)
        val plane = graft.ext.Images.grayPlaneOrNull(avif)
        if (plane == null) 0L
        else 1L
      }.reduce(_ + _)
    }
    assert(av1Hashes == n, s"av1 checksum $av1Hashes != $n")

    // 2. WebM Vorbis carriage agreement
    val agree = timed(f"webm vorbis decode+agree x$n") {
      spark.range(n).as[Long].map { id =>
        val r = graft.fn.WebmVorbisAgree.eval(id % 500)
        if (r == null) 0L else r(3)
      }.reduce(_ + _)
    }
    assert(agree == n, s"vorbis agreement checksum $agree != $n")

    // 3. AVIF codec-profile triage
    val profSum = timed(f"avif triage x$m") {
      spark.range(m).as[Long].map { id =>
        val p = graft.ext.MediaMeta.imageCodecProfileOrNull(
          graft.ext.Av1Fixtures.avif(id))
        if (p == null) -1000000L else p._2
      }.reduce(_ + _)
    }
    val expProf = (0L until m).map(_ % 3).sum
    assert(profSum == expProf, s"triage checksum $profSum != $expProf")

    spark.stop()
  }
}
