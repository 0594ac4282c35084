package graft.tools

import java.nio.file.{Files, Paths}

/** The loop-filter SENSITIVITY experiment (round-13 verdict, missing
  * item 3): does in-loop deblocking move perceptual fingerprints?
  *
  * H.264 decode in this repo is exact only for
  * `disable_deblocking_filter_idc = 1`; on real streams the
  * reconstruction differs from a conformant decoder by the filter
  * delta, and whether dHash near-dup RECALL survives that delta was
  * unquantified. VP8 (round 14) decodes BOTH ways bit-exactly —
  * filtered (conformant, libwebp-golden-pinned) and filter-skipped —
  * so the same content measures the question directly: per golden,
  * dHash(filtered) vs dHash(unfiltered) hamming, plus the mean
  * absolute pixel delta the filter applies. Filter levels in the
  * golden set span 4..63 (q90 photos to q10 blocks).
  */
object FilterSensitivityProbe {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get("data", "vp8_golden")
    val index = new String(Files.readAllBytes(dir.resolve("index.txt")), "UTF-8")
    println(f"${"case"}%-22s ${"lvl"}%4s ${"madY"}%8s ${"maxY"}%5s ${"dhash_hamming"}%14s")
    var worst = 0
    for (line <- index.split("\n") if line.nonEmpty) {
      val Array(name, ws, hs, _) = line.split(",")
      val w = ws.toInt; val h = hs.toInt
      val webp = Files.readAllBytes(dir.resolve(name + ".webp"))
      val filtered = graft.ext.Vp8.decodeWebpOrNull(webp)
      graft.ext.Vp8.debugNoFilter.set(true)
      val raw = graft.ext.Vp8.decodeWebpOrNull(webp)
      graft.ext.Vp8.debugNoFilter.set(false)
      val lvl = graft.ext.Vp8.lastHeader.get()
        .split("lvl=")(1).split(" ")(0)
      var sum = 0L; var max = 0
      var i = 0
      while (i < w * h) {
        val d = math.abs((filtered.y(i) & 0xFF) - (raw.y(i) & 0xFF))
        sum += d; if (d > max) max = d
        i += 1
      }
      def hash(p: graft.ext.Vp8.Planes): Long = {
        val g = graft.ext.Vp8.grayOrNull(p)
        graft.ext.Images.dhashOfThumb(
          graft.ext.Images.resizeGray(g._1, g._2, g._3, 9, 8))
      }
      val ham = java.lang.Long.bitCount(hash(filtered) ^ hash(raw))
      worst = math.max(worst, ham)
      println(f"$name%-22s $lvl%4s ${sum.toDouble / (w * h)}%8.3f $max%5d $ham%14d")
    }
    println(s"worst dhash drift across the set: $worst bits " +
      s"(pair gate is <= 3; planted twins sit at 0-2)")
  }
}
