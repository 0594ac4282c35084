package graft.tools

/** writer conformance probe: encode gray planes with WebpFixtures,
  * round-trip through WebpVp8l, and dump to /tmp for the libwebp
  * cross-decode (scripts/check_webp_writer.py)
  */
object WebpWriterCheck {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(3)
    var fails = 0
    val dir = new java.io.File("/tmp/webp_writer_check")
    dir.mkdirs()
    for (k <- 0 until 6) {
      val w = 1 + rnd.nextInt(70)
      val h = 1 + rnd.nextInt(50)
      val gray = Array.fill(w * h)(rnd.nextInt(256))
      val webp = graft.ext.WebpFixtures.encodeGray(gray, w, h)
      val d = graft.ext.WebpVp8l.decodeArgbOrNull(webp)
      if (d == null) { println(s"case $k (${w}x$h): NULL"); fails += 1 }
      else {
        val (argb, gw, gh) = d
        val ok = gw == w && gh == h && argb.indices.forall { i =>
          val v = gray(i)
          argb(i) == (0xFF000000 | (v << 16) | (v << 8) | v)
        }
        if (!ok) { println(s"case $k (${w}x$h): MISMATCH"); fails += 1 }
        else println(s"case $k (${w}x$h): OK ${webp.length} bytes")
      }
      java.nio.file.Files.write(new java.io.File(dir, s"case$k.webp").toPath, webp)
      java.nio.file.Files.write(new java.io.File(dir, s"case$k.gray").toPath,
        gray.map(_.toByte))
    }
    println(if (fails == 0) "WRITER ROUND-TRIP OK" else s"$fails FAILURES")
  }
}
