package graft.tools

/** quick golden-fixture check for the VP8L decoder (WebpSpec runs the
  * same comparison as a permanent test)
  */
object WebpGoldenCheck {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("data/webp_golden")
    val idx = scala.io.Source.fromFile(new java.io.File(dir, "index.txt"))
      .getLines().filter(_.nonEmpty).toSeq
    var fails = 0
    idx.foreach { line =>
      val Array(name, ws, hs) = line.split(",")
      val w = ws.toInt; val h = hs.toInt
      val webp = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, name + ".webp").toPath)
      val argbBytes = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, name + ".argb").toPath)
      val expect = new Array[Int](w * h)
      var i = 0
      while (i < expect.length) {
        expect(i) = ((argbBytes(4 * i) & 0xFF) << 24) |
          ((argbBytes(4 * i + 1) & 0xFF) << 16) |
          ((argbBytes(4 * i + 2) & 0xFF) << 8) | (argbBytes(4 * i + 3) & 0xFF)
        i += 1
      }
            val d = graft.ext.WebpVp8l.decodeArgbOrNull(webp)
      if (d == null) { println(s"$name: DECODE NULL"); fails += 1 }
      else {
        val (got, gw, gh) = d
        if (gw != w || gh != h) { println(s"$name: dims $gw x $gh vs $w x $h"); fails += 1 }
        else {
          val bad = got.indices.find(i => got(i) != expect(i))
          bad match {
            case Some(i) =>
              println(f"$name: first mismatch at px $i (${i % w},${i / w}): " +
                f"got ${got(i)}%08x expect ${expect(i)}%08x")
              fails += 1
            case None => println(s"$name: OK (${w}x$h)")
          }
        }
      }
    }
    println(if (fails == 0) "ALL OK" else s"$fails FAILURES")
  }
}
