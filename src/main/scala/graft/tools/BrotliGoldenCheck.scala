package graft.tools

/** golden check for the brotli decoder (BrotliSpec runs the same
  * comparison as a permanent test)
  */
object BrotliGoldenCheck {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("data/brotli_golden")
    val idx = scala.io.Source.fromFile(new java.io.File(dir, "index.txt"))
      .getLines().filter(_.nonEmpty).toSeq
    var fails = 0
    idx.foreach { name =>
      val br = java.nio.file.Files.readAllBytes(new java.io.File(dir, name + ".br").toPath)
      val raw = java.nio.file.Files.readAllBytes(new java.io.File(dir, name + ".raw").toPath)
      val got = try graft.ext.Brotli.decodeOrThrow(br) catch {
        case e: Throwable =>
          println(s"$name: THROW ${e.getMessage}")
          e.getStackTrace.take(4).foreach(t => println(s"   at $t"))
          fails += 1; null
      }
      if (got == null) { if (false) () }
      else if (!java.util.Arrays.equals(got, raw)) {
        val n = math.min(got.length, raw.length)
        val bad = (0 until n).find(i => got(i) != raw(i))
        println(s"$name: MISMATCH len ${got.length}/${raw.length} first diff $bad")
        fails += 1
      } else println(s"$name: OK (${raw.length} bytes)")
    }
    println(if (fails == 0) "ALL OK" else s"$fails FAILURES")
  }
}
