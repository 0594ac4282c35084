package graft.tools

/** dump encodeRaw streams for the brotlicffi cross-decode */
object BrotliRawCheck {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("/tmp/brotli_raw_check")
    dir.mkdirs()
    val rnd = new scala.util.Random(4)
    for (k <- 0 until 5) {
      val n = Seq(0, 3, 1000, 70000, 200000)(k)
      val raw = new Array[Byte](n)
      rnd.nextBytes(raw)
      val br = graft.ext.Brotli.encodeRaw(raw)
      val back = graft.ext.Brotli.decodeOrNull(br)
      println(s"case $k n=$n: self-decode " +
        (if (back != null && java.util.Arrays.equals(back, raw)) "OK" else "FAIL"))
      java.nio.file.Files.write(new java.io.File(dir, s"c$k.br").toPath, br)
      java.nio.file.Files.write(new java.io.File(dir, s"c$k.raw").toPath, raw)
    }
  }
}
