package graft.tools

/** single-thread pdf synth+extract micro (BENCH_NOTES r12 evidence). */
object PdfMicro {
  def main(args: Array[String]): Unit = {
    // warm
    (0L until 20000L).foreach { i => graft.ext.Pdf.textOrNull(graft.ext.PdfFixtures.pdf(i)) }
    val t0 = System.nanoTime()
    var chars = 0L
    (0L until 100000L).foreach { i =>
      val d = graft.ext.Pdf.textOrNull(graft.ext.PdfFixtures.pdf(i))
      chars += d.text.length
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"single-thread 100k synth+extract: $dt%.2f s (${100000 / dt}%.0f docs/s/core), chars=$chars")
  }
}
