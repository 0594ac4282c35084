package graft.ext

/** Deterministic subtitle corpus for q160 (the PdfFixtures pattern):
  * id arithmetic decides the FORMAT (every third doc SRT, the rest
  * WebVTT with a NOTE block, optional cue ids, and settings) and
  * every cue's timing/text; the oracle SQL replays the same
  * arithmetic without parsing anything.
  */
object SubtitleFixtures {

  def nCues(id: Long): Int = (2 + id % 4).toInt

  def startMs(id: Long, k: Int): Long = id % 500 + 2000L * k
  def endMs(id: Long, k: Int): Long = startMs(id, k) + 1500

  private def fmt(ms: Long, comma: Boolean): String = {
    val h = ms / 3600000
    val m = (ms / 60000) % 60
    val s = (ms / 1000) % 60
    val f = ms % 1000
    f"$h%02d:$m%02d:$s%02d${if (comma) "," else "."}$f%03d"
  }

  /** Raw (pre-strip) cue payload — tags on odd cues, the 6-entity
    * form on multiples of 3, a two-line body on cue 2, plain
    * otherwise. Precedence: odd > two-line > entity > plain.
    */
  def rawText(id: Long, k: Int): String = {
    val w = (id + k) % 7
    if (k % 2 == 1) s"<v Speaker>cue $k says word$w</v>"
    else if (k == 2) s"cue $k says word$w\nline two"
    else if (k % 3 == 0) s"cue $k says word$w &amp; more"
    else s"cue $k says word$w"
  }

  /** What [[Subtitles.cuesOrNull]] must extract. */
  def expectedText(id: Long, k: Int): String = {
    val w = (id + k) % 7
    if (k % 2 == 1) s"cue $k says word$w"
    else if (k == 2) s"cue $k says word$w\nline two"
    else if (k % 3 == 0) s"cue $k says word$w & more"
    else s"cue $k says word$w"
  }

  def doc(id: Long): String = {
    val n = nCues(id)
    val sb = new StringBuilder
    if (id % 3 == 0) {
      var k = 0
      while (k < n) {
        sb.append(k + 1).append('\n')
        sb.append(fmt(startMs(id, k), comma = true)).append(" --> ")
          .append(fmt(endMs(id, k), comma = true)).append('\n')
        sb.append(rawText(id, k)).append("\n\n")
        k += 1
      }
    } else {
      sb.append("WEBVTT synthetic\n\n")
      sb.append("NOTE corpus fixture\nsecond comment line\n\n")
      var k = 0
      while (k < n) {
        if (k % 2 == 0) sb.append("c").append(k).append('\n') // cue id line
        sb.append(fmt(startMs(id, k), comma = false)).append(" --> ")
          .append(fmt(endMs(id, k), comma = false))
        if (k % 2 == 1) sb.append(" align:start position:10%")
        sb.append('\n')
        sb.append(rawText(id, k)).append("\n\n")
        k += 1
      }
    }
    sb.toString
  }
}
