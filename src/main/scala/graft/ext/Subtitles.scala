package graft.ext

import scala.util.control.NonFatal

/** Subtitle-track extraction — WebVTT (the W3C caption format the
  * web serves) and SRT (the de-facto interchange format): the path
  * by which video corpora become TRAINING TEXT. Cues parse to
  * (start_ms, end_ms, text) rows that feed the same text_profile /
  * language-ID / dedup gates as any other document.
  *
  * Supported subset (documented, tolerant — a malformed CUE is
  * skipped, only non-subtitle content nulls):
  *  - WebVTT: the `WEBVTT` signature line (with optional trailing
  *    header text), NOTE/STYLE/REGION blocks skipped to their blank
  *    line, optional cue identifier lines, timing lines
  *    `[hh:]mm:ss.mmm --> [hh:]mm:ss.mmm [settings…]` (settings
  *    ignored), multi-line cue payloads joined with '\n'
  *  - SRT: numeric-index blocks with `hh:mm:ss,mmm` comma-decimal
  *    timings — detected when the first block starts with an integer
  *    line followed by a `-->` line
  *  - cue text: inline tags (`<v Speaker>`, `<i>`, `<c.class>`,
  *    timestamps `<00:00:01.000>`, closers) are STRIPPED; the
  *    6-entity subset (`&amp; &lt; &gt; &quot; &apos; &nbsp;`,
  *    amp decoded last — the q131 html_text convention) is decoded
  *  - out of subset (rejected by structure, never misparsed):
  *    anything without the VTT signature or the SRT block shape
  */
object Subtitles {

  /** One parsed cue. */
  final case class Cue(startMs: Long, endMs: Long, text: String)

  private val MaxCues = 1 << 16

  /** `[hh:]mm:ss(.|,)mmm` → milliseconds, or -1. */
  private def ts(s: String): Long = {
    val t = s.trim
    val parts = t.split(":")
    if (parts.length < 2 || parts.length > 3) return -1
    val secIdx = parts.length - 1
    val secParts = parts(secIdx).split("[.,]")
    if (secParts.length != 2) return -1
    try {
      val h = if (parts.length == 3) parts(0).toLong else 0L
      val m = parts(secIdx - 1).toLong
      val sec = secParts(0).toLong
      val ms = secParts(1).toLong
      if (h < 0 || m < 0 || m > 59 || sec < 0 || sec > 59 ||
        ms < 0 || ms > 999 || secParts(1).length != 3) return -1
      ((h * 60 + m) * 60 + sec) * 1000 + ms
    } catch { case _: NumberFormatException => -1 }
  }

  /** Strip inline tags, decode the 6-entity subset (amp LAST so
    * `&amp;lt;` decodes to the literal `&lt;` — the html_text rule).
    */
  private[ext] def cleanText(raw: String): String = {
    val sb = new StringBuilder(raw.length)
    var i = 0
    var inTag = false
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (inTag) { if (c == '>') inTag = false }
      else if (c == '<') inTag = true
      else sb.append(c)
      i += 1
    }
    sb.toString
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&nbsp;", " ")
      .replace("&amp;", "&")
  }

  /** Parse a WebVTT or SRT document to its cues, or null when the
    * content is neither. Never throws.
    */
  def cuesOrNull(doc: String): Array[Cue] = {
    try {
      if (doc == null) return null
      val lines = doc.split("\r\n|\n|\r", -1)
      var i = 0
      val isVtt = lines.nonEmpty && lines(0).startsWith("WEBVTT")
      if (isVtt) i = 1
      else {
        // SRT shape: integer index line, then a --> line
        def firstNonEmpty(from: Int): Int = {
          var k = from
          while (k < lines.length && lines(k).trim.isEmpty) k += 1
          k
        }
        val a = firstNonEmpty(0)
        if (a >= lines.length || !lines(a).trim.matches("\\d+")) return null
        if (a + 1 >= lines.length || !lines(a + 1).contains("-->")) return null
      }
      val out = new scala.collection.mutable.ArrayBuffer[Cue]()
      while (i < lines.length && out.length < MaxCues) {
        // skip blank separators
        while (i < lines.length && lines(i).trim.isEmpty) i += 1
        if (i < lines.length) {
          val head = lines(i).trim
          if (isVtt && (head.startsWith("NOTE") || head == "STYLE" ||
              head.startsWith("REGION"))) {
            // comment/style/region block: runs to its blank line
            while (i < lines.length && lines(i).trim.nonEmpty) i += 1
          } else {
            // optional identifier line before the timing line
            var timing = head
            if (!timing.contains("-->")) {
              i += 1
              if (i < lines.length) timing = lines(i).trim else timing = ""
            }
            if (timing.contains("-->")) {
              val arrow = timing.indexOf("-->")
              val start = ts(timing.substring(0, arrow))
              // settings after the end stamp are whitespace-separated
              val endField = timing.substring(arrow + 3).trim
                .split("\\s+").headOption.getOrElse("")
              val end = ts(endField)
              i += 1
              val body = new scala.collection.mutable.ArrayBuffer[String]()
              while (i < lines.length && lines(i).trim.nonEmpty) {
                body += lines(i)
                i += 1
              }
              if (start >= 0 && end >= start && body.nonEmpty)
                out += Cue(start, end, cleanText(body.mkString("\n")))
              // a malformed cue (bad stamps / empty body) is SKIPPED
            } else {
              // stray non-cue line: consume its block
              while (i < lines.length && lines(i).trim.nonEmpty) i += 1
            }
          }
        }
      }
      if (out.isEmpty && !isVtt) null else out.toArray
    } catch {
      case NonFatal(_) => null
    }
  }
}
