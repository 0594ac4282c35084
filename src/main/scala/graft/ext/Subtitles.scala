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

  /** TTML time expression \u2192 milliseconds, or -1. Subset: clock-time
    * `hh:mm:ss(.fraction)` and offset-time `N(.N)(s|ms)` \u2014 the IMSC1
    * text-profile forms; frame-based `hh:mm:ss:ff` is out of subset.
    */
  private def ttmlTs(s: String): Long = {
    val t = s.trim
    if (t.isEmpty) return -1
    try {
      if (t.endsWith("ms")) {
        val v = t.dropRight(2).toDouble
        if (v < 0) -1 else math.round(v)
      } else if (t.endsWith("s")) {
        val v = t.dropRight(1).toDouble
        if (v < 0) -1 else math.round(v * 1000)
      } else {
        val parts = t.split(":")
        if (parts.length != 3) return -1
        val h = parts(0).toLong
        val m = parts(1).toLong
        val sec = parts(2).toDouble
        if (h < 0 || m < 0 || m > 59 || sec < 0 || sec >= 60) return -1
        (h * 60 + m) * 60000 + math.round(sec * 1000)
      }
    } catch { case _: NumberFormatException => -1 }
  }

  /** Attribute value out of a tag's attribute run (both quote
    * styles), or null.
    */
  private def attrValue(attrs: String, name: String): String = {
    var from = 0
    while (from < attrs.length) {
      val at = attrs.indexOf(name, from)
      if (at < 0) return null
      // must be a whole attribute name (preceded by whitespace)
      val pre = at == 0 || Character.isWhitespace(attrs.charAt(at - 1))
      var p = at + name.length
      while (p < attrs.length && Character.isWhitespace(attrs.charAt(p))) p += 1
      if (pre && p < attrs.length && attrs.charAt(p) == '=') {
        p += 1
        while (p < attrs.length && Character.isWhitespace(attrs.charAt(p))) p += 1
        if (p < attrs.length && (attrs.charAt(p) == '"' || attrs.charAt(p) == '\'')) {
          val q = attrs.charAt(p)
          val close = attrs.indexOf(q, p + 1)
          if (close > p) return attrs.substring(p + 1, close)
        }
        return null
      }
      from = at + name.length
    }
    null
  }

  /** Parse a TTML/IMSC1 document (the ISO 14496-30 `stpp` carriage
    * payload \u2014 what DASH/CMAF broadcast streams actually carry \u2014 and
    * standalone .ttml) to its cues, or null when the content is not
    * TTML. Restricted-but-conformant text-profile subset:
    * `<p begin=".." end="..">` cue paragraphs in document order,
    * `<br/>` as the line break, other inline tags (span/styling)
    * stripped, the same 6-entity decode as [[cuesOrNull]]; times in
    * clock or offset form ([[ttmlTs]]). Cue-less documents yield an
    * EMPTY array (valid TTML, no text), non-TTML yields null.
    */
  def ttmlCuesOrNull(doc: String): Array[Cue] = {
    try {
      if (doc == null) return null
      val content =
        if (doc.nonEmpty && doc.charAt(0) == '\uFEFF') doc.substring(1) else doc
      // signature: a <tt \u2026> root in the TTML namespace
      val ttAt = content.indexOf("<tt")
      if (ttAt < 0 || !content.contains("http://www.w3.org/ns/ttml"))
        return null
      val out = new scala.collection.mutable.ArrayBuffer[Cue]()
      var i = ttAt
      while (i < content.length && out.length < MaxCues) {
        val p = content.indexOf("<p", i)
        if (p < 0) i = content.length
        else {
          val after = if (p + 2 < content.length) content.charAt(p + 2) else ' '
          val tagEnd = content.indexOf('>', p)
          if (tagEnd < 0) i = content.length
          else if (after != ' ' && after != '\t' && after != '\n' &&
            after != '\r' && after != '>' && after != '/') i = p + 2
          else {
            val attrs = content.substring(p + 2, tagEnd)
            val close = content.indexOf("</p>", tagEnd)
            if (close < 0) i = content.length
            else {
              val begin = ttmlTs(Option(attrValue(attrs, "begin")).getOrElse(""))
              val end = ttmlTs(Option(attrValue(attrs, "end")).getOrElse(""))
              val raw = content.substring(tagEnd + 1, close)
                .replace("<br/>", "\n").replace("<br />", "\n")
              val text = cleanText(raw)
              // a malformed cue is SKIPPED, the cuesOrNull contract
              if (begin >= 0 && end >= begin && text.nonEmpty)
                out += Cue(begin, end, text)
              i = close + 4
            }
          }
        }
      }
      out.toArray
    } catch {
      case NonFatal(_) => null
    }
  }

  /** ASS/SSA timestamp `H:MM:SS.CC` (centiseconds) → ms, or -1. */
  private def assTs(s: String): Long = {
    val t = s.trim
    val parts = t.split(":")
    if (parts.length != 3) return -1
    val secParts = parts(2).split("\\.")
    if (secParts.length != 2 || secParts(1).length != 2) return -1
    try {
      val h = parts(0).toLong
      val m = parts(1).toLong
      val sec = secParts(0).toLong
      val cs = secParts(1).toLong
      if (h < 0 || m < 0 || m > 59 || sec < 0 || sec > 59 || cs < 0) return -1
      ((h * 60 + m) * 60 + sec) * 1000 + cs * 10
    } catch { case _: NumberFormatException => -1 }
  }

  /** ASS/SSA dialogue text → plain cue text: `{\…}` override blocks
    * stripped, `\N`/`\n` hard/soft breaks, `\h` hard spaces — shared
    * by the standalone parser here and the Matroska S_TEXT/ASS block
    * walk ([[Webm]]).
    */
  private[ext] def assClean(raw: String): String = {
    val sb = new StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '{') {
        val close = raw.indexOf('}', i)
        i = if (close < 0) raw.length else close + 1
      } else if (c == '\\' && i + 1 < raw.length) {
        raw.charAt(i + 1) match {
          case 'N' | 'n' => sb.append('\n')
          case 'h' => sb.append(' ')
          case other => sb.append('\\').append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse a STANDALONE ASS/SSA document ([Script Info] sections,
    * `Dialogue:` event lines in the standard field order — Layer,
    * Start, End, Style, Name, 3 margins, Effect, Text with text
    * after the 9th comma) to its cues, or null when the content is
    * not ASS. Same tolerant contract as the other parsers: a
    * malformed Dialogue line skips, only non-ASS content nulls.
    */
  def assCuesOrNull(doc: String): Array[Cue] = {
    try {
      if (doc == null) return null
      val content =
        if (doc.nonEmpty && doc.charAt(0) == '\uFEFF') doc.substring(1) else doc
      if (!content.contains("[Script Info]")) return null
      val out = new scala.collection.mutable.ArrayBuffer[Cue]()
      content.split("\r\n|\n|\r", -1).foreach { line =>
        val t = line.trim
        if (t.startsWith("Dialogue:") && out.length < MaxCues) {
          val fields = t.substring("Dialogue:".length).split(",", 10)
          if (fields.length == 10) {
            val start = assTs(fields(1))
            val end = assTs(fields(2))
            val text = assClean(fields(9))
            if (start >= 0 && end >= start && text.nonEmpty)
              out += Cue(start, end, text)
          }
        }
      }
      out.toArray // a Dialogue-less ASS doc is valid: empty, not null
    } catch {
      case NonFatal(_) => null
    }
  }

  /** Parse a WebVTT, SRT, TTML, or ASS/SSA document to its cues, or
    * null when the content is none of them. Never throws.
    */
  def cuesOrNull(doc: String): Array[Cue] = {
    try {
      if (doc == null) return null
      // the WebVTT spec allows an optional leading U+FEFF BOM before
      // the signature; strip it (the robots.txt convention) so
      // BOM-retaining decodes still parse
      val content =
        if (doc.nonEmpty && doc.charAt(0) == '\uFEFF') doc.substring(1) else doc
      // XML-shaped content routes to the TTML parser (VTT/SRT never
      // start with '<'); [Script Info] headers route to ASS/SSA
      val firstNonWs = content.indexWhere(!Character.isWhitespace(_))
      if (firstNonWs >= 0 && content.charAt(firstNonWs) == '<')
        return ttmlCuesOrNull(content)
      if (firstNonWs >= 0 && content.charAt(firstNonWs) == '[' &&
        content.startsWith("[Script Info]", firstNonWs))
        return assCuesOrNull(content)
      val lines = content.split("\r\n|\n|\r", -1)
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
