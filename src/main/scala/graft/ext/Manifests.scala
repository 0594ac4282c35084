package graft.ext

import scala.util.control.NonFatal

/** Streaming-manifest parsing — HLS playlists (RFC 8216) and DASH
  * MPDs (ISO 23009-1): crawls capture manifests alongside the CMAF
  * segments the engine already reads, and extracting (representation,
  * codec, bandwidth, segment URIs) links those assets into per-title
  * groups for dedup (round-13 verdict item 5). Pure text/XML — no
  * media work; malformed input nulls, never throws.
  *
  *  - [[hlsVariantsOrNull]]: master-playlist `#EXT-X-STREAM-INF`
  *    entries → (bandwidth, width, height, codecs, uri); the
  *    attribute list honors quoted values (CODECS carries commas)
  *  - [[hlsSegmentsOrNull]]: media-playlist `#EXTINF` entries →
  *    (seq, duration, uri) with the `#EXT-X-MEDIA-SEQUENCE` origin
  *  - [[mpdRepresentationsOrNull]]: `Period > AdaptationSet >
  *    Representation` → (period, rep id, mime, codecs, bandwidth,
  *    width, height, media template) with the DASH inheritance rule
  *    (Representation attributes override the AdaptationSet's;
  *    SegmentTemplate@media inherits)
  */
object Manifests {

  final case class HlsVariant(bandwidth: Long, width: Int, height: Int,
                              codecs: String, uri: String)
  final case class HlsSegment(seq: Long, duration: Double, uri: String)
  final case class MpdRep(period: Int, id: String, mime: String,
                          codecs: String, bandwidth: Long,
                          width: Int, height: Int, media: String)

  /** parse an HLS attribute list (KEY=VALUE, commas inside quoted
    * values preserved)
    */
  private def attrList(s: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    val n = s.length
    while (i < n) {
      val eq = s.indexOf('=', i)
      if (eq < 0) return out.result()
      val key = s.substring(i, eq).trim
      var j = eq + 1
      var value: String = null
      if (j < n && s.charAt(j) == '"') {
        val close = s.indexOf('"', j + 1)
        if (close < 0) return out.result()
        value = s.substring(j + 1, close)
        j = close + 1
        if (j < n && s.charAt(j) == ',') j += 1
      } else {
        val comma = s.indexOf(',', j)
        val end = if (comma < 0) n else comma
        value = s.substring(j, end).trim
        j = if (comma < 0) n else comma + 1
      }
      if (key.nonEmpty) out += key -> value
      i = j
    }
    out.result()
  }

  private def lines(text: String): Array[String] =
    text.split("\r?\n", -1)

  def hlsVariantsOrNull(text: String): Array[HlsVariant] = {
    try {
      if (text == null) return null
      val ls = lines(text)
      if (ls.isEmpty || !ls(0).trim.startsWith("#EXTM3U")) return null
      val out = new scala.collection.mutable.ArrayBuffer[HlsVariant]()
      var i = 0
      while (i < ls.length) {
        val l = ls(i).trim
        if (l.startsWith("#EXT-X-STREAM-INF:")) {
          val attrs = attrList(l.substring("#EXT-X-STREAM-INF:".length))
          // the next non-blank, non-comment line is the variant URI
          var j = i + 1
          while (j < ls.length &&
                 (ls(j).trim.isEmpty || ls(j).trim.startsWith("#"))) j += 1
          if (j < ls.length) {
            val bw = attrs.get("BANDWIDTH").flatMap(_.toLongOption).getOrElse(-1L)
            val (w, h) = attrs.get("RESOLUTION") match {
              case Some(r) =>
                val x = r.indexOf('x')
                if (x > 0)
                  (r.substring(0, x).toIntOption.getOrElse(0),
                    r.substring(x + 1).toIntOption.getOrElse(0))
                else (0, 0)
              case None => (0, 0)
            }
            out += HlsVariant(bw, w, h, attrs.getOrElse("CODECS", ""),
              ls(j).trim)
            i = j
          }
        }
        i += 1
      }
      if (out.isEmpty) null else out.toArray
    } catch { case NonFatal(_) => null }
  }

  def hlsSegmentsOrNull(text: String): Array[HlsSegment] = {
    try {
      if (text == null) return null
      val ls = lines(text)
      if (ls.isEmpty || !ls(0).trim.startsWith("#EXTM3U")) return null
      var seq = 0L
      val out = new scala.collection.mutable.ArrayBuffer[HlsSegment]()
      var i = 0
      while (i < ls.length) {
        val l = ls(i).trim
        if (l.startsWith("#EXT-X-MEDIA-SEQUENCE:"))
          // a running counter, reset whenever the tag appears (even
          // mid-playlist, nonconformant but seen in the wild) and
          // advanced per emitted segment — deriving from out.length
          // would silently shift earlier segments on a late tag
          seq = l.substring("#EXT-X-MEDIA-SEQUENCE:".length).trim
            .toLongOption.getOrElse(0L)
        else if (l.startsWith("#EXTINF:")) {
          val body = l.substring("#EXTINF:".length)
          val comma = body.indexOf(',')
          val dur = (if (comma < 0) body else body.substring(0, comma))
            .trim.toDoubleOption.getOrElse(-1.0)
          var j = i + 1
          while (j < ls.length &&
                 (ls(j).trim.isEmpty || ls(j).trim.startsWith("#"))) j += 1
          if (j < ls.length) {
            out += HlsSegment(seq, dur, ls(j).trim)
            seq += 1
            i = j
          }
        }
        i += 1
      }
      if (out.isEmpty) null else out.toArray
    } catch { case NonFatal(_) => null }
  }

  // ------------------------------- DASH MPD (a bounded tag scanner)

  /** index of the tag-closing '>' at/after `from`, skipping quoted
    * attribute spans — a literal '>' inside a quoted value is legal
    * XML and must not truncate the tag (mirrors parseTag's quote
    * handling). -1 when unterminated.
    */
  private def tagEnd(xml: String, from: Int): Int = {
    var i = from
    val n = xml.length
    var quote: Char = 0
    while (i < n) {
      val c = xml.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i
      i += 1
    }
    -1
  }

  /** (name without ns prefix, attrs, selfClosing, isClosing) */
  private def parseTag(s: String): (String, Map[String, String], Boolean, Boolean) = {
    var i = 0
    val n = s.length
    val closing = n > 0 && s.charAt(0) == '/'
    if (closing) i = 1
    val nameStart = i
    while (i < n && !Character.isWhitespace(s.charAt(i)) && s.charAt(i) != '/')
      i += 1
    var name = s.substring(nameStart, i)
    val colon = name.indexOf(':')
    if (colon >= 0) name = name.substring(colon + 1)
    val attrs = Map.newBuilder[String, String]
    while (i < n) {
      while (i < n && (Character.isWhitespace(s.charAt(i)))) i += 1
      if (i >= n || s.charAt(i) == '/') i = n
      else {
        val eq = s.indexOf('=', i)
        if (eq < 0) i = n
        else {
          val key = s.substring(i, eq).trim
          var j = eq + 1
          while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
          if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
            val q = s.charAt(j)
            val close = s.indexOf(q, j + 1)
            if (close < 0) i = n
            else {
              attrs += key -> s.substring(j + 1, close)
              i = close + 1
            }
          } else i = n
        }
      }
    }
    val selfClosing = n > 0 && s.charAt(n - 1) == '/'
    (name, attrs.result(), selfClosing, closing)
  }

  def mpdRepresentationsOrNull(xml: String): Array[MpdRep] = {
    try {
      if (xml == null || !xml.contains("<MPD")) return null
      val out = new scala.collection.mutable.ArrayBuffer[MpdRep]()
      var period = -1
      var asAttrs = Map.empty[String, String]
      var asMedia = ""
      var inRep = false
      var repAttrs = Map.empty[String, String]
      var repMedia = ""
      def emit(): Unit = {
        def a(k: String): String =
          repAttrs.getOrElse(k, asAttrs.getOrElse(k, ""))
        val media = if (repMedia.nonEmpty) repMedia else asMedia
        out += MpdRep(period, repAttrs.getOrElse("id", ""),
          a("mimeType"), a("codecs"),
          repAttrs.get("bandwidth").flatMap(_.toLongOption).getOrElse(-1L),
          a("width").toIntOption.getOrElse(0),
          a("height").toIntOption.getOrElse(0), media)
      }
      var i = 0
      val n = xml.length
      var guard = 0
      while (i < n && guard < 100000) {
        guard += 1
        val lt = xml.indexOf('<', i)
        if (lt < 0) i = n
        else if (xml.startsWith("<!--", lt)) {
          val e = xml.indexOf("-->", lt)
          i = if (e < 0) n else e + 3
        } else if (lt + 1 < n && (xml.charAt(lt + 1) == '?' || xml.charAt(lt + 1) == '!')) {
          val gt = tagEnd(xml, lt)
          i = if (gt < 0) n else gt + 1
        } else {
          val gt = tagEnd(xml, lt)
          if (gt < 0) i = n
          else {
            val (name, attrs, selfClose, closing) =
              parseTag(xml.substring(lt + 1, gt))
            name match {
              case "Period" if !closing => period += 1
              case "AdaptationSet" if !closing =>
                asAttrs = attrs; asMedia = ""
              case "AdaptationSet" => asAttrs = Map.empty; asMedia = ""
              case "Representation" if !closing =>
                repAttrs = attrs; repMedia = ""
                if (selfClose) { inRep = false; emit() } else inRep = true
              case "Representation" =>
                if (inRep) { inRep = false; emit() }
              case "SegmentTemplate" =>
                if (!closing) attrs.get("media").foreach { m =>
                  if (inRep) repMedia = m else asMedia = m
                }
              case _ => ()
            }
            i = gt + 1
          }
        }
      }
      if (out.isEmpty) null else out.toArray
    } catch { case NonFatal(_) => null }
  }
}
