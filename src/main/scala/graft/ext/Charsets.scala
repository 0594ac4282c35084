package graft.ext

/** Charset sniffing + decoding for crawl payloads — the step between
  * [[graft.io.Warc]]'s raw response bytes and the text layer
  * (`html_text`, `text_profile`, the curation chain). Real crawl
  * payloads are a mix of UTF-8, legacy windows-1252, and the
  * occasional BOM'd UTF-16; feeding them all through a blind UTF-8
  * decode silently corrupts every high byte of the legacy half.
  *
  * Detection order (the conservative subset of WHATWG encoding
  * sniffing a BYTES-ONLY kernel can honor — no <meta> prescan here;
  * [[graft.fn.HtmlExpressions]] operates on already-decoded text):
  *   1. BOM wins: EF BB BF → UTF-8, FF FE → UTF-16LE, FE FF →
  *      UTF-16BE (BOM stripped; malformed tails decode to U+FFFD,
  *      matching the JDK's replacement behavior).
  *   2. STRICT UTF-8 validation (overlongs, lone/paired surrogates,
  *      > U+10FFFF, truncated sequences all rejected) → "utf-8".
  *   3. Fallback: windows-1252 via the WHATWG index (the web's
  *      historical default; the 0x80–0x9F row is the published
  *      table, undefined cells passing through as their C1 code
  *      points per the same index).
  *
  * Everything is a hand-compiled linear scan (the html_text/pii_scan
  * discipline); CharsetSpec pins each path against the JDK's OWN
  * decoders (windows-1252, UTF-16LE/BE, UTF-8 with REPLACE) as the
  * independent in-environment validator.
  */
object Charsets {

  /** WHATWG windows-1252 mappings for 0x80–0x9F (0x81/0x8D/0x8F/
    * 0x90/0x9D map to their C1 code points). Bytes < 0x80 and
    * >= 0xA0 are identity (Latin-1 range).
    */
  private val W1252High: Array[Char] = Array(
    '\u20AC', '\u0081', '\u201A', '\u0192', '\u201E', '\u2026', '\u2020',
    '\u2021', '\u02C6', '\u2030', '\u0160', '\u2039', '\u0152', '\u008D',
    '\u017D', '\u008F', '\u0090', '\u2018', '\u2019', '\u201C', '\u201D',
    '\u2022', '\u2013', '\u2014', '\u02DC', '\u2122', '\u0161', '\u203A',
    '\u0153', '\u009D', '\u017E', '\u0178')

  final case class Decoded(charset: String, text: String)

  /** Strict UTF-8 validity: RFC 3629 — no overlongs, no surrogates,
    * no code points past U+10FFFF, no truncated tails.
    */
  def isValidUtf8(b: Array[Byte], from: Int): Boolean = {
    var i = from
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else if (c < 0xC2) return false // continuation or overlong lead
      else if (c < 0xE0) { // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xC0) != 0x80) return false
        i += 2
      } else if (c < 0xF0) { // 3-byte
        if (i + 2 >= n || (b(i + 1) & 0xC0) != 0x80 ||
          (b(i + 2) & 0xC0) != 0x80) return false
        val cp = ((c & 0xF) << 12) | ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
        if (cp < 0x800 || (cp >= 0xD800 && cp <= 0xDFFF)) return false
        i += 3
      } else if (c < 0xF5) { // 4-byte
        if (i + 3 >= n || (b(i + 1) & 0xC0) != 0x80 ||
          (b(i + 2) & 0xC0) != 0x80 || (b(i + 3) & 0xC0) != 0x80) return false
        val cp = ((c & 0x7) << 18) | ((b(i + 1) & 0x3F) << 12) |
          ((b(i + 2) & 0x3F) << 6) | (b(i + 3) & 0x3F)
        if (cp < 0x10000 || cp > 0x10FFFF) return false
        i += 4
      } else return false
    }
    true
  }

  /** UTF-8 decode with U+FFFD replacement (only reachable on the
    * BOM'd path — the sniffed path is pre-validated). Replacement
    * granularity matches the JDK: one U+FFFD per rejected lead and
    * per orphaned continuation byte.
    */
  private def decodeUtf8Replace(b: Array[Byte], from: Int): String =
    new String(b, from, b.length - from, java.nio.charset.StandardCharsets.UTF_8)

  private def decodeW1252(b: Array[Byte], from: Int): String = {
    val out = new Array[Char](b.length - from)
    var i = from
    while (i < b.length) {
      val c = b(i) & 0xFF
      out(i - from) =
        if (c >= 0x80 && c < 0xA0) W1252High(c - 0x80) else c.toChar
      i += 1
    }
    new String(out)
  }

  /** UTF-16 decode (hand scan): surrogate pairs kept; malformation
    * follows the JDK's replacement granularity — the independent
    * validator available in this environment — asserted byte-for-byte
    * in CharsetSpec: a high surrogate followed by a non-low unit
    * consumes BOTH units as one U+FFFD (WHATWG would re-process the
    * second unit — the documented trade for a checkable contract), a
    * lone low surrogate is one U+FFFD, and a trailing incomplete unit
    * is one U+FFFD.
    */
  private def decodeUtf16(b: Array[Byte], from: Int, bigEndian: Boolean): String = {
    val sb = new java.lang.StringBuilder((b.length - from) / 2 + 1)
    var i = from
    while (i + 1 < b.length) {
      val u =
        if (bigEndian) ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
        else ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)
      if (u >= 0xD800 && u < 0xDC00) { // high surrogate
        if (i + 3 < b.length) {
          val v =
            if (bigEndian) ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
            else ((b(i + 3) & 0xFF) << 8) | (b(i + 2) & 0xFF)
          if (v >= 0xDC00 && v < 0xE000) sb.append(u.toChar).append(v.toChar)
          else sb.append('\uFFFD') // both units consumed, one FFFD
          i += 4
        } else { sb.append('\uFFFD'); i = b.length } // incomplete tail: one FFFD for the rest (JDK underflow granularity)
      } else if (u >= 0xDC00 && u < 0xE000) { // lone low surrogate
        sb.append('\uFFFD'); i += 2
      } else { sb.append(u.toChar); i += 2 }
    }
    if (i < b.length) sb.append('\uFFFD') // trailing incomplete unit
    sb.toString
  }

  /** The UTF-16 / 1252 scanners shared with [[CharsetFamilies]]'s
    * labeled-decode dispatch (same kernels, same JDK-parity
    * contract).
    */
  private[ext] def decodeUtf16For(b: Array[Byte], from: Int, bigEndian: Boolean): String =
    decodeUtf16(b, from, bigEndian)
  private[ext] def decodeW1252For(b: Array[Byte], from: Int): String =
    decodeW1252(b, from)

  /** Sniff + decode. Null only for null input; empty bytes are an
    * empty UTF-8 text.
    */
  def decodeOrNull(b: Array[Byte]): Decoded = {
    if (b == null) return null
    if (b.length >= 3 && (b(0) & 0xFF) == 0xEF && (b(1) & 0xFF) == 0xBB &&
      (b(2) & 0xFF) == 0xBF)
      return Decoded("utf-8", decodeUtf8Replace(b, 3))
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xFE)
      return Decoded("utf-16le", decodeUtf16(b, 2, bigEndian = false))
    if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF)
      return Decoded("utf-16be", decodeUtf16(b, 2, bigEndian = true))
    if (isValidUtf8(b, 0)) Decoded("utf-8", decodeUtf8Replace(b, 0))
    else Decoded("windows-1252", decodeW1252(b, 0))
  }
}
