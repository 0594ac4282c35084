package graft.ext

import java.util.zip.Inflater

/** Real PNG pixel decode, JDK-only (VERDICT r2 item 3) — replaces the
  * round-2 feature stub for PNG rows.
  *
  * Scope: the baseline still-image profile — bit depth 8, color types
  * 0 (gray) / 2 (RGB) / 3 (palette) / 4 (gray+alpha) / 6 (RGBA),
  * non-interlaced — decoded with `java.util.zip.Inflater` (IDAT is a
  * zlib stream; PNG's only compression method) and the five standard
  * scanline filters (None/Sub/Up/Average/Paeth) undone per row.
  * Unsupported profiles (16-bit, Adam7 interlace, sub-byte palette)
  * return None rather than wrong pixels.
  *
  * The kernel is called from the [[graft.fn.PngGrayFeatures]] native
  * expression — per-row imperative decode stays a static JVM method
  * inside the whole-stage codegen span, the same pattern as
  * VincentyKm/VecKernels (no ScalaUDF span break).
  */
object Png {

  private val Signature = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private[ext] def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
    ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  /** Inflate a complete zlib stream into exactly `out.length` bytes.
    * False on truncation, overrun, FDICT, or any zero-progress stall
    * (a bare needsInput check would loop forever on a crafted stream
    * with the preset-dictionary bit set).
    */
  private[ext] def inflateTo(data: Array[Byte], out: Array[Byte]): Boolean = {
    val inf = new Inflater()
    inf.setInput(data)
    var got = 0
    try {
      while (got < out.length && !inf.finished()) {
        val n = inf.inflate(out, got, out.length - got)
        if (n == 0) return false
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return false }
    finally inf.end()
    got == out.length
  }

  /** Undo the five standard scanline filters in place over `h` rows of
    * `1 + stride` bytes (filter tag + pixel bytes); false on an
    * unknown filter tag. Works for any sub-image region — APNG frames
    * reuse it with the frame's own geometry.
    */
  private[ext] def unfilterInPlace(raw: Array[Byte], h: Int, stride: Int,
                                   channels: Int): Boolean = {
    var y = 0
    while (y < h) {
      val rowOff = y * (1 + stride) + 1
      val filter = raw(rowOff - 1) & 0xFF
      var x = 0
      filter match {
        case 0 => () // None
        case 1 => // Sub
          x = channels
          while (x < stride) {
            raw(rowOff + x) = ((raw(rowOff + x) & 0xFF) + (raw(rowOff + x - channels) & 0xFF)).toByte
            x += 1
          }
        case 2 => // Up
          if (y > 0) {
            val prev = rowOff - (1 + stride)
            while (x < stride) {
              raw(rowOff + x) = ((raw(rowOff + x) & 0xFF) + (raw(prev + x) & 0xFF)).toByte
              x += 1
            }
          }
        case 3 => // Average
          val prev = rowOff - (1 + stride)
          while (x < stride) {
            val a = if (x >= channels) raw(rowOff + x - channels) & 0xFF else 0
            val b = if (y > 0) raw(prev + x) & 0xFF else 0
            raw(rowOff + x) = ((raw(rowOff + x) & 0xFF) + (a + b) / 2).toByte
            x += 1
          }
        case 4 => // Paeth
          val prev = rowOff - (1 + stride)
          while (x < stride) {
            val a = if (x >= channels) raw(rowOff + x - channels) & 0xFF else 0
            val b = if (y > 0) raw(prev + x) & 0xFF else 0
            val c = if (x >= channels && y > 0) raw(prev + x - channels) & 0xFF else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            raw(rowOff + x) = ((raw(rowOff + x) & 0xFF) + pred).toByte
            x += 1
          }
        case _ => return false
      }
      y += 1
    }
    true
  }

  /** [[grayStats]] streamed straight off an RGBA double canvas
    * (Rec.601 matted on black: lum·α/255) with NO intermediate gray
    * plane — the animated decoders call this per frame snapshot, so
    * a w×h gray array per frame would be the dominant allocation.
    */
  private[ext] def grayStatsFromRgbaCanvas(canvas: Array[Double], nPixels: Int,
                                           nBins: Int): Array[Double] = {
    var s = 0.0; var s2 = 0.0
    val hist = new Array[Double](nBins)
    var p = 0
    while (p < nPixels) {
      val o = p * 4
      val v = (0.299 * canvas(o) + 0.587 * canvas(o + 1) +
        0.114 * canvas(o + 2)) * (canvas(o + 3) / 255.0)
      s += v; s2 += v * v
      var b = (v * nBins / 256.0).toInt
      if (b >= nBins) b = nBins - 1
      hist(b) += 1.0
      p += 1
    }
    val mean = s / nPixels
    val variance = math.max(0.0, s2 / nPixels - mean * mean)
    val out = new Array[Double](2 + nBins)
    out(0) = mean / 255.0
    out(1) = math.sqrt(variance) / 255.0
    var i = 0
    while (i < nBins) { out(i + 2) = hist(i) / nPixels; i += 1 }
    out
  }

  /** [mean/255, std/255, nBins normalized histogram] over a luminance
    * plane in [0, 255] — shared by still ([[grayFeaturesOrNull]]) and
    * animated ([[Apng]]) feature extraction.
    */
  private[ext] def grayStats(g: Array[Double], nBins: Int): Array[Double] = {
    val n = g.length
    var s = 0.0; var s2 = 0.0
    val hist = new Array[Double](nBins)
    var i = 0
    while (i < n) {
      val v = g(i)
      s += v; s2 += v * v
      // 256 levels → nBins equal buckets; 255 lands in the last
      var b = (v * nBins / 256.0).toInt
      if (b >= nBins) b = nBins - 1
      hist(b) += 1.0
      i += 1
    }
    val mean = s / n
    val variance = math.max(0.0, s2 / n - mean * mean)
    val out = new Array[Double](2 + nBins)
    out(0) = mean / 255.0
    out(1) = math.sqrt(variance) / 255.0
    i = 0
    while (i < nBins) { out(i + 2) = hist(i) / n; i += 1 }
    out
  }

  /** Decoded luminance plane: Rec.601 gray (0.299R + 0.587G + 0.114B)
    * per pixel, row-major doubles in [0, 255]. None for non-PNG bytes
    * or an unsupported profile.
    */
  def decodeGray(bytes: Array[Byte]): Option[Array[Double]] = {
    if (bytes == null || bytes.length < 45) return None
    var i = 0
    while (i < 8) { if (bytes(i) != Signature(i)) return None; i += 1 }

    // ---- chunk walk: IHDR fields, PLTE palette, concatenated IDAT
    var w = 0; var h = 0; var bitDepth = 0; var colorType = 0; var interlace = 0
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8
    var done = false
    while (!done && off + 8 <= bytes.length) {
      val len = beInt(bytes, off)
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val dataOff = off + 8
      if (len < 0 || dataOff + len > bytes.length) return None
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = beInt(bytes, dataOff); h = beInt(bytes, dataOff + 4)
          bitDepth = bytes(dataOff + 8) & 0xFF
          colorType = bytes(dataOff + 9) & 0xFF
          interlace = bytes(dataOff + 12) & 0xFF
        case "PLTE" => palette = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + len)
        case "IDAT" => idat.write(bytes, dataOff, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      off = dataOff + len + 4 // skip CRC
    }
    if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    if (colorType == 3 && palette == null) return None
    // 16M-pixel cap (4096×4096) — bounds the worst-case allocation to
    // ~80 MB raw + 128 MB doubles per row. The animated decoders cap
    // at 4M for the same reason ×frames; stills get 4× because there
    // is exactly one frame. A tiny zlib-bomb otherwise forces the
    // full allocation from a few-KB payload on untrusted corpora.
    if (w.toLong * h > 16L * 1024 * 1024) return None

    // ---- inflate the full filtered image: h rows of 1 + w*channels
    val stride = w * channels
    val rawLen = (1L + stride) * h
    // inflate-feasibility guard BEFORE allocating: deflate expands at
    // most ~1032:1, so an IDAT too small to possibly fill the raw
    // buffer is rejected without paying the allocation (inflateTo
    // would fail anyway, but only after the ~80 MB grab).
    if (idat.size().toLong * 1040 + 64 < rawLen) return None
    val raw = new Array[Byte](rawLen.toInt)
    if (!inflateTo(idat.toByteArray, raw)) return None
    if (!unfilterInPlace(raw, h, stride, channels)) return None

    // ---- luminance
    val out = new Array[Double](w * h)
    var p = 0
    var y = 0
    while (y < h) {
      val rowOff = y * (1 + stride) + 1
      var x = 0
      while (x < w) {
        val o = rowOff + x * channels
        val lum = colorType match {
          case 0 | 4 => (raw(o) & 0xFF).toDouble
          case 2 | 6 =>
            0.299 * (raw(o) & 0xFF) + 0.587 * (raw(o + 1) & 0xFF) + 0.114 * (raw(o + 2) & 0xFF)
          case 3 =>
            val pi = (raw(o) & 0xFF) * 3
            if (pi + 2 >= palette.length) return None
            0.299 * (palette(pi) & 0xFF) + 0.587 * (palette(pi + 1) & 0xFF) +
              0.114 * (palette(pi + 2) & 0xFF)
        }
        out(p) = lum
        p += 1; x += 1
      }
      y += 1
    }
    Some(out)
  }

  /** Feature vector [mean/255, std/255, nBins normalized histogram] —
    * null (for SQL) when the payload is not a decodable PNG. Called
    * from the PngGrayFeatures codegen.
    */
  def grayFeaturesOrNull(bytes: Array[Byte], nBins: Int): Array[Double] =
    decodeGray(bytes) match {
      case None => null
      case Some(g) => grayStats(g, nBins)
    }
}
