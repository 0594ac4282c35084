package graft.ext

/** Uncompressed BMP pixel decode (the Windows DIB format, public
  * layout): BITMAPFILEHEADER + BITMAPINFOHEADER (or CORE), BI_RGB
  * 8-bit palette / 24-bit BGR / 32-bit BGRX, bottom-up or top-down
  * rows, 4-byte row padding — decoded to the engine's Rec.601
  * luminance plane so BMP payloads join the [[Images]] family
  * (thumbnails, dHash, features) instead of stopping at
  * [[MediaMeta.imageDimsOrNull]]'s dimensions. RLE and bitfields
  * compression return null (loud scope boundary, the [[Jpeg]]
  * convention).
  */
object Bmp {

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  /** Rec.601 luminance plane (row-major [0,255] doubles, w, h) or
    * null for non-BMP / out-of-scope payloads.
    */
  def decodeGrayOrNull(bytes: Array[Byte]): (Array[Double], Int, Int) = {
    try {
      if (bytes == null || bytes.length < 54) return null
      if (bytes(0) != 'B' || bytes(1) != 'M') return null
      val dataOff = le32(bytes, 10)
      val hdrSize = le32(bytes, 14)
      if (hdrSize < 40) return null // CORE headers: not emitted by modern writers
      val w = le32(bytes, 18).toInt
      val hRaw = le32(bytes, 22).toInt
      val topDown = hRaw < 0
      val h = math.abs(hRaw)
      val bpp = le16(bytes, 28)
      val compression = le32(bytes, 30)
      if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return null
      if (compression != 0) return null // BI_RGB only
      if (bpp != 8 && bpp != 24 && bpp != 32) return null
      // palette (bpp 8): BGRX quads right after the info header
      val palCount =
        if (bpp != 8) 0
        else {
          val declared = le32(bytes, 46).toInt
          if (declared == 0) 256 else declared
        }
      val palOff = 14 + hdrSize.toInt
      if (bpp == 8 && palOff + 4L * palCount > bytes.length) return null
      // Long arithmetic: at the size cap (w = 2^26, bpp = 32) w*bpp
      // overflows Int and a legal image would be dropped, not decoded.
      val rowBytes = ((w.toLong * bpp / 8) + 3) & ~3L
      if (dataOff < 0 || dataOff + rowBytes * h > bytes.length) return null
      val out = new Array[Double](w * h)
      var y = 0
      while (y < h) {
        val srcRow = if (topDown) y else h - 1 - y
        val ro = (dataOff + rowBytes * srcRow).toInt
        var x = 0
        while (x < w) {
          var rC = 0; var gC = 0; var bC = 0
          if (bpp == 8) {
            val idx = bytes(ro + x) & 0xFF
            if (idx >= palCount) return null
            val po = palOff + 4 * idx
            bC = bytes(po) & 0xFF; gC = bytes(po + 1) & 0xFF; rC = bytes(po + 2) & 0xFF
          } else {
            val po = ro + x * (bpp / 8)
            bC = bytes(po) & 0xFF; gC = bytes(po + 1) & 0xFF; rC = bytes(po + 2) & 0xFF
          }
          out(y * w + x) = 0.299 * rC + 0.587 * gC + 0.114 * bC
          x += 1
        }
        y += 1
      }
      (out, w, h)
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }
}
