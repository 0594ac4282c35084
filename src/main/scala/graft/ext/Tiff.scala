package graft.ext

/** Uncompressed TIFF pixel decode (TIFF 6.0 baseline subset): both
  * byte orders, Compression=1, 8-bit samples, grayscale (spp 1,
  * photometric 0/1) or RGB (spp 3), chunky planar config, strip
  * layout — to the shared Rec.601 luminance plane, so TIFF payloads
  * join the [[Images]] family like [[Bmp]]; the Orientation tag
  * (274) is applied so fingerprints hash the DISPLAYED image (the
  * round-13 EXIF rule — TIFF carries the same tag natively).
  * Anything else (LZW/deflate/JPEG-in-TIFF, 16-bit, tiles, planar)
  * returns null.
  */
object Tiff {

  private def u16(b: Array[Byte], o: Int, le: Boolean): Int =
    if (le) (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    else ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def u32(b: Array[Byte], o: Int, le: Boolean): Long =
    if (le) (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    else ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  /** Rec.601 luminance plane (row-major [0,255] doubles, w, h) or
    * null for non-TIFF / out-of-scope payloads.
    */
  def decodeGrayOrNull(bytes: Array[Byte]): (Array[Double], Int, Int) = {
    try {
      if (bytes == null || bytes.length < 16) return null
      val le =
        if (bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 && bytes(3) == 0) true
        else if (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && bytes(3) == 42) false
        else return null
      val ifd = u32(bytes, 4, le)
      if (ifd < 8 || ifd + 2 > bytes.length) return null
      val n = u16(bytes, ifd.toInt, le)
      if (n < 1 || n > 4096 || ifd + 2 + 12L * n > bytes.length) return null

      var w = -1L; var h = -1L
      var bps = 1L; var spp = 1L; var compression = 1L
      var photometric = 1L; var planar = 1L
      var orientation = 1L // tag 0x0112: scanners/cameras emit it
      var rowsPerStrip = Long.MaxValue
      var stripOffsets: Array[Long] = null
      var stripCounts: Array[Long] = null

      var i = 0
      while (i < n) {
        val o = (ifd + 2 + 12 * i).toInt
        val tag = u16(bytes, o, le)
        val typ = u16(bytes, o + 2, le)
        val cnt = u32(bytes, o + 4, le)
        def scalar: Long = typ match {
          case 3 => u16(bytes, o + 8, le).toLong
          case 4 => u32(bytes, o + 8, le)
          case _ => -1L
        }
        def vector: Array[Long] = {
          // SHORT (2 bytes) / LONG (4): values inline when they fit,
          // else at the pointed offset
          val width = if (typ == 3) 2 else if (typ == 4) 4 else return null
          val total = width * cnt
          val base = if (total <= 4) o + 8L else u32(bytes, o + 8, le)
          if (base < 0 || base + total > bytes.length) return null
          Array.tabulate(cnt.toInt) { k =>
            if (typ == 3) u16(bytes, (base + 2L * k).toInt, le).toLong
            else u32(bytes, (base + 4L * k).toInt, le)
          }
        }
        tag match {
          case 256 => w = scalar
          case 257 => h = scalar
          case 258 => // BitsPerSample: all samples must be 8
            val v = vector
            if (v == null || v.exists(_ != 8L)) return null
            bps = 8
          case 259 => compression = scalar
          case 262 => photometric = scalar
          case 273 => stripOffsets = vector
          case 277 => spp = scalar
          case 274 => orientation = scalar
          case 278 => rowsPerStrip = scalar
          case 279 => stripCounts = vector
          case 284 => planar = scalar
          case _ => ()
        }
        i += 1
      }
      if (w <= 0 || h <= 0 || w * h > (1L << 26)) return null
      if (compression != 1 || planar != 1) return null
      if (!(spp == 1 && (photometric == 0 || photometric == 1)) &&
          !(spp == 3 && photometric == 2)) return null
      if (bps != 8 || stripOffsets == null || stripCounts == null) return null
      if (stripOffsets.length != stripCounts.length) return null
      if (rowsPerStrip <= 0) return null

      val width = w.toInt
      val height = h.toInt
      val rowBytes = width * spp.toInt
      val out = new Array[Double](width * height)
      var y = 0L
      var strip = 0
      while (y < height) {
        if (strip >= stripOffsets.length) return null
        val so = stripOffsets(strip)
        val sc = stripCounts(strip)
        if (so < 0 || so + sc > bytes.length) return null
        val rowsHere = math.min(rowsPerStrip, height - y)
        if (sc < rowsHere * rowBytes) return null
        var r = 0L
        while (r < rowsHere) {
          val ro = (so + r * rowBytes).toInt
          var x = 0
          while (x < width) {
            val v =
              if (spp == 1) {
                val s = bytes(ro + x) & 0xFF
                if (photometric == 0) (255 - s).toDouble else s.toDouble // 0 = WhiteIsZero
              } else {
                val p = ro + 3 * x
                0.299 * (bytes(p) & 0xFF) + 0.587 * (bytes(p + 1) & 0xFF) +
                  0.114 * (bytes(p + 2) & 0xFF)
              }
            out(((y + r) * width + x).toInt) = v
            x += 1
          }
          r += 1
        }
        y += rowsHere
        strip += 1
      }
      // orientation normalization (round 13, the JPEG/EXIF rule):
      // fingerprints must hash the DISPLAYED image, and TIFF carries
      // the SAME tag 274 semantics natively
      if (orientation >= 2 && orientation <= 8)
        Images.orientGray(out, width, height, orientation.toInt)
      else (out, width, height)
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }
}
