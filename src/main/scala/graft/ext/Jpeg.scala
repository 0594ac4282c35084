package graft.ext

/** Real baseline-JPEG luminance decode, JDK-only — upgrades `.jpg`
  * assets (the dominant format of real image corpora) from the
  * feature stub to real pixels, next to [[Png]]/[[Apng]]/[[Gif]].
  *
  * Scope: baseline sequential DCT (SOF0), extended sequential
  * (SOF1, incl. 12-bit precision — samples rescaled to the [0,255]
  * plane contract), AND progressive DCT (SOF2 — spectral selection +
  * successive approximation, T.81 §G; a large minority of real web
  * JPEGs), 1/3/4 components with optional restart markers. The
  * 4-component path resolves Adobe APP14: YCCK (transform 2) grays
  * as Y·K, CMYK (inverted ink, the Adobe convention) as BT.601 luma
  * of c'k'/m'k'/y'k' — full-resolution K/C/M/Y' only (subsampled
  * 4-comp would need upsampling no real corpus file uses).
  * Arithmetic coding, hierarchical, progressive-12-bit, and
  * progressive-CMYK return null — never wrong pixels.
  *
  * The decoder produces the Y (luma) PLANE only: JFIF Y is BT.601
  * luminance — exactly the gray the feature contract wants — so the
  * chroma components are entropy-decoded (the interleaved bitstream
  * cannot be skipped) but never dequantized, IDCT'd, or upsampled.
  * That keeps the hot loop at one IDCT per Y block.
  *
  * Pipeline per the public ITU T.81 spec: marker parse (DQT quant
  * tables, DHT canonical Huffman tables, SOF0 geometry/sampling, DRI
  * restart interval, SOS scan) → per-MCU entropy decode (DC category
  * + diff with per-component predictors, AC run/size with EOB/ZRL) →
  * dequant + dezigzag → float IDCT → +128 level shift, clamp.
  */
object Jpeg {

  // zigzag order: coefficient index → natural (row-major) position
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // cos((2x+1)·u·π/16) table for the reference IDCT
  private val Cos: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) { t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16); u += 1 }
      x += 1
    }
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  private final class Huff {
    // canonical decode per T.81 F.2.2.3: minCode/maxCode/valPtr by length
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    var values: Array[Byte] = null
  }

  private final class Comp {
    var id = 0; var hs = 0; var vs = 0; var tq = 0
    var dcTab = 0; var acTab = 0
    var pred = 0 // DC predictor
  }

  /** Reference 2-D IDCT (T.81 A.3.3) of one natural-order 8×8
    * coefficient block + level shift, clamped into the strided plane.
    * `levelShift`/`maxVal` default to the 8-bit values; the 12-bit
    * sequential path passes 2048/4095 and the plane then holds
    * NATIVE-precision samples (callers rescale at the end).
    */
  private def idctToPlane(coef: Array[Int], plane: Array[Double],
                          planeW: Int, bx: Int, by: Int,
                          levelShift: Double = 128.0,
                          maxVal: Double = 255.0): Unit = {
    var py = 0
    while (py < 8) {
      val rowBase = (by + py) * planeW + bx
      var px = 0
      while (px < 8) {
        var sum = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) InvSqrt2 else 1.0
          val cosY = Cos(py * 8 + v)
          var u = 0
          while (u < 8) {
            val cu = if (u == 0) InvSqrt2 else 1.0
            val f = coef(v * 8 + u)
            if (f != 0) sum += cu * cv * f * Cos(px * 8 + u) * cosY
            u += 1
          }
          v += 1
        }
        var p = sum / 4.0 + levelShift
        if (p < 0) p = 0 else if (p > maxVal) p = maxVal
        plane(rowBase + px) = p
        px += 1
      }
      py += 1
    }
  }

  /** EXIF orientation (tag 0x0112 of IFD0 inside the APP1 "Exif"
    * segment) — 1..8, or 0 when absent/malformed. Round 13: dHash is
    * not rotation-invariant, so a camera image and its EXIF-rotated
    * twin miss as near-dups unless the decode normalizes; the tag
    * parse is a plain marker walk + TIFF IFD scan (both endians),
    * never a throw.
    */
  def exifOrientation(bytes: Array[Byte]): Int = {
    try {
      if (bytes == null || bytes.length < 4) return 0
      if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return 0
      def u16be(o: Int): Int = ((bytes(o) & 0xFF) << 8) | (bytes(o + 1) & 0xFF)
      var off = 2
      while (off + 4 <= bytes.length) {
        if ((bytes(off) & 0xFF) != 0xFF) return 0
        val marker = bytes(off + 1) & 0xFF
        if (marker == 0xD9 || marker == 0xDA) return 0 // EOI / SOS: no APP1
        if (marker >= 0xD0 && marker <= 0xD7 || marker == 0x01) { off += 2 }
        else {
          val len = u16be(off + 2)
          if (len < 2 || off + 2 + len > bytes.length) return 0
          if (marker == 0xE1 && len >= 16 &&
              bytes(off + 4) == 'E' && bytes(off + 5) == 'x' &&
              bytes(off + 6) == 'i' && bytes(off + 7) == 'f' &&
              bytes(off + 8) == 0 && bytes(off + 9) == 0) {
            // TIFF header at tiff0: II*\0 or MM\0*
            val tiff0 = off + 10
            val end = off + 2 + len
            if (tiff0 + 8 > end) return 0
            val le =
              if (bytes(tiff0) == 'I' && bytes(tiff0 + 1) == 'I') true
              else if (bytes(tiff0) == 'M' && bytes(tiff0 + 1) == 'M') false
              else return 0
            def u16(o: Int): Int =
              if (le) (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
              else ((bytes(o) & 0xFF) << 8) | (bytes(o + 1) & 0xFF)
            def u32(o: Int): Long =
              if (le) (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
                ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
              else ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
                ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
            if (u16(tiff0 + 2) != 42) return 0
            val ifd0 = tiff0 + u32(tiff0 + 4)
            if (ifd0 < tiff0 || ifd0 + 2 > end) return 0
            val n = u16(ifd0.toInt)
            var i = 0
            while (i < n) {
              val e = ifd0.toInt + 2 + 12 * i
              if (e + 12 > end) return 0
              if (u16(e) == 0x0112) {
                val typ = u16(e + 2)
                // SHORT (3) is the spec type; some writers emit LONG (4).
                // Both fit inline when count == 1.
                val v =
                  if (typ == 3) u16(e + 8)
                  else if (typ == 4 && u32(e + 4) == 1L) u32(e + 8).toInt
                  else -1
                return if (v >= 1 && v <= 8) v else 0
              }
              i += 1
            }
            return 0
          }
          off += 2 + len
        }
      }
      0
    } catch {
      case scala.util.control.NonFatal(_) => 0
    }
  }

  /** Decoded Y plane (w×h, values [0,255]) or null. */
  def decodeLuma(bytes: Array[Byte]): LumaPlane = {
    if (bytes == null || bytes.length < 4) return null
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return null // SOI

    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var prec = 8
    var restartInterval = 0
    // Adobe APP14 color-transform flag: -1 = absent; 0 = CMYK (for
    // 4-comp data) ; 2 = YCCK
    var adobeTransform = -1
    var off = 2

    def u16(o: Int): Int = ((bytes(o) & 0xFF) << 8) | (bytes(o + 1) & 0xFF)

    def readHuff(data: Int, end: Int): Int = {
      // one DHT segment may carry several tables
      var o = data
      while (o < end) {
        if (o + 17 > end) return -1
        val tc = (bytes(o) >> 4) & 0xF; val th = bytes(o) & 0xF
        if (tc > 1 || th > 3) return -1
        val t = new Huff
        var total = 0
        var l = 1
        var code = 0
        var k = 0
        val counts = new Array[Int](17)
        while (l <= 16) { counts(l) = bytes(o + l) & 0xFF; total += counts(l); l += 1 }
        if (o + 17 + total > end || total > 256) return -1
        t.values = java.util.Arrays.copyOfRange(bytes, o + 17, o + 17 + total)
        l = 1
        while (l <= 16) {
          t.valPtr(l) = k
          t.minCode(l) = code
          code += counts(l); k += counts(l)
          t.maxCode(l) = if (counts(l) == 0) -1 else code - 1
          code <<= 1
          l += 1
        }
        if (tc == 0) dcTabs(th) = t else acTabs(th) = t
        o += 17 + total
      }
      end
    }

    // ---- marker loop up to SOS
    var sosOff = -1
    while (sosOff < 0) {
      // resync: skip fill bytes
      while (off < bytes.length && (bytes(off) & 0xFF) != 0xFF) return null
      while (off < bytes.length && (bytes(off) & 0xFF) == 0xFF) off += 1
      if (off >= bytes.length) return null
      val marker = bytes(off) & 0xFF
      off += 1
      marker match {
        case 0xD9 => return null // EOI before any scan
        case 0xC0 | 0xC1 => // SOF0 baseline / SOF1 extended sequential
          if (off + 2 > bytes.length) return null
          val len = u16(off)
          if (off + len > bytes.length || len < 8) return null
          prec = bytes(off + 2) & 0xFF
          h = u16(off + 3); w = u16(off + 5)
          val nc = bytes(off + 7) & 0xFF
          // SOF0 is 8-bit by definition; SOF1 admits 8 or 12 (T.81
          // Table B.2). 4 components = CMYK/YCCK (resolved at the
          // gray-composition step via APP14).
          if ((marker == 0xC0 && prec != 8) ||
              (marker == 0xC1 && prec != 8 && prec != 12)) return null
          if (w <= 0 || h <= 0 || (nc != 1 && nc != 3 && nc != 4)) return null
          // 16M-pixel cap, matching Png's: a crafted SOF header can
          // claim huge dims from a few-byte payload and the component
          // planes are allocated before any entropy-coded data is
          // validated — bound the allocation, not just sanity (the
          // 4-comp path stores up to 4 planes, so the cap divides)
          if (w.toLong * h > (if (nc == 4) 4L else 16L) * 1024 * 1024) return null
          if (len < 8 + 3 * nc) return null
          comps = Array.fill(nc)(new Comp)
          var i = 0
          while (i < nc) {
            val o = off + 8 + 3 * i
            comps(i).id = bytes(o) & 0xFF
            comps(i).hs = (bytes(o + 1) >> 4) & 0xF
            comps(i).vs = bytes(o + 1) & 0xF
            comps(i).tq = bytes(o + 2) & 0xFF
            if (comps(i).hs < 1 || comps(i).hs > 4 ||
                comps(i).vs < 1 || comps(i).vs > 4 || comps(i).tq > 3) return null
            i += 1
          }
          off += len
        case 0xC2 => // SOF2 progressive: its own multi-scan decoder
          return decodeProgressiveLuma(bytes)
        case 0xC3 | 0xC5 | 0xC6 | 0xC7 |
             0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
          return null // lossless/arithmetic/hierarchical: out of scope
        case 0xC4 => // DHT
          if (off + 2 > bytes.length) return null
          val len = u16(off)
          if (off + len > bytes.length) return null
          if (readHuff(off + 2, off + len) < 0) return null
          off += len
        case 0xDB => // DQT
          if (off + 2 > bytes.length) return null
          val len = u16(off)
          if (off + len > bytes.length) return null
          var o = off + 2
          while (o < off + len) {
            val pq = (bytes(o) >> 4) & 0xF; val tq = bytes(o) & 0xF
            if (pq > 1 || tq > 3) return null
            val n = if (pq == 0) 64 else 128
            if (o + 1 + n > off + len) return null
            val q = new Array[Int](64)
            var i = 0
            while (i < 64) {
              q(i) = if (pq == 0) bytes(o + 1 + i) & 0xFF else u16(o + 1 + 2 * i)
              i += 1
            }
            quant(tq) = q
            o += 1 + n
          }
          off += len
        case 0xDD => // DRI
          // the SOS guard, mirrored: a crafted len (0, 2, or past the
          // buffer) would desynchronize the marker walk
          if (off + 4 > bytes.length) return null
          val driLen = u16(off)
          if (driLen < 4 || off + driLen > bytes.length) return null
          restartInterval = u16(off + 2)
          off += driLen
        case 0xDA => // SOS
          if (off + 2 > bytes.length) return null
          val len = u16(off)
          // len >= 3 before reading ns (a crafted len of 2 would read
          // one past the segment), then the full header before the
          // component specs
          if (off + len > bytes.length || comps == null || len < 3) return null
          val ns = bytes(off + 2) & 0xFF
          if (ns != comps.length) return null // interleaved single scan only
          if (len < 3 + 2 * ns) return null
          var i = 0
          while (i < ns) {
            val cid = bytes(off + 3 + 2 * i) & 0xFF
            val tabs = bytes(off + 4 + 2 * i) & 0xFF
            val c = comps.find(_.id == cid).orNull
            if (c == null) return null
            c.dcTab = (tabs >> 4) & 0xF; c.acTab = tabs & 0xF
            if (c.dcTab > 3 || c.acTab > 3) return null
            i += 1
          }
          sosOff = off + len
        case m if m >= 0xD0 && m <= 0xD7 => () // stray RST: ignore
        case 0x01 => ()                        // TEM: no payload
        case 0xEE => // APP14: Adobe color-transform flag
          if (off + 2 > bytes.length) return null
          val len = u16(off)
          if (len < 2 || off + len > bytes.length) return null
          // payload: "Adobe" + version(2) + flags0(2) + flags1(2) +
          // transform(1) = 12 bytes minimum
          if (len >= 14 &&
              bytes(off + 2) == 'A' && bytes(off + 3) == 'd' &&
              bytes(off + 4) == 'o' && bytes(off + 5) == 'b' &&
              bytes(off + 6) == 'e')
            adobeTransform = bytes(off + 13) & 0xFF
          off += len
        case _ => // APPn/COM/anything with a length
          if (off + 2 > bytes.length) return null
          val len = u16(off)
          if (len < 2 || off + len > bytes.length) return null
          off += len
      }
    }

    // ---- validate tables needed by the scan
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      if (quant(c.tq) == null || dcTabs(c.dcTab) == null || acTabs(c.acTab) == null)
        return null
      ci += 1
    }
    val hMax = comps.map(_.hs).max; val vMax = comps.map(_.vs).max
    val y = comps(0) // component 0 is Y for JFIF; gray images have only it
    if (comps.length == 3 && (y.hs != hMax || y.vs != vMax))
      return null // Y subsampled below chroma: not JFIF, out of scope
    // 4-component color model: YCCK when Adobe says transform 2,
    // CMYK otherwise (Adobe stores CMYK INVERTED — handled at the
    // gray-composition step). Gray needs Y·K (YCCK) or all four
    // planes (CMYK) at full resolution; subsampled K/C/M/Y' would
    // need upsampling no real corpus file uses — null, never wrong
    // pixels.
    val ycck = comps.length == 4 && adobeTransform == 2
    val storeIdx: Array[Int] = comps.length match {
      case 4 if ycck =>
        if (comps(0).hs != hMax || comps(0).vs != vMax ||
            comps(3).hs != hMax || comps(3).vs != vMax) return null
        Array(0, -1, -1, 1)
      case 4 =>
        if (comps.exists(c => c.hs != hMax || c.vs != vMax)) return null
        Array(0, 1, 2, 3)
      case _ => Array.tabulate(comps.length)(i => if (i == 0) 0 else -1)
    }
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val planeW = mcusX * y.hs * 8
    val planeH = mcusY * y.vs * 8
    val nPlanes = storeIdx.count(_ >= 0)
    val planes = Array.fill(nPlanes)(new Array[Double](planeW * planeH))
    val maxV = (1 << prec) - 1
    val levelShift = 1 << (prec - 1)

    // ---- entropy-coded segment reader (FF00 destuffing, RST handling)
    var pos = sosOff
    var bitBuf = 0; var bitCnt = 0

    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= bytes.length) return -1
        var b = bytes(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= bytes.length) return -1
          val b2 = bytes(pos) & 0xFF
          if (b2 == 0x00) pos += 1          // stuffed FF
          else return -1                     // marker inside scan: underrun
          b = 0xFF
        }
        bitBuf = b; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    def decodeHuff(t: Huff): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val b = nextBit()
        if (b < 0) return -1
        code = (code << 1) | b
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.values(t.valPtr(l) + code - t.minCode(l)) & 0xFF
        l += 1
      }
      -1
    }

    def receiveExtend(s: Int): Int = {
      if (s == 0) return 0
      var v = 0
      var i = 0
      while (i < s) {
        val b = nextBit()
        if (b < 0) return Int.MinValue
        v = (v << 1) | b
        i += 1
      }
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }

    val coef = new Array[Int](64)

    /** One 8×8 block of component c; returns false on bitstream
      * error. IDCT + store into `plane` only when it is non-null
      * (the gray-relevant components). */
    def decodeBlock(c: Comp, plane: Array[Double], bx: Int, by: Int): Boolean = {
      val sDC = decodeHuff(dcTabs(c.dcTab))
      // DC difference categories reach 15 at 8-bit and 16 at 12-bit
      // precision (T.81 Tables F.1/F.6)
      if (sDC < 0 || sDC > (if (prec == 12) 16 else 15)) return false
      val diff = receiveExtend(sDC)
      if (diff == Int.MinValue) return false
      c.pred += diff
      val store = plane != null
      val q = if (store) quant(c.tq) else null
      if (store) {
        java.util.Arrays.fill(coef, 0)
        coef(0) = c.pred * q(0)
      }
      var k = 1
      while (k < 64) {
        val rs = decodeHuff(acTabs(c.acTab))
        if (rs < 0) return false
        val r = rs >> 4; val s = rs & 0xF
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else k = 64          // EOB
        } else {
          k += r
          if (k > 63) return false
          val v = receiveExtend(s)
          if (v == Int.MinValue) return false
          if (store) coef(Zigzag(k)) = v * q(k)
          k += 1
        }
      }
      if (store)
        idctToPlane(coef, plane, planeW, bx, by, levelShift.toDouble,
          maxV.toDouble)
      true
    }

    // ---- MCU loop
    val totalMcus = mcusX * mcusY
    var mcu = 0
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // byte-align and consume RSTn; reset predictors
        bitCnt = 0
        if (pos + 1 >= bytes.length || (bytes(pos) & 0xFF) != 0xFF ||
            (bytes(pos + 1) & 0xFF) < 0xD0 || (bytes(pos + 1) & 0xFF) > 0xD7) return null
        pos += 2
        var i = 0
        while (i < comps.length) { comps(i).pred = 0; i += 1 }
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var i = 0
      while (i < comps.length) {
        val c = comps(i)
        val plane = if (storeIdx(i) >= 0) planes(storeIdx(i)) else null
        var by = 0
        while (by < c.vs) {
          var bx = 0
          while (bx < c.hs) {
            if (!decodeBlock(c, plane,
                (mx * y.hs + bx) * 8, (my * y.vs + by) * 8)) return null
            bx += 1
          }
          by += 1
        }
        i += 1
      }
      mcu += 1
    }

    // ---- gray composition (planes hold NATIVE-precision samples)
    val toByteScale = 255.0 / maxV
    val out =
      if (comps.length < 4) {
        if (prec == 8) planes(0)
        else {
          val p = planes(0)
          var i = 0
          while (i < p.length) { p(i) *= toByteScale; i += 1 }
          p
        }
      } else if (ycck) {
        // YCCK (Adobe-inverted chroma underneath, but gray needs only
        // Y·K): every RGB channel scales by k'/maxV, so luma does too
        val p0 = planes(0); val pk = planes(1)
        val g = new Array[Double](p0.length)
        var i = 0
        while (i < g.length) {
          g(i) = p0(i) * pk(i) / maxV * toByteScale
          i += 1
        }
        g
      } else {
        // Adobe CMYK stores INVERTED ink: c' = maxV − C, so
        // R = c'·k'/maxV (ditto G, B) — BT.601 luma of that
        val pc = planes(0); val pm = planes(1)
        val py = planes(2); val pk = planes(3)
        val g = new Array[Double](pc.length)
        var i = 0
        while (i < g.length) {
          val k = pk(i) / maxV
          g(i) = (0.299 * pc(i) + 0.587 * pm(i) + 0.114 * py(i)) * k *
            toByteScale
          i += 1
        }
        g
      }
    new LumaPlane(out, planeW, w, h)
  }

  /** Progressive (SOF2) Y-plane decode, T.81 §G.
    *
    * Progressive JPEG spreads each component's coefficients over many
    * scans — a DC scan (possibly interleaved across components) plus
    * per-component AC scans, each carrying a zigzag band [Ss, Se] at
    * successive-approximation precision (first pass Ah=0 stores
    * values << Al; refinement passes Ah>0 add one bit per
    * coefficient). The decoder accumulates RAW Y coefficients across
    * scans and runs dequant + IDCT once at EOI.
    *
    * Luma-only economics differ from baseline: AC scans are
    * non-interleaved BY SPEC (ns=1), so chroma AC scans are SKIPPED
    * outright (each scan owns its entropy segment — no sync needed);
    * chroma only costs entropy decode inside interleaved DC scans.
    */
  private def decodeProgressiveLuma(bytes: Array[Byte]): LumaPlane = {
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var off = 2

    // Y geometry, set once at SOF2
    var yComp: Comp = null
    var yBlocksW = 0; var yBlocksH = 0   // interleaved (MCU-padded) grid
    var nonIntW = 0; var nonIntH = 0     // non-interleaved grid (≤ the above)
    var mcusX = 0; var mcusY = 0
    var hMax = 0; var vMax = 0
    var yCoef: Array[Int] = null         // 64 zigzag-order coefs per block
    var sawEoi = false

    def u16(o: Int): Int = ((bytes(o) & 0xFF) << 8) | (bytes(o + 1) & 0xFF)

    def readHuff(data: Int, end: Int): Int = {
      var o = data
      while (o < end) {
        if (o + 17 > end) return -1
        val tc = (bytes(o) >> 4) & 0xF; val th = bytes(o) & 0xF
        if (tc > 1 || th > 3) return -1
        val t = new Huff
        var total = 0
        var l = 1
        var code = 0
        var k = 0
        val counts = new Array[Int](17)
        while (l <= 16) { counts(l) = bytes(o + l) & 0xFF; total += counts(l); l += 1 }
        if (o + 17 + total > end || total > 256) return -1
        t.values = java.util.Arrays.copyOfRange(bytes, o + 17, o + 17 + total)
        l = 1
        while (l <= 16) {
          t.valPtr(l) = k
          t.minCode(l) = code
          code += counts(l); k += counts(l)
          t.maxCode(l) = if (counts(l) == 0) -1 else code - 1
          code <<= 1
          l += 1
        }
        if (tc == 0) dcTabs(th) = t else acTabs(th) = t
        o += 17 + total
      }
      end
    }

    // ---- entropy reader over the CURRENT scan's segment
    var pos = 0
    var bitBuf = 0; var bitCnt = 0

    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= bytes.length) return -1
        var b = bytes(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= bytes.length) return -1
          if ((bytes(pos) & 0xFF) == 0x00) pos += 1 // stuffed FF
          else return -1                            // marker: scan over
          b = 0xFF
        }
        bitBuf = b; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    def decodeHuffT(t: Huff): Int = {
      if (t == null) return -1
      var code = 0
      var l = 1
      while (l <= 16) {
        val b = nextBit()
        if (b < 0) return -1
        code = (code << 1) | b
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.values(t.valPtr(l) + code - t.minCode(l)) & 0xFF
        l += 1
      }
      -1
    }

    def receiveExtend(s: Int): Int = {
      if (s == 0) return 0
      var v = 0
      var i = 0
      while (i < s) {
        val b = nextBit()
        if (b < 0) return Int.MinValue
        v = (v << 1) | b
        i += 1
      }
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }

    def receiveRaw(r: Int): Int = {
      var v = 0
      var i = 0
      while (i < r) {
        val b = nextBit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }

    /** Advance `pos` past any remaining entropy bytes to the next
      * marker (skipping stuffed FF00 and RSTn, which belong to scan
      * data). Leaves pos ON the 0xFF.
      */
    def seekMarker(): Boolean = {
      bitCnt = 0
      while (pos + 1 < bytes.length) {
        if ((bytes(pos) & 0xFF) == 0xFF) {
          val m = bytes(pos + 1) & 0xFF
          if (m != 0x00 && m != 0xFF && !(m >= 0xD0 && m <= 0xD7)) return true
          pos += (if (m == 0xFF) 1 else 2)
        } else pos += 1
      }
      false
    }

    // ---- one scan's entropy decode
    def decodeScan(scomps: Array[Comp], ss: Int, se: Int,
                   ah: Int, al: Int): Boolean = {
      var eobrun = 0
      scomps.foreach(_.pred = 0)

      def refineNonzero(base: Int, k: Int): Boolean = {
        // correction bit for an already-nonzero coefficient
        val b = nextBit()
        if (b < 0) return false
        val p1 = 1 << al
        if (b == 1 && (yCoef(base + k) & p1) == 0)
          yCoef(base + k) += (if (yCoef(base + k) >= 0) p1 else -p1)
        true
      }

      /** DC contribution for one block of component c (any comp —
        * chroma bits are decoded for sync, stored only for Y).
        */
      def dcBlock(c: Comp, storeIdx: Int): Boolean = {
        if (ah == 0) {
          val sDC = decodeHuffT(dcTabs(c.dcTab))
          if (sDC < 0 || sDC > 15) return false
          val diff = receiveExtend(sDC)
          if (diff == Int.MinValue) return false
          c.pred += diff
          if (storeIdx >= 0) yCoef(storeIdx * 64) = c.pred << al
        } else {
          val b = nextBit()
          if (b < 0) return false
          if (storeIdx >= 0 && b == 1) yCoef(storeIdx * 64) |= 1 << al
        }
        true
      }

      /** First-pass AC band for one Y block (G.1.2.2). */
      def acFirst(base: Int): Boolean = {
        if (eobrun > 0) { eobrun -= 1; return true }
        var k = ss
        while (k <= se) {
          val rs = decodeHuffT(acTabs(yComp.acTab))
          if (rs < 0) return false
          val r = rs >> 4; val s = rs & 0xF
          if (s == 0) {
            if (r < 15) {
              eobrun = (1 << r) - 1
              if (r > 0) {
                val extra = receiveRaw(r)
                if (extra < 0) return false
                eobrun += extra
              }
              return true
            }
            k += 16 // ZRL
          } else {
            k += r
            if (k > se) return false
            val v = receiveExtend(s)
            if (v == Int.MinValue) return false
            yCoef(base + k) = v << al
            k += 1
          }
        }
        true
      }

      /** Refinement AC band for one Y block (G.1.2.3). */
      def acRefine(base: Int): Boolean = {
        val p1 = 1 << al
        var k = ss
        if (eobrun == 0) {
          var brk = false
          while (k <= se && !brk) {
            val rs = decodeHuffT(acTabs(yComp.acTab))
            if (rs < 0) return false
            var r = rs >> 4; val s = rs & 0xF
            var newVal = 0
            if (s == 0) {
              if (r < 15) {
                // EOB run: unlike the FIRST pass, the current block's
                // remaining band still carries one correction bit per
                // already-nonzero coefficient — the sweep below reads
                // them, THEN this block counts against the run (so the
                // run here includes the current block: 1<<r, not
                // (1<<r)−1)
                eobrun = 1 << r
                if (r > 0) {
                  val extra = receiveRaw(r)
                  if (extra < 0) return false
                  eobrun += extra
                }
                brk = true // fall through to the EOB refinement sweep
              }
              // r == 15: skip 16 zero-history coefficients
            } else {
              if (s != 1) return false // refinement only appends ±1 bits
              val b = nextBit()
              if (b < 0) return false
              newVal = if (b == 1) p1 else -p1
            }
            if (!brk) {
              var placed = false
              while (k <= se && !placed) {
                if (yCoef(base + k) != 0) {
                  if (!refineNonzero(base, k)) return false
                } else {
                  if (r == 0) {
                    if (s != 0) yCoef(base + k) = newVal
                    placed = true
                  } else r -= 1
                }
                k += 1
              }
              if (!placed && s != 0) return false // ran off band before placing
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            if (yCoef(base + k) != 0) {
              if (!refineNonzero(base, k)) return false
            }
            k += 1
          }
          eobrun -= 1
        }
        true
      }

      def restartAt(unit: Int): Boolean = {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          bitCnt = 0
          if (pos + 1 >= bytes.length || (bytes(pos) & 0xFF) != 0xFF ||
              (bytes(pos + 1) & 0xFF) < 0xD0 || (bytes(pos + 1) & 0xFF) > 0xD7)
            return false
          pos += 2
          scomps.foreach(_.pred = 0)
          eobrun = 0
        }
        true
      }

      if (ss == 0) {
        // DC scan (se == 0 checked by caller). A single-component
        // scan is non-interleaved BY SPEC (T.81 A.2.3) — its data
        // units walk the component's own block grid, not MCUs
        if (scomps.length > 1) {
          // MCU-interleaved over the full grid
          var mcu = 0
          val total = mcusX * mcusY
          while (mcu < total) {
            if (!restartAt(mcu)) return false
            val mx = mcu % mcusX; val my = mcu / mcusX
            var i = 0
            while (i < scomps.length) {
              val c = scomps(i)
              var by = 0
              while (by < c.vs) {
                var bx = 0
                while (bx < c.hs) {
                  val idx =
                    if (c eq yComp)
                      (my * c.vs + by) * yBlocksW + (mx * c.hs + bx)
                    else -1
                  if (!dcBlock(c, idx)) return false
                  bx += 1
                }
                by += 1
              }
              i += 1
            }
            mcu += 1
          }
        } else {
          // single-component DC scan: non-interleaved block grid
          val c = scomps(0)
          val bw = (w * c.hs + 8 * hMax - 1) / (8 * hMax)
          val bh = (h * c.vs + 8 * vMax - 1) / (8 * vMax)
          var b = 0
          val total = bw * bh
          while (b < total) {
            if (!restartAt(b)) return false
            val idx =
              if (c eq yComp) (b / bw) * yBlocksW + (b % bw) else -1
            if (!dcBlock(c, idx)) return false
            b += 1
          }
        }
      } else {
        // AC scan: single component by spec
        val c = scomps(0)
        if (!(c eq yComp)) return true // unreachable (caller skips), kept for safety
        var b = 0
        val total = nonIntW * nonIntH
        while (b < total) {
          if (!restartAt(b)) return false
          val base = ((b / nonIntW) * yBlocksW + (b % nonIntW)) * 64
          val ok = if (ah == 0) acFirst(base) else acRefine(base)
          if (!ok) return false
          b += 1
        }
      }
      true
    }

    // ---- marker loop over ALL scans
    while (!sawEoi) {
      while (off < bytes.length && (bytes(off) & 0xFF) != 0xFF) return null
      while (off < bytes.length && (bytes(off) & 0xFF) == 0xFF) off += 1
      if (off >= bytes.length) return null
      val marker = bytes(off) & 0xFF
      off += 1
      marker match {
        case 0xD9 => sawEoi = true
        case 0xC2 => // SOF2
          if (yCoef != null) return null // second frame: malformed
          if (off + 2 > bytes.length) return null
          val len = u16(off)
          if (off + len > bytes.length || len < 8) return null
          val prec = bytes(off + 2) & 0xFF
          h = u16(off + 3); w = u16(off + 5)
          val nc = bytes(off + 7) & 0xFF
          if (prec != 8 || w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return null
          if (w.toLong * h > 16L * 1024 * 1024) return null
          if (len < 8 + 3 * nc) return null
          comps = Array.fill(nc)(new Comp)
          var i = 0
          while (i < nc) {
            val o = off + 8 + 3 * i
            comps(i).id = bytes(o) & 0xFF
            comps(i).hs = (bytes(o + 1) >> 4) & 0xF
            comps(i).vs = bytes(o + 1) & 0xF
            comps(i).tq = bytes(o + 2) & 0xFF
            if (comps(i).hs < 1 || comps(i).hs > 4 ||
                comps(i).vs < 1 || comps(i).vs > 4 || comps(i).tq > 3) return null
            i += 1
          }
          hMax = comps.map(_.hs).max; vMax = comps.map(_.vs).max
          yComp = comps(0)
          if (nc == 3 && (yComp.hs != hMax || yComp.vs != vMax)) return null
          mcusX = (w + 8 * hMax - 1) / (8 * hMax)
          mcusY = (h + 8 * vMax - 1) / (8 * vMax)
          yBlocksW = mcusX * yComp.hs
          yBlocksH = mcusY * yComp.vs
          nonIntW = (w * yComp.hs + 8 * hMax - 1) / (8 * hMax)
          nonIntH = (h * yComp.vs + 8 * vMax - 1) / (8 * vMax)
          yCoef = new Array[Int](yBlocksW * yBlocksH * 64)
          off += len
        case 0xC0 | 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
             0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
          return null // a second, non-SOF2 frame type: malformed here
        case 0xC4 =>
          if (off + 2 > bytes.length) return null
          val len = u16(off)
          if (off + len > bytes.length) return null
          if (readHuff(off + 2, off + len) < 0) return null
          off += len
        case 0xDB =>
          if (off + 2 > bytes.length) return null
          val len = u16(off)
          if (off + len > bytes.length) return null
          var o = off + 2
          while (o < off + len) {
            val pq = (bytes(o) >> 4) & 0xF; val tq = bytes(o) & 0xF
            if (pq > 1 || tq > 3) return null
            val n = if (pq == 0) 64 else 128
            if (o + 1 + n > off + len) return null
            val q = new Array[Int](64)
            var i = 0
            while (i < 64) {
              q(i) = if (pq == 0) bytes(o + 1 + i) & 0xFF else u16(o + 1 + 2 * i)
              i += 1
            }
            quant(tq) = q
            o += 1 + n
          }
          off += len
        case 0xDD =>
          // same DRI length guard as the baseline loop
          if (off + 4 > bytes.length) return null
          val driLen = u16(off)
          if (driLen < 4 || off + driLen > bytes.length) return null
          restartInterval = u16(off + 2)
          off += driLen
        case 0xDA =>
          if (off + 2 > bytes.length || comps == null || yCoef == null) return null
          val len = u16(off)
          // len >= 3 before reading ns — a crafted len of 2 passes the
          // range check but indexes one past the segment
          if (off + len > bytes.length || len < 3) return null
          val ns = bytes(off + 2) & 0xFF
          if (ns < 1 || ns > comps.length || len < 6 + 2 * ns) return null
          val scomps = new Array[Comp](ns)
          var i = 0
          while (i < ns) {
            val cid = bytes(off + 3 + 2 * i) & 0xFF
            val tabs = bytes(off + 4 + 2 * i) & 0xFF
            val c = comps.find(_.id == cid).orNull
            if (c == null) return null
            c.dcTab = (tabs >> 4) & 0xF; c.acTab = tabs & 0xF
            if (c.dcTab > 3 || c.acTab > 3) return null
            scomps(i) = c
            i += 1
          }
          val ss = bytes(off + 3 + 2 * ns) & 0xFF
          val se = bytes(off + 4 + 2 * ns) & 0xFF
          val aa = bytes(off + 5 + 2 * ns) & 0xFF
          val ah = (aa >> 4) & 0xF; val al = aa & 0xF
          if (ss > 63 || se > 63 || se < ss || al > 13) return null
          if (ss == 0 && se != 0) return null          // DC band is exactly [0,0]
          if (ss > 0 && ns != 1) return null           // AC scans: one component
          if (ss == 0 && scomps.exists(c => dcTabs(c.dcTab) == null) && ah == 0)
            return null
          pos = off + len
          bitCnt = 0
          if (ss > 0 && !(scomps(0) eq yComp)) {
            // chroma AC scan: its entropy segment is self-contained — skip
            if (!seekMarker() && pos + 1 >= bytes.length) return null
          } else {
            if (!decodeScan(scomps, ss, se, ah, al)) return null
            if (!seekMarker() && pos + 1 >= bytes.length) return null
          }
          off = pos
        case m if m >= 0xD0 && m <= 0xD7 => ()
        case 0x01 => ()
        case _ =>
          if (off + 2 > bytes.length) return null
          val len = u16(off)
          if (len < 2 || off + len > bytes.length) return null
          off += len
      }
    }

    if (yCoef == null || quant(yComp.tq) == null) return null
    // ---- dequantize + IDCT every Y block
    val planeW = yBlocksW * 8
    val plane = new Array[Double](planeW * yBlocksH * 8)
    val yQuant = quant(yComp.tq)
    val nat = new Array[Int](64)
    var b = 0
    val nBlocks = yBlocksW * yBlocksH
    while (b < nBlocks) {
      val base = b * 64
      var k = 0
      while (k < 64) {
        nat(Zigzag(k)) = yCoef(base + k) * yQuant(k)
        k += 1
      }
      idctToPlane(nat, plane, planeW, (b % yBlocksW) * 8, (b / yBlocksW) * 8)
      b += 1
    }
    new LumaPlane(plane, planeW, w, h)
  }

  /** Y-plane view: `planeW`-strided storage cropped to w×h. */
  final class LumaPlane(val plane: Array[Double], val planeW: Int,
                        val w: Int, val h: Int)

  /** [mean/255, std/255, nBins histogram] over the w×h luma crop —
    * same contract as [[Png.grayFeaturesOrNull]]; null for non-JPEG
    * or out-of-scope profiles.
    */
  def grayFeaturesOrNull(bytes: Array[Byte], nBins: Int): Array[Double] = {
    val lp = decodeLuma(bytes)
    if (lp == null) return null
    val g = new Array[Double](lp.w * lp.h)
    var y = 0
    while (y < lp.h) {
      System.arraycopy(lp.plane, y * lp.planeW, g, y * lp.w, lp.w)
      y += 1
    }
    Png.grayStats(g, nBins)
  }
}
