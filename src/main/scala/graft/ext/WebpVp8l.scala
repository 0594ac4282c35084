package graft.ext

import scala.util.control.NonFatal

/** WebP lossless (VP8L) decoder — hand-written from the public WebP
  * Lossless Bitstream Specification, closing the image-dedup gap
  * flagged in VERDICT r11 item 2: WebP is the web's second-most-
  * common image format and [[Images]] previously routed only
  * PNG/JPEG/GIF/BMP/TIFF, so WebP assets silently skipped near-dup
  * detection.
  *
  * Core-spec coverage (everything a conformant lossless stream may
  * use):
  *   - RIFF walk (VP8X extended headers skipped; lossy `VP8 ` → null,
  *     see the build-vs-defer note in BENCH_NOTES r12)
  *   - LSB-first bit reading; 14-bit dimensions; version 0
  *   - both prefix-code forms: simple (1–2 symbols, 0/1-bit codes)
  *     and normal (the 19-symbol code-length code in the published
  *     kCodeLengthCodeOrder, repeat codes 16/17/18, optional
  *     max-symbol cap), canonical assignment per RFC 1951 with the
  *     single-symbol 0-bit degenerate case
  *   - meta prefix codes (entropy image, recursive sub-stream decode
  *     — sub-streams have their own color cache but no transforms
  *     and no further recursion)
  *   - LZ77 backward references: length/distance prefix+extra-bits
  *     coding, the 120-entry 2D proximity distance map, overlapping
  *     copies
  *   - color cache (the 0x1e35a7bd multiplicative hash), populated
  *     by every emitted pixel
  *   - all four transforms, inverse-applied in reverse read order:
  *     PREDICTOR (14 modes, spec edge rules incl. the last-column
  *     top-right wrap to the current row's first pixel), COLOR
  *     (signed 3.5 fixed-point cross-channel deltas), SUBTRACT_GREEN,
  *     COLOR_INDEXING (delta-coded palette, sub-byte pixel bundling)
  *
  * Validation (WebpSpec): an independent test-side VP8L ENCODER (own
  * canonical-code assembly, own transform forward passes — the
  * FLAC/CABAC discipline) plus GOLDEN fixtures produced by the
  * system's own libwebp via its public C ABI (`data/webp_golden/`,
  * the JDK-decoder/zstd-jni in-environment-validator convention) —
  * real encoder output exercises transform selection, LZ77 and cache
  * decisions this codebase did not make.
  *
  * Bounded-and-total: every loop capped by the pixel count, inflate-
  * free, recursion depth fixed at 1, malformed input nulls and never
  * throws.
  */
object WebpVp8l {

  private val MaxPixels = 1 << 24 // 16M pixels ≈ 64 MB ARGB

  // ---------------------------------------------------------------
  // bit reader (LSB-first)
  // ---------------------------------------------------------------
  private final class Br(val b: Array[Byte], startByte: Int) {
    private var bitPos: Long = startByte.toLong * 8
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bi = (bitPos >>> 3).toInt
        if (bi >= b.length) sys.error("bitstream overrun")
        v |= ((b(bi) >> (bitPos & 7).toInt) & 1) << i
        bitPos += 1
        i += 1
      }
      v
    }
    def bit(): Int = bits(1)
  }

  // ---------------------------------------------------------------
  // canonical prefix codes (RFC 1951 assignment, bit-by-bit decode)
  // ---------------------------------------------------------------
  /** trie as parallel int arrays: child0/child1 (>0 node index,
    * -1 empty) and leaf symbol (-1 internal). Index 0 is the root.
    */
  private object Tree {
    /** simple-code trees: codes are assigned by LISTED symbol order
      * (symbols[0] → 0, symbols[1] → 1), NOT canonically — a reversed
      * pair (s0 > s1) must keep its listed codes
      */
    def explicit(pairs: Seq[(Int, Int, Int)]): Tree = {
      val t = new Tree(null)
      pairs.foreach { case (code, len, sym) => t.insert(code, len, sym) }
      t
    }
  }

  private final class Tree(lengths0: Array[Int]) {
    private val lengths =
      if (lengths0 != null) lengths0 else new Array[Int](0)
    private var child0 = new Array[Int](64)
    private var child1 = new Array[Int](64)
    private var symbol = new Array[Int](64)
    private var nNodes = 1
    java.util.Arrays.fill(child0, -1); java.util.Arrays.fill(child1, -1)
    java.util.Arrays.fill(symbol, -1)

    /** 0-bit degenerate code: exactly one used symbol */
    val single: Int = if (lengths0 == null) -1 else {
      var cnt = 0; var s = -1
      var i = 0
      while (i < lengths.length) {
        if (lengths(i) > 0) { cnt += 1; s = i }
        i += 1
      }
      if (cnt == 0) sys.error("empty code")
      if (cnt == 1) s else -1
    }

    if (lengths0 != null && single < 0) {
      // canonical codes: count lengths, then first-code per length
      val maxLen = lengths.max
      if (maxLen > 15) sys.error("code length > 15")
      val blCount = new Array[Int](maxLen + 1)
      lengths.foreach(l => if (l > 0) blCount(l) += 1)
      val nextCode = new Array[Int](maxLen + 2)
      var code = 0
      var l = 1
      while (l <= maxLen) {
        code = (code + blCount(l - 1)) << 1
        nextCode(l) = code
        l += 1
      }
      // Kraft check: over-subscription is a structural error
      var kraft = 0L
      lengths.foreach(len => if (len > 0) kraft += 1L << (maxLen - len))
      if (kraft > (1L << maxLen)) sys.error("over-subscribed code")
      var s = 0
      while (s < lengths.length) {
        val len = lengths(s)
        if (len > 0) {
          val c = nextCode(len); nextCode(len) += 1
          insert(c, len, s)
        }
        s += 1
      }
    }

    private def grow(): Unit = {
      val n2 = nNodes * 2
      child0 = java.util.Arrays.copyOf(child0, n2)
      child1 = java.util.Arrays.copyOf(child1, n2)
      symbol = java.util.Arrays.copyOf(symbol, n2)
      java.util.Arrays.fill(child0, nNodes, n2, -1)
      java.util.Arrays.fill(child1, nNodes, n2, -1)
      java.util.Arrays.fill(symbol, nNodes, n2, -1)
    }

    private def insert(code: Int, len: Int, sym: Int): Unit = {
      var node = 0
      var i = len - 1
      while (i >= 0) {
        val bit = (code >> i) & 1
        // grow BEFORE selecting the child array: grow() replaces the
        // arrays, so a reference captured earlier would go stale and
        // the new edge would land in the discarded copy
        if (nNodes + 1 > symbol.length) grow()
        val kids = if (bit == 0) child0 else child1
        if (kids(node) < 0) {
          kids(node) = nNodes
          nNodes += 1
        }
        node = kids(node)
        if (symbol(node) >= 0) sys.error("prefix conflict")
        i -= 1
      }
      if (child0(node) >= 0 || child1(node) >= 0) sys.error("prefix conflict")
      symbol(node) = sym
    }

    def read(br: Br): Int = {
      if (single >= 0) return single
      var node = 0
      var steps = 0
      while (symbol(node) < 0) {
        node = if (br.bit() == 0) child0(node) else child1(node)
        if (node < 0) sys.error("invalid code")
        steps += 1
        if (steps > 15) sys.error("code walk too deep")
      }
      symbol(node)
    }
  }

  private val CodeLengthOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def readCode(br: Br, alphabet: Int): Tree = {
    val lengths = new Array[Int](alphabet)
    if (br.bit() == 1) { // simple code
      val nSym = br.bit() + 1
      val first8 = br.bit()
      val s0 = br.bits(if (first8 == 1) 8 else 1)
      if (s0 >= alphabet) sys.error("simple symbol out of range")
      if (nSym == 2) {
        val s1 = br.bits(8)
        if (s1 >= alphabet) sys.error("simple symbol out of range")
        if (s1 == s0) sys.error("duplicate simple symbol")
        // listed order IS the code assignment (s0 → 0, s1 → 1)
        Tree.explicit(Seq((0, 1, s0), (1, 1, s1)))
      } else {
        lengths(s0) = 1 // collapses to the 0-bit single case
        new Tree(lengths)
      }
    } else { // normal: code-length code then lengths
      val nClc = 4 + br.bits(4)
      val clcLengths = new Array[Int](19)
      var i = 0
      while (i < nClc) {
        clcLengths(CodeLengthOrder(i)) = br.bits(3)
        i += 1
      }
      val clc = new Tree(clcLengths)
      var maxSymbol =
        if (br.bit() == 1) {
          val nbits = 2 + 2 * br.bits(3)
          2 + br.bits(nbits)
        } else alphabet
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabet) {
        if (maxSymbol == 0) {
          // remaining symbols are zero-length
          symbol = alphabet
        } else {
          maxSymbol -= 1
          val cl = clc.read(br)
          if (cl < 16) {
            lengths(symbol) = cl
            symbol += 1
            if (cl != 0) prevLen = cl
          } else {
            val (repeat, usePrev) = cl match {
              case 16 => (3 + br.bits(2), true)
              case 17 => (3 + br.bits(3), false)
              case _ => (11 + br.bits(7), false)
            }
            var r = 0
            while (r < repeat) {
              if (symbol >= alphabet) sys.error("repeat overruns alphabet")
              lengths(symbol) = if (usePrev) prevLen else 0
              symbol += 1
              r += 1
            }
          }
        }
      }
      new Tree(lengths)
    }
  }

  // ---------------------------------------------------------------
  // LZ77 prefix coding + the 2D proximity distance map
  // ---------------------------------------------------------------
  private def prefixDecode(br: Br, code: Int): Int = {
    if (code < 4) return code + 1
    val extra = (code - 2) >> 1
    val offset = (2 + (code & 1)) << extra
    offset + br.bits(extra) + 1
  }

  /** the spec's 120-entry (dx, dy) neighborhood list for distance
    * codes 1–120 (validated end-to-end by the libwebp goldens —
    * real encodes use these codes heavily)
    */
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private def planeCodeToDistance(w: Int, code: Int): Int = {
    if (code > 120) code - 120
    else {
      val (dx, dy) = DistMap(code - 1)
      val d = dy * w + dx
      if (d < 1) 1 else d
    }
  }

  // ---------------------------------------------------------------
  // entropy-coded image decode (shared by main image + sub-images)
  // ---------------------------------------------------------------
  private final case class Group(green: Tree, red: Tree, blue: Tree,
                                 alpha: Tree, dist: Tree)

  /** decode an entropy-coded ARGB image of w×h. `level0` gates the
    * meta-prefix recursion (sub-images never recurse).
    */
  private def decodeEntropyImage(br: Br, w: Int, h: Int, level0: Boolean): Array[Int] = {
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) sys.error("size bound")
    val ccBits = if (br.bit() == 1) br.bits(4) else 0
    if (ccBits > 11) sys.error("color cache bits out of range")
    val ccSize = if (ccBits > 0) 1 << ccBits else 0
    val cache = if (ccBits > 0) new Array[Int](ccSize) else null

    var metaBits = 0
    var meta: Array[Int] = null
    var nGroups = 1
    if (level0 && br.bit() == 1) {
      metaBits = br.bits(3) + 2
      val mw = (w + (1 << metaBits) - 1) >> metaBits
      val mh = (h + (1 << metaBits) - 1) >> metaBits
      meta = decodeEntropyImage(br, mw, mh, level0 = false)
      var mx = 0
      var i = 0
      while (i < meta.length) {
        val g = ((meta(i) >> 8) & 0xFFFF)
        if (g > mx) mx = g
        i += 1
      }
      nGroups = mx + 1
      if (nGroups > 1024) sys.error("too many prefix groups")
    }

    val groups = new Array[Group](nGroups)
    var gi = 0
    while (gi < nGroups) {
      groups(gi) = Group(
        readCode(br, 256 + 24 + ccSize),
        readCode(br, 256), readCode(br, 256), readCode(br, 256),
        readCode(br, 40))
      gi += 1
    }

    val out = new Array[Int](w * h)
    val mw = if (meta != null) (w + (1 << metaBits) - 1) >> metaBits else 0
    var pos = 0
    val n = out.length
    def insertCache(p: Int): Unit =
      if (cache != null) cache((0x1e35a7bd * p) >>> (32 - ccBits)) = p
    while (pos < n) {
      val x = pos % w
      val y = pos / w
      val g =
        if (meta == null) groups(0)
        else {
          val mi = (y >> metaBits) * mw + (x >> metaBits)
          groups((meta(mi) >> 8) & 0xFFFF)
        }
      val s = g.green.read(br)
      if (s < 256) {
        val red = g.red.read(br)
        val blue = g.blue.read(br)
        val alpha = g.alpha.read(br)
        val p = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = p
        insertCache(p)
        pos += 1
      } else if (s < 256 + 24) {
        val len = prefixDecode(br, s - 256)
        val dcode = g.dist.read(br)
        val dist = planeCodeToDistance(w, prefixDecode(br, dcode))
        if (dist > pos) sys.error("distance before image start")
        if (pos + len > n) sys.error("copy overruns image")
        var k = 0
        while (k < len) {
          val p = out(pos - dist)
          out(pos) = p
          insertCache(p)
          pos += 1
          k += 1
        }
      } else {
        if (cache == null) sys.error("cache symbol without cache")
        val idx = s - 256 - 24
        if (idx >= ccSize) sys.error("cache index out of range")
        val p = cache(idx)
        out(pos) = p
        pos += 1
        // (a cache hit re-inserts the same value: no-op)
      }
    }
    out
  }

  // ---------------------------------------------------------------
  // transforms
  // ---------------------------------------------------------------
  private sealed trait Transform { def applyInverse(argb: Array[Int], w: Int, h: Int): (Array[Int], Int) }

  /** channel helpers */
  @inline private def a(p: Int) = (p >>> 24) & 0xFF
  @inline private def r(p: Int) = (p >>> 16) & 0xFF
  @inline private def g(p: Int) = (p >>> 8) & 0xFF
  @inline private def b(p: Int) = p & 0xFF
  @inline private def pack(aa: Int, rr: Int, gg: Int, bb: Int) =
    ((aa & 0xFF) << 24) | ((rr & 0xFF) << 16) | ((gg & 0xFF) << 8) | (bb & 0xFF)

  private def avg2(p1: Int, p2: Int): Int =
    pack((a(p1) + a(p2)) / 2, (r(p1) + r(p2)) / 2,
      (g(p1) + g(p2)) / 2, (b(p1) + b(p2)) / 2)

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private final class PredictorT(bits: Int, tiles: Array[Int], tw: Int) extends Transform {
    def applyInverse(argb: Array[Int], w: Int, h: Int): (Array[Int], Int) = {
      var y = 0
      var pos = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val pred =
            if (x == 0 && y == 0) 0xFF000000
            else if (y == 0) argb(pos - 1) // top row: left
            else if (x == 0) argb(pos - w) // left column: top
            else {
              val mode = (tiles((y >> bits) * tw + (x >> bits)) >> 8) & 0xFF
              val left = argb(pos - 1)
              val top = argb(pos - w)
              val tl = argb(pos - w - 1)
              // spec quirk: the top-right of the last column is the
              // first pixel of the CURRENT row (contiguous buffer)
              val tr = if (x == w - 1) argb(y * w) else argb(pos - w + 1)
              predict(mode, left, top, tl, tr)
            }
          argb(pos) = pack(a(argb(pos)) + a(pred), r(argb(pos)) + r(pred),
            g(argb(pos)) + g(pred), b(argb(pos)) + b(pred))
          pos += 1
          x += 1
        }
        y += 1
      }
      (argb, w)
    }

    private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int = mode match {
      case 0 => 0xFF000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => // Select
        val pa = a(l) + a(t) - a(tl); val pr = r(l) + r(t) - r(tl)
        val pg = g(l) + g(t) - g(tl); val pb = b(l) + b(t) - b(tl)
        val pL = math.abs(pa - a(l)) + math.abs(pr - r(l)) +
          math.abs(pg - g(l)) + math.abs(pb - b(l))
        val pT = math.abs(pa - a(t)) + math.abs(pr - r(t)) +
          math.abs(pg - g(t)) + math.abs(pb - b(t))
        if (pL < pT) l else t
      case 12 => // ClampAddSubtractFull
        pack(clamp255(a(l) + a(t) - a(tl)), clamp255(r(l) + r(t) - r(tl)),
          clamp255(g(l) + g(t) - g(tl)), clamp255(b(l) + b(t) - b(tl)))
      case 13 => // ClampAddSubtractHalf
        def ch(c: Int, d: Int): Int = clamp255(c + (c - d) / 2)
        val av = avg2(l, t)
        pack(ch(a(av), a(tl)), ch(r(av), r(tl)), ch(g(av), g(tl)), ch(b(av), b(tl)))
      case _ => sys.error(s"predictor mode $mode")
    }
  }

  private final class ColorT(bits: Int, tiles: Array[Int], tw: Int) extends Transform {
    @inline private def delta(t: Int, c: Int): Int = ((t.toByte * c.toByte) >> 5)
    def applyInverse(argb: Array[Int], w: Int, h: Int): (Array[Int], Int) = {
      var pos = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val tile = tiles((y >> bits) * tw + (x >> bits))
          val g2r = tile & 0xFF
          val g2b = (tile >> 8) & 0xFF
          val r2b = (tile >> 16) & 0xFF
          val p = argb(pos)
          val gg = g(p)
          var rr = r(p) + delta(g2r, (gg << 24) >> 24)
          rr &= 0xFF
          var bb = b(p) + delta(g2b, (gg << 24) >> 24) +
            delta(r2b, (rr << 24) >> 24)
          bb &= 0xFF
          argb(pos) = pack(a(p), rr, gg, bb)
          pos += 1
          x += 1
        }
        y += 1
      }
      (argb, w)
    }
  }

  private object SubtractGreenT extends Transform {
    def applyInverse(argb: Array[Int], w: Int, h: Int): (Array[Int], Int) = {
      var i = 0
      while (i < argb.length) {
        val p = argb(i)
        val gg = g(p)
        argb(i) = pack(a(p), (r(p) + gg) & 0xFF, gg, (b(p) + gg) & 0xFF)
        i += 1
      }
      (argb, w)
    }
  }

  private final class IndexT(palette: Array[Int], widthBits: Int, fullW: Int) extends Transform {
    def applyInverse(argb: Array[Int], w: Int, h: Int): (Array[Int], Int) = {
      val out = new Array[Int](fullW * h)
      val perPack = 1 << widthBits
      val bitsPer = 8 >> widthBits
      val mask = (1 << bitsPer) - 1
      var y = 0
      while (y < h) {
        var x = 0
        while (x < fullW) {
          val packed = argb(y * w + (x >> widthBits))
          val shift = (x % perPack) * bitsPer
          val idx = (g(packed) >> shift) & mask
          out(y * fullW + x) = if (idx < palette.length) palette(idx) else 0
          x += 1
        }
        y += 1
      }
      (out, fullW)
    }
  }

  // ---------------------------------------------------------------
  // top level
  // ---------------------------------------------------------------
  /** decode the VP8L payload (after the RIFF walk) to ARGB */
  private def decodeVp8l(data: Array[Byte], off: Int): (Array[Int], Int, Int) = {
    if (off >= data.length || (data(off) & 0xFF) != 0x2F) sys.error("bad VP8L signature")
    val br = new Br(data, off + 1)
    val w0 = br.bits(14) + 1
    val h0 = br.bits(14) + 1
    br.bit() // alpha hint
    if (br.bits(3) != 0) sys.error("VP8L version != 0")
    if (w0.toLong * h0 > MaxPixels) sys.error("size bound")

    // transforms (level 0 only), each at most once
    var curW = w0
    val transforms = scala.collection.mutable.ArrayBuffer.empty[Transform]
    val seen = new Array[Boolean](4)
    while (br.bit() == 1) {
      val t = br.bits(2)
      if (seen(t)) sys.error("transform repeated")
      seen(t) = true
      t match {
        case 0 | 1 =>
          val bits = br.bits(3) + 2
          val tw = (curW + (1 << bits) - 1) >> bits
          val th = (h0 + (1 << bits) - 1) >> bits
          val tiles = decodeEntropyImage(br, tw, th, level0 = false)
          transforms += (if (t == 0) new PredictorT(bits, tiles, tw)
                         else new ColorT(bits, tiles, tw))
        case 2 => transforms += SubtractGreenT
        case 3 =>
          val pSize = br.bits(8) + 1
          val pRaw = decodeEntropyImage(br, pSize, 1, level0 = false)
          // palette entries are component-wise deltas off the previous
          val palette = new Array[Int](pSize)
          var prev = 0
          var i = 0
          while (i < pSize) {
            palette(i) = pack(a(pRaw(i)) + a(prev), r(pRaw(i)) + r(prev),
              g(pRaw(i)) + g(prev), b(pRaw(i)) + b(prev))
            prev = palette(i)
            i += 1
          }
          val widthBits =
            if (pSize <= 2) 3 else if (pSize <= 4) 2 else if (pSize <= 16) 1 else 0
          transforms += new IndexT(palette, widthBits, curW)
          curW = (curW + (1 << widthBits) - 1) >> widthBits
      }
    }

    var argb = decodeEntropyImage(br, curW, h0, level0 = true)
    var w = curW
    var ti = transforms.length - 1
    while (ti >= 0) {
      val (na, nw) = transforms(ti).applyInverse(argb, w, h0)
      argb = na; w = nw
      ti -= 1
    }
    if (w != w0) sys.error("width mismatch after transforms")
    (argb, w0, h0)
  }

  /** RIFF walk → first VP8L chunk; null for lossy/animated-only/bad */
  def decodeArgbOrNull(bytes: Array[Byte]): (Array[Int], Int, Int) =
    try decodeArgbOrThrow(bytes) catch { case NonFatal(_) => null }

  /** throwing variant (spec/tooling diagnostics only) */
  private[graft] def decodeArgbOrThrow(bytes: Array[Byte]): (Array[Int], Int, Int) = {
    {
      if (bytes == null || bytes.length < 20) return null
      if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
          bytes(8) != 'W' || bytes(9) != 'E' || bytes(10) != 'B' || bytes(11) != 'P')
        return null
      var p = 12
      while (p + 8 <= bytes.length) {
        val fourcc = new String(bytes, p, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
        val size = (bytes(p + 4) & 0xFF) | ((bytes(p + 5) & 0xFF) << 8) |
          ((bytes(p + 6) & 0xFF) << 16) | ((bytes(p + 7) & 0xFF) << 24)
        if (size < 0 || p + 8 + size > bytes.length) return null
        if (fourcc == "VP8L") return decodeVp8l(bytes, p + 8)
        // "VP8 " (lossy) → unsupported (documented defer); keep
        // scanning in case of extended files carrying both
        p += 8 + size + (size & 1)
      }
      null
    }
  }

  /** Rec.601 luminance plane (the [[Images]] convention; alpha
    * ignored like the PNG path)
    */
  def decodeGrayOrNull(bytes: Array[Byte]): (Array[Double], Int, Int) = {
    val d = decodeArgbOrNull(bytes)
    if (d == null) return null
    val (argb, w, h) = d
    val out = new Array[Double](argb.length)
    var i = 0
    while (i < argb.length) {
      val p = argb(i)
      out(i) = 0.299 * r(p) + 0.587 * g(p) + 0.114 * b(p)
      i += 1
    }
    (out, w, h)
  }
}
