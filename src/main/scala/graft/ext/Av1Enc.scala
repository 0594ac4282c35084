package graft.ext

/** Test-side AV1 lossless keyframe ENCODER — the independent-writer
  * half of the two-validator convention (like [[Vp8Fixtures]] /
  * [[WebpFixtures]]): it emits real CodedLossless AV1 OBU streams
  * from gray pixel planes that [[Av1Decode]] (and dav1d — asserted
  * in the prototype harness) reconstruct bit-exactly.
  *
  * Restricted, deterministic layout: every block 8x8 / DC / non-skip
  * with chroma flat at 128, dimensions multiples of 8.  The encoder
  * mirrors the decoder's context machinery exactly (partition tree
  * incl. frame-edge split bools, skip/mode/filter-intra syntax,
  * coefficient contexts, CDF adaptation) and carries arbitrary
  * residuals through the exact forward Walsh–Hadamard inverse of the
  * decoder's reconstruction — so ANY gray image round-trips
  * losslessly.  Av1DecodeSpec asserts the round-trip; the q84 image
  * family consumes these as AVIF plants.
  */
object Av1Enc {

  // ------------------------------------------------------ bit writer
  private final class Bw {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def f(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i -= 1
      }
    }
    def trailing(): Unit = { f(1, 1); while (n != 0) f(0, 1) }
    def align(): Unit = while (n != 0) f(0, 1)
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  // ----------------------------------------------------- od_ec coder
  /** arithmetic ENCODER mirroring [[Av1Decode]]'s MSAC reader: same
    * boundary math, same CDF adaptation (on its own table clones)
    */
  private final class EncMsac {
    private var low: Long = 0
    private var rng: Int = 0x8000
    private var cnt: Int = -9
    private val pre = scala.collection.mutable.ArrayBuffer[Int]()

    private def scaled(r: Int, f: Int): Int = ((r >> 8) * (f >> 6)) >> 1

    def encode(tab: Array[Short], base: Int, nsyms: Int, s: Int): Unit = {
      val r = rng
      val fS = if (s < nsyms - 1) tab(base + s) & 0xFFFF else 0
      val v = scaled(r, fS) + 4 * (nsyms - s - 1)
      if (s > 0) {
        val fU = tab(base + s - 1) & 0xFFFF
        val u = scaled(r, fU) + 4 * (nsyms - s)
        low += r - u
        rng = u - v
      } else rng = r - v
      normalize()
    }

    def symbol(tab: Array[Short], base: Int, nsyms: Int, s: Int): Unit = {
      encode(tab, base, nsyms, s)
      val c0 = tab(base + nsyms) & 0xFFFF
      val rate = 3 + (if (c0 > 15) 1 else 0) + (if (c0 > 31) 1 else 0) +
        (if (nsyms <= 3) 1 else 2)
      var i = 0
      while (i < nsyms - 1) {
        val cur = tab(base + i) & 0xFFFF
        val tmp = if (i >= s) 0 else 32768
        val nv = if (tmp < cur) cur - ((cur - tmp) >> rate)
                 else cur + ((tmp - cur) >> rate)
        tab(base + i) = nv.toShort
        i += 1
      }
      tab(base + nsyms) = (c0 + (if (c0 < 32) 1 else 0)).toShort
    }

    /** bool with explicit icdf probability (split_or_* gathers) */
    def boolProb(ps: Int, bit: Int): Unit = {
      val r = rng
      val v = scaled(r, if (bit == 1) 0 else ps) + 4 * (if (bit == 1) 0 else 1)
      if (bit == 1) {
        val u = scaled(r, ps) + 4
        low += r - u
        rng = u - v
      } else rng = r - v
      normalize()
    }

    def boolEqui(bit: Int): Unit = {
      val r = rng
      if (bit == 1) {
        val u = scaled(r, 16384) + 4
        low += r - u
        rng = u
      } else rng = r - (scaled(r, 16384) + 4)
      normalize()
    }

    def golomb(v: Int): Unit = {
      val x = v + 1
      val length = 32 - Integer.numberOfLeadingZeros(x)
      var i = 0
      while (i < length - 1) { boolEqui(0); i += 1 }
      boolEqui(1) // MSB of x
      i = length - 2
      while (i >= 0) { boolEqui((x >> i) & 1); i -= 1 }
    }

    private def normalize(): Unit = {
      val d = 16 - (32 - Integer.numberOfLeadingZeros(rng))
      var s = cnt + d
      if (s >= 0) {
        var c = cnt + 16
        var m = (1L << c) - 1
        if (s >= 8) {
          pre += ((low >> c) & 0xFFFF).toInt
          low &= m
          c -= 8
          m >>= 8
        }
        pre += ((low >> c) & 0xFFFF).toInt
        s = c + d - 24
        low &= m
      }
      low <<= d
      rng <<= d
      cnt = s
    }

    def done(): Array[Byte] = {
      val l = low
      var c = cnt
      var s = 10 + c
      val m = 0x3FFFL
      var e = ((l + m) & ~m) | (m + 1)
      val fin = scala.collection.mutable.ArrayBuffer[Int](pre.toSeq: _*)
      if (s > 0) {
        var n = (1L << (c + 16)) - 1
        var go = true
        while (go) {
          fin += ((e >> (c + 16)) & 0xFFFF).toInt
          e &= n
          s -= 8; c -= 8; n >>= 8
          if (s <= 0) go = false
        }
      }
      val out = new Array[Byte](fin.length)
      var carry = 0
      var i = fin.length - 1
      while (i >= 0) {
        val v = fin(i) + carry
        out(i) = (v & 0xFF).toByte
        carry = v >> 8
        i -= 1
      }
      out
    }
  }

  // ---------------------------------------------------- OBU wrappers
  private def leb128(v: Int): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    var x = v
    var go = true
    while (go) {
      val b = x & 0x7F
      x >>= 7
      if (x != 0) out += (b | 0x80).toByte else { out += b.toByte; go = false }
    }
    out.toArray
  }

  private def obu(t: Int, payload: Array[Byte]): Array[Byte] =
    Array(((t << 3) | 2).toByte) ++ leb128(payload.length) ++ payload

  private def seqObu(w: Int, h: Int): Array[Byte] = {
    val bw = new Bw
    bw.f(0, 3) // profile
    bw.f(1, 1) // still picture
    bw.f(1, 1) // reduced header
    bw.f(0, 5) // level
    val wb = math.max(32 - Integer.numberOfLeadingZeros(w - 1), 1)
    val hb = math.max(32 - Integer.numberOfLeadingZeros(h - 1), 1)
    bw.f(wb - 1, 4); bw.f(hb - 1, 4)
    bw.f(w - 1, wb); bw.f(h - 1, hb)
    bw.f(1, 1) // use_128x128_superblock
    bw.f(1, 1) // enable_filter_intra
    bw.f(1, 1) // enable_intra_edge_filter
    bw.f(0, 1); bw.f(0, 1); bw.f(0, 1) // superres cdef restoration
    bw.f(0, 1) // high bitdepth
    bw.f(0, 1) // monochrome
    bw.f(0, 1) // color description present
    bw.f(0, 1) // color range
    bw.f(0, 2) // chroma sample position
    bw.f(0, 1) // separate uv delta q
    bw.f(0, 1) // film grain
    bw.trailing()
    obu(1, bw.bytes)
  }

  private def frameObu(w: Int, h: Int, tile: Array[Byte]): Array[Byte] = {
    val bw = new Bw
    bw.f(0, 1) // disable_cdf_update
    bw.f(0, 1) // allow_screen_content_tools
    bw.f(0, 1) // render_and_frame_size_different
    bw.f(1, 1) // uniform tile spacing
    val miCols = 2 * ((w + 7) >> 3)
    val miRows = 2 * ((h + 7) >> 3)
    val sbCols = (miCols + 31) >> 5
    val sbRows = (miRows + 31) >> 5
    def tlog2(b: Int, t: Int): Int = {
      var k = 0
      while ((b << k) < t) k += 1
      k
    }
    if (tlog2(1, math.min(sbCols, 64)) > 0) bw.f(0, 1)
    if (tlog2(1, math.min(sbRows, 64)) > 0) bw.f(0, 1)
    bw.f(0, 8) // base_q_idx
    bw.f(0, 1); bw.f(0, 1); bw.f(0, 1) // delta q y / u dc / u ac
    bw.f(0, 1) // using_qmatrix
    bw.f(0, 1) // segmentation
    bw.f(0, 1) // reduced_tx_set
    bw.align()
    obu(6, bw.bytes ++ tile)
  }

  // ------------------------------------------------------- transform
  /** exact inverse of the decoder's lossless 4x4 iWHT (cols undone
    * first, then rows); spec-asserted by round-trip in Av1DecodeSpec
    */
  private def fwht(resid: Array[Int]): Array[Int] = {
    def inv(o0: Int, o1: Int, o2: Int, o3: Int): (Int, Int, Int, Int) = {
      val s = o0 + o1
      val t = o3 - o2
      val e = (s - t) >> 1
      val in3 = e - o1
      val in1 = e - o2
      val in0 = s - in1
      val in2 = t + in3
      (in0, in1, in2, in3)
    }
    val tmp = new Array[Int](16)
    var j = 0
    while (j < 4) {
      val (a, b, c, d) = inv(resid(j), resid(4 + j), resid(8 + j), resid(12 + j))
      tmp(j) = a; tmp(4 + j) = b; tmp(8 + j) = c; tmp(12 + j) = d
      j += 1
    }
    val q = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val (a, b, c, d) = inv(tmp(i * 4), tmp(i * 4 + 1), tmp(i * 4 + 2), tmp(i * 4 + 3))
      q(i * 4) = a; q(i * 4 + 1) = b; q(i * 4 + 2) = c; q(i * 4 + 3) = d
      i += 1
    }
    q
  }

  /** the decoder's iWHT, for recon mirroring */
  private def iwht(q: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      var a1 = q(i * 4); var c1 = q(i * 4 + 1)
      var d1 = q(i * 4 + 2); var b1 = q(i * 4 + 3)
      a1 += c1; d1 -= b1
      val e1 = (a1 - d1) >> 1
      b1 = e1 - b1; c1 = e1 - c1
      a1 -= b1; d1 += c1
      tmp(i * 4) = a1; tmp(i * 4 + 1) = b1; tmp(i * 4 + 2) = c1; tmp(i * 4 + 3) = d1
      i += 1
    }
    val out = new Array[Int](16)
    var j = 0
    while (j < 4) {
      var a1 = tmp(j); var c1 = tmp(4 + j)
      var d1 = tmp(8 + j); var b1 = tmp(12 + j)
      a1 += c1; d1 -= b1
      val e1 = (a1 - d1) >> 1
      b1 = e1 - b1; c1 = e1 - c1
      a1 -= b1; d1 += c1
      out(j) = a1; out(4 + j) = b1; out(8 + j) = c1; out(12 + j) = d1
      j += 1
    }
    out
  }

  // --------------------------------------------------------- encoder
  private val SkipContexts = Array(
    Array(1, 2, 2, 2, 3), Array(1, 4, 4, 4, 5), Array(1, 4, 4, 4, 5),
    Array(1, 4, 4, 4, 5), Array(1, 4, 4, 4, 6))
  private val NzOff4x4 =
    Array(0, 1, 6, 6, 1, 6, 6, 21, 6, 6, 21, 21, 6, 21, 21, 21)
  private val P_HORZ = 1
  private val P_VERT = 2
  private val P_SPLIT = 3

  /** Encode `gray(w*h)` (values 0..255, w/h multiples of 8) as a
    * CodedLossless AV1 still (4:2:0, chroma flat 128).
    */
  def encodeGray(gray: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0 && gray.length == w * h)
    new Enc(gray, w, h).stream()
  }

  private final class Enc(gray: Array[Int], w: Int, h: Int) {
    private val miCols = 2 * ((w + 7) >> 3)
    private val miRows = 2 * ((h + 7) >> 3)
    private val lw = miCols * 4
    private val lh = miRows * 4
    private val recon = new Array[Int](lw * lh)
    private val abovePart = new Array[Int](miCols)
    private val leftPart = new Array[Int](32)
    private val aboveLvl = new Array[Int](miCols)
    private val leftLvl = new Array[Int](miRows)
    private val aboveDc = new Array[Int](miCols)
    private val leftDc = new Array[Int](miRows)
    private val e = new EncMsac
    // table clones (adaptation state mirrors the decoder's)
    private val cPart = Av1Tables.Partition.clone()
    private val cSkip = Av1Tables.Skip.clone()
    private val cKfY = Av1Tables.KfYMode.clone()
    private val cUv = Av1Tables.UvMode.clone()
    private val cFi = Av1Tables.FilterIntra.clone()
    private val cTsk = Av1Tables.TxbSkip.clone()
    private val cEob16 = Av1Tables.EobPt16.clone()
    private val cEobEx = Av1Tables.EobExtra.clone()
    private val cBeob = Av1Tables.CoeffBaseEob.clone()
    private val cBase = Av1Tables.CoeffBase.clone()
    private val cBr = Av1Tables.CoeffBr.clone()
    private val cDcs = Av1Tables.DcSign.clone()
    private val scan = Av1Tables.Scan4x4
    private val lvBuf = new Array[Int](36)

    /** target pixel (mi grid padded by edge replication) */
    private def px(y: Int, x: Int): Int =
      gray(math.min(y, h - 1) * w + math.min(x, w - 1))

    def stream(): Array[Byte] = {
      var sr = 0
      while (sr < miRows) {
        java.util.Arrays.fill(leftPart, 0)
        java.util.Arrays.fill(leftLvl, 0)
        java.util.Arrays.fill(leftDc, 0)
        var sc = 0
        while (sc < miCols) {
          encPartition(sr, sc, 32) // BLOCK_128X128 in mi units
          sc += 32
        }
        sr += 32
      }
      obu(2, Array.emptyByteArray) ++ seqObu(w, h) ++
        frameObu(w, h, e.done())
    }

    /** partition node of size w4 MI units: SPLIT down to 8x8 */
    private def encPartition(r: Int, c: Int, w4: Int): Unit = {
      if (r >= miRows || c >= miCols) return
      val hbs = w4 >> 1
      val bsl = 32 - Integer.numberOfLeadingZeros(w4 * 4) - 3
      val hasRows = (r + hbs) < miRows
      val hasCols = (c + hbs) < miCols
      val nsym = if (w4 == 2) 4 else if (w4 == 32) 8 else 10
      if (w4 == 2) {
        // 8x8 leaf: PARTITION_NONE
        val above = (abovePart(c) >> (bsl - 1)) & 1
        val left = (leftPart(r & 31) >> (bsl - 1)) & 1
        val ctx = (bsl - 1) * 4 + left * 2 + above
        e.symbol(cPart, ctx * 11, nsym, 0)
        encBlock(r, c)
        // leaf ctx update: 8x8 value (31<<1)&31 = 30 on both axes
        abovePart(c) = 30
        if (c + 1 < miCols) abovePart(c + 1) = 30
        leftPart(r & 31) = 30
        leftPart((r + 1) & 31) = 30
        return
      }
      if (hasRows && hasCols) {
        val above = (abovePart(c) >> (bsl - 1)) & 1
        val left = (leftPart(r & 31) >> (bsl - 1)) & 1
        val ctx = (bsl - 1) * 4 + left * 2 + above
        e.symbol(cPart, ctx * 11, nsym, P_SPLIT)
      } else if (hasCols) {
        gather(r, c, bsl, nsym, horz = true)
      } else if (hasRows) {
        gather(r, c, bsl, nsym, horz = false)
      } // else implied split, no symbol
      encPartition(r, c, hbs)
      encPartition(r, c + hbs, hbs)
      encPartition(r + hbs, c, hbs)
      encPartition(r + hbs, c + hbs, hbs)
    }

    /** split_or_horz / split_or_vert with the decoder's derived
      * probability; always encodes SPLIT (bit 1)
      */
    private def gather(r: Int, c: Int, bsl: Int, nsym: Int,
                       horz: Boolean): Unit = {
      val above = (abovePart(c) >> (bsl - 1)) & 1
      val left = (leftPart(r & 31) >> (bsl - 1)) & 1
      val base = ((bsl - 1) * 4 + left * 2 + above) * 11
      def prob(k: Int): Int = {
        val lo = if (k == 0) 32768 else cPart(base + k - 1) & 0xFFFF
        val hi = if (k >= nsym - 1) 0 else cPart(base + k) & 0xFFFF
        lo - hi
      }
      var ps =
        if (horz) prob(P_VERT) + prob(P_SPLIT) + prob(6) + prob(7) + prob(4)
        else prob(P_HORZ) + prob(P_SPLIT) + prob(4) + prob(5) + prob(6)
      if (nsym == 10) ps += (if (horz) prob(9) else prob(8))
      e.boolProb(ps, 1)
    }

    /** one 8x8 block: skip=0, DC luma, DC chroma, no filter-intra,
      * 4 luma txbs with exact residuals, chroma all-zero
      */
    private def encBlock(r: Int, c: Int): Unit = {
      // every block is non-skip DC with non-skip DC neighbors:
      // skip ctx 0, kf-y ctx (DC,DC) row 0, uv cfl-row for y=DC
      e.symbol(cSkip, 0, 2, 0)
      e.symbol(cKfY, 0, 13, 0)
      e.symbol(cUv, 13 * 15, 14, 0)
      e.symbol(cFi, 3 * 3, 2, 0) // BLOCK_8X8, use_filter_intra = 0
      // luma txbs raster
      var ty = 0
      while (ty < 2) {
        var tx = 0
        while (tx < 2) {
          encTxb(r * 4 + ty * 4, c * 4 + tx * 4,
            haveUp = r > 0 || ty > 0, haveLeft = c > 0 || tx > 0)
          tx += 1
        }
        ty += 1
      }
      // chroma: flat 128 -> all_zero, ctx 7 (chroma 4x4 == block)
      e.symbol(cTsk, 7 * 3, 2, 1)
      e.symbol(cTsk, 7 * 3, 2, 1)
    }

    private def encTxb(y: Int, x: Int, haveUp: Boolean,
                       haveLeft: Boolean): Unit = {
      // DC prediction from recon (mirrors the decoder exactly)
      var pred = 128
      if (haveUp && haveLeft) {
        var s = 0
        var i = 0
        while (i < 4) {
          s += recon((y - 1) * lw + x + i) + recon((y + i) * lw + x - 1)
          i += 1
        }
        pred = (s + 4) / 8
      } else if (haveUp) {
        var s = 0
        var i = 0
        while (i < 4) { s += recon((y - 1) * lw + x + i); i += 1 }
        pred = (s + 2) >> 2
      } else if (haveLeft) {
        var s = 0
        var i = 0
        while (i < 4) { s += recon((y + i) * lw + x - 1); i += 1 }
        pred = (s + 2) >> 2
      }
      val resid = new Array[Int](16)
      var i = 0
      while (i < 4) {
        var j = 0
        while (j < 4) {
          resid(i * 4 + j) = px(y + i, x + j) - pred
          j += 1
        }
        i += 1
      }
      val q = fwht(resid)
      val x4 = x >> 2
      val y4 = y >> 2
      // txb skip ctx (luma, tx < block)
      val top = math.min(aboveLvl(x4), 4)
      val left = math.min(leftLvl(y4), 4)
      val ctx = SkipContexts(math.min(top, left))(math.max(top, left))
      var eob = 0
      i = 15
      while (i >= 0 && eob == 0) {
        if (q(scan(i)) != 0) eob = i + 1
        i -= 1
      }
      if (eob == 0) {
        e.symbol(cTsk, ctx * 3, 2, 1)
        aboveLvl(x4) = 0; leftLvl(y4) = 0
        aboveDc(x4) = 0; leftDc(y4) = 0
        // recon = pred everywhere
        i = 0
        while (i < 4) {
          var j = 0
          while (j < 4) {
            recon((y + i) * lw + x + j) = clamp(pred)
            j += 1
          }
          i += 1
        }
        return
      }
      e.symbol(cTsk, ctx * 3, 2, 0)
      // eob coding
      val eobPt =
        if (eob == 1) 1 else if (eob == 2) 2
        else if (eob <= 4) 3 else if (eob <= 8) 4 else 5
      e.symbol(cEob16, 0, 5, eobPt - 1)
      if (eobPt >= 3) {
        val rem = eob - ((1 << (eobPt - 2)) + 1)
        e.symbol(cEobEx, (eobPt - 3) * 3, 2, (rem >> (eobPt - 3)) & 1)
        var sh = eobPt - 4
        while (sh >= 0) { e.boolEqui((rem >> sh) & 1); sh -= 1 }
      }
      // reverse scan: base + br chain
      java.util.Arrays.fill(lvBuf, 0)
      var ci = eob - 1
      while (ci >= 0) {
        val pos = scan(ci)
        val rr = pos >> 2
        val cc = pos & 3
        val level = math.min(math.abs(q(pos)), 15 + 0x7FFF) // uncapped magnitude
        val lvl15 = math.min(level, 15)
        if (ci == eob - 1) {
          val ctxE = if (ci == 0) 0 else if (ci <= 2) 1
                     else if (ci <= 4) 2 else 3
          e.symbol(cBeob, ctxE * 4, 3, math.min(level, 3) - 1)
        } else if (pos == 0) {
          e.symbol(cBase, 0, 4, math.min(level, 3))
        } else {
          val mag = math.min(lvBuf(rr * 6 + cc + 1), 3) +
            math.min(lvBuf((rr + 1) * 6 + cc), 3) +
            math.min(lvBuf((rr + 1) * 6 + cc + 1), 3) +
            math.min(lvBuf(rr * 6 + cc + 2), 3) +
            math.min(lvBuf((rr + 2) * 6 + cc), 3)
          val ctxB = math.min((mag + 1) >> 1, 4) + NzOff4x4(pos)
          e.symbol(cBase, ctxB * 5, 4, math.min(level, 3))
        }
        if (level > 2) {
          var magB = math.min(lvBuf(rr * 6 + cc + 1), 15) +
            math.min(lvBuf((rr + 1) * 6 + cc), 15) +
            math.min(lvBuf((rr + 1) * 6 + cc + 1), 15)
          magB = math.min((magB + 1) >> 1, 6)
          val ctxBr = if (pos == 0) magB
                      else if (rr < 2 && cc < 2) magB + 7
                      else magB + 14
          var remv = math.min(level, 15) - 3
          var idx = 0
          var stop = false
          while (idx < 4 && !stop) {
            val br = math.min(remv, 3)
            e.symbol(cBr, ctxBr * 5, 4, br)
            remv -= br
            if (br < 3) stop = true
            idx += 1
          }
        }
        lvBuf(rr * 6 + cc) = lvl15
        ci -= 1
      }
      // forward pass: signs + golomb tails
      var cul = 0
      var dcCat = 0
      ci = 0
      while (ci < eob) {
        val pos = scan(ci)
        val level = math.abs(q(pos))
        if (level != 0) {
          val sign = if (q(pos) < 0) 1 else 0
          if (ci == 0) {
            val a = aboveDc(x4)
            val l = leftDc(y4)
            val dcSum = (if (a == 2) 1 else if (a == 1) -1 else 0) +
              (if (l == 2) 1 else if (l == 1) -1 else 0)
            val sctx = if (dcSum == 0) 0 else if (dcSum < 0) 1 else 2
            e.symbol(cDcs, sctx * 3, 2, sign)
          } else e.boolEqui(sign)
          if (level > 14) e.golomb(level - 15)
        }
        cul += level
        if (ci == 0 && level > 0) dcCat = if (q(pos) < 0) 1 else 2
        ci += 1
      }
      aboveLvl(x4) = math.min(cul, 63)
      leftLvl(y4) = math.min(cul, 63)
      aboveDc(x4) = dcCat
      leftDc(y4) = dcCat
      // recon mirror
      val add = iwht(q)
      i = 0
      while (i < 4) {
        var j = 0
        while (j < 4) {
          recon((y + i) * lw + x + j) = clamp(pred + add(i * 4 + j))
          j += 1
        }
        i += 1
      }
    }

    private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  }

  /** split an encoded stream into (sequence-header OBU, frame OBUs) —
    * the Matroska AV1 mapping puts the former in av1C and the latter
    * in blocks
    */
  def splitObus(stream: Array[Byte]): (Array[Byte], Array[Byte]) = {
    var p = 0
    var seq: Array[Byte] = Array.emptyByteArray
    val frames = new java.io.ByteArrayOutputStream()
    while (p + 2 <= stream.length) {
      val hdr = stream(p) & 0xFF
      var q0 = p + 1
      var size = 0
      var sh = 0
      var go = true
      while (go) {
        val x = stream(q0) & 0xFF; q0 += 1
        size |= (x & 0x7F) << sh; sh += 7
        go = (x & 0x80) != 0
      }
      val t = (hdr >> 3) & 0xF
      if (t == 1) seq = java.util.Arrays.copyOfRange(stream, p, q0 + size)
      else if (t == 6) frames.write(stream, p, q0 + size - p)
      p = q0 + size
    }
    (seq, frames.toByteArray)
  }

  // ---------------------------------------------------- AVIF wrapper
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def boxB(tag: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.flatten.toArray
    be32(body.length + 8L) ++ tag.getBytes("US-ASCII") ++ body
  }

  /** Wrap an AV1 OBU stream as a minimal decodable AVIF: ftyp + meta
    * (pitm / iloc with an absolute-offset extent / iinf / iprp with
    * ispe + av1C) + mdat holding the OBUs.
    */
  def avifWrap(obus: Array[Byte], w: Int, h: Int): Array[Byte] = {
    // av1C: marker/version, profile|level, tier/depth/mono/subsampling
    // flags, presentation flags, then the configOBUs (the stream's
    // sequence header, so metadata triage works from the container)
    val seqObuBytes = {
      var p = 0
      var found: Array[Byte] = Array.emptyByteArray
      while (p + 2 <= obus.length && found.isEmpty) {
        val hdr = obus(p) & 0xFF
        var q0 = p + 1
        var size = 0
        var sh = 0
        var go = true
        while (go) {
          val x = obus(q0) & 0xFF; q0 += 1
          size |= (x & 0x7F) << sh; sh += 7
          go = (x & 0x80) != 0
        }
        if (((hdr >> 3) & 0xF) == 1)
          found = java.util.Arrays.copyOfRange(obus, p, q0 + size)
        p = q0 + size
      }
      found
    }
    val av1c = Array[Byte](0x81.toByte, 0x00, 0x0C, 0x00) ++ seqObuBytes
    val ispe = boxB("ispe", be32(0), be32(w.toLong), be32(h.toLong))
    val ipco = boxB("ipco", ispe, boxB("av1C", av1c))
    val ipma = boxB("ipma", be32(0), be32(1),
      Array[Byte](0, 1, 2, 0x01, 0x82.toByte))
    val iprp = boxB("iprp", ipco, ipma)
    val pitm = boxB("pitm", be32(0), Array[Byte](0, 1))
    val iinf = boxB("iinf", be32(0), Array[Byte](0, 1),
      boxB("infe", be32(0x02000000L), Array[Byte](0, 1, 0, 0),
        "av01".getBytes("US-ASCII"), Array[Byte](0)))
    val hdlr = boxB("hdlr", be32(0), be32(0),
      "pict".getBytes("US-ASCII"), new Array[Byte](12))
    // iloc needs the absolute mdat payload offset: compute with a
    // placeholder, then patch (layout is deterministic)
    def iloc(off: Long): Array[Byte] =
      boxB("iloc", be32(0), Array[Byte](0x44, 0x00, 0, 1),
        Array[Byte](0, 1, 0, 0, 0, 1),
        be32(off), be32(obus.length.toLong))
    val metaOf = boxB("meta", be32(0), hdlr, pitm, iloc(0), iinf, iprp)
    val ftyp = boxB("ftyp", "avif".getBytes("US-ASCII"), be32(0),
      "avifmif1miaf".getBytes("US-ASCII"))
    val mdatOff = ftyp.length + metaOf.length + 8L
    val meta = boxB("meta", be32(0), hdlr, pitm, iloc(mdatOff), iinf, iprp)
    ftyp ++ meta ++ boxB("mdat", obus)
  }

  /** Extract the primary item payload (the OBU stream) from an AVIF
    * produced by [[avifWrap]]-style single-extent absolute ilocs;
    * null when absent/malformed.
    */
  def avifPayloadOrNull(bytes: Array[Byte]): Array[Byte] = {
    try {
      if (bytes.length < 16) return null
      if (!(bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' &&
            bytes(7) == 'p' && bytes(8) == 'a' && bytes(9) == 'v' &&
            bytes(10) == 'i' && bytes(11) == 'f')) return null
      var p = 0
      def be(o: Int, n: Int): Long = {
        var v = 0L
        var i = 0
        while (i < n) { v = (v << 8) | (bytes(o + i) & 0xFF); i += 1 }
        v
      }
      // find meta, then iloc inside it
      var iloc = -1
      while (p + 8 <= bytes.length && iloc < 0) {
        val sz = be(p, 4).toInt
        val tag = new String(bytes, p + 4, 4, "US-ASCII")
        if (tag == "meta") {
          var q = p + 12 // fullbox
          val end = p + sz
          while (q + 8 <= end && iloc < 0) {
            val s2 = be(q, 4).toInt
            if (new String(bytes, q + 4, 4, "US-ASCII") == "iloc") iloc = q
            q += math.max(s2, 8)
          }
        }
        p += math.max(sz, 8)
      }
      if (iloc < 0) return null
      // version 0, offset_size=4 length_size=4 (avifWrap layout)
      val base = iloc + 12
      val sizes = bytes(base) & 0xFF
      if (sizes != 0x44) return null
      val itemCount = be(base + 2, 2).toInt
      if (itemCount < 1) return null
      // first item: id(2) dataRefIdx(2) extentCount(2) off(4) len(4)
      val off = be(base + 10, 4).toInt
      val len = be(base + 14, 4).toInt
      if (off < 0 || len <= 0 || off + len > bytes.length) return null
      java.util.Arrays.copyOfRange(bytes, off, off + len)
    } catch { case scala.util.control.NonFatal(_) => null }
  }
}
