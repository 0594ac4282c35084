package graft.ext

import scala.util.control.NonFatal

/** AV1 keyframe decoder — CodedLossless intra frames, profile 0,
  * 8-bit 4:2:0 (or monochrome), uniform tile grids.
  *
  * A from-scratch port of the spec's decode process (AV1 Bitstream &
  * Decoding Process Specification §5–§8): MSAC symbol decoder with
  * CDF adaptation, OBU/sequence/frame headers, the full partition
  * tree (including frame-edge implied splits and the split_or_horz /
  * split_or_vert derived-probability bools), all 13 intra modes with
  * angle deltas, CfL, filter-intra and the intra edge filter /
  * upsample, the coefficient syntax (eob symbols, base / base-eob,
  * the coeff_br chain, Exp-Golomb tails, sign coding) and the
  * lossless 4x4 Walsh–Hadamard reconstruction.
  *
  * Validated per-pixel against the two in-environment independent
  * implementations: Av1DecodeSpec replays the `data/av1_golden`
  * corpus (libaom encodes, dav1d-decoded YUV) bit-exactly — the same
  * two-validator convention as the VP8/VP8L decoders.  The
  * normative default-CDF tables ride in [[Av1Tables]] (generated,
  * cross-validated between both libraries).
  *
  * Scope boundary (documented, not silent): quantized (lossy)
  * frames, non-4:2:0 subsampling, high bit depth, partial tile
  * groups and inter frames return null.  That covers the lossless AVIF /
  * still corpus this engine's near-dup pipeline decodes; lossy DCT
  * paths are the next phase (scripts/av1_proto/STATUS.md).
  */
object Av1Decode {

  /** bounded-and-total contract on untrusted input (the VP8/VP8L
    * guard): reject frames whose pixel count could drive multi-GB
    * plane allocations before any tile data is validated
    */
  private val MaxPixels = 1 << 24

  final case class Frame(w: Int, h: Int, mono: Boolean,
                         y: Array[Byte], u: Array[Byte], v: Array[Byte])

  /** Decode a raw AV1 OBU stream (temporal unit).  Null on any
    * unsupported or malformed input.
    */
  def decodeOrNull(data: Array[Byte]): Frame = {
    try decode(data)
    catch { case NonFatal(_) => null }
  }

  /** luminance plane as row-major doubles for the image near-dup
    * pipeline ([[Images.grayPlaneOrNull]] AVIF route); null when the
    * stream is unsupported
    */
  def grayOrNull(data: Array[Byte]): (Array[Double], Int, Int) = {
    val f = decodeOrNull(data)
    if (f == null) return null
    val g = new Array[Double](f.w * f.h)
    var i = 0
    while (i < g.length) { g(i) = f.y(i) & 0xFF; i += 1 }
    (g, f.w, f.h)
  }

  // ----------------------------------------------------- block sizes
  // BLOCK_SIZES_ALL order (spec 6.10.4)
  private val BW = Array(4, 4, 8, 8, 8, 16, 16, 16, 32, 32, 32, 64, 64,
    64, 128, 128, 4, 16, 8, 32, 16, 64)
  private val BH = Array(4, 8, 4, 8, 16, 8, 16, 32, 16, 32, 64, 32, 64,
    128, 64, 128, 16, 4, 32, 8, 64, 16)
  private val BS_8X8 = 3
  private val BS_64X64 = 12
  private val BS_128X128 = 15

  private def findBs(w: Int, h: Int): Int = {
    var i = 0
    while (i < 22) {
      if (BW(i) == w && BH(i) == h) return i
      i += 1
    }
    sys.error(s"no bsize ${w}x$h")
  }

  // partition types
  private val P_NONE = 0
  private val P_HORZ = 1
  private val P_VERT = 2
  private val P_SPLIT = 3
  private val P_HORZ_A = 4
  private val P_HORZ_B = 5
  private val P_VERT_A = 6
  private val P_VERT_B = 7
  private val P_HORZ_4 = 8
  private val P_VERT_4 = 9

  private def subsize(part: Int, bs: Int): Int = {
    val w = BW(bs); val h = BH(bs)
    part match {
      case P_NONE => bs
      case P_HORZ | P_HORZ_A | P_HORZ_B => findBs(w, h / 2)
      case P_VERT | P_VERT_A | P_VERT_B => findBs(w / 2, h)
      case P_SPLIT => findBs(w / 2, h / 2)
      case P_HORZ_4 => findBs(w, h / 4)
      case P_VERT_4 => findBs(w / 4, h)
      case _ => sys.error("bad partition")
    }
  }

  // intra modes
  private val DC = 0
  private val V = 1
  private val PAETH = 12
  private val SMOOTH = 9
  private val SMOOTH_V = 10
  private val SMOOTH_H = 11
  private val CFL = 13
  // mode -> base prediction angle; 0 = non-directional
  private val ModeAngle =
    Array(0, 90, 180, 45, 135, 113, 157, 203, 67, 0, 0, 0, 0)
  private val IntraModeContext =
    Array(0, 1, 2, 3, 4, 4, 4, 4, 3, 0, 1, 2, 0)
  private val SkipContexts = Array(
    Array(1, 2, 2, 2, 3), Array(1, 4, 4, 4, 5), Array(1, 4, 4, 4, 5),
    Array(1, 4, 4, 4, 5), Array(1, 4, 4, 4, 6))
  private val NzOff4x4 =
    Array(0, 1, 6, 6, 1, 6, 6, 21, 6, 6, 21, 21, 6, 21, 21, 21)

  // --------------------------------------------------------- readers
  private final class Bits(b: Array[Byte], var pos: Int, val end: Int) {
    def f(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if ((pos >> 3) >= end) sys.error("header overrun")
        v = (v << 1) | ((b(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
  }

  /** MSAC symbol decoder (spec §8.2, od_ec window form).  CDF rows
    * live in flat arrays with the AOM layout (n-1 inverse-cumulative
    * boundaries, 0 terminator, adaptation counter); `symbol` adapts
    * in place.
    */
  private final class Msac(b: Array[Byte], off: Int, len: Int,
                           allowUpdate: Boolean) {
    private val W = 32
    private var bptr = off
    private val end = off + len
    var dif: Long = (1L << (W - 1)) - 1
    var rng: Int = 0x8000
    private var cnt: Int = -15
    refill()

    private def refill(): Unit = {
      var s = W - 9 - (cnt + 15)
      while (s >= 0 && bptr < end) {
        dif ^= (b(bptr) & 0xFFL) << s
        cnt += 8
        bptr += 1
        s -= 8
      }
      if (bptr >= end) cnt = 0x4000
    }

    private def normalize(nd: Long, nr: Int): Unit = {
      val d = 16 - (32 - Integer.numberOfLeadingZeros(nr))
      cnt -= d
      dif = (((nd + 1) << d) - 1) & ((1L << W) - 1)
      rng = nr << d
      if (cnt < 0) refill()
    }

    /** raw multi-symbol decode against an icdf row at tab(base..) */
    def decode(tab: Array[Short], base: Int, nsyms: Int): Int = {
      val c = (dif >>> (W - 16)).toInt
      val r = rng
      var v = r
      var u = v
      var ret = -1
      var done = false
      while (!done) {
        ret += 1
        u = v
        val icdf = if (ret < nsyms - 1) tab(base + ret) & 0xFFFF else 0
        v = (((r >> 8) * (icdf >> 6)) >> 1) + 4 * (nsyms - ret - 1)
        if (c >= v) done = true
      }
      normalize(dif - (v.toLong << (W - 16)), u - v)
      ret
    }

    /** single bool with explicit probability icdf (no adaptation) */
    def decodeBoolProb(icdfVal: Int): Int = {
      val c = (dif >>> (W - 16)).toInt
      val r = rng
      val v0 = (((r >> 8) * (icdfVal >> 6)) >> 1) + 4
      if (c >= v0) { normalize(dif - (v0.toLong << (W - 16)), r - v0); 0 }
      else { normalize(dif, v0); 1 }
    }

    /** adaptive symbol: row at tab(base..base+stride-1), counter in
      * slot base+nsyms
      */
    def symbol(tab: Array[Short], base: Int, nsyms: Int): Int = {
      val ret = decode(tab, base, nsyms)
      if (allowUpdate) {
        val c0 = tab(base + nsyms) & 0xFFFF
        val rate = 3 + (if (c0 > 15) 1 else 0) + (if (c0 > 31) 1 else 0) +
          (if (nsyms <= 3) 1 else 2)
        var i = 0
        while (i < nsyms - 1) {
          val cur = tab(base + i) & 0xFFFF
          val tmp = if (i >= ret) 0 else 32768
          val nv = if (tmp < cur) cur - ((cur - tmp) >> rate)
                   else cur + ((tmp - cur) >> rate)
          tab(base + i) = nv.toShort
          i += 1
        }
        tab(base + nsyms) = (c0 + (if (c0 < 32) 1 else 0)).toShort
      }
      ret
    }

    def boolEqui(): Int = {
      val c = (dif >>> (W - 16)).toInt
      val r = rng
      val v0 = (((r >> 8) * (16384 >> 6)) >> 1) + 4
      if (c >= v0) { normalize(dif - (v0.toLong << (W - 16)), r - v0); 0 }
      else { normalize(dif, v0); 1 }
    }

    /** spec read_golomb: count zero bits, then read that many bits */
    def golomb(): Int = {
      var length = 0
      while (boolEqui() != 1 && length < 16) length += 1
      var x = 1
      var i = 0
      while (i < length) { x = (x << 1) | boolEqui(); i += 1 }
      x - 1
    }
  }

  // -------------------------------------------------------- headers
  private final case class Seq(w: Int, h: Int, use128: Boolean,
                               filterIntra: Boolean, intraEdge: Boolean,
                               mono: Boolean, forceScr: Int,
                               forceImv: Int)

  private def parseSeq(b: Array[Byte], off: Int, end: Int): Seq = {
    val r = new Bits(b, off * 8, end)
    val profile = r.f(3)
    if (profile != 0) sys.error("profile unsupported")
    r.f(1) // still_picture
    val reduced = r.f(1) == 1
    if (reduced) r.f(5) // level
    else {
      if (r.f(1) == 1) sys.error("timing info unsupported")
      val idd = r.f(1)
      val n = r.f(5)
      var i = 0
      while (i <= n) {
        r.f(12)
        val lvl = r.f(5)
        if (lvl > 7) r.f(1)
        if (idd == 1) sys.error("decoder model unsupported")
        i += 1
      }
    }
    val wb = r.f(4) + 1
    val hb = r.f(4) + 1
    val w = r.f(wb) + 1
    val h = r.f(hb) + 1
    if (!reduced && r.f(1) == 1) { r.f(4); r.f(3) } // frame ids
    val use128 = r.f(1) == 1
    val fi = r.f(1) == 1
    val ie = r.f(1) == 1
    var forceScr = 2
    var forceImv = 2
    if (!reduced) {
      // enable_interintra_compound, enable_masked_compound,
      // enable_warped_motion, enable_dual_filter
      r.f(4)
      if (r.f(1) == 1) sys.error("order hint unsupported (stills only)")
      forceScr = if (r.f(1) == 1) 2 else r.f(1)
      if (forceScr > 0) forceImv = if (r.f(1) == 1) 2 else r.f(1)
    }
    val superres = r.f(1) == 1
    r.f(1) // cdef
    r.f(1) // restoration
    if (superres) sys.error("superres unsupported")
    if (r.f(1) == 1) sys.error("high bitdepth unsupported")
    val mono = r.f(1) == 1
    if (r.f(1) == 1) { r.f(8); r.f(8); r.f(8) } // color description
    if (mono) r.f(1)
    else { r.f(1); r.f(2); r.f(1) } // range, chroma pos, separate uv dq
    if (r.f(1) == 1) sys.error("film grain unsupported")
    Seq(w, h, use128, fi, ie, mono, forceScr, forceImv)
  }

  private final case class Fh(miCols: Int, miRows: Int,
                              disableCdfUpdate: Boolean, tileOff: Int,
                              tileColsLog2: Int, tileRowsLog2: Int,
                              tileSzBytes: Int, sbCols: Int, sbRows: Int)

  private def parseFrame(b: Array[Byte], off: Int, end: Int, sq: Seq,
                         reduced: Boolean): Fh = {
    val r = new Bits(b, off * 8, end)
    if (!reduced) {
      if (r.f(1) == 1) sys.error("show_existing_frame")
      val ft = r.f(2)
      val show = r.f(1)
      if (show == 0) { r.f(1); r.f(1) } // showable, error_resilient
      if (ft != 0) sys.error("not a key frame")
    }
    val dcu = r.f(1) == 1
    val allowScr = if (sq.forceScr == 2) r.f(1) == 1 else sq.forceScr == 1
    if (allowScr && sq.forceImv == 2) r.f(1) // force_integer_mv
    if (!reduced) {
      if (r.f(1) == 1) sys.error("frame_size_override")
    }
    if (r.f(1) == 1) { r.f(16); r.f(16) } // render size
    if (allowScr) {
      if (r.f(1) == 1) sys.error("intrabc unsupported")
    }
    val miCols = 2 * ((sq.w + 7) >> 3)
    val miRows = 2 * ((sq.h + 7) >> 3)
    val sbShift = if (sq.use128) 5 else 4
    val sbSz = if (sq.use128) 128 else 64
    val sbCols = (miCols + (1 << sbShift) - 1) >> sbShift
    val sbRows = (miRows + (1 << sbShift) - 1) >> sbShift
    if (r.f(1) != 1) sys.error("non-uniform tiles unsupported")
    def tileLog2(blk: Int, target: Int): Int = {
      var k = 0
      while ((blk << k) < target) k += 1
      k
    }
    val maxLog2Cols = tileLog2(1, math.min(sbCols, 64))
    val maxLog2Rows = tileLog2(1, math.min(sbRows, 64))
    val maxTileWidthSb = 4096 / sbSz
    val maxTileAreaSb = (4096 * 2304) / (sbSz * sbSz)
    val minLog2Cols = tileLog2(maxTileWidthSb, sbCols)
    val minLog2Tiles =
      math.max(minLog2Cols, tileLog2(maxTileAreaSb, sbRows * sbCols))
    var tcl = minLog2Cols
    var more = true
    while (more && tcl < maxLog2Cols) {
      if (r.f(1) == 1) tcl += 1 else more = false
    }
    val minLog2Rows = math.max(minLog2Tiles - tcl, 0)
    var trl = minLog2Rows
    more = true
    while (more && trl < maxLog2Rows) {
      if (r.f(1) == 1) trl += 1 else more = false
    }
    if (tcl > 0 || trl > 0) {
      r.f(tcl + trl) // context_update_tile_id
    }
    val tileSzBytes = if (tcl > 0 || trl > 0) r.f(2) + 1 else 1
    val baseQ = r.f(8)
    def dq(): Int =
      if (r.f(1) == 1) { val v = r.f(6); if (r.f(1) == 1) v - 64 else v }
      else 0
    val dqy = dq()
    var dquDc = 0; var dquAc = 0
    if (!sq.mono) { dquDc = dq(); dquAc = dq() }
    if (r.f(1) == 1) sys.error("qmatrix unsupported")
    if (r.f(1) == 1) sys.error("segmentation unsupported")
    if (baseQ > 0) { if (r.f(1) == 1) sys.error("delta q unsupported") }
    if (!(baseQ == 0 && dqy == 0 && dquDc == 0 && dquAc == 0))
      sys.error("lossy frames unsupported")
    r.f(1) // reduced_tx_set (CodedLossless: no lf/cdef/lr/tx-mode bits)
    val pos = (r.pos + 7) & ~7
    Fh(miCols, miRows, dcu, pos >> 3, tcl, trl, tileSzBytes, sbCols, sbRows)
  }

  // ------------------------------------------------------- CDF state
  private final class Cdfs {
    val partition: Array[Short] = Av1Tables.Partition.clone()
    val kfY: Array[Short] = Av1Tables.KfYMode.clone()
    val uv: Array[Short] = Av1Tables.UvMode.clone()
    val angle: Array[Short] = Av1Tables.AngleDelta.clone()
    val skip: Array[Short] = Av1Tables.Skip.clone()
    val fi: Array[Short] = Av1Tables.FilterIntra.clone()
    val fim: Array[Short] = Av1Tables.FilterIntraMode.clone()
    val cflSign: Array[Short] = Av1Tables.CflSign.clone()
    val cflAlpha: Array[Short] = Av1Tables.CflAlpha.clone()
    val txbSkip: Array[Short] = Av1Tables.TxbSkip.clone()
    val eobPt16: Array[Short] = Av1Tables.EobPt16.clone()
    val eobExtra: Array[Short] = Av1Tables.EobExtra.clone()
    val baseEob: Array[Short] = Av1Tables.CoeffBaseEob.clone()
    val base: Array[Short] = Av1Tables.CoeffBase.clone()
    val br: Array[Short] = Av1Tables.CoeffBr.clone()
    val dcSign: Array[Short] = Av1Tables.DcSign.clone()
  }

  // --------------------------------------------------------- decoder
  private def decode(data: Array[Byte]): Frame = {
    // OBU walk: sequence header (type 1), frame (type 6)
    var p = 0
    var sq: Seq = null
    var reduced = false
    var fh: Fh = null
    var tileOff = 0
    var tileEnd = 0
    while (p < data.length && (fh == null || sq == null)) {
      val hdr = data(p) & 0xFF
      val obuType = (hdr >> 3) & 0xF
      var q = p + 1
      if ((hdr & 4) != 0) q += 1 // extension
      var size = 0
      if ((hdr & 2) != 0) {
        // leb128 per spec 4.10.5: at most 8 bytes, value < 2^31 —
        // unchecked accumulation lets a crafted 5-byte run go
        // negative and walk the cursor backwards forever
        var v = 0L
        var sh = 0
        var nb = 0
        var done = false
        while (!done) {
          if (nb >= 8) sys.error("leb128 too long")
          val x = data(q) & 0xFF; q += 1; nb += 1
          v |= (x & 0x7FL) << sh; sh += 7
          done = (x & 0x80) == 0
        }
        if (v < 0 || v > Int.MaxValue) sys.error("leb128 overflow")
        size = v.toInt
      } else size = data.length - q
      if (obuType == 1) {
        reduced = ((data(q) & 0xFF) >> 3 & 1) == 1 // bit 4 = reduced flag
        sq = parseSeq(data, q, q + size)
        if (sq.w.toLong * sq.h > MaxPixels) sys.error("frame too large")
      } else if (obuType == 6 && fh == null) {
        if (sq == null) sys.error("no sequence header")
        fh = parseFrame(data, q, q + size, sq, reduced)
        tileOff = fh.tileOff // absolute byte offset (Bits counts from 0)
        tileEnd = q + size
      }
      p = q + size
    }
    if (sq == null || fh == null) sys.error("no frame")
    new Decoder(data, tileOff, tileEnd - tileOff, sq, fh).run()
  }

  private final class Decoder(data: Array[Byte], tileOff: Int,
                              tileLen: Int, sq: Seq, fh: Fh) {
    private val miCols = fh.miCols
    private val miRows = fh.miRows
    private val lw = miCols * 4
    private val lh = miRows * 4
    private val nplArr = if (sq.mono) 1 else 3
    private val planeW = Array(lw, lw >> 1, lw >> 1)
    private val planeH = Array(lh, lh >> 1, lh >> 1)
    private val planes = Array.tabulate(3) { p =>
      new Array[Int](planeW(p) * planeH(p))
    }
    private val yModes = new Array[Int](miCols * miRows)
    private val uvModes = new Array[Int](miCols * miRows)
    private val skips = new Array[Int](miCols * miRows)
    private val abovePart = new Array[Int](miCols)
    private val leftPart = new Array[Int](32)
    private val aboveLvl = Array.fill(3)(new Array[Int](miCols))
    private val leftLvl = Array.fill(3)(new Array[Int](miRows))
    private val aboveDc = Array.fill(3)(new Array[Int](miCols))
    private val leftDc = Array.fill(3)(new Array[Int](miRows))
    private var cdfs = new Cdfs
    private val sbMi = if (sq.use128) 32 else 16
    private val sbBs = if (sq.use128) BS_128X128 else BS_64X64
    private var rd: Msac = _
    private var tileR0 = 0
    private var tileR1 = miRows
    private var tileC0 = 0
    private var tileC1 = miCols
    // BlockDecoded per plane: (sbMi/sub + 2)^2 grid, offset +1
    private val bdStride = sbMi + 2
    private val bd = Array.fill(3)(new Array[Boolean](bdStride * bdStride))

    // current block state
    private var miRow = 0
    private var miCol = 0
    private var miSize = 0
    private var availU = false
    private var availL = false
    private var availUC = false
    private var availLC = false
    private var hasChroma = false
    private var skipFlag = 0
    private var yMode = 0
    private var uvMode = 0
    private var angleY = 0
    private var angleUV = 0
    private var cflU = 0
    private var cflV = 0
    private var useFilterIntra = false
    private var filterIntraMode = 0
    private var maxLumaW = 0
    private var maxLumaH = 0
    private val q = new Array[Int](16)
    private val lvBuf = new Array[Int](36) // 6x6 padded level grid

    def run(): Frame = {
      val shift = if (sq.use128) 5 else 4
      val nTc = 1 << fh.tileColsLog2
      val nTr = 1 << fh.tileRowsLog2
      val nTiles = nTc * nTr
      val colSb = (fh.sbCols + nTc - 1) / nTc
      val rowSb = (fh.sbRows + nTr - 1) / nTr
      var p = tileOff
      val end = tileOff + tileLen
      if (nTiles > 1) {
        // tile_group header: tile_start_and_end_present_flag + align
        // (one full tile group — the libaom/AVIF shape)
        if ((data(p) & 0x80) != 0) sys.error("partial tile groups")
        p += 1
      }
      var ti = 0
      var tr = 0
      while (tr < nTr) {
        var tc = 0
        while (tc < nTc) {
          var sz = end - p
          if (ti < nTiles - 1) {
            var v = 0
            var i = 0
            while (i < fh.tileSzBytes) {
              v |= (data(p) & 0xFF) << (8 * i); p += 1; i += 1
            }
            sz = v + 1
          }
          decodeTile(p, sz,
            math.min(tr * rowSb << shift, miRows),
            math.min((tr + 1) * rowSb << shift, miRows),
            math.min(tc * colSb << shift, miCols),
            math.min((tc + 1) * colSb << shift, miCols))
          p += sz
          ti += 1
          tc += 1
        }
        tr += 1
      }
      emit()
    }

    private def decodeTile(off: Int, len: Int, r0: Int, r1: Int,
                           c0: Int, c1: Int): Unit = {
      tileR0 = r0; tileR1 = r1; tileC0 = c0; tileC1 = c1
      // tiles are independent: fresh default CDFs, cleared above
      // context over the tile's columns
      cdfs = new Cdfs
      var c = c0
      while (c < c1) { abovePart(c) = 0; c += 1 }
      var pIdx = 0
      while (pIdx < 3) {
        val sub = if (pIdx == 0) 0 else 1
        var x = c0 >> sub
        while (x < (c1 >> sub)) {
          aboveLvl(pIdx)(x) = 0; aboveDc(pIdx)(x) = 0; x += 1
        }
        pIdx += 1
      }
      rd = new Msac(data, off, len, !fh.disableCdfUpdate)
      var sr = r0
      while (sr < r1) {
        pIdx = 0
        while (pIdx < 3) {
          java.util.Arrays.fill(leftLvl(pIdx), 0)
          java.util.Arrays.fill(leftDc(pIdx), 0)
          pIdx += 1
        }
        java.util.Arrays.fill(leftPart, 0)
        var sc = c0
        while (sc < c1) {
          clearBlockDecoded(sr, sc)
          decodePartition(sr, sc, sbBs)
          sc += sbMi
        }
        sr += sbMi
      }
    }

    private def emit(): Frame = {
      val w = sq.w; val h = sq.h
      val y = new Array[Byte](w * h)
      var i = 0
      while (i < h) {
        var j = 0
        while (j < w) { y(i * w + j) = planes(0)(i * lw + j).toByte; j += 1 }
        i += 1
      }
      if (sq.mono) return Frame(w, h, mono = true, y, null, null)
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      val u = new Array[Byte](cw * ch)
      val v = new Array[Byte](cw * ch)
      val cs = lw >> 1
      i = 0
      while (i < ch) {
        var j = 0
        while (j < cw) {
          u(i * cw + j) = planes(1)(i * cs + j).toByte
          v(i * cw + j) = planes(2)(i * cs + j).toByte
          j += 1
        }
        i += 1
      }
      Frame(w, h, mono = false, y, u, v)
    }

    // -------------------------------------------------- BlockDecoded
    private var sbR = 0
    private var sbC = 0

    private def clearBlockDecoded(r: Int, c: Int): Unit = {
      sbR = r; sbC = c
      var pIdx = 0
      while (pIdx < 3) {
        val sub = if (pIdx == 0) 0 else 1
        val sz = sbMi >> sub
        val sbW4 = (tileC1 - c) >> sub
        val sbH4 = (tileR1 - r) >> sub
        val g = bd(pIdx)
        java.util.Arrays.fill(g, false)
        var x = -1
        while (x <= sz) {
          if (x < sbW4) g(0 * bdStride + (x + 1)) = true // row -1
          x += 1
        }
        var yy = 0
        while (yy <= sz) {
          if (yy - 0 < sbH4 && yy < sz) g((yy + 1) * bdStride + 0) = true
          yy += 1
        }
        // spec: row -1 set for x < sbW4; col -1 set for y < sbH4;
        // corner (sz, -1) cleared
        g((sz + 1) * bdStride + 0) = false
        pIdx += 1
      }
    }

    private def bdGet(p: Int, y: Int, x: Int): Boolean = {
      if (y < -1 || x < -1 || y > bdStride - 2 || x > bdStride - 2) false
      else bd(p)((y + 1) * bdStride + (x + 1))
    }

    private def bdSet(p: Int, y: Int, x: Int): Unit =
      if (y >= -1 && x >= -1 && y <= bdStride - 2 && x <= bdStride - 2)
        bd(p)((y + 1) * bdStride + (x + 1)) = true

    // ---------------------------------------------------- partitions
    private def isInside(r: Int, c: Int): Boolean =
      r >= tileR0 && r < tileR1 && c >= tileC0 && c < tileC1

    private def partNsym(bs: Int): Int =
      if (BW(bs) == 8) 4 else if (BW(bs) == 128) 8 else 10

    private def decodePartition(r: Int, c: Int, bs: Int): Unit = {
      if (r >= tileR1 || c >= tileC1) return
      val w4 = BW(bs) >> 2
      val hbs = w4 >> 1
      val bsl = 32 - Integer.numberOfLeadingZeros(BW(bs)) - 3
      val hasRows = (r + hbs) < tileR1
      val hasCols = (c + hbs) < tileC1
      val nsym = partNsym(bs)
      var part = P_SPLIT
      if (BW(bs) < 8) part = P_NONE
      else if (hasRows && hasCols) {
        val above = (abovePart(c) >> (bsl - 1)) & 1
        val left = (leftPart(r & 31) >> (bsl - 1)) & 1
        val ctx = (bsl - 1) * 4 + left * 2 + above
        part = rd.symbol(cdfs.partition, ctx * 11, nsym)
      } else if (hasCols) {
        part = if (gatherBool(r, c, bs, bsl, nsym, horz = true)) P_SPLIT
               else P_HORZ
      } else if (hasRows) {
        part = if (gatherBool(r, c, bs, bsl, nsym, horz = false)) P_SPLIT
               else P_VERT
      }
      val sub = subsize(part, bs)
      val splitSz = if (BW(bs) > 4) subsize(P_SPLIT, bs) else bs
      part match {
        case P_NONE => decodeBlock(r, c, bs)
        case P_HORZ =>
          decodeBlock(r, c, sub)
          if (hasRows) decodeBlock(r + hbs, c, sub)
        case P_VERT =>
          decodeBlock(r, c, sub)
          if (hasCols) decodeBlock(r, c + hbs, sub)
        case P_SPLIT =>
          decodePartition(r, c, splitSz)
          decodePartition(r, c + hbs, splitSz)
          decodePartition(r + hbs, c, splitSz)
          decodePartition(r + hbs, c + hbs, splitSz)
        case P_HORZ_A =>
          decodeBlock(r, c, splitSz)
          decodeBlock(r, c + hbs, splitSz)
          decodeBlock(r + hbs, c, sub)
        case P_HORZ_B =>
          decodeBlock(r, c, sub)
          decodeBlock(r + hbs, c, splitSz)
          decodeBlock(r + hbs, c + hbs, splitSz)
        case P_VERT_A =>
          decodeBlock(r, c, splitSz)
          decodeBlock(r + hbs, c, splitSz)
          decodeBlock(r, c + hbs, sub)
        case P_VERT_B =>
          decodeBlock(r, c, sub)
          decodeBlock(r, c + hbs, splitSz)
          decodeBlock(r + hbs, c + hbs, splitSz)
        case P_HORZ_4 =>
          val qbs = w4 >> 2
          var i = 0
          var stop = false
          while (i < 4 && !stop) {
            val rr = r + i * qbs
            if (i > 0 && rr >= tileR1) stop = true
            else decodeBlock(rr, c, sub)
            i += 1
          }
        case P_VERT_4 =>
          val qbs = w4 >> 2
          var i = 0
          var stop = false
          while (i < 4 && !stop) {
            val cc = c + i * qbs
            if (i > 0 && cc >= tileC1) stop = true
            else decodeBlock(r, cc, sub)
            i += 1
          }
        case _ =>
      }
      updateExtPartCtx(r, c, sub, bs, part)
    }

    /** split_or_horz / split_or_vert (spec 9.3 gather processes):
      * the SPLIT probability sums the partitions that cut the
      * visible half along its midline — trace-verified against dav1d
      * at frame edges.
      */
    private def gatherBool(r: Int, c: Int, bs: Int, bsl: Int, nsym: Int,
                           horz: Boolean): Boolean = {
      val above = (abovePart(c) >> (bsl - 1)) & 1
      val left = (leftPart(r & 31) >> (bsl - 1)) & 1
      val ctx = (bsl - 1) * 4 + left * 2 + above
      val base = ctx * 11
      def prob(e: Int): Int = {
        val lo = if (e == 0) 32768 else cdfs.partition(base + e - 1) & 0xFFFF
        val hi = if (e >= nsym - 1) 0 else cdfs.partition(base + e) & 0xFFFF
        lo - (if (e == nsym - 1) 0 else hi)
      }
      var ps =
        if (horz) prob(P_VERT) + prob(P_SPLIT)
        else prob(P_HORZ) + prob(P_SPLIT)
      if (nsym > 4) {
        ps += (if (horz) prob(P_VERT_A) + prob(P_VERT_B) + prob(P_HORZ_A)
               else prob(P_HORZ_A) + prob(P_HORZ_B) + prob(P_VERT_A))
      }
      if (nsym == 10) {
        ps += (if (horz) prob(P_VERT_4) else prob(P_HORZ_4))
      }
      rd.decodeBoolProb(ps) == 1
    }

    private def updatePartCtx(r: Int, c: Int, sub: Int, area: Int): Unit = {
      val w4a = BW(area) >> 2
      val h4a = BH(area) >> 2
      val subBslW = 32 - Integer.numberOfLeadingZeros(BW(sub) >> 2) - 1
      val subBslH = 32 - Integer.numberOfLeadingZeros(BH(sub) >> 2) - 1
      val av = (31 << subBslW) & 31
      val lv = (31 << subBslH) & 31
      var i = 0
      while (i < w4a) {
        if (c + i < miCols) abovePart(c + i) = av
        i += 1
      }
      i = 0
      while (i < h4a) {
        leftPart((r + i) & 31) = lv
        i += 1
      }
    }

    private def updateExtPartCtx(r: Int, c: Int, sub: Int, bs: Int,
                                 part: Int): Unit = {
      if (BW(bs) < 8) return
      val hbs = (BW(bs) >> 2) >> 1
      val splitSz = subsize(P_SPLIT, bs)
      if (part == P_SPLIT && bs != BS_8X8) return
      part match {
        case P_NONE | P_HORZ | P_VERT | P_HORZ_4 | P_VERT_4 | P_SPLIT =>
          updatePartCtx(r, c, sub, bs)
        case P_HORZ_A =>
          updatePartCtx(r, c, splitSz, sub)
          updatePartCtx(r + hbs, c, sub, sub)
        case P_HORZ_B =>
          updatePartCtx(r, c, sub, sub)
          updatePartCtx(r + hbs, c, splitSz, sub)
        case P_VERT_A =>
          updatePartCtx(r, c, splitSz, sub)
          updatePartCtx(r, c + hbs, sub, sub)
        case P_VERT_B =>
          updatePartCtx(r, c, sub, sub)
          updatePartCtx(r, c + hbs, splitSz, sub)
        case _ =>
      }
    }

    // -------------------------------------------------------- blocks
    private def decodeBlock(r: Int, c: Int, bs: Int): Unit = {
      miRow = r; miCol = c; miSize = bs
      val bw4 = BW(bs) >> 2
      val bh4 = BH(bs) >> 2
      availU = isInside(r - 1, c)
      availL = isInside(r, c - 1)
      hasChroma =
        if (sq.mono) false
        else if (bh4 == 1 && (r & 1) == 0) false
        else if (bw4 == 1 && (c & 1) == 0) false
        else true
      availUC = availU
      availLC = availL
      if (hasChroma) {
        if (bh4 == 1) availUC = isInside(r - 2, c)
        if (bw4 == 1) availLC = isInside(r, c - 2)
      } else { availUC = false; availLC = false }
      // skip
      val skipCtx = (if (availU) skips((r - 1) * miCols + c) else 0) +
        (if (availL) skips(r * miCols + c - 1) else 0)
      skipFlag = rd.symbol(cdfs.skip, skipCtx * 3, 2)
      // y mode (keyframe ctx from neighbor modes)
      val am = if (availU) yModes((r - 1) * miCols + c) else DC
      val lm = if (availL) yModes(r * miCols + c - 1) else DC
      val aCtx = IntraModeContext(am)
      val lCtx = IntraModeContext(lm)
      yMode = rd.symbol(cdfs.kfY, (aCtx * 5 + lCtx) * 14, 13)
      angleY = 0
      // spec: MiSize >= BLOCK_8X8 in ENUM order (includes rect 4x16..)
      val useAngle = bs >= BS_8X8
      if (useAngle && yMode >= 1 && yMode <= 8 && ModeAngle(yMode) != 0)
        angleY = rd.symbol(cdfs.angle, (yMode - V) * 8, 7) - 3
      uvMode = DC
      angleUV = 0
      if (hasChroma) {
        // lossless: CfL allowed only when the chroma block is 4x4
        val cflAllowed = (BW(bs) >> 1) <= 4 && (BH(bs) >> 1) <= 4
        uvMode =
          if (cflAllowed) rd.symbol(cdfs.uv, (13 + yMode) * 15, 14)
          else rd.symbol(cdfs.uv, yMode * 15, 13)
        if (uvMode == CFL) {
          val j = rd.symbol(cdfs.cflSign, 0, 8)
          val signU = (j + 1) / 3
          val signV = (j + 1) % 3
          var aU = 0; var aV = 0
          if (signU != 0) {
            aU = rd.symbol(cdfs.cflAlpha, (j - 2) * 17, 16) + 1
            if (signU == 1) aU = -aU
          }
          if (signV != 0) {
            aV = rd.symbol(cdfs.cflAlpha, (signV * 3 + signU - 3) * 17, 16) + 1
            if (signV == 1) aV = -aV
          }
          cflU = aU; cflV = aV
        } else if (useAngle && uvMode >= 1 && uvMode <= 8 &&
                   ModeAngle(uvMode) != 0) {
          angleUV = rd.symbol(cdfs.angle, (uvMode - V) * 8, 7) - 3
        }
      }
      // filter intra
      useFilterIntra = false
      filterIntraMode = 0
      if (sq.filterIntra && yMode == DC &&
          math.max(BW(bs), BH(bs)) <= 32) {
        useFilterIntra = rd.symbol(cdfs.fi, bs * 3, 2) == 1
        if (useFilterIntra)
          filterIntraMode = rd.symbol(cdfs.fim, 0, 5)
      }
      var yy = 0
      while (yy < bh4) {
        var xx = 0
        while (xx < bw4) {
          if (r + yy < miRows && c + xx < miCols) {
            yModes((r + yy) * miCols + c + xx) = yMode
            uvModes((r + yy) * miCols + c + xx) = uvMode
            skips((r + yy) * miCols + c + xx) = skipFlag
          }
          xx += 1
        }
        yy += 1
      }
      residual()
    }

    // ------------------------------------------------------ residual
    private def planeSize(bs: Int, p: Int): Int =
      if (p == 0) bs
      else findBs(math.max(BW(bs) >> 1, 4), math.max(BH(bs) >> 1, 4))

    private def residual(): Unit = {
      val bs = miSize
      val widthChunks = math.max(1, BW(bs) >> 6)
      val heightChunks = math.max(1, BH(bs) >> 6)
      val chunkBs =
        if (widthChunks > 1 || heightChunks > 1) BS_64X64 else bs
      var cy = 0
      while (cy < heightChunks) {
        var cx = 0
        while (cx < widthChunks) {
          val nplanes = if (hasChroma) 3 else 1
          var p = 0
          while (p < nplanes) {
            val sub = if (p == 0) 0 else 1
            val psz = planeSize(chunkBs, p)
            val n4w = BW(psz) >> 2
            val n4h = BH(psz) >> 2
            // spec residual(): block base + chunk offset carried in
            // the txb indices (haveLeft/Up see chunk-interior edges)
            val baseX = (miCol >> sub) * 4
            val baseY = (miRow >> sub) * 4
            val offX = (cx << 4) >> sub
            val offY = (cy << 4) >> sub
            var ty = 0
            while (ty < n4h) {
              var tx = 0
              while (tx < n4w) {
                transformBlock(p, baseX, baseY, tx + offX, ty + offY)
                tx += 1
              }
              ty += 1
            }
            p += 1
          }
          cx += 1
        }
        cy += 1
      }
    }

    private def transformBlock(p: Int, baseX: Int, baseY: Int,
                               x: Int, y: Int): Unit = {
      val sub = if (p == 0) 0 else 1
      val startX = baseX + 4 * x
      val startY = baseY + 4 * y
      val maxX = (miCols * 4) >> sub
      val maxY = (miRows * 4) >> sub
      if (startX >= maxX || startY >= maxY) return
      val row = (startY << sub) >> 2
      val col = (startX << sub) >> 2
      val sbMask = sbMi - 1
      val sbr4 = (row & sbMask) >> sub
      val sbc4 = (col & sbMask) >> sub
      val mode = if (p == 0) yMode else if (uvMode == CFL) DC else uvMode
      val haveLeft = (if (p == 0) availL else availLC) || x > 0
      val haveUp = (if (p == 0) availU else availUC) || y > 0
      val haveAR = bdGet(p, sbr4 - 1, sbc4 + 1)
      val haveBL = bdGet(p, sbr4 + 1, sbc4 - 1)
      predict(p, startX, startY, haveLeft, haveUp, haveAR, haveBL, mode)
      if (p == 0) { maxLumaW = startX + 4; maxLumaH = startY + 4 }
      if (skipFlag == 0) {
        val eob = coeffs(p, startX, startY)
        if (eob > 0) reconstruct(p, startX, startY)
      } else {
        val x4 = startX >> 2
        val y4 = startY >> 2
        aboveLvl(p)(x4) = 0; leftLvl(p)(y4) = 0
        aboveDc(p)(x4) = 0; leftDc(p)(y4) = 0
      }
      bdSet(p, sbr4, sbc4)
    }

    // -------------------------------------------------- coefficients
    private def coeffs(p: Int, startX: Int, startY: Int): Int = {
      val x4 = startX >> 2
      val y4 = startY >> 2
      val ptype = if (p == 0) 0 else 1
      var ctx = 0
      if (p == 0) {
        if (miSize == 0) ctx = 0
        else {
          val top = math.min(aboveLvl(0)(x4), 4)
          val left = math.min(leftLvl(0)(y4), 4)
          ctx = SkipContexts(math.min(top, left))(math.max(top, left))
        }
      } else {
        val psz = planeSize(miSize, p)
        val off = if (psz == 0) 7 else 10
        ctx = (if (aboveLvl(p)(x4) != 0) 1 else 0) +
          (if (leftLvl(p)(y4) != 0) 1 else 0) + off
      }
      val allZero = rd.symbol(cdfs.txbSkip, ctx * 3, 2)
      if (allZero == 1) {
        aboveLvl(p)(x4) = 0; leftLvl(p)(y4) = 0
        aboveDc(p)(x4) = 0; leftDc(p)(y4) = 0
        return 0
      }
      val eobPt = rd.symbol(cdfs.eobPt16, (ptype * 2) * 6, 5) + 1
      var eob = if (eobPt < 2) eobPt else (1 << (eobPt - 2)) + 1
      if (eobPt >= 3) {
        val bit = rd.symbol(cdfs.eobExtra, (ptype * 9 + eobPt - 3) * 3, 2)
        if (bit == 1) eob += 1 << (eobPt - 3)
        var sh = eobPt - 4
        while (sh >= 0) {
          if (rd.boolEqui() == 1) eob += 1 << sh
          sh -= 1
        }
      }
      java.util.Arrays.fill(q, 0)
      java.util.Arrays.fill(lvBuf, 0)
      val scan = Av1Tables.Scan4x4
      // reverse scan: base levels + coeff_br chain (spec 5.11.39)
      var ci = eob - 1
      while (ci >= 0) {
        val pos = scan(ci)
        val rr = pos >> 2
        val cc = pos & 3
        var level = 0
        if (ci == eob - 1) {
          val ctxE = if (ci == 0) 0 else if (ci <= 2) 1
                     else if (ci <= 4) 2 else 3
          level = rd.symbol(cdfs.baseEob, (ptype * 4 + ctxE) * 4, 3) + 1
        } else if (pos == 0) {
          // DC non-eob coefficient: base ctx hardcoded 0
          level = rd.symbol(cdfs.base, (ptype * 41) * 5, 4)
        } else {
          val mag = math.min(lvBuf(rr * 6 + cc + 1), 3) +
            math.min(lvBuf((rr + 1) * 6 + cc), 3) +
            math.min(lvBuf((rr + 1) * 6 + cc + 1), 3) +
            math.min(lvBuf(rr * 6 + cc + 2), 3) +
            math.min(lvBuf((rr + 2) * 6 + cc), 3)
          val ctxB = math.min((mag + 1) >> 1, 4) + NzOff4x4(pos)
          level = rd.symbol(cdfs.base, (ptype * 41 + ctxB) * 5, 4)
        }
        if (level > 2) {
          // coeff_br chain: up to 4 reads of +0..3 on one ctx row
          var magB = math.min(lvBuf(rr * 6 + cc + 1), 15) +
            math.min(lvBuf((rr + 1) * 6 + cc), 15) +
            math.min(lvBuf((rr + 1) * 6 + cc + 1), 15)
          magB = math.min((magB + 1) >> 1, 6)
          val ctxBr =
            if (pos == 0) magB
            else if (rr < 2 && cc < 2) magB + 7
            else magB + 14
          var idx = 0
          var stop = false
          while (idx < 4 && !stop) {
            val br = rd.symbol(cdfs.br, (ptype * 21 + ctxBr) * 5, 4)
            level += br
            if (br < 3) stop = true
            idx += 1
          }
        }
        lvBuf(rr * 6 + cc) = level
        q(pos) = level
        ci -= 1
      }
      // forward pass: signs, golomb tails, context store
      var cul = 0
      var dcCat = 0
      ci = 0
      while (ci < eob) {
        val pos = scan(ci)
        var level = q(pos)
        var sign = 0
        if (level != 0) {
          sign =
            if (ci == 0) {
              val a = aboveDc(p)(x4)
              val l = leftDc(p)(y4)
              val dcSum = (if (a == 2) 1 else if (a == 1) -1 else 0) +
                (if (l == 2) 1 else if (l == 1) -1 else 0)
              val sctx = if (dcSum == 0) 0 else if (dcSum < 0) 1 else 2
              rd.symbol(cdfs.dcSign, (ptype * 3 + sctx) * 3, 2)
            } else rd.boolEqui()
        }
        if (level > 14) level += rd.golomb()
        cul += level
        if (ci == 0 && level > 0) dcCat = if (sign == 1) 1 else 2
        q(pos) = if (sign == 1) -level else level
        ci += 1
      }
      cul = math.min(cul, 63)
      aboveLvl(p)(x4) = cul; leftLvl(p)(y4) = cul
      aboveDc(p)(x4) = dcCat; leftDc(p)(y4) = dcCat
      eob
    }

    /** lossless reconstruction: dequant x4, 4x4 inverse WHT with the
      * >>2 input shift (rows then columns), clipped add
      */
    private def reconstruct(p: Int, startX: Int, startY: Int): Unit = {
      val tmp = new Array[Int](16)
      var i = 0
      while (i < 4) {
        var a1 = (q(i * 4) * 4) >> 2
        var c1 = (q(i * 4 + 1) * 4) >> 2
        var d1 = (q(i * 4 + 2) * 4) >> 2
        var b1 = (q(i * 4 + 3) * 4) >> 2
        a1 += c1; d1 -= b1
        val e1 = (a1 - d1) >> 1
        b1 = e1 - b1; c1 = e1 - c1
        a1 -= b1; d1 += c1
        tmp(i * 4) = a1; tmp(i * 4 + 1) = b1
        tmp(i * 4 + 2) = c1; tmp(i * 4 + 3) = d1
        i += 1
      }
      val pl = planes(p)
      val pw = planeW(p); val ph = planeH(p)
      var j = 0
      while (j < 4) {
        var a1 = tmp(j)
        var c1 = tmp(4 + j)
        var d1 = tmp(8 + j)
        var b1 = tmp(12 + j)
        a1 += c1; d1 -= b1
        val e1 = (a1 - d1) >> 1
        b1 = e1 - b1; c1 = e1 - c1
        a1 -= b1; d1 += c1
        var i2 = 0
        val vals = Array(a1, b1, c1, d1)
        while (i2 < 4) {
          val yy = startY + i2
          val xx = startX + j
          if (yy < ph && xx < pw) {
            val v0 = pl(yy * pw + xx) + vals(i2)
            pl(yy * pw + xx) = if (v0 < 0) 0 else if (v0 > 255) 255 else v0
          }
          i2 += 1
        }
        j += 1
      }
    }

    // ---------------------------------------------------- prediction
    private def filtType(p: Int): Int = {
      def smoothM(m: Int) = m == SMOOTH || m == SMOOTH_V || m == SMOOTH_H
      var a = false; var l = false
      if (p == 0) {
        if (availU) a = smoothM(yModes((miRow - 1) * miCols + miCol))
        if (availL) l = smoothM(yModes(miRow * miCols + miCol - 1))
      } else {
        if (availUC) a = smoothM(uvModes((miRow - 1) * miCols + miCol))
        if (availLC) l = smoothM(uvModes(miRow * miCols + miCol - 1))
      }
      if (a || l) 1 else 0
    }

    private def edgeStrength(w: Int, h: Int, ft: Int, delta: Int): Int = {
      val d = math.abs(delta)
      val blkWh = w + h
      var s = 0
      if (ft == 0) {
        if (blkWh <= 8) { if (d >= 56) s = 1 }
        else if (blkWh <= 16) { if (d >= 40) s = 1 }
        else if (blkWh <= 24) {
          if (d >= 32) s = 3 else if (d >= 16) s = 2 else if (d >= 8) s = 1
        } else { if (d >= 1) s = 3 }
      } else {
        if (blkWh <= 8) {
          if (d >= 64) s = 2 else if (d >= 40) s = 1
        } else if (blkWh <= 16) {
          if (d >= 48) s = 2 else if (d >= 20) s = 1
        } else if (blkWh <= 24) { if (d >= 4) s = 3 }
        else { if (d >= 1) s = 3 }
      }
      s
    }

    private val EdgeKernel = Array(
      Array(0, 4, 8, 4, 0), Array(0, 5, 6, 5, 0), Array(2, 4, 4, 4, 2))

    private def edgeFilter(buf: Array[Int], sz: Int, strength: Int): Unit = {
      if (strength == 0) return
      val edge = java.util.Arrays.copyOf(buf, sz)
      var i = 1
      while (i < sz) {
        var s = 0
        var j = 0
        while (j < 5) {
          val k = math.max(0, math.min(sz - 1, i - 2 + j))
          s += EdgeKernel(strength - 1)(j) * edge(k)
          j += 1
        }
        buf(i) = (s + 8) >> 4
        i += 1
      }
    }

    private def useUpsample(w: Int, h: Int, ft: Int, delta: Int): Boolean = {
      val d = math.abs(delta)
      val blkWh = w + h
      if (d <= 0 || d >= 40) false
      else if (ft == 0) blkWh <= 16
      else blkWh <= 8
    }

    private def edgeUpsample(buf: Array[Int], numPx: Int): Array[Int] = {
      val dup = new Array[Int](numPx + 3)
      dup(0) = buf(0); dup(1) = buf(0)
      var i = 0
      while (i < numPx) { dup(2 + i) = buf(1 + i); i += 1 }
      dup(numPx + 2) = buf(numPx)
      val out = new Array[Int](2 * numPx + 2)
      out(0) = dup(0)
      i = 0
      while (i < numPx) {
        var ss = -dup(i) + 9 * dup(i + 1) + 9 * dup(i + 2) - dup(i + 3)
        ss = math.max(0, math.min(255, (ss + 8) >> 4))
        out(2 * i + 1) = ss
        out(2 * i + 2) = dup(i + 2)
        i += 1
      }
      out
    }

    private def predict(p: Int, x: Int, y: Int, haveLeft: Boolean,
                        haveUp: Boolean, haveAR: Boolean, haveBL: Boolean,
                        mode: Int): Unit = {
      val w = 4; val h = 4
      val pl = planes(p)
      val pw = planeW(p)
      val maxX = planeW(p) - 1
      val maxY = planeH(p) - 1
      val base = 128
      var above = new Array[Int](17)
      var left = new Array[Int](17)
      if (haveUp) {
        val lim = if (haveAR) 2 * w else w
        var i = 0
        while (i < 2 * w) {
          above(i + 1) = pl((y - 1) * pw + math.min(x + math.min(i, lim - 1), maxX))
          i += 1
        }
      } else if (haveLeft) {
        val v0 = pl(y * pw + x - 1)
        var i = 0
        while (i < 2 * w) { above(i + 1) = v0; i += 1 }
      } else {
        var i = 0
        while (i < 2 * w) { above(i + 1) = base - 1; i += 1 }
      }
      if (haveLeft) {
        val lim = if (haveBL) 2 * h else h
        var i = 0
        while (i < 2 * h) {
          left(i + 1) = pl(math.min(y + math.min(i, lim - 1), maxY) * pw + x - 1)
          i += 1
        }
      } else if (haveUp) {
        val v0 = pl((y - 1) * pw + x)
        var i = 0
        while (i < 2 * h) { left(i + 1) = v0; i += 1 }
      } else {
        var i = 0
        while (i < 2 * h) { left(i + 1) = base + 1; i += 1 }
      }
      val corner =
        if (haveUp && haveLeft) pl((y - 1) * pw + x - 1)
        else if (haveUp) pl((y - 1) * pw + x)
        else if (haveLeft) pl(y * pw + x - 1)
        else base
      above(0) = corner; left(0) = corner

      val pred = new Array[Int](16)
      val baseAngle = if (mode >= 1 && mode <= 8) ModeAngle(mode) else 0
      if (p == 0 && useFilterIntra) {
        filterIntraPred(pred, above, left)
      } else if (baseAngle != 0) {
        val pAngle = baseAngle + (if (p == 0) angleY else angleUV) * 3
        var upA = 0; var upL = 0
        if (sq.intraEdge && pAngle != 90 && pAngle != 180) {
          val ft = filtType(p)
          if (pAngle > 90 && pAngle < 180 && (w + h) >= 24) {
            val s = (left(1) * 5 + above(0) * 6 + above(1) * 5 + 8) >> 4
            above(0) = s; left(0) = s
          }
          if (haveUp) {
            val st = edgeStrength(w, h, ft, pAngle - 90)
            val numPx = math.min(w, maxX - x + 1) +
              (if (pAngle < 90) h else 0) + 1
            edgeFilter(above, numPx, st)
          }
          if (haveLeft) {
            val st = edgeStrength(w, h, ft, pAngle - 180)
            val numPx = math.min(h, maxY - y + 1) +
              (if (pAngle > 180) w else 0) + 1
            edgeFilter(left, numPx, st)
          }
          if (useUpsample(w, h, ft, pAngle - 90)) {
            upA = 1
            val numPx = w + (if (pAngle < 90) h else 0)
            above = edgeUpsample(above, numPx)
          }
          if (useUpsample(w, h, ft, pAngle - 180)) {
            upL = 1
            val numPx = h + (if (pAngle > 180) w else 0)
            left = edgeUpsample(left, numPx)
          }
        }
        dirPred(pred, above, left, pAngle, upA, upL)
      } else if (mode == DC) {
        var v0 = base
        if (haveUp && haveLeft) {
          var s = 0
          var i = 0
          while (i < w) { s += above(1 + i); i += 1 }
          i = 0
          while (i < h) { s += left(1 + i); i += 1 }
          v0 = (s + ((w + h) >> 1)) / (w + h)
        } else if (haveUp) {
          var s = 0
          var i = 0
          while (i < w) { s += above(1 + i); i += 1 }
          v0 = (s + (w >> 1)) >> 2
        } else if (haveLeft) {
          var s = 0
          var i = 0
          while (i < h) { s += left(1 + i); i += 1 }
          v0 = (s + (h >> 1)) >> 2
        }
        java.util.Arrays.fill(pred, v0)
      } else if (mode == PAETH) {
        var i = 0
        while (i < h) {
          var j = 0
          while (j < w) {
            val b0 = above(1 + j) + left(1 + i) - corner
            val pa = math.abs(b0 - left(1 + i))
            val pb = math.abs(b0 - above(1 + j))
            val pc = math.abs(b0 - corner)
            pred(i * 4 + j) =
              if (pa <= pb && pa <= pc) left(1 + i)
              else if (pb <= pc) above(1 + j)
              else corner
            j += 1
          }
          i += 1
        }
      } else {
        // SMOOTH family (size-4 weights)
        val wts = Av1Tables.SmWeights
        var i = 0
        while (i < h) {
          var j = 0
          while (j < w) {
            val s =
              if (mode == SMOOTH)
                wts(i) * above(1 + j) + (256 - wts(i)) * left(h) +
                  wts(j) * left(1 + i) + (256 - wts(j)) * above(w)
              else if (mode == SMOOTH_V)
                (wts(i) * above(1 + j) + (256 - wts(i)) * left(h)) * 2
              else
                (wts(j) * left(1 + i) + (256 - wts(j)) * above(w)) * 2
            pred(i * 4 + j) =
              if (mode == SMOOTH) (s + 256) >> 9 else (s + 256) >> 9
            j += 1
          }
          i += 1
        }
      }
      if (p > 0 && uvMode == CFL)
        cflAdjust(pred, x, y, if (p == 1) cflU else cflV)
      var i = 0
      while (i < h) {
        var j = 0
        while (j < w) {
          if (y + i <= maxY && x + j <= maxX) {
            val v0 = pred(i * 4 + j)
            pl((y + i) * pw + x + j) =
              if (v0 < 0) 0 else if (v0 > 255) 255 else v0
          }
          j += 1
        }
        i += 1
      }
    }

    private def dirPred(pred: Array[Int], above: Array[Int],
                        left: Array[Int], pAngle: Int,
                        upA: Int, upL: Int): Unit = {
      val w = 4; val h = 4
      val oA = if (upA == 1) 2 else 1
      val oL = if (upL == 1) 2 else 1
      val dr = Av1Tables.DrIntraDerivative
      if (pAngle == 90) {
        var i = 0
        while (i < h) {
          var j = 0
          while (j < w) { pred(i * 4 + j) = above(oA + j); j += 1 }
          i += 1
        }
      } else if (pAngle == 180) {
        var i = 0
        while (i < h) {
          var j = 0
          while (j < w) { pred(i * 4 + j) = left(oL + i); j += 1 }
          i += 1
        }
      } else if (pAngle < 90) {
        val dx = dr(pAngle)
        val maxBaseX = (w + h - 1) << upA
        var i = 0
        while (i < h) {
          var j = 0
          while (j < w) {
            val idx = (i + 1) * dx
            val b0 = (idx >> (6 - upA)) + (j << upA)
            val sh = ((idx << upA) >> 1) & 0x1F
            pred(i * 4 + j) =
              if (b0 < maxBaseX)
                (above(oA + b0) * (32 - sh) + above(oA + 1 + b0) * sh + 16) >> 5
              else above(oA + maxBaseX)
            j += 1
          }
          i += 1
        }
      } else if (pAngle < 180) {
        val dx = dr(180 - pAngle)
        val dy = dr(pAngle - 90)
        var i = 0
        while (i < h) {
          var j = 0
          while (j < w) {
            val idx = (j << 6) - (i + 1) * dx
            val b0 = idx >> (6 - upA)
            if (b0 >= -(1 << upA)) {
              val sh = ((idx << upA) >> 1) & 0x1F
              pred(i * 4 + j) =
                (above(oA + b0) * (32 - sh) + above(oA + 1 + b0) * sh + 16) >> 5
            } else {
              val idx2 = (i << 6) - (j + 1) * dy
              val b2 = idx2 >> (6 - upL)
              val sh2 = ((idx2 << upL) >> 1) & 0x1F
              pred(i * 4 + j) =
                (left(oL + b2) * (32 - sh2) + left(oL + 1 + b2) * sh2 + 16) >> 5
            }
            j += 1
          }
          i += 1
        }
      } else {
        val dy = dr(270 - pAngle)
        val maxBaseY = (w + h - 1) << upL
        var i = 0
        while (i < h) {
          var j = 0
          while (j < w) {
            val idx = (j + 1) * dy
            val b0 = (idx >> (6 - upL)) + (i << upL)
            val sh = ((idx << upL) >> 1) & 0x1F
            pred(i * 4 + j) =
              if (b0 < maxBaseY)
                (left(oL + b0) * (32 - sh) + left(oL + 1 + b0) * sh + 16) >> 5
              else left(oL + maxBaseY)
            j += 1
          }
          i += 1
        }
      }
    }

    private def filterIntraPred(pred: Array[Int], above: Array[Int],
                                left: Array[Int]): Unit = {
      val m = filterIntraMode
      val taps = Av1Tables.FilterIntraTaps
      val buf = Array.ofDim[Int](5, 5)
      var j = 0
      while (j <= 4) { buf(0)(j) = above(j); j += 1 }
      var i = 1
      while (i <= 4) { buf(i)(0) = left(i); i += 1 }
      var i2 = 1
      while (i2 <= 4) {
        var j2 = 1
        while (j2 <= 4) {
          val pvals = Array(
            buf(i2 - 1)(j2 - 1), buf(i2 - 1)(j2), buf(i2 - 1)(j2 + 1),
            buf(i2 - 1)(j2 + 2), buf(i2 - 1)(j2 + 3),
            buf(i2)(j2 - 1), buf(i2 + 1)(j2 - 1))
          var r0 = 0
          while (r0 < 8) {
            var s = 0
            var t = 0
            while (t < 7) {
              s += taps(m * 64 + r0 * 8 + t) * pvals(t)
              t += 1
            }
            val v0 = math.max(0, math.min(255, (s + 8) >> 4))
            buf(i2 + (r0 >> 2))(j2 + (r0 & 3)) = v0
            r0 += 1
          }
          j2 += 4
        }
        i2 += 2
      }
      i = 0
      while (i < 4) {
        j = 0
        while (j < 4) { pred(i * 4 + j) = buf(i + 1)(j + 1); j += 1 }
        i += 1
      }
    }

    /** CfL: luma AC contribution in Q3 from the reconstructed luma
      * (spec 7.11.5), alpha applied per chroma plane
      */
    private def cflAdjust(pred: Array[Int], x: Int, y: Int,
                          alpha: Int): Unit = {
      if (alpha == 0) return
      val yPl = planes(0)
      val l = new Array[Int](16)
      var s = 0
      var i = 0
      while (i < 4) {
        val ly = math.min((y + i) << 1, maxLumaH - 2)
        var j = 0
        while (j < 4) {
          val lx = math.min((x + j) << 1, maxLumaW - 2)
          val t = yPl(ly * lw + lx) + yPl(ly * lw + lx + 1) +
            yPl((ly + 1) * lw + lx) + yPl((ly + 1) * lw + lx + 1)
          l(i * 4 + j) = t << 1
          s += t << 1
          j += 1
        }
        i += 1
      }
      val avg = (s + 8) >> 4
      i = 0
      while (i < 16) {
        val d = alpha * (l(i) - avg)
        val r2 = (math.abs(d) + 32) >> 6
        pred(i) = pred(i) + (if (d >= 0) r2 else -r2)
        i += 1
      }
    }
  }
}
