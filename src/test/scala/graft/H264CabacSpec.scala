package graft

import graft.ext.{H264, H264Cabac}
import org.scalatest.funsuite.AnyFunSuite

/** CABAC I-slice decoding — validation without conformance vectors:
  *  1. DUAL TRANSCRIPTION: this file carries independently written
  *     second copies of Table 9-44 / 9-45 and the I-slice (m, n)
  *     initialization column; they must agree entry-for-entry with
  *     the decoder's copies.
  *  2. A from-spec CABAC ENCODER (flowcharts 9.3.4.x: PutBit with
  *     outstanding-bit accounting and the swallowed first bit,
  *     EncodeDecision/Bypass/Terminate/Flush) built on the TEST-side
  *     tables; adversarial bin sequences drive every probability
  *     state through encode∘decode = identity.
  *  3. Slice-level fixtures whose expected pixels are the SAME
  *     hand-derived goldens the CAVLC twin tests pinned (flat 128,
  *     DC-level 133, the AC-residual column pattern, the I_4x4
  *     run-placement block, PCM byte-exactness + engine reinit) —
  *     entropy coding must be invisible in the reconstruction.
  */
class H264CabacSpec extends AnyFunSuite {

  // ===================== dual transcription: second table copies

  private val TRange: Array[Array[Int]] = Array(
    Array(128, 176, 208, 240), Array(128, 167, 197, 227),
    Array(128, 158, 187, 216), Array(123, 150, 178, 205),
    Array(116, 142, 169, 195), Array(111, 135, 160, 185),
    Array(105, 128, 152, 175), Array(100, 122, 144, 166),
    Array(95, 116, 137, 158), Array(90, 110, 130, 150),
    Array(85, 104, 123, 142), Array(81, 99, 117, 135),
    Array(77, 94, 111, 128), Array(73, 89, 105, 122),
    Array(69, 85, 100, 116), Array(66, 80, 95, 110),
    Array(62, 76, 90, 104), Array(59, 72, 86, 99),
    Array(56, 69, 81, 94), Array(53, 65, 77, 89),
    Array(51, 62, 73, 85), Array(48, 59, 69, 80),
    Array(46, 56, 66, 76), Array(43, 53, 63, 72),
    Array(41, 50, 59, 69), Array(39, 48, 56, 65),
    Array(37, 45, 54, 62), Array(35, 43, 51, 59),
    Array(33, 41, 48, 56), Array(32, 39, 46, 53),
    Array(30, 37, 43, 50), Array(28, 35, 41, 48),
    Array(27, 33, 39, 45), Array(26, 31, 37, 43),
    Array(24, 30, 35, 41), Array(23, 28, 33, 39),
    Array(22, 27, 32, 37), Array(21, 26, 30, 35),
    Array(20, 24, 29, 33), Array(19, 23, 27, 31),
    Array(18, 22, 26, 30), Array(17, 21, 25, 28),
    Array(16, 20, 23, 27), Array(15, 19, 22, 25),
    Array(14, 18, 21, 24), Array(14, 17, 20, 23),
    Array(13, 16, 19, 22), Array(12, 15, 18, 21),
    Array(12, 14, 17, 20), Array(11, 14, 16, 19),
    Array(11, 13, 15, 18), Array(10, 12, 15, 17),
    Array(10, 12, 14, 16), Array(9, 11, 13, 15),
    Array(9, 11, 12, 14), Array(8, 10, 12, 14),
    Array(8, 9, 11, 13), Array(7, 9, 11, 12),
    Array(7, 9, 10, 12), Array(7, 8, 10, 11),
    Array(6, 8, 9, 11), Array(6, 7, 9, 10),
    Array(6, 7, 8, 9), Array(2, 2, 2, 2))

  private val TTrans: Array[Int] = Array(
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7,
    8, 9, 9, 11, 11, 12, 13, 13, 15, 15,
    16, 16, 18, 18, 19, 19, 21, 21, 23, 22,
    23, 24, 24, 25, 26, 26, 27, 27, 28, 29,
    29, 30, 30, 30, 31, 32, 32, 33, 33, 33,
    34, 34, 35, 35, 35, 36, 36, 36, 37, 37,
    37, 38, 38, 63)

  /** (ctxIdx, m, n) triples — second transcription of the I column. */
  private val TInit: Seq[(Int, Int, Int)] = {
    def grp(base: Int, mn: (Int, Int)*): Seq[(Int, Int, Int)] =
      mn.zipWithIndex.map { case ((m, n), i) => (base + i, m, n) }
    grp(0, (20, -15), (2, 54), (3, 74)) ++
      grp(3, (20, -15), (2, 54), (3, 74), (-28, 127), (-23, 104),
        (-6, 53), (-1, 54), (7, 51)) ++
      grp(60, (0, 41), (0, 63), (0, 63), (0, 63)) ++
      grp(64, (-9, 83), (4, 86), (0, 97), (-7, 72)) ++
      grp(68, (13, 41)) ++ grp(69, (3, 62)) ++
      grp(70, (0, 11), (1, 55), (0, 69)) ++
      grp(73, (-17, 127), (-13, 102), (0, 82), (-7, 74)) ++
      grp(77, (-21, 107), (-27, 127), (-31, 127), (-24, 127)) ++
      grp(81, (-18, 95), (-27, 127), (-21, 114), (-30, 127)) ++
      grp(85, (-17, 123), (-12, 115), (-16, 122), (-11, 115)) ++
      grp(89, (-12, 63), (-2, 68), (-15, 84), (-13, 104)) ++
      grp(93, (-3, 70), (-8, 93), (-10, 90), (-30, 127)) ++
      grp(97, (-1, 74), (-6, 97), (-7, 91), (-20, 127)) ++
      grp(101, (-4, 56), (-5, 82), (-7, 76), (-22, 125)) ++
      grp(105, (-7, 93), (-11, 87), (-3, 77), (-5, 71), (-4, 63)) ++
      grp(110, (-4, 68), (-12, 84), (-7, 62), (-7, 65), (8, 61)) ++
      grp(115, (5, 56), (-2, 66), (1, 64), (0, 61), (-2, 78)) ++
      grp(120, (1, 50), (7, 52), (10, 35), (0, 44), (11, 38)) ++
      grp(125, (1, 45), (0, 46), (5, 44), (31, 17), (1, 51)) ++
      grp(130, (7, 50), (28, 19), (16, 33), (14, 62)) ++
      grp(134, (-13, 108), (-15, 100), (-13, 101), (-13, 91), (-12, 94)) ++
      grp(139, (-10, 88), (-16, 84), (-10, 86), (-7, 83), (-13, 87)) ++
      grp(144, (-19, 94), (1, 70), (0, 72), (-5, 74), (18, 59)) ++
      grp(149, (-8, 102), (-15, 100), (0, 95)) ++
      grp(152, (-4, 75), (2, 72), (-11, 75), (-3, 71), (15, 46)) ++
      grp(157, (-13, 69), (0, 62), (0, 65), (21, 37), (-15, 72)) ++
      grp(162, (9, 57), (16, 54), (0, 62), (12, 72)) ++
      grp(166, (24, 0), (15, 9), (8, 25), (13, 18), (15, 9)) ++
      grp(171, (13, 19), (10, 37), (12, 18), (6, 29), (20, 33)) ++
      grp(176, (15, 30), (4, 45), (1, 58), (0, 62), (7, 61)) ++
      grp(181, (12, 38), (11, 45), (15, 39), (11, 42), (13, 44)) ++
      grp(186, (16, 45), (12, 41), (10, 49), (30, 34), (18, 42)) ++
      grp(191, (10, 55), (17, 51), (17, 46), (0, 89)) ++
      grp(195, (26, -19), (22, -17), (26, -17), (30, -25), (28, -20)) ++
      grp(200, (33, -23), (37, -27), (33, -23), (40, -28), (38, -17)) ++
      grp(205, (33, -11), (40, -15), (41, -6), (38, 1), (41, 17)) ++
      grp(210, (30, -6), (27, 3), (26, 22)) ++
      grp(213, (37, -16), (35, -4), (38, -8), (38, -3), (37, 3)) ++
      grp(218, (38, 5), (42, 0), (35, 16), (39, 22), (14, 48)) ++
      grp(223, (27, 37), (21, 60), (12, 68), (2, 97)) ++
      grp(227, (-3, 71), (-6, 42), (-5, 50), (-3, 54), (-2, 62)) ++
      grp(232, (0, 58), (1, 63), (-2, 72), (-1, 74), (-9, 91)) ++
      grp(237, (-5, 67), (-4, 76), (-4, 77), (-6, 76), (2, 61)) ++
      grp(242, (-2, 61), (-3, 68), (-8, 74), (-9, 92), (-14, 106)) ++
      grp(247, (-13, 97), (-15, 90), (-12, 90), (-18, 88), (-10, 73)) ++
      grp(252, (-9, 79), (-14, 86), (-10, 73), (-10, 70), (-10, 69)) ++
      grp(257, (-5, 66), (-9, 64), (-5, 58), (2, 59), (21, -10)) ++
      grp(262, (24, -11), (28, -8), (28, 1), (29, 3)) ++
      grp(266, (29, 9), (35, 20), (29, 36), (14, 67), (17, 35)) ++
      grp(271, (18, 31), (17, 35), (21, 30), (17, 45), (20, 42)) ++
      grp(399, (31, 21), (31, 31), (25, 50)) ++
      grp(402, (-17, 120), (-20, 112), (-18, 114), (-11, 85), (-15, 92)) ++
      grp(407, (-14, 89), (-26, 71), (-15, 81), (-14, 80), (0, 68)) ++
      grp(412, (-14, 70), (-24, 56), (-23, 68), (-24, 50), (-11, 74)) ++
      grp(417, (23, -13), (26, -13), (40, -15), (49, -14), (44, 3)) ++
      grp(422, (45, 6), (44, 34), (33, 54), (19, 82)) ++
      grp(426, (-3, 75), (-1, 23), (1, 34), (1, 43), (0, 54)) ++
      grp(431, (-2, 55), (0, 61), (1, 64), (0, 68), (-9, 92))
  }

  /** Second transcriptions of the Table 9-43 position maps (typed as
    * an 8-per-row grid here vs the decoder's 16-per-row layout).
    */
  private val TSig8: Array[Int] = Array(
    0, 1, 2, 3, 4, 5, 5, 4,
    4, 3, 3, 4, 4, 4, 5, 5,
    4, 4, 4, 4, 3, 3, 6, 7,
    7, 7, 8, 9, 10, 9, 8, 7,
    7, 6, 11, 12, 13, 11, 6, 7,
    8, 9, 14, 10, 9, 8, 6, 11,
    12, 13, 11, 6, 9, 14, 10, 9,
    11, 12, 13, 11, 14, 10, 12)
  private val TLast8: Array[Int] = Array(
    0, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2,
    3, 3, 3, 3, 3, 3, 3, 3,
    4, 4, 4, 4, 5, 5, 5)

  test("dual transcription: engine tables and init column agree with the decoder's") {
    for (s <- 0 until 64; q <- 0 until 4)
      assert(H264Cabac.RangeTabLps(s * 4 + q) === TRange(s)(q), s"rangeTab[$s][$q]")
    for (s <- 0 until 64)
      assert(H264Cabac.TransIdxLps(s) === TTrans(s), s"transIdx[$s]")
    assert(TInit.map(_._1).distinct.size === TInit.size)
    for ((ctx, m, n) <- TInit) {
      assert(H264Cabac.InitI(ctx * 2) === m, s"init m[$ctx]")
      assert(H264Cabac.InitI(ctx * 2 + 1) === n, s"init n[$ctx]")
    }
    // every context a decoder path can touch is covered by the list
    val covered = TInit.map(_._1).toSet
    val needed = (3 to 10) ++ (60 to 69) ++ (73 to 275) ++ (399 to 435)
    needed.foreach(c => assert(covered.contains(c), s"ctx $c uncovered"))
    for (i <- 0 until 63) {
      assert(H264Cabac.Sig8x8Ctx(i) === TSig8(i), s"sig8x8[$i]")
      assert(H264Cabac.Last8x8Ctx(i) === TLast8(i), s"last8x8[$i]")
    }
  }

  // ===================== from-spec encoder (9.3.4.x), TEST tables

  private final class Enc {
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    private var low = 0
    private var range = 510
    private var outstanding = 0
    private var first = true
    val pState = new Array[Int](436)
    val valMps = new Array[Int](436)

    def initCtx(sliceQp: Int): Unit = {
      val qp = math.max(0, math.min(51, sliceQp))
      for (c <- 0 until 436) { pState(c) = 62; valMps(c) = 0 } // unused ctx
      for ((ctx, m, n) <- TInit) {
        val pre = math.max(1, math.min(126, ((m * qp) >> 4) + n))
        if (pre <= 63) { pState(ctx) = 63 - pre; valMps(ctx) = 0 }
        else { pState(ctx) = pre - 64; valMps(ctx) = 1 }
      }
      pState(276) = 63; valMps(276) = 0
      reinitEngine()
    }

    def reinitEngine(): Unit = {
      low = 0; range = 510; outstanding = 0; first = true
    }

    private def putBit(b: Int): Unit = {
      if (first) first = false else out += b
      while (outstanding > 0) { out += 1 - b; outstanding -= 1 }
    }

    private def renorm(): Unit =
      while (range < 256) {
        if (low < 256) putBit(0)
        else if (low >= 512) { low -= 512; putBit(1) }
        else { low -= 256; outstanding += 1 }
        range <<= 1
        low <<= 1
      }

    def decision(ctx: Int, bin: Int): Unit = {
      val q = (range >> 6) & 3
      val lps = TRange(pState(ctx))(q)
      range -= lps
      if (bin != valMps(ctx)) {
        low += range
        range = lps
        if (pState(ctx) == 0) valMps(ctx) = 1 - valMps(ctx)
        pState(ctx) = TTrans(pState(ctx))
      } else if (pState(ctx) < 62) pState(ctx) += 1
      renorm()
    }

    def bypass(bin: Int): Unit = {
      low <<= 1
      if (bin == 1) low += range
      if (low >= 1024) { putBit(1); low -= 1024 }
      else if (low < 512) putBit(0)
      else { low -= 512; outstanding += 1 }
    }

    def terminate(bin: Int): Unit = {
      range -= 2
      if (bin == 1) { low += range; flush() }
      else renorm()
    }

    private def flush(): Unit = {
      range = 2
      renorm()
      putBit((low >> 9) & 1)
      val v = ((low >> 7) & 3) | 1
      out += (v >> 1) & 1
      out += v & 1
    }

    /** pcm_alignment_zero_bit + raw PCM bytes between flush and the
      * engine reinit.
      */
    def alignAndRaw(bytes: Seq[Int]): Unit = {
      while (out.size % 8 != 0) out += 0
      bytes.foreach(b => (7 to 0 by -1).foreach(k => out += (b >> k) & 1))
    }
  }

  test("engine: adversarial bin round-trip sweeps all 64 states, bypass + terminate interleaved") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 8) {
      val qp = Seq(0, 12, 26, 39, 51)(trial % 5)
      val plan = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]() // (kind, ctx, bin)
      // biased phases drive states to both extremes, then noise
      for (phase <- 0 until 6) {
        val ctx = Seq(3, 60, 68, 105, 227, 276 - 1)(phase)
        val bias = if (phase % 2 == 0) 9 else 1
        for (_ <- 0 until 400)
          plan += ((0, ctx, if (rnd.nextInt(10) < bias) 1 else 0))
      }
      for (_ <- 0 until 4000) {
        rnd.nextInt(3) match {
          case 0 => plan += ((0, 3 + rnd.nextInt(273), rnd.nextInt(2)))
          case 1 => plan += ((1, 0, rnd.nextInt(2)))
          case 2 => plan += ((0, 149 + rnd.nextInt(100), rnd.nextInt(2)))
        }
      }
      val enc = new Enc
      enc.initCtx(qp)
      plan.foreach {
        case (0, ctx, bin) => enc.decision(ctx, bin)
        case (_, _, bin) => enc.bypass(bin)
      }
      enc.terminate(0)
      enc.terminate(1)
      // byte-pad and decode
      while (enc.out.size % 8 != 0) enc.out += 0
      val bytes = enc.out.grouped(8)
        .map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
      val br = new H264.Br(bytes)
      val eng = new graft.ext.H264CabacEngine(br)
      eng.init(qp)
      plan.zipWithIndex.foreach {
        case ((0, ctx, bin), i) =>
          assert(eng.decision(ctx) === bin, s"trial $trial decision $i")
        case ((_, _, bin), i) =>
          assert(eng.bypass() === bin, s"trial $trial bypass $i")
      }
      assert(eng.terminate() === 0, s"trial $trial pre-terminate")
      assert(eng.terminate() === 1, s"trial $trial terminate")
    }
  }

  // ===================== MB-level encoder (mirrors 9.3.3.1.1 ctx rules)

  private val BlkX = Array(0, 1, 0, 1, 2, 3, 2, 3, 0, 1, 0, 1, 2, 3, 2, 3)
  private val BlkY = Array(0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3)
  private val R2B: Array[Int] = {
    val inv = new Array[Int](16)
    for (b <- 0 until 16) inv(BlkX(b) + 4 * BlkY(b)) = b
    inv
  }
  private val SigOff = Array(0, 15, 29, 44, 47)
  private val CbfOff = Array(0, 4, 8, 12, 16)
  private val AbsOff = Array(0, 10, 20, 30, 39)

  /** Macroblock content for the fixture encoder. `coeffs` are in
    * SCAN order (zigzag list positions), like the decoder's scan
    * arrays.
    */
  private sealed trait Mb
  private case class PcmMb(luma: Array[Int]) extends Mb
  private case class I16Mb(predMode: Int, dc: Array[Int],
                           ac: Array[Array[Int]], qpDelta: Int = 0) extends Mb
  private case class I4Mb(modes: Array[Int], coeffs: Array[Array[Int]],
                          qpDelta: Int = 0) extends Mb
  /** High-profile I_NxN with transform_size_8x8: 4 modes, 4 optional
    * 64-level coefficient arrays in 8x8 SCAN order.
    */
  private case class I8Mb(modes: Array[Int], coeffs: Array[Array[Int]],
                          qpDelta: Int = 0,
                          chromaDc: Array[Array[Int]] = null) extends Mb

  /** Encode a full I slice of `mbs` (wMbs × hMbs raster) and return
    * the escaped IDR NAL. Tracks the same neighbor state the decoder
    * derives contexts from.
    */
  private def cabacIdrSlice(wMbs: Int, hMbs: Int, mbs: Seq[Mb],
                            transform8x8: Boolean = false): Array[Byte] = {
    val n = wMbs * hMbs
    require(mbs.length == n)
    val isI4 = new Array[Boolean](n)
    val isI8 = new Array[Boolean](n)
    val isPcm = new Array[Boolean](n)
    val isI16 = new Array[Boolean](n)
    val cbpL = new Array[Int](n)
    val cbpC = new Array[Int](n)
    val lDc = new Array[Boolean](n)
    val cDc = Array.fill(n)(new Array[Boolean](2)) // chroma DC cbf per comp
    val modes = Array.fill(n)(Array.fill(16)(2))
    val lumaCbf = Array.ofDim[Boolean](n, 16) // by coded block order
    val enc = new Enc
    enc.initCtx(26)
    var prevQpDelta = 0

    def encQpDelta(delta: Int): Unit = {
      val k = if (delta > 0) 2 * delta - 1 else -2 * delta
      if (k == 0) enc.decision(60 + (if (prevQpDelta != 0) 1 else 0), 0)
      else {
        enc.decision(60 + (if (prevQpDelta != 0) 1 else 0), 1)
        for (i <- 1 until k) enc.decision(if (i == 1) 62 else 63, 1)
        enc.decision(if (k == 1) 62 else 63, 0)
      }
      prevQpDelta = delta
    }

    def encResidual(cat: Int, cbfInc: Int, lv: Array[Int], maxCoeff: Int): Boolean = {
      val any = lv.take(maxCoeff).exists(_ != 0)
      enc.decision(85 + CbfOff(cat) + cbfInc, if (any) 1 else 0)
      if (!any) return false
      val lastIdx = (0 until maxCoeff).filter(lv(_) != 0).max
      var i = 0
      var done = false
      while (!done && i < maxCoeff - 1) {
        val inc = if (cat == 3) math.min(i, 2) else i
        val sig = lv(i) != 0
        enc.decision(105 + SigOff(cat) + inc, if (sig) 1 else 0)
        if (sig) {
          val last = i == lastIdx
          enc.decision(166 + SigOff(cat) + inc, if (last) 1 else 0)
          if (last) done = true
        }
        i += 1
      }
      var numEq1 = 0
      var numGt1 = 0
      var j = lastIdx
      while (j >= 0) {
        if (lv(j) != 0) {
          val a = math.abs(lv(j))
          val m1 = a - 1
          val ctx0 = 227 + AbsOff(cat) +
            (if (numGt1 != 0) 0 else math.min(4, 1 + numEq1))
          if (m1 == 0) enc.decision(ctx0, 0)
          else {
            enc.decision(ctx0, 1)
            val ctxN = 227 + AbsOff(cat) + 5 +
              math.min(4 - (if (cat == 3) 1 else 0), numGt1)
            val pref = math.min(m1, 14)
            for (_ <- 1 until pref) enc.decision(ctxN, 1)
            if (pref < 14) enc.decision(ctxN, 0)
            else { // UEG0 suffix in bypass
              val rem = m1 - 14
              var zeros = 0
              while (rem > (1 << (zeros + 1)) - 2) zeros += 1
              for (_ <- 0 until zeros) enc.bypass(1)
              enc.bypass(0)
              val suf = rem - ((1 << zeros) - 1)
              for (k <- zeros - 1 to 0 by -1) enc.bypass((suf >> k) & 1)
            }
          }
          enc.bypass(if (lv(j) < 0) 1 else 0)
          if (a == 1) numEq1 += 1 else numGt1 += 1
        }
        j -= 1
      }
      true
    }

    for (addr <- 0 until n) {
      val mbX = addr % wMbs
      val mbY = addr / wMbs
      val left = if (mbX > 0) addr - 1 else -1
      val above = if (mbY > 0) addr - wMbs else -1
      val mb = mbs(addr)
      // mb_type bin 0 (ctx 3 + neighbors not-I_NxN)
      val condA = if (left >= 0 && !isI4(left) && !isI8(left)) 1 else 0
      val condB = if (above >= 0 && !isI4(above) && !isI8(above)) 1 else 0
      def encTransformFlag(bin: Int): Unit = {
        val tA = if (left >= 0 && isI8(left)) 1 else 0
        val tB = if (above >= 0 && isI8(above)) 1 else 0
        enc.decision(399 + tA + tB, bin)
      }
      // cat-5 residual: no coded_block_flag in 4:2:0; Table 9-43 maps
      def encResidual8x8(lv: Array[Int]): Unit = {
        val lastIdx = (0 until 64).filter(lv(_) != 0).max
        var i = 0
        var done = false
        while (!done && i < 63) {
          val sig = lv(i) != 0
          enc.decision(402 + TSig8(i), if (sig) 1 else 0)
          if (sig) {
            val last = i == lastIdx
            enc.decision(417 + TLast8(i), if (last) 1 else 0)
            if (last) done = true
          }
          i += 1
        }
        var numEq1 = 0
        var numGt1 = 0
        var j = lastIdx
        while (j >= 0) {
          if (lv(j) != 0) {
            val a = math.abs(lv(j))
            val m1 = a - 1
            val ctx0 = 426 + (if (numGt1 != 0) 0 else math.min(4, 1 + numEq1))
            if (m1 == 0) enc.decision(ctx0, 0)
            else {
              enc.decision(ctx0, 1)
              val ctxN = 426 + 5 + math.min(4, numGt1)
              val pref = math.min(m1, 14)
              for (_ <- 1 until pref) enc.decision(ctxN, 1)
              if (pref < 14) enc.decision(ctxN, 0)
              else {
                val rem = m1 - 14
                var zeros = 0
                while (rem > (1 << (zeros + 1)) - 2) zeros += 1
                for (_ <- 0 until zeros) enc.bypass(1)
                enc.bypass(0)
                val suf = rem - ((1 << zeros) - 1)
                for (k <- zeros - 1 to 0 by -1) enc.bypass((suf >> k) & 1)
              }
            }
            enc.bypass(if (lv(j) < 0) 1 else 0)
            if (a == 1) numEq1 += 1 else numGt1 += 1
          }
          j -= 1
        }
      }
      mb match {
        case PcmMb(luma) =>
          enc.decision(3 + condA + condB, 1)
          enc.terminate(1)
          enc.alignAndRaw(luma.toSeq ++ Seq.fill(128)(0x80))
          enc.reinitEngine()
          isPcm(addr) = true
          cbpL(addr) = 15
          cbpC(addr) = 2
          lDc(addr) = true
          cDc(addr)(0) = true
          cDc(addr)(1) = true
          java.util.Arrays.fill(lumaCbf(addr), true)
          prevQpDelta = 0
        case I16Mb(pm, dc, ac, qpDelta) =>
          enc.decision(3 + condA + condB, 1)
          enc.terminate(0)
          val hasAc = ac != null && ac.exists(b => b != null && b.exists(_ != 0))
          enc.decision(6, if (hasAc) 1 else 0) // cbp luma 0 or 15
          enc.decision(7, 0) // cbp chroma 0
          enc.decision(9, (pm >> 1) & 1)
          enc.decision(10, pm & 1)
          isI16(addr) = true
          cbpL(addr) = if (hasAc) 15 else 0
          // intra_chroma_pred_mode = 0 (ctx 64 + neighbor conds)
          val cA = 0 // fixtures always use chroma mode 0
          val cB = 0
          enc.decision(64 + cA + cB, 0)
          // mb_qp_delta (always present for I_16x16)
          encQpDelta(qpDelta)
          // luma DC (cat 0): cbf neighbors
          def dcCond(nb: Int): Int =
            if (nb < 0) 1
            else if (isPcm(nb)) 1
            else if (isI16(nb) && lDc(nb)) 1
            else 0
          lDc(addr) = encResidual(0, dcCond(left) + 2 * dcCond(above), dc, 16)
          if (hasAc) {
            for (b <- 0 until 16) {
              val inc = lumaNbCond(addr, b, lumaCbf, isPcm, wMbs, left, above) // below
              val block = if (ac(b) == null) new Array[Int](15) else ac(b)
              lumaCbf(addr)(b) = encResidual(1, inc, block, 15)
            }
          }
        case I8Mb(mds, coeffs, qpDelta, chromaDc) =>
          enc.decision(3 + condA + condB, 0)
          require(transform8x8)
          encTransformFlag(1)
          isI8(addr) = true
          for (b8 <- 0 until 4) {
            val bx8 = (b8 & 1) * 2
            val by8 = (b8 >> 1) * 2
            val mA =
              if ((b8 & 1) == 1) modes(addr)(R2B(bx8 - 1 + 4 * by8))
              else nbMode(addr, bx8 - 1, by8, wMbs, isI4, isPcm, modes, mbX, mbY, left,
                isI8)
            val mB =
              if (b8 >= 2) modes(addr)(R2B(bx8 + 4 * (by8 - 1)))
              else nbModeUp(addr, bx8, by8 - 1, wMbs, isI4, isPcm, modes, mbX, mbY, above,
                isI8)
            val pred = if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
            val want = mds(b8)
            if (want == pred) enc.decision(68, 1)
            else {
              enc.decision(68, 0)
              val rem = if (want < pred) want else want - 1
              enc.decision(69, rem & 1)
              enc.decision(69, (rem >> 1) & 1)
              enc.decision(69, (rem >> 2) & 1)
            }
            // replicate into the covered 4x4 slots, like the decoder
            modes(addr)(R2B(bx8 + 4 * by8)) = want
            modes(addr)(R2B(bx8 + 1 + 4 * by8)) = want
            modes(addr)(R2B(bx8 + 4 * (by8 + 1))) = want
            modes(addr)(R2B(bx8 + 1 + 4 * (by8 + 1))) = want
          }
          enc.decision(64, 0) // chroma pred 0
          var cbp8 = 0
          for (g <- 0 until 4)
            if (coeffs(g) != null && coeffs(g).exists(_ != 0)) cbp8 |= 1 << g
          for (b <- 0 until 4) {
            val cndA =
              if ((b & 1) == 1) (if ((cbp8 & (1 << (b - 1))) != 0) 0 else 1)
              else if (left < 0) 0
              else if (isPcm(left)) 0
              else if ((cbpL(left) & (1 << (b + 1))) != 0) 0
              else 1
            val cndB =
              if (b >= 2) (if ((cbp8 & (1 << (b - 2))) != 0) 0 else 1)
              else if (above < 0) 0
              else if (isPcm(above)) 0
              else if ((cbpL(above) & (1 << (b + 2))) != 0) 0
              else 1
            enc.decision(73 + cndA + 2 * cndB, (cbp8 >> b) & 1)
          }
          val chA8 = if (left >= 0 && (isPcm(left) || cbpC(left) != 0)) 1 else 0
          val chB8 = if (above >= 0 && (isPcm(above) || cbpC(above) != 0)) 1 else 0
          val hasChroma = chromaDc != null
          enc.decision(77 + chA8 + 2 * chB8, if (hasChroma) 1 else 0)
          if (hasChroma) {
            val c2A = if (left >= 0 && (isPcm(left) || cbpC(left) == 2)) 1 else 0
            val c2B = if (above >= 0 && (isPcm(above) || cbpC(above) == 2)) 1 else 0
            enc.decision(81 + c2A + 2 * c2B, 0) // cbpChroma = 1 (DC only)
            cbpC(addr) = 1
          }
          cbpL(addr) = cbp8
          if (cbp8 != 0 || hasChroma) encQpDelta(qpDelta)
          for (b8 <- 0 until 4 if (cbp8 & (1 << b8)) != 0) {
            encResidual8x8(coeffs(b8))
            val bx8 = (b8 & 1) * 2
            val by8 = (b8 >> 1) * 2
            lumaCbf(addr)(R2B(bx8 + 4 * by8)) = true
            lumaCbf(addr)(R2B(bx8 + 1 + 4 * by8)) = true
            lumaCbf(addr)(R2B(bx8 + 4 * (by8 + 1))) = true
            lumaCbf(addr)(R2B(bx8 + 1 + 4 * (by8 + 1))) = true
          }
          if (hasChroma) {
            // chroma 2x2 DC (cat 3) straight after the 8x8 luma
            // residuals — the hand-off this fixture pins; cbf conds
            // track neighbor chroma-DC state like the decoder's
            // chromaDcCbfCond (unavailable/PCM → intra default 1)
            for (comp <- 0 until 2) {
              def cdCond(nb: Int): Int =
                if (nb < 0) 1
                else if (isPcm(nb)) 1
                else if (cDc(nb)(comp)) 1
                else 0
              cDc(addr)(comp) = encResidual(3,
                cdCond(left) + 2 * cdCond(above), chromaDc(comp), 4)
            }
          }
        case I4Mb(mds, coeffs, qpDelta) =>
          enc.decision(3 + condA + condB, 0)
          if (transform8x8) encTransformFlag(0)
          isI4(addr) = true
          // pred modes, coded block order
          for (b <- 0 until 16) {
            val bx = BlkX(b)
            val by = BlkY(b)
            val mA = nbMode(addr, bx - 1, by, wMbs, isI4, isPcm, modes, mbX, mbY, left, isI8)
            val mB = nbModeUp(addr, bx, by - 1, wMbs, isI4, isPcm, modes, mbX, mbY, above, isI8)
            val pred = if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
            val want = mds(b)
            if (want == pred) enc.decision(68, 1)
            else {
              enc.decision(68, 0)
              val rem = if (want < pred) want else want - 1
              enc.decision(69, rem & 1)
              enc.decision(69, (rem >> 1) & 1)
              enc.decision(69, (rem >> 2) & 1)
            }
            modes(addr)(b) = want
          }
          enc.decision(64, 0) // chroma pred 0, no intra neighbors w/ mode != 0 in fixtures
          // cbp: luma bits from coeff presence per 8x8 group
          var cbp = 0
          for (g <- 0 until 4)
            if ((0 until 4).exists(k => coeffs(g * 4 + k) != null &&
              coeffs(g * 4 + k).exists(_ != 0))) cbp |= 1 << g
          for (b <- 0 until 4) {
            val cndA =
              if ((b & 1) == 1) (if ((cbp & (1 << (b - 1))) != 0) 0 else 1)
              else if (left < 0) 0
              else if (isPcm(left)) 0
              else if ((cbpL(left) & (1 << (b + 1))) != 0) 0
              else 1
            val cndB =
              if (b >= 2) (if ((cbp & (1 << (b - 2))) != 0) 0 else 1)
              else if (above < 0) 0
              else if (isPcm(above)) 0
              else if ((cbpL(above) & (1 << (b + 2))) != 0) 0
              else 1
            enc.decision(73 + cndA + 2 * cndB, (cbp >> b) & 1)
          }
          val chA = if (left >= 0 && (isPcm(left) || cbpC(left) != 0)) 1 else 0
          val chB = if (above >= 0 && (isPcm(above) || cbpC(above) != 0)) 1 else 0
          enc.decision(77 + chA + 2 * chB, 0) // cbp chroma 0
          cbpL(addr) = cbp
          if (cbp != 0) encQpDelta(qpDelta)
          for (b <- 0 until 16 if (cbp & (1 << (b >> 2))) != 0) {
            val inc = lumaNbCond(addr, b, lumaCbf, isPcm, wMbs, left, above)
            val block = if (coeffs(b) == null) new Array[Int](16) else coeffs(b)
            lumaCbf(addr)(b) = encResidual(2, inc, block, 16)
          }
      }
      enc.terminate(if (addr == n - 1) 1 else 0) // end_of_slice_flag
    }

    // slice wrap
    val w = new BwT
    w.u(0x65, 8)
    w.ue(0).ue(7).ue(0) // first_mb, slice_type I, pps_id
    w.u(0, 4) // frame_num
    w.ue(0) // idr_pic_id
    w.u(0, 1).u(0, 1) // dec_ref_pic_marking
    w.se(0) // slice_qp_delta → 26
    w.ue(1) // disable deblocking
    while (w.size % 8 != 0) w.u(1, 1) // cabac_alignment_one_bit
    enc.out.foreach(b => w.u(b, 1))
    w.align()
    graft.ext.VideoFixtures.escapeRbsp(w.bytes())
  }

  /** cbf condTerm for a luma 4x4 neighbor (unavailable → intra
    * default 1; PCM → 1; else that block's cbf).
    */
  private def lumaNbCond(addr: Int, b: Int, lumaCbf: Array[Array[Boolean]],
                         isPcm: Array[Boolean], wMbs: Int,
                         left: Int, above: Int): Int = {
    val bx = BlkX(b)
    val by = BlkY(b)
    def cond(nb: Int, blk: Int): Int =
      if (nb < 0) 1
      else if (nb == addr) (if (lumaCbf(addr)(blk)) 1 else 0)
      else if (isPcm(nb)) 1
      else if (lumaCbf(nb)(blk)) 1
      else 0
    val a =
      if (bx > 0) cond(addr, R2B(bx - 1 + 4 * by))
      else cond(left, if (left < 0) 0 else R2B(3 + 4 * by))
    val bb =
      if (by > 0) cond(addr, R2B(bx + 4 * (by - 1)))
      else cond(above, if (above < 0) 0 else R2B(bx + 12))
    a + 2 * bb
  }

  /** Left-neighbor intra4x4 mode for mode prediction (DC fallback
    * -1 when unavailable / not I_4x4; PCM → DC 2 per 8.3.1.1).
    */
  private def nbMode(addr: Int, bx: Int, by: Int, wMbs: Int,
                     isI4: Array[Boolean], isPcm: Array[Boolean],
                     modes: Array[Array[Int]], mbX: Int, mbY: Int,
                     left: Int, isI8: Array[Boolean] = null): Int =
    if (bx >= 0) modes(addr)(R2B(bx + 4 * by))
    else if (left < 0) -1
    else if (isPcm(left)) 2
    else if (!isI4(left) && !(isI8 != null && isI8(left))) 2
    else modes(left)(R2B(3 + 4 * by))

  private def nbModeUp(addr: Int, bx: Int, by: Int, wMbs: Int,
                       isI4: Array[Boolean], isPcm: Array[Boolean],
                       modes: Array[Array[Int]], mbX: Int, mbY: Int,
                       above: Int, isI8: Array[Boolean] = null): Int =
    if (by >= 0) modes(addr)(R2B(bx + 4 * by))
    else if (above < 0) -1
    else if (isPcm(above)) 2
    else if (!isI4(above) && !(isI8 != null && isI8(above))) 2
    else modes(above)(R2B(bx + 12))

  // ---- slice-header bit writer (local twin of H264Spec's Bw)
  private final class BwT {
    private val bits = scala.collection.mutable.ArrayBuffer[Int]()
    def size: Int = bits.size
    def u(v: Int, n: Int): this.type = {
      var i = n - 1
      while (i >= 0) { bits += ((v >> i) & 1); i -= 1 }
      this
    }
    def ue(v: Int): this.type = {
      val code = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(code)
      u(0, len - 1); u(code, len)
    }
    def se(v: Int): this.type = ue(if (v <= 0) -2 * v else 2 * v - 1)
    def align(): this.type = { while (bits.size % 8 != 0) bits += 0; this }
    def bytes(): Array[Byte] = {
      val out = new Array[Byte](bits.size / 8)
      for (i <- bits.indices)
        if (bits(i) == 1) out(i / 8) = (out(i / 8) | (1 << (7 - (i % 8)))).toByte
      out
    }
  }

  private def spsNal(wMbs: Int, hMbs: Int): Array[Byte] = {
    val w = new BwT
    w.u(0x67, 8)
    w.u(77, 8).u(0, 8).u(10, 8) // Main profile
    w.ue(0).ue(0).ue(2).ue(1)
    w.u(0, 1)
    w.ue(wMbs - 1).ue(hMbs - 1)
    w.u(1, 1).u(1, 1).u(0, 1).u(0, 1)
    w.u(1, 1); w.align() // rbsp stop
    graft.ext.VideoFixtures.escapeRbsp(w.bytes())
  }

  private def cabacPps(): Array[Byte] = {
    val w = new BwT
    w.u(0x68, 8)
    w.ue(0).ue(0)
    w.u(1, 1) // entropy_coding_mode = CABAC
    w.u(0, 1)
    w.ue(0).ue(0).ue(0)
    w.u(0, 1).u(0, 2)
    w.se(0).se(0).se(0)
    w.u(1, 1) // deblocking control present
    w.u(0, 1).u(0, 1)
    w.u(1, 1); w.align()
    graft.ext.VideoFixtures.escapeRbsp(w.bytes())
  }

  private def cabacPps8x8(): Array[Byte] = {
    val w = new BwT
    w.u(0x68, 8)
    w.ue(0).ue(0)
    w.u(1, 1) // CABAC
    w.u(0, 1)
    w.ue(0).ue(0).ue(0)
    w.u(0, 1).u(0, 2)
    w.se(0).se(0).se(0)
    w.u(1, 1)
    w.u(0, 1).u(0, 1)
    w.u(1, 1) // transform_8x8_mode_flag
    w.u(0, 1) // no pic scaling matrix
    w.se(0)   // second_chroma_qp_index_offset
    w.u(1, 1); w.align()
    graft.ext.VideoFixtures.escapeRbsp(w.bytes())
  }

  private def decode(wMbs: Int, hMbs: Int, mbs: Seq[Mb]): (Array[Double], Int, Int) =
    H264.decodeIdrLumaOrNull(
      Seq(spsNal(wMbs, hMbs), cabacPps(), cabacIdrSlice(wMbs, hMbs, mbs)))

  private def decode8x8(wMbs: Int, hMbs: Int, mbs: Seq[Mb]): (Array[Double], Int, Int) =
    H264.decodeIdrLumaOrNull(
      Seq(spsNal(wMbs, hMbs), cabacPps8x8(),
        cabacIdrSlice(wMbs, hMbs, mbs, transform8x8 = true)))

  // ===================== slice fixtures against the CAVLC goldens

  test("I_16x16 DC, no residual, 2x2 MBs: flat 128 (CAVLC twin golden)") {
    val got = decode(2, 2, Seq.fill(4)(I16Mb(2, new Array[Int](16), null)))
    assert(got != null)
    assert(got._1.forall(_ === 128.0))
  }

  test("I_16x16 DC + single DC level 6 at QP 26: flat 133 (CAVLC twin golden)") {
    val dc = new Array[Int](16)
    dc(0) = 6
    val got = decode(1, 1, Seq(I16Mb(2, dc, null)))
    assert(got != null)
    assert(got._1.forall(_ === 133.0), got._1.take(4).toSeq.toString)
  }

  test("I_16x16 AC residual: the CAVLC column golden [132,130,126,124]") {
    val ac = Array.fill[Array[Int]](16)(null)
    ac(0) = new Array[Int](15)
    ac(0)(0) = 1 // scan position 1 → raster (0,1), matches the CAVLC fixture
    val got = decode(1, 1, Seq(I16Mb(2, new Array[Int](16), ac)))
    assert(got != null)
    val g = got._1
    for (y <- 0 until 4; x <- 0 until 4)
      assert(g(y * 16 + x) === Seq(132.0, 130.0, 126.0, 124.0)(x), s"b0 ($x,$y)")
    for (y <- 0 until 16; x <- 0 until 16 if x >= 4 || y >= 4)
      assert(g(y * 16 + x) === 128.0, s"rest ($x,$y)")
  }

  test("I_4x4 DC with residual [+2,-1]: the CAVLC block goldens 131..139/139/135/137") {
    val coeffs = Array.fill[Array[Int]](16)(null)
    coeffs(0) = new Array[Int](16)
    coeffs(0)(0) = 2
    coeffs(0)(1) = -1
    val got = decode(1, 1, Seq(I4Mb(Array.fill(16)(2), coeffs)))
    assert(got != null)
    val g = got._1
    for (y <- 0 until 4; x <- 0 until 4)
      assert(g(y * 16 + x) === Seq(131.0, 133.0, 137.0, 139.0)(x), s"b0 ($x,$y)")
    for (y <- 0 until 4; x <- 4 until 8)
      assert(g(y * 16 + x) === 139.0, s"b1 ($x,$y)")
    for (y <- 4 until 8; x <- 0 until 4)
      assert(g(y * 16 + x) === 135.0, s"b2 ($x,$y)")
    for (y <- 4 until 8; x <- 4 until 8)
      assert(g(y * 16 + x) === 137.0, s"b3 ($x,$y)")
  }

  test("I_PCM inside CABAC: byte-exact samples, aligned resume, engine reinit") {
    val pcm = Array.tabulate(256)(i => (i * 7 + 13) & 0xFF)
    // PCM sandwiched between coded MBs: alignment AND reinit must both
    // be exact for the following MB to decode
    val dc = new Array[Int](16)
    dc(0) = 6
    val got = decode(3, 1, Seq(I16Mb(2, dc, null), PcmMb(pcm), I16Mb(2, dc, null)))
    assert(got != null)
    val (g, w, _) = got
    // MB2's DC prediction averages the PCM MB's right column; +5 from
    // the DC level 6 (same residual math the 133 golden pinned)
    val dcPred = ((0 until 16).map(y => pcm(y * 16 + 15)).sum + 8) >> 4
    val post = math.max(0, math.min(255, dcPred + 5)).toDouble
    for (y <- 0 until 16; x <- 0 until 16) {
      assert(g(y * w + x) === 133.0, s"pre ($x,$y)")
      assert(g(y * w + 16 + x) === pcm(y * 16 + x).toDouble, s"pcm ($x,$y)")
      assert(g(y * w + 32 + x) === post, s"post ($x,$y)")
    }
  }

  test("I_4x4 modes + qp_delta across MBs: multi-MB neighbor contexts round-trip") {
    val rnd = new scala.util.Random(77)
    val mbs = (0 until 4).map { k =>
      val coeffs = Array.fill[Array[Int]](16)(null)
      for (b <- 0 until 16 if rnd.nextBoolean()) {
        val c = new Array[Int](16)
        for (_ <- 0 until 1 + rnd.nextInt(4)) c(rnd.nextInt(16)) = rnd.nextInt(9) - 4
        coeffs(b) = c
      }
      // legal 4x4 modes only where neighbors exist: stick to DC(2),
      // horizontal(1) right of PCM... fixtures use DC everywhere
      I4Mb(Array.fill(16)(2), coeffs, qpDelta = Seq(0, 2, -3, 0)(k))
    }
    val got = decode(2, 2, mbs)
    assert(got != null, "multi-MB CABAC slice must decode")
    // CAVLC/CABAC parity of the total energy is NOT asserted here
    // (no CAVLC encoder for arbitrary residuals); this test pins
    // context-state round-trip across MB boundaries + qp_delta
    assert(got._1.forall(v => v >= 0 && v <= 255))
  }

  test("big levels exercise the UEG0 escape (prefix 14 + bypass suffix)") {
    val coeffs = Array.fill[Array[Int]](16)(null)
    coeffs(0) = new Array[Int](16)
    coeffs(0)(0) = 900 // abs-1 = 899 >= 14 → escape path
    coeffs(0)(3) = -200
    coeffs(0)(7) = 15 // abs-1 = 14 → exactly the escape boundary
    val got = decode(1, 1, Seq(I4Mb(Array.fill(16)(2), coeffs)))
    assert(got != null, "escape-coded levels must decode (clipped pixels are fine)")
  }

  test("CABAC MP4 routing: Main-profile keyframes decode to the same pixels as their CAVLC twin") {
    def scene(x: Int, y: Int): Int =
      (127 + 90 * math.sin(x / 2.5 + y / 2.0 + 1)).toInt & 0xFF
    val cavlc = graft.ext.VideoFixtures.pcmKeyframeMp4(scene)
    val cabac = graft.ext.VideoFixtures.pcmKeyframeMp4Cabac(scene)
    val a = H264.mp4KeyframeLumaOrNull(cavlc)
    val b = H264.mp4KeyframeLumaOrNull(cabac)
    assert(a != null && b != null, "CABAC MP4 keyframe must decode, not stub")
    assert(a._1.toSeq === b._1.toSeq, "entropy layer must be invisible in pixels")
  }

  test("fuzz: corrupted CABAC MP4s never throw") {
    val video = graft.ext.VideoFixtures.pcmKeyframeMp4Cabac((x, y) => (x * 16 + y) & 0xFF)
    val rnd = new scala.util.Random(21)
    for (_ <- 0 until 300) {
      val m = video.clone()
      for (_ <- 0 to rnd.nextInt(6)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      H264.mp4KeyframeLumaOrNull(m) // any result, no throw
    }
  }

  test("randomized slices: 40 mixed PCM/I16/I4 frames round-trip, PCM pixels exact") {
    val rnd = new scala.util.Random(2024)
    for (trial <- 0 until 40) {
      val wMbs = 1 + rnd.nextInt(3)
      val hMbs = 1 + rnd.nextInt(3)
      val pcms = scala.collection.mutable.Map[Int, Array[Int]]()
      val mbs = (0 until wMbs * hMbs).map { addr =>
        rnd.nextInt(3) match {
          case 0 =>
            val p = Array.fill(256)(rnd.nextInt(256))
            pcms(addr) = p
            PcmMb(p)
          case 1 =>
            val dc = new Array[Int](16)
            for (_ <- 0 until rnd.nextInt(4))
              dc(rnd.nextInt(16)) = rnd.nextInt(21) - 10
            val ac =
              if (rnd.nextBoolean()) null
              else Array.tabulate[Array[Int]](16) { _ =>
                if (rnd.nextInt(3) == 0) {
                  val a = new Array[Int](15)
                  for (_ <- 0 until 1 + rnd.nextInt(3))
                    a(rnd.nextInt(15)) = rnd.nextInt(9) - 4
                  a
                } else null
              }
            I16Mb(rnd.nextInt(3) match {
              case 0 => 2
              case _ => 2 // DC everywhere (availability-independent)
            }, dc, ac, qpDelta = rnd.nextInt(5) - 2)
          case _ =>
            val coeffs = Array.tabulate[Array[Int]](16) { _ =>
              if (rnd.nextBoolean()) {
                val c = new Array[Int](16)
                for (_ <- 0 until 1 + rnd.nextInt(4))
                  c(rnd.nextInt(16)) = rnd.nextInt(31) - 15
                c
              } else null
            }
            I4Mb(Array.fill(16)(2), coeffs, qpDelta = rnd.nextInt(5) - 2)
        }
      }
      val got = decode(wMbs, hMbs, mbs)
      assert(got != null, s"trial $trial (${wMbs}x$hMbs) failed to decode")
      val (g, w, _) = got
      pcms.foreach { case (addr, p) =>
        val x0 = (addr % wMbs) * 16
        val y0 = (addr / wMbs) * 16
        for (y <- 0 until 16; x <- 0 until 16)
          assert(g((y0 + y) * w + x0 + x) === p(y * 16 + x).toDouble,
            s"trial $trial PCM mb $addr ($x,$y)")
      }
      assert(g.forall(v => v >= 0 && v <= 255))
    }
  }

  // ================= High profile: CABAC transform_size_8x8

  test("CABAC I_8x8 DC chain: the CAVLC-derived golden 130") {
    // the H264Spec CAVLC twin pinned this: DC +1 in block 0 at QP 26
    // dequants to 104, transforms to +2, and the 8x8 DC prediction
    // chain spreads 130 across the whole MB — the CABAC entropy
    // layer must be invisible in the reconstruction
    val dc = new Array[Int](64)
    dc(0) = 1
    val got = decode8x8(1, 1, Seq(I8Mb(Array(2, 2, 2, 2),
      Array(dc, null, null, null))))
    assert(got != null)
    assert(got._1.forall(_ === 130.0), got._1.take(8).toSeq.toString)
  }

  test("CABAC I_8x8 rich residual matches the independent transform transcription") {
    // same coefficient content as the CAVLC interleave fixture plus a
    // UEG0-escape-sized level; expected pixels via this test's own
    // dequant + e/g/h-form transform (the H264Spec discipline)
    val c64 = new Array[Int](64)
    c64(1) = 3; c64(2) = -2; c64(4) = 1; c64(10) = 17; c64(63) = -1
    val got = decode8x8(1, 1, Seq(I8Mb(Array(2, 2, 2, 2),
      Array(null, null, c64, null))))
    assert(got != null)
    val clsMatrix = Array(
      0, 3, 4, 3, 0, 3, 4, 3,
      3, 1, 5, 1, 3, 1, 5, 1,
      4, 5, 2, 5, 4, 5, 2, 5,
      3, 1, 5, 1, 3, 1, 5, 1,
      0, 3, 4, 3, 0, 3, 4, 3,
      3, 1, 5, 1, 3, 1, 5, 1,
      4, 5, 2, 5, 4, 5, 2, 5,
      3, 1, 5, 1, 3, 1, 5, 1)
    val v8 = Array(
      Array(20, 18, 32, 19, 25, 24), Array(22, 19, 35, 21, 28, 26),
      Array(26, 23, 42, 24, 33, 31), Array(28, 25, 45, 26, 35, 33),
      Array(32, 28, 51, 30, 40, 38), Array(36, 32, 58, 34, 46, 43))
    val d = new Array[Int](64)
    for (k <- 0 until 64 if c64(k) != 0) {
      val rp = H264.ZigZag8x8(k)
      val ls = 16 * v8(2)(clsMatrix(rp))
      d(rp) = (c64(k) * ls + 2) >> 2
    }
    def pass(g: Array[Int], stride: Int, base: Int, fin: Boolean): Unit = {
      val f = Array.tabulate(8)(k => g(base + k * stride))
      val e0 = f(0) + f(4)
      val e1 = -f(3) + f(5) - f(7) - (f(7) >> 1)
      val e2 = f(0) - f(4)
      val e3 = f(1) + f(7) - f(3) - (f(3) >> 1)
      val e4 = (f(2) >> 1) - f(6)
      val e5 = -f(1) + f(7) + f(5) + (f(5) >> 1)
      val e6 = f(2) + (f(6) >> 1)
      val e7 = f(3) + f(5) + f(1) + (f(1) >> 1)
      val g0 = e0 + e6; val g1 = e1 + (e7 >> 2); val g2 = e2 + e4
      val g3 = e3 + (e5 >> 2); val g4 = e2 - e4; val g5 = (e3 >> 2) - e5
      val g6 = e0 - e6; val g7 = e7 - (e1 >> 2)
      val h = Array(g0 + g7, g2 + g5, g4 + g3, g6 + g1,
        g6 - g1, g4 - g3, g2 - g5, g0 - g7)
      for (k <- 0 until 8)
        g(base + k * stride) = if (fin) (h(k) + 32) >> 6 else h(k)
    }
    for (row <- 0 until 8) pass(d, 1, row * 8, fin = false)
    for (col <- 0 until 8) pass(d, 8, col, fin = true)
    // block 2 sits at (0, 8); blocks 0/1 decode flat 128 before it,
    // so its DC prediction is 128 (left unavailable, above = 128)
    for (y <- 0 until 8; x <- 0 until 8) {
      val want = math.max(0, math.min(255, 128 + d(y * 8 + x)))
      assert(got._1((y + 8) * 16 + x) === want.toDouble, s"b2 ($x,$y)")
    }
  }

  test("CABAC I_8x8 with chroma DC residuals: the luma hand-off stays aligned") {
    // cbpChroma = 1 appends two cat-3 chroma DC blocks AFTER the
    // cat-5 luma residuals; a mis-positioned bin stream would corrupt
    // the end_of_slice decode or the luma itself — the luma must
    // still land on the chroma-0 twin's golden 130
    val dc = new Array[Int](64)
    dc(0) = 1
    val chroma = Array(Array(3, 0, -2, 0), Array(0, 1, 0, 0))
    val got = decode8x8(1, 1, Seq(I8Mb(Array(2, 2, 2, 2),
      Array(dc, null, null, null), chromaDc = chroma)))
    assert(got != null)
    assert(got._1.forall(_ === 130.0), got._1.take(8).toSeq.toString)
  }

  test("randomized mixed I4/I8/I16/PCM slices under a transform-8x8 PPS round-trip") {
    val rnd = new scala.util.Random(20260815)
    for (trial <- 0 until 25) {
      val wMbs = 1 + rnd.nextInt(3)
      val hMbs = 1 + rnd.nextInt(3)
      val mbs: Seq[Mb] = (0 until wMbs * hMbs).map { i =>
        rnd.nextInt(4) match {
          case 0 => PcmMb(Array.tabulate(256)(_ => rnd.nextInt(256)))
          case 1 =>
            val dc = Array.tabulate(16)(k => if (rnd.nextInt(3) == 0) rnd.nextInt(7) - 3 else 0)
            I16Mb(2, dc, null, qpDelta = rnd.nextInt(3) - 1)
          case 2 =>
            val coeffs = Array.tabulate[Array[Int]](16)(_ =>
              if (rnd.nextInt(2) == 0) null
              else Array.tabulate(16)(k => if (rnd.nextInt(5) == 0) rnd.nextInt(9) - 4 else 0))
            I4Mb(Array.fill(16)(2), coeffs, qpDelta = rnd.nextInt(3) - 1)
          case _ =>
            val coeffs = Array.tabulate[Array[Int]](4)(_ =>
              if (rnd.nextInt(3) == 0) null
              else Array.tabulate(64)(k => if (rnd.nextInt(9) == 0) rnd.nextInt(31) - 15 else 0))
            val chroma =
              if (rnd.nextInt(2) == 0) null
              else Array.tabulate(2)(_ => Array.tabulate(4)(_ => rnd.nextInt(5) - 2))
            I8Mb(Array.fill(4)(2), coeffs, qpDelta = rnd.nextInt(3) - 1,
              chromaDc = chroma)
        }
      }
      val got = decode8x8(wMbs, hMbs, mbs)
      assert(got != null, s"trial $trial ($wMbs x $hMbs)")
      // planted PCM pixels must come back byte-exact through the
      // surrounding 8x8 entropy state
      for ((mb, a) <- mbs.zipWithIndex) mb match {
        case PcmMb(luma) =>
          val x0 = (a % wMbs) * 16
          val y0 = (a / wMbs) * 16
          for (i <- 0 until 256)
            assert(got._1((y0 + (i >> 4)) * wMbs * 16 + x0 + (i & 15)) ===
              luma(i).toDouble, s"trial $trial PCM MB $a px $i")
        case _ => ()
      }
    }
  }

  test("fuzz: corrupted CABAC 8x8 streams never throw") {
    val c64 = new Array[Int](64)
    c64(0) = 2; c64(5) = -3
    val slice = cabacIdrSlice(1, 1,
      Seq(I8Mb(Array(2, 2, 2, 2), Array(c64, null, c64, null))),
      transform8x8 = true)
    val rnd = new scala.util.Random(53)
    for (_ <- 0 until 400) {
      val m = slice.clone()
      for (_ <- 0 to rnd.nextInt(6)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      H264.decodeIdrLumaOrNull(Seq(spsNal(1, 1), cabacPps8x8(), m)) // no throw
    }
  }

  test("fuzz: corrupted CABAC streams never throw") {
    val dc = new Array[Int](16)
    dc(0) = 6
    val sp = spsNal(2, 2)
    val pp = cabacPps()
    val slice = cabacIdrSlice(2, 2, Seq.fill(4)(I16Mb(2, dc, null)))
    assert(H264.decodeIdrLumaOrNull(Seq(sp, pp, slice)) != null)
    val rnd = new scala.util.Random(9)
    for (_ <- 0 until 400) {
      val m = slice.clone()
      for (_ <- 0 to rnd.nextInt(6)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      H264.decodeIdrLumaOrNull(Seq(sp, pp, m)) // any result, no throw
    }
    for (cut <- 1 until slice.length by 3)
      H264.decodeIdrLumaOrNull(Seq(sp, pp, slice.take(cut))) // no throw
  }
}
