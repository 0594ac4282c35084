package graft.ext

/** Minimal-but-conformant VP8 KEYFRAME encoder for gray images — the
  * independent test-side validator for [[Vp8]] (the [[WebpFixtures]] /
  * PdfFixtures convention: the engine writes the assets it decodes)
  * and the runtime fixture source for the WebM/VP8 and cross-container
  * near-duplicate corpora.
  *
  * Encoding strategy (fixed, deterministic):
  *   - every MB is B_PRED with all-DC subblock modes (contexts stay
  *     [0][0], no Y2/WHT plane, no top-right dependence)
  *   - one flat quantizer index, no segmentation, loop filter level 0
  *     (a conformant no-op), one token partition, default coefficient
  *     probabilities (1056 no-update bits)
  *   - chroma is constant 128: DC prediction reproduces it exactly,
  *     so all chroma blocks quantize to zero
  *   - luma residuals: forward DCT → round-to-nearest quantization →
  *     reconstruction through [[Vp8]]'s OWN inverse DCT, so the
  *     encoder's recon plane is bit-identical to what a conformant
  *     decoder must output ([[encodeGray]] returns it for asserting)
  *
  * The bool encoder is RFC 6386 §8.1's reference algorithm (carry-
  * propagating, 24-bit window).
  */
object Vp8Fixtures {

  /** RFC 6386 §8.1 arithmetic (bool) encoder */
  private[graft] final class Bw {
    private var out = new Array[Byte](256)
    private var n = 0
    private var range = 255
    private var bottom = 0L // low end of the coding interval (32-bit window)
    private var bitCount = 24

    private def push(b: Int): Unit = {
      if (n == out.length) out = java.util.Arrays.copyOf(out, n * 2)
      out(n) = b.toByte
      n += 1
    }

    private def carry(): Unit = {
      var q = n - 1
      while (q >= 0 && out(q) == -1) { out(q) = 0; q -= 1 }
      if (q >= 0) out(q) = (out(q) + 1).toByte
    }

    def bool(prob: Int, v: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (v != 0) { bottom += split; range -= split }
      else range = split
      while (range < 128) {
        range <<= 1
        if ((bottom & (1L << 31)) != 0) carry()
        bottom = (bottom << 1) & 0xFFFFFFFFL
        bitCount -= 1
        if (bitCount == 0) {
          push(((bottom >> 24) & 0xFF).toInt)
          bottom &= 0xFFFFFF
          bitCount = 8
        }
      }
    }

    /** n-bit literal, MSB first (prob 128) */
    def lit(nBits: Int, v: Int): Unit = {
      var i = nBits - 1
      while (i >= 0) { bool(128, (v >> i) & 1); i -= 1 }
    }

    /** flush (32 zero bits drain the window, §8.1) and return; call once */
    def bytes: Array[Byte] = {
      var i = 0
      while (i < 32) { bool(128, 0); i += 1 }
      java.util.Arrays.copyOf(out, n)
    }
  }

  // libvpx-compatible forward 4x4 DCT (the scaling [[Vp8.idctAdd]]
  // inverts); exactness is NOT required — recon goes through the true
  // inverse — but the pairing keeps quantization error ~q/2
  private def fdct4x4(block: Array[Int], out: Array[Int]): Unit = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val i0 = block(i * 4); val i1 = block(i * 4 + 1)
      val i2 = block(i * 4 + 2); val i3 = block(i * 4 + 3)
      val a1 = (i0 + i3) * 8; val b1 = (i1 + i2) * 8
      val c1 = (i1 - i2) * 8; val d1 = (i0 - i3) * 8
      t(i * 4) = a1 + b1
      t(i * 4 + 2) = a1 - b1
      t(i * 4 + 1) = (c1 * 2217 + d1 * 5352 + 14500) >> 12
      t(i * 4 + 3) = (d1 * 2217 - c1 * 5352 + 7500) >> 12
      i += 1
    }
    i = 0
    while (i < 4) {
      val a1 = t(i) + t(12 + i); val b1 = t(4 + i) + t(8 + i)
      val c1 = t(4 + i) - t(8 + i); val d1 = t(i) - t(12 + i)
      out(i) = (a1 + b1 + 7) >> 4
      out(8 + i) = (a1 - b1 + 7) >> 4
      out(4 + i) = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) +
        (if (d1 != 0) 1 else 0)
      out(12 + i) = (d1 * 2217 - c1 * 5352 + 51000) >> 16
      i += 1
    }
  }

  /** write one coefficient token (value v at position n, probs row
    * pOff) — the §13.2 grammar the decoder reads
    */
  private def writeToken(bw: Bw, probs: Array[Int], pOff: Int, v: Int): Unit = {
    val a = math.abs(v)
    if (a == 0) { bw.bool(probs(pOff + 1), 0); return }
    bw.bool(probs(pOff + 1), 1)
    if (a == 1) bw.bool(probs(pOff + 2), 0)
    else {
      bw.bool(probs(pOff + 2), 1)
      if (a <= 4) {
        bw.bool(probs(pOff + 3), 0)
        if (a == 2) bw.bool(probs(pOff + 4), 0)
        else { bw.bool(probs(pOff + 4), 1); bw.bool(probs(pOff + 5), a - 3) }
      } else {
        bw.bool(probs(pOff + 3), 1)
        if (a <= 10) { // cat1 / cat2
          bw.bool(probs(pOff + 6), 0)
          if (a <= 6) {
            bw.bool(probs(pOff + 7), 0)
            bw.bool(159, a - 5)
          } else {
            bw.bool(probs(pOff + 7), 1)
            bw.bool(165, (a - 7) >> 1)
            bw.bool(145, (a - 7) & 1)
          }
        } else {
          bw.bool(probs(pOff + 6), 1)
          val cat = if (a <= 18) 0 else if (a <= 34) 1 else if (a <= 66) 2 else 3
          bw.bool(probs(pOff + 8), cat >> 1)
          bw.bool(probs(pOff + 9 + (cat >> 1)), cat & 1)
          val tab = cat match {
            case 0 => Array(173, 148, 140)
            case 1 => Array(176, 155, 140, 135)
            case 2 => Array(180, 157, 141, 134, 130)
            case _ => Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)
          }
          val extra = a - 3 - (8 << cat)
          var k = tab.length - 1
          var i = 0
          while (i < tab.length) {
            bw.bool(tab(i), (extra >> k) & 1)
            k -= 1; i += 1
          }
        }
      }
    }
    bw.bool(128, if (v < 0) 1 else 0) // sign
  }

  /** Header-path coverage options (round 14, late): the libwebp
    * encoder never emits DELTA-mode segmentation, multiple token
    * partitions, the simple-filter type bit, or loop-filter-delta
    * records, so those decoder paths would otherwise see only fuzz.
    * All options keep the effective filter level at 0, so the
    * encoder's recon stays the exact expected output.
    */
  final case class EncOpts(
      nParts: Int = 1,               // 1/2/4/8 token partitions
      segDeltas: Array[Int] = null,  // 4 DELTA-mode per-segment q deltas
      simpleFilterFlag: Boolean = false, // filter_type=simple (level 0)
      lfDeltaFlag: Boolean = false)      // lf-delta records, all zero

  def encodeGrayFrame(gray: Array[Int], w: Int, h: Int,
                      qi: Int): (Array[Byte], Array[Int]) =
    encodeGrayFrame(gray, w, h, qi, EncOpts())

  /** Encode a gray image (values [0,255], row-major) as a raw VP8
    * keyframe at quantizer index `qi`; returns (frame bytes, the
    * decoder-exact luma recon plane).
    */
  def encodeGrayFrame(gray: Array[Int], w: Int, h: Int, qi: Int,
                      opts: EncOpts): (Array[Byte], Array[Int]) = {
    require(w > 0 && h > 0 && gray.length == w * h && qi >= 0 && qi <= 127)
    require(Set(1, 2, 4, 8)(opts.nParts), "nParts must be 1/2/4/8")
    require(opts.segDeltas == null || opts.segDeltas.length == 4)
    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16
    // per-segment dequant (DELTA mode: clamp(qi + delta)); segment of
    // MB (x, y) is (x + y) % 4 when segmentation is on, else 0
    def clampQ(v: Int) = math.max(0, math.min(127, v))
    val segQi = Array.tabulate(4)(s =>
      if (opts.segDeltas == null) qi else clampQ(qi + opts.segDeltas(s)))
    val segDqDc = segQi.map(Vp8Tables.DcQ)
    val segDqAc = segQi.map(Vp8Tables.AcQ)

    // padded source plane (edge-replicated into MB padding, the
    // standard encoder convention)
    val pw = mbW * 16; val ph = mbH * 16
    val src = new Array[Int](pw * ph)
    var y = 0
    while (y < ph) {
      var x = 0
      while (x < pw) {
        src(y * pw + x) = gray(math.min(h - 1, y) * w + math.min(w - 1, x))
        x += 1
      }
      y += 1
    }

    // recon plane with the decoder's exact border conventions
    val stride = pw + 8
    val base = stride + 1
    val recon = new Array[Byte]((ph + 1) * stride)
    java.util.Arrays.fill(recon, 0, stride, 127.toByte)

    // ---- header (part 0)
    val bw = new Bw
    bw.bool(128, 0); bw.bool(128, 0) // color_space, clamping
    if (opts.segDeltas == null) bw.bool(128, 0) // segmentation off
    else {
      bw.bool(128, 1) // segmentation_enabled
      bw.bool(128, 1) // update_mb_segmentation_map
      bw.bool(128, 1) // update_segment_feature_data
      bw.bool(128, 0) // segment_feature_mode = DELTA
      var s = 0
      while (s < 4) { // quantizer deltas (magnitude + sign)
        bw.bool(128, 1)
        bw.lit(7, math.abs(opts.segDeltas(s)))
        bw.bool(128, if (opts.segDeltas(s) < 0) 1 else 0)
        s += 1
      }
      s = 0
      while (s < 4) { bw.bool(128, 0); s += 1 } // no lf-strength updates
      s = 0
      while (s < 3) { bw.bool(128, 1); bw.lit(8, 128); s += 1 } // tree probs
    }
    bw.bool(128, if (opts.simpleFilterFlag) 1 else 0) // filter_type
    bw.lit(6, 0) // loop_filter_level 0 → no-op either way
    bw.lit(3, 0) // sharpness
    if (!opts.lfDeltaFlag) bw.bool(128, 0) // lf_delta_enable = 0
    else {
      bw.bool(128, 1) // enabled
      bw.bool(128, 1) // update
      var s = 0
      while (s < 8) { // 4 ref + 4 mode records, all zero magnitude
        bw.bool(128, 1); bw.lit(6, 0); bw.bool(128, 0)
        s += 1
      }
    }
    bw.lit(2, Integer.numberOfTrailingZeros(opts.nParts)) // log2 partitions
    bw.lit(7, qi) // y_ac_qi
    var i = 0
    while (i < 5) { bw.bool(128, 0); i += 1 } // five quant deltas absent
    bw.bool(128, 0) // refresh_entropy_probs
    i = 0
    while (i < 1056) { // no coefficient probability updates
      bw.bool(Vp8Tables.CoeffUpdateProbs(i), 0)
      i += 1
    }
    bw.bool(128, 1) // mb_no_coeff_skip enabled
    bw.lit(8, 128) // prob_skip_false

    // ---- per-MB: modes into part 0, tokens into partition
    // (mbY % nParts) — contexts stay GLOBAL across partitions
    val parts = Array.fill(opts.nParts)(new Bw)
    val probs = Vp8Tables.CoeffProbs
    val aboveNz = new Array[Int](mbW * 4)
    val leftNz = new Array[Int](4)
    val block = new Array[Int](16)
    val dct = new Array[Int](16)
    val qcoef = new Array[Int](16)
    val deq = new Array[Short](16)
    // per-MB records first pass cannot be split: VP8 interleaves all
    // MB headers in part0 and all tokens in partition 1, both in MB
    // raster order — two writers, one pass
    var mbY = 0
    while (mbY < mbH) {
      java.util.Arrays.fill(leftNz, 0)
      val tw = parts(mbY % opts.nParts)
      var mbX = 0
      while (mbX < mbW) {
        val seg = if (opts.segDeltas == null) 0 else (mbX + mbY) % 4
        val dqDc = segDqDc(seg)
        val dqAc = segDqAc(seg)
        // the skip flag precedes the modes in part0, so quantize the
        // whole MB first into a staging list
        val staged = new Array[Array[Int]](16)
        val yOff = base + mbY * 16 * stride + mbX * 16
        if (mbX == 0) {
          var k = 0
          while (k < 16) { recon(yOff + k * stride - 1) = 129.toByte; k += 1 }
          if (mbY > 0) recon(yOff - stride - 1) = 129.toByte
        }
        var anyNz = false
        var sb = 0
        while (sb < 16) {
          val o = yOff + (sb >> 2) * 4 * stride + (sb & 3) * 4
          Vp8.predict4(recon, o, stride, 0) // B_DC
          // residual → fdct → quantize
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              val sy = mbY * 16 + (sb >> 2) * 4 + r
              val sx = mbX * 16 + (sb & 3) * 4 + c
              block(r * 4 + c) = src(sy * pw + sx) -
                (recon(o + r * stride + c) & 0xFF)
              c += 1
            }
            r += 1
          }
          fdct4x4(block, dct)
          var nz = false
          var k = 0
          while (k < 16) {
            val q = if (k == 0) dqDc else dqAc
            var v = (math.abs(dct(k)) + q / 2) / q
            if (v > 2047) v = 2047
            if (dct(k) < 0) v = -v
            qcoef(k) = v
            if (v != 0) nz = true
            k += 1
          }
          if (nz) anyNz = true
          staged(sb) = qcoef.clone()
          // reconstruct through the decoder's own inverse
          java.util.Arrays.fill(deq, 0.toShort)
          k = 0
          while (k < 16) {
            deq(k) = (qcoef(k) * (if (k == 0) dqDc else dqAc)).toShort
            k += 1
          }
          if (nz) Vp8.idctAdd(deq, 0, recon, o, stride)
          sb += 1
        }
        val mbSkip = !anyNz
        // part0 record: [segment id,] skip, ymode=B_PRED, 16×B_DC, uv=DC
        if (opts.segDeltas != null) {
          // segment tree {2,4,-0,-1,-2,-3} with all-128 probs: two bits
          bw.bool(128, seg >> 1)
          bw.bool(128, seg & 1)
        }
        bw.bool(128, if (mbSkip) 1 else 0)
        bw.bool(145, 0) // kf ymode tree: B_PRED leaf
        var k = 0
        while (k < 16) {
          bw.bool(Vp8Tables.KfBModeProbs(0), 0) // [0][0] row, B_DC leaf
          k += 1
        }
        bw.bool(142, 0) // uv DC
        // tokens (luma type 3, chroma skipped entirely when MB skips;
        // chroma is always zero here, so its tokens only exist when
        // the MB is not skipped: 8 immediate-EOB blocks)
        if (!mbSkip) {
          sb = 0
          while (sb < 16) {
            val ctx = aboveNz(mbX * 4 + (sb & 3)) + leftNz(sb >> 2)
            val q = staged(sb)
            // zigzag order with trailing-zero trim
            var last = -1
            var n = 0
            while (n < 16) {
              if (q(Vp8.Zigzag(n)) != 0) last = n
              n += 1
            }
            var pOff = ((3 * 8 + Vp8Tables.Bands(0)) * 3 + ctx) * 11
            if (last < 0) tw.bool(probs(pOff), 0) // immediate EOB
            else {
              var canEob = true
              n = 0
              while (n <= last) {
                if (canEob) tw.bool(probs(pOff), 1)
                val v = q(Vp8.Zigzag(n))
                writeToken(tw, probs, pOff, v)
                canEob = v != 0
                val nextCtx = if (v == 0) 0 else if (math.abs(v) == 1) 1 else 2
                n += 1
                if (n < 16)
                  pOff = ((3 * 8 + Vp8Tables.Bands(n)) * 3 + nextCtx) * 11
              }
              if (last < 15) tw.bool(probs(pOff), 0) // closing EOB
            }
            val nzFlag = if (last >= 0) 1 else 0
            aboveNz(mbX * 4 + (sb & 3)) = nzFlag
            leftNz(sb >> 2) = nzFlag
            sb += 1
          }
          // chroma: 8 empty type-2 blocks (context stays 0 everywhere:
          // all-zero blocks write nz=0)
          var c = 0
          while (c < 8) {
            val pOff = ((2 * 8 + Vp8Tables.Bands(0)) * 3 + 0) * 11
            tw.bool(probs(pOff), 0)
            c += 1
          }
        } else {
          k = 0
          while (k < 4) { aboveNz(mbX * 4 + k) = 0; leftNz(k) = 0; k += 1 }
        }
        mbX += 1
      }
      mbY += 1
    }

    val part0 = bw.bytes
    val partBytes = parts.map(_.bytes)
    val tag = (part0.length << 5) | (1 << 4) // keyframe, version 0, shown
    val head = Array[Byte](
      (tag & 0xFF).toByte, ((tag >> 8) & 0xFF).toByte, ((tag >> 16) & 0xFF).toByte,
      0x9D.toByte, 0x01, 0x2A,
      (w & 0xFF).toByte, ((w >> 8) & 0x3F).toByte,
      (h & 0xFF).toByte, ((h >> 8) & 0x3F).toByte)
    // partition sizes: 3-byte LE for all but the last
    val sizes = partBytes.dropRight(1).flatMap { p =>
      Array((p.length & 0xFF).toByte, ((p.length >> 8) & 0xFF).toByte,
        ((p.length >> 16) & 0xFF).toByte)
    }
    val frame = head ++ part0 ++ sizes ++ partBytes.flatten

    // crop the recon plane for the caller's assertions
    val out = new Array[Int](w * h)
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = recon(base + y * stride + x) & 0xFF; x += 1 }
      y += 1
    }
    (frame, out)
  }

  /** gray image → lossy WebP (RIFF-wrapped keyframe) */
  def webpGray(gray: Array[Int], w: Int, h: Int, qi: Int): Array[Byte] = {
    val (frame, _) = encodeGrayFrame(gray, w, h, qi)
    val sz = frame.length
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val chunk = "VP8 ".getBytes("US-ASCII") ++ le32(sz) ++ frame ++
      (if ((sz & 1) == 1) Array[Byte](0) else Array.emptyByteArray)
    "RIFF".getBytes("US-ASCII") ++ le32(4 + chunk.length) ++
      "WEBP".getBytes("US-ASCII") ++ chunk
  }
}
