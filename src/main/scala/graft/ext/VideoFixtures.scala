package graft.ext

/** Deterministic H.264-in-MP4 fixture builder for the graded video
  * near-dup corpus (q125) — the video twin of q84's ImageIO-rendered
  * PNGs: the oracle engine cannot decode either modality, so the
  * corpus is synthesized and the planted-pair recovery is the check.
  * One 16×16 I_PCM IDR keyframe per file inside a minimal but REAL
  * BMFF container (ftyp, mdat, moov with avcC carrying SPS+PPS, the
  * full stsz/stsc/stco/stss sample tables), so the decoder exercises
  * the same container walk, NAL split, and slice decode as any
  * external baseline stream. Bit syntax mirrors H264Spec's writer;
  * pixel fidelity of the non-PCM decode paths is H264Spec's per-pixel
  * golden suite, not this corpus.
  */
object VideoFixtures {

  private final class Bw {
    val bits = scala.collection.mutable.ArrayBuffer[Int]()
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
    def raw(b: Int): this.type = u(b & 0xFF, 8)
    def stop(): this.type = { bits += 1; align() }
    def bytes(): Array[Byte] = {
      val out = new Array[Byte](bits.size / 8)
      var i = 0
      while (i < bits.size) {
        if (bits(i) == 1) out(i / 8) = (out(i / 8) | (1 << (7 - (i % 8)))).toByte
        i += 1
      }
      out
    }
  }


  /** Insert H.264 emulation-prevention bytes (00 00 0x with x ≤ 3 →
    * 00 00 03 0x) into a raw RBSP, leaving the NAL header byte
    * untouched — raw PCM pixel bytes can legally contain the start-
    * code patterns the transport layer must escape, and the decoder's
    * rbsp() strips exactly this escaping back out.
    */
  private[graft] def escapeRbsp(nal: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(nal.length + 8)
    out.write(nal(0))
    var zeros = 0
    var i = 1
    while (i < nal.length) {
      val v = nal(i) & 0xFF
      if (zeros >= 2 && v <= 3) { out.write(3); zeros = 0 }
      out.write(v)
      zeros = if (v == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }

  private def sps1x1(): Array[Byte] = {
    val w = new Bw
    w.u(0x67, 8).u(66, 8).u(0, 8).u(10, 8)
    w.ue(0).ue(0).ue(2).ue(1).u(0, 1)
    w.ue(0).ue(0) // 1x1 MBs
    w.u(1, 1).u(1, 1).u(0, 1).u(0, 1)
    w.stop(); w.bytes()
  }

  private def ppsNal(): Array[Byte] = {
    val w = new Bw
    w.u(0x68, 8)
    w.ue(0).ue(0).u(0, 1).u(0, 1).ue(0).ue(0).ue(0)
    w.u(0, 1).u(0, 2).se(0).se(0).se(0)
    w.u(1, 1).u(0, 1).u(0, 1)
    w.stop(); w.bytes()
  }

  private def ppsCabacNal(): Array[Byte] = {
    val w = new Bw
    w.u(0x68, 8)
    w.ue(0).ue(0).u(1, 1).u(0, 1).ue(0).ue(0).ue(0) // entropy = CABAC
    w.u(0, 1).u(0, 2).se(0).se(0).se(0)
    w.u(1, 1).u(0, 1).u(0, 1)
    w.stop(); w.bytes()
  }

  /** Minimal CABAC bin encoder (spec 9.3.4.x) — just enough for
    * I_PCM-only slices: the mb_type prefix decision, the terminate
    * bin + flush, aligned raw samples, engine reinit. The full
    * encoder (residuals, every context family) lives test-side in
    * H264CabacSpec; this one exists so the oracle corpus can carry
    * Main-profile (CABAC) MP4 variants.
    */
  private final class CabacEnc(qp: Int) {
    private val bits = scala.collection.mutable.ArrayBuffer[Int]()
    private var low = 0
    private var range = 510
    private var outstanding = 0
    private var first = true
    private val pState = new Array[Int](graft.ext.H264Cabac.NumCtx)
    private val valMps = new Array[Int](graft.ext.H264Cabac.NumCtx)
    locally {
      val q = math.max(0, math.min(51, qp))
      var c = 0
      while (c < pState.length) {
        val m = graft.ext.H264Cabac.InitI(c * 2)
        val n = graft.ext.H264Cabac.InitI(c * 2 + 1)
        val pre = math.max(1, math.min(126, ((m * q) >> 4) + n))
        if (pre <= 63) { pState(c) = 63 - pre; valMps(c) = 0 }
        else { pState(c) = pre - 64; valMps(c) = 1 }
        c += 1
      }
      pState(276) = 63; valMps(276) = 0
    }
    private def putBit(b: Int): Unit = {
      if (first) first = false else bits += b
      while (outstanding > 0) { bits += 1 - b; outstanding -= 1 }
    }
    private def renorm(): Unit =
      while (range < 256) {
        if (low < 256) putBit(0)
        else if (low >= 512) { low -= 512; putBit(1) }
        else { low -= 256; outstanding += 1 }
        range <<= 1; low <<= 1
      }
    def decision(ctx: Int, bin: Int): Unit = {
      val lps = graft.ext.H264Cabac.RangeTabLps(pState(ctx) * 4 + ((range >> 6) & 3))
      range -= lps
      if (bin != valMps(ctx)) {
        low += range; range = lps
        if (pState(ctx) == 0) valMps(ctx) = 1 - valMps(ctx)
        pState(ctx) = graft.ext.H264Cabac.TransIdxLps(pState(ctx))
      } else if (pState(ctx) < 62) pState(ctx) += 1
      renorm()
    }
    def terminate(bin: Int): Unit = {
      range -= 2
      if (bin == 1) {
        low += range
        range = 2
        renorm()
        putBit((low >> 9) & 1)
        val v = ((low >> 7) & 3) | 1
        bits += (v >> 1) & 1; bits += v & 1
      } else renorm()
    }
    def alignAndRaw(raw: Seq[Int]): Unit = {
      while (bits.size % 8 != 0) bits += 0
      raw.foreach(b => (7 to 0 by -1).foreach(k => bits += (b >> k) & 1))
    }
    def bypass(bin: Int): Unit = {
      low <<= 1
      if (bin == 1) low += range
      if (low >= 1024) { putBit(1); low -= 1024 }
      else if (low < 512) putBit(0)
      else { low -= 512; outstanding += 1 }
    }
    def reinit(): Unit = { low = 0; range = 510; outstanding = 0; first = true }
    def appendTo(w: Bw): Unit = {
      while (w.bits.size % 8 != 0) w.u(1, 1) // cabac_alignment_one_bit
      bits.foreach(b => w.u(b, 1))
      w.align()
    }
  }

  // ---------------- High-profile (transform_8x8) keyframe fixtures

  private def spsHigh1x1(): Array[Byte] = {
    val w = new Bw
    w.u(0x67, 8).u(100, 8).u(0, 8).u(10, 8) // High profile
    w.ue(0) // sps_id
    w.ue(1).ue(0).ue(0).u(0, 1).u(0, 1) // 4:2:0 8-bit, no scaling matrix
    w.ue(0).ue(2).ue(1).u(0, 1)
    w.ue(0).ue(0) // 1x1 MBs
    w.u(1, 1).u(1, 1).u(0, 1).u(0, 1)
    w.stop(); w.bytes()
  }

  private def pps8x8Nal(cabac: Boolean): Array[Byte] = {
    val w = new Bw
    w.u(0x68, 8)
    w.ue(0).ue(0).u(if (cabac) 1 else 0, 1).u(0, 1).ue(0).ue(0).ue(0)
    w.u(0, 1).u(0, 2).se(0).se(0).se(0)
    w.u(1, 1).u(0, 1).u(0, 1)
    w.u(1, 1) // transform_8x8_mode_flag
    w.u(0, 1) // pic_scaling_matrix_present = 0
    w.se(0)   // second_chroma_qp_index_offset
    w.stop(); w.bytes()
  }

  /** Deterministic sparse 8x8-scan coefficient scene: |levels| ≤ 6,
    * ~1/5 density, every block nonempty (cbp 15). The texture IS the
    * content — near-dup twins share the seed.
    */
  private def i8Coeffs(seed: Long, dcBump: Int): Array[Array[Int]] =
    Array.tabulate(4) { b8 =>
      val c = Array.tabulate(64) { k =>
        val h = (seed * 1000003L + b8 * 8191L + k) * 2654435761L
        if (((h >>> 16) % 5) == 0)
          (1 + ((h >>> 24) % 6)).toInt * (if (((h >>> 33) & 1) == 0) 1 else -1)
        else 0
      }
      if (b8 == 0) c(0) += dcBump
      // non-empty AFTER the bump too — a bump that cancels the only
      // level would otherwise leave cbp-15 promising a block the
      // CABAC encoder cannot emit
      if (!c.exists(_ != 0)) c(0) = 1
      c
    }

  /** CAVLC residual block (9.2) over the decoder's own VLC tables —
    * fixture synthesis; correctness is gated by the independent
    * test-side encoders in CavlcRoundTripSpec/H264Spec.
    */
  private def cavlcRes(w: Bw, nC: Int, coeffs: Array[Int]): Unit = {
    def codeOf(v: H264.Vlc, sym: Int): Unit = {
      val i = v.syms.indexOf(sym)
      require(i >= 0, s"symbol $sym not in VLC")
      w.u(v.codes(i), v.lens(i))
    }
    val idxs = (0 until 16).filter(coeffs(_) != 0)
    val totalCoeff = idxs.length
    var t1 = 0
    var i = idxs.length - 1
    while (i >= 0 && t1 < 3 && math.abs(coeffs(idxs(i))) == 1) { t1 += 1; i -= 1 }
    val tokSym = totalCoeff * 4 + t1
    if (nC < 2) codeOf(H264.CoeffToken0, tokSym)
    else if (nC < 4) codeOf(H264.CoeffToken1, tokSym)
    else if (nC < 8) codeOf(H264.CoeffToken2, tokSym)
    else w.u(if (totalCoeff == 0) 3 else ((totalCoeff - 1) << 2) | t1, 6)
    if (totalCoeff == 0) return
    for (k <- 0 until t1)
      w.u(if (coeffs(idxs(idxs.length - 1 - k)) < 0) 1 else 0, 1)
    var suffixLength = if (totalCoeff > 10 && t1 < 3) 1 else 0
    for (k <- t1 until totalCoeff) {
      val level = coeffs(idxs(idxs.length - 1 - k))
      var lc = if (level > 0) 2 * level - 2 else -2 * level - 1
      if (k == t1 && t1 < 3) lc -= 2
      require(lc >= 0)
      if (suffixLength == 0) {
        if (lc < 14) w.u(1, lc + 1)
        else if (lc < 30) { w.u(1, 15); w.u(lc - 14, 4) }
        else { w.u(1, 16); w.u(lc - 30, 12) }
      } else {
        val cap = 15 << suffixLength
        if (lc < cap) { w.u(1, (lc >> suffixLength) + 1); w.u(lc & ((1 << suffixLength) - 1), suffixLength) }
        else { w.u(1, 16); w.u(lc - cap, 12) }
      }
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
    }
    val totalZeros = idxs.last + 1 - totalCoeff
    if (totalCoeff < 16) codeOf(H264.TotalZeros4x4(totalCoeff), totalZeros)
    var zerosLeft = totalZeros
    for (k <- 0 until totalCoeff - 1) {
      val run = idxs(idxs.length - 1 - k) - idxs(idxs.length - 2 - k) - 1
      if (zerosLeft > 0) {
        if (zerosLeft <= 6) codeOf(H264.RunBefore(zerosLeft), run)
        else if (run < 7) w.u(7 - run, 3)
        else { w.u(0, 3); w.u(1, run - 7 + 1) }
        zerosLeft -= run
      } else require(run == 0)
    }
  }

  /** One I_NxN-8x8 IDR slice (CAVLC): DC modes, cbp 15, the four
    * 64-coefficient blocks as interleaved 4x4 CAVLC residuals with
    * the in-MB nC chain.
    */
  private def idrI8Cavlc(coeffs: Array[Array[Int]]): Array[Byte] = {
    val w = new Bw
    w.u(0x65, 8)
    w.ue(0).ue(7).ue(0).u(0, 4).ue(0).u(0, 1).u(0, 1).se(0)
    w.ue(1) // deblocking off
    w.ue(0) // mb_type I_NxN
    w.u(1, 1) // transform_size_8x8_flag
    (0 until 4).foreach(_ => w.u(1, 1)) // prev modes → DC
    w.ue(0) // intra_chroma_pred_mode
    w.ue(H264.CbpIntra.indexOf(15)) // cbp luma 15, chroma 0
    w.se(0) // mb_qp_delta
    val nz = Array.fill(4, 4)(0)
    for (b8 <- 0 until 4; i4 <- 0 until 4) {
      val bx = (b8 & 1) * 2 + (i4 & 1)
      val by = (b8 >> 1) * 2 + (i4 >> 1)
      val nA = if (bx == 0) -1 else nz(by)(bx - 1)
      val nB = if (by == 0) -1 else nz(by - 1)(bx)
      val nC =
        if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
        else if (nA >= 0) nA else if (nB >= 0) nB else 0
      val sub = Array.tabulate(16)(k => coeffs(b8)(4 * k + i4))
      cavlcRes(w, nC, sub)
      nz(by)(bx) = sub.count(_ != 0)
    }
    w.stop(); w.bytes()
  }

  /** The same slice content CABAC-coded (ctx 399 flag, cat-5
    * residuals over the Table 9-43 maps; levels capped below the
    * UEG0 escape).
    */
  private def idrI8Cabac(coeffs: Array[Array[Int]]): Array[Byte] = {
    val w = new Bw
    w.u(0x65, 8)
    w.ue(0).ue(7).ue(0).u(0, 4).ue(0).u(0, 1).u(0, 1).se(0)
    w.ue(1)
    val e = new CabacEnc(26)
    e.decision(3, 0)   // mb_type I_NxN (no neighbors)
    e.decision(399, 1) // transform_size_8x8_flag
    (0 until 4).foreach(_ => e.decision(68, 1)) // DC modes
    e.decision(64, 0)  // chroma pred 0
    (0 until 4).foreach(_ => e.decision(73, 1)) // cbp luma 15 (all conds 0)
    e.decision(77, 0)  // cbp chroma 0
    e.decision(60, 0)  // mb_qp_delta 0
    for (b8 <- 0 until 4) {
      val lv = coeffs(b8)
      val lastIdx = (0 until 64).filter(lv(_) != 0).max
      var i = 0
      var done = false
      while (!done && i < 63) {
        val sig = lv(i) != 0
        e.decision(402 + H264Cabac.Sig8x8Ctx(i), if (sig) 1 else 0)
        if (sig) {
          val last = i == lastIdx
          e.decision(417 + H264Cabac.Last8x8Ctx(i), if (last) 1 else 0)
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
          require(a <= 14, "fixture levels stay below the UEG0 escape")
          val ctx0 = 426 + (if (numGt1 != 0) 0 else math.min(4, 1 + numEq1))
          if (a == 1) e.decision(ctx0, 0)
          else {
            e.decision(ctx0, 1)
            val ctxN = 426 + 5 + math.min(4, numGt1)
            for (_ <- 1 until a - 1) e.decision(ctxN, 1)
            e.decision(ctxN, 0)
          }
          e.bypass(if (lv(j) < 0) 1 else 0)
          if (a == 1) numEq1 += 1 else numGt1 += 1
        }
        j -= 1
      }
    }
    e.terminate(1) // end_of_slice_flag
    e.appendTo(w)
    w.bytes()
  }

  /** One-keyframe MP4 whose IDR is a High-profile (transform_8x8)
    * I_8x8 slice built from a seed-derived coefficient scene —
    * CAVLC entropy. `dcBump` perturbs block 0's DC for near-dup
    * twins (+1 ≈ +2 gray on one quadrant).
    */
  def i8KeyframeMp4Cavlc(seed: Long, dcBump: Int = 0): Array[Byte] =
    mp4From(escapeRbsp(spsHigh1x1()), escapeRbsp(pps8x8Nal(cabac = false)),
      escapeRbsp(idrI8Cavlc(i8Coeffs(seed, dcBump))))

  /** The CABAC twin: the same coefficient scene through the other
    * entropy layer decodes to the same pixels.
    */
  def i8KeyframeMp4Cabac(seed: Long, dcBump: Int = 0): Array[Byte] =
    mp4From(escapeRbsp(spsHigh1x1()), escapeRbsp(pps8x8Nal(cabac = true)),
      escapeRbsp(idrI8Cabac(i8Coeffs(seed, dcBump))))

  /** CABAC IDR slice carrying one I_PCM macroblock per frame entry. */
  private def idrPcmCabac(px: (Int, Int) => Int): Array[Byte] = {
    val w = new Bw
    w.u(0x65, 8)
    w.ue(0).ue(7).ue(0).u(0, 4).ue(0).u(0, 1).u(0, 1).se(0)
    w.ue(1) // deblocking off
    val e = new CabacEnc(26)
    e.decision(3, 1) // mb_type prefix: not I_NxN (no neighbors: inc 0)
    e.terminate(1)   // I_PCM escape bin + flush
    val raw = (0 until 256).map(i => px(i & 15, i >> 4) & 0xFF) ++
      Seq.fill(128)(0x80)
    e.alignAndRaw(raw)
    e.reinit()
    e.terminate(1)   // end_of_slice_flag
    e.appendTo(w)
    w.bytes()
  }

  /** One-keyframe MP4 whose slice is CABAC-coded (Main-profile
    * entropy mode) — the q125 corpus's CABAC variant: same pixels,
    * different entropy layer, must land on the same dHash.
    */
  def pcmKeyframeMp4Cabac(px: (Int, Int) => Int): Array[Byte] = {
    val sps = escapeRbsp(sps1x1())
    val pps = escapeRbsp(ppsCabacNal())
    val slice = escapeRbsp(idrPcmCabac(px))
    mp4From(sps, pps, slice)
  }

  private def idrPcm(px: (Int, Int) => Int): Array[Byte] = {
    val w = new Bw
    w.u(0x65, 8)
    w.ue(0).ue(7).ue(0).u(0, 4).ue(0).u(0, 1).u(0, 1).se(0)
    w.ue(1) // deblocking off
    w.ue(25).align()
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) { w.raw(px(x, y) & 0xFF); x += 1 }
      y += 1
    }
    var i = 0
    while (i < 128) { w.raw(0x80); i += 1 }
    w.stop(); w.bytes()
  }

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(tag: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(body.length + 8L) ++ tag.getBytes("US-ASCII") ++ body
  }

  /** Multi-keyframe MP4: one 16×16 I_PCM IDR sample per entry of
    * `frames`, every sample marked sync in `stss` — the re-cut /
    * prepended-intro shape the any-keyframe near-dup path (q125p)
    * must match on. Same boxes as [[pcmKeyframeMp4]] plus `stts`
    * (timescale 1000, 500 per frame) and per-sample `stsz` entries.
    */
  def multiKeyframeMp4(frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    require(frames.nonEmpty)
    val sps = escapeRbsp(sps1x1())
    val pps = escapeRbsp(ppsNal())
    val avcc = box("avcC", Array[Byte](1), sps.slice(1, 2), Array[Byte](0),
      sps.slice(3, 4), Array(0xFF.toByte), Array(0xE1.toByte),
      be16(sps.length), sps, Array[Byte](1), be16(pps.length), pps)
    val samples = frames.map { px =>
      val slice = escapeRbsp(idrPcm(px))
      be32(slice.length.toLong) ++ slice
    }
    val ftyp = box("ftyp", "isom".getBytes, be32(0x200), "isomiso2".getBytes)
    val mdatOff = ftyp.length + 8L
    val stsd = box("stsd", be32(0), be32(1),
      box("avc1", new Array[Byte](78), avcc))
    val stsz = box("stsz", be32(0), be32(0), be32(samples.length.toLong),
      samples.flatMap(sm => be32(sm.length.toLong)).toArray)
    val stsc = box("stsc", be32(0), be32(1), be32(1),
      be32(samples.length.toLong), be32(1))
    val stco = box("stco", be32(0), be32(1), be32(mdatOff))
    val stss = box("stss", be32(0), be32(samples.length.toLong),
      samples.indices.flatMap(i => be32(i + 1L)).toArray)
    val stts = box("stts", be32(0), be32(1),
      be32(samples.length.toLong), be32(500))
    val stbl = box("stbl", stsd, stsz, stsc, stco, stss, stts)
    val mdia = box("mdia", box("mdhd", be32(0), be32(0), be32(0), be32(1000),
      be32(0), be32(0x55c40000L)), box("minf", stbl))
    val moov = box("moov", box("mvhd", new Array[Byte](100)), box("trak", mdia))
    ftyp ++ box("mdat", samples.flatten.toArray) ++ moov
  }

  /** One-keyframe MP4 whose 16×16 luma is `px`. */
  def pcmKeyframeMp4(px: (Int, Int) => Int): Array[Byte] =
    mp4From(escapeRbsp(sps1x1()), escapeRbsp(ppsNal()), escapeRbsp(idrPcm(px)))

  /** 1×1-MB SPS with `maxRef` reference frames (the multi-ref GOP
    * fixtures' DPB bound); otherwise identical to [[sps1x1]].
    */
  private def sps1x1Refs(maxRef: Int): Array[Byte] = {
    val w = new Bw
    w.u(0x67, 8).u(66, 8).u(0, 8).u(10, 8)
    w.ue(0).ue(0).ue(2).ue(maxRef).u(0, 1)
    w.ue(0).ue(0) // 1x1 MBs
    w.u(1, 1).u(1, 1).u(0, 1).u(0, 1)
    w.stop(); w.bytes()
  }

  /** Non-IDR CAVLC P slice against [[ppsNal]]'s geometry (deblocking
    * control present → idc written, QP 26, sliding-window marking,
    * nal_ref_idc 2 so the frame ENTERS the reference buffer).
    * `numRefsOverride` > 0 codes num_ref_idx_active_override.
    */
  private def pSliceNal(frameNum: Int, numRefsOverride: Int)
                       (body: Bw => Unit): Array[Byte] = {
    val w = new Bw
    w.u(0x41, 8) // nal_ref_idc 2, nal_unit_type 1
    w.ue(0) // first_mb_in_slice
    w.ue(5) // slice_type P (all-slices form)
    w.ue(0) // pps_id
    w.u(frameNum & 15, 4) // frame_num (log2 = 4); poc_type 2: no poc
    if (numRefsOverride > 0) { w.u(1, 1); w.ue(numRefsOverride - 1) }
    else w.u(0, 1)
    w.u(0, 1) // ref_pic_list_modification_flag_l0
    w.u(0, 1) // adaptive_ref_pic_marking_mode_flag → sliding window
    w.se(0) // slice_qp_delta
    w.ue(1) // disable_deblocking_filter_idc
    body(w)
    w.stop(); w.bytes()
  }

  /** ref_idx_l0 in te(v): one inverted bit when two refs are active,
    * ue(v) beyond, absent with one (9.1.1).
    */
  private def wRefIdx(w: Bw, ri: Int, numRefs: Int): Unit =
    if (numRefs == 2) w.u(1 - ri, 1)
    else if (numRefs > 2) w.ue(ri)

  /** Four-frame 16×16 GOP exercising MULTI-REFERENCE P decode — the
    * q153 corpus. Luma rows are constant (`v(y) = base + 13y`) so a
    * SQL oracle predicts every decoded frame from (base, shifts):
    *
    *   frame 0  IDR I_PCM                     v(y)
    *   frame 1  P_16x16, 1 active ref, mv (0,d1)      → v(min(15, y+d1))
    *   frame 2  P_16x16, 2 active refs, ref_idx 1 (te
    *            inverted-bit branch) = frame 0        → v(min(15, y+d2))
    *   frame 3  P_16x8, 3 active refs (te ue branch):
    *            top from ref_idx 2 = frame 0          → v(min(15, y+d3t))
    *            bottom from ref_idx 1 = frame 1       → v(min(15, min(15, y+d3b)+d1))
    *
    * A decoder that ignores ref_idx (always nearest frame), mis-orders
    * the initial L0 list, or breaks the sliding window decodes
    * DIFFERENT pixels — the features hash catches it. Only sample 1
    * is an stss sync.
    */
  def multiRefGopMp4(base: Int, d1: Int, d2: Int, d3t: Int, d3b: Int): Array[Byte] = {
    val (sps, pps, slices) = multiRefSlices(base, d1, d2, d3t, d3b)
    mp4Gop(sps, pps, slices, syncs = Seq(1))
  }

  /** [[multiRefGopMp4]]'s frames in a FRAGMENTED container (the q156
    * corpus): same decode, moof/traf/trun layout cycling by `layout`
    * (0: 2-sample fragments + default-base-is-moof + per-sample
    * fields; 1: explicit base_data_offset; 2: tfhd default
    * size/duration + first_sample_flags).
    */
  def multiRefGopFmp4(base: Int, d1: Int, d2: Int, d3t: Int, d3b: Int,
                      layout: Int): Array[Byte] = {
    val (sps, pps, slices) = multiRefSlices(base, d1, d2, d3t, d3b)
    layout % 3 match {
      case 0 => mp4FragmentedGop(sps, pps, slices, Seq(1), 2, false, true)
      case 1 => mp4FragmentedGop(sps, pps, slices, Seq(1), 1, true, true)
      case _ => mp4FragmentedGop(sps, pps, slices, Seq(1), 1, false, false)
    }
  }

  /** Id-addressed [[multiRefGopFmp4]]: same id arithmetic as
    * [[multiRefGop]] (so q156's oracle IS q153's formulas) with the
    * container layout cycling by id.
    */
  def multiRefGopFragmented(id: Long): Array[Byte] =
    multiRefGopFmp4(
      base = (10 + id % 40).toInt,
      d1 = (1 + id % 5).toInt,
      d2 = (2 + id % 7).toInt,
      d3t = (id % 4).toInt,
      d3b = (1 + id % 3).toInt,
      layout = (id % 3).toInt)

  private def multiRefSlices(base: Int, d1: Int, d2: Int, d3t: Int,
                             d3b: Int): (Array[Byte], Array[Byte], Seq[Array[Byte]]) = {
    require(base >= 0 && base + 13 * 15 <= 255 && d1 >= 0 && d2 >= 0 &&
      d3t >= 0 && d3b >= 0)
    val sps = escapeRbsp(sps1x1Refs(3))
    val pps = escapeRbsp(ppsNal())
    val f0 = escapeRbsp(idrPcm((_, y) => base + 13 * y))
    val p1 = escapeRbsp(pSliceNal(1, 0) { w =>
      w.ue(0) // mb_skip_run
      w.ue(0) // P_L0_16x16
      w.se(0).se(4 * d1) // mvd (quarter-pel)
      w.ue(0) // cbp 0: no residual, no qp delta
    })
    val p2 = escapeRbsp(pSliceNal(2, 2) { w =>
      w.ue(0); w.ue(0)
      wRefIdx(w, 1, 2) // frame 0 via the inverted-bit te branch
      w.se(0).se(4 * d2)
      w.ue(0)
    })
    val p3 = escapeRbsp(pSliceNal(3, 3) { w =>
      w.ue(0)
      w.ue(1) // P_L0_L0_16x8
      wRefIdx(w, 2, 3) // top → frame 0 (ue branch)
      wRefIdx(w, 1, 3) // bottom → frame 1
      w.se(0).se(4 * d3t)
      w.se(0).se(4 * d3b)
      w.ue(0)
    })
    (sps, pps, Seq(f0, p1, p2, p3))
  }

  /** Id-addressed [[multiRefGopMp4]] (the q153 corpus contract): all
    * five parameters are doc_id arithmetic MIRRORED by the oracle SQL
    * — change one side and the hash breaks.
    */
  def multiRefGop(id: Long): Array[Byte] =
    multiRefGopMp4(
      base = (10 + id % 40).toInt,
      d1 = (1 + id % 5).toInt,
      d2 = (2 + id % 7).toInt,
      d3t = (id % 4).toInt,
      d3b = (1 + id % 3).toInt)

  /** poc_type-0 1×1-MB SPS (B GOPs need real POC): 4-bit lsb,
    * `maxRef` references, direct_8x8_inference = 1.
    */
  private def sps1x1Poc0(maxRef: Int): Array[Byte] = {
    val w = new Bw
    w.u(0x67, 8).u(66, 8).u(0, 8).u(10, 8)
    w.ue(0).ue(0).ue(0).ue(0) // sps_id, log2fn, poc_type 0, log2lsb→4
    w.ue(maxRef).u(0, 1)
    w.ue(0).ue(0) // 1x1 MBs
    w.u(1, 1).u(1, 1).u(0, 1).u(0, 1)
    w.stop(); w.bytes()
  }

  /** 16×16 I_PCM IDR under a poc_type-0 SPS (lsb 0). */
  private def idrPcmPoc0(px: (Int, Int) => Int): Array[Byte] = {
    val w = new Bw
    w.u(0x65, 8)
    w.ue(0).ue(7).ue(0).u(0, 4).ue(0)
    w.u(0, 4) // pic_order_cnt_lsb
    w.u(0, 1).u(0, 1).se(0)
    w.ue(1)
    w.ue(25).align()
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) { w.raw(px(x, y) & 0xFF); x += 1 }
      y += 1
    }
    var i = 0
    while (i < 128) { w.raw(0x80); i += 1 }
    w.stop(); w.bytes()
  }

  /** Non-IDR P slice under the poc_type-0 SPS (carries the lsb). */
  private def pSlicePoc0(frameNum: Int, lsb: Int)(body: Bw => Unit): Array[Byte] = {
    val w = new Bw
    w.u(0x41, 8)
    w.ue(0).ue(5).ue(0)
    w.u(frameNum & 15, 4)
    w.u(lsb & 15, 4)
    w.u(0, 1).u(0, 1).u(0, 1)
    w.se(0).ue(1)
    body(w)
    w.stop(); w.bytes()
  }

  /** Non-reference B slice (nal_ref_idc 0 — stays out of the DPB). */
  private def bSlicePoc0(frameNum: Int, lsb: Int, spatial: Boolean)
                        (body: Bw => Unit): Array[Byte] = {
    val w = new Bw
    w.u(0x01, 8) // ref_idc 0, non-IDR
    w.ue(0).ue(6).ue(0) // first_mb, slice_type B, pps
    w.u(frameNum & 15, 4)
    w.u(lsb & 15, 4)
    w.u(if (spatial) 1 else 0, 1) // direct_spatial_mv_pred_flag
    w.u(0, 1) // no active override
    w.u(0, 1).u(0, 1) // no list modification (either list)
    // nal_ref_idc == 0: no dec_ref_pic_marking
    w.se(0).ue(1)
    body(w)
    w.stop(); w.bytes()
  }

  /** Four-frame 16×16 GOP exercising B-SLICE decode — the q154
    * corpus. Constant-row luma (`v(y) = base + 13y`), so a SQL
    * oracle predicts every decoded frame:
    *
    *   frame 0  IDR I_PCM, poc 0                    v(y)
    *   frame 1  P, poc 8, mv (0,d1)                 v(min(15, y+d1))
    *   frame 2  B, poc 2, EXPLICIT B_Bi_16x16:
    *            L0[0] = frame 0 (past), mv (0,a);
    *            L1[0] = frame 1 (future), mv (0,b)  → rounded average
    *   frame 3  B, poc 4, TEMPORAL-DIRECT B_Skip:
    *            colocated = frame 1's (0,4·d1) onto frame 0 →
    *            td = 8, tb = 4, distScaleFactor = 128 →
    *            mvL0 = (0, 2·d1) quarter-pel = d1/2 px of frame 0,
    *            mvL1 = −(0, 2·d1) = −d1/2 px of frame 1 → average
    *
    * d1 must be EVEN so the scaled direct MVs land integer-pel (the
    * oracle replays pixel shifts, not 6-tap interpolation). B frames
    * are non-references: the DPB stays {frame 0, frame 1} and both
    * lists order by POC (past-desc / future-asc).
    */
  private def bGopSlices(base: Int, d1: Int, a: Int, b: Int)
      : (Array[Byte], Array[Byte], Seq[Array[Byte]]) = {
    require(base >= 0 && base + 13 * 15 <= 255 && d1 >= 2 && d1 % 2 == 0 &&
      a >= 0 && b >= 0)
    val sps = escapeRbsp(sps1x1Poc0(2))
    val pps = escapeRbsp(ppsNal())
    val f0 = escapeRbsp(idrPcmPoc0((_, y) => base + 13 * y))
    val p1 = escapeRbsp(pSlicePoc0(1, 8) { w =>
      w.ue(0); w.ue(0); w.se(0).se(4 * d1); w.ue(0)
    })
    val b2 = escapeRbsp(bSlicePoc0(2, 2, spatial = true) { w =>
      w.ue(0) // mb_skip_run
      w.ue(3) // B_Bi_16x16 (1 active ref per list: no ref_idx fields)
      w.se(0).se(4 * a) // mvd_l0
      w.se(0).se(4 * b) // mvd_l1
      w.ue(0) // cbp 0
    })
    val b3 = escapeRbsp(bSlicePoc0(2, 4, spatial = false) { w =>
      w.ue(1) // mb_skip_run covers the frame: temporal-direct B_Skip
    })
    (sps, pps, Seq(f0, p1, b2, b3))
  }

  def bGopMp4(base: Int, d1: Int, a: Int, b: Int,
              ctts: Seq[Long] = Nil): Array[Byte] = {
    val (sps, pps, slices) = bGopSlices(base, d1, a, b)
    mp4Gop(sps, pps, slices, syncs = Seq(1), ctts = ctts)
  }

  /** The q163/q164 EDIT-LIST corpus: the [[bGopPts]] B GOP (ctts
    * composition offsets 0/+1000/−500/−500 on dts 0/500/1000/1500 →
    * raw pts 0/1500/500/1000) plus an `edts/elst` that real
    * device/DASH files carry:
    *
    *  - a LEADING EMPTY EDIT of `300·(id % 3)` movie units at movie
    *    timescale 600 (≠ the media's 1000, so the reader must
    *    convert) → +`500·(id % 3)` ms of presentation delay;
    *  - a media edit whose media_time = `500·(id % 2)` →
    *    presentation zero maps 500 ms into the media timeline,
    *    trimming frame 0 to pts −500 when id is odd (the classic
    *    B-delay normalization).
    *
    * Final pts = raw pts − 500·(id % 2) + 500·(id % 3). Container
    * layout alternates (classic stbl on even ids, fMP4 with trun
    * composition offsets on odd); elst version alternates v0/v1 by
    * id/2 parity. All parameters are doc_id arithmetic mirrored by
    * the q163 oracle.
    */
  def bGopElst(id: Long): Array[Byte] = {
    val (sps, pps, slices) = bGopSlices(
      base = (10 + id % 40).toInt,
      d1 = (2 + 2 * (id % 2)).toInt,
      a = (id % 5).toInt,
      b = (1 + id % 3).toInt)
    val cts = Seq(0L, 1000L, -500L, -500L)
    val emptyDurMovie = 300L * (id % 3) // movie ts 600 → 500·(id%3) ms
    val mediaTime = 500L * (id % 2)
    val entries =
      (if (emptyDurMovie > 0) Seq((emptyDurMovie, -1L)) else Nil) :+
        ((1200L, mediaTime)) // segment_duration nominal; rate 1.0
    val edts = edtsBox(entries, v1 = (id / 2) % 2 == 1)
    if (id % 2 == 0)
      mp4Gop(sps, pps, slices, syncs = Seq(1), ctts = cts,
        edts = edts, movieTimescale = 600L)
    else
      mp4FragmentedGop(sps, pps, slices, syncs = Seq(1), perFrag = 4,
        explicitBase = false, perSample = true, ctsList = cts,
        edts = edts, movieTimescale = 600L)
  }

  /** [[bGop]] with a VERSION-1 ctts box carrying the GOP's real
    * presentation reordering (decode order f0,f1,f2,f3 at dts
    * 0/500/1000/1500; display order by POC 0,8,2,4 → pts
    * 0/1500/500/1000 → signed composition offsets 0/+1000/−500/−500)
    * — the q158 corpus.
    */
  def bGopPts(id: Long): Array[Byte] =
    bGopMp4(
      base = (10 + id % 40).toInt,
      d1 = (2 + 2 * (id % 2)).toInt,
      a = (id % 5).toInt,
      b = (1 + id % 3).toInt,
      ctts = Seq(0L, 1000L, -500L, -500L))

  /** Id-addressed [[bGopMp4]] (the q154 corpus contract): parameters
    * are doc_id arithmetic MIRRORED by the oracle SQL.
    */
  def bGop(id: Long): Array[Byte] =
    bGopMp4(
      base = (10 + id % 40).toInt,
      d1 = (2 + 2 * (id % 2)).toInt,
      a = (id % 5).toInt,
      b = (1 + id % 3).toInt)

  /** PPS with weighted-prediction flags (the q155 corpus). */
  private def ppsWNal(weightedPred: Boolean, bipredIdc: Int): Array[Byte] = {
    val w = new Bw
    w.u(0x68, 8)
    w.ue(0).ue(0).u(0, 1).u(0, 1).ue(0).ue(0).ue(0)
    w.u(if (weightedPred) 1 else 0, 1).u(bipredIdc, 2)
    w.se(0).se(0).se(0)
    w.u(1, 1).u(0, 1).u(0, 1)
    w.stop(); w.bytes()
  }

  /** Three-frame 16×16 GOP exercising WEIGHTED prediction — the q155
    * corpus, two variants by id parity:
    *
    * EVEN ids (weighted_pred = 1, weighted_bipred_idc = 1, explicit):
    *   frame 1  P, weights (logWD 1, w, o): clip(((p·w+1)>>1)+o) of
    *            the d1-shifted IDR
    *   frame 2  B_Bi, weights (logWD 2, w0/o0, w1/o1):
    *            clip(((p0·w0 + p1·w1 + 4)>>3) + ((o0+o1+1)>>1))
    *
    * ODD ids (weighted_bipred_idc = 2, implicit): frame 1 plain P;
    *   frame 2 B_Bi at poc tb ∈ {2,4,6} between refs at poc 0/8 →
    *   w1 = DistScaleFactor>>2 = 8·tb, w0 = 64 − w1,
    *   pixel = clip((p0·w0 + p1·w1 + 32) >> 6)
    *
    * All parameters id arithmetic mirrored by the oracle.
    */
  def wGopMp4(id: Long): Array[Byte] = {
    val base = (10 + id % 40).toInt
    val d1 = (1 + id % 3).toInt
    val a = (id % 5).toInt
    val b = (1 + id % 4).toInt
    val sps = escapeRbsp(sps1x1Poc0(2))
    val f0 = escapeRbsp(idrPcmPoc0((_, y) => base + 13 * y))
    if (id % 2 == 0) {
      val wL = (2 + id % 3).toInt
      val oL = (id % 7).toInt - 3
      val w0 = (1 + id % 4).toInt
      val o0 = (id % 5).toInt - 2
      val w1 = (2 + id % 3).toInt
      val o1 = (id % 3).toInt - 1
      val pps = escapeRbsp(ppsWNal(weightedPred = true, bipredIdc = 1))
      val p1 = escapeRbsp {
        val w = new Bw
        w.u(0x41, 8)
        w.ue(0).ue(5).ue(0)
        w.u(1, 4).u(8, 4) // frame_num, poc lsb
        w.u(0, 1).u(0, 1) // no override, no modification
        w.ue(1).ue(0) // luma/chroma log2 denom
        w.u(1, 1).se(wL).se(oL).u(0, 1) // luma w/o, no chroma
        w.u(0, 1) // sliding window
        w.se(0).ue(1)
        w.ue(0); w.ue(0); w.se(0).se(4 * d1); w.ue(0)
        w.stop(); w.bytes()
      }
      val b2 = escapeRbsp {
        val w = new Bw
        w.u(0x01, 8)
        w.ue(0).ue(6).ue(0)
        w.u(2, 4).u(2, 4) // frame_num 2, poc lsb 2
        w.u(1, 1) // direct flag (unused)
        w.u(0, 1).u(0, 1).u(0, 1) // no override, no modification (l0/l1)
        w.ue(2).ue(0) // logWD 2
        w.u(1, 1).se(w0).se(o0).u(0, 1) // L0 ref 0
        w.u(1, 1).se(w1).se(o1).u(0, 1) // L1 ref 0
        w.se(0).ue(1)
        w.ue(0)
        w.ue(3) // B_Bi_16x16
        w.se(0).se(4 * a)
        w.se(0).se(4 * b)
        w.ue(0)
        w.stop(); w.bytes()
      }
      mp4Gop(sps, pps, Seq(f0, p1, b2), syncs = Seq(1))
    } else {
      val tb = 2 * d1 // poc of the B: 2, 4 or 6 between refs 0 and 8
      val pps = escapeRbsp(ppsWNal(weightedPred = false, bipredIdc = 2))
      val p1 = escapeRbsp(pSlicePoc0(1, 8) { w =>
        w.ue(0); w.ue(0); w.se(0).se(4 * d1); w.ue(0)
      })
      val b2 = escapeRbsp(bSlicePoc0(2, tb, spatial = true) { w =>
        w.ue(0)
        w.ue(3) // B_Bi_16x16: implicit weights apply
        w.se(0).se(4 * a)
        w.se(0).se(4 * b)
        w.ue(0)
      })
      mp4Gop(sps, pps, Seq(f0, p1, b2), syncs = Seq(1))
    }
  }

  /** Three-frame I/P/B GOP over an arbitrary 16×16 PCM scene — the
    * q157 any-frame near-dup corpus: frame 1 is the scene shifted
    * `shiftPx` right (P_16x16, edge clamp), frame 2 the rounded
    * average of frames 0 and 1 (B_Bi at zero MVs). Decoded frames
    * are closed-form in the scene, so a re-cut plants EXACT frame
    * twins via [[pcmKeyframeMp4]] over the same arithmetic.
    */
  def gopSceneMp4(px: (Int, Int) => Int, shiftPx: Int): Array[Byte] = {
    val sps = escapeRbsp(sps1x1Poc0(2))
    val pps = escapeRbsp(ppsNal())
    val f0 = escapeRbsp(idrPcmPoc0(px))
    val p1 = escapeRbsp(pSlicePoc0(1, 8) { w =>
      w.ue(0); w.ue(0); w.se(4 * shiftPx).se(0); w.ue(0)
    })
    val b2 = escapeRbsp(bSlicePoc0(2, 4, spatial = true) { w =>
      w.ue(0); w.ue(3); w.se(0).se(0); w.se(0).se(0); w.ue(0)
    })
    mp4Gop(sps, pps, Seq(f0, p1, b2), syncs = Seq(1))
  }

  /** FRAGMENTED MP4 (fMP4/CMAF shape) from already-escaped slice
    * NALs: a zero-sample `stbl` + `mvex`/`trex`, then one
    * moof+mdat pair per `perFrag` samples. Layout knobs exercise the
    * §8.8 variants the reader supports:
    *  - `explicitBase`: tfhd base_data_offset instead of
    *    default-base-is-moof
    *  - `perSample`: trun carries per-sample size+duration+flags;
    *    otherwise sizes/durations come from trex defaults with a
    *    first_sample_flags sync override (requires equal-size
    *    samples per fragment — callers pass perFrag = 1)
    * Timing matches [[multiKeyframeMp4]]: timescale 1000, 500/frame.
    */
  def mp4FragmentedGop(sps: Array[Byte], pps: Array[Byte],
                       slices: Seq[Array[Byte]], syncs: Seq[Int],
                       perFrag: Int, explicitBase: Boolean,
                       perSample: Boolean,
                       ctsList: Seq[Long] = Nil,
                       edts: Array[Byte] = Array.emptyByteArray,
                       movieTimescale: Long = 0L): Array[Byte] = {
    require(perFrag >= 1 && (perSample || perFrag == 1))
    // composition offsets ride per-sample trun fields (version-1
    // signed), so they require the per-sample layout
    require(ctsList.isEmpty ||
      (perSample && ctsList.length == slices.length))
    val avcc = box("avcC", Array[Byte](1), sps.slice(1, 2), Array[Byte](0),
      sps.slice(3, 4), Array(0xFF.toByte), Array(0xE1.toByte),
      be16(sps.length), sps, Array[Byte](1), be16(pps.length), pps)
    val samples = slices.map(s => be32(s.length.toLong) ++ s)
    val syncSet = syncs.toSet
    val ftyp = box("ftyp", "isom".getBytes, be32(0x200),
      "iso6cmfc".getBytes)
    val stsd = box("stsd", be32(0), be32(1),
      box("avc1", new Array[Byte](78), avcc))
    // zero-sample stbl: the fMP4 signature the reader keys on
    val stbl = box("stbl", stsd,
      box("stts", be32(0), be32(0)),
      box("stsc", be32(0), be32(0)),
      box("stsz", be32(0), be32(0), be32(0)),
      box("stco", be32(0), be32(0)))
    val tkhd = box("tkhd", {
      val p = new Array[Byte](84) // version 0 payload
      System.arraycopy(be32(1), 0, p, 12, 4) // track_ID = 1
      p
    })
    val mdia = box("mdia", box("mdhd", be32(0), be32(0), be32(0), be32(1000),
      be32(0), be32(0x55c40000L)), box("minf", stbl))
    // trex defaults: duration 500, size of the FIRST sample (only
    // consulted on the non-per-sample layout where sizes are equal),
    // non-sync flags (0x010000 bit set; depends-on 1)
    val trex = box("trex", be32(0), be32(1), be32(1),
      be32(500), be32(samples.head.length.toLong), be32(0x01010000L))
    val trak =
      if (edts.isEmpty) box("trak", tkhd, mdia)
      else box("trak", tkhd, edts, mdia)
    val moov = box("moov", box("mvhd", mvhdPayload(movieTimescale)),
      trak, box("mvex", trex))
    var outBytes = ftyp ++ moov
    var sn = 1
    samples.grouped(perFrag).zipWithIndex.foreach { case (grp, gi) =>
      val mdatPayload = grp.flatten.toArray
      // trun flags; composition offsets force version 1 (signed cts)
      val trFlags =
        (if (perSample) 0x100L | 0x200L | 0x400L else 0L) |
          (if (ctsList.nonEmpty) 0x01000800L else 0L) |
          0x1L | // data_offset always present
          (if (!perSample && syncSet.contains(sn)) 0x4L else 0L)
      def sampleFlags(num: Int): Long =
        if (syncSet.contains(num)) 0x02000000L else 0x01010000L
      val trunBody = new scala.collection.mutable.ArrayBuffer[Byte]()
      trunBody ++= be32(trFlags)
      trunBody ++= be32(grp.length.toLong)
      val dataOffSlot = trunBody.length // patched after moof size known
      trunBody ++= be32(0)
      if (!perSample && syncSet.contains(sn))
        trunBody ++= be32(0x02000000L) // first_sample_flags
      if (perSample) grp.zipWithIndex.foreach { case (sm, i) =>
        trunBody ++= be32(500) // duration
        trunBody ++= be32(sm.length.toLong)
        trunBody ++= be32(sampleFlags(sn + i))
        if (ctsList.nonEmpty)
          trunBody ++= be32(ctsList(sn + i - 1) & 0xFFFFFFFFL)
      }
      val tfFlags =
        (if (explicitBase) 0x1L else 0x20000L) | // base | default-base-is-moof
          (if (!perSample) 0x8L | 0x10L else 0L) // tfhd default dur+size
      val tfhdBody = new scala.collection.mutable.ArrayBuffer[Byte]()
      tfhdBody ++= be32(tfFlags)
      tfhdBody ++= be32(1) // track_ID
      val baseSlot = tfhdBody.length
      if (explicitBase) tfhdBody ++= (be32(0) ++ be32(0)) // patched u64
      if (!perSample) {
        tfhdBody ++= be32(500) // default_sample_duration
        tfhdBody ++= be32(grp.head.length.toLong) // default_sample_size
      }
      val tfdt = box("tfdt", be32(0), be32(500L * (sn - 1)))
      def assemble(): Array[Byte] = {
        val tfhd = box("tfhd", tfhdBody.toArray)
        val trun = box("trun", trunBody.toArray)
        val traf = box("traf", tfhd, tfdt, trun)
        box("moof", box("mfhd", be32(0), be32(gi + 1L)), traf)
      }
      // two-pass: sizes are flag-determined, so one re-assembly after
      // patching the offsets is exact
      val probe = assemble()
      val moofStart = outBytes.length.toLong
      val firstSampleAbs = moofStart + probe.length + 8
      if (explicitBase) {
        val b8 = java.nio.ByteBuffer.allocate(8).putLong(firstSampleAbs).array()
        var i = 0
        while (i < 8) { tfhdBody(baseSlot + i) = b8(i); i += 1 }
        val z = be32(0)
        var j = 0
        while (j < 4) { trunBody(dataOffSlot + j) = z(j); j += 1 }
      } else {
        val rel = be32(probe.length + 8L)
        var j = 0
        while (j < 4) { trunBody(dataOffSlot + j) = rel(j); j += 1 }
      }
      val moof = assemble()
      outBytes = outBytes ++ moof ++ box("mdat", mdatPayload)
      sn += grp.length
    }
    outBytes
  }

  /** mvhd payload (version 0) with an explicit movie timescale at
    * offset 12 — edit-list empty-edit durations are coded in it, so
    * elst fixtures must pin a DIFFERENT timescale than the media's
    * 1000 to prove the reader converts.
    */
  private def mvhdPayload(movieTimescale: Long): Array[Byte] = {
    val p = new Array[Byte](100)
    if (movieTimescale > 0) System.arraycopy(be32(movieTimescale), 0, p, 12, 4)
    p
  }

  /** `edts/elst` box: entries are (segment_duration, media_time) —
    * duration in MOVIE timescale units, media_time in MEDIA units or
    * −1 for an empty edit (ISO 14496-12 §8.6.6). `v1 = true` codes
    * the 64-bit layout. media_rate fixed at 1.0.
    */
  private[graft] def edtsBox(entries: Seq[(Long, Long)], v1: Boolean): Array[Byte] = {
    val body = new scala.collection.mutable.ArrayBuffer[Byte]()
    body ++= Array[Byte](if (v1) 1 else 0, 0, 0, 0)
    body ++= be32(entries.length.toLong)
    entries.foreach { case (dur, mt) =>
      if (v1) {
        body ++= be32(dur >>> 32) ++ be32(dur & 0xFFFFFFFFL)
        body ++= be32(mt >>> 32) ++ be32(mt & 0xFFFFFFFFL)
      } else {
        body ++= be32(dur & 0xFFFFFFFFL)
        body ++= be32(mt & 0xFFFFFFFFL)
      }
      body ++= be16(1) ++ be16(0) // media_rate 1.0
    }
    box("edts", box("elst", body.toArray))
  }

  /** Multi-sample MP4 from already-escaped slice NALs, `syncs` =
    * 1-based stss entries (same boxes/timing as [[multiKeyframeMp4]]:
    * timescale 1000, 500 per frame). `edts` (with `movieTimescale`)
    * splices an edit list into the trak.
    */
  private def mp4Gop(sps: Array[Byte], pps: Array[Byte],
                     slices: Seq[Array[Byte]], syncs: Seq[Int],
                     ctts: Seq[Long] = Nil,
                     edts: Array[Byte] = Array.emptyByteArray,
                     movieTimescale: Long = 0L): Array[Byte] = {
    val avcc = box("avcC", Array[Byte](1), sps.slice(1, 2), Array[Byte](0),
      sps.slice(3, 4), Array(0xFF.toByte), Array(0xE1.toByte),
      be16(sps.length), sps, Array[Byte](1), be16(pps.length), pps)
    val samples = slices.map(s => be32(s.length.toLong) ++ s)
    val ftyp = box("ftyp", "isom".getBytes, be32(0x200), "isomiso2".getBytes)
    val mdatOff = ftyp.length + 8L
    val stsd = box("stsd", be32(0), be32(1),
      box("avc1", new Array[Byte](78), avcc))
    val stsz = box("stsz", be32(0), be32(0), be32(samples.length.toLong),
      samples.flatMap(sm => be32(sm.length.toLong)).toArray)
    val stsc = box("stsc", be32(0), be32(1), be32(1),
      be32(samples.length.toLong), be32(1))
    val stco = box("stco", be32(0), be32(1), be32(mdatOff))
    val stss = box("stss", be32(0), be32(syncs.length.toLong),
      syncs.flatMap(i => be32(i.toLong)).toArray)
    val stts = box("stts", be32(0), be32(1),
      be32(samples.length.toLong), be32(500))
    val stblBoxes = Seq(stsd, stsz, stsc, stco, stss, stts) ++
      (if (ctts.isEmpty) Nil
       else Seq(box("ctts", Array[Byte](1, 0, 0, 0) ++ // version 1: signed
         be32(ctts.length.toLong) ++
         ctts.flatMap(c => be32(1) ++ be32(c & 0xFFFFFFFFL)).toArray)))
    val stbl = box("stbl", stblBoxes: _*)
    val mdia = box("mdia", box("mdhd", be32(0), be32(0), be32(0), be32(1000),
      be32(0), be32(0x55c40000L)), box("minf", stbl))
    val trak =
      if (edts.isEmpty) box("trak", mdia) else box("trak", edts, mdia)
    val moov = box("moov", box("mvhd", mvhdPayload(movieTimescale)), trak)
    ftyp ++ box("mdat", samples.flatten.toArray) ++ moov
  }

  /** Wrap one SPS/PPS/slice into the minimal real MP4. */
  private def mp4From(sps: Array[Byte], pps: Array[Byte],
                      slice: Array[Byte]): Array[Byte] = {
    val avcc = box("avcC", Array[Byte](1), sps.slice(1, 2), Array[Byte](0),
      sps.slice(3, 4), Array(0xFF.toByte), Array(0xE1.toByte),
      be16(sps.length), sps, Array[Byte](1), be16(pps.length), pps)
    val sample = be32(slice.length.toLong) ++ slice
    val ftyp = box("ftyp", "isom".getBytes, be32(0x200), "isomiso2".getBytes)
    val mdatOff = ftyp.length + 8L
    val stsd = box("stsd", be32(0), be32(1),
      box("avc1", new Array[Byte](78), avcc))
    val stsz = box("stsz", be32(0), be32(0), be32(1), be32(sample.length.toLong))
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(1), be32(1))
    val stco = box("stco", be32(0), be32(1), be32(mdatOff))
    val stss = box("stss", be32(0), be32(1), be32(1))
    val stbl = box("stbl", stsd, stsz, stsc, stco, stss)
    val mdia = box("mdia", box("mdhd", be32(0), be32(0), be32(0), be32(1000),
      be32(0), be32(0x55c40000L)), box("minf", stbl))
    val moov = box("moov", box("mvhd", new Array[Byte](100)), box("trak", mdia))
    ftyp ++ box("mdat", sample) ++ moov
  }
}
