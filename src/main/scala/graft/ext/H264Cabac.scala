package graft.ext

/** CABAC entropy decoding for H.264 I slices (ITU-T H.264 clause
  * 9.3) — the Main-profile keyframe jump: most real-world MP4s are
  * Main/High with entropy_coding_mode = CABAC, so their keyframes
  * previously fell to the metadata-stub feature path. This module
  * holds the NORMATIVE constants and the arithmetic decoding engine;
  * the I-slice syntax layer lives next to its CAVLC twin in
  * [[H264]].
  *
  * Contents, all transcribed from the published spec:
  *  - Table 9-44 `rangeTabLPS[pStateIdx][qCodIRangeIdx]`
  *  - Table 9-45 `transIdxLPS`
  *  - the I-slice (m, n) context initialization column (Tables
  *    9-12…9-23) for every context the I-slice syntax uses:
  *    mb_type (0-10), mb_qp_delta (60-63), intra_chroma_pred_mode
  *    (64-67), prev/rem intra4x4 pred mode (68, 69), cbp (73-84),
  *    coded_block_flag (85-104), significant / last-significant
  *    coeff flags, frame-coded (105-226), coeff_abs_level_minus1
  *    (227-275), the fixed terminate context 276, and — round 10 —
  *    the High-profile 8x8 block: transform_size_8x8_flag (399-401)
  *    and the ctxBlockCat-5 residual family (402-435) with the
  *    Table 9-43 significance-position maps
  *  - the decoding engine: DecodeDecision (9.3.3.2.1), DecodeBypass
  *    (9.3.3.2.3), DecodeTerminate (9.3.3.2.2), context init
  *    (9.3.1.1), engine (re)init (9.3.1.2, also run after I_PCM)
  *
  * Validation note: no conformance vectors or external codecs exist
  * in this build environment, so the tables are verified by DUAL
  * TRANSCRIPTION — H264CabacSpec carries an independently written
  * second copy of every table plus a from-spec CABAC ENCODER
  * (flowcharts 9.3.4.x) with its own table copies; long adversarial
  * bin sequences drive all 64 probability states through
  * encode∘decode = identity, and CAVLC/CABAC slice parity pins the
  * syntax layer to the already-golden CAVLC reconstruction.
  */
private[graft] object H264Cabac {

  /** Table 9-44, flattened [pStateIdx * 4 + qCodIRangeIdx]. */
  val RangeTabLps: Array[Int] = Array(
    128, 176, 208, 240, 128, 167, 197, 227, 128, 158, 187, 216,
    123, 150, 178, 205, 116, 142, 169, 195, 111, 135, 160, 185,
    105, 128, 152, 175, 100, 122, 144, 166, 95, 116, 137, 158,
    90, 110, 130, 150, 85, 104, 123, 142, 81, 99, 117, 135,
    77, 94, 111, 128, 73, 89, 105, 122, 69, 85, 100, 116,
    66, 80, 95, 110, 62, 76, 90, 104, 59, 72, 86, 99,
    56, 69, 81, 94, 53, 65, 77, 89, 51, 62, 73, 85,
    48, 59, 69, 80, 46, 56, 66, 76, 43, 53, 63, 72,
    41, 50, 59, 69, 39, 48, 56, 65, 37, 45, 54, 62,
    35, 43, 51, 59, 33, 41, 48, 56, 32, 39, 46, 53,
    30, 37, 43, 50, 28, 35, 41, 48, 27, 33, 39, 45,
    26, 31, 37, 43, 24, 30, 35, 41, 23, 28, 33, 39,
    22, 27, 32, 37, 21, 26, 30, 35, 20, 24, 29, 33,
    19, 23, 27, 31, 18, 22, 26, 30, 17, 21, 25, 28,
    16, 20, 23, 27, 15, 19, 22, 25, 14, 18, 21, 24,
    14, 17, 20, 23, 13, 16, 19, 22, 12, 15, 18, 21,
    12, 14, 17, 20, 11, 14, 16, 19, 11, 13, 15, 18,
    10, 12, 15, 17, 10, 12, 14, 16, 9, 11, 13, 15,
    9, 11, 12, 14, 8, 10, 12, 14, 8, 9, 11, 13,
    7, 9, 11, 12, 7, 9, 10, 12, 7, 8, 10, 11,
    6, 8, 9, 11, 6, 7, 9, 10, 6, 7, 8, 9,
    2, 2, 2, 2)

  /** Table 9-45. */
  val TransIdxLps: Array[Int] = Array(
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 23, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63)

  /** Context count: the I-slice syntax through ctx 276 (terminate),
    * plus the High-profile 8x8-transform block at 399-435
    * (transform_size_8x8_flag and the ctxBlockCat-5 residual).
    * Intermediate indices stay uninitialized zeros — unreachable.
    */
  val NumCtx = 436

  /** I-slice (m, n) initialization values, indexed [ctxIdx * 2] /
    * [ctxIdx * 2 + 1]. Contexts outside the I-slice syntax stay 0
    * (never consulted — the syntax layer cannot reach them).
    */
  val InitI: Array[Int] = {
    val t = new Array[Int](NumCtx * 2)
    def put(ctx: Int, pairs: (Int, Int)*): Unit =
      pairs.zipWithIndex.foreach { case ((m, n), i) =>
        t((ctx + i) * 2) = m; t((ctx + i) * 2 + 1) = n
      }
    // 0-10: mb_type (SI prefix 0-2 unused here, kept for completeness)
    put(0, (20, -15), (2, 54), (3, 74), (20, -15), (2, 54), (3, 74),
      (-28, 127), (-23, 104), (-6, 53), (-1, 54), (7, 51))
    // 60-63: mb_qp_delta
    put(60, (0, 41), (0, 63), (0, 63), (0, 63))
    // 64-67: intra_chroma_pred_mode
    put(64, (-9, 83), (4, 86), (0, 97), (-7, 72))
    // 68: prev_intra4x4_pred_mode_flag; 69: rem_intra4x4_pred_mode
    put(68, (13, 41), (3, 62))
    // 70-72: mb_field_decoding_flag (frame-only decoder: unused)
    put(70, (0, 11), (1, 55), (0, 69))
    // 73-76: coded_block_pattern luma
    put(73, (-17, 127), (-13, 102), (0, 82), (-7, 74))
    // 77-84: coded_block_pattern chroma
    put(77, (-21, 107), (-27, 127), (-31, 127), (-24, 127),
      (-18, 95), (-27, 127), (-21, 114), (-30, 127))
    // 85-104: coded_block_flag, ctxBlockCat 0..4
    put(85, (-17, 123), (-12, 115), (-16, 122), (-11, 115),
      (-12, 63), (-2, 68), (-15, 84), (-13, 104),
      (-3, 70), (-8, 93), (-10, 90), (-30, 127),
      (-1, 74), (-6, 97), (-7, 91), (-20, 127),
      (-4, 56), (-5, 82), (-7, 76), (-22, 125))
    // 105-165: significant_coeff_flag (frame coded)
    put(105, // cat 0 (15)
      (-7, 93), (-11, 87), (-3, 77), (-5, 71), (-4, 63),
      (-4, 68), (-12, 84), (-7, 62), (-7, 65), (8, 61),
      (5, 56), (-2, 66), (1, 64), (0, 61), (-2, 78))
    put(120, // cat 1 (14)
      (1, 50), (7, 52), (10, 35), (0, 44), (11, 38),
      (1, 45), (0, 46), (5, 44), (31, 17), (1, 51),
      (7, 50), (28, 19), (16, 33), (14, 62))
    put(134, // cat 2 (15)
      (-13, 108), (-15, 100), (-13, 101), (-13, 91), (-12, 94),
      (-10, 88), (-16, 84), (-10, 86), (-7, 83), (-13, 87),
      (-19, 94), (1, 70), (0, 72), (-5, 74), (18, 59))
    put(149, // cat 3 (3)
      (-8, 102), (-15, 100), (0, 95))
    put(152, // cat 4 (14)
      (-4, 75), (2, 72), (-11, 75), (-3, 71), (15, 46),
      (-13, 69), (0, 62), (0, 65), (21, 37), (-15, 72),
      (9, 57), (16, 54), (0, 62), (12, 72))
    // 166-226: last_significant_coeff_flag (frame coded)
    put(166, // cat 0 (15)
      (24, 0), (15, 9), (8, 25), (13, 18), (15, 9),
      (13, 19), (10, 37), (12, 18), (6, 29), (20, 33),
      (15, 30), (4, 45), (1, 58), (0, 62), (7, 61))
    put(181, // cat 1 (14)
      (12, 38), (11, 45), (15, 39), (11, 42), (13, 44),
      (16, 45), (12, 41), (10, 49), (30, 34), (18, 42),
      (10, 55), (17, 51), (17, 46), (0, 89))
    put(195, // cat 2 (15)
      (26, -19), (22, -17), (26, -17), (30, -25), (28, -20),
      (33, -23), (37, -27), (33, -23), (40, -28), (38, -17),
      (33, -11), (40, -15), (41, -6), (38, 1), (41, 17))
    put(210, // cat 3 (3)
      (30, -6), (27, 3), (26, 22))
    put(213, // cat 4 (14)
      (37, -16), (35, -4), (38, -8), (38, -3), (37, 3),
      (38, 5), (42, 0), (35, 16), (39, 22), (14, 48),
      (27, 37), (21, 60), (12, 68), (2, 97))
    // 227-275: coeff_abs_level_minus1
    put(227, // cat 0 (10)
      (-3, 71), (-6, 42), (-5, 50), (-3, 54), (-2, 62),
      (0, 58), (1, 63), (-2, 72), (-1, 74), (-9, 91))
    put(237, // cat 1 (10)
      (-5, 67), (-4, 76), (-4, 77), (-6, 76), (2, 61),
      (-2, 61), (-3, 68), (-8, 74), (-9, 92), (-14, 106))
    put(247, // cat 2 (10)
      (-13, 97), (-15, 90), (-12, 90), (-18, 88), (-10, 73),
      (-9, 79), (-14, 86), (-10, 73), (-10, 70), (-10, 69))
    put(257, // cat 3 (9)
      (-5, 66), (-9, 64), (-5, 58), (2, 59), (21, -10),
      (24, -11), (28, -8), (28, 1), (29, 3))
    put(266, // cat 4 (10)
      (29, 9), (35, 20), (29, 36), (14, 67), (17, 35),
      (18, 31), (17, 35), (21, 30), (17, 45), (20, 42))
    // 399-401: transform_size_8x8_flag (Table 9-24 block, I column)
    put(399, (31, 21), (31, 31), (25, 50))
    // 402-416: significant_coeff_flag, ctxBlockCat 5 (frame coded)
    put(402,
      (-17, 120), (-20, 112), (-18, 114), (-11, 85), (-15, 92),
      (-14, 89), (-26, 71), (-15, 81), (-14, 80), (0, 68),
      (-14, 70), (-24, 56), (-23, 68), (-24, 50), (-11, 74))
    // 417-425: last_significant_coeff_flag, ctxBlockCat 5 (frame)
    put(417,
      (23, -13), (26, -13), (40, -15), (49, -14), (44, 3),
      (45, 6), (44, 34), (33, 54), (19, 82))
    // 426-435: coeff_abs_level_minus1, ctxBlockCat 5
    put(426,
      (-3, 75), (-1, 23), (1, 34), (1, 43), (0, 54),
      (-2, 55), (0, 61), (1, 64), (0, 68), (-9, 92))
    t
  }

  /** Table 9-43, frame-coded: significant_coeff_flag ctxIdxInc per
    * 8x8 scan position (63 entries — position 63 is never tested).
    */
  val Sig8x8Ctx: Array[Int] = Array(
    0, 1, 2, 3, 4, 5, 5, 4, 4, 3, 3, 4, 4, 4, 5, 5,
    4, 4, 4, 4, 3, 3, 6, 7, 7, 7, 8, 9, 10, 9, 8, 7,
    7, 6, 11, 12, 13, 11, 6, 7, 8, 9, 14, 10, 9, 8, 6, 11,
    12, 13, 11, 6, 9, 14, 10, 9, 11, 12, 13, 11, 14, 10, 12)

  /** Table 9-43: last_significant_coeff_flag ctxIdxInc per 8x8 scan
    * position.
    */
  val Last8x8Ctx: Array[Int] = Array(
    0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    3, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5)

  /** ctxBlockCat offsets (Table 9-40): coded_block_flag,
    * significant/last flags, coeff_abs_level_minus1.
    */
  val CbfCatOffset: Array[Int] = Array(0, 4, 8, 12, 16)
  val SigCatOffset: Array[Int] = Array(0, 15, 29, 44, 47)
  val AbsCatOffset: Array[Int] = Array(0, 10, 20, 30, 39)
}

/** The arithmetic decoding engine over [[H264.Br]]. Renormalization
  * may legally touch bits past the written stream tail (the final
  * terminate's renorm); those reads yield 0 instead of underrunning.
  */
private[graft] final class H264CabacEngine(r: graft.ext.H264.Br) {
  import H264Cabac._

  private var range = 0
  private var offset = 0
  val pState = new Array[Int](NumCtx)
  val valMps = new Array[Int](NumCtx)

  private def safeBit(): Int =
    if (r.pos < r.b.length * 8) r.u(1) else { r.pos += 1; 0 }

  /** 9.3.1.1 + 9.3.1.2: context variables from the I column at this
    * slice QP, then engine registers from the next 9 bits.
    */
  def init(sliceQp: Int): Unit = {
    val qp = math.max(0, math.min(51, sliceQp))
    var ctx = 0
    while (ctx < NumCtx) {
      val m = InitI(ctx * 2)
      val n = InitI(ctx * 2 + 1)
      val pre = math.max(1, math.min(126, ((m * qp) >> 4) + n))
      if (pre <= 63) { pState(ctx) = 63 - pre; valMps(ctx) = 0 }
      else { pState(ctx) = pre - 64; valMps(ctx) = 1 }
      ctx += 1
    }
    // ctxIdx 276 is initialized to the fixed (pStateIdx 63, valMPS 0)
    pState(276) = 63; valMps(276) = 0
    reinitEngine()
  }

  /** 9.3.1.2 — also rerun after each I_PCM macroblock. */
  def reinitEngine(): Unit = {
    range = 510
    offset = r.u(9)
  }

  /** 9.3.3.2.1 DecodeDecision. */
  def decision(ctx: Int): Int = {
    val q = (range >> 6) & 3
    val lps = RangeTabLps(pState(ctx) * 4 + q)
    range -= lps
    var bin = 0
    if (offset >= range) {
      bin = 1 - valMps(ctx)
      offset -= range
      range = lps
      if (pState(ctx) == 0) valMps(ctx) = 1 - valMps(ctx)
      pState(ctx) = TransIdxLps(pState(ctx))
    } else {
      bin = valMps(ctx)
      if (pState(ctx) < 62) pState(ctx) += 1
    }
    while (range < 256) {
      range <<= 1
      offset = (offset << 1) | safeBit()
    }
    bin
  }

  /** 9.3.3.2.3 DecodeBypass. */
  def bypass(): Int = {
    offset = (offset << 1) | safeBit()
    if (offset >= range) { offset -= range; 1 } else 0
  }

  /** 9.3.3.2.2 DecodeTerminate (end_of_slice_flag, I_PCM escape).
    * On a 1 result decoding of this codeword stops; the caller
    * derives the byte-aligned resume position via [[alignPastFlush]].
    */
  def terminate(): Int = {
    range -= 2
    if (offset >= range) 1
    else {
      while (range < 256) {
        range <<= 1
        offset = (offset << 1) | safeBit()
      }
      0
    }
  }

  /** Position the bit reader at the first byte boundary after the
    * encoder's flush output, for I_PCM samples (and the engine
    * reinit that follows them).
    *
    * Bit conservation fixes the position: the decoder's renorm count
    * R equals the encoder's (identical range trajectories), so at
    * terminate==1 the decoder has consumed 9 + R bits while the
    * encoder emitted R + 10 − 1 (EncodeFlush 9.3.4.6: 7 RenormE
    * steps from codIRange = 2, the PutBit, the 2-bit stop pattern;
    * minus the first-bit-swallowed PutBit convention) — exactly
    * equal. pcm_alignment_zero_bit padding then rounds up to the
    * byte (verified byte-exact by the PCM round-trip in
    * H264CabacSpec).
    */
  def alignPastFlush(): Unit = {
    r.pos = (r.pos + 7) & ~7
  }
}
