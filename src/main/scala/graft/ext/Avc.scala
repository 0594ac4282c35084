package graft.ext

/** H.264/AVC metadata from an MP4 container WITHOUT a video decoder —
  * the most common real-corpus video need (resolution/profile triage,
  * keyframe indexing for clip sampling) served from plain public
  * structures: the avcC box (ISO/IEC 14496-15
  * AVCDecoderConfigurationRecord) carries the SPS NAL, and the SPS
  * (ITU-T H.264 §7.3.2.1.1, Exp-Golomb coded) carries the CODED
  * dimensions — authoritative where container width/height fields are
  * absent or wrong, which is exactly the real-data failure mode.
  * FRAME decode is real as of round 8 and extended through round 12
  * ([[H264]]: CAVLC I/P/B with multi-ref + weighted prediction,
  * CABAC I keyframes); only CABAC P/B streams remain metadata-only
  * ([[Multimodal]]). Sample walking covers BOTH layouts: classic
  * stbl tables and FRAGMENTED moof/traf/trun (fMP4/CMAF/DASH —
  * round 12, [[fragmentSamplesOrNull]]).
  *
  * Sync-sample (keyframe) BYTE offsets come from stss (sync sample
  * numbers) composed with the stsz/stsc/stco mapping ([[Bmff]]) — the
  * random-access index a clip sampler seeks by, no bitstream parse.
  */
object Avc {

  import Bmff.{beU32, children, find, tag}

  private val AvcFourccs = Set("avc1", "avc3")
  private val HevcFourccs = Set("hvc1", "hev1")
  private val MaxSamples = 1 << 20
  private val MaxChunks = 1 << 20

  /** Exp-Golomb bit reader over RBSP bytes (emulation prevention
    * already stripped). Returns negative on underrun.
    */
  private final class BitReader(val b: Array[Byte]) {
    private var pos = 0
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteIdx = pos >> 3
        if (byteIdx >= b.length) return -1
        v = (v << 1) | ((b(byteIdx) >> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }
    def ue(): Int = {
      var zeros = 0
      var bit = u(1)
      // cap at 30 leading zeros: (1 << 31) - 1 + rest overflows Int,
      // and no legal SPS field needs values ≥ 2^30 — a crafted stream
      // past the cap must read as malformed (-1), not wrap into a
      // plausible positive that poisons the crop arithmetic
      while (bit == 0) { zeros += 1; if (zeros > 30) return -1; bit = u(1) }
      if (bit < 0) return -1
      if (zeros == 0) return 0
      val rest = u(zeros)
      if (rest < 0) return -1
      (1 << zeros) - 1 + rest
    }
    def se(): Int = {
      val k = ue()
      if (k < 0) return Int.MinValue
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }
  }

  /** Strip H.264 emulation-prevention bytes (00 00 03 → 00 00). */
  private def rbsp(nal: Array[Byte], from: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(nal.length - from)
    var i = from
    var zeros = 0
    while (i < nal.length) {
      val v = nal(i) & 0xFF
      if (zeros >= 2 && v == 3) zeros = 0 // skip the emulation byte
      else {
        out.write(v)
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  /** Parse seq_parameter_set_data (H.264 §7.3.2.1.1):
    * [width, height, profile_idc, level_idc] or null. `sps` includes
    * the 1-byte NAL header.
    */
  private[ext] def parseSps(sps: Array[Byte]): Array[Double] = {
    if (sps == null || sps.length < 4) return null
    if ((sps(0) & 0x1F) != 7) return null // NAL type must be SPS
    val r = new BitReader(rbsp(sps, 1))
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    val level = r.u(8)
    if (r.ue() < 0) return null // sps_id
    var chromaFormat = 1 // the default when not transmitted (4:2:0)
    var separateColour = 0
    if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
        .contains(profile)) {
      chromaFormat = r.ue()
      if (chromaFormat < 0 || chromaFormat > 3) return null
      if (chromaFormat == 3) separateColour = r.u(1)
      if (r.ue() < 0) return null // bit_depth_luma_minus8
      if (r.ue() < 0) return null // bit_depth_chroma_minus8
      r.u(1) // qpprime_y_zero_transform_bypass_flag
      val scalingPresent = r.u(1)
      if (scalingPresent == 1) {
        val nLists = if (chromaFormat != 3) 8 else 12
        var i = 0
        while (i < nLists) {
          if (r.u(1) == 1) { // seq_scaling_list_present_flag[i]
            val size = if (i < 6) 16 else 64
            // scaling_list(): delta-coded; walk to advance the reader
            var lastScale = 8; var nextScale = 8
            var j = 0
            while (j < size) {
              if (nextScale != 0) {
                val delta = r.se()
                if (delta == Int.MinValue) return null
                nextScale = (lastScale + delta + 256) % 256
              }
              lastScale = if (nextScale == 0) lastScale else nextScale
              j += 1
            }
          }
          i += 1
        }
      }
    }
    if (r.ue() < 0) return null // log2_max_frame_num_minus4
    val pocType = r.ue()
    if (pocType < 0) return null
    if (pocType == 0) {
      if (r.ue() < 0) return null // log2_max_pic_order_cnt_lsb_minus4
    } else if (pocType == 1) {
      r.u(1) // delta_pic_order_always_zero_flag
      if (r.se() == Int.MinValue) return null
      if (r.se() == Int.MinValue) return null
      val n = r.ue()
      if (n < 0 || n > 255) return null
      var i = 0
      while (i < n) { if (r.se() == Int.MinValue) return null; i += 1 }
    }
    if (r.ue() < 0) return null // max_num_ref_frames
    r.u(1) // gaps_in_frame_num_value_allowed_flag
    val widthMbs = r.ue()
    val heightMapUnits = r.ue()
    if (widthMbs < 0 || heightMapUnits < 0) return null
    val frameMbsOnly = r.u(1)
    if (frameMbsOnly < 0) return null
    if (frameMbsOnly == 0) r.u(1) // mb_adaptive_frame_field_flag
    r.u(1) // direct_8x8_inference_flag
    val cropping = r.u(1)
    if (cropping < 0) return null
    var cl = 0; var cr = 0; var ct = 0; var cb = 0
    if (cropping == 1) {
      cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue()
      if (cl < 0 || cr < 0 || ct < 0 || cb < 0) return null
    }
    // crop units (§7.4.2.1.1): chroma-dependent horizontally/vertically
    val (cropX, cropY0) =
      if (chromaFormat == 0 || separateColour == 1) (1, 1)
      else if (chromaFormat == 3) (1, 1)
      else if (chromaFormat == 2) (2, 1)
      else (2, 2) // 4:2:0
    val cropY = cropY0 * (2 - frameMbsOnly)
    // Long arithmetic: crafted near-2^30 ue values passed the reader's
    // overflow cap but would wrap Int sums here; the 16384 bound is
    // the H.264 level-limit ceiling, so anything past it is garbage
    val width = (widthMbs + 1).toLong * 16 - cropX.toLong * (cl.toLong + cr)
    val height = (2 - frameMbsOnly).toLong * (heightMapUnits + 1) * 16 -
      cropY.toLong * (ct.toLong + cb)
    if (width <= 0 || height <= 0 || width > 16384 || height > 16384) return null
    Array(width.toDouble, height.toDouble, profile.toDouble, level.toDouble)
  }

  /** Parse H.265 seq_parameter_set_rbsp (ITU-T H.265 §7.3.2.2.1):
    * `[width, height, profile_idc, level_idc]` or null. `sps`
    * includes the 2-byte NAL header (type must be 33). Same
    * Exp-Golomb machinery as the H.264 parser, different field walk:
    * profile_tier_level first (general_profile_idc u(5) + 80 fixed
    * bits to general_level_idc, then per-sub-layer presence flags),
    * then luma dimensions as ue(v) and the conformance window in
    * chroma units (Table 6-1: SubWidthC/SubHeightC).
    */
  private[ext] def parseHevcSps(sps: Array[Byte]): Array[Double] = {
    if (sps == null || sps.length < 6) return null
    if (((sps(0) >> 1) & 0x3F) != 33) return null // NAL type must be SPS
    val r = new BitReader(rbsp(sps, 2))
    r.u(4) // sps_video_parameter_set_id
    val maxSub = r.u(3)
    if (maxSub < 0) return null
    r.u(1) // sps_temporal_id_nesting_flag
    // profile_tier_level(1, maxSub) — skipped fields read in <32-bit
    // chunks so a legitimate all-ones value can't alias the -1
    // underrun sentinel on a field we'd test
    r.u(2); r.u(1) // general_profile_space, general_tier_flag
    val profile = r.u(5)
    if (profile < 0) return null
    r.u(16); r.u(16) // general_profile_compatibility_flags (32)
    r.u(22); r.u(22) // constraint + reserved bits (44)
    val level = r.u(8)
    if (level < 0) return null
    if (maxSub > 8) return null
    if (maxSub > 0) {
      val profPresent = new Array[Int](maxSub)
      val levelPresent = new Array[Int](maxSub)
      var i = 0
      while (i < maxSub) {
        profPresent(i) = r.u(1); levelPresent(i) = r.u(1); i += 1
      }
      var j = maxSub
      while (j < 8) { r.u(2); j += 1 } // reserved_zero_2bits
      i = 0
      while (i < maxSub) {
        if (profPresent(i) == 1) { r.u(22); r.u(22); r.u(22); r.u(22) } // 88 bits
        if (levelPresent(i) == 1) r.u(8)
        i += 1
      }
    }
    if (r.ue() < 0) return null // sps_seq_parameter_set_id
    val chroma = r.ue()
    if (chroma < 0 || chroma > 3) return null
    if (chroma == 3) r.u(1) // separate_colour_plane_flag
    val lumaW = r.ue()
    val lumaH = r.ue()
    if (lumaW <= 0 || lumaH <= 0) return null
    val confWin = r.u(1)
    if (confWin < 0) return null
    var cl = 0; var cr = 0; var ct = 0; var cb = 0
    if (confWin == 1) {
      cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue()
      if (cl < 0 || cr < 0 || ct < 0 || cb < 0) return null
    }
    // Table 6-1 crop units; separate-colour-plane (chroma 3 + flag)
    // is monochrome-like per plane → 1,1, which chroma == 3 yields
    val (subW, subH) = chroma match {
      case 1 => (2, 2) // 4:2:0
      case 2 => (2, 1) // 4:2:2
      case _ => (1, 1) // monochrome / 4:4:4
    }
    // Long arithmetic + level-ceiling bound, same rationale as the
    // H.264 path
    val width = lumaW.toLong - subW.toLong * (cl.toLong + cr)
    val height = lumaH.toLong - subH.toLong * (ct.toLong + cb)
    if (width <= 0 || height <= 0 || width > 16384 || height > 16384) return null
    Array(width.toDouble, height.toDouble, profile.toDouble, level.toDouble)
  }

  /** SPS NAL out of an avcC payload (AVCDecoderConfigurationRecord:
    * fixed 5-byte header, numSps in the low 5 bits of byte 5, then
    * 2-byte-length-prefixed SPS NALs — the first one is taken).
    */
  private def avccSps(b: Array[Byte], as: Long, ae: Long): Array[Byte] = {
    if (ae - as < 7) return null
    val numSps = b((as + 5).toInt) & 0x1F
    if (numSps < 1 || as + 8 > ae) return null
    val spsLen = ((b((as + 6).toInt) & 0xFF) << 8) | (b((as + 7).toInt) & 0xFF)
    if (as + 8 + spsLen > ae) return null
    java.util.Arrays.copyOfRange(b, (as + 8).toInt, (as + 8 + spsLen).toInt)
  }

  /** SPS NAL (type 33) out of an hvcC payload
    * (HEVCDecoderConfigurationRecord, ISO 14496-15 §8.3.3.1: 22 fixed
    * header bytes, then numOfArrays arrays of 2-byte-length-prefixed
    * NALs grouped by type). Bounds-checked throughout — malformed
    * lengths yield null, never a mis-sliced NAL.
    */
  private def hvccSps(b: Array[Byte], as: Long, ae: Long): Array[Byte] = {
    if (ae - as < 23) return null
    var off = as + 22
    val numArrays = b(off.toInt) & 0xFF
    off += 1
    var a = 0
    while (a < numArrays) {
      if (off + 3 > ae) return null
      val nalType = b(off.toInt) & 0x3F
      val numNalus = ((b((off + 1).toInt) & 0xFF) << 8) | (b((off + 2).toInt) & 0xFF)
      off += 3
      var n = 0
      while (n < numNalus) {
        if (off + 2 > ae) return null
        val len = ((b(off.toInt) & 0xFF) << 8) | (b((off + 1).toInt) & 0xFF)
        off += 2
        if (off + len > ae) return null
        if (nalType == 33)
          return java.util.Arrays.copyOfRange(b, off.toInt, (off + len).toInt)
        off += len
        n += 1
      }
      a += 1
    }
    null
  }

  /** The first matching video track's stbl bounds + its SPS NAL, or
    * null. `hevc = false` walks avc1/avc3 + avcC; `hevc = true` walks
    * hvc1/hev1 + hvcC.
    */
  private def findVideoStbl(b: Array[Byte], hevc: Boolean): (Long, Long, Array[Byte]) = {
    if (b == null || b.length < 16 || tag(b, 4) != "ftyp") return null
    val fourccs = if (hevc) HevcFourccs else AvcFourccs
    val cfgTag = if (hevc) "hvcC" else "avcC"
    val moov = find(b, 0, b.length, "moov").getOrElse(return null)
    children(b, moov._1, moov._2).foreach {
      case ("trak", ts, te) =>
        val found = for {
          mdia <- find(b, ts, te, "mdia")
          minf <- find(b, mdia._1, mdia._2, "minf")
          stbl <- find(b, minf._1, minf._2, "stbl")
          stsd <- find(b, stbl._1, stbl._2, "stsd")
          // stsd payload: version/flags(4) + entry_count(4), then entry boxes
          entry <- children(b, stsd._1 + 8, stsd._2)
            .find(e => fourccs.contains(e._1))
          // visual sample entry: 78 fixed bytes, then child boxes
          cfg <- find(b, entry._2 + 78, entry._3, cfgTag)
        } yield (stbl, cfg)
        found.foreach { case (stbl, (as, ae)) =>
          val sps = if (hevc) hvccSps(b, as, ae) else avccSps(b, as, ae)
          if (sps != null) return (stbl._1, stbl._2, sps)
        }
      case _ => ()
    }
    null
  }

  private def findAvcStbl(b: Array[Byte]): (Long, Long, Array[Byte]) =
    findVideoStbl(b, hevc = false)

  /** `[width, height, profile_idc, level_idc, n_samples, n_sync]` for
    * the first H.264 track — width/height are SPS-DERIVED (coded
    * size minus cropping), not the container's fields. n_sync = the
    * stss entry count, or n_samples when stss is absent (every sample
    * a sync sample, per ISO 14496-12). Null for non-BMFF payloads or
    * no parseable AVC track.
    */
  def h264MetaOrNull(bytes: Array[Byte]): Array[Double] =
    videoMetaOrNull(bytes, hevc = false)

  /** HEVC twin of [[h264MetaOrNull]]: `[width, height, profile_idc,
    * level_idc, n_samples, n_sync]` for the first hvc1/hev1 track,
    * width/height derived from the H.265 SPS (luma size minus the
    * conformance window), not the container's fields.
    */
  def hevcMetaOrNull(bytes: Array[Byte]): Array[Double] =
    videoMetaOrNull(bytes, hevc = true)

  private def videoMetaOrNull(bytes: Array[Byte], hevc: Boolean): Array[Double] = {
    val got = findVideoStbl(bytes, hevc)
    if (got == null) return null
    val (ss, se, sps) = got
    val meta = if (hevc) parseHevcSps(sps) else parseSps(sps)
    if (meta == null) return null
    var nSamples = 0L
    find(bytes, ss, se, "stsz").foreach { case (s, e) =>
      if (s + 12 <= e) nSamples = beU32(bytes, s.toInt + 8)
    }
    if (nSamples < 0 || nSamples > MaxSamples) return null
    var nSync = nSamples
    find(bytes, ss, se, "stss").foreach { case (s, e) =>
      if (s + 8 <= e) nSync = beU32(bytes, s.toInt + 4)
    }
    // same bound the nSamples path enforces — a corrupt stss count
    // must not ride out as garbage metadata
    if (nSync < 0 || nSync > MaxSamples) return null
    if (nSamples == 0) {
      // zero-sample stbl: fragmented layout — count moof samples
      val frag = fragmentSamplesOrNull(bytes, hevc, MaxSamples)
      if (frag != null) {
        nSamples = frag.length
        nSync = frag.count(_.sync)
      }
    }
    meta ++ Array(nSamples.toDouble, nSync.toDouble)
  }

  /** Absolute byte offsets of the first `maxN` sync samples
    * (keyframes) of the first AVC — or, failing that, HEVC — video
    * track, from stss composed with the stsz/stsc/stco mapping; with
    * no stss every sample is sync. The sample-table composition is
    * codec-independent, so one function serves both codecs. Null on
    * malformed tables — never wrong offsets.
    */
  def syncOffsetsOrNull(bytes: Array[Byte], maxN: Int): Array[Long] = {
    val spans = syncSpansOrNull(bytes, maxN)
    if (spans == null) null else spans.map(_._1)
  }

  /** [[syncOffsetsOrNull]] with the sample SIZE and 1-based sample
    * NUMBER alongside each offset — the exact byte span a keyframe
    * decoder must read ([[H264.mp4KeyframeLumaOrNull]] walks the
    * sample's length-prefixed NALs inside it) plus the index a
    * timestamp lookup (stts prefix sum) needs.
    */
  private[ext] def syncSpansOrNull(bytes: Array[Byte], maxN: Int): Array[(Long, Long, Long)] = {
    if (maxN < 1) return null
    val got = {
      val avc = findAvcStbl(bytes)
      if (avc != null) avc else findVideoStbl(bytes, hevc = true)
    }
    if (got == null) return null
    val stbl = spansFromStbl(bytes, got._1, got._2, maxN, syncOnly = true)
    if (stbl != null) stbl
    else {
      // zero-sample stbl = fragmented layout: walk moof/traf/trun
      val avc = fragmentSpansOrNull(bytes, hevc = false, maxN, syncOnly = true)
      if (avc != null) avc
      else fragmentSpansOrNull(bytes, hevc = true, maxN, syncOnly = true)
    }
  }

  /** ALL sample spans (offset, size, 1-based number) in decode order
    * — the GOP walk ([[H264]] inter decode) needs every sample, not
    * just the sync subset.
    */
  private[ext] def sampleSpansOrNull(bytes: Array[Byte], maxN: Int): Array[(Long, Long, Long)] = {
    if (maxN < 1) return null
    val got = findAvcStbl(bytes)
    if (got == null) return null
    val stbl = spansFromStbl(bytes, got._1, got._2, maxN, syncOnly = false)
    if (stbl != null) stbl
    else fragmentSpansOrNull(bytes, hevc = false, maxN, syncOnly = false)
  }

  // ------------------------------- fragmented MP4 (moof/traf/trun)

  /** tkhd track_ID of the first matching video track (the trak whose
    * stbl [[findVideoStbl]] selects), or −1.
    */
  private def findVideoTrackId(b: Array[Byte], hevc: Boolean): Long = {
    if (b == null || b.length < 16 || tag(b, 4) != "ftyp") return -1
    val fourccs = if (hevc) HevcFourccs else AvcFourccs
    val cfgTag = if (hevc) "hvcC" else "avcC"
    val moov = find(b, 0, b.length, "moov").getOrElse(return -1)
    children(b, moov._1, moov._2).foreach {
      case ("trak", ts, te) =>
        val ok = (for {
          mdia <- find(b, ts, te, "mdia")
          minf <- find(b, mdia._1, mdia._2, "minf")
          stbl <- find(b, minf._1, minf._2, "stbl")
          stsd <- find(b, stbl._1, stbl._2, "stsd")
          entry <- children(b, stsd._1 + 8, stsd._2)
            .find(e => fourccs.contains(e._1))
          _ <- find(b, entry._2 + 78, entry._3, cfgTag)
        } yield ()).isDefined
        if (ok) {
          find(b, ts, te, "tkhd").foreach { case (hs, he) =>
            if (hs + 4 <= he) {
              val ver = b(hs.toInt) & 0xFF
              val idOff = hs + (if (ver == 1) 20 else 12)
              if (idOff + 4 <= he) return beU32(b, idOff.toInt)
            }
          }
        }
      case _ => ()
    }
    -1
  }

  /** One fragmented sample: absolute byte span, 1-based number in
    * walk order, trun duration (0 when absent everywhere),
    * composition-time offset (signed; 0 when absent), sync flag.
    */
  private[ext] final case class FragSample(off: Long, size: Long, sn: Long,
                                           dur: Long, cts: Long, sync: Boolean)

  /** Movie-fragment sample walk (ISO 14496-12 §8.8) for FRAGMENTED
    * MP4s — the CMAF/DASH/HLS-fMP4 shape where `stbl` carries no
    * samples and media lives in moof+mdat pairs. Supported: trex
    * defaults, tfhd base_data_offset / default-base-is-moof /
    * first-traf default, per-sample and default sizes/durations/
    * flags, first_sample_flags, multiple truns per traf, multiple
    * trafs per moof (only the matching track contributes),
    * duration-is-empty trafs, tfdt (parsed, timing uses trun
    * durations — continuous-fragment assumption, validated by the
    * round-trip fixtures). Null on any malformed structure — never
    * wrong spans.
    */
  private[ext] def fragmentSamplesOrNull(b: Array[Byte], hevc: Boolean,
                                         maxN: Int): Array[FragSample] = {
    val trackId = findVideoTrackId(b, hevc)
    if (trackId < 0) return null
    fragmentSamplesForTrack(b, trackId, maxN)
  }

  /** [[fragmentSamplesOrNull]] for an EXPLICIT track id — the
    * non-video tracks (wvtt subtitle carriage) walk the same moof
    * machinery.
    */
  private[ext] def fragmentSamplesForTrack(b: Array[Byte], trackId: Long,
                                           maxN: Int): Array[FragSample] = {
    // trex defaults for this track
    var trexDur = 0L
    var trexSize = 0L
    var trexFlags = 0L
    for {
      moov <- find(b, 0, b.length, "moov")
      mvex <- find(b, moov._1, moov._2, "mvex")
    } children(b, mvex._1, mvex._2).foreach {
      case ("trex", s, e) if e - s >= 24 =>
        if (beU32(b, s.toInt + 4) == trackId) {
          trexDur = beU32(b, s.toInt + 12)
          trexSize = beU32(b, s.toInt + 16)
          trexFlags = beU32(b, s.toInt + 20)
        }
      case _ => ()
    }
    val out = new scala.collection.mutable.ArrayBuffer[FragSample]()
    // top-level walk tracking BOX starts (default-base-is-moof needs
    // the first byte of the moof box, not its payload)
    var off = 0L
    var sawMoof = false
    while (off + 8 <= b.length && out.length < maxN) {
      val size0 = beU32(b, off.toInt)
      val t = tag(b, off.toInt + 4)
      val (size, hdr) =
        if (size0 == 1 && off + 16 <= b.length) (Bmff.beU64(b, off.toInt + 8), 16L)
        else if (size0 == 0) (b.length - off, 8L)
        else (size0, 8L)
      if (size < hdr || off + size > b.length) return null
      if (t == "moof") {
        sawMoof = true
        val moofStart = off
        var firstTraf = true
        children(b, off + hdr, off + size).foreach {
          case ("traf", fs, fe) =>
            val tfhd = find(b, fs, fe, "tfhd").getOrElse(return null)
            if (fe - fs >= 0 && tfhd._2 - tfhd._1 >= 8) {
              val tfFlags = beU32(b, tfhd._1.toInt) & 0xFFFFFF
              val tid = beU32(b, tfhd._1.toInt + 4)
              val isOurs = tid == trackId
              var p = tfhd._1 + 8
              var base = 0L
              if ((tfFlags & 0x1) != 0) { // explicit base_data_offset
                if (p + 8 > tfhd._2) return null
                base = Bmff.beU64(b, p.toInt); p += 8
              } else if (firstTraf || (tfFlags & 0x20000) != 0) {
                base = moofStart // default-base-is-moof / first-traf default
              } else return null // later traf without any base
              if ((tfFlags & 0x2) != 0) p += 4 // sample_description_index
              val defDur = if ((tfFlags & 0x8) != 0) {
                if (p + 4 > tfhd._2) return null
                val v = beU32(b, p.toInt); p += 4; v
              } else trexDur
              val defSize = if ((tfFlags & 0x10) != 0) {
                if (p + 4 > tfhd._2) return null
                val v = beU32(b, p.toInt); p += 4; v
              } else trexSize
              val defFlags = if ((tfFlags & 0x20) != 0) {
                if (p + 4 > tfhd._2) return null
                val v = beU32(b, p.toInt); p += 4; v
              } else trexFlags
              if (isOurs && (tfFlags & 0x10000) == 0) { // not duration-is-empty
                var cursor = base // running data offset across truns
                children(b, fs, fe).foreach {
                  case ("trun", rs, re) =>
                    if (re - rs < 8) return null
                    val trVer = b(rs.toInt) & 0xFF
                    val trFlags = beU32(b, rs.toInt) & 0xFFFFFF
                    val n = beU32(b, rs.toInt + 4)
                    if (n < 0 || n > MaxSamples) return null
                    var q = rs + 8
                    if ((trFlags & 0x1) != 0) {
                      if (q + 4 > re) return null
                      val dataOff = beU32(b, q.toInt).toInt // SIGNED i32
                      cursor = base + dataOff
                      q += 4
                    }
                    val firstFlags =
                      if ((trFlags & 0x4) != 0) {
                        if (q + 4 > re) return null
                        val v = beU32(b, q.toInt); q += 4; v
                      } else -1L
                    var i = 0L
                    while (i < n && out.length < maxN) {
                      var dur = defDur
                      var sz = defSize
                      var fl = defFlags
                      if ((trFlags & 0x100) != 0) {
                        if (q + 4 > re) return null
                        dur = beU32(b, q.toInt); q += 4
                      }
                      if ((trFlags & 0x200) != 0) {
                        if (q + 4 > re) return null
                        sz = beU32(b, q.toInt); q += 4
                      }
                      if ((trFlags & 0x400) != 0) {
                        if (q + 4 > re) return null
                        fl = beU32(b, q.toInt); q += 4
                      } else if (i == 0 && firstFlags >= 0) fl = firstFlags
                      var cts = 0L
                      if ((trFlags & 0x800) != 0) {
                        if (q + 4 > re) return null
                        val raw = beU32(b, q.toInt)
                        // trun version 1: signed composition offsets
                        cts = if (trVer >= 1) raw.toInt.toLong else raw
                        q += 4
                      }
                      if (sz <= 0 || cursor < 0 || cursor + sz > b.length)
                        return null
                      out += FragSample(cursor, sz, out.length + 1L, dur,
                        cts, ((fl >> 16) & 1) == 0)
                      cursor += sz
                      i += 1
                    }
                  case _ => ()
                }
              }
            }
            firstTraf = false
          case _ => ()
        }
      }
      off += size
    }
    if (!sawMoof || out.isEmpty) null else out.toArray
  }

  /** Fragment-walk twins of the stbl span forms (used when the stbl
    * carries zero samples — the fMP4 signature).
    */
  private[ext] def fragmentSpansOrNull(bytes: Array[Byte], hevc: Boolean,
                                       maxN: Int, syncOnly: Boolean)
      : Array[(Long, Long, Long)] = {
    val all = fragmentSamplesOrNull(bytes, hevc, if (syncOnly) MaxSamples else maxN)
    if (all == null) return null
    val picked = if (syncOnly) all.filter(_.sync).take(maxN) else all
    if (picked.isEmpty) null else picked.map(s => (s.off, s.size, s.sn))
  }

  /** Per-sample (duration, composition-offset) pairs of the
    * fragmented video track (for stts/ctts-less fMP4 timing), or
    * null.
    */
  private[ext] def fragmentTimingOrNull(bytes: Array[Byte])
      : (Array[Long], Array[Long]) = {
    val all = fragmentSamplesOrNull(bytes, hevc = false, MaxSamples)
    if (all == null) null else (all.map(_.dur), all.map(_.cts))
  }

  // ------------------ subtitle carriage (ISO 14496-30: wvtt + stpp)

  /** Subtitle cues carried INSIDE an MP4 — BOTH ISO 14496-30
    * carriages:
    *
    *  - `wvtt` (WebVTT, the CMAF/HLS caption shape): samples are box
    *    sequences — each `vttc` child's `payl` box holds one cue's
    *    text, `vtte` marks empty intervals — and cue TIMING is the
    *    SAMPLE timing (stts in the classic layout, trun durations in
    *    fragments; the continuous-fragment assumption as elsewhere);
    *  - `stpp` (TTML/IMSC1, what DASH/CMAF broadcast streams carry):
    *    each sample is a complete TTML document whose `<p begin/end>`
    *    attributes ARE the cue timing on the media timeline
    *    ([[Subtitles.ttmlCuesOrNull]] subset), the sample span only
    *    scoping document activity.
    *
    * Returns (start_ms, end_ms, cleaned text) rows in track order, or
    * null when no subtitle track parses. Tag/entity cleaning is the
    * [[Subtitles]] contract, so in-container and standalone cues land
    * identically.
    */
  def mp4SubtitleCuesOrNull(bytes: Array[Byte], maxN: Int): Array[(Long, Long, String)] = {
    try {
      if (maxN < 1 || bytes == null || bytes.length < 16 ||
        tag(bytes, 4) != "ftyp") return null
      val moov = find(bytes, 0, bytes.length, "moov").getOrElse(return null)
      var stbl: (Long, Long) = null
      var timescale = 0L
      var trackId = -1L
      var isTtml = false
      children(bytes, moov._1, moov._2).foreach {
        case ("trak", ts, te) if stbl == null =>
          val got = for {
            mdia <- find(bytes, ts, te, "mdia")
            minf <- find(bytes, mdia._1, mdia._2, "minf")
            sb <- find(bytes, minf._1, minf._2, "stbl")
            stsd <- find(bytes, sb._1, sb._2, "stsd")
            entry <- children(bytes, stsd._1 + 8, stsd._2)
              .find(e => e._1 == "wvtt" || e._1 == "stpp")
          } yield (sb, mdia, entry._1)
          got.foreach { case (sb, mdia, fourcc) =>
            stbl = sb
            isTtml = fourcc == "stpp"
            timescale = find(bytes, mdia._1, mdia._2, "mdhd")
              .map { case (ms, me) => Bmff.headerTimescale(bytes, ms, me) }
              .getOrElse(0L)
            find(bytes, ts, te, "tkhd").foreach { case (hs, he) =>
              if (hs + 4 <= he) {
                val ver = bytes(hs.toInt) & 0xFF
                val idOff = hs + (if (ver == 1) 20 else 12)
                if (idOff + 4 <= he) trackId = beU32(bytes, idOff.toInt)
              }
            }
          }
        case _ => ()
      }
      if (stbl == null || timescale <= 0) return null
      // sample spans + durations: stbl tables, falling through to the
      // fragment walk when the stbl carries zero samples
      var spans = spansFromStbl(bytes, stbl._1, stbl._2, maxN, syncOnly = false)
      var durations: Array[Long] = Bmff.sttsDurations(bytes, stbl._1, stbl._2)
      if (spans == null && trackId >= 0) {
        val frag = fragmentSamplesForTrack(bytes, trackId, maxN)
        if (frag != null) {
          spans = frag.map(f => (f.off, f.size, f.sn))
          durations = frag.map(_.dur)
        }
      }
      if (spans == null || spans.isEmpty || durations == null) return null
      val prefix = new Array[Long](durations.length + 1)
      var i = 0
      while (i < durations.length) {
        prefix(i + 1) = prefix(i) + durations(i); i += 1
      }
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
      spans.foreach { case (off, size, sn) =>
        if (sn >= 1 && sn <= durations.length && off >= 0 &&
            off + size <= bytes.length && out.length < maxN) {
          if (isTtml) {
            // stpp: the sample is a TTML document carrying its own
            // cue timing
            val doc = new String(bytes, off.toInt, size.toInt, "UTF-8")
            val cues = Subtitles.ttmlCuesOrNull(doc)
            if (cues != null) cues.foreach { c =>
              if (out.length < maxN) out += ((c.startMs, c.endMs, c.text))
            }
          } else {
            val t0 = 1000L * prefix((sn - 1).toInt) / timescale
            val t1 = 1000L * prefix(sn.toInt) / timescale
            // the sample is a sequence of boxes: vttc(payl) / vtte
            children(bytes, off, off + size).foreach {
              case ("vttc", cs, ce) =>
                find(bytes, cs, ce, "payl").foreach { case (ps, pe) =>
                  val raw = new String(bytes, ps.toInt, (pe - ps).toInt, "UTF-8")
                  out += ((t0, t1, Subtitles.cleanText(raw)))
                }
              case _ => () // vtte (empty) and unknown boxes skip
            }
          }
        }
      }
      if (out.isEmpty) null else out.toArray
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  private def spansFromStbl(bytes: Array[Byte], ss: Long, se: Long,
                            maxN: Int, syncOnly: Boolean): Array[(Long, Long, Long)] = {
    var sizes: Array[Long] = null
    var chunkOffsets: Array[Long] = null
    var stsc: Array[(Long, Long)] = null
    find(bytes, ss, se, "stsz").foreach { case (s, e) =>
      if (s + 12 <= e) {
        val const = beU32(bytes, s.toInt + 4)
        val n = beU32(bytes, s.toInt + 8)
        if (n >= 1 && n <= MaxSamples) {
          if (const != 0) sizes = Array.fill(n.toInt)(const)
          else if (s + 12 + 4L * n <= e)
            sizes = Array.tabulate(n.toInt)(i => beU32(bytes, (s + 12 + 4L * i).toInt))
        }
      }
    }
    find(bytes, ss, se, "stsc").foreach { case (s, e) =>
      if (s + 8 <= e) {
        val n = beU32(bytes, s.toInt + 4)
        if (n >= 1 && n <= MaxChunks && s + 8 + 12L * n <= e)
          stsc = Array.tabulate(n.toInt) { i =>
            val o = (s + 8 + 12L * i).toInt
            (beU32(bytes, o), beU32(bytes, o + 4))
          }
      }
    }
    find(bytes, ss, se, "stco").foreach { case (s, e) =>
      if (s + 8 <= e) {
        val n = beU32(bytes, s.toInt + 4)
        if (n >= 1 && n <= MaxChunks && s + 8 + 4L * n <= e)
          chunkOffsets = Array.tabulate(n.toInt)(i => beU32(bytes, (s + 8 + 4L * i).toInt))
      }
    }
    if (chunkOffsets == null) find(bytes, ss, se, "co64").foreach { case (s, e) =>
      if (s + 8 <= e) {
        val n = beU32(bytes, s.toInt + 4)
        if (n >= 1 && n <= MaxChunks && s + 8 + 8L * n <= e)
          chunkOffsets = Array.tabulate(n.toInt)(i => Bmff.beU64(bytes, (s + 8 + 8L * i).toInt))
      }
    }
    val offsets = Bmff.sampleOffsets(sizes, chunkOffsets, stsc)
    if (offsets == null) return null
    // sync sample numbers (1-based) from stss; absent → every sample
    var syncNums: Array[Long] = null
    find(bytes, ss, se, "stss").foreach { case (s, e) =>
      if (s + 8 <= e) {
        val n = beU32(bytes, s.toInt + 4)
        if (n >= 0 && n <= MaxSamples && s + 8 + 4L * n <= e)
          syncNums = Array.tabulate(n.toInt)(i => beU32(bytes, (s + 8 + 4L * i).toInt))
      }
    }
    if (syncNums == null || !syncOnly)
      syncNums = Array.tabulate(offsets.length)(i => (i + 1).toLong)
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var i = 0
    while (i < syncNums.length && out.length < maxN) {
      val sn = syncNums(i)
      if (sn < 1 || sn > offsets.length) return null // corrupt stss
      out += ((offsets((sn - 1).toInt), sizes((sn - 1).toInt), sn))
      i += 1
    }
    out.toArray
  }
}
