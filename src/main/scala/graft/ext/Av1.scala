package graft.ext

import scala.util.control.NonFatal

/** AV1 metadata triage — the `av1C` configuration record and the
  * sequence-header OBU (AV1 Bitstream & Decoding Process Spec §5.5 +
  * the AV1-in-ISOBMFF binding §2.3): profile / level / tier /
  * dimensions / bit depth / monochrome for MP4 `av01` tracks and WebM
  * `V_AV1` tracks — dimensions-and-profile parity with the shipped
  * avcC/hvcC walks (round-13 verdict item 4). A bounded bit walk, no
  * frame decode; malformed input nulls, never throws.
  */
object Av1 {

  /** meta row: [width, height, profile, level, tier, bit_depth,
    * monochrome]
    */
  final val MetaLen = 7

  private final class Bits(b: Array[Byte], var pos: Int, end: Int) {
    private var bit = 0
    def f(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= end) sys.error("obu overrun")
        v = (v << 1) | ((b(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def uvlc(): Long = {
      var leading = 0
      while (f(1) == 0) {
        leading += 1
        if (leading > 32) sys.error("uvlc overrun")
      }
      if (leading == 0) 0L
      else (1L << leading) - 1 + f(leading)
    }
  }

  private def leb128(b: Array[Byte], pos0: Int, end: Int): (Long, Int) = {
    var v = 0L
    var pos = pos0
    var i = 0
    var done = false
    while (!done && i < 8) {
      if (pos >= end) sys.error("leb128 overrun")
      val byte = b(pos) & 0xFF
      v |= (byte & 0x7FL) << (7 * i)
      pos += 1
      i += 1
      done = (byte & 0x80) == 0
    }
    if (!done) sys.error("leb128 too long")
    (v, pos)
  }

  /** parse a SEQUENCE HEADER OBU payload (header already consumed):
    * returns the meta row or errors
    */
  private def parseSequenceHeader(b: Array[Byte], off: Int, end: Int): Array[Double] = {
    val r = new Bits(b, off, end)
    val profile = r.f(3)
    if (profile > 2) sys.error("bad seq_profile")
    r.f(1) // still_picture
    val reduced = r.f(1) == 1
    var level = 0
    var tier = 0
    var decoderModel = false
    var bufferDelayLen = 0
    if (reduced) {
      level = r.f(5)
    } else {
      val timingPresent = r.f(1) == 1
      if (timingPresent) {
        r.f(32); r.f(32) // num_units_in_display_tick, time_scale
        if (r.f(1) == 1) r.uvlc() // equal_picture_interval → num_ticks
        decoderModel = r.f(1) == 1
        if (decoderModel) {
          bufferDelayLen = r.f(5) + 1
          r.f(32) // num_units_in_decoding_tick
          r.f(5); r.f(5) // removal/presentation time lengths
        }
      }
      val initialDisplayDelay = r.f(1) == 1
      val nOps = r.f(5) + 1
      var i = 0
      while (i < nOps) {
        r.f(12) // operating_point_idc
        val l = r.f(5)
        if (i == 0) level = l
        val t = if (l > 7) r.f(1) else 0
        if (i == 0) tier = t
        if (decoderModel && r.f(1) == 1) {
          // operating_parameters_info: two delays + low_delay_mode
          r.f(bufferDelayLen); r.f(bufferDelayLen); r.f(1)
        }
        if (initialDisplayDelay && r.f(1) == 1) r.f(4)
        i += 1
      }
    }
    val wBits = r.f(4) + 1
    val hBits = r.f(4) + 1
    val width = r.f(wBits) + 1
    val height = r.f(hBits) + 1
    if (!reduced && r.f(1) == 1) { // frame_id_numbers_present
      r.f(4); r.f(3) // delta_frame_id_length, additional_frame_id_length
    }
    r.f(1) // use_128x128_superblock
    r.f(1); r.f(1) // enable_filter_intra, enable_intra_edge_filter
    var orderHintBits = 0
    if (!reduced) {
      r.f(1); r.f(1) // interintra_compound, masked_compound
      r.f(1); r.f(1) // warped_motion, dual_filter
      val orderHint = r.f(1) == 1
      if (orderHint) { r.f(1); r.f(1) } // jnt_comp, ref_frame_mvs
      val forceScreen = if (r.f(1) == 1) 2 else r.f(1)
      if (forceScreen > 0) { if (r.f(1) == 0) r.f(1) } // choose/force integer mv
      if (orderHint) orderHintBits = r.f(3) + 1
    }
    r.f(1); r.f(1); r.f(1) // enable_superres, cdef, restoration
    // color_config
    val high = r.f(1) == 1
    val twelve = if (profile == 2 && high) r.f(1) == 1 else false
    val bitDepth = if (profile == 2 && high) { if (twelve) 12 else 10 }
      else if (high) 10 else 8
    val mono = if (profile == 1) 0 else r.f(1)
    Array(width.toDouble, height.toDouble, profile.toDouble,
      level.toDouble, tier.toDouble, bitDepth.toDouble, mono.toDouble)
  }

  /** find + parse the sequence-header OBU inside a raw OBU stream
    * (an av1C record's configOBUs, or a temporal unit)
    */
  private def seqHeaderFromObus(b: Array[Byte], off0: Int, end: Int): Array[Double] = {
    var pos = off0
    var guard = 0
    while (pos < end && guard < 64) {
      guard += 1
      val h = b(pos) & 0xFF
      if ((h & 0x80) != 0) sys.error("obu forbidden bit")
      val typ = (h >> 3) & 0xF
      val hasExt = (h & 4) != 0
      val hasSize = (h & 2) != 0
      var p = pos + 1
      if (hasExt) p += 1
      val (size, pAfter) =
        if (hasSize) leb128(b, p, end)
        else ((end - p).toLong, p)
      if (size < 0 || pAfter + size > end) sys.error("obu size overrun")
      if (typ == 1) // OBU_SEQUENCE_HEADER
        return parseSequenceHeader(b, pAfter, pAfter + size.toInt)
      pos = pAfter + size.toInt
    }
    sys.error("no sequence header obu")
  }

  /** meta from an AV1CodecConfigurationRecord (`av1C` payload /
    * WebM V_AV1 CodecPrivate)
    */
  private def fromAv1c(b: Array[Byte], off: Int, end: Int): Array[Double] = {
    if (end - off < 4) sys.error("short av1C")
    if ((b(off) & 0xFF) != 0x81) sys.error("bad av1C marker/version")
    seqHeaderFromObus(b, off + 4, end)
  }

  /** MP4: first `av01` sample entry's `av1C` → sequence-header meta,
    * or null
    */
  def mp4MetaOrNull(bytes: Array[Byte]): Array[Double] = {
    try {
      if (bytes == null || bytes.length < 16 || Bmff.tag(bytes, 4) != "ftyp")
        return null
      val moov = Bmff.find(bytes, 0, bytes.length, "moov").getOrElse(return null)
      Bmff.children(bytes, moov._1, moov._2).foreach {
        case ("trak", ts, te) =>
          val found = for {
            mdia <- Bmff.find(bytes, ts, te, "mdia")
            minf <- Bmff.find(bytes, mdia._1, mdia._2, "minf")
            stbl <- Bmff.find(bytes, minf._1, minf._2, "stbl")
            stsd <- Bmff.find(bytes, stbl._1, stbl._2, "stsd")
            entry <- Bmff.children(bytes, stsd._1 + 8, stsd._2)
              .find(_._1 == "av01")
            cfg <- Bmff.find(bytes, entry._2 + 78, entry._3, "av1C")
          } yield cfg
          found.foreach { case (cs, ce) =>
            return fromAv1c(bytes, cs.toInt, ce.toInt)
          }
        case _ => ()
      }
      null
    } catch { case NonFatal(_) => null }
  }

  /** AVIF still (AV1-in-HEIF): the `meta` FULLBOX → `iprp` → `ipco`
    * property container holds the `av1C` record (beside `ispe`).
    * Triage fields come from the sequence-header OBU, same as the
    * track carriages.
    */
  def avifMetaOrNull(bytes: Array[Byte]): Array[Double] = {
    try {
      if (bytes == null || bytes.length < 16 || Bmff.tag(bytes, 4) != "ftyp")
        return null
      val meta = Bmff.find(bytes, 0, bytes.length, "meta").getOrElse(return null)
      // meta is a FULL box: 4 version/flags bytes precede its children
      val found = for {
        iprp <- Bmff.find(bytes, meta._1 + 4, meta._2, "iprp")
        ipco <- Bmff.find(bytes, iprp._1, iprp._2, "ipco")
        cfg <- Bmff.find(bytes, ipco._1, ipco._2, "av1C")
      } yield cfg
      found.map { case (cs, ce) => fromAv1c(bytes, cs.toInt, ce.toInt) }.orNull
    } catch { case NonFatal(_) => null }
  }

  /** WebM: first V_AV1 track's CodecPrivate (an av1C record) →
    * sequence-header meta, or null
    */
  def webmMetaOrNull(bytes: Array[Byte]): Array[Double] = {
    try {
      val cp = Webm.codecPrivateOrNull(bytes, "V_AV1")
      if (cp == null) null else fromAv1c(cp, 0, cp.length)
    } catch { case NonFatal(_) => null }
  }

  /** container-routed: EBML → WebM walk; BMFF → the `av01` track walk,
    * falling through to the AVIF-still item walk
    */
  def metaOrNull(bytes: Array[Byte]): Array[Double] = {
    if (bytes == null || bytes.length < 12) return null
    if ((bytes(0) & 0xFF) == 0x1A && (bytes(1) & 0xFF) == 0x45 &&
        (bytes(2) & 0xFF) == 0xDF && (bytes(3) & 0xFF) == 0xA3)
      return webmMetaOrNull(bytes)
    val track = mp4MetaOrNull(bytes)
    if (track != null) track else avifMetaOrNull(bytes)
  }
}
