package graft.ext

/** Deterministic AV1 fixture corpus for q172 (the Mp4Spec bit-writer
  * discipline): a sequence-header OBU written bit-exactly from
  * doc_id arithmetic, wrapped in an av1C record and carried in an MP4
  * `av01` sample entry, a WebM `V_AV1` CodecPrivate, or an AVIF
  * still's `ipco` (rotating by id % 3). Every meta field is a closed
  * form the oracle SQL mirrors — carriage-independent, so one oracle
  * covers all three walks.
  *
  * Closed forms: profile = id%3; reduced header iff id%7 == 0;
  * level = id%12; tier = (id/3)%2 when level > 7 and not reduced;
  * width = 160 + 16·(id%20); height = 90 + 10·(id%15);
  * high_bitdepth = (id/2)%2; twelve_bit iff profile 2 ∧ high ∧
  * id%4 == 3; monochrome iff profile ≠ 1 ∧ id%5 == 0.
  */
object Av1Fixtures {

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
    def bytes: Array[Byte] = {
      if (n > 0) { out.write(cur << (8 - n)); cur = 0; n = 0 }
      out.toByteArray
    }
  }

  def profile(id: Long): Int = (id % 3).toInt
  def reduced(id: Long): Boolean = id % 7 == 0
  def level(id: Long): Int = (id % 12).toInt
  def tier(id: Long): Int =
    if (level(id) > 7 && !reduced(id)) ((id / 3) % 2).toInt else 0
  def width(id: Long): Int = 160 + 16 * (id % 20).toInt
  def height(id: Long): Int = 90 + 10 * (id % 15).toInt
  def highBitdepth(id: Long): Boolean = (id / 2) % 2 == 1
  def twelveBit(id: Long): Boolean =
    profile(id) == 2 && highBitdepth(id) && id % 4 == 3
  def bitDepth(id: Long): Int =
    if (profile(id) == 2 && highBitdepth(id)) { if (twelveBit(id)) 12 else 10 }
    else if (highBitdepth(id)) 10 else 8
  def mono(id: Long): Int =
    if (profile(id) != 1 && id % 5 == 0) 1 else 0

  /** the sequence-header OBU payload (spec §5.5 bit order) */
  def seqHeaderPayload(id: Long): Array[Byte] = {
    val w = new Bw
    val p = profile(id)
    w.f(p, 3)
    w.f(0, 1) // still_picture
    val red = reduced(id)
    w.f(if (red) 1 else 0, 1)
    if (red) w.f(level(id), 5)
    else {
      w.f(0, 1) // timing_info_present
      w.f(0, 1) // initial_display_delay_present
      w.f(0, 5) // operating_points_cnt_minus_1
      w.f(0, 12) // operating_point_idc[0]
      w.f(level(id), 5)
      if (level(id) > 7) w.f(tier(id), 1)
    }
    val wd = width(id); val ht = height(id)
    val wBits = 32 - Integer.numberOfLeadingZeros(wd - 1)
    val hBits = 32 - Integer.numberOfLeadingZeros(ht - 1)
    w.f(wBits - 1, 4); w.f(hBits - 1, 4)
    w.f(wd - 1, wBits); w.f(ht - 1, hBits)
    if (!red) w.f(0, 1) // frame_id_numbers_present
    w.f(1, 1) // use_128x128_superblock
    w.f(0, 1); w.f(0, 1) // filter_intra, intra_edge_filter
    if (!red) {
      w.f(0, 1); w.f(0, 1) // interintra, masked_compound
      w.f(0, 1); w.f(0, 1) // warped_motion, dual_filter
      w.f(0, 1) // enable_order_hint
      w.f(1, 1) // seq_choose_screen_content_tools → SELECT
      w.f(1, 1) // seq_choose_integer_mv → SELECT
    }
    w.f(0, 1); w.f(0, 1); w.f(0, 1) // superres, cdef, restoration
    // color_config
    val high = highBitdepth(id)
    w.f(if (high) 1 else 0, 1)
    if (p == 2 && high) w.f(if (twelveBit(id)) 1 else 0, 1)
    if (p != 1) w.f(mono(id), 1)
    w.f(0, 1) // color_description_present
    if (mono(id) == 1) {
      w.f(1, 1) // color_range
    } else {
      w.f(1, 1) // color_range
      if (p == 2) {
        if (bitDepth(id) == 12) { w.f(1, 1); w.f(1, 1) } // subsampling 4:2:0
        // else fixed 4:2:2 — nothing coded
      }
      // chroma_sample_position when subsampling_x && subsampling_y
      if (p == 0 || (p == 2 && bitDepth(id) == 12)) w.f(0, 2)
      w.f(0, 1) // separate_uv_delta_q
    }
    w.f(0, 1) // film_grain_params_present
    w.bytes
  }

  private def leb128(v: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var x = v
    var done = false
    while (!done) {
      val b = (x & 0x7F).toInt
      x >>>= 7
      if (x == 0) { out.write(b); done = true } else out.write(b | 0x80)
    }
    out.toByteArray
  }

  /** the av1C configuration record (binding §2.3) with the OBU in
    * configOBUs
    */
  def av1c(id: Long): Array[Byte] = {
    val payload = seqHeaderPayload(id)
    val obu = Array[Byte](0x0A) ++ leb128(payload.length.toLong) ++ payload
    val b1 = ((profile(id) << 5) | level(id)).toByte
    val high = if (highBitdepth(id)) 1 else 0
    val b2 = ((tier(id) << 7) | (high << 6) |
      ((if (twelveBit(id)) 1 else 0) << 5) | (mono(id) << 4)).toByte
    Array[Byte](0x81.toByte, b1, b2, 0) ++ obu
  }

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def box(tag: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(body.length + 8L) ++ tag.getBytes("US-ASCII") ++ body
  }

  /** minimal MP4 carrying an `av01` sample entry with the av1C box */
  def mp4(id: Long): Array[Byte] = {
    val entry = box("av01", new Array[Byte](78), box("av1C", av1c(id)))
    val stsd = box("stsd", be32(0), be32(1), entry)
    val stbl = box("stbl", stsd,
      box("stsz", be32(0), be32(0), be32(0)),
      box("stco", be32(0), be32(0)))
    val mdia = box("mdia", box("minf", stbl))
    box("ftyp", "isom".getBytes, be32(0x200), "av01iso2".getBytes) ++
      box("moov", box("trak", mdia))
  }

  /** WebM carrying a V_AV1 track whose CodecPrivate is the av1C */
  def webm(id: Long): Array[Byte] =
    WebmFixtures.av1Webm(av1c(id), width(id), height(id))

  /** AVIF still: HEIF `meta` FULLBOX → `iprp` → `ipco` holding
    * `ispe` + the av1C (the crawl-dominant AV1 carriage for images)
    */
  def avif(id: Long): Array[Byte] = {
    val ispe = box("ispe", be32(0), be32(width(id).toLong), be32(height(id).toLong))
    val ipco = box("ipco", ispe, box("av1C", av1c(id)))
    val meta = box("meta", be32(0), // FULL box version/flags
      box("hdlr", be32(0), be32(0), "pict".getBytes("US-ASCII"),
        new Array[Byte](12)),
      box("iprp", ipco))
    box("ftyp", "avif".getBytes, be32(0), "avifmif1".getBytes) ++ meta
  }

  /** the q172 corpus: carriage rotates MP4 track / WebM / AVIF still */
  def doc(id: Long): Array[Byte] = (id % 3) match {
    case 0 => mp4(id)
    case 1 => webm(id)
    case _ => avif(id)
  }
}
