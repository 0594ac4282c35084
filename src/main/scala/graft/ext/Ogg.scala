package graft.ext

/** Ogg container walker (RFC 3533) with Vorbis and Opus header
  * parsing — the VALIDATED counterpart of [[MediaMeta]]'s triage
  * heuristic (which scans unverified bytes and never checks CRCs;
  * this walker verifies every page CRC, reassembles packets across
  * page boundaries via the continuation flag, and parses the
  * identification + comment headers of the two codecs that dominate
  * web audio in Ogg). This walker's scope stops at the comment
  * header; the full Vorbis SAMPLE decode lives in [[VorbisDecode]]
  * (shipped round 10 — Huffman → floor → residue → coupling → IMDCT
  * → overlap-add), fed by the packet streams this walker reassembles.
  * Opus sample decode (SILK/CELT synthesis) remains deferred — see
  * the BENCH_NOTES round-11 scoping probe.
  *
  * Parsing is bounded and total: every read is range-checked, any
  * structural violation (bad magic, version ≠ 0, CRC mismatch,
  * truncated lacing, missing headers) nulls the whole walk — the
  * [[MediaMeta]] contract. Grouped (multiplexed) streams null loudly:
  * a second serial number is a structure this walker does not guess
  * at.
  *
  * CRC: the Ogg CRC-32 — polynomial 0x04C11DB7, init 0, no
  * reflection, no final xor, computed over the page with the CRC
  * field zeroed (RFC 3533 §6). OggSpec cross-checks the table-driven
  * form here against an independent bitwise implementation.
  */
object Ogg {

  /** One validated page (payload is a view: offset + length). */
  final case class Page(headerType: Int, granule: Long, serial: Long,
                        seq: Long, segs: Array[Int],
                        payloadOff: Int, payloadLen: Int)

  /** Codec-tagged stream metadata from the header packets.
    * `preSkip` is 0 for Vorbis; `rate` is the Vorbis sample rate or
    * the Opus INPUT sample rate (Opus granules are always 48 kHz —
    * duration accounting uses [[granuleRate]]).
    */
  final case class Meta(codec: String, channels: Int, rate: Long,
                        preSkip: Int, nPages: Int, nPackets: Int,
                        lastGranule: Long, vendor: String,
                        comments: Array[(String, String)],
                        audioBytes: Long) {
    def granuleRate: Long = if (codec == "opus") 48000L else rate
  }

  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04C11DB7 else r << 1
        k += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  /** Ogg CRC-32 of `b[off, off+len)` with the 4 bytes at `zeroAt`
    * treated as zero (the in-header CRC field).
    */
  private[graft] def crc(b: Array[Byte], off: Int, len: Int, zeroAt: Int): Int = {
    var r = 0
    var i = off
    val end = off + len
    while (i < end) {
      val byte = if (i >= zeroAt && i < zeroAt + 4) 0 else b(i) & 0xFF
      r = (r << 8) ^ CrcTable(((r >>> 24) ^ byte) & 0xFF)
      i += 1
    }
    r
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
  private def le64(b: Array[Byte], o: Int): Long = {
    var g = 0L
    var i = 7
    while (i >= 0) { g = (g << 8) | (b(o + i) & 0xFFL); i -= 1 }
    g
  }

  /** Walk every page, verifying structure and CRC; null when the
    * bytes are not one whole single-stream Ogg container (trailing
    * garbage after the last page is a violation here, unlike MP3's
    * tag-tolerant walk — Ogg defines its own end via EOS).
    */
  def pagesOrNull(b: Array[Byte]): Array[Page] = {
    try {
      if (b == null || b.length < 28) return null
      val pages = scala.collection.mutable.ArrayBuffer.empty[Page]
      var off = 0
      var serial = -1L
      while (off < b.length) {
        if (off + 27 > b.length) return null
        if (!(b(off) == 'O' && b(off + 1) == 'g' && b(off + 2) == 'g' &&
              b(off + 3) == 'S')) return null
        if (b(off + 4) != 0) return null // stream_structure_version
        val htype = b(off + 5) & 0xFF
        if (htype > 7) return null
        val granule = le64(b, off + 6)
        val ser = le32(b, off + 14)
        if (serial < 0) serial = ser
        else if (ser != serial) return null // grouped stream: refuse
        val seq = le32(b, off + 18)
        val nSegs = b(off + 26) & 0xFF
        if (off + 27 + nSegs > b.length) return null
        val segs = new Array[Int](nSegs)
        var payloadLen = 0
        var i = 0
        while (i < nSegs) {
          segs(i) = b(off + 27 + i) & 0xFF
          payloadLen += segs(i)
          i += 1
        }
        val pageLen = 27 + nSegs + payloadLen
        if (off + pageLen > b.length) return null
        val stored = le32(b, off + 22).toInt
        if (crc(b, off, pageLen, off + 22) != stored) return null
        pages += Page(htype, granule, ser, seq, segs,
          off + 27 + nSegs, payloadLen)
        off += pageLen
      }
      if (pages.isEmpty) return null
      if ((pages.last.headerType & 0x04) == 0) return null // no EOS
      pages.toArray
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** Reassemble the logical packet stream: lacing values < 255 end a
    * packet; a page whose first lacing continues the previous page's
    * unterminated packet carries the continuation flag (0x01) —
    * verified, not assumed. A final unterminated packet is a
    * truncation → null.
    */
  def packetsOrNull(b: Array[Byte]): Array[Array[Byte]] = {
    val pages = pagesOrNull(b)
    if (pages == null) return null
    packetsFrom(b, pages)
  }

  /** [[packetsOrNull]] over an already-validated page walk (so
    * [[metaOrNull]] walks the container exactly once). Two passes:
    * lengths first, then exact-size arrays filled by arraycopy — no
    * per-packet stream buffers (the walk is a per-row hot kernel in
    * q138–q140).
    */
  private[graft] def packetsFrom(b: Array[Byte], pages: Array[Page]): Array[Array[Byte]] = {
    try {
      // pass 1: packet count + lengths, verifying continuation flags
      var nPackets = 0
      var curLen = 0
      var open = false
      var pi = 0
      while (pi < pages.length) {
        val p = pages(pi)
        if (((p.headerType & 0x01) != 0) != open) return null
        var si = 0
        while (si < p.segs.length) {
          val s = p.segs(si)
          curLen += s
          if (s < 255) { nPackets += 1; curLen = 0; open = false }
          else open = true
          si += 1
        }
        pi += 1
      }
      if (open) return null // truncated final packet
      val packets = new Array[Array[Byte]](nPackets)
      // pass 2: sizes, then fill
      var k = 0
      curLen = 0
      pi = 0
      while (pi < pages.length) {
        val segs = pages(pi).segs
        var si = 0
        while (si < segs.length) {
          curLen += segs(si)
          if (segs(si) < 255) {
            packets(k) = new Array[Byte](curLen)
            k += 1
            curLen = 0
          }
          si += 1
        }
        pi += 1
      }
      var fill = 0 // bytes already placed in packets(k)
      k = 0
      pi = 0
      while (pi < pages.length) {
        val p = pages(pi)
        var pos = p.payloadOff
        var si = 0
        while (si < p.segs.length) {
          val s = p.segs(si)
          System.arraycopy(b, pos, packets(k), fill, s)
          pos += s
          fill += s
          if (s < 255) { k += 1; fill = 0 }
          si += 1
        }
        pi += 1
      }
      packets
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** Parse the Vorbis-style comment block at `p[off..)`:
    * vendor string + user comments (`KEY=value`, key case-preserved
    * here — normalization is the caller's policy).
    */
  private def commentsOrNull(p: Array[Byte], off0: Int): (String, Array[(String, String)]) = {
    var off = off0
    if (off + 4 > p.length) return null
    val vlen = le32(p, off).toInt
    off += 4
    if (vlen < 0 || off + vlen > p.length) return null
    val vendor = new String(p, off, vlen, "UTF-8")
    off += vlen
    if (off + 4 > p.length) return null
    val n = le32(p, off).toInt
    off += 4
    if (n < 0 || n > 10000) return null
    val out = new Array[(String, String)](n)
    var i = 0
    while (i < n) {
      if (off + 4 > p.length) return null
      val clen = le32(p, off).toInt
      off += 4
      if (clen < 0 || off + clen > p.length) return null
      val s = new String(p, off, clen, "UTF-8")
      off += clen
      val eq = s.indexOf('=')
      if (eq < 0) return null
      out(i) = (s.substring(0, eq), s.substring(eq + 1))
      i += 1
    }
    (vendor, out)
  }

  private def startsWith(p: Array[Byte], s: String, off: Int): Boolean =
    p.length >= off + s.length &&
      (0 until s.length).forall(i => p(off + i) == s.charAt(i).toByte)

  /** Full validated metadata: pages walked and CRC-checked, packets
    * reassembled, identification + comment headers parsed. Null for
    * anything that is not a well-formed single-stream Ogg Vorbis or
    * Ogg Opus container.
    */
  def metaOrNull(b: Array[Byte]): Meta = {
    try {
      val pages = pagesOrNull(b)
      if (pages == null) return null
      if ((pages.head.headerType & 0x02) == 0) return null // no BOS
      val packets = packetsFrom(b, pages)
      if (packets == null || packets.length < 2) return null
      def audioBytes(nHeader: Int): Long = {
        var s = 0L
        var i = nHeader
        while (i < packets.length) { s += packets(i).length; i += 1 }
        s
      }
      val id = packets(0)
      if (id.length >= 30 && id(0) == 1 && startsWith(id, "vorbis", 1)) {
        if (le32(id, 7) != 0L) return null // vorbis_version
        val ch = id(11) & 0xFF
        val rate = le32(id, 12)
        if (ch < 1 || rate <= 0) return null
        if ((id(29) & 1) != 1) return null // framing bit
        val cm = packets(1)
        if (!(cm.length >= 7 && cm(0) == 3 && startsWith(cm, "vorbis", 1)))
          return null
        val c = commentsOrNull(cm, 7)
        if (c == null) return null
        // a complete Vorbis header triple includes the setup packet
        if (packets.length < 3 || packets(2).length < 7 ||
            packets(2)(0) != 5 || !startsWith(packets(2), "vorbis", 1))
          return null
        Meta("vorbis", ch, rate, 0, pages.length, packets.length,
          pages.last.granule, c._1, c._2, audioBytes(3))
      } else if (startsWith(id, "OpusHead", 0)) {
        if (id.length < 19) return null
        if ((id(8) & 0xF0) != 0) return null // major version 0
        val ch = id(9) & 0xFF
        val preSkip = le16(id, 10)
        val rate = le32(id, 12)
        if (ch < 1) return null
        val cm = packets(1)
        if (!startsWith(cm, "OpusTags", 0)) return null
        val c = commentsOrNull(cm, 8)
        if (c == null) return null
        Meta("opus", ch, rate, preSkip, pages.length, packets.length,
          pages.last.granule, c._1, c._2, audioBytes(2))
      } else null
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }
}
