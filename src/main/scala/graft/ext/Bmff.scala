package graft.ext

/** Shared ISO BMFF (MP4/QuickTime) box-walk helpers for the container
  * readers ([[Mjpeg]] frame extraction, [[Avc]] H.264 metadata): big-
  * endian reads, child-box enumeration, and the stsc/stco/stsz
  * sample→byte-offset mapping. Pure JDK, defensive against crafted
  * sizes (walks stop at corruption instead of throwing).
  */
private[ext] object Bmff {

  def beU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  def beU64(b: Array[Byte], off: Int): Long =
    (beU32(b, off) << 32) | beU32(b, off + 4)

  def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Child boxes of [start, end): (tag, payloadStart, payloadEnd). */
  def children(b: Array[Byte], start: Long, end: Long): Seq[(String, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    var off = start
    while (off + 8 <= end) {
      val size0 = beU32(b, off.toInt)
      val t = tag(b, off.toInt + 4)
      val (size, hdr) =
        if (size0 == 1 && off + 16 <= end) (beU64(b, off.toInt + 8), 16L)
        else if (size0 == 0) (end - off, 8L)
        else (size0, 8L)
      if (size < hdr || off + size > end) return out.toSeq // stop at corruption
      out += ((t, off + hdr, off + size))
      off += size
    }
    out.toSeq
  }

  /** Run-length-decoded stts per-sample durations of an stbl, or
    * null (absent / zero samples / corrupt counts).
    */
  def sttsDurations(b: Array[Byte], ss: Long, se: Long): Array[Long] = {
    find(b, ss, se, "stts") match {
      case Some((s, e)) if s + 8 <= e =>
        val n = beU32(b, s.toInt + 4)
        if (n < 1 || n > (1 << 20) || s + 8 + 8L * n > e) return null
        val runs = Array.tabulate(n.toInt) { i =>
          val o = (s + 8 + 8L * i).toInt
          (beU32(b, o), beU32(b, o + 4))
        }
        val total = runs.map(_._1).sum
        if (total < 1 || total > (1 << 20)) return null
        val out = new Array[Long](total.toInt)
        var i = 0
        runs.foreach { case (cnt, d) =>
          var j = 0L
          while (j < cnt) { out(i) = d; i += 1; j += 1 }
        }
        out
      case _ => null
    }
  }

  def find(b: Array[Byte], start: Long, end: Long, t: String): Option[(Long, Long)] =
    children(b, start, end).collectFirst { case (`t`, s, e) => (s, e) }

  /** mdhd/mvhd timescale, VERSION-AWARE: version 1 stores 64-bit
    * creation/modification times, pushing the u32 timescale from
    * payload offset 12 to 20 (ISO 14496-12 §8.2.2/§8.4.2). 0 when
    * the payload is too short.
    */
  def headerTimescale(b: Array[Byte], hs: Long, he: Long): Long = {
    if (hs + 4 > he) return 0L
    val ver = b(hs.toInt) & 0xFF
    val off = hs + (if (ver >= 1) 20 else 12)
    if (off + 4 > he) 0L else beU32(b, off.toInt)
  }

  /** Per-sample absolute byte offsets via the stsc chunk mapping, or
    * null if the tables are inconsistent. stsc first_chunk entries
    * must be strictly ascending (valid-file invariant) so the
    * monotone cursor is sound and a crafted table cannot force a
    * quadratic rescan.
    */
  def sampleOffsets(sizes: Array[Long], chunkOffsets: Array[Long],
                    stsc: Array[(Long, Long)]): Array[Long] = {
    if (sizes == null || chunkOffsets == null || stsc == null) return null
    val n = sizes.length
    val out = new Array[Long](n)
    var v = 1
    while (v < stsc.length) {
      if (stsc(v)._1 <= stsc(v - 1)._1) return null
      v += 1
    }
    var s = 0
    var ci = 0 // 0-based chunk index
    var k = 0  // monotone cursor into stsc — never reset across chunks
    var spc = 0L
    while (s < n && ci < chunkOffsets.length) {
      while (k < stsc.length && stsc(k)._1 <= ci + 1) { spc = stsc(k)._2; k += 1 }
      if (spc <= 0) return null
      var off = chunkOffsets(ci)
      var j = 0L
      while (j < spc && s < n) {
        out(s) = off
        off += sizes(s)
        s += 1; j += 1
      }
      ci += 1
    }
    if (s < n) null else out
  }
}
