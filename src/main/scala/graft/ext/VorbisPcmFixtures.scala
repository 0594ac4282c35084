package graft.ext

/** Deterministic FULLY-DECODABLE Ogg Vorbis synthesis — the q141
  * corpus generator, extending the q137/q138 synthesis-in-plan
  * discipline from container structure to the complete audio signal
  * path: every knob (mode schedule, floor posts, residue classes and
  * VQ entries, coupling, granules) is a closed-form function of
  * `docId`, so a SQL oracle predicts [[VorbisDecode]]'s integer-stage
  * accounting — floor post sums, residue lattice sums, the §7.2.4
  * integer curve sum, and the lapped-output sample count — from
  * `documents.doc_id` alone. Wrong bit-packing OR wrong decoding
  * breaks the hash; the packer here and the decoder in
  * [[VorbisDecode]] are independent transcriptions of the spec's
  * read/write orders.
  *
  * Restricted-but-valid subset (documented, each restriction
  * exercised elsewhere): 2-point floors (partitions = 0 — the
  * full class/subclass post decode is spec-tested in
  * VorbisDecodeSpec's end-to-end encoder), always-nonzero floors
  * (the silence path is spec-tested), uniform-length complete books,
  * and one residue whose type (0/1/2) and cascade depth (1 or 2
  * passes) vary per document.
  */
object VorbisPcmFixtures {

  private val RateChoices = Array(8000L, 22050L, 44100L, 48000L)
  private val Ranges = Array(256, 128, 86, 64)
  // large enough that even all-short-block docs clear the 2304-sample
  // minimum of [[Audio]]'s 9-segment fingerprint
  private val Bs0 = 256
  private val Bs1 = 2048

  def channels(d: Long): Int = (1 + d % 2).toInt
  def rate(d: Long): Long = RateChoices((d % 4).toInt)
  def nModes(d: Long): Int = (1 + d % 2).toInt
  def mode(d: Long, p: Int): Int = ((d + p) % nModes(d)).toInt
  def isLong(d: Long, p: Int): Boolean = mode(d, p) == 1
  def blockSize(d: Long, p: Int): Int = if (isLong(d, p)) Bs1 else Bs0
  def nAudio(d: Long): Int = (20 + d % 3).toInt
  def multiplier(d: Long): Int = (1 + d % 4).toInt
  def range(d: Long): Int = Ranges(multiplier(d) - 1)
  def rangebits(d: Long): Int = (4 + d % 3).toInt
  def y0(d: Long, p: Int, c: Int): Int =
    ((11 * d + 7 * p + 3 * c) % range(d)).toInt
  def y1(d: Long, p: Int, c: Int): Int =
    ((5 * d + 13 * p + 2 * c + 17) % range(d)).toInt
  def residueType(d: Long): Int = (d % 3).toInt
  /** class 0 decodes pass 0 only; class 1 adds pass 1 on odd docs. */
  def cascade1(d: Long): Int = (1 + 2 * (d % 2)).toInt
  def cls(d: Long, p: Int, j: Int, t: Int): Int = ((d + p + j + t) % 2).toInt
  def entry(d: Long, p: Int, j: Int, t: Int, pass: Int, k: Int): Int =
    ((d + 2 * p + 3 * j + 5 * t + 7 * pass + k) % 4).toInt
  def mult1(x: Int): Int = (3 * x + 1) % 8
  def mult2(x: Int): Int = (5 * x + 2) % 8

  /** Samples completed after packet p (center-to-center lapping). */
  def granuleAfter(d: Long, p: Int): Long =
    (1 to p).map(q => (blockSize(d, q - 1) + blockSize(d, q)) / 4L).sum

  private def idPacket(d: Long): Array[Byte] = {
    val w = new OggFixtures.WLsb
    w.put(0, 32)
    w.put(channels(d), 8)
    w.put(rate(d), 32)
    w.put(0, 32); w.put(0, 32); w.put(0, 32)
    w.put(8, 4); w.put(11, 4) // blocksizes 256 / 2048
    w.put(1, 1)
    Array[Byte](1) ++ "vorbis".getBytes("US-ASCII") ++ w.bytes
  }

  private def commentPacket(d: Long): Array[Byte] = {
    val w = new OggFixtures.WLsb
    w.put(0, 32); w.put(0, 32); w.put(1, 1)
    Array[Byte](3) ++ "vorbis".getBytes("US-ASCII") ++ w.bytes
  }

  private def setupPacket(d: Long): Array[Byte] = {
    val w = new OggFixtures.WLsb
    w.put(2, 8) // 3 books
    // book 0: classbook — dims 2, 4 entries, uniform 2-bit, scalar
    w.put(0x564342, 24); w.put(2, 16); w.put(4, 24)
    w.put(0, 1); w.put(0, 1)
    for (_ <- 0 until 4) w.put(1, 5)
    w.put(0, 4)
    // books 1–2: VQ lookup type 2, dims 2, 4 entries, uniform 2-bit,
    // min 0, delta 1, 3-bit multiplicands
    for (mults <- Seq(Array.tabulate(8)(mult1), Array.tabulate(8)(mult2))) {
      w.put(0x564342, 24); w.put(2, 16); w.put(4, 24)
      w.put(0, 1); w.put(0, 1)
      for (_ <- 0 until 4) w.put(1, 5)
      w.put(2, 4) // lookup type 2
      w.put(0, 32) // minimum = 0.0
      w.put((788L << 21) | 1, 32) // delta = 1.0 (§9.2.2 packing)
      w.put(2, 4) // value_bits − 1 → 3
      w.put(0, 1) // sequence_p
      mults.foreach(m => w.put(m, 3))
    }
    // one time transform, type 0
    w.put(0, 6); w.put(0, 16)
    // one floor: type 1, ZERO partitions → x-list [0, 2^rangebits]
    w.put(0, 6)
    w.put(1, 16)
    w.put(0, 5) // partitions
    w.put(multiplier(d) - 1, 2)
    w.put(rangebits(d), 4)
    // one residue
    w.put(0, 6)
    w.put(residueType(d), 16)
    w.put(0, 24) // begin
    w.put(16, 24) // end
    w.put(7, 24) // partition size − 1 → 8
    w.put(1, 6) // classifications − 1 → 2
    w.put(0, 8) // classbook 0
    w.put(1, 3); w.put(0, 1) // cascade class 0 = 1
    w.put(cascade1(d), 3); w.put(0, 1) // cascade class 1 = 1 or 3
    w.put(1, 8) // class 0 pass 0 → book 1
    w.put(1, 8) // class 1 pass 0 → book 1
    if (cascade1(d) == 3) w.put(2, 8) // class 1 pass 1 → book 2
    // one mapping: 1 submap, stereo couples (magnitude 0, angle 1)
    w.put(0, 6)
    w.put(0, 16)
    w.put(0, 1)
    if (channels(d) == 2) {
      w.put(1, 1); w.put(0, 8)
      w.put(0, 1); w.put(1, 1)
    } else w.put(0, 1)
    w.put(0, 2)
    w.put(0, 8); w.put(0, 8); w.put(0, 8)
    // modes: short always; long added on odd docs
    val nm = nModes(d)
    w.put(nm - 1, 6)
    for (m <- 0 until nm) {
      w.put(m, 1) // mode 0 short, mode 1 long
      w.put(0, 16); w.put(0, 16); w.put(0, 8)
    }
    w.put(1, 1)
    Array[Byte](5) ++ "vorbis".getBytes("US-ASCII") ++ w.bytes
  }

  /** One audio packet, packed in the decoder's exact read order
    * (§4.3: type bit, mode, window flags, per-channel floor posts,
    * residue classwords + VQ entries in pass/partition/vector
    * interleave).
    */
  private def audioPacket(d: Long, p: Int): Array[Byte] = {
    val w = new OggFixtures.WLsb
    w.put(0, 1)
    val mBits = VorbisSetup.ilog(nModes(d) - 1)
    if (mBits > 0) w.put(mode(d, p), mBits)
    val long = isLong(d, p)
    if (long) {
      w.put(if (p > 0 && isLong(d, p - 1)) 1 else 0, 1)
      w.put(if (p + 1 < nAudio(d) && isLong(d, p + 1)) 1 else 0, 1)
    }
    val ybits = VorbisSetup.ilog(range(d) - 1)
    for (c <- 0 until channels(d)) {
      w.put(1, 1) // nonzero
      w.put(y0(d, p, c), ybits)
      w.put(y1(d, p, c), ybits)
    }
    def code(cw: Int, len: Int): Unit =
      for (b <- (len - 1) to 0 by -1) w.put((cw >> b) & 1, 1)
    val nVecs = if (residueType(d) == 2) 1 else channels(d)
    for (pass <- 0 to 1) {
      if (pass == 0)
        for (j <- 0 until nVecs)
          code(cls(d, p, j, 0) * 2 + cls(d, p, j, 1), 2)
      for (t <- 0 until 2; j <- 0 until nVecs) {
        val decodes =
          if (pass == 0) true
          else cls(d, p, j, t) == 1 && cascade1(d) == 3
        if (decodes)
          for (k <- 0 until 4) code(entry(d, p, j, t, pass, k), 2)
      }
    }
    w.bytes
  }

  /** The complete decodable container for one doc. */
  def stream(d: Long): Array[Byte] = {
    val serial = d % 50000
    val out = new java.io.ByteArrayOutputStream(2048)
    var seq = 0L
    def emit(htype: Int, granule: Long, pkts: Seq[Array[Byte]]): Unit = {
      out.write(OggFixtures.page(htype, granule, serial, seq,
        OggFixtures.lacings(pkts.map(_.length)), pkts.flatten.toArray))
      seq += 1
    }
    emit(0x02, 0L, Seq(idPacket(d)))
    emit(0, 0L, Seq(commentPacket(d), setupPacket(d)))
    val a = nAudio(d)
    for (p <- 0 until a)
      emit(if (p == a - 1) 0x04 else 0, granuleAfter(d, p), Seq(audioPacket(d, p)))
    out.toByteArray
  }
}
