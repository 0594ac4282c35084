package graft.ext

/** Deterministic Ogg Vorbis / Ogg Opus container synthesis — the q138
  * corpus generator (the q137 discipline: every structural knob a
  * closed-form function of `docId`, so a SQL oracle predicts the
  * [[Ogg]] walker's complete output from `documents.doc_id` alone).
  * Pages carry REAL CRCs; the layout deliberately exercises the
  * walker's three packet-framing paths: a 510-byte packet needing the
  * exact-multiple-of-255 zero-lacing terminator, a packet SPLIT
  * across two pages (continuation flag + granule −1 on the
  * unfinished page per RFC 3533), and ordinary single-lacing packets.
  * Audio packet bytes are deterministic filler (the setup packet's
  * body likewise — this layer stops at the comment header; see
  * [[Ogg]]'s scope note).
  *
  * Layout: page 0 = identification header (BOS); page 1 = comment
  * header (+ Vorbis setup packet); audio packet p gets its own page,
  * except packet 2 which spans two pages → `nPages = 3 + nAudio`.
  */
object OggFixtures {

  private val RateChoices = Array(8000L, 22050L, 44100L, 48000L)

  def isOpus(docId: Long): Boolean = docId % 5 == 0
  def channels(docId: Long): Int = (1 + docId % 2).toInt
  def rate(docId: Long): Long = RateChoices((docId % 4).toInt)
  def preSkip(docId: Long): Int = if (isOpus(docId)) (docId % 400).toInt else 0
  def nAudio(docId: Long): Int = (3 + docId % 4).toInt
  def samplesPerPacket(docId: Long): Long = 256 + docId % 512
  def lastGranule(docId: Long): Long = nAudio(docId) * samplesPerPacket(docId)
  def nComments(docId: Long): Int = (docId % 4).toInt
  def vendor(docId: Long): String = "graft-" + (docId % 10)

  /** Audio packet p's length: p=1 exercises the zero-lacing
    * terminator (exact 2×255), p=2 the page split (forced > 255).
    */
  def audioLen(docId: Long, p: Int): Int = p match {
    case 1 => 510
    case 2 => (300 + docId % 100).toInt
    case _ => (40 + (docId * 17 + p * 97L) % 200).toInt
  }

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xFF).toByte)
  private def le64(v: Long): Array[Byte] =
    Array.tabulate(8)(i => ((v >> (8 * i)) & 0xFF).toByte)

  private def vorbisId(docId: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(1); out.write("vorbis".getBytes("US-ASCII"))
    out.write(le32(0)) // vorbis_version
    out.write(channels(docId))
    out.write(le32(rate(docId)))
    out.write(le32(0)); out.write(le32(128000)); out.write(le32(0)) // bitrates
    out.write(0x86) // blocksize_0 = 2^6 (low nibble), blocksize_1 = 2^8 (high)
    out.write(1) // framing bit
    out.toByteArray
  }

  private def opusId(docId: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("OpusHead".getBytes("US-ASCII"))
    out.write(1) // version
    out.write(channels(docId))
    out.write(le16(preSkip(docId)))
    out.write(le32(rate(docId))) // input sample rate (informational)
    out.write(le16(0)) // output gain
    out.write(0) // mapping family 0
    out.toByteArray
  }

  private def commentBlock(docId: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val v = vendor(docId).getBytes("UTF-8")
    out.write(le32(v.length)); out.write(v)
    val n = nComments(docId)
    out.write(le32(n))
    for (i <- 0 until n) {
      val c = s"K$i=v${docId % 97}_$i".getBytes("UTF-8")
      out.write(le32(c.length)); out.write(c)
    }
    out.toByteArray
  }

  private def commentPacket(docId: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (isOpus(docId)) out.write("OpusTags".getBytes("US-ASCII"))
    else { out.write(3); out.write("vorbis".getBytes("US-ASCII")) }
    out.write(commentBlock(docId))
    if (!isOpus(docId)) out.write(1) // framing bit
    out.toByteArray
  }

  // ---- the setup packet carries REAL codebooks (q139's corpus;
  // Vorbis I §3.2.1, LSB-first bitpacking per §2). Book 0 is a fixed
  // IRREGULAR book whose canonical codewords are hand-derivable
  // (lengths 1,2,3,3 → words 0,10,110,111 → sum 15 — the trie gate);
  // books 1.. are parameterized uniform-length books.
  def nSetupBooks(docId: Long): Int = (2 + docId % 2).toInt
  def bookDims(docId: Long, k: Int): Int =
    if (k == 0) 1 else (1 + (docId + k) % 2).toInt
  def bookLog2Entries(docId: Long, k: Int): Int =
    (2 + (docId + k) % 3).toInt // books k>=1; book 0 has 4 entries
  def bookHasLookup(docId: Long, k: Int): Boolean =
    k > 0 && (docId + k) % 2 == 1
  def bookLookupValues(docId: Long, k: Int): Int = {
    // type 1 ⟺ dims = 2 here: greatest v with v² ≤ 2^L
    val l = bookLog2Entries(docId, k)
    if (l == 4) 4 else 2
  }

  // ---- the post-codebook sections (q140's corpus): every knob a
  // closed form of docId; floor 1 x-list values are 3 + running
  // index (unique, below every 2^rangebits here)
  def nFloors(docId: Long): Int = (1 + docId % 2).toInt
  def floorPartitions(docId: Long, f: Int): Int = (1 + (docId + f) % 2).toInt
  def floorClassDims(docId: Long, f: Int): Int = (1 + (docId + f) % 3).toInt
  def floorMultiplier(docId: Long, f: Int): Int = (1 + (docId + f) % 4).toInt
  def floorRangebits(docId: Long, f: Int): Int = (4 + (docId + f) % 3).toInt
  def resType(docId: Long): Int = (docId % 3).toInt
  def resBegin(docId: Long): Int = (docId % 50).toInt
  def resEnd(docId: Long): Int = (docId % 50 + 100 + docId % 100).toInt
  def resPartitionSize(docId: Long): Int = (8 + docId % 8).toInt
  def resClassifications(docId: Long): Int = (1 + docId % 3).toInt
  def resCascade(docId: Long, c: Int): Int = ((docId + c) % 8).toInt
  def nModes(docId: Long): Int = (1 + docId % 2).toInt
  def modeBlockFlag(docId: Long, m: Int): Boolean = (docId + m) % 2 == 1

  /** LSB-first bit writer (Vorbis §2; independent of the
    * [[VorbisSetup]] reader and of VorbisSetupSpec's test writer).
    */
  private[ext] final class WLsb {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0
    def put(v: Long, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= (((v >> i) & 1L) << nbits).toInt
        nbits += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
        i += 1
      }
    }
    def bytes: Array[Byte] = {
      if (nbits > 0) { buf += cur.toByte; cur = 0; nbits = 0 }
      buf.toArray
    }
  }

  private def setupPacket(docId: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(5); out.write("vorbis".getBytes("US-ASCII"))
    val w = new WLsb
    val n = nSetupBooks(docId)
    w.put(n - 1, 8)
    for (k <- 0 until n) {
      w.put(0x564342, 24) // sync
      if (k == 0) {
        w.put(1, 16) // dimensions
        w.put(4, 24) // entries
        w.put(0, 1); w.put(0, 1) // unordered, non-sparse
        Seq(1, 2, 3, 3).foreach(l => w.put(l - 1, 5))
        w.put(0, 4) // no lookup
      } else {
        val l = bookLog2Entries(docId, k)
        w.put(bookDims(docId, k), 16)
        w.put(1 << l, 24)
        w.put(0, 1); w.put(0, 1)
        for (_ <- 0 until (1 << l)) w.put(l - 1, 5)
        if (bookHasLookup(docId, k)) {
          w.put(1, 4) // lookup type 1
          w.put(0, 32); w.put(0, 32) // min/delta (float32-packed zero)
          w.put(2, 4) // value_bits − 1 → 3-bit multiplicands
          w.put(0, 1) // sequence_p
          for (_ <- 0 until bookLookupValues(docId, k)) w.put(5, 3)
        } else w.put(0, 4)
      }
    }
    // time transforms: one, type 0
    w.put(0, 6); w.put(0, 16)
    // floors (all type 1, single class 0, no subclasses)
    val nf = nFloors(docId)
    w.put(nf - 1, 6)
    for (f <- 0 until nf) {
      w.put(1, 16)
      val p = floorPartitions(docId, f)
      w.put(p, 5)
      for (_ <- 0 until p) w.put(0, 4) // class_list: all class 0
      w.put(floorClassDims(docId, f) - 1, 3)
      w.put(0, 2) // subclasses = 0
      w.put(0, 8) // the single subclass book: read(8)−1 → −1 unused
      w.put(floorMultiplier(docId, f) - 1, 2)
      val rb = floorRangebits(docId, f)
      w.put(rb, 4)
      var x = 3
      for (_ <- 0 until p * floorClassDims(docId, f)) { w.put(x, rb); x += 1 }
    }
    // one residue
    w.put(0, 6)
    w.put(resType(docId), 16)
    w.put(resBegin(docId), 24)
    w.put(resEnd(docId), 24)
    w.put(resPartitionSize(docId) - 1, 24)
    val rc = resClassifications(docId)
    w.put(rc - 1, 6)
    w.put(0, 8) // classbook 0
    for (c <- 0 until rc) { w.put(resCascade(docId, c), 3); w.put(0, 1) }
    for (c <- 0 until rc; pass <- 0 until 8
         if (resCascade(docId, c) & (1 << pass)) != 0)
      w.put(c % n, 8)
    // one mapping: submaps 1; stereo streams get one coupling step
    w.put(0, 6)
    w.put(0, 16)
    w.put(0, 1) // submaps flag → 1 submap
    if (channels(docId) == 2) {
      w.put(1, 1) // coupling present
      w.put(0, 8) // one step
      w.put(0, 1); w.put(1, 1) // magnitude 0, angle 1 (ilog(1)=1 bit)
    } else w.put(0, 1)
    w.put(0, 2) // reserved
    w.put(0, 8); w.put(0, 8); w.put(0, 8) // submap 0: time, floor 0, residue 0
    // modes
    val nm = nModes(docId)
    w.put(nm - 1, 6)
    for (m <- 0 until nm) {
      w.put(if (modeBlockFlag(docId, m)) 1 else 0, 1)
      w.put(0, 16); w.put(0, 16); w.put(0, 8)
    }
    w.put(1, 1) // framing
    out.write(w.bytes)
    out.toByteArray
  }

  private def audioPacket(docId: Long, p: Int): Array[Byte] = {
    val out = new Array[Byte](audioLen(docId, p))
    var j = 0
    while (j < out.length) {
      out(j) = ((docId + p * 31L + j * 7) % 256).toByte
      j += 1
    }
    out
  }

  /** Lacing values for whole packets ending on this page; `open`
    * marks a trailing 255 run with NO terminator (packet continues).
    */
  private[ext] def lacings(lens: Seq[Int], openTail: Int = -1): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (l <- lens) {
      var rem = l
      while (rem >= 255) { out += 255; rem -= 255 }
      out += rem // 0..254 terminator (0 when l is an exact multiple)
    }
    if (openTail >= 0) {
      require(openTail > 0 && openTail % 255 == 0, "open tail must be 255-aligned")
      for (_ <- 0 until openTail / 255) out += 255
    }
    out.toArray
  }

  private[ext] def page(htype: Int, granule: Long, serial: Long, seq: Long,
                   segs: Array[Int], payload: Array[Byte]): Array[Byte] = {
    require(segs.sum == payload.length && segs.length <= 255)
    val full = new Array[Byte](27 + segs.length + payload.length)
    full(0) = 'O'; full(1) = 'g'; full(2) = 'g'; full(3) = 'S'
    full(5) = htype.toByte
    var i = 0
    while (i < 8) { full(6 + i) = ((granule >> (8 * i)) & 0xFF).toByte; i += 1 }
    i = 0
    while (i < 4) {
      full(14 + i) = ((serial >> (8 * i)) & 0xFF).toByte
      full(18 + i) = ((seq >> (8 * i)) & 0xFF).toByte
      i += 1
    }
    full(26) = segs.length.toByte
    i = 0
    while (i < segs.length) { full(27 + i) = segs(i).toByte; i += 1 }
    System.arraycopy(payload, 0, full, 27 + segs.length, payload.length)
    val c = Ogg.crc(full, 0, full.length, 22)
    i = 0
    while (i < 4) { full(22 + i) = ((c >> (8 * i)) & 0xFF).toByte; i += 1 }
    full
  }

  /** The complete container for one doc. */
  def stream(docId: Long): Array[Byte] = {
    val serial = docId % 100000
    val out = new java.io.ByteArrayOutputStream(4096)
    var seq = 0L
    def emit(htype: Int, granule: Long, segs: Array[Int], payload: Array[Byte]): Unit = {
      out.write(page(htype, granule, serial, seq, segs, payload)); seq += 1
    }
    val id = if (isOpus(docId)) opusId(docId) else vorbisId(docId)
    emit(0x02, 0L, lacings(Seq(id.length)), id) // BOS
    val headerTail =
      if (isOpus(docId)) Seq(commentPacket(docId))
      else Seq(commentPacket(docId), setupPacket(docId))
    emit(0, 0L, lacings(headerTail.map(_.length)), headerTail.flatten.toArray)
    val spp = samplesPerPacket(docId)
    val a = nAudio(docId)
    for (p <- 0 until a) {
      val pkt = audioPacket(docId, p)
      val eos = if (p == a - 1) 0x04 else 0
      if (p == 2) {
        // split: first 255 bytes end an OPEN page (granule −1, no
        // packet finishes), remainder on a continuation page
        emit(0, -1L, lacings(Nil, openTail = 255), pkt.take(255))
        emit(0x01 | eos, (p + 1) * spp, lacings(Seq(pkt.length - 255)), pkt.drop(255))
      } else {
        emit(eos, (p + 1) * spp, lacings(Seq(pkt.length)), pkt)
      }
    }
    out.toByteArray
  }
}
