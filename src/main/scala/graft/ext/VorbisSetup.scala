package graft.ext

/** Vorbis setup-header CODEBOOK layer (Vorbis I spec §3.2.1) — the
  * validatable first stage of a Vorbis decoder, and the round-11
  * groundwork the round-10 MP3 build-vs-defer note points at: unlike
  * MP3, Vorbis carries its entropy codebooks IN the stream, so this
  * layer has no memorized normative tables — everything here is
  * checkable against hand-built packets and the spec's own canonical
  * assignment rule.
  *
  * What it does: LSB-first bitpack reading (Vorbis §2 — the OPPOSITE
  * bit order of every other container here), codebook sync, the
  * ordered / unordered±sparse length lists, CANONICAL codeword
  * assembly (each used entry takes the lowest-valued available
  * prefix-free word of its length — implemented as first-fit on an
  * explicit binary trie so prefix violations and over-specification
  * fail structurally, not probabilistically), Kraft completeness,
  * and the VQ lookup tables (types 0/1/2, `float32_unpack`,
  * `lookup1_values`).
  *
  * Parsing is bounded and total ([[MediaMeta]] contract): every read
  * is range-checked against the packet, violations null the walk,
  * and books beyond the triage guard (entries > 4096 or length > 32)
  * null LOUDLY rather than allocating unboundedly — the guard is a
  * documented scope line, not a silent truncation.
  */
object VorbisSetup {

  /** One parsed codebook. `codewords(i)` is the canonical word for
    * entry i (MSB-first value, `lengths(i)` bits; -1 = unused entry).
    */
  final case class Codebook(dimensions: Int, entries: Int,
                            lengths: Array[Int], codewords: Array[Long],
                            complete: Boolean, lookupType: Int,
                            lookupValues: Int, minimumValue: Double,
                            deltaValue: Double, sequenceP: Boolean) {
    def usedEntries: Int = lengths.count(_ > 0)
    def maxLength: Int = if (lengths.isEmpty) 0 else lengths.max
  }

  final case class Setup(codebooks: Array[Codebook])

  private val MaxEntries = 4096
  private val MaxLen = 32

  /** LSB-first bit reader over a packet (Vorbis §2). */
  private[graft] final class BitsLsb(b: Array[Byte], var bytePos: Int) {
    private var bitPos = 0
    def read(n: Int): Int = {
      var v = 0
      var got = 0
      while (got < n) {
        require(bytePos < b.length, "vorbis: packet underrun")
        val avail = 8 - bitPos
        val take = math.min(avail, n - got)
        val bits = ((b(bytePos) & 0xFF) >> bitPos) & ((1 << take) - 1)
        v |= bits << got
        got += take
        bitPos += take
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      }
      v
    }
    def readLong(n: Int): Long = {
      val lo = read(math.min(n, 16)).toLong
      if (n <= 16) lo else lo | (read(n - 16).toLong << 16)
    }
  }

  /** Smallest number of bits needed to represent x (§9.2.1):
    * ilog(0)=0, ilog(1)=1, ilog(7)=3.
    */
  def ilog(x0: Int): Int = {
    var x = x0
    var r = 0
    while (x > 0) { r += 1; x >>= 1 }
    r
  }

  /** §9.2.2: 21-bit mantissa, 10-bit biased exponent, sign. */
  def float32Unpack(x: Long): Double = {
    val mantissa = (x & 0x1FFFFF).toDouble
    val exponent = ((x & 0x7FE00000L) >> 21).toInt
    val signed = if ((x & 0x80000000L) != 0) -mantissa else mantissa
    signed * math.pow(2.0, exponent - 788)
  }

  /** §3.2.1 step 17: greatest integer v with v^dim <= entries. */
  def lookup1Values(entries: Int, dim: Int): Int = {
    var v = 1
    while (math.pow(v + 1, dim) <= entries + 1e-9) v += 1
    v
  }

  /** Canonical first-fit codeword assigner: an explicit binary trie
    * where each insert takes the lowest available word of its length.
    * Prefix conflicts and over-specification return -1 (the caller
    * nulls the walk); [[isComplete]] is Kraft equality.
    */
  private final class CodeTrie {
    private val left = scala.collection.mutable.ArrayBuffer(-1)
    private val right = scala.collection.mutable.ArrayBuffer(-1)
    private val used = scala.collection.mutable.ArrayBuffer(false)
    private val full = scala.collection.mutable.ArrayBuffer(false)

    private def newNode(): Int = {
      left += -1; right += -1; used += false; full += false
      left.length - 1
    }
    private def childFull(c: Int): Boolean = c != -1 && full(c)

    private def ins(n: Int, rem: Int): Long = {
      if (used(n) || full(n)) return -1L
      if (rem == 0) {
        if (left(n) != -1 || right(n) != -1) return -1L // interior node
        used(n) = true; full(n) = true
        return 0L
      }
      var l = left(n)
      if (l == -1) { l = newNode(); left(n) = l }
      val a = ins(l, rem - 1)
      val code =
        if (a >= 0) a
        else {
          var r = right(n)
          if (r == -1) { r = newNode(); right(n) = r }
          val b = ins(r, rem - 1)
          if (b < 0) return -1L
          (1L << (rem - 1)) | b
        }
      full(n) = childFull(left(n)) && childFull(right(n))
      code
    }

    def insert(len: Int): Long = ins(0, len)
    def isComplete: Boolean = full(0)
  }

  /** Parse one codebook at the reader's position. Null on any
    * structural violation.
    */
  private def codebookOrNull(r: BitsLsb): Codebook = {
    if (r.read(24) != 0x564342) return null // sync "BCV"
    val dims = r.read(16)
    val entries = r.read(16) | (r.read(8) << 16)
    if (dims < 1 || entries < 1 || entries > MaxEntries) return null
    val lengths = new Array[Int](entries)
    val ordered = r.read(1)
    if (ordered == 0) {
      val sparse = r.read(1)
      var i = 0
      while (i < entries) {
        if (sparse == 1 && r.read(1) == 0) lengths(i) = 0 // unused
        else lengths(i) = r.read(5) + 1
        i += 1
      }
    } else {
      var cur = 0
      var len = r.read(5) + 1
      while (cur < entries) {
        if (len > MaxLen) return null
        val num = r.read(ilog(entries - cur))
        if (cur + num > entries) return null
        java.util.Arrays.fill(lengths, cur, cur + num, len)
        cur += num
        len += 1
      }
    }
    if (lengths.exists(_ > MaxLen)) return null
    // canonical assembly — single-used-entry books are the spec's
    // special case (one entry, zero or more bits, always "complete")
    val codewords = Array.fill(entries)(-1L)
    val trie = new CodeTrie
    var i = 0
    while (i < entries) {
      if (lengths(i) > 0) {
        val c = trie.insert(lengths(i))
        if (c < 0) return null // prefix conflict / over-specified
        codewords(i) = c
      }
      i += 1
    }
    val complete = trie.isComplete
    val lookupType = r.read(4)
    var lookupValues = 0
    var minV = 0.0
    var delta = 0.0
    var seqP = false
    if (lookupType == 1 || lookupType == 2) {
      minV = float32Unpack(r.readLong(32) & 0xFFFFFFFFL)
      delta = float32Unpack(r.readLong(32) & 0xFFFFFFFFL)
      val valueBits = r.read(4) + 1
      seqP = r.read(1) == 1
      lookupValues =
        if (lookupType == 1) lookup1Values(entries, dims)
        else entries * dims
      var j = 0
      while (j < lookupValues) { r.readLong(valueBits); j += 1 } // multiplicands
    } else if (lookupType != 0) return null
    Codebook(dims, entries, lengths, codewords, complete,
      lookupType, lookupValues, minV, delta, seqP)
  }

  /** Parse the codebook section of a Vorbis setup packet (packet
    * type 5). Null for anything else. Floors/residues/mappings after
    * the codebooks are round-11 scope — this returns the books and
    * leaves the reader there.
    */
  def setupOrNull(packet: Array[Byte]): Setup = {
    try {
      if (packet == null || packet.length < 8) return null
      if (packet(0) != 5) return null
      var i = 0
      while (i < 6) {
        if (packet(1 + i) != "vorbis".charAt(i).toByte) return null
        i += 1
      }
      val r = new BitsLsb(packet, 7)
      val n = r.read(8) + 1
      val books = new Array[Codebook](n)
      var k = 0
      while (k < n) {
        val b = codebookOrNull(r)
        if (b == null) return null
        books(k) = b
        k += 1
      }
      Setup(books)
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }
}
