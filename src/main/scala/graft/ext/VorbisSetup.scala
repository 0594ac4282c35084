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
    * `multiplicands` retains the raw VQ table values (§3.2.1 step 18)
    * so [[VorbisDecode]] can reconstruct lookup vectors; empty for
    * lookup type 0 (scalar) books.
    */
  final case class Codebook(dimensions: Int, entries: Int,
                            lengths: Array[Int], codewords: Array[Long],
                            complete: Boolean, lookupType: Int,
                            lookupValues: Int, minimumValue: Double,
                            deltaValue: Double, sequenceP: Boolean,
                            multiplicands: Array[Int] = Array.emptyIntArray) {
    def usedEntries: Int = lengths.count(_ > 0)
    def maxLength: Int = if (lengths.isEmpty) 0 else lengths.max
  }

  final case class Setup(codebooks: Array[Codebook])

  // ---- the post-codebook setup sections (§4.2.4, §6.2.2, §7.2.2,
  // §8.6.1): time transforms, floors, residues, mappings, modes.
  // Parsed with full fidelity so round-11 audio decode starts from a
  // complete configuration, validated per the spec's own error rules.

  sealed trait FloorCfg
  final case class Floor0Cfg(order: Int, rate: Int, barkMapSize: Int,
                             amplitudeBits: Int, amplitudeOffset: Int,
                             books: Array[Int]) extends FloorCfg
  final case class Floor1Cfg(partitions: Int, classList: Array[Int],
                             classDimensions: Array[Int],
                             classSubclasses: Array[Int],
                             classMasterbooks: Array[Int],
                             subclassBooks: Array[Array[Int]],
                             multiplier: Int, rangebits: Int,
                             xList: Array[Int]) extends FloorCfg

  /** `books(c)(pass)` = codebook index or -1 where the cascade bit is
    * clear.
    */
  final case class ResidueCfg(residueType: Int, begin: Long, end: Long,
                              partitionSize: Int, classifications: Int,
                              classbook: Int, cascade: Array[Int],
                              books: Array[Array[Int]])

  final case class MappingCfg(submaps: Int, couplingSteps: Int,
                              magnitudes: Array[Int], angles: Array[Int],
                              mux: Array[Int], submapFloor: Array[Int],
                              submapResidue: Array[Int])

  final case class ModeCfg(blockFlag: Boolean, mapping: Int)

  final case class FullSetup(codebooks: Array[Codebook],
                             floors: Array[FloorCfg],
                             residues: Array[ResidueCfg],
                             mappings: Array[MappingCfg],
                             modes: Array[ModeCfg])

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
    // unboxed growable node store (this runs per row in q139/q140);
    // instances are per-thread scratch (see [[CodeTrie.local]]) —
    // reset is O(1) because newNode() initializes every cell it hands
    // out, so stale nodes beyond `n` are never observed
    private var left = new Array[Int](64)
    private var right = new Array[Int](64)
    private var used = new Array[Boolean](64)
    private var full = new Array[Boolean](64)
    private var n = 1
    left(0) = -1; right(0) = -1

    def reset(): Unit = {
      if (left.length > (1 << 15)) { // shrink after an adversarial book
        left = new Array[Int](64); right = new Array[Int](64)
        used = new Array[Boolean](64); full = new Array[Boolean](64)
      }
      n = 1
      left(0) = -1; right(0) = -1; used(0) = false; full(0) = false
    }

    private def newNode(): Int = {
      if (n == left.length) {
        left = java.util.Arrays.copyOf(left, n * 2)
        right = java.util.Arrays.copyOf(right, n * 2)
        used = java.util.Arrays.copyOf(used, n * 2)
        full = java.util.Arrays.copyOf(full, n * 2)
      }
      left(n) = -1; right(n) = -1; used(n) = false; full(n) = false
      n += 1
      n - 1
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

  private object CodeTrie {
    /** Per-thread scratch: the q139 allocation diet (VERDICT r10
      * item 3) — one trie per executor thread instead of four array
      * allocations per codebook per row. Bounded: ≤32 KB resident
      * per thread (shrunk on reset after an adversarial book).
      */
    val local: ThreadLocal[CodeTrie] = new ThreadLocal[CodeTrie] {
      override def initialValue(): CodeTrie = new CodeTrie
    }
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
    val trie = CodeTrie.local.get()
    trie.reset()
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
    var mults = Array.emptyIntArray
    if (lookupType == 1 || lookupType == 2) {
      minV = float32Unpack(r.readLong(32) & 0xFFFFFFFFL)
      delta = float32Unpack(r.readLong(32) & 0xFFFFFFFFL)
      val valueBits = r.read(4) + 1
      seqP = r.read(1) == 1
      lookupValues =
        if (lookupType == 1) lookup1Values(entries, dims)
        else entries * dims
      mults = new Array[Int](lookupValues)
      var j = 0
      while (j < lookupValues) {
        mults(j) = r.readLong(valueBits).toInt // valueBits <= 16 here
        j += 1
      }
    } else if (lookupType != 0) return null
    Codebook(dims, entries, lengths, codewords, complete,
      lookupType, lookupValues, minV, delta, seqP, mults)
  }

  private def codebooksOrNull(r: BitsLsb): Array[Codebook] = {
    val n = r.read(8) + 1
    val books = new Array[Codebook](n)
    var k = 0
    while (k < n) {
      val b = codebookOrNull(r)
      if (b == null) return null
      books(k) = b
      k += 1
    }
    books
  }

  private def headerOk(packet: Array[Byte]): Boolean = {
    if (packet == null || packet.length < 8 || packet(0) != 5) return false
    var i = 0
    while (i < 6) {
      if (packet(1 + i) != "vorbis".charAt(i).toByte) return false
      i += 1
    }
    true
  }

  /** Parse the codebook section of a Vorbis setup packet (packet
    * type 5) — the q139 surface. [[fullSetupOrNull]] continues through
    * the remaining sections.
    */
  def setupOrNull(packet: Array[Byte]): Setup = {
    try {
      if (!headerOk(packet)) return null
      val r = new BitsLsb(packet, 7)
      val books = codebooksOrNull(r)
      if (books == null) null else Setup(books)
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  private def floorOrNull(r: BitsLsb, nBooks: Int): FloorCfg = {
    r.read(16) match {
      case 0 =>
        val order = r.read(8)
        val rate = r.read(16)
        val bark = r.read(16)
        val ampBits = r.read(6)
        val ampOff = r.read(8)
        val nb = r.read(4) + 1
        val books = Array.fill(nb)(r.read(8))
        if (books.exists(_ >= nBooks)) return null
        Floor0Cfg(order, rate, bark, ampBits, ampOff, books)
      case 1 =>
        val partitions = r.read(5)
        val classList = Array.fill(partitions)(r.read(4))
        val maxClass = if (partitions == 0) -1 else classList.max
        val dims = new Array[Int](maxClass + 1)
        val subs = new Array[Int](maxClass + 1)
        val masters = Array.fill(maxClass + 1)(-1)
        val subBooks = new Array[Array[Int]](maxClass + 1)
        var c = 0
        while (c <= maxClass) {
          dims(c) = r.read(3) + 1
          subs(c) = r.read(2)
          if (subs(c) > 0) {
            masters(c) = r.read(8)
            if (masters(c) >= nBooks) return null
          }
          subBooks(c) = Array.fill(1 << subs(c))(r.read(8) - 1)
          if (subBooks(c).exists(b => b >= nBooks)) return null
          c += 1
        }
        val multiplier = r.read(2) + 1
        val rangebits = r.read(4)
        val xs = scala.collection.mutable.ArrayBuffer(0, 1 << rangebits)
        var p = 0
        while (p < partitions) {
          var j = 0
          while (j < dims(classList(p))) { xs += r.read(rangebits); j += 1 }
          p += 1
        }
        // §7.2.2: > 65 values or non-unique values render the stream
        // undecodable
        if (xs.length > 65 || xs.distinct.length != xs.length) return null
        Floor1Cfg(partitions, classList, dims, subs, masters, subBooks,
          multiplier, rangebits, xs.toArray)
      case _ => null
    }
  }

  private def residueOrNull(r: BitsLsb, nBooks: Int): ResidueCfg = {
    val rtype = r.read(16)
    if (rtype > 2) return null
    val begin = r.read(24).toLong
    val end = r.read(24).toLong
    if (begin > end) return null
    val psize = r.read(24) + 1
    val cls = r.read(6) + 1
    val classbook = r.read(8)
    if (classbook >= nBooks) return null
    val cascade = new Array[Int](cls)
    var c = 0
    while (c < cls) {
      val low = r.read(3)
      val high = if (r.read(1) == 1) r.read(5) else 0
      cascade(c) = (high << 3) | low
      c += 1
    }
    val books = Array.ofDim[Int](cls, 8)
    c = 0
    while (c < cls) {
      var pass = 0
      while (pass < 8) {
        if ((cascade(c) & (1 << pass)) != 0) {
          books(c)(pass) = r.read(8)
          if (books(c)(pass) >= nBooks) return null
        } else books(c)(pass) = -1
        pass += 1
      }
      c += 1
    }
    ResidueCfg(rtype, begin, end, psize, cls, classbook, cascade, books)
  }

  private def mappingOrNull(r: BitsLsb, channels: Int, nFloors: Int,
                            nResidues: Int): MappingCfg = {
    if (r.read(16) != 0) return null
    val submaps = if (r.read(1) == 1) r.read(4) + 1 else 1
    var steps = 0
    var mags = Array.emptyIntArray
    var angs = Array.emptyIntArray
    if (r.read(1) == 1) {
      steps = r.read(8) + 1
      mags = new Array[Int](steps)
      angs = new Array[Int](steps)
      val w = ilog(channels - 1)
      var s = 0
      while (s < steps) {
        mags(s) = r.read(w)
        angs(s) = r.read(w)
        if (mags(s) == angs(s) || mags(s) >= channels || angs(s) >= channels)
          return null
        s += 1
      }
    }
    if (r.read(2) != 0) return null // reserved
    val mux =
      if (submaps > 1) {
        val m = Array.fill(channels)(r.read(4))
        if (m.exists(_ >= submaps)) return null
        m
      } else Array.emptyIntArray
    val sf = new Array[Int](submaps)
    val sr = new Array[Int](submaps)
    var s = 0
    while (s < submaps) {
      r.read(8) // discarded time configuration placeholder
      sf(s) = r.read(8)
      sr(s) = r.read(8)
      if (sf(s) >= nFloors || sr(s) >= nResidues) return null
      s += 1
    }
    MappingCfg(submaps, steps, mags, angs, mux, sf, sr)
  }

  /** The complete setup parse — codebooks, time transforms (must all
    * be type 0), floors, residues, mappings, modes, and the closing
    * framing bit. `channels` comes from the identification header
    * (coupling step widths are ilog(channels−1)). Null on any
    * violation the spec declares undecodable.
    */
  def fullSetupOrNull(packet: Array[Byte], channels: Int): FullSetup = {
    try {
      if (!headerOk(packet) || channels < 1) return null
      val r = new BitsLsb(packet, 7)
      val books = codebooksOrNull(r)
      if (books == null) return null
      val timeCount = r.read(6) + 1
      var t = 0
      while (t < timeCount) {
        if (r.read(16) != 0) return null
        t += 1
      }
      val floors = new Array[FloorCfg](r.read(6) + 1)
      var i = 0
      while (i < floors.length) {
        floors(i) = floorOrNull(r, books.length)
        if (floors(i) == null) return null
        i += 1
      }
      val residues = new Array[ResidueCfg](r.read(6) + 1)
      i = 0
      while (i < residues.length) {
        residues(i) = residueOrNull(r, books.length)
        if (residues(i) == null) return null
        i += 1
      }
      val mappings = new Array[MappingCfg](r.read(6) + 1)
      i = 0
      while (i < mappings.length) {
        mappings(i) = mappingOrNull(r, channels, floors.length, residues.length)
        if (mappings(i) == null) return null
        i += 1
      }
      val modes = new Array[ModeCfg](r.read(6) + 1)
      i = 0
      while (i < modes.length) {
        val bf = r.read(1) == 1
        if (r.read(16) != 0 || r.read(16) != 0) return null // window/transform
        val m = r.read(8)
        if (m >= mappings.length) return null
        modes(i) = ModeCfg(bf, m)
        i += 1
      }
      if (r.read(1) != 1) return null // framing
      FullSetup(books, floors, residues, mappings, modes)
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }
}
