package graft

import graft.ext.{Ogg, OggFixtures, VorbisSetup}
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.VorbisSetup]] — LSB-first bitpack, codebook parse,
  * canonical codeword assembly, Kraft completeness, VQ lookups. The
  * canonical-assembly gold is the Vorbis I spec's OWN §3.2.1 example
  * (lengths 2,4,4,4,4,2,3,3 → the published tree); packets are built
  * with an independent test-side LSB writer.
  */
class VorbisSetupSpec extends AnyFunSuite {

  /** Independent LSB-first writer (separate transcription from both
    * the reader and OggFixtures' production writer).
    */
  private final class W {
    private val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def put(v: Long, n: Int): this.type = {
      for (i <- 0 until n) bits += ((v >> i) & 1L).toInt
      this
    }
    def bytes: Array[Byte] = {
      val out = new Array[Byte]((bits.length + 7) / 8)
      for (i <- bits.indices if bits(i) == 1)
        out(i / 8) = (out(i / 8) | (1 << (i % 8))).toByte
      out
    }
  }

  private def packet(body: W): Array[Byte] =
    Array[Byte](5) ++ "vorbis".getBytes("US-ASCII") ++ body.bytes

  /** One unordered non-sparse codebook with the given lengths. */
  private def book(w: W, dims: Int, lengths: Seq[Int],
                   lookup0: Boolean = true): W = {
    w.put(0x564342, 24).put(dims, 16).put(lengths.length, 24)
    w.put(0, 1).put(0, 1)
    lengths.foreach(l => w.put(l - 1, 5))
    if (lookup0) w.put(0, 4)
    w
  }

  test("float32_unpack: spec layout (21-bit mantissa, bias-788 exponent, sign)") {
    assert(VorbisSetup.float32Unpack((788L << 21) | 1) === 1.0)
    assert(VorbisSetup.float32Unpack((788L << 21) | 3) === 3.0)
    assert(VorbisSetup.float32Unpack(0x80000000L | (788L << 21) | 2) === -2.0)
    assert(VorbisSetup.float32Unpack((787L << 21) | 1) === 0.5)
    assert(VorbisSetup.float32Unpack(0L) === 0.0)
  }

  test("ilog and lookup1_values match the spec definitions") {
    assert(Seq(0, 1, 2, 3, 4, 7, 8).map(VorbisSetup.ilog) === Seq(0, 1, 2, 2, 3, 3, 4))
    assert(VorbisSetup.lookup1Values(16, 2) === 4)
    assert(VorbisSetup.lookup1Values(8, 2) === 2)
    assert(VorbisSetup.lookup1Values(8, 1) === 8)
    assert(VorbisSetup.lookup1Values(27, 3) === 3)
  }

  test("canonical assembly reproduces the spec's §3.2.1 example tree") {
    val w = new W().put(0, 8) // one codebook
    book(w, 1, Seq(2, 4, 4, 4, 4, 2, 3, 3))
    val s = VorbisSetup.setupOrNull(packet(w))
    assert(s != null && s.codebooks.length === 1)
    val b = s.codebooks(0)
    // the published assignment: 00, 0100, 0101, 0110, 0111, 10, 110, 111
    assert(b.codewords.toSeq === Seq(0L, 4L, 5L, 6L, 7L, 2L, 6L, 7L))
    assert(b.complete && b.usedEntries === 8 && b.maxLength === 4)
  }

  test("ordered length list expands run-by-run with ilog-width counts") {
    val w = new W().put(0, 8)
    w.put(0x564342, 24).put(1, 16).put(5, 24)
    w.put(1, 1) // ordered
    w.put(0, 5) // initial length 1
    w.put(1, VorbisSetup.ilog(5)) // one entry of length 1
    w.put(1, VorbisSetup.ilog(4)) // one of length 2
    w.put(1, VorbisSetup.ilog(3)) // one of length 3
    w.put(2, VorbisSetup.ilog(2)) // two of length 4
    w.put(0, 4) // no lookup
    val s = VorbisSetup.setupOrNull(packet(w))
    assert(s != null)
    val b = s.codebooks(0)
    assert(b.lengths.toSeq === Seq(1, 2, 3, 4, 4))
    assert(b.codewords.toSeq === Seq(0L, 2L, 6L, 14L, 15L))
    assert(b.complete)
  }

  test("sparse books skip unused entries; incomplete books are flagged") {
    val w = new W().put(1, 8) // two codebooks
    // sparse: used/unused alternating, both used lengths 1 → complete
    w.put(0x564342, 24).put(1, 16).put(4, 24)
    w.put(0, 1).put(1, 1) // unordered, sparse
    w.put(1, 1).put(0, 5) // used, length 1
    w.put(0, 1) // unused
    w.put(1, 1).put(0, 5) // used, length 1
    w.put(0, 1) // unused
    w.put(0, 4)
    // single length-2 entry → prefix-free but Kraft-incomplete
    book(w, 1, Seq(2))
    val s = VorbisSetup.setupOrNull(packet(w))
    assert(s != null && s.codebooks.length === 2)
    assert(s.codebooks(0).usedEntries === 2 && s.codebooks(0).complete)
    assert(s.codebooks(0).codewords.toSeq === Seq(0L, -1L, 1L, -1L))
    assert(!s.codebooks(1).complete && s.codebooks(1).codewords(0) === 0L)
  }

  test("VQ lookup type 1: floats, value bits, multiplicand count") {
    val w = new W().put(0, 8)
    w.put(0x564342, 24).put(2, 16).put(16, 24)
    w.put(0, 1).put(0, 1)
    for (_ <- 0 until 16) w.put(3, 5) // all length 4 → complete
    w.put(1, 4) // lookup type 1
    w.put((788L << 21) | 2, 32) // minimum 2.0
    w.put(0x80000000L | (788L << 21) | 1, 32) // delta −1.0
    w.put(4, 4) // value_bits = 5
    w.put(1, 1) // sequence_p
    for (m <- Seq(9, 30, 0, 17)) w.put(m, 5) // lookup1_values(16,2) = 4
    val s = VorbisSetup.setupOrNull(packet(w))
    assert(s != null)
    val b = s.codebooks(0)
    assert(b.lookupType === 1 && b.lookupValues === 4)
    assert(b.minimumValue === 2.0 && b.deltaValue === -1.0 && b.sequenceP)
    // multiplicands retained verbatim for the decode layer (round 10)
    assert(b.multiplicands.toSeq === Seq(9, 30, 0, 17))
  }

  test("violations null loudly: bad sync, over-specification, prefix conflict, underrun") {
    val bad = new W().put(0, 8).put(0x564341, 24).put(1, 16).put(2, 24)
    assert(VorbisSetup.setupOrNull(packet(bad)) === null)
    // lengths 1,1,2: the third entry cannot get a prefix-free word
    val over = new W().put(0, 8)
    book(over, 1, Seq(1, 1, 2))
    assert(VorbisSetup.setupOrNull(packet(over)) === null)
    // truncated mid-lengths
    val trunc = new W().put(0, 8).put(0x564342, 24).put(1, 16).put(8, 24).put(0, 2)
    assert(VorbisSetup.setupOrNull(packet(trunc)) === null)
    // not a setup packet
    assert(VorbisSetup.setupOrNull("OpusTags....".getBytes) === null)
  }

  test("q139 fixture sweep: parse recovers every closed-form knob") {
    for (docId <- 0L to 60L if !OggFixtures.isOpus(docId)) {
      val pk = Ogg.packetsOrNull(OggFixtures.stream(docId))
      val s = VorbisSetup.setupOrNull(pk(2))
      assert(s != null, s"doc $docId")
      val n = OggFixtures.nSetupBooks(docId)
      assert(s.codebooks.length === n)
      val b0 = s.codebooks(0)
      assert(b0.lengths.toSeq === Seq(1, 2, 3, 3))
      assert(b0.codewords.toSeq === Seq(0L, 2L, 6L, 7L) && b0.complete)
      for (k <- 1 until n) {
        val b = s.codebooks(k)
        val l = OggFixtures.bookLog2Entries(docId, k)
        assert(b.dimensions === OggFixtures.bookDims(docId, k))
        assert(b.entries === (1 << l) && b.complete)
        // uniform complete book: canonical codewords are 0..2^l−1
        assert(b.codewords.toSeq === (0 until (1 << l)).map(_.toLong))
        if (OggFixtures.bookHasLookup(docId, k)) {
          assert(b.lookupType === 1)
          assert(b.lookupValues === OggFixtures.bookLookupValues(docId, k))
        } else assert(b.lookupType === 0)
      }
    }
    // opus docs have no Vorbis setup → the stats kernel nulls
    assert(graft.fn.VorbisSetupStats.statsOrNull(OggFixtures.stream(5L)) === null)
    val r = graft.fn.VorbisSetupStats.statsOrNull(OggFixtures.stream(1L))
    assert(r != null && r.getLong(7) >= 15L) // cw_sum includes book 0's 15
  }

  /** Minimal hand-built FULL setup: one 2-entry codebook, one empty
    * floor-1, one cascade-less residue, one uncoupled mapping, one
    * mode. `mutate` hooks let violation tests flip one section.
    */
  private def fullSetup(time16: Int = 0, framing: Int = 1,
                        floorX: Seq[Int] = Nil): Array[Byte] = {
    val w = new W().put(0, 8)
    book(w, 1, Seq(1, 1))
    w.put(0, 6).put(time16, 16) // one time transform
    w.put(0, 6) // one floor
    w.put(1, 16) // type 1
    if (floorX.isEmpty) {
      w.put(0, 5) // zero partitions → no classes
      w.put(0, 2).put(4, 4) // multiplier 1, rangebits 4
    } else {
      w.put(1, 5).put(0, 4) // one partition, class 0
      w.put(floorX.length - 1, 3).put(0, 2).put(0, 8) // dims, subclasses
      w.put(0, 2).put(4, 4)
      floorX.foreach(x => w.put(x, 4))
    }
    w.put(0, 6) // one residue
    w.put(0, 16).put(0, 24).put(0, 24).put(0, 24) // type 0, begin/end, psize 1
    w.put(0, 6).put(0, 8) // one class, classbook 0
    w.put(0, 3).put(0, 1) // cascade 0
    w.put(0, 6) // one mapping
    w.put(0, 16).put(0, 1).put(0, 1).put(0, 2) // type, 1 submap, no coupling
    w.put(0, 8).put(0, 8).put(0, 8) // submap 0
    w.put(0, 6) // one mode
    w.put(0, 1).put(0, 16).put(0, 16).put(0, 8)
    w.put(framing, 1)
    packet(w)
  }

  test("full setup parse: the minimal hand-built configuration walks") {
    val s = VorbisSetup.fullSetupOrNull(fullSetup(), 1)
    assert(s != null)
    assert(s.floors.length === 1 && s.residues.length === 1)
    assert(s.mappings.length === 1 && s.modes.length === 1)
    val f1 = s.floors(0).asInstanceOf[VorbisSetup.Floor1Cfg]
    assert(f1.partitions === 0 && f1.xList.toSeq === Seq(0, 16))
    assert(s.residues(0).partitionSize === 1)
    assert(s.mappings(0).couplingSteps === 0)
  }

  test("full-parse violations null loudly: time type, duplicate x, framing") {
    assert(VorbisSetup.fullSetupOrNull(fullSetup(time16 = 1), 1) === null)
    assert(VorbisSetup.fullSetupOrNull(fullSetup(framing = 0), 1) === null)
    assert(VorbisSetup.fullSetupOrNull(fullSetup(floorX = Seq(5, 5)), 1) === null)
    assert(VorbisSetup.fullSetupOrNull(fullSetup(floorX = Seq(5, 7)), 1) != null)
  }

  test("q140 fixture sweep: the complete setup recovers every closed-form knob") {
    for (docId <- 0L to 40L if !OggFixtures.isOpus(docId)) {
      val pk = Ogg.packetsOrNull(OggFixtures.stream(docId))
      val ch = OggFixtures.channels(docId)
      val s = VorbisSetup.fullSetupOrNull(pk(2), ch)
      assert(s != null, s"doc $docId")
      assert(s.floors.length === OggFixtures.nFloors(docId))
      for ((fl, f) <- s.floors.zipWithIndex) {
        val f1 = fl.asInstanceOf[VorbisSetup.Floor1Cfg]
        assert(f1.partitions === OggFixtures.floorPartitions(docId, f))
        assert(f1.classDimensions.toSeq === Seq(OggFixtures.floorClassDims(docId, f)))
        assert(f1.multiplier === OggFixtures.floorMultiplier(docId, f))
        assert(f1.rangebits === OggFixtures.floorRangebits(docId, f))
        val pd = f1.partitions * f1.classDimensions(0)
        assert(f1.xList.toSeq === Seq(0, 1 << f1.rangebits) ++ (3 until 3 + pd))
      }
      val r = s.residues(0)
      assert(r.residueType === OggFixtures.resType(docId))
      assert(r.begin === OggFixtures.resBegin(docId))
      assert(r.end === OggFixtures.resEnd(docId))
      assert(r.partitionSize === OggFixtures.resPartitionSize(docId))
      assert(r.classifications === OggFixtures.resClassifications(docId))
      for (c <- 0 until r.classifications) {
        assert(r.cascade(c) === OggFixtures.resCascade(docId, c))
        assert(r.books(c).count(_ >= 0) === Integer.bitCount(r.cascade(c)))
      }
      val m = s.mappings(0)
      assert(m.couplingSteps === (if (ch == 2) 1 else 0))
      if (ch == 2) {
        assert(m.magnitudes.toSeq === Seq(0) && m.angles.toSeq === Seq(1))
      }
      assert(s.modes.length === OggFixtures.nModes(docId))
      for (mm <- s.modes.indices)
        assert(s.modes(mm).blockFlag === OggFixtures.modeBlockFlag(docId, mm))
    }
    // the stats kernel nulls for opus and folds for vorbis
    assert(graft.fn.VorbisSetupFull.statsOrNull(OggFixtures.stream(10L)) === null)
    val st = graft.fn.VorbisSetupFull.statsOrNull(OggFixtures.stream(2L))
    assert(st != null && st.getInt(0) === OggFixtures.nFloors(2L))
  }

  test("corrupt-setup fuzz: total, never throws") {
    val rnd = new scala.util.Random(139)
    val base = Ogg.packetsOrNull(OggFixtures.stream(3L))(2)
    for (_ <- 0 until 300) {
      val m = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      VorbisSetup.setupOrNull(m)
      VorbisSetup.setupOrNull(m.take(rnd.nextInt(m.length)))
      VorbisSetup.fullSetupOrNull(m, 1 + rnd.nextInt(2))
      VorbisSetup.fullSetupOrNull(m.take(rnd.nextInt(m.length)), 2)
    }
  }
}
