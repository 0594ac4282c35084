package graft

import graft.ext.{Fft, Ogg, VorbisDecode, VorbisFloor, VorbisSetup}
import graft.ext.VorbisSetup.{BitsLsb, Codebook, Floor1Cfg, ResidueCfg}
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.VorbisDecode]] — the Vorbis signal path. Validation
  * discipline (the H.264/FLAC pattern): every stage is checked
  * against an INDEPENDENT test-side transcription — an own LSB
  * writer with MSB-first codeword puts, an own direct O(n²) DFT, an
  * own window formula, the spec's own published table entries — and
  * the lapped transform is checked by the Princen–Bradley
  * perfect-reconstruction property, which no shared transcription
  * error can satisfy by accident. The end-to-end test builds a
  * complete Ogg Vorbis stream with a test-side encoder and compares
  * PCM against a fully independent synthesis.
  */
class VorbisDecodeSpec extends AnyFunSuite {

  // ---- test-side LSB-first writer (§2), with MSB-first codeword put
  private final class W {
    private val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def put(v: Long, n: Int): this.type = {
      for (i <- 0 until n) bits += ((v >> i) & 1L).toInt
      this
    }
    /** Huffman codewords enter the stream MSb first (§3.2.1). */
    def code(cw: Long, len: Int): this.type = {
      for (b <- (len - 1) to 0 by -1) put((cw >> b) & 1L, 1)
      this
    }
    def bytes: Array[Byte] = {
      val out = new Array[Byte]((bits.length + 7) / 8)
      for (i <- bits.indices if bits(i) == 1)
        out(i / 8) = (out(i / 8) | (1 << (i % 8))).toByte
      out
    }
  }

  private def uniformBook(dims: Int, log2Entries: Int, lookupType: Int = 0,
                          mults: Array[Int] = Array.emptyIntArray,
                          min: Double = 0.0, delta: Double = 1.0,
                          seqP: Boolean = false): Codebook = {
    val entries = 1 << log2Entries
    val lv =
      if (lookupType == 1) VorbisSetup.lookup1Values(entries, dims)
      else if (lookupType == 2) entries * dims
      else 0
    Codebook(dims, entries, Array.fill(entries)(log2Entries),
      Array.tabulate(entries)(_.toLong), complete = true, lookupType, lv,
      min, delta, seqP, mults)
  }

  // =================================================================
  // Floor-1 curve synthesis (previously untested — shipped with the
  // round-10 groundwork commit)
  // =================================================================

  test("render_point truncates toward zero on both slopes (§9.2.6)") {
    assert(VorbisFloor.renderPoint(0, 0, 10, 7, 3) === 2)   // 21/10 → 2
    assert(VorbisFloor.renderPoint(0, 10, 10, 3, 3) === 8)  // 10 − 21/10
    assert(VorbisFloor.renderPoint(2, 5, 6, 5, 4) === 5)    // flat
    assert(VorbisFloor.renderPoint(0, 0, 4, -7, 1) === -1)  // 0 − 7/4
  }

  test("render_line equals render_point at every x (both slope signs)") {
    for (y0 <- Seq(0, 3, 50, 255); y1 <- Seq(0, 7, 128, 255); x1 <- Seq(1, 5, 32, 100)) {
      val v = new Array[Int](x1)
      VorbisFloor.renderLine(0, y0, x1, y1, v)
      for (x <- 0 until x1)
        assert(v(x) === VorbisFloor.renderPoint(0, y0, x1, y1, x),
          s"y0=$y0 y1=$y1 x1=$x1 x=$x")
    }
  }

  test("compute_final_y: hand-traced §7.2.3 step 2 (room fold, flags)") {
    // xList in parse order: 0, 16, 8; range 64
    val x = Array(0, 16, 8)
    // predicted at x=8 between (0,y0=10) and (16,y1=20) → 15
    // v=3 (odd, < room=2·min(49,15)=30) → 15 − (3+1)/2 = 13
    val (fy1, fl1) = VorbisFloor.computeFinalY(x, Array(10, 20, 3), 64)
    assert(fy1.toSeq === Seq(10, 20, 13) && fl1.toSeq === Seq(true, true, true))
    // v=4 (even) → 15 + 2 = 17
    val (fy2, _) = VorbisFloor.computeFinalY(x, Array(10, 20, 4), 64)
    assert(fy2(2) === 17)
    // v=0 → unflagged, predicted kept
    val (fy3, fl3) = VorbisFloor.computeFinalY(x, Array(10, 20, 0), 64)
    assert(fy3(2) === 15 && !fl3(2))
    // v ≥ room, highroom > lowroom: v − lowroom + predicted
    val (fy4, _) = VorbisFloor.computeFinalY(x, Array(4, 8, 40), 64)
    // predicted at 8 = 6; room = 2·6 = 12; highroom 58 > lowroom 6 → 40−6+6
    assert(fy4(2) === 40)
    // v ≥ room, highroom ≤ lowroom: predicted − v + highroom − 1
    val (fy5, _) = VorbisFloor.computeFinalY(x, Array(60, 62, 20), 64)
    // predicted = 61, highroom 3, lowroom 61, room 6 → 61 − 20 + 3 − 1 = 43
    assert(fy5(2) === 43)
  }

  test("synthesize_curve renders between flagged points and extends flat") {
    // points (0,2), (8,6) flagged, multiplier 1, n = 12
    val curve = VorbisFloor.synthesizeCurve(Array(0, 8), Array(2, 6),
      Array(true, true), 1, 64, 12)
    for (xx <- 0 until 8)
      assert(curve(xx) === VorbisFloor.renderPoint(0, 2, 8, 6, xx))
    for (xx <- 8 until 12) assert(curve(xx) === 6) // flat extension
    // unflagged interior point is skipped entirely
    val c2 = VorbisFloor.synthesizeCurve(Array(0, 8, 4), Array(2, 6, 63),
      Array(true, true, false), 1, 64, 8)
    for (xx <- 0 until 8)
      assert(c2(xx) === VorbisFloor.renderPoint(0, 2, 8, 6, xx))
    // multiplier scales the amplitude index
    val c3 = VorbisFloor.synthesizeCurve(Array(0, 4), Array(3, 5),
      Array(true, true), 4, 64, 4)
    assert(c3(0) === 12 && c3.last === VorbisFloor.renderPoint(0, 12, 4, 20, 3))
  }

  // =================================================================
  // The §7.2.4 inverse-dB table, FFT, IMDCT, window
  // =================================================================

  test("floor1_inverse_dB_table: the spec's published entries") {
    assert(VorbisDecode.InverseDb(0).toFloat === 1.0649863e-07f)
    assert(VorbisDecode.InverseDb(1).toFloat === 1.1341951e-07f)
    assert(VorbisDecode.InverseDb(255) === 1.0) // printed 0.99999999 = 1.0f
    assert(VorbisDecode.InverseDb(254).toFloat === 0.9389798f)
    // monotone, 0.546875 dB per step throughout
    for (i <- 1 until 256) {
      val ratio = VorbisDecode.InverseDb(i) / VorbisDecode.InverseDb(i - 1)
      assert(math.abs(ratio - math.pow(10.0, 0.546875 / 20.0)) < 1e-6)
    }
  }

  test("Fft.inverseUnscaled matches a direct DFT transcription") {
    val rnd = new scala.util.Random(41)
    for (n <- Seq(1, 2, 8, 64, 256)) {
      val re = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      val im = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      val (er, ei) = (new Array[Double](n), new Array[Double](n))
      for (j <- 0 until n; k <- 0 until n) {
        val a = 2.0 * math.Pi * k * j / n
        er(j) += re(k) * math.cos(a) - im(k) * math.sin(a)
        ei(j) += re(k) * math.sin(a) + im(k) * math.cos(a)
      }
      Fft.inverseUnscaled(re, im)
      for (j <- 0 until n) {
        assert(math.abs(re(j) - er(j)) < 1e-9 * (1 + math.abs(er(j))))
        assert(math.abs(im(j) - ei(j)) < 1e-9 * (1 + math.abs(ei(j))))
      }
    }
  }

  test("imdct (FFT path) equals imdctDirect (normative O(n²) form)") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(64, 256, 2048)) {
      val spec = Array.fill(n / 2)(rnd.nextDouble() * 2 - 1)
      val a = VorbisDecode.imdct(spec, n)
      val b = VorbisDecode.imdctDirect(spec, n)
      for (j <- 0 until n)
        assert(math.abs(a(j) - b(j)) < 1e-9 * (1 + math.abs(b(j))),
          s"n=$n j=$j")
    }
  }

  test("window: §4.3.1 shape, and Princen–Bradley power complementarity") {
    val n = 256
    val w = VorbisDecode.window(n, n / 2, n / 2)
    // own transcription of the full-slope formula
    for (i <- 0 until n / 2) {
      val exp = math.sin(math.Pi / 2.0 *
        math.pow(math.sin((i + 0.5) / n * math.Pi), 2))
      assert(math.abs(w(i) - exp) < 1e-12)
    }
    // rising then falling, symmetric, lapped-unity
    for (i <- 0 until n / 2)
      assert(math.abs(w(i) * w(i) + w(i + n / 2) * w(i + n / 2) - 1.0) < 1e-12)
    assert(math.abs(w(n / 2 - 1) - 1.0) < 1e-4 && w(0) > 0 && w(0) < 0.01)
    // long block with a short left neighbor: zeros outside the narrow slope
    val wl = VorbisDecode.window(256, 32, 128)
    assert(wl(256 / 4 - 16 - 1) === 0.0 && wl(256 / 4 + 16) === 1.0)
  }

  test("IMDCT + window + overlap-add satisfy TDAC perfect reconstruction") {
    // forward-MDCT a known signal with the test's own transcription;
    // the decoder-side inverse chain must reconstruct it up to the
    // constant transform gain — a property no mirrored transcription
    // bug can fake.
    val n = 64
    val h = n / 2
    val rnd = new scala.util.Random(7)
    val x = Array.fill(h * 6)(rnd.nextDouble() * 2 - 1)
    val w = VorbisDecode.window(n, h, h)
    def fwd(m: Int): Array[Double] = {
      val out = new Array[Double](h)
      for (k <- 0 until h; j <- 0 until n)
        out(k) += x(m * h + j) * w(j) *
          math.cos(2.0 * math.Pi / n * (j + 0.5 + n / 4.0) * (k + 0.5))
      out
    }
    val recon = new Array[Double](x.length)
    for (m <- 0 to 4) {
      val y = VorbisDecode.imdct(fwd(m), n)
      for (j <- 0 until n) recon(m * h + j) += y(j) * w(j)
    }
    // interior samples (first and last half-frames lack a partner)
    val gain = recon(h) / x(h)
    assert(math.abs(gain - n / 4.0) < 1e-6) // the transform's fixed gain
    for (t <- h until x.length - h)
      assert(math.abs(recon(t) / gain - x(t)) < 1e-9, s"t=$t")
  }

  // =================================================================
  // Coupling, VQ, Huffman, residue shapes
  // =================================================================

  test("inverse coupling: the §4.3.4 square-polar truth table") {
    def c(m: Double, a: Double): (Double, Double) = {
      val mv = Array(m); val av = Array(a)
      VorbisDecode.inverseCoupling(mv, av)
      (mv(0), av(0))
    }
    assert(c(5, 3) === ((5.0, 2.0)))
    assert(c(5, -3) === ((2.0, 5.0)))
    assert(c(-5, 3) === ((-5.0, -2.0)))
    assert(c(-5, -3) === ((-2.0, -5.0)))
    assert(c(0, 0) === ((0.0, 0.0)))
  }

  test("VQ lookup type 1: lattice indexing with sequence_p accumulation") {
    // entries 16, dims 2 → lookup1_values = 4; mults 0..3, min 5, delta 2
    val b = uniformBook(2, 4, lookupType = 1, mults = Array(0, 1, 2, 3),
      min = 5.0, delta = 2.0, seqP = true)
    for (e <- 0 until 16) {
      val v = VorbisDecode.vqVector(b, e)
      val v0 = (e % 4) * 2.0 + 5.0
      val v1 = ((e / 4) % 4) * 2.0 + 5.0 + v0 // sequence_p adds last
      assert(v.toSeq === Seq(v0, v1), s"entry $e")
    }
  }

  test("VQ lookup type 2: flat table rows") {
    val b = uniformBook(2, 2, lookupType = 2,
      mults = Array(1, 2, 3, 4, 5, 6, 7, 0))
    assert(VorbisDecode.vqVector(b, 0).toSeq === Seq(1.0, 2.0))
    assert(VorbisDecode.vqVector(b, 3).toSeq === Seq(7.0, 0.0))
  }

  test("Huffman decode walks canonical codewords MSb-first") {
    // the spec's §3.2.1 example book
    val lengths = Array(2, 4, 4, 4, 4, 2, 3, 3)
    val words = Array(0L, 4L, 5L, 6L, 7L, 2L, 6L, 7L)
    val book = Codebook(1, 8, lengths, words, complete = true, 0, 0, 0, 0,
      sequenceP = false)
    val tree = new VorbisDecode.HuffTree(book)
    val w = new W
    val order = Seq(3, 0, 7, 5, 1, 6, 2, 4)
    order.foreach(e => w.code(words(e), lengths(e)))
    val r = new BitsLsb(w.bytes, 0)
    order.foreach(e => assert(tree.decode(r) === e))
    // an unassigned prefix in an incomplete book throws
    val inc = Codebook(1, 2, Array(2, 2), Array(0L, 1L), complete = false,
      0, 0, 0, 0, sequenceP = false)
    val t2 = new VorbisDecode.HuffTree(inc)
    val bad = new BitsLsb(new W().put(1, 1).put(1, 1).bytes, 0)
    intercept[IllegalArgumentException] { t2.decode(bad) }
  }

  // shared residue scaffolding: classbook (2-dim, 4 entries, 2-bit) +
  // type-2-lookup VQ book (2-dim, 4 entries, 2-bit)
  private val ClassBook = uniformBook(2, 2)
  private val VqBook = uniformBook(2, 2, lookupType = 2,
    mults = Array(1, 2, 3, 4, 5, 6, 7, 0))

  private def resCfg(rtype: Int, cascade: Array[Int]): ResidueCfg =
    ResidueCfg(rtype, 0, 16, 8, cascade.length, 0, cascade,
      cascade.map(c => Array.tabulate(8)(p =>
        if ((c & (1 << p)) != 0) 1 else -1)))

  private def runResidue(cfg: ResidueCfg, packed: W, nVecs: Int,
                         size: Int = 32): Array[Array[Double]] = {
    val vs = Array.fill(nVecs)(new Array[Double](size))
    VorbisDecode.residue01(new BitsLsb(packed.bytes, 0), cfg,
      format0 = cfg.residueType == 0, Array(ClassBook, VqBook),
      Array(new VorbisDecode.HuffTree(ClassBook),
        new VorbisDecode.HuffTree(VqBook)), vs,
      Array.fill(nVecs)(true))
    vs
  }

  test("residue format 1: consecutive writes, classword radix split") {
    // classes [0,1] → classword 0·2+1 = 1; both classes decode pass 0
    val w = new W().code(1, 2)
    for (e <- Seq(0, 1, 2, 3)) w.code(e, 2) // partition 0
    for (_ <- 0 until 4) w.code(3, 2)       // partition 1
    val v = runResidue(resCfg(1, Array(1, 1)), w, 1)(0)
    assert(v.slice(0, 8).toSeq === Seq(1, 2, 3, 4, 5, 6, 7, 0).map(_.toDouble))
    assert(v.slice(8, 16).toSeq === Seq(7, 0, 7, 0, 7, 0, 7, 0).map(_.toDouble))
    assert(v.slice(16, 32).forall(_ === 0.0)) // end=16 clamps
  }

  test("residue format 0: strided scatter") {
    val w = new W().code(0, 2) // classes [0,0]
    for (e <- Seq(0, 1, 2, 3)) w.code(e, 2)
    for (e <- Seq(0, 0, 0, 0)) w.code(e, 2)
    val v = runResidue(resCfg(0, Array(1, 1)), w, 1)(0)
    // step = 8/2 = 4: entry i writes v[i] and v[i+4]
    assert(v.slice(0, 8).toSeq === Seq(1, 3, 5, 7, 2, 4, 6, 0).map(_.toDouble))
    assert(v.slice(8, 16).toSeq === Seq(1, 1, 1, 1, 2, 2, 2, 2).map(_.toDouble))
  }

  test("residue passes accumulate (+=), pass-clear books read nothing") {
    // class 0 cascade = 3: passes 0 and 1 both use the VQ book
    val w = new W().code(0, 2)      // classes [0,0]
    for (_ <- 0 until 8) w.code(1, 2) // pass 0: both partitions entry 1
    for (_ <- 0 until 8) w.code(2, 2) // pass 1: entry 2 → adds (5,6)
    val v = runResidue(resCfg(1, Array(3, 1)), w, 1)(0)
    assert(v(0) === 3.0 + 5.0 && v(1) === 4.0 + 6.0) // (3,4)+(5,6)
  }

  test("residue multi-vector: classwords and partitions interleave per vector") {
    // two vectors (uncoupled stereo), classes v0=[0,1], v1=[1,0]
    val w = new W().code(1, 2).code(2, 2)
    // partition 0: v0 then v1; partition 1: v0 then v1
    for (e <- Seq(0, 1, 2, 3)) w.code(e, 2) // v0 p0
    for (e <- Seq(1, 1, 1, 1)) w.code(e, 2) // v1 p0
    for (e <- Seq(2, 2, 2, 2)) w.code(e, 2) // v0 p1
    for (e <- Seq(3, 3, 3, 3)) w.code(e, 2) // v1 p1
    val vs = runResidue(resCfg(1, Array(1, 1)), w, 2)
    assert(vs(0).slice(0, 4).toSeq === Seq(1.0, 2.0, 3.0, 4.0))
    assert(vs(1).slice(0, 2).toSeq === Seq(3.0, 4.0))
    assert(vs(0).slice(8, 10).toSeq === Seq(5.0, 6.0))
    assert(vs(1).slice(8, 10).toSeq === Seq(7.0, 0.0))
  }

  test("residue type 2 interleaves channels into one vector") {
    val cfg = resCfg(2, Array(1, 1))
    val w = new W().code(1, 2)
    for (e <- Seq(0, 1, 2, 3)) w.code(e, 2)
    for (_ <- 0 until 4) w.code(3, 2)
    val chs = Array.fill(2)(new Array[Double](16))
    VorbisDecode.residue2(new BitsLsb(w.bytes, 0), cfg,
      Array(ClassBook, VqBook),
      Array(new VorbisDecode.HuffTree(ClassBook),
        new VorbisDecode.HuffTree(VqBook)), chs, Array(true, true))
    // combined [1,2,3,4,5,6,7,0,7,0,...] deinterleaves even→ch0, odd→ch1
    assert(chs(0).slice(0, 4).toSeq === Seq(1.0, 3.0, 5.0, 7.0))
    assert(chs(1).slice(0, 4).toSeq === Seq(2.0, 4.0, 6.0, 0.0))
  }

  // =================================================================
  // End-to-end: a test-side Ogg Vorbis ENCODER vs independent synthesis
  // =================================================================

  /** Minimal page writer (own transcription; every packet whole on
    * its own page).
    */
  private def oggStream(packets: Seq[Array[Byte]], lastGranule: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for ((pkt, idx) <- packets.zipWithIndex) {
      val segs = {
        val s = scala.collection.mutable.ArrayBuffer.empty[Int]
        var rem = pkt.length
        while (rem >= 255) { s += 255; rem -= 255 }
        s += rem
        s.toArray
      }
      val full = new Array[Byte](27 + segs.length + pkt.length)
      full(0) = 'O'; full(1) = 'g'; full(2) = 'g'; full(3) = 'S'
      full(5) = (if (idx == 0) 2 else if (idx == packets.length - 1) 4 else 0).toByte
      val gran = if (idx == packets.length - 1) lastGranule else idx.toLong
      for (i <- 0 until 8) full(6 + i) = ((gran >> (8 * i)) & 0xFF).toByte
      full(14) = 7 // serial
      for (i <- 0 until 4) full(18 + i) = ((idx.toLong >> (8 * i)) & 0xFF).toByte
      full(26) = segs.length.toByte
      for (i <- segs.indices) full(27 + i) = segs(i).toByte
      System.arraycopy(pkt, 0, full, 27 + segs.length, pkt.length)
      val c = Ogg.crc(full, 0, full.length, 22)
      for (i <- 0 until 4) full(22 + i) = ((c >> (8 * i)) & 0xFF).toByte
      out.write(full)
    }
    out.toByteArray
  }

  private val Bs0 = 64
  private val Bs1 = 256

  private def idPacket(channels: Int): Array[Byte] = {
    val w = new W
    w.put(0, 32).put(channels, 8).put(44100, 32)
    w.put(0, 32).put(0, 32).put(0, 32)
    w.put(6, 4).put(8, 4) // blocksizes 64 / 256
    w.put(1, 1)
    Array[Byte](1) ++ "vorbis".getBytes("US-ASCII") ++ w.bytes
  }

  private def commentPkt: Array[Byte] = {
    val w = new W
    w.put(0, 32).put(0, 32).put(1, 1)
    Array[Byte](3) ++ "vorbis".getBytes("US-ASCII") ++ w.bytes
  }

  /** Setup: 4 books (class / VQ-type-2 / floor scalar / VQ-type-1
    * with sequence_p), one 4-point floor (multiplier 2, rangebits 5,
    * ONE subclass bit — the masterbook/subclass-select decode path:
    * master value bit 0 routes dim 0 to book 2 or the unused −1
    * book, bit 1 routes dim 1), three residues (types 0/1/2,
    * classes 2, cascade [1, 3]; class-1 pass 1 uses the type-1
    * lattice book), three mappings (one per residue, stereo coupling
    * when channels = 2), six modes (short+long per mapping).
    */
  private def setupPkt(channels: Int): Array[Byte] = {
    val w = new W
    w.put(3, 8) // 4 books
    // book 0: classbook, dims 2, 4 entries, uniform 2
    w.put(0x564342, 24).put(2, 16).put(4, 24).put(0, 1).put(0, 1)
    for (_ <- 0 until 4) w.put(1, 5)
    w.put(0, 4)
    // book 1: VQ type 2, dims 2, 4 entries, uniform 2, mults 1..7,0
    w.put(0x564342, 24).put(2, 16).put(4, 24).put(0, 1).put(0, 1)
    for (_ <- 0 until 4) w.put(1, 5)
    w.put(2, 4) // lookup type 2
    w.put(0, 32) // min = 0
    w.put((788L << 21) | 1, 32) // delta = 1.0
    w.put(3, 4) // value_bits 4
    w.put(0, 1) // sequence_p
    for (m <- Seq(1, 2, 3, 4, 5, 6, 7, 0)) w.put(m, 4)
    // book 2: floor scalar (also the floor masterbook), dims 1,
    // 8 entries, uniform 3
    w.put(0x564342, 24).put(1, 16).put(8, 24).put(0, 1).put(0, 1)
    for (_ <- 0 until 8) w.put(2, 5)
    w.put(0, 4)
    // book 3: VQ type 1 lattice, dims 2, 16 entries, uniform 4,
    // lookup1_values = 4, mults 0..3, sequence_p SET
    w.put(0x564342, 24).put(2, 16).put(16, 24).put(0, 1).put(0, 1)
    for (_ <- 0 until 16) w.put(3, 5)
    w.put(1, 4) // lookup type 1
    w.put(0, 32) // min = 0
    w.put((788L << 21) | 1, 32) // delta = 1.0
    w.put(2, 4) // value_bits 3
    w.put(1, 1) // sequence_p
    for (m <- Seq(0, 1, 2, 3)) w.put(m, 3)
    // one time transform
    w.put(0, 6).put(0, 16)
    // one floor: type 1, 1 partition, class 0 (dims 2, ONE subclass
    // bit, masterbook 2, subclass books [2, unused]), multiplier 2
    // (range 128), rangebits 5, xs 10, 20
    w.put(0, 6)
    w.put(1, 16).put(1, 5).put(0, 4)
    w.put(1, 3) // class dims − 1 → 2
    w.put(1, 2) // subclasses = 1 bit
    w.put(2, 8) // masterbook = book 2
    w.put(3, 8).put(0, 8) // subclass books: read−1 → [2, −1]
    w.put(1, 2) // multiplier − 1 → 2
    w.put(5, 4) // rangebits
    w.put(10, 5).put(20, 5)
    // three residues: types 0, 1, 2
    w.put(2, 6)
    for (t <- 0 to 2) {
      w.put(t, 16).put(0, 24).put(16, 24).put(7, 24) // begin 0 end 16 psize 8
      w.put(1, 6) // 2 classifications
      w.put(0, 8) // classbook 0
      w.put(1, 3).put(0, 1) // cascade class 0 = 1
      w.put(3, 3).put(0, 1) // cascade class 1 = 3
      w.put(1, 8) // class 0 pass 0 → book 1
      w.put(1, 8).put(3, 8) // class 1: pass 0 → book 1, pass 1 → book 3
    }
    // three mappings (one per residue)
    w.put(2, 6)
    for (t <- 0 to 2) {
      w.put(0, 16)
      w.put(0, 1) // one submap
      if (channels == 2) {
        w.put(1, 1).put(0, 8) // one coupling step
        w.put(0, 1).put(1, 1) // magnitude 0, angle 1
      } else w.put(0, 1)
      w.put(0, 2)
      w.put(0, 8).put(0, 8).put(t, 8) // time, floor 0, residue t
    }
    // six modes: (short, long) × mapping
    w.put(5, 6)
    for (m <- 0 until 6) {
      w.put(m % 2, 1).put(0, 16).put(0, 16).put(m / 2, 8)
    }
    w.put(1, 1)
    Array[Byte](5) ++ "vorbis".getBytes("US-ASCII") ++ w.bytes
  }

  /** Deterministic per-packet choices for the end-to-end streams. */
  private def postsFor(p: Int, c: Int): Array[Int] =
    Array((13 + 7 * p + 3 * c) % 128, (90 - 5 * p + c) % 128,
      (p + c) % 8, (3 * p + 2 * c + 1) % 8)
  /** Floor masterbook value: bit 0 routes dim 0 (0 → book 2,
    * 1 → unused), bit 1 routes dim 1.
    */
  private def masterFor(p: Int, c: Int): Int = (p + 2 * c + 1) % 8
  /** The post values the decoder should see after subclass routing. */
  private def effPostsFor(p: Int, c: Int): Array[Int] = {
    val raw = postsFor(p, c)
    val m = masterFor(p, c)
    Array(raw(0), raw(1),
      if ((m & 1) == 0) raw(2) else 0,
      if (((m >> 1) & 1) == 0) raw(3) else 0)
  }
  private def classesFor(p: Int, j: Int): Array[Int] =
    Array((p + j) % 2, (p + j + 1) % 2)
  private def entryFor(p: Int, j: Int, t: Int, pass: Int, k: Int): Int =
    (p + 2 * j + 3 * t + pass + k) % 4
  private def entry16For(p: Int, j: Int, t: Int, k: Int): Int =
    (p + 2 * j + 5 * t + 3 * k) % 16

  /** Encode one audio packet, mirroring the decoder's exact read
    * order (mode → window flags → floors → residue).
    */
  private def audioPkt(p: Int, mode: Int, prevLong: Boolean, nextLong: Boolean,
                       channels: Int): Array[Byte] = {
    val w = new W
    w.put(0, 1)
    w.put(mode, 3)
    val long = mode % 2 == 1
    if (long) w.put(if (prevLong) 1 else 0, 1).put(if (nextLong) 1 else 0, 1)
    for (c <- 0 until channels) {
      w.put(1, 1) // nonzero
      val posts = postsFor(p, c)
      w.put(posts(0), 7).put(posts(1), 7)
      val m = masterFor(p, c)
      w.code(m, 3) // masterbook codeword (book 2, canonical = identity)
      if ((m & 1) == 0) w.code(posts(2), 3)       // dim 0 via book 2
      if (((m >> 1) & 1) == 0) w.code(posts(3), 3) // dim 1 via book 2
    }
    val rtype = mode / 2
    val nVecs = if (rtype == 2) 1 else channels
    // partitions_to_read = 16/8 = 2; classbook dims 2 → one classword
    // per vector covers both partitions
    val cls = Array.tabulate(nVecs, 2)((j, t) => classesFor(p, j)(t))
    for (pass <- 0 to 1) {
      // pass 0: classwords for every vector
      if (pass == 0)
        for (j <- 0 until nVecs) w.code(cls(j)(0) * 2 + cls(j)(1), 2)
      for (t <- 0 until 2; j <- 0 until nVecs) {
        // class cascade: class 0 → pass 0 only; class 1 → passes 0+1
        // (pass 1 through the 4-bit type-1 lattice book)
        if (pass == 0)
          for (k <- 0 until 4) w.code(entryFor(p, j, t, 0, k), 2)
        else if (cls(j)(t) == 1)
          for (k <- 0 until 4) w.code(entry16For(p, j, t, k), 4)
      }
    }
    w.bytes
  }

  /** The independent expected synthesis — own residue scatter, own
    * coupling, own per-point floor curve, own dB formula, own direct
    * IMDCT, own window, own overlap-add.
    */
  private def expectedPcm(nPackets: Int, modes: Seq[Int], channels: Int): Array[Array[Double]] = {
    val mults = Array(1, 2, 3, 4, 5, 6, 7, 0)
    def blockOf(m: Int) = if (m % 2 == 1) Bs1 else Bs0
    def testWin(n: Int, leftN: Int, rightN: Int): Array[Double] = {
      val w = new Array[Double](n)
      for (i <- 0 until n) {
        val ls = n / 4 - leftN / 2; val le = n / 4 + leftN / 2
        val rs = 3 * n / 4 - rightN / 2; val rE = 3 * n / 4 + rightN / 2
        w(i) =
          if (i < ls || i >= rE) 0.0
          else if (i < le)
            math.sin(math.Pi / 2 * math.pow(math.sin((i - ls + 0.5) / leftN * math.Pi / 2), 2))
          else if (i < rs) 1.0
          else
            math.sin(math.Pi / 2 * math.pow(
              math.sin((i - rs + 0.5) / rightN * math.Pi / 2 + math.Pi / 2), 2))
      }
      w
    }
    def testDb(i: Int): Double =
      math.exp((i - 255) * 0.546875 * 0.11512925).toFloat.toDouble
    // §7.2.3 step 2, own transcription, for the 4-point list [0,32,10,20]
    def finalY(posts: Array[Int]): Array[(Int, Int, Boolean)] = {
      val xs = Array(0, 32, 10, 20)
      val range = 128
      val fy = new Array[Int](4)
      val fl = new Array[Boolean](4)
      fy(0) = posts(0); fy(1) = posts(1); fl(0) = true; fl(1) = true
      for (i <- 2 until 4) {
        val lo = (0 until i).filter(xs(_) < xs(i)).maxBy(xs(_))
        val hi = (0 until i).filter(xs(_) > xs(i)).minBy(xs(_))
        val dy = fy(hi) - fy(lo); val adx = xs(hi) - xs(lo)
        val off = math.abs(dy) * (xs(i) - xs(lo)) / adx
        var pred = if (dy < 0) fy(lo) - off else fy(lo) + off
        pred = math.max(0, math.min(range - 1, pred))
        val v = posts(i)
        val room = 2 * math.min(range - pred, pred)
        if (v != 0) {
          fl(lo) = true; fl(hi) = true; fl(i) = true
          fy(i) =
            if (v >= room) {
              if (range - pred > pred) v - pred + pred // v − lowroom + predicted
              else pred - v + (range - pred) - 1
            } else if (v % 2 == 1) pred - (v + 1) / 2
            else pred + v / 2
        } else fy(i) = pred
      }
      (0 until 4).map(i => (xs(i), fy(i), fl(i))).toArray
    }
    def curveAt(pts: Array[(Int, Int, Boolean)], mult: Int, x: Int): Int = {
      val used = pts.filter(_._3).sortBy(_._1)
        .map(p => (p._1, math.max(0, math.min(127, p._2)) * mult))
      if (x >= used.last._1) used.last._2
      else {
        val i = used.lastIndexWhere(_._1 <= x)
        val (x0, y0) = used(i); val (x1, y1) = used(i + 1)
        val dy = y1 - y0
        val off = math.abs(dy) * (x - x0) / (x1 - x0)
        if (dy < 0) y0 - off else y0 + off
      }
    }
    val chans = Array.fill(channels)(scala.collection.mutable.ArrayBuffer.empty[Double])
    var pending: Array[Array[Double]] = null
    var np = 0
    for (p <- 0 until nPackets) {
      val mode = modes(p)
      val n = blockOf(mode)
      val rtype = mode / 2
      val nVecs = if (rtype == 2) 1 else channels
      val size = if (rtype == 2) channels * n / 2 else n / 2
      val vecs = Array.fill(nVecs)(new Array[Double](size))
      for (pass <- 0 to 1; t <- 0 until 2; j <- 0 until nVecs) {
        val cl = classesFor(p, j)(t)
        if (pass == 0 || cl == 1) {
          for (k <- 0 until 4) {
            val (v0, v1) =
              if (pass == 0) {
                val e = entryFor(p, j, t, 0, k)
                (mults(2 * e).toDouble, mults(2 * e + 1).toDouble)
              } else {
                // book 3: type-1 lattice, mults 0..3, sequence_p adds
                // the previous dim's value
                val e = entry16For(p, j, t, k)
                val a = (e % 4).toDouble
                (a, ((e / 4) % 4).toDouble + a)
              }
            if (rtype == 0) { // strided: step 4, entry k → slots k, k+4
              vecs(j)(8 * t + k) += v0; vecs(j)(8 * t + k + 4) += v1
            } else {
              vecs(j)(8 * t + 2 * k) += v0; vecs(j)(8 * t + 2 * k + 1) += v1
            }
          }
        }
      }
      val res = Array.fill(channels)(new Array[Double](n / 2))
      if (rtype == 2) {
        for (k <- 0 until n / 2; c <- 0 until channels)
          res(c)(k) = vecs(0)(k * channels + c)
      } else {
        for (c <- 0 until channels; k <- 0 until n / 2) res(c)(k) = vecs(c)(k)
      }
      if (channels == 2) { // own coupling transcription
        for (k <- 0 until n / 2) {
          val m = res(0)(k); val a = res(1)(k)
          val (nm, na) =
            if (m > 0) { if (a > 0) (m, m - a) else (m + a, m) }
            else { if (a > 0) (m, m + a) else (m - a, m) }
          res(0)(k) = nm; res(1)(k) = na
        }
      }
      val long = mode % 2 == 1
      val prevLong = p > 0 && modes(p - 1) % 2 == 1
      val nextLong = p + 1 < nPackets && modes(p + 1) % 2 == 1
      val leftN = if (long && !prevLong) Bs0 / 2 else n / 2
      val rightN = if (long && !nextLong) Bs0 / 2 else n / 2
      val w = testWin(n, leftN, rightN)
      val windowed = Array.tabulate(channels) { c =>
        val pts = finalY(effPostsFor(p, c))
        val spec = Array.tabulate(n / 2)(i => res(c)(i) * testDb(curveAt(pts, 2, i)))
        val time = new Array[Double](n)
        for (j <- 0 until n; k <- 0 until n / 2)
          time(j) += spec(k) *
            math.cos(math.Pi / (2.0 * n) * (2 * j + 1 + n / 2.0) * (2 * k + 1))
        for (j <- 0 until n) time(j) *= w(j)
        time
      }
      if (pending == null) {
        pending = windowed.map(x => x.slice(x.length / 2, x.length))
        np = n
      } else {
        val outLen = np / 4 + n / 4
        val shift = np / 4 - n / 4
        for (c <- 0 until channels) {
          for (k <- 0 until outLen) {
            var v = if (k < pending(c).length) pending(c)(k) else 0.0
            val ci = k - shift
            if (ci >= 0 && ci < n) v += windowed(c)(ci)
            chans(c) += v
          }
          pending(c) = windowed(c).slice(n / 2, n)
        }
        np = n
      }
    }
    chans.map(_.toArray)
  }

  private def buildStream(nPackets: Int, modes: Seq[Int], channels: Int): Array[Byte] = {
    def blockOf(m: Int) = if (m % 2 == 1) Bs1 else Bs0
    val total = (1 until nPackets)
      .map(p => blockOf(modes(p - 1)) / 4 + blockOf(modes(p)) / 4).sum.toLong
    val audio = (0 until nPackets).map { p =>
      audioPkt(p, modes(p),
        prevLong = p > 0 && modes(p - 1) % 2 == 1,
        nextLong = p + 1 < nPackets && modes(p + 1) % 2 == 1, channels)
    }
    oggStream(Seq(idPacket(channels), commentPkt, setupPkt(channels)) ++ audio, total)
  }

  test("end-to-end: decode equals the independent synthesis (stereo, all residue types, mixed blocks)") {
    val modes = Seq(0, 3, 5, 2, 1, 4, 0) // every residue type, long/short mix
    val bytes = buildStream(7, modes, 2)
    val pcm = VorbisDecode.decodeOrNull(bytes)
    assert(pcm != null, "decode returned null")
    assert(pcm.sampleRate === 44100 && pcm.channels === 2)
    val exp = expectedPcm(7, modes, 2)
    assert(pcm.nSamples === exp(0).length)
    for (c <- 0 until 2; t <- exp(c).indices)
      assert(math.abs(pcm.samples(c)(t) - exp(c)(t)) < 1e-8, s"c=$c t=$t")
  }

  test("end-to-end: mono stream decodes and matches") {
    val modes = Seq(1, 0, 3, 5, 2)
    val bytes = buildStream(5, modes, 1)
    val pcm = VorbisDecode.decodeOrNull(bytes)
    assert(pcm != null && pcm.channels === 1)
    val exp = expectedPcm(5, modes, 1)
    assert(pcm.nSamples === exp(0).length)
    for (t <- exp(0).indices)
      assert(math.abs(pcm.samples(0)(t) - exp(0)(t)) < 1e-8, s"t=$t")
  }

  test("granule position trims the decoded tail") {
    val modes = Seq(0, 0, 0, 0)
    def blockOf(m: Int) = 64
    val audio = (0 until 4).map(p => audioPkt(p, 0, prevLong = false,
      nextLong = false, channels = 1))
    val full = oggStream(
      Seq(idPacket(1), commentPkt, setupPkt(1)) ++ audio, 96L) // 3·32
    val pcm = VorbisDecode.decodeOrNull(full)
    assert(pcm != null && pcm.nSamples === 96)
    val trimmed = oggStream(
      Seq(idPacket(1), commentPkt, setupPkt(1)) ++ audio, 80L)
    assert(VorbisDecode.decodeOrNull(trimmed).nSamples === 80)
  }

  test("stats capture the integer stages") {
    val modes = Seq(0, 2, 4)
    val bytes = buildStream(3, modes, 1)
    val stats = new VorbisDecode.Stats
    assert(VorbisDecode.decodeOrNull(bytes, stats) != null)
    assert(stats.audioPackets === 3)
    val expPosts = (0 until 3).flatMap(p => effPostsFor(p, 0)).map(_.toLong).sum
    assert(stats.postSum === expPosts)
    assert(stats.pcmSamples === 64L)
    assert(stats.residueSum > 0 && stats.curveSum > 0)
  }

  test("fuzz: random corruption and truncation never throw (400 trials)") {
    val rnd = new scala.util.Random(1234)
    val goods = Array(buildStream(5, Seq(0, 1, 2, 3, 4), 2),
      buildStream(4, Seq(1, 5, 3, 0), 1))
    var nulls = 0
    for (t <- 0 until 400) {
      val base = goods(t % 2)
      val b = base.clone()
      rnd.nextInt(3) match {
        case 0 => // flip 1-4 random bytes
          for (_ <- 0 to rnd.nextInt(4))
            b(rnd.nextInt(b.length)) = (b(rnd.nextInt(b.length)) ^ (1 << rnd.nextInt(8))).toByte
        case 1 => // truncate
          val cut = java.util.Arrays.copyOf(b, 1 + rnd.nextInt(b.length - 1))
          if (VorbisDecode.decodeOrNull(cut) == null) nulls += 1
        case _ => // random garbage with the magic kept
          rnd.nextBytes(b)
          b(0) = 'O'; b(1) = 'g'; b(2) = 'g'; b(3) = 'S'
      }
      val r = VorbisDecode.decodeOrNull(b) // must not throw
      if (r == null) nulls += 1
    }
    // page CRCs catch nearly everything; the count just proves the
    // corruption actually bit
    assert(nulls > 300, s"nulls=$nulls")
  }

  test("violations null loudly: truncation, bad mode, floor-0 absence") {
    val good = buildStream(3, Seq(0, 1, 2), 2)
    assert(VorbisDecode.decodeOrNull(good) != null)
    // corrupt one audio byte → CRC failure nulls at the page walk
    val bad = good.clone
    bad(bad.length - 3) = (bad(bad.length - 3) ^ 0x55).toByte
    assert(VorbisDecode.decodeOrNull(bad) == null)
    // a non-Vorbis container
    assert(VorbisDecode.decodeOrNull("OggS junk".getBytes) == null)
    assert(VorbisDecode.decodeOrNull(null) == null)
  }
}
