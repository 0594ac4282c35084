package graft.ext

/** Restricted Vorbis ENCODER — the round-11 promotion of the
  * test-side encoder to an engine sink (the media analogue of the
  * WARC sink: the engine can now WRITE the containers it decodes,
  * closing the synthesize-your-own-fixture loop for audio).
  *
  * Restricted-but-valid subset (every stream it emits is a
  * conformant Vorbis I stream any decoder can play):
  *   - mono, short blocks only (n = 256, one mode → zero mode bits)
  *   - flat floor 1 with zero partitions, multiplier 1, posts
  *     [255, 255] → the §7.2.3 curve is 255 everywhere and the
  *     float amplitude is EXACTLY 1.0 (`InverseDb(255) = e⁰`), so
  *     the decoded spectrum equals the integer residue
  *   - one type-1 residue over all 128 coefficients, one VQ book
  *     (dims 1, 64 entries, uniform 6-bit, lookup type 1,
  *     min −31, delta 1) → quantized coefficients in [−31, 32]
  *
  * The analysis side is a true forward MDCT: frames at 50% overlap
  * through the §4.3.1 window, X[k] = (4/n)·Σⱼ w[j]x[j]·
  * cos(π/(2n)(2j+1+n/2)(2k+1)) — the exact transpose of
  * [[VorbisDecode.imdctDirect]]'s synthesis kernel, scaled so that
  * window² overlap-add reconstructs perfectly (Princen–Bradley;
  * derived and asserted numerically in VorbisEncodeSpec). With the
  * flat unit floor the ONLY loss is coefficient quantization:
  * decode(encode(x)) ≈ gain·x to the quantizer's SNR.
  *
  * Round-trip accounting (the q148 gate): the encoder returns the
  * integer residue sum it wrote; [[VorbisDecode]]'s `Stats.residueSum`
  * (Σ rint of decoded residue) must reproduce it bit-for-bit through
  * the container+Huffman+VQ+floor path, and `postSum`/`curveSum`/
  * `pcmSamples` are closed forms of the packet count and input
  * length.
  */
object VorbisEncode {

  val BlockSize = 256
  private val Half = BlockSize / 2
  private val QMin = -31
  private val QMax = 32

  /** cos(π/(2n)(2j+1+n/2)(2k+1)) for the fixed n=256 — shared by
    * every encode (pure values).
    */
  private lazy val CosTable: Array[Array[Double]] = {
    val n = BlockSize
    Array.tabulate(Half) { k =>
      Array.tabulate(n) { j =>
        math.cos(math.Pi / (2.0 * n) * (2 * j + 1 + n / 2.0) * (2 * k + 1))
      }
    }
  }

  private lazy val Window: Array[Double] = {
    val n = BlockSize
    val w = new Array[Double](n)
    var i = 0
    while (i < n) {
      // full short-block window: leftN = rightN = n/2 slopes span it
      val x = (i + 0.5) / n * math.Pi
      val s = math.sin(x)
      w(i) = math.sin(math.Pi / 2.0 * s * s)
      i += 1
    }
    w
  }

  final case class Encoded(bytes: Array[Byte], nPackets: Int,
                           resSum: Long, nSamples: Int)

  /** Forward MDCT of one windowed frame (scale 4/n for PR against
    * the decoder's unscaled synthesis).
    */
  private def forwardMdct(frame: Array[Double]): Array[Double] = {
    val n = BlockSize
    val out = new Array[Double](Half)
    var k = 0
    while (k < Half) {
      val row = CosTable(k)
      var acc = 0.0
      var j = 0
      while (j < n) { acc += frame(j) * row(j); j += 1 }
      out(k) = acc * 4.0 / n
      k += 1
    }
    out
  }

  private def idPacket(rate: Int): Array[Byte] = {
    val w = new OggFixtures.WLsb
    w.put(0, 32)
    w.put(1, 8) // mono
    w.put(rate.toLong, 32)
    w.put(0, 32); w.put(0, 32); w.put(0, 32)
    w.put(8, 4); w.put(8, 4) // blocksizes 256 / 256
    w.put(1, 1)
    Array[Byte](1) ++ "vorbis".getBytes("US-ASCII") ++ w.bytes
  }

  private def commentPacket: Array[Byte] = {
    val w = new OggFixtures.WLsb
    val vendor = "graft-vorbis-encode".getBytes("UTF-8")
    w.put(vendor.length, 32)
    vendor.foreach(b => w.put(b & 0xFFL, 8))
    w.put(0, 32); w.put(1, 1)
    Array[Byte](3) ++ "vorbis".getBytes("US-ASCII") ++ w.bytes
  }

  private def setupPacket: Array[Byte] = {
    val w = new OggFixtures.WLsb
    w.put(1, 8) // 2 books
    // book 0: classbook — dims 2, 4 entries, uniform 2-bit, scalar
    w.put(0x564342, 24); w.put(2, 16); w.put(4, 24)
    w.put(0, 1); w.put(0, 1)
    for (_ <- 0 until 4) w.put(1, 5)
    w.put(0, 4)
    // book 1: VQ — dims 1, 64 entries, uniform 6-bit, lookup type 1,
    // min −31, delta 1, 6-bit multiplicands 0..63 → values −31..32
    w.put(0x564342, 24); w.put(1, 16); w.put(64, 24)
    w.put(0, 1); w.put(0, 1)
    for (_ <- 0 until 64) w.put(5, 5) // length − 1 → uniform 6 bits
    w.put(1, 4) // lookup type 1
    w.put((1L << 31) | (788L << 21) | 31, 32) // minimum = −31.0 (§9.2.2)
    w.put((788L << 21) | 1, 32) // delta = 1.0
    w.put(5, 4) // value_bits − 1 → 6
    w.put(0, 1) // sequence_p
    for (m <- 0 until 64) w.put(m, 6)
    // one time transform, type 0
    w.put(0, 6); w.put(0, 16)
    // one floor: type 1, ZERO partitions, multiplier 1, rangebits 8
    w.put(0, 6)
    w.put(1, 16)
    w.put(0, 5)
    w.put(0, 2) // multiplier − 1
    w.put(8, 4)
    // one residue: type 1 over [0, 128), partition size 8, 2 classes
    w.put(0, 6)
    w.put(1, 16)
    w.put(0, 24)
    w.put(128, 24)
    w.put(7, 24)
    w.put(1, 6) // classifications − 1 → 2
    w.put(0, 8) // classbook 0
    w.put(1, 3); w.put(0, 1) // cascade class 0 = 1 (pass 0 only)
    w.put(1, 3); w.put(0, 1) // cascade class 1 = 1
    w.put(1, 8) // class 0 pass 0 → book 1
    w.put(1, 8) // class 1 pass 0 → book 1
    // one mapping: 1 submap, mono, no coupling
    w.put(0, 6)
    w.put(0, 16)
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 2)
    w.put(0, 8); w.put(0, 8); w.put(0, 8)
    // one mode: short, mapping 0
    w.put(0, 6)
    w.put(0, 1); w.put(0, 16); w.put(0, 16); w.put(0, 8)
    w.put(1, 1)
    Array[Byte](5) ++ "vorbis".getBytes("US-ASCII") ++ w.bytes
  }

  /** One audio packet: flat floor posts + the quantized spectrum in
    * the decoder's exact residue-1 read order. Returns (bytes,
    * Σ quantized values).
    */
  private def audioPacket(q: Array[Int]): (Array[Byte], Long) = {
    val w = new OggFixtures.WLsb
    w.put(0, 1) // audio packet
    // one mode → ilog(0) = 0 mode bits; short block → no window flags
    w.put(1, 1) // floor nonzero
    w.put(255, 8); w.put(255, 8) // posts [255, 255]
    def code(cw: Int, len: Int): Unit = {
      var b = len - 1
      while (b >= 0) { w.put((cw >> b) & 1, 1); b -= 1 }
    }
    var sum = 0L
    // pass 0 only; 16 partitions in 8 classword groups of 2;
    // classes all 0 → classbook entry 0 (2 bits)
    var g = 0
    while (g < 8) {
      code(0, 2)
      var t = 0
      while (t < 2) {
        val base = (g * 2 + t) * 8
        var k = 0
        while (k < 8) {
          val v = q(base + k)
          sum += v
          code(v - QMin, 6)
          k += 1
        }
        t += 1
      }
      g += 1
    }
    (w.bytes, sum)
  }

  /** Encode mono PCM (nominal [−1, 1]) at the given rate. `gain`
    * scales into the quantizer range before rounding (decoded output
    * is gain·pcm; values past the book range clamp — a lossy
    * encoder's saturation, surfaced in the returned residue sum).
    */
  def encodeMono(pcm: Array[Double], rate: Int, gain: Double = 24.0): Encoded = {
    require(pcm != null && pcm.length > 0 && rate > 0)
    val n = BlockSize
    val hop = Half
    val nPackets = (pcm.length + hop - 1) / hop + 1
    val out = new java.io.ByteArrayOutputStream(4096)
    val serial = 4242L
    var seq = 0L
    def emit(htype: Int, granule: Long, pkts: Seq[Array[Byte]]): Unit = {
      out.write(OggFixtures.page(htype, granule, serial, seq,
        OggFixtures.lacings(pkts.map(_.length)), pkts.flatten.toArray))
      seq += 1
    }
    emit(0x02, 0L, Seq(idPacket(rate)))
    emit(0, 0L, Seq(commentPacket, setupPacket))
    var resSum = 0L
    val frame = new Array[Double](n)
    val q = new Array[Int](Half)
    var p = 0
    while (p < nPackets) {
      // frame p spans input [(p−1)·hop, (p−1)·hop + n): zero-padded
      // at both ends so packet pair (p−1, p) reconstructs
      // [(p−1)·hop, p·hop)
      val off = (p - 1) * hop
      var j = 0
      while (j < n) {
        val src = off + j
        frame(j) =
          (if (src >= 0 && src < pcm.length) pcm(src) else 0.0) * Window(j)
        j += 1
      }
      val spec = forwardMdct(frame)
      var k = 0
      while (k < Half) {
        val r = math.rint(spec(k) * gain).toInt
        q(k) = math.max(QMin, math.min(QMax, r))
        k += 1
      }
      val (pkt, s) = audioPacket(q)
      resSum += s
      val produced = math.min((p.toLong) * hop, pcm.length.toLong)
      emit(if (p == nPackets - 1) 0x04 else 0, produced, Seq(pkt))
      p += 1
    }
    Encoded(out.toByteArray, nPackets, resSum, pcm.length)
  }
}
