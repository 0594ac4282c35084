package graft.ext

import scala.collection.mutable.ArrayBuffer

/** Deterministic REAL-container audio fixtures for the oracle corpus
  * — the audio twin of [[VideoFixtures]]: a minimal but
  * spec-conformant FLAC encoder (16-bit PCM, fixed-order-2
  * predictor with Rice-coded residuals, verbatim fallback, correct
  * CRC-8/CRC-16 and UTF-8 frame numbers) so q128's corpus exercises
  * the [[Flac]] frame decoder for real, the way q125's MP4s exercise
  * [[H264]]. Encoder-side only what the corpus needs; the decoder's
  * full surface (LPC, escapes, stereo decorrelation, wasted bits) is
  * golden-tested in FlacSpec against an INDEPENDENT test-side
  * writer and hand-assembled byte fixtures.
  */
object AudioFixtures {

  private final class Bw {
    val bytes = new ArrayBuffer[Byte]()
    private var acc = 0
    private var nBits = 0
    def bit(v: Int): Unit = {
      acc = (acc << 1) | (v & 1)
      nBits += 1
      if (nBits == 8) { bytes += acc.toByte; acc = 0; nBits = 0 }
    }
    def bits(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { bit((v >> k) & 1); k -= 1 }
    }
    def aligned: Boolean = nBits == 0
    def toArray: Array[Byte] = { require(aligned, "unaligned"); bytes.toArray }
  }

  private def crc8(b: Seq[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= x & 0xFF
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF; k += 1 }
    }
    c
  }

  private def crc16(b: Seq[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= (x & 0xFF) << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF else (c << 1) & 0xFFFF; k += 1 }
    }
    c
  }

  /** UTF-8-style coded frame number (enough for the corpus sizes). */
  private def codedNumber(w: Bw, v: Int): Unit = {
    if (v < 0x80) w.bits(v, 8)
    else if (v < 0x800) { w.bits(0xC0 | (v >> 6), 8); w.bits(0x80 | (v & 0x3F), 8) }
    else {
      require(v < 0x10000, "frame number out of fixture range")
      w.bits(0xE0 | (v >> 12), 8)
      w.bits(0x80 | ((v >> 6) & 0x3F), 8)
      w.bits(0x80 | (v & 0x3F), 8)
    }
  }

  private def zigzag(v: Int): Long = ((v.toLong << 1) ^ (v.toLong >> 63)) & 0xFFFFFFFFL

  /** One channel's subframe: fixed order 2 + single Rice partition,
    * or verbatim when the residual resists Rice coding.
    */
  private def writeSubframe(w: Bw, s: Array[Int], from: Int, len: Int): Unit = {
    val canFixed = len > 2
    val resid = if (canFixed) Array.tabulate(len - 2)(i =>
      s(from + i + 2) - 2 * s(from + i + 1) + s(from + i)) else Array.empty[Int]
    // pick the Rice parameter minimizing the partition's bit cost
    var bestP = -1
    var bestBits = Long.MaxValue
    if (canFixed) {
      var p = 0
      while (p < 15) {
        var total = 0L
        var i = 0
        while (i < resid.length && total < Int.MaxValue) {
          total += (zigzag(resid(i)) >>> p) + 1 + p
          i += 1
        }
        if (total < bestBits) { bestBits = total; bestP = p }
        p += 1
      }
    }
    if (canFixed && bestBits < 16L * len) {
      w.bit(0); w.bits(0x08 | 2, 6); w.bit(0) // fixed order 2, no wasted
      w.bits(s(from) & 0xFFFF, 16)
      w.bits(s(from + 1) & 0xFFFF, 16)
      w.bits(0, 2)  // residual method 0 (4-bit Rice)
      w.bits(0, 4)  // partition order 0
      w.bits(bestP, 4)
      var i = 0
      while (i < resid.length) {
        val u = zigzag(resid(i))
        var q = (u >>> bestP).toInt
        while (q > 0) { w.bit(0); q -= 1 }
        w.bit(1)
        w.bits((u & ((1L << bestP) - 1)).toInt, bestP)
        i += 1
      }
    } else {
      w.bit(0); w.bits(1, 6); w.bit(0) // verbatim, no wasted
      var i = 0
      while (i < len) { w.bits(s(from + i) & 0xFFFF, 16); i += 1 }
    }
  }

  /** Encode 16-bit PCM (per-channel arrays, 1 or 2 channels,
    * independent coding) as a complete FLAC stream.
    */
  def flac(channels: Array[Array[Int]], sampleRate: Int,
           blocksize: Int = 4096): Array[Byte] = {
    require(channels.nonEmpty && channels.length <= 2)
    val n = channels(0).length
    require(channels.forall(_.length == n))
    require(sampleRate > 0 && sampleRate < (1 << 20))

    val out = new ArrayBuffer[Byte]()
    out ++= "fLaC".getBytes("US-ASCII")
    // STREAMINFO (last-metadata flag set, type 0, length 34)
    val si = new Bw
    si.bits(blocksize, 16); si.bits(blocksize, 16) // min/max blocksize
    si.bits(0, 24); si.bits(0, 24)                 // min/max framesize unknown
    si.bits(sampleRate, 20)
    si.bits(channels.length - 1, 3)
    si.bits(15, 5)                                  // bps-1 = 15
    si.bits(0, 4); si.bits(n, 32)                   // total samples (36 bits)
    (0 until 16).foreach(_ => si.bits(0, 8))        // md5 unset
    val siB = si.toArray
    out += 0x80.toByte; out += 0; out += 0; out += 34.toByte
    out ++= siB

    var frameNo = 0
    var pos = 0
    while (pos < n) {
      val len = math.min(blocksize, n - pos)
      val w = new Bw
      w.bits(0x3FFE, 14) // sync
      w.bit(0); w.bit(0) // reserved, fixed blocking
      val bsCode = if (len == blocksize && Integer.bitCount(blocksize) == 1 &&
        blocksize >= 256 && blocksize <= 32768)
        8 + Integer.numberOfTrailingZeros(blocksize) - 8
      else 7 // 16-bit explicit (covers the partial tail frame)
      w.bits(bsCode, 4)
      w.bits(0, 4)                       // sample rate from STREAMINFO
      w.bits(channels.length - 1, 4)     // independent channels
      w.bits(4, 3); w.bit(0)             // 16-bit, reserved
      codedNumber(w, frameNo)
      if (bsCode == 7) w.bits(len - 1, 16)
      require(w.aligned)
      val hdr = w.bytes
      w.bits(crc8(hdr.toSeq), 8)
      channels.foreach(ch => writeSubframe(w, ch, pos, len))
      while (!w.aligned) w.bit(0)
      val body = w.bytes
      w.bits(crc16(body.toSeq), 16)
      out ++= w.toArray
      pos += len
      frameNo += 1
    }
    out.toArray
  }

  /** 16-bit PCM mono WAV (RIFF/fmt/data) — the round-14 profile
    * corpus carriage twin of [[flac]]
    */
  def wav16(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val n = samples.length
    val dataLen = n * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    out.write("RIFF".getBytes("US-ASCII")); le32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1); le16(1); le32(sampleRate); le32(sampleRate * 2); le16(2); le16(16)
    out.write("data".getBytes("US-ASCII")); le32(dataLen)
    samples.foreach(le16)
    out.toByteArray
  }

  /** q175 corpus: a three-region 16-bit signal whose profile is pure
    * id arithmetic — nA leading zeros (silence), 300 samples of an
    * alternating-sign square wave at amplitude a (FULL SCALE when
    * id % 4 == 0 → exactly 300 clipped samples), then a constant
    * sub-−40 dBFS tail. WAV carriage for even ids, FLAC (lossless,
    * same samples) for odd — one profile oracle covers both decoders.
    */
  def profileSamples(id: Long): (Array[Int], Int) = {
    val n = 1000 + (id % 5).toInt * 200
    val nA = 200 + (id % 3).toInt * 50
    val a = if (id % 4 == 0) 32767 else 8192 + (id % 7).toInt * 1024
    val b = 100 + (id % 50).toInt
    val s = new Array[Int](n)
    var k = nA
    while (k < nA + 300) { s(k) = if ((k - nA) % 2 == 0) a else -a; k += 1 }
    k = nA + 300
    while (k < n) { s(k) = b; k += 1 }
    (s, 8000 + (id % 3).toInt * 4000)
  }

  def profileDoc(id: Long): Array[Byte] = {
    val (s, rate) = profileSamples(id)
    if (id % 2 == 0) wav16(s, rate) else flac(Array(s), rate)
  }

  /** A deterministic synthetic clip: a sum of two seed-derived tones
    * plus a seed-hashed envelope, 16-bit mono — distinct seeds land
    * far apart in fingerprint space, `perturb` adds a sparse ±LSB
    * pattern that stays within a few hamming bits.
    */
  def toneClip(seed: Int, nSamples: Int = 4096, sampleRate: Int = 8000,
               perturb: Boolean = false): Array[Byte] = {
    val h = seed * 2654435761L
    val f1 = 180.0 + (h % 700).toInt.abs
    val f2 = 900.0 + ((h >> 12) % 2300).toInt.abs
    val ph = ((h >> 24) % 628).toInt / 100.0
    val s = Array.tabulate(nSamples) { i =>
      val t = i.toDouble / sampleRate
      val env = 0.55 + 0.4 * math.sin(2 * math.Pi * t * (0.7 + (h % 5).toInt.abs) + ph)
      val v = env * (0.6 * math.sin(2 * math.Pi * f1 * t) +
        0.4 * math.sin(2 * math.Pi * f2 * t + ph))
      val base = (v * 20000).toInt
      if (perturb && i % 37 == 0) base + 3 else base
    }
    flac(Array(s), sampleRate)
  }
}
