package graft.ext

/** JDK-only FLAC decoder — full SAMPLE decode, not just metadata:
  * the lossless-audio sibling of [[Jpeg]]/[[Png]]/[[H264]], built
  * from the public FLAC format specification (frame headers with
  * UTF-8-coded numbers and CRC-8, subframe types CONSTANT / VERBATIM
  * / FIXED order 0–4 / LPC order 1–32, Rice-coded residual
  * partitions with 4- and 5-bit parameters and the raw-bits escape,
  * wasted-bits shifts, left/side + right/side + mid/side stereo
  * decorrelation, frame CRC-16). This closes the last dedup-modality
  * gap: text/image/video already decode for real, audio stopped at
  * headers ([[MediaMeta]]) until now.
  *
  * Contract mirrors the other decoders: `decodeOrNull` returns null
  * on anything outside the subset (reserved codes, CRC mismatch,
  * truncation, oversized streams) — wrong samples are worse than no
  * samples. Per-row and allocation-bounded: a narrow kernel that
  * scales with executor count, no shuffle.
  */
object Flac {

  /** (sampleRate, channels, bitsPerSample, totalSamples, durationSec)
    * or null — STREAMINFO only, no frame decode (the [[MediaMeta]]
    * triage path).
    */
  def metaOrNull(bytes: Array[Byte]): (Long, Int, Int, Long, Double) = {
    try {
      if (bytes == null || bytes.length < 42) return null
      if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C'))
        return null
      // first metadata block header: 1 byte type (low 7 bits; 0 =
      // STREAMINFO, mandatory first) + 3-byte length
      if ((bytes(4) & 0x7F) != 0) return null
      val len = ((bytes(5) & 0xFF) << 16) | ((bytes(6) & 0xFF) << 8) | (bytes(7) & 0xFF)
      if (len < 34 || 8 + len > bytes.length) return null
      val o = 8
      // STREAMINFO layout: min/max blocksize (2+2), min/max framesize
      // (3+3), then 8 bytes packing rate(20) ch(3) bps(5) total(36)
      val b10 = bytes(o + 10) & 0xFF
      val b11 = bytes(o + 11) & 0xFF
      val b12 = bytes(o + 12) & 0xFF
      val b13 = bytes(o + 13) & 0xFF
      val rate = (b10.toLong << 12) | (b11 << 4) | (b12 >> 4)
      val channels = ((b12 >> 1) & 0x7) + 1
      val bps = (((b12 & 1) << 4) | (b13 >> 4)) + 1
      var total = (b13 & 0xF).toLong
      var i = 14
      while (i < 18) { total = (total << 8) | (bytes(o + i) & 0xFF); i += 1 }
      if (rate == 0) return null // spec: 0 is invalid
      (rate, channels, bps, total,
        if (total == 0) Double.NaN else total.toDouble / rate)
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** Decoded PCM: per-channel sample arrays, all the same length. */
  final case class Pcm(sampleRate: Int, channels: Int, bps: Int,
                       data: Array[Array[Int]]) {
    def nSamples: Int = if (data.isEmpty) 0 else data(0).length

    /** Channel-averaged mono stream normalized to [-1, 1] (the
      * standard analysis convention, same as [[Wav]]).
      */
    def mono: Array[Double] = {
      val n = nSamples
      val out = new Array[Double](n)
      val scale = (1L << (bps - 1)).toDouble * channels
      var i = 0
      while (i < n) {
        var s = 0.0
        var c = 0
        while (c < channels) { s += data(c)(i); c += 1 }
        out(i) = s / scale
        i += 1
      }
      out
    }
  }

  // decoded-size cap: 2^26 total samples (~256 MiB of int), the same
  // loud-bound discipline as the image decoders
  private val MaxTotalSamples = 1 << 26

  /** MSB-first bit reader; every read bounds-checks (overrun throws,
    * caught into the OrNull contract by the caller).
    */
  private final class Br(val b: Array[Byte]) {
    var bytePos = 0
    private var bitPos = 0 // 0..7, bits already consumed in b(bytePos)

    def bit(): Int = {
      if (bytePos >= b.length) throw new IllegalArgumentException("flac: EOF")
      val v = (b(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      v
    }

    def bits(n: Int): Int = {
      require(n >= 0 && n <= 31, s"flac: bad bit count $n")
      var v = 0
      var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }

    /** n-bit two's-complement signed read. */
    def signed(n: Int): Int = {
      if (n == 0) return 0
      val v = bits(n)
      if ((v & (1 << (n - 1))) != 0) v - (1 << n) else v
    }

    /** Unary: count of 0 bits before the terminating 1. */
    def unary(): Int = {
      var q = 0
      while (bit() == 0) {
        q += 1
        require(q <= (1 << 24), "flac: runaway unary code")
      }
      q
    }

    def aligned: Boolean = bitPos == 0
    def align(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def atEnd: Boolean = bytePos >= b.length
  }

  // CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — frame header check
  private val Crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF; k += 1 }
      t(i) = c
      i += 1
    }
    t
  }

  // CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — frame footer check
  private val Crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF else (c << 1) & 0xFFFF; k += 1 }
      t(i) = c
      i += 1
    }
    t
  }

  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc8Table(c ^ (b(i) & 0xFF)); i += 1 }
    c
  }

  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc16Table(((c >> 8) ^ (b(i) & 0xFF)) & 0xFF) ^ ((c << 8) & 0xFFFF); i += 1 }
    c
  }

  /** Full sample decode, or null for anything outside the supported
    * subset. Supported: 8/12/16/20/24-bit PCM, 1–8 channels, all
    * subframe types, both Rice methods + escape, all four channel
    * assignments; rejected loudly (→ null): reserved codes, CRC
    * mismatches, truncated frames, streams past the size cap.
    */
  def decodeOrNull(bytes: Array[Byte]): Pcm = {
    try {
      val meta = metaOrNull(bytes)
      if (meta == null) return null
      val (siRate, siChannels, siBps, siTotal, _) = meta
      if (siTotal * siChannels > MaxTotalSamples) return null

      // skip metadata blocks to the first frame
      var off = 4
      var last = false
      while (!last) {
        require(off + 4 <= bytes.length, "flac: truncated metadata")
        last = (bytes(off) & 0x80) != 0
        val len = ((bytes(off + 1) & 0xFF) << 16) |
          ((bytes(off + 2) & 0xFF) << 8) | (bytes(off + 3) & 0xFF)
        off += 4 + len
      }
      require(off <= bytes.length, "flac: metadata past EOF")

      val chans = siChannels
      var cap = math.max(1024, math.min(siTotal, MaxTotalSamples.toLong).toInt)
      var out = Array.fill(chans)(new Array[Int](cap))
      var n = 0

      val br = new Br(bytes)
      br.bytePos = off
      while (!br.atEnd) {
        val frameStart = br.bytePos
        // ---- frame header
        val sync = br.bits(14)
        require(sync == 0x3FFE, f"flac: lost sync at $frameStart%d (0x$sync%04x)")
        require(br.bit() == 0, "flac: reserved bit set")
        br.bit() // blocking strategy (number semantics only)
        val bsCode = br.bits(4)
        val srCode = br.bits(4)
        val chCode = br.bits(4)
        val ssCode = br.bits(3)
        require(br.bit() == 0, "flac: reserved header bit set")
        // UTF-8-coded frame/sample number (value unused; must parse):
        // leadOnes leading 1-bits → leadOnes−1 continuation bytes
        // (up to 7 total bytes for 36-bit sample numbers)
        val lead = br.bits(8)
        var leadOnes = 0
        var l = lead
        while ((l & 0x80) != 0 && leadOnes < 8) { leadOnes += 1; l = (l << 1) & 0xFF }
        require(leadOnes != 1 && leadOnes <= 7, "flac: bad coded number")
        var fb = 1
        while (fb < leadOnes) {
          require((br.bits(8) & 0xC0) == 0x80, "flac: bad coded-number byte")
          fb += 1
        }
        val blocksize = bsCode match {
          case 0 => throw new IllegalArgumentException("flac: reserved blocksize")
          case 1 => 192
          case 6 => br.bits(8) + 1
          case 7 => br.bits(16) + 1
          case c if c >= 2 && c <= 5 => 576 << (c - 2)
          case c => 256 << (c - 8)
        }
        srCode match { // value itself comes from STREAMINFO
          case 12 => br.bits(8)
          case 13 | 14 => br.bits(16)
          case 15 => throw new IllegalArgumentException("flac: invalid sample rate code")
          case _ => ()
        }
        val bps = ssCode match {
          case 0 => siBps
          case 1 => 8
          case 2 => 12
          case 4 => 16
          case 5 => 20
          case 6 => 24
          case _ => throw new IllegalArgumentException(s"flac: reserved sample size $ssCode")
        }
        val nCh = if (chCode <= 7) chCode + 1 else 2
        require(chCode <= 10, s"flac: reserved channel assignment $chCode")
        require(nCh == chans, "flac: frame/STREAMINFO channel mismatch")
        require(br.aligned, "flac: misaligned frame header")
        val hdrCrc = crc8(bytes, frameStart, br.bytePos)
        require(br.bits(8) == hdrCrc, "flac: frame header CRC-8 mismatch")

        // the cap bounds TOTAL decoded cells (samples × channels) —
        // an unknown-total (siTotal = 0) multi-channel stream must
        // not grow to chans× the advertised bound
        require((n.toLong + blocksize) * chans <= MaxTotalSamples,
          "flac: stream too large")
        if (n + blocksize > cap) {
          cap = math.max(cap * 2, n + blocksize)
          out = out.map(a => java.util.Arrays.copyOf(a, cap))
        }

        // ---- subframes
        val frame = Array.ofDim[Int](nCh, blocksize)
        var c = 0
        while (c < nCh) {
          val sideBits = chCode match {
            case 8 => if (c == 1) 1 else 0 // left/side
            case 9 => if (c == 0) 1 else 0 // side/right
            case 10 => if (c == 1) 1 else 0 // mid/side
            case _ => 0
          }
          decodeSubframe(br, frame(c), blocksize, bps + sideBits)
          c += 1
        }
        br.align()
        val footCrc = crc16(bytes, frameStart, br.bytePos)
        require(br.bits(16) == footCrc, "flac: frame CRC-16 mismatch")

        // ---- stereo decorrelation
        chCode match {
          case 8 => // left/side: right = left - side
            var i = 0
            while (i < blocksize) { frame(1)(i) = frame(0)(i) - frame(1)(i); i += 1 }
          case 9 => // side/right: left = right + side
            var i = 0
            while (i < blocksize) {
              val side = frame(0)(i)
              frame(0)(i) = frame(1)(i) + side
              i += 1
            }
          case 10 => // mid/side (libFLAC reconstruction)
            var i = 0
            while (i < blocksize) {
              val side = frame(1)(i)
              var mid = frame(0)(i) << 1
              mid |= side & 1
              frame(0)(i) = (mid + side) >> 1
              frame(1)(i) = (mid - side) >> 1
              i += 1
            }
          case _ => ()
        }
        c = 0
        while (c < nCh) {
          System.arraycopy(frame(c), 0, out(c), n, blocksize)
          c += 1
        }
        n += blocksize
      }
      require(siTotal == 0L || siTotal == n.toLong,
        s"flac: STREAMINFO claims $siTotal samples, decoded $n")
      Pcm(siRate.toInt, chans, siBps, out.map(a => java.util.Arrays.copyOf(a, n)))
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  private def decodeSubframe(br: Br, dst: Array[Int], blocksize: Int,
                             bpsIn: Int): Unit = {
    require(br.bit() == 0, "flac: subframe padding bit set")
    val tpe = br.bits(6)
    var wasted = 0
    if (br.bit() == 1) wasted = br.unary() + 1
    val bps = bpsIn - wasted
    require(bps >= 1 && bps <= 32, s"flac: effective bps $bps")

    if (tpe == 0) { // CONSTANT
      val v = br.signed(bps)
      java.util.Arrays.fill(dst, 0, blocksize, v)
    } else if (tpe == 1) { // VERBATIM
      var i = 0
      while (i < blocksize) { dst(i) = br.signed(bps); i += 1 }
    } else if ((tpe & 0x38) == 0x08 && (tpe & 0x07) <= 4) { // FIXED
      val order = tpe & 0x07
      var i = 0
      while (i < order) { dst(i) = br.signed(bps); i += 1 }
      decodeResidual(br, dst, blocksize, order)
      restoreFixed(dst, blocksize, order)
    } else if ((tpe & 0x20) != 0) { // LPC
      val order = (tpe & 0x1F) + 1
      var i = 0
      while (i < order) { dst(i) = br.signed(bps); i += 1 }
      val precision = br.bits(4) + 1
      require(precision <= 15, "flac: invalid qlp precision")
      val shift = br.signed(5)
      require(shift >= 0, "flac: negative qlp shift")
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = br.signed(precision); i += 1 }
      decodeResidual(br, dst, blocksize, order)
      i = order
      while (i < blocksize) {
        var sum = 0L
        var j = 0
        while (j < order) { sum += coefs(j).toLong * dst(i - j - 1); j += 1 }
        dst(i) += (sum >> shift).toInt
        i += 1
      }
    } else throw new IllegalArgumentException(s"flac: reserved subframe type $tpe")

    if (wasted > 0) {
      var i = 0
      while (i < blocksize) { dst(i) <<= wasted; i += 1 }
    }
  }

  /** Rice-coded residual partitions, decoded IN PLACE into
    * `dst(order until blocksize)` (warmup already present).
    */
  private def decodeResidual(br: Br, dst: Array[Int], blocksize: Int,
                             order: Int): Unit = {
    val method = br.bits(2)
    require(method <= 1, s"flac: reserved residual method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = br.bits(4)
    val parts = 1 << partOrder
    require(blocksize % parts == 0, "flac: partition/blocksize mismatch")
    val perPart = blocksize >> partOrder
    require(perPart > order || partOrder == 0, "flac: partition shorter than predictor order")
    var i = order
    var p = 0
    while (p < parts) {
      val count = (if (p == 0) perPart - order else perPart)
      val param = br.bits(paramBits)
      if (param == escape) {
        val raw = br.bits(5)
        var k = 0
        while (k < count) { dst(i) = br.signed(raw); i += 1; k += 1 }
      } else {
        var k = 0
        while (k < count) {
          val q = br.unary()
          val u = (q.toLong << param) | br.bits(param).toLong
          require(u <= Int.MaxValue, "flac: residual overflow")
          val zz = u.toInt
          dst(i) = (zz >>> 1) ^ -(zz & 1)
          i += 1
          k += 1
        }
      }
      p += 1
    }
  }

  /** Same feature contract as [[Wav.pcmFeaturesOrNull]] —
    * `[channels, sample_rate, bits_per_sample, n_frames, rms, mean,
    * peak, zero_cross_rate]` over the channel-averaged mono stream —
    * so FLAC payloads ride the SAME downstream feature schema the
    * WAV rows do ([[Multimodal.withFeatures]] routing).
    */
  def pcmFeaturesOrNull(bytes: Array[Byte]): Array[Double] = {
    val pcm = decodeOrNull(bytes)
    if (pcm == null || pcm.nSamples == 0) return null
    val mono = pcm.mono
    var sumSq = 0.0
    var sum = 0.0
    var peak = 0.0
    var crossings = 0L
    var prevSign = 0
    var i = 0
    while (i < mono.length) {
      val s = mono(i)
      sumSq += s * s
      sum += s
      val a = math.abs(s)
      if (a > peak) peak = a
      val sign = if (s > 0) 1 else if (s < 0) -1 else 0
      if (sign != 0) {
        if (prevSign != 0 && sign != prevSign) crossings += 1
        prevSign = sign
      }
      i += 1
    }
    val n = mono.length
    Array(pcm.channels.toDouble, pcm.sampleRate.toDouble, pcm.bps.toDouble,
      n.toDouble, math.sqrt(sumSq / n), sum / n, peak,
      if (n > 1) crossings.toDouble / (n - 1) else 0.0)
  }

  /** Fixed-predictor restoration, orders 0–4 (polynomial predictors
    * from the spec).
    */
  private def restoreFixed(dst: Array[Int], blocksize: Int, order: Int): Unit = {
    var i = order
    order match {
      case 0 => ()
      case 1 => while (i < blocksize) { dst(i) += dst(i - 1); i += 1 }
      case 2 => while (i < blocksize) { dst(i) += 2 * dst(i - 1) - dst(i - 2); i += 1 }
      case 3 => while (i < blocksize) {
        dst(i) += 3 * dst(i - 1) - 3 * dst(i - 2) + dst(i - 3); i += 1
      }
      case 4 => while (i < blocksize) {
        dst(i) += 4 * dst(i - 1) - 6 * dst(i - 2) + 4 * dst(i - 3) - dst(i - 4); i += 1
      }
      case _ => throw new IllegalArgumentException(s"flac: fixed order $order")
    }
  }
}
