package graft.ext

/** RFC 6716 §3 Opus packet structure — the TOC byte, the four
  * frame-packing codes, frame-length coding, and padding — walked
  * over a CRC-verified Ogg Opus container ([[Ogg]] supplies pages
  * and packet reassembly; RFC 7845 supplies the id/comment header
  * layout this walker skips past).
  *
  * This is the round-11 increment of the Opus build-vs-defer probe
  * (BENCH_NOTES): SAMPLE synthesis (SILK/CELT) stays deferred — the
  * range coder + integer MDCT + PVQ have no independent
  * in-environment validator — but the packet layer is fully
  * specified arithmetic a SQL oracle CAN replay, and it is what
  * crawl triage needs from Opus: exact frame counts, durations, and
  * payload accounting without decoding a sample (q147).
  *
  * Parse rules enforced (the RFC's [R1]–[R7] subset that applies to
  * packet structure):
  *   - every frame length ≤ 1275; code-1 payloads must split evenly;
  *     code-3 CBR payloads must divide by M
  *   - code 3: 1 ≤ M, frames per packet bounded by 120 ms of audio
  *     (M × frame duration ≤ 5760 samples at 48 kHz)
  *   - padding length bytes chain at 255 → 254-per-byte (§3.2.5)
  *   - a zero frame length is DTX (valid, contributes duration, no
  *     payload bytes)
  * Any violation nulls the whole container (bounded-and-total: the
  * output is a fixed-size stats row, every read range-checked, no
  * amplification path).
  */
object Opus {

  /** Frame duration in 48 kHz samples for TOC config 0–31 (§3.1):
    * SILK NB/MB/WB {10,20,40,60} ms, Hybrid SWB/FB {10,20} ms,
    * CELT NB/WB/SWB/FB {2.5,5,10,20} ms.
    */
  val FrameSamples: Array[Int] = {
    val silk = Array(480, 960, 1920, 2880)
    val hybrid = Array(480, 960)
    val celt = Array(120, 240, 480, 960)
    (0 until 32).map { cfg =>
      if (cfg < 12) silk(cfg % 4)
      else if (cfg < 16) hybrid(cfg % 2)
      else celt(cfg % 4)
    }.toArray
  }

  /** 0 = SILK, 1 = Hybrid, 2 = CELT (§3.1's three mode rows). */
  def mode(config: Int): Int =
    if (config < 12) 0 else if (config < 16) 1 else 2

  final case class PacketInfo(config: Int, stereo: Int, code: Int,
                              nFrames: Int, payloadBytes: Long,
                              padBytes: Int, vbr: Boolean) {
    def samples: Long = nFrames.toLong * FrameSamples(config)
  }

  /** One frame length (§3.2.1): 0 DTX; 1–251 direct; 252–255 carry a
    * second byte (len = b2*4 + b1, 252..1275). Returns (len,
    * bytesConsumed) or null.
    */
  private def frameLen(b: Array[Byte], off: Int): (Int, Int) = {
    if (off >= b.length) return null
    val b1 = b(off) & 0xFF
    if (b1 < 252) (b1, 1)
    else {
      if (off + 1 >= b.length) return null
      val len = (b(off + 1) & 0xFF) * 4 + b1
      if (len > 1275) null else (len, 2)
    }
  }

  /** Parse one Opus packet (§3.2). Null on any structural violation. */
  def packetInfoOrNull(b: Array[Byte]): PacketInfo = {
    if (b == null || b.length < 1) return null
    val toc = b(0) & 0xFF
    val config = toc >> 3
    val stereo = (toc >> 2) & 1
    val code = toc & 3
    val dur = FrameSamples(config)
    code match {
      case 0 =>
        // [R2]: the single frame is the whole payload, still ≤ 1275
        if (b.length - 1 > 1275) null
        else PacketInfo(config, stereo, 0, 1, b.length - 1L, 0, vbr = false)
      case 1 =>
        val body = b.length - 1
        if (body % 2 != 0 || body / 2 > 1275) null
        else PacketInfo(config, stereo, 1, 2, body.toLong, 0, vbr = false)
      case 2 =>
        val fl = frameLen(b, 1)
        if (fl == null) return null
        val (n1, used) = fl
        val n2 = b.length - 1 - used - n1
        if (n2 < 0 || n2 > 1275) null
        else PacketInfo(config, stereo, 2, 2, n1.toLong + n2, 0, vbr = false)
      case _ =>
        if (b.length < 2) return null
        val fc = b(1) & 0xFF
        val vbr = (fc & 0x80) != 0
        val hasPad = (fc & 0x40) != 0
        val m = fc & 0x3F
        if (m < 1 || m.toLong * dur > 5760) return null
        var off = 2
        var pad = 0
        if (hasPad) {
          var v = 255
          while (v == 255) {
            if (off >= b.length) return null
            v = b(off) & 0xFF
            off += 1
            pad += (if (v == 255) 254 else v)
          }
        }
        val avail = b.length - off - pad
        if (avail < 0) return null
        if (vbr) {
          // M−1 explicit lengths, last frame takes the remainder
          var sum = 0L
          var k = 0
          var o = off
          while (k < m - 1) {
            val fl = frameLen(b, o)
            if (fl == null) return null
            o += fl._2
            sum += fl._1
            k += 1
          }
          // last ≥ 0 also guarantees the explicit lengths fit
          val last = b.length - o - pad - sum
          if (last < 0 || last > 1275) return null
          PacketInfo(config, stereo, 3, m, sum + last, pad, vbr = true)
        } else {
          if (avail % m != 0 || avail / m > 1275) return null
          PacketInfo(config, stereo, 3, m, avail.toLong, pad, vbr = false)
        }
    }
  }

  final case class StreamStats(channels: Int, preSkip: Int,
                               nPackets: Int, nFrames: Long,
                               totalSamples: Long, tocSum: Long,
                               payloadSum: Long, padSum: Long,
                               nVbr: Int, nSilk: Int, nHybrid: Int, nCelt: Int)

  /** Walk a whole Ogg Opus container: CRC-verified pages → packet
    * reassembly → OpusHead validation → per-packet TOC parse.
    * Null for anything that is not a valid Ogg Opus stream.
    */
  def streamStatsOrNull(bytes: Array[Byte]): StreamStats = {
    try {
      val pages = Ogg.pagesOrNull(bytes)
      if (pages == null) return null
      val packets = Ogg.packetsFrom(bytes, pages)
      if (packets == null || packets.length < 2) return null
      val id = packets(0)
      if (id.length < 19) return null
      val magic = "OpusHead"
      var i = 0
      while (i < 8) {
        if (id(i) != magic.charAt(i).toByte) return null
        i += 1
      }
      if ((id(8) & 0xF0) != 0) return null // version 1..15 (§5.1)
      val channels = id(9) & 0xFF
      if (channels < 1) return null
      val preSkip = (id(10) & 0xFF) | ((id(11) & 0xFF) << 8)
      val tags = packets(1)
      if (tags.length < 8 || tags(0) != 'O' || tags(4) != 'T') return null
      var p = 2
      var nPackets = 0
      var nFrames = 0L
      var totalSamples = 0L
      var tocSum = 0L
      var payloadSum = 0L
      var padSum = 0L
      var nVbr = 0
      var nSilk = 0
      var nHybrid = 0
      var nCelt = 0
      while (p < packets.length) {
        val info = packetInfoOrNull(packets(p))
        if (info == null) return null
        nPackets += 1
        nFrames += info.nFrames
        totalSamples += info.samples
        tocSum += (info.config << 3) | (info.stereo << 2) | info.code
        payloadSum += info.payloadBytes
        padSum += info.padBytes
        if (info.vbr) nVbr += 1
        mode(info.config) match {
          case 0 => nSilk += 1
          case 1 => nHybrid += 1
          case _ => nCelt += 1
        }
        p += 1
      }
      StreamStats(channels, preSkip, nPackets, nFrames, totalSamples,
        tocSum, payloadSum, padSum, nVbr, nSilk, nHybrid, nCelt)
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }
}
