package graft.ext

/** MPEG-1 Layer III frame walker — header + side-info parse from the
  * public ISO/IEC 11172-3 layout. This is the round-10 SCOPING PROBE
  * for compressed-audio dedup (BENCH_NOTES "MP3 scoping"), not a
  * sample decoder: it walks frame sync across ID3v2 tags, applies the
  * Layer III bitrate/samplerate tables, skips the optional CRC, and
  * reads each granule's side information bit-exactly —
  * `main_data_begin` (the bit-reservoir back-pointer), per-channel
  * `part2_3_length`, `big_values`, `global_gain`,
  * `scalefac_compress`, and the window-switching block layout — so
  * per-granule gain envelopes come out WITHOUT touching the Huffman
  * main data.
  *
  * What the envelope is: `global_gain` sets the granule's overall
  * requantization step (§2.4.3.4: gain = 2^((global_gain − 210)/4)),
  * so its trajectory is a broadband TIME envelope at 576-sample
  * (~13 ms at 44.1 kHz) resolution. What it is NOT: a spectral
  * envelope — the per-band energies the [[Audio]] fingerprint needs
  * live in the Huffman-coded `is[]` coefficients (scalefactors alone
  * set quantizer step widths, not energies), so this walker feeds
  * metadata/triage and a coarse loudness signature, and full MP3
  * membership in the band-join dedup family stays gated on a sample
  * decoder (see the build-vs-defer note in BENCH_NOTES).
  *
  * Scope: MPEG-1 Layer III (32/44.1/48 kHz — the layout with 2
  * granules and 9-bit `main_data_begin`); MPEG-2/2.5 LSF frames and
  * free-format bitrates return null loudly rather than guessing at
  * the different side-info shape. Parsing is bounded and total:
  * every read is range-checked and any structural violation nulls
  * the whole walk (the [[MediaMeta]] contract).
  */
object Mp3 {

  /** One granule-channel's side info (the fields a reservoir walk or
    * gain envelope needs; table selects are parsed but not kept).
    */
  final case class GranuleInfo(
      part23Length: Int,
      bigValues: Int,
      globalGain: Int,
      scalefacCompress: Int,
      blockType: Int, // 0 = long; 1/3 = start/stop; 2 = short windows
      mixedBlock: Boolean)

  /** One sync-validated frame. `granules(g)(ch)`, g in 0..1. */
  final case class Frame(
      offset: Int,
      lengthBytes: Int,
      bitrateKbps: Int,
      sampleRate: Int,
      channels: Int,
      crcProtected: Boolean,
      mainDataBegin: Int,
      granules: Array[Array[GranuleInfo]])

  // MPEG-1 Layer III bitrate table (kbps; index 0 = free, 15 = bad)
  private val Bitrates = Array(-1, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, -1)
  private val Rates = Array(44100, 48000, 32000, -1)

  private final class Bits(b: Array[Byte], var pos: Int, val limit: Int) {
    var bit = 0
    def read(n: Int): Int = {
      var v = 0
      var k = n
      while (k > 0) {
        require(pos < limit, "mp3: side info overruns frame")
        val avail = 8 - bit
        val take = math.min(avail, k)
        val cur = b(pos) & 0xFF
        v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
        bit += take
        if (bit == 8) { bit = 0; pos += 1 }
        k -= take
      }
      v
    }
  }

  /** Skip an ID3v2 tag if present (syncsafe 28-bit size). */
  private def skipId3(b: Array[Byte]): Int = {
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val sz = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      val skip = 10L + sz + (if ((b(5) & 0x10) != 0) 10L else 0L) // footer
      if (skip < b.length) skip.toInt else b.length
    } else 0
  }

  /** Walk every frame from the first valid sync; null when the bytes
    * are not an MPEG-1 Layer III stream (wrong layer/version,
    * free-format, or no sync). Trailing garbage after the last whole
    * frame (an ID3v1 tag, truncation) ends the walk quietly.
    */
  def framesOrNull(b: Array[Byte]): Array[Frame] = {
    try {
      if (b == null || b.length < 10) return null
      var off = skipId3(b)
      val frames = scala.collection.mutable.ArrayBuffer.empty[Frame]
      var synced = false
      while (off + 4 <= b.length) {
        val h0 = b(off) & 0xFF; val h1 = b(off + 1) & 0xFF
        if (h0 != 0xFF || (h1 & 0xE0) != 0xE0) {
          if (synced) return frames.toArray // trailing non-frame bytes
          off += 1 // scan for first sync
        } else {
          if ((h1 & 0x18) != 0x18 || (h1 & 0x06) != 0x02)
            return if (synced) frames.toArray else null // not MPEG-1 L3
          val h2 = b(off + 2) & 0xFF; val h3 = b(off + 3) & 0xFF
          val kbps = Bitrates(h2 >> 4)
          val rate = Rates((h2 >> 2) & 3)
          if (kbps < 0 || rate < 0)
            return if (synced) frames.toArray else null
          val padding = (h2 >> 1) & 1
          val mono = (h3 >> 6) == 3
          val nch = if (mono) 1 else 2
          val frameLen = 144 * kbps * 1000 / rate + padding
          if (off + frameLen > b.length) return if (synced) frames.toArray else null
          val crc = (h1 & 1) == 0
          val sideStart = off + 4 + (if (crc) 2 else 0)
          val sideLen = if (mono) 17 else 32
          require(sideStart + sideLen <= off + frameLen, "mp3: side info past frame")
          val bits = new Bits(b, sideStart, sideStart + sideLen)
          val mainDataBegin = bits.read(9)
          bits.read(if (mono) 5 else 3) // private_bits
          bits.read(4 * nch) // scfsi
          val grans = Array.ofDim[GranuleInfo](2, nch)
          var g = 0
          while (g < 2) {
            var ch = 0
            while (ch < nch) {
              val p23 = bits.read(12)
              val bigV = bits.read(9)
              val gain = bits.read(8)
              val sfc = bits.read(4)
              val wsf = bits.read(1)
              var bt = 0; var mixed = false
              if (wsf == 1) {
                bt = bits.read(2)
                mixed = bits.read(1) == 1
                require(bt != 0, "mp3: window switching with block_type 0")
                bits.read(5 * 2) // table_select ×2
                bits.read(3 * 3) // subblock_gain ×3
              } else {
                bits.read(5 * 3) // table_select ×3
                bits.read(4 + 3) // region0_count, region1_count
              }
              bits.read(3) // preflag, scalefac_scale, count1table_select
              grans(g)(ch) = GranuleInfo(p23, bigV, gain, sfc, bt, mixed)
              ch += 1
            }
            g += 1
          }
          frames += Frame(off, frameLen, kbps, rate, nch, crc, mainDataBegin,
            grans.map(_.toArray))
          synced = true
          off += frameLen
        }
      }
      if (synced) frames.toArray else null
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** Channel-averaged per-granule broadband gain envelope,
    * `2^((global_gain − 210)/4)` — two entries per frame in decode
    * order. Null when the stream is not walkable.
    */
  def gainEnvelopeOrNull(b: Array[Byte]): Array[Double] = {
    val fs = framesOrNull(b)
    if (fs == null || fs.isEmpty) return null
    val env = new Array[Double](fs.length * 2)
    var i = 0
    var f = 0
    while (f < fs.length) {
      var g = 0
      while (g < 2) {
        val chs = fs(f).granules(g)
        var s = 0.0
        var c = 0
        while (c < chs.length) { s += math.pow(2.0, (chs(c).globalGain - 210) / 4.0); c += 1 }
        env(i) = s / chs.length
        i += 1
        g += 1
      }
      f += 1
    }
    env
  }
}
