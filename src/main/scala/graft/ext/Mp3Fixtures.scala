package graft.ext

/** Deterministic MPEG-1 Layer III stream synthesis — the q137 corpus
  * generator. Every structural knob the [[Mp3]] walker parses is
  * driven by a closed-form function of `docId` (frame count, bitrate
  * and samplerate indices, mono/stereo, padding, CRC, ID3v2 prefix,
  * ID3v1 trailer, `main_data_begin`, and every granule-channel's
  * side-info fields), so a SQL oracle can predict the walker's
  * complete output from `documents.doc_id` alone — the q132
  * self-written-corpus discipline: the engine writes real bytes, reads
  * them back bit-by-bit, and any packing OR parsing bug breaks the
  * hash. Main data is zero-filled (the walker's scope stops at side
  * info; see the round-10 build-vs-defer note in BENCH_NOTES).
  *
  * This writer is production-side; [[Mp3Spec]] keeps its own
  * independent bit writer, and asserts this synthesizer and that
  * writer produce identical frames for matched parameters — the
  * two transcriptions of the ISO/IEC 11172-3 layout meet at the
  * walker in the middle.
  */
object Mp3Fixtures {

  private val Kbps = Array(-1, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, -1)
  private val Rates = Array(44100, 48000, 32000)

  /** MSB-first bit packer (independent of the walker's reader and of
    * Mp3Spec's test-side writer).
    */
  private final class W(n: Int) {
    val buf = new Array[Byte](n)
    private var pos = 0
    private var bit = 0
    def put(v: Int, k: Int): Unit = {
      var i = k - 1
      while (i >= 0) {
        if (((v >> i) & 1) != 0) buf(pos) = (buf(pos) | (0x80 >> bit)).toByte
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i -= 1
      }
    }
  }

  // ---- the closed-form knobs (each mirrored in q137's oracle SQL)
  def nFrames(docId: Long): Int = (2 + docId % 3).toInt
  def kbpsIdx(docId: Long, f: Int): Int = (1 + (docId + 5L * f) % 14).toInt
  def rateIdx(docId: Long, f: Int): Int = ((docId + f) % 3).toInt
  def isMono(docId: Long): Boolean = docId % 4 == 0
  def padBit(docId: Long, f: Int): Int = ((docId + f) % 2).toInt
  def hasCrc(docId: Long, f: Int): Boolean = (docId + f) % 3 == 0
  def mainDataBegin(docId: Long, f: Int): Int = ((docId * 7 + f * 11L) % 512).toInt
  def gain(docId: Long, f: Int, g: Int, ch: Int): Int =
    ((docId * 31 + f * 13L + g * 7 + ch * 3) % 256).toInt
  def windowSwitch(docId: Long, f: Int, g: Int): Boolean = (docId + f + g) % 2 == 1
  def blockType(docId: Long, g: Int): Int = (1 + (docId + g) % 3).toInt // 1..3
  def id3Size(docId: Long): Int = if (docId % 6 == 0) (docId % 50).toInt else -1
  def hasId3v1Trailer(docId: Long): Boolean = docId % 9 == 0

  def frameLen(docId: Long, f: Int): Int =
    144 * Kbps(kbpsIdx(docId, f)) * 1000 / Rates(rateIdx(docId, f)) +
      padBit(docId, f)

  /** One frame's bytes: header + optional (dummy) CRC + side info,
    * zero main data, padded to the table frame length.
    */
  private def frame(docId: Long, f: Int): Array[Byte] = {
    val mono = isMono(docId)
    val nch = if (mono) 1 else 2
    val crc = hasCrc(docId, f)
    val len = frameLen(docId, f)
    val w = new W(len)
    // header: sync(11) version(2)=11 layer(2)=01 protection(1)
    w.put(0x7FF, 11); w.put(3, 2); w.put(1, 2); w.put(if (crc) 0 else 1, 1)
    w.put(kbpsIdx(docId, f), 4); w.put(rateIdx(docId, f), 2)
    w.put(padBit(docId, f), 1); w.put(0, 1) // private
    w.put(if (mono) 3 else 0, 2) // mode
    w.put(0, 2); w.put(0, 1); w.put(0, 1); w.put(0, 2) // ext/copy/orig/emph
    if (crc) w.put(0xABCD, 16) // value unchecked by the walker
    w.put(mainDataBegin(docId, f), 9)
    w.put(0, if (mono) 5 else 3) // private_bits
    w.put(0, 4 * nch) // scfsi
    var g = 0
    while (g < 2) {
      var ch = 0
      while (ch < nch) {
        w.put(((docId + f * 2L + g) % 4096).toInt, 12) // part2_3_length
        w.put(((docId * 3 + g) % 512).toInt, 9) // big_values
        w.put(gain(docId, f, g, ch), 8)
        w.put(((docId + ch) % 16).toInt, 4) // scalefac_compress
        if (windowSwitch(docId, f, g)) {
          w.put(1, 1)
          w.put(blockType(docId, g), 2)
          w.put(if (docId % 5 == 0) 1 else 0, 1) // mixed_block_flag
          w.put(5, 5); w.put(9, 5) // table_select ×2
          w.put(1, 3); w.put(2, 3); w.put(3, 3) // subblock_gain
        } else {
          w.put(0, 1)
          w.put(5, 5); w.put(9, 5); w.put(13, 5) // table_select ×3
          w.put(6, 4); w.put(3, 3) // region counts
        }
        w.put(0, 1); w.put(1, 1); w.put(0, 1) // preflag, sfs, count1
        ch += 1
      }
      g += 1
    }
    w.buf
  }

  /** The complete stream for one doc: optional ID3v2 prefix, the
    * frames, optional ID3v1 trailer (which the walker must end on
    * quietly).
    */
  def stream(docId: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(2048)
    val id3 = id3Size(docId)
    if (id3 >= 0) {
      out.write(Array[Byte]('I', 'D', '3', 4, 0, 0))
      out.write(Array[Byte](((id3 >> 21) & 0x7F).toByte, ((id3 >> 14) & 0x7F).toByte,
        ((id3 >> 7) & 0x7F).toByte, (id3 & 0x7F).toByte))
      out.write(new Array[Byte](id3))
    }
    var f = 0
    val n = nFrames(docId)
    while (f < n) { out.write(frame(docId, f)); f += 1 }
    if (hasId3v1Trailer(docId)) {
      val t = new Array[Byte](128)
      t(0) = 'T'; t(1) = 'A'; t(2) = 'G'
      out.write(t)
    }
    out.toByteArray
  }
}
