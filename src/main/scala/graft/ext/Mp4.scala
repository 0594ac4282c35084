package graft.ext

/** JDK-only ISO BMFF (MP4/QuickTime) metadata walk — the video member
  * of the real-decode family ([[Png]] pixels, [[Wav]] samples). Frame
  * DECODE needs a codec: MJPEG tracks are REAL via [[Mjpeg]] (sample
  * tables + the baseline-JPEG kernel); inter-coded H.264 frame decode
  * stays the documented stub, but its METADATA is fully real via
  * [[Avc]] (avcC/SPS parse → resolution/profile, stss → keyframe
  * offsets). This object reads the container-level summary: walk the
  * top-level boxes, find `moov`, read `mvhd` (timescale + duration,
  * version 0 and 1 layouts) and count `trak` children.
  */
object Mp4 {

  private def beU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def beU64(b: Array[Byte], off: Int): Long =
    (beU32(b, off) << 32) | beU32(b, off + 4)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** `[timescale, duration_sec, n_tracks]` from the moov/mvhd box, or
    * null if the payload is not ISO BMFF (no `ftyp` leading box or no
    * parseable `moov`).
    */
  def metaOrNull(bytes: Array[Byte]): Array[Double] = {
    if (bytes == null || bytes.length < 16) return null
    if (tag(bytes, 4) != "ftyp") return null

    // top-level walk to moov (size==1 → 64-bit largesize follows;
    // size==0 → box extends to EOF)
    var off = 0L
    var moovOff = -1L
    var moovEnd = -1L
    while (off + 8 <= bytes.length && moovOff < 0) {
      val size0 = beU32(bytes, off.toInt)
      val t = tag(bytes, off.toInt + 4)
      val (size, hdr) =
        if (size0 == 1 && off + 16 <= bytes.length) (beU64(bytes, off.toInt + 8), 16)
        else if (size0 == 0) (bytes.length - off, 8)
        else (size0, 8)
      if (size < hdr) return null
      if (t == "moov") { moovOff = off + hdr; moovEnd = off + size }
      off += size
    }
    if (moovOff < 0) return null

    var timescale = 0.0
    var durationSec = -1.0
    var nTracks = 0
    var c = moovOff
    while (c + 8 <= moovEnd && c + 8 <= bytes.length) {
      val size0 = beU32(bytes, c.toInt)
      val t = tag(bytes, c.toInt + 4)
      val (size, hdr) =
        if (size0 == 1 && c + 16 <= bytes.length) (beU64(bytes, c.toInt + 8), 16)
        else if (size0 == 0) (moovEnd - c, 8)
        else (size0, 8)
      if (size < hdr) return null
      val p = (c + hdr).toInt
      if (t == "mvhd" && p < bytes.length) {
        val version = bytes(p) & 0xff
        if (version == 1 && p + 32 <= bytes.length) {
          timescale = beU32(bytes, p + 20).toDouble
          if (timescale > 0) durationSec = beU64(bytes, p + 24) / timescale
        } else if (version == 0 && p + 20 <= bytes.length) {
          timescale = beU32(bytes, p + 12).toDouble
          if (timescale > 0) durationSec = beU32(bytes, p + 16) / timescale
        }
      } else if (t == "trak") nTracks += 1
      c += size
    }
    // timescale 0 (division → NaN/Infinity) and missing mvhd both land
    // here: NaN fails every comparison, so test !(valid) not (invalid)
    if (!(durationSec >= 0)) return null
    Array(timescale, durationSec, nTracks.toDouble)
  }
}
