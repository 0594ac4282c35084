package graft.ext

/** Format-routed media metadata without a decode — the triage verbs a
  * corpus pipeline runs FIRST, before deciding what to decode at all:
  *
  *  - [[imageDimsOrNull]]: (format, width, height) for PNG, JPEG,
  *    GIF, BMP, WebP (VP8/VP8L/VP8X), TIFF (both byte orders), and
  *    AVIF/HEIC (ISOBMFF `ispe`), each from its published header
  *    layout.
  *  - [[audioMetaOrNull]]: (format, sampleRate, channels,
  *    durationSec) for WAV, FLAC ([[Flac]]), MP3 (MPEG audio frame
  *    header + Xing/Info VBR frame count), and Ogg (Vorbis/Opus
  *    identification header + terminal-page granule position).
  *
  * Routing is by CONTENT magic, never by filename. Anything
  * unrecognized or malformed → null, never a throw.
  */
object MediaMeta {

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  // ------------------------------------------------------ image dims

  /** (format, width, height) or null. */
  def imageDimsOrNull(b: Array[Byte]): (String, Long, Long) = {
    try {
      if (b == null || b.length < 16) return null
      if ((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
        // require the first chunk to BE IHDR: Apple CgBI PNGs insert a
        // chunk before it, and offsets 16/20 would read its payload
        if (b.length >= 24 && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
          return ("png", be32(b, 16), be32(b, 20))
        return null
      }
      if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8)
        return jpegDims(b)
      // full 6-byte version magic (GIF87a/GIF89a), matching
      // Gif.decodeFrames — 'GIF8' alone admits e.g. 'GIF80'
      if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
          (b(4) == '7' || b(4) == '9') && b(5) == 'a')
        return ("gif", le16(b, 6).toLong, le16(b, 8).toLong)
      if (b(0) == 'B' && b(1) == 'M' && b.length >= 26) {
        val hdr = le32(b, 14)
        if (hdr >= 40) // BITMAPINFOHEADER+: signed height (top-down < 0)
          return ("bmp", le32(b, 18), math.abs(le32(b, 22).toInt.toLong))
        else if (hdr == 12) // BITMAPCOREHEADER
          return ("bmp", le16(b, 18).toLong, le16(b, 20).toLong)
      }
      if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b.length >= 25 && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')
        return webpDims(b)
      if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
          (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))
        return tiffDims(b)
      // ISOBMFF still image: ftyp brand avif/heic → meta/iprp/ipco/ispe
      if (b.length >= 24 && Bmff.tag(b, 4) == "ftyp") {
        val brand = Bmff.tag(b, 8)
        if (brand == "avif" || brand == "avis" || brand == "heic" || brand == "mif1")
          return ispeDims(b, brand)
      }
      null
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** JPEG: walk markers to the first SOF0-SOF15 frame header. */
  private def jpegDims(b: Array[Byte]): (String, Long, Long) = {
    var o = 2
    while (o + 4 <= b.length) {
      if ((b(o) & 0xFF) != 0xFF) return null
      // consume 0xFF fill bytes before the marker id (T.81 B.1.1.2)
      while (o + 4 <= b.length && (b(o + 1) & 0xFF) == 0xFF) o += 1
      if (o + 4 > b.length) return null
      val m = b(o + 1) & 0xFF
      if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) o += 2
      else {
        val len = be16(b, o + 2)
        if (len < 2 || o + 2 + len > b.length) return null
        // SOF0..SOF15 minus DHT(C4)/JPG(C8)/DAC(CC)
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          if (len < 7) return null
          return ("jpeg", be16(b, o + 7).toLong, be16(b, o + 5).toLong)
        }
        if (m == 0xD9 || m == 0xDA) return null // EOI / SOS before SOF
        o += 2 + len
      }
    }
    null
  }

  /** WebP: VP8 keyframe dims, VP8L bitstream dims, or VP8X canvas. */
  private def webpDims(b: Array[Byte]): (String, Long, Long) = {
    val fourcc = Bmff.tag(b, 12)
    fourcc match {
      case "VP8 " if b.length >= 30 =>
        // keyframe: 3-byte frame tag, then 9D 01 2A, then 14-bit dims
        if ((b(23) & 0xFF) == 0x9D && (b(24) & 0xFF) == 0x01 && (b(25) & 0xFF) == 0x2A)
          ("webp", (le16(b, 26) & 0x3FFF).toLong, (le16(b, 28) & 0x3FFF).toLong)
        else null
      case "VP8L" if b.length >= 25 =>
        if ((b(20) & 0xFF) != 0x2F) return null // signature
        val bits = le32(b, 21)
        ("webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
      case "VP8X" if b.length >= 30 =>
        // 24-bit LE canvas minus one
        val w = (b(24) & 0xFFL) | ((b(25) & 0xFFL) << 8) | ((b(26) & 0xFFL) << 16)
        val h = (b(27) & 0xFFL) | ((b(28) & 0xFFL) << 8) | ((b(29) & 0xFFL) << 16)
        ("webp", w + 1, h + 1)
      case _ => null
    }
  }

  /** TIFF: first IFD's ImageWidth (256) / ImageLength (257). */
  private def tiffDims(b: Array[Byte]): (String, Long, Long) = {
    val le = b(0) == 'I'
    def u16(o: Int): Int = if (le) le16(b, o) else be16(b, o)
    def u32(o: Int): Long = if (le) le32(b, o) else be32(b, o)
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return null
    val n = u16(ifd.toInt)
    if (n < 1 || n > 4096 || ifd + 2 + 12L * n > b.length) return null
    var w = -1L; var h = -1L
    var i = 0
    while (i < n) {
      val o = (ifd + 2 + 12 * i).toInt
      val tag = u16(o)
      val typ = u16(o + 2)
      // SHORT (3) packs in the value field's leading bytes; LONG (4) whole
      val v: Long = typ match {
        case 3 => u16(o + 8).toLong
        case 4 => u32(o + 8)
        case _ => -1L
      }
      if (tag == 256) w = v
      if (tag == 257) h = v
      i += 1
    }
    if (w > 0 && h > 0) ("tiff", w, h) else null
  }

  /** AVIF/HEIC: meta → iprp → ipco → ispe (full boxes: 4-byte
    * version/flags before the payload).
    */
  private def ispeDims(b: Array[Byte], brand: String): (String, Long, Long) = {
    for {
      meta <- Bmff.find(b, 0, b.length, "meta")
      iprp <- Bmff.find(b, meta._1 + 4, meta._2, "iprp") // meta is a FULL box
      ipco <- Bmff.find(b, iprp._1, iprp._2, "ipco")
      ispe <- Bmff.find(b, ipco._1, ipco._2, "ispe")
      if ispe._1 + 12 <= ispe._2
    } return (if (brand.startsWith("hei") || brand == "mif1") "heic" else "avif",
      be32(b, ispe._1.toInt + 4), be32(b, ispe._1.toInt + 8))
    null
  }

  /** Codec-level still triage (round 15, verdict item 7): the av1C
    * fields a corpus gate filters on BEFORE any decode —
    * (codec, profile, bit_depth, monochrome) for AVIF/HEIF-carried
    * AV1 items; null for every other format (their headers carry no
    * comparable codec profile).  Complements [[imageDimsOrNull]]'s
    * dimensions-only triage.
    */
  def imageCodecProfileOrNull(b: Array[Byte]): (String, Long, Long, Long) = {
    try {
      if (b == null || b.length < 16) return null
      if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'))
        return null
      val brand = Bmff.tag(b, 8)
      if (brand != "avif" && brand != "avis" && brand != "heic" &&
          brand != "mif1") return null
      val m = Av1.avifMetaOrNull(b)
      if (m == null || m.length < 7) return null
      ("av1", m(2).toLong, m(5).toLong, m(6).toLong)
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  // ------------------------------------------------------ audio meta

  /** (format, sampleRate, channels, durationSec) or null; duration
    * NaN when the container does not carry enough to derive it.
    */
  def audioMetaOrNull(b: Array[Byte]): (String, Long, Int, Double) = {
    try {
      if (b == null || b.length < 12) return null
      if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
        return wavMeta(b)
      if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') {
        val m = Flac.metaOrNull(b)
        return if (m == null) null else ("flac", m._1, m._2, m._5)
      }
      if (b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S')
        return oggMeta(b)
      mp3Meta(b) // ID3v2 or a raw frame header; null otherwise
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  private def wavMeta(b: Array[Byte]): (String, Long, Int, Double) = {
    var off: Long = 12
    var rate = 0L; var ch = 0; var bits = 0; var dataLen = -1L
    while (off + 8 <= b.length) {
      val id = new String(b, off.toInt, 4, "US-ASCII")
      val size = le32(b, off.toInt + 4) // unsigned — Long arithmetic ONLY
      val payload = off + 8
      if (id == "fmt " && size >= 16 && payload + 16 <= b.length) {
        ch = le16(b, payload.toInt + 2)
        rate = le32(b, payload.toInt + 4)
        bits = le16(b, payload.toInt + 14)
      } else if (id == "data") dataLen = math.min(size, b.length - payload)
      // Long advance: a crafted 0xFFFFFFF8 size must run the cursor
      // off the end, not wrap toInt negative and spin forever
      off = payload + size + (size & 1)
    }
    if (rate <= 0 || ch < 1) return null
    val dur =
      if (dataLen >= 0 && bits >= 8) dataLen.toDouble / (rate * ch * (bits / 8))
      else Double.NaN
    ("wav", rate, ch, dur)
  }

  private val Mp3Rates = Array(
    Array(11025L, 12000L, 8000L),  // MPEG-2.5
    null,
    Array(22050L, 24000L, 16000L), // MPEG-2
    Array(44100L, 48000L, 32000L)) // MPEG-1

  /** MP3: skip ID3v2, sync to the first frame header, rate/channels
    * from it; duration from a Xing/Info frame count when present
    * (VBR), else NaN (a CBR estimate would need the full byte length
    * to be the stream, which a truncated corpus blob can't promise).
    */
  private def mp3Meta(b: Array[Byte]): (String, Long, Int, Double) = {
    var o = 0
    if (b.length > 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // syncsafe 28-bit size
      val sz = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      o = 10 + sz
    }
    // sync scan: with an ID3 tag the frame may sit after padding
    // (bounded window); WITHOUT one, require sync at the very start —
    // scanning arbitrary binaries for 0xFF Ex breeds false positives
    val hadId3 = o > 0
    if (hadId3) {
      val limit = math.min(b.length - 4, o + (1 << 16))
      while (o < limit && !((b(o) & 0xFF) == 0xFF && (b(o + 1) & 0xE0) == 0xE0)) o += 1
      if (o >= limit) return null
    } else {
      if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xE0) != 0xE0)
        return null
    }
    val verBits = (b(o + 1) >> 3) & 3
    val layerBits = (b(o + 1) >> 1) & 3
    if (verBits == 1 || layerBits == 0) return null // reserved
    val rates = Mp3Rates(verBits)
    val bitrateIdx = (b(o + 2) >> 4) & 0xF
    if (bitrateIdx == 0 || bitrateIdx == 0xF) return null // free-format/invalid
    val rateIdx = (b(o + 2) >> 2) & 3
    if (rateIdx == 3) return null
    val rate = rates(rateIdx)
    val chMode = (b(o + 3) >> 6) & 3
    val ch = if (chMode == 3) 1 else 2
    // samples per frame: layer I = 384; II = 1152; III = 1152 (MPEG-1) / 576
    val layer = 4 - layerBits // 1, 2, 3
    val spf =
      if (layer == 1) 384L
      else if (layer == 2) 1152L
      else if (verBits == 3) 1152L else 576L
    // Xing/Info offset FROM FRAME START: 4-byte header + side info
    // (MPEG-1: 32 stereo / 17 mono; MPEG-2: 17 / 9) = 36/21/21/13
    val xingOff =
      if (verBits == 3) { if (chMode == 3) 21 else 36 }
      else { if (chMode == 3) 13 else 21 }
    var dur = Double.NaN
    val xo = o + xingOff
    if (xo + 16 <= b.length) {
      val tag = new String(b, xo, 4, "US-ASCII")
      if ((tag == "Xing" || tag == "Info") && (be32(b, xo + 4) & 1L) == 1L) {
        val frames = be32(b, xo + 8)
        dur = frames.toDouble * spf / rate
      }
    }
    ("mp3", rate, ch, dur)
  }

  /** Ogg: identification header on the first page (Vorbis or Opus),
    * duration from the LAST page's granule position (PCM samples at
    * 48 kHz for Opus, at the coded rate for Vorbis).
    */
  private def oggMeta(b: Array[Byte]): (String, Long, Int, Double) = {
    if (b.length < 58) return null
    val nSegs = b(26) & 0xFF
    val dataOff = 27 + nSegs
    if (dataOff + 19 > b.length) return null
    var codec = ""
    var rate = 0L
    var ch = 0
    var granuleRate = 0L
    if (b(dataOff) == 1 && new String(b, dataOff + 1, 6, "US-ASCII") == "vorbis") {
      codec = "ogg-vorbis"
      ch = b(dataOff + 11) & 0xFF
      rate = le32(b, dataOff + 12)
      granuleRate = rate
    } else if (new String(b, dataOff, 8, "US-ASCII") == "OpusHead") {
      codec = "ogg-opus"
      ch = b(dataOff + 9) & 0xFF
      rate = le32(b, dataOff + 12) // input sample rate (informational)
      granuleRate = 48000L // Opus granules are ALWAYS 48 kHz
    } else return null
    if (rate <= 0 || ch < 1) return null
    // last page: scan back for an "OggS" that VALIDATES as a page
    // header (version 0, header-type flags < 8) — the capture pattern
    // also occurs inside packet data, whose trailing bytes would read
    // as a wild granule
    var dur = Double.NaN
    var p = b.length - 27
    var found = -1
    while (p >= 0 && found < 0) {
      if (b(p) == 'O' && b(p + 1) == 'g' && b(p + 2) == 'g' && b(p + 3) == 'S' &&
          b(p + 4) == 0 && (b(p + 5) & 0xFF) < 8)
        found = p
      p -= 1
    }
    if (found >= 0 && found + 14 <= b.length) {
      var g = 0L
      var i = 7
      while (i >= 0) { g = (g << 8) | (b(found + 6 + i) & 0xFFL); i -= 1 }
      if (g > 0 && granuleRate > 0) dur = g.toDouble / granuleRate
    }
    (codec, rate, ch, dur)
  }
}
