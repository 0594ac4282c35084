package graft.ext

/** WebM / Matroska metadata without a codec: an EBML walk (the
  * Matroska container spec, RFC 8794 EBML + the public Matroska
  * element registry) over the Segment's Info and Tracks elements —
  * the second-most-common video container in scraped corpora after
  * MP4, and the one every VP8/VP9/AV1 clip ships in. Same triage
  * contract as [[Avc]]'s MP4 walk: codec id, PIXEL dimensions from
  * the track entry, duration from Info — no bitstream parse, no
  * decode, loud nulls for anything malformed.
  *
  * EBML numbers: element IDs keep their marker bit (read as-is);
  * SIZES strip it (VINT_DATA). All-ones size = "unknown" (streamed
  * files) — treated as "extends to parent end".
  */
object Webm {

  private val MaxDepthElements = 1 << 16

  /** (id, dataStart, dataEnd) of EBML elements in [lo, hi). */
  private def elements(b: Array[Byte], lo: Long, hi: Long): Iterator[(Long, Long, Long)] =
    new Iterator[(Long, Long, Long)] {
      private var pos = lo
      private var n = 0 // declared BEFORE nextElem: advance() reads it
      private var nextElem: (Long, Long, Long) = advance()

      private def vint(p: Long, keepMarker: Boolean): (Long, Long) = {
        // returns (value, bytesConsumed) or null-equivalent (-1, 0)
        if (p >= hi) return (-1L, 0L)
        val first = b(p.toInt) & 0xFF
        if (first == 0) return (-1L, 0L)
        val len = Integer.numberOfLeadingZeros(first) - 24 + 1
        if (len < 1 || len > 8 || p + len > hi) return (-1L, 0L)
        var v: Long = if (keepMarker) first else first & ((1 << (8 - len)) - 1)
        var i = 1
        while (i < len) { v = (v << 8) | (b((p + i).toInt) & 0xFF); i += 1 }
        (v, len.toLong)
      }

      private def advance(): (Long, Long, Long) = {
        n += 1
        if (n > MaxDepthElements || pos >= hi) return null
        val (id, idLen) = vint(pos, keepMarker = true)
        if (idLen == 0) return null
        val (size, szLen) = vint(pos + idLen, keepMarker = false)
        if (szLen == 0) return null
        val dataStart = pos + idLen + szLen
        // all-VINT_DATA-ones = unknown size → to parent end; a KNOWN
        // size past the buffer clamps to it instead of aborting —
        // prefix-fetched corpus blobs hold a Segment whose declared
        // size is the full file, with Info/Tracks entirely present
        val unknown = size == (1L << (7 * szLen)) - 1
        val dataEnd = if (unknown) hi else math.min(dataStart + size, hi)
        if (dataStart > hi || dataEnd < dataStart) return null
        pos = dataEnd
        (id, dataStart, dataEnd)
      }

      override def hasNext: Boolean = nextElem != null
      override def next(): (Long, Long, Long) = {
        val e = nextElem
        nextElem = advance()
        e
      }
    }

  private def find(b: Array[Byte], lo: Long, hi: Long, id: Long): Option[(Long, Long)] =
    elements(b, lo, hi).collectFirst { case (i, s, e) if i == id => (s, e) }

  private def uint(b: Array[Byte], s: Long, e: Long): Long = {
    var v = 0L
    var i = s
    while (i < e && i - s < 8) { v = (v << 8) | (b(i.toInt) & 0xFF); i += 1 }
    v
  }

  private def float(b: Array[Byte], s: Long, e: Long): Double =
    (e - s) match {
      case 4 => java.lang.Float.intBitsToFloat(uint(b, s, e).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uint(b, s, e))
      case _ => Double.NaN
    }

  // Matroska element IDs (with marker bits, per the registry)
  private val Ebml = 0x1A45DFA3L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val Tracks = 0x1654AE6BL
  private val TimestampScale = 0x2AD7B1L
  private val DurationId = 0x4489L
  private val TrackEntry = 0xAEL
  private val TrackType = 0x83L
  private val CodecId = 0x86L
  private val VideoEl = 0xE0L
  private val AudioEl = 0xE1L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL
  private val SamplingFrequency = 0xB5L
  private val Channels = 0x9FL
  private val DocType = 0x4282L

  /** Typed metadata of a WebM/Matroska payload, or null:
    * (docType, durationSec, videoCodec, width, height, audioCodec,
    * sampleRate, channels) — absent members empty/NaN/0, so the
    * struct shape is stable for SQL. Null when the payload is not
    * EBML or carries no Segment.
    */
  def metaOrNull(bytes: Array[Byte]): (String, Double, String, Long, Long, String, Double, Long) = {
    try {
      if (bytes == null || bytes.length < 8) return null
      val header = find(bytes, 0, bytes.length, Ebml).getOrElse(return null)
      val docType = find(bytes, header._1, header._2, DocType)
        .map { case (s, e) => new String(bytes, s.toInt, (e - s).toInt, "US-ASCII") }
        .getOrElse("")
      val seg = find(bytes, header._2, bytes.length, Segment).getOrElse(return null)
      var tsScale = 1000000L // Matroska default: 1 ms
      var durTicks = Double.NaN
      find(bytes, seg._1, seg._2, Info).foreach { case (is, ie) =>
        find(bytes, is, ie, TimestampScale).foreach { case (s, e) =>
          tsScale = uint(bytes, s, e)
        }
        find(bytes, is, ie, DurationId).foreach { case (s, e) =>
          durTicks = float(bytes, s, e)
        }
      }
      val durationSec =
        if (durTicks.isNaN || tsScale <= 0) Double.NaN
        else durTicks * tsScale / 1e9
      var vCodec = ""; var w = 0L; var h = 0L
      var aCodec = ""; var rate = Double.NaN; var ch = 0L
      find(bytes, seg._1, seg._2, Tracks).foreach { case (ts, te) =>
        elements(bytes, ts, te).foreach {
          case (TrackEntry, es, ee) =>
            val tpe = find(bytes, es, ee, TrackType).map(p => uint(bytes, p._1, p._2)).getOrElse(0L)
            val codec = find(bytes, es, ee, CodecId)
              .map { case (s, e) => new String(bytes, s.toInt, (e - s).toInt, "US-ASCII") }
              .getOrElse("")
            if (tpe == 1L && vCodec.isEmpty) { // video
              vCodec = codec
              find(bytes, es, ee, VideoEl).foreach { case (vs, ve) =>
                find(bytes, vs, ve, PixelWidth).foreach(p => w = uint(bytes, p._1, p._2))
                find(bytes, vs, ve, PixelHeight).foreach(p => h = uint(bytes, p._1, p._2))
              }
            } else if (tpe == 2L && aCodec.isEmpty) { // audio
              aCodec = codec
              find(bytes, es, ee, AudioEl).foreach { case (as, ae) =>
                find(bytes, as, ae, SamplingFrequency).foreach(p => rate = float(bytes, p._1, p._2))
                find(bytes, as, ae, Channels).foreach(p => ch = uint(bytes, p._1, p._2))
              }
            }
          case _ => ()
        }
      }
      (docType, durationSec, vCodec, w, h, aCodec, rate, ch)
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }
}
