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
  private val TrackNumber = 0xD7L
  private val CodecId = 0x86L
  private val VideoEl = 0xE0L
  private val AudioEl = 0xE1L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL
  private val SamplingFrequency = 0xB5L
  private val Channels = 0x9FL
  private val DocType = 0x4282L
  private val Cluster = 0x1F43B675L
  private val ClusterTimestamp = 0xE7L
  private val SimpleBlock = 0xA3L
  private val BlockGroup = 0xA0L
  private val BlockEl = 0xA1L
  private val BlockDuration = 0x9BL
  private val CodecPrivate = 0x63A2L

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

  // ------------------- block walk (round 13: triage parity with MP4)

  /** One block: track number, presentation time (ms), keyframe flag,
    * FRAME byte size (payload after the block header).
    */
  final case class Block(track: Long, tMs: Long, keyframe: Boolean,
                         size: Long, off: Long)

  /** (tsScale, segStart, segEnd) or null — the cluster walks share
    * this prologue.
    */
  private def segmentInfo(bytes: Array[Byte]): (Long, Long, Long) = {
    if (bytes == null || bytes.length < 8) return null
    val header = find(bytes, 0, bytes.length, Ebml).getOrElse(return null)
    val seg = find(bytes, header._2, bytes.length, Segment).getOrElse(return null)
    var tsScale = 1000000L
    find(bytes, seg._1, seg._2, Info).foreach { case (is, ie) =>
      find(bytes, is, ie, TimestampScale).foreach { case (s, e) =>
        tsScale = uint(bytes, s, e)
      }
    }
    if (tsScale <= 0) return null
    (tsScale, seg._1, seg._2)
  }

  /** Parse one (Simple)Block header at [s, e): (track, relTs, flags,
    * payloadStart) or null. Only non-laced blocks are in subset
    * (lacing bits 0x06 must be 0) — every subtitle block and the
    * overwhelming majority of video blocks.
    */
  private def blockHeader(b: Array[Byte], s: Long, e: Long): (Long, Int, Int, Long) = {
    if (s >= e) return null
    val first = b(s.toInt) & 0xFF
    if (first == 0) return null
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (len < 1 || len > 8 || s + len + 3 > e) return null
    var track: Long = first & ((1 << (8 - len)) - 1)
    var i = 1
    while (i < len) { track = (track << 8) | (b((s + i).toInt) & 0xFF); i += 1 }
    val rel = (((b((s + len).toInt) & 0xFF) << 8) |
      (b((s + len + 1).toInt) & 0xFF)).toShort.toInt
    val flags = b((s + len + 2).toInt) & 0xFF
    if ((flags & 0x06) != 0) return null // laced: out of subset
    (track, rel, flags, s + len + 3)
  }

  /** Block index of a WebM/Matroska payload — (track, t_ms, keyframe,
    * frame size) per block in storage order, or null when the payload
    * is not EBML / carries no clusters. Keyframes: the SimpleBlock
    * 0x80 flag; a BlockGroup block is a keyframe iff it carries no
    * ReferenceBlock (subset: BlockGroups here are subtitle-shaped, so
    * they report keyframe = true). The triage index an MP4's
    * stss/stsz walk provides — no codec work.
    */
  def blockIndexOrNull(bytes: Array[Byte], maxN: Int): Array[Block] = {
    try {
      if (maxN < 1) return null
      val si = segmentInfo(bytes)
      if (si == null) return null
      val (tsScale, ss, se) = si
      val out = new scala.collection.mutable.ArrayBuffer[Block]()
      elements(bytes, ss, se).foreach {
        case (Cluster, cs, ce) if out.length < maxN =>
          var base = 0L
          elements(bytes, cs, ce).foreach {
            case (ClusterTimestamp, s, e) => base = uint(bytes, s, e)
            case (SimpleBlock, s, e) if out.length < maxN =>
              val h = blockHeader(bytes, s, e)
              if (h != null)
                out += Block(h._1, (base + h._2) * tsScale / 1000000L,
                  (h._3 & 0x80) != 0, e - h._4, h._4)
            case (BlockGroup, gs, ge) if out.length < maxN =>
              find(bytes, gs, ge, BlockEl).foreach { case (s, e) =>
                val h = blockHeader(bytes, s, e)
                if (h != null)
                  out += Block(h._1, (base + h._2) * tsScale / 1000000L,
                    keyframe = true, e - h._4, h._4)
              }
            case _ => ()
          }
        case _ => ()
      }
      if (out.isEmpty) null else out.toArray
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** CodecPrivate bytes of the first video track whose CodecID is
    * `codecId` (round 14: the V_AV1 av1C record), or null.
    */
  def codecPrivateOrNull(bytes: Array[Byte], codecId: String): Array[Byte] = {
    try {
      val si = segmentInfo(bytes)
      if (si == null) return null
      val (_, ss, se) = si
      find(bytes, ss, se, Tracks).foreach { case (ts, te) =>
        elements(bytes, ts, te).foreach {
          case (TrackEntry, es, ee) =>
            val codec = find(bytes, es, ee, CodecId)
              .map { case (s, e) => new String(bytes, s.toInt, (e - s).toInt, "US-ASCII") }
              .getOrElse("")
            if (codec == codecId) {
              find(bytes, es, ee, CodecPrivate).foreach { case (s, e) =>
                return java.util.Arrays.copyOfRange(bytes, s.toInt, e.toInt)
              }
              return null
            }
          case _ => ()
        }
      }
      null
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** Per-packet payload ranges of one (Simple)Block at [s, e) with
    * FULL lacing support (none / Xiph / fixed-size / EBML — RFC 9559
    * §10.3): real-world Matroska muxers Xiph-lace small audio packets,
    * so the audio decode route cannot ride [[blockHeader]]'s
    * non-laced triage subset (dropping laced packets mid-stream would
    * corrupt the Vorbis overlap-add chain, not fail it).  Returns
    * (track, packet ranges in order) or null on malformed framing.
    */
  private[graft] def blockPackets(b: Array[Byte], s: Long, e: Long): (Long, Array[(Long, Long)]) = {
    if (s >= e) return null
    val first = b(s.toInt) & 0xFF
    if (first == 0) return null
    val len = Integer.numberOfLeadingZeros(first) - 24 + 1
    if (len < 1 || len > 8 || s + len + 3 > e) return null
    var track: Long = first & ((1 << (8 - len)) - 1)
    var i = 1
    while (i < len) { track = (track << 8) | (b((s + i).toInt) & 0xFF); i += 1 }
    val flags = b((s + len + 2).toInt) & 0xFF
    var p = s + len + 3
    val lacing = (flags >> 1) & 3
    if (lacing == 0) return (track, Array((p, e)))
    if (p >= e) return null
    val n = (b(p.toInt) & 0xFF) + 1
    p += 1
    val sizes = new Array[Long](n)
    lacing match {
      case 1 => // Xiph: 255-run sizes for the first n-1 frames
        var k = 0
        while (k < n - 1) {
          var sz = 0L
          var more = true
          while (more) {
            if (p >= e) return null
            val x = b(p.toInt) & 0xFF; p += 1
            sz += x
            more = x == 255
          }
          sizes(k) = sz; k += 1
        }
      case 3 => // EBML: first size unsigned VINT, then signed deltas
        var k = 0
        var prev = 0L
        while (k < n - 1) {
          if (p >= e) return null
          val f0 = b(p.toInt) & 0xFF
          if (f0 == 0) return null
          val l0 = Integer.numberOfLeadingZeros(f0) - 24 + 1
          if (l0 < 1 || l0 > 8 || p + l0 > e) return null
          var v: Long = f0 & ((1 << (8 - l0)) - 1)
          var j = 1
          while (j < l0) { v = (v << 8) | (b((p + j).toInt) & 0xFF); j += 1 }
          p += l0
          val sz = if (k == 0) v else prev + (v - ((1L << (7 * l0 - 1)) - 1))
          if (sz < 0) return null
          sizes(k) = sz; prev = sz
          k += 1
        }
      case _ => // 2 = fixed-size: remainder split evenly
        val rem = e - p
        if (rem <= 0 || rem % n != 0) return null
        var k = 0
        while (k < n) { sizes(k) = rem / n; k += 1 }
    }
    if (lacing != 2) {
      var used = 0L
      var k = 0
      while (k < n - 1) { used += sizes(k); k += 1 }
      if (p + used > e) return null
      sizes(n - 1) = e - p - used
    }
    val out = new Array[(Long, Long)](n)
    var k = 0
    var q0 = p
    while (k < n) {
      out(k) = (q0, q0 + sizes(k))
      q0 += sizes(k)
      k += 1
    }
    (track, out)
  }

  /** Decoded PCM of the file's first `A_VORBIS` audio track (round
    * 15, verdict item 9): CodecPrivate carries the three Vorbis
    * headers Xiph-laced (count byte + 255-run lacing sizes), each
    * SimpleBlock payload is one audio packet — assembled and fed to
    * the SAME [[VorbisDecode]] core as the Ogg walk, so WebM joins
    * the audio curation/dedup family with no codec special-casing.
    * Null when the payload is not EBML, carries no Vorbis track, or
    * nothing decodes.  (Matroska has no granule position, so the
    * Ogg-side final trim is skipped.)
    */
  def vorbisPcmOrNull(bytes: Array[Byte], maxN: Int = 4096): VorbisDecode.Pcm = {
    try {
      val cp = codecPrivateOrNull(bytes, "A_VORBIS")
      if (cp == null || cp.length < 3 || (cp(0) & 0xFF) != 2) return null
      // Xiph lacing: sizes of the first two packets as 255-runs
      var p = 1
      var sz1 = 0
      while ((cp(p) & 0xFF) == 255) { sz1 += 255; p += 1 }
      sz1 += cp(p) & 0xFF; p += 1
      var sz2 = 0
      while ((cp(p) & 0xFF) == 255) { sz2 += 255; p += 1 }
      sz2 += cp(p) & 0xFF; p += 1
      if (p + sz1 + sz2 > cp.length) return null
      val hdr1 = java.util.Arrays.copyOfRange(cp, p, p + sz1)
      val hdr2 = java.util.Arrays.copyOfRange(cp, p + sz1, p + sz1 + sz2)
      val hdr3 = java.util.Arrays.copyOfRange(cp, p + sz1 + sz2, cp.length)
      // the Vorbis track's number, for block filtering
      val si = segmentInfo(bytes)
      if (si == null) return null
      var trackNo = -1L
      find(bytes, si._2, si._3, Tracks).foreach { case (ts, te) =>
        elements(bytes, ts, te).foreach {
          case (TrackEntry, es, ee) =>
            val codec = find(bytes, es, ee, CodecId)
              .map { case (s, e) =>
                new String(bytes, s.toInt, (e - s).toInt, "US-ASCII") }
              .getOrElse("")
            if (codec == "A_VORBIS" && trackNo < 0)
              trackNo = find(bytes, es, ee, TrackNumber)
                .map { case (s, e) => uint(bytes, s, e) }.getOrElse(-1L)
          case _ => ()
        }
      }
      if (trackNo < 0) return null
      // direct cluster walk: lacing-aware packet extraction, and the
      // maxN budget counts VORBIS packets only (a muxed video track's
      // interleaved blocks must not starve the audio stream)
      val audio = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      def addBlock(s: Long, e: Long): Unit = {
        val bp = blockPackets(bytes, s, e)
        if (bp != null && bp._1 == trackNo) {
          var k = 0
          while (k < bp._2.length && audio.length < maxN) {
            val (ps, pe) = bp._2(k)
            if (pe <= bytes.length && pe > ps)
              audio += java.util.Arrays.copyOfRange(bytes, ps.toInt, pe.toInt)
            k += 1
          }
        }
      }
      elements(bytes, si._2, si._3).foreach {
        case (Cluster, cs, ce) if audio.length < maxN =>
          elements(bytes, cs, ce).foreach {
            case (SimpleBlock, s, e) if audio.length < maxN => addBlock(s, e)
            case (BlockGroup, gs, ge) if audio.length < maxN =>
              find(bytes, gs, ge, BlockEl).foreach { case (s, e) => addBlock(s, e) }
            case _ => ()
          }
        case _ => ()
      }
      if (audio.isEmpty) return null
      VorbisDecode.decodePacketsOrNull(
        (Array(hdr1, hdr2, hdr3) ++ audio).toArray, lastGranule = -1L)
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** dHashes of the first `maxN` VP8 KEYFRAMES of the file's V_VP8
    * track — WebM's entry into the image/video near-duplicate family
    * (round 14): blocks from the triage walk, pixels from the [[Vp8]]
    * keyframe decoder, the hash bit rule shared with
    * [[Images.dhashOfThumb]] so WebM, MP4 and still-image hashes stay
    * comparable by construction. Null when the payload is not EBML,
    * carries no VP8 video track, or nothing decodes.
    */
  def vp8KeyframeDhashes(bytes: Array[Byte], maxN: Int): Array[Long] = {
    try {
      if (maxN < 1) return null
      val si = segmentInfo(bytes)
      if (si == null) return null
      val (_, ss, se) = si
      var vp8Track = -1L
      find(bytes, ss, se, Tracks).foreach { case (ts, te) =>
        elements(bytes, ts, te).foreach {
          case (TrackEntry, es, ee) if vp8Track < 0 =>
            val tpe = find(bytes, es, ee, TrackType)
              .map(p => uint(bytes, p._1, p._2)).getOrElse(0L)
            val codec = find(bytes, es, ee, CodecId)
              .map { case (s, e) => new String(bytes, s.toInt, (e - s).toInt, "US-ASCII") }
              .getOrElse("")
            if (tpe == 1L && codec == "V_VP8")
              vp8Track = find(bytes, es, ee, TrackNumber)
                .map(p => uint(bytes, p._1, p._2)).getOrElse(-1L)
          case _ => ()
        }
      }
      if (vp8Track < 0) return null
      val blocks = blockIndexOrNull(bytes, 1 << 14)
      if (blocks == null) return null
      val out = new scala.collection.mutable.ArrayBuffer[Long]()
      var i = 0
      while (i < blocks.length && out.length < maxN) {
        val blk = blocks(i)
        if (blk.track == vp8Track && blk.keyframe &&
            blk.off + blk.size <= bytes.length) {
          val p = Vp8.decodeFrameOrNull(bytes, blk.off.toInt, blk.size.toInt)
          if (p != null) {
            val g = Vp8.grayOrNull(p)
            out += Images.dhashOfThumb(Images.resizeGray(g._1, g._2, g._3, 9, 8))
          }
        }
        i += 1
      }
      if (out.isEmpty) null else out.toArray
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** dHashes of the first `maxN` AV1 KEYFRAMES of the file's V_AV1
    * track (round 15): the av1C CodecPrivate carries the sequence
    * header in its configOBUs tail; each keyframe block holds the
    * frame OBUs — prepended and decoded through [[Av1Decode]] (the
    * CodedLossless scope), hashed with the SAME bit rule as every
    * other carriage.  Null when no AV1 track or nothing decodes.
    */
  def av1KeyframeDhashes(bytes: Array[Byte], maxN: Int): Array[Long] = {
    try {
      if (maxN < 1) return null
      val cp = codecPrivateOrNull(bytes, "V_AV1")
      if (cp == null || cp.length < 5) return null
      val seqObus = java.util.Arrays.copyOfRange(cp, 4, cp.length)
      val si = segmentInfo(bytes)
      if (si == null) return null
      var track = -1L
      find(bytes, si._2, si._3, Tracks).foreach { case (ts, te) =>
        elements(bytes, ts, te).foreach {
          case (TrackEntry, es, ee) if track < 0 =>
            val codec = find(bytes, es, ee, CodecId)
              .map { case (s, e) =>
                new String(bytes, s.toInt, (e - s).toInt, "US-ASCII") }
              .getOrElse("")
            if (codec == "V_AV1")
              track = find(bytes, es, ee, TrackNumber)
                .map(p => uint(bytes, p._1, p._2)).getOrElse(-1L)
          case _ => ()
        }
      }
      if (track < 0) return null
      val blocks = blockIndexOrNull(bytes, 1 << 14)
      if (blocks == null) return null
      val out = new scala.collection.mutable.ArrayBuffer[Long]()
      var i = 0
      while (i < blocks.length && out.length < maxN) {
        val blk = blocks(i)
        if (blk.track == track && blk.keyframe &&
            blk.off + blk.size <= bytes.length) {
          val frame = java.util.Arrays.copyOfRange(bytes, blk.off.toInt,
            (blk.off + blk.size).toInt)
          val g = Av1Decode.grayOrNull(seqObus ++ frame)
          if (g != null)
            out += Images.dhashOfThumb(Images.resizeGray(g._1, g._2, g._3, 9, 8))
        }
        i += 1
      }
      if (out.isEmpty) null else out.toArray
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** ASS/SSA dialogue text → plain cue text: the Matroska S_TEXT/ASS
    * block stores the Dialogue line's fields after Start/End
    * (ReadOrder, Layer, Style, Name, 3 margins, Effect, Text — text
    * is everything after the 8th comma), and the text itself carries
    * `{\…}` override blocks, `\N`/`\n` hard/soft breaks, and `\h`
    * hard spaces.
    */
  private def assText(raw: String): String = {
    var t = raw
    var commas = 0
    var cut = 0
    while (commas < 8 && cut < t.length) {
      if (t.charAt(cut) == ',') commas += 1
      cut += 1
    }
    if (commas == 8) t = t.substring(cut)
    Subtitles.assClean(t) // one cleaner for block and standalone ASS
  }

  /** Subtitle cues out of a WebM/Matroska payload — the S_TEXT
    * tracks are PURE TEXT, no codec work (the round-12 verdict's
    * point): S_TEXT/UTF8 blocks carry the cue text directly (SRT-ish
    * inline tags cleaned by the [[Subtitles]] contract);
    * S_TEXT/WEBVTT blocks use the public Matroska WebVTT storage
    * layout (line 1 = cue settings, line 2 = cue identifier, the
    * rest = cue text); S_TEXT/ASS and S_TEXT/SSA blocks carry the
    * Dialogue fields after Start/End ([[assText]]: text after the
    * 8th comma, `{\…}` overrides stripped, `\N`→newline, `\h`→space
    * — the mkv anime-corpus shape). Timing: cluster timestamp +
    * block relative timestamp (ticks of TimestampScale ns → ms), end
    * from BlockGroup's BlockDuration (start == end for duration-less
    * SimpleBlocks). Returns (start_ms, end_ms, text) rows in storage
    * order, or null when no S_TEXT track exists.
    */
  def subtitleCuesOrNull(bytes: Array[Byte], maxN: Int): Array[(Long, Long, String)] = {
    try {
      if (maxN < 1) return null
      val si = segmentInfo(bytes)
      if (si == null) return null
      val (tsScale, ss, se) = si
      // subtitle track: type 0x11, an S_TEXT codec id
      var subTrack = -1L
      var codecId = ""
      find(bytes, ss, se, Tracks).foreach { case (ts, te) =>
        elements(bytes, ts, te).foreach {
          case (TrackEntry, es, ee) if subTrack < 0 =>
            val tpe = find(bytes, es, ee, TrackType)
              .map(p => uint(bytes, p._1, p._2)).getOrElse(0L)
            val codec = find(bytes, es, ee, CodecId)
              .map { case (s, e) => new String(bytes, s.toInt, (e - s).toInt, "US-ASCII") }
              .getOrElse("")
            if (tpe == 0x11 && codec.startsWith("S_TEXT/")) {
              subTrack = find(bytes, es, ee, TrackNumber)
                .map(p => uint(bytes, p._1, p._2)).getOrElse(-1L)
              codecId = codec
            }
          case _ => ()
        }
      }
      if (subTrack < 0) return null
      val isVtt = codecId == "S_TEXT/WEBVTT"
      val isAss = codecId == "S_TEXT/ASS" || codecId == "S_TEXT/SSA"
      def toMs(ticks: Long): Long = ticks * tsScale / 1000000L
      def cueText(b: Array[Byte], s: Long, e: Long): String = {
        val raw = new String(b, s.toInt, (e - s).toInt, "UTF-8")
        if (isAss) assText(raw)
        else {
          val body =
            if (isVtt) {
              // Matroska WebVTT storage: settings \n identifier \n text
              val lines = raw.split("\n", 3)
              if (lines.length == 3) lines(2) else lines.last
            } else raw
          Subtitles.cleanText(body)
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
      elements(bytes, ss, se).foreach {
        case (Cluster, cs, ce) if out.length < maxN =>
          var base = 0L
          elements(bytes, cs, ce).foreach {
            case (ClusterTimestamp, s, e) => base = uint(bytes, s, e)
            case (SimpleBlock, s, e) if out.length < maxN =>
              val h = blockHeader(bytes, s, e)
              if (h != null && h._1 == subTrack) {
                val t0 = toMs(base + h._2)
                val txt = cueText(bytes, h._4, e)
                if (txt.nonEmpty) out += ((t0, t0, txt))
              }
            case (BlockGroup, gs, ge) if out.length < maxN =>
              val blk = find(bytes, gs, ge, BlockEl).orNull
              if (blk != null) {
                val h = blockHeader(bytes, blk._1, blk._2)
                if (h != null && h._1 == subTrack) {
                  val dur = find(bytes, gs, ge, BlockDuration)
                    .map(p => uint(bytes, p._1, p._2)).getOrElse(0L)
                  val t0 = toMs(base + h._2)
                  val txt = cueText(bytes, h._4, blk._2)
                  if (txt.nonEmpty) out += ((t0, t0 + toMs(dur), txt))
                }
              }
            case _ => ()
          }
        case _ => ()
      }
      if (out.isEmpty) null else out.toArray
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }
}
