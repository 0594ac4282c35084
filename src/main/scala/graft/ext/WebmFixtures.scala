package graft.ext

/** Deterministic WebM/Matroska corpus for q167/q168 (the
  * SubtitleFixtures pattern): a minimal EBML writer (RFC 8794
  * encoding — element IDs written with their marker bits, sizes as
  * minimal VINTs) emitting files whose every block/cue parameter is
  * id arithmetic mirrored by the oracle SQL.
  */
object WebmFixtures {

  // ------------------------------------------- EBML writer

  /** Element ID as stored (marker bit included): minimal big-endian
    * bytes.
    */
  private def idBytes(id: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (id >>> (8 * n)) != 0) n += 1
    Array.tabulate(n)(i => ((id >>> (8 * (n - 1 - i))) & 0xFF).toByte)
  }

  /** Size as a VINT (marker in the leading byte). */
  private def vint(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && v >= (1L << (7 * n)) - 1) n += 1
    val marked = v | (1L << (7 * n))
    Array.tabulate(n)(i => ((marked >>> (8 * (n - 1 - i))) & 0xFF).toByte)
  }

  private def el(id: Long, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    idBytes(id) ++ vint(body.length.toLong) ++ body
  }

  /** Unsigned integer payload: minimal big-endian, ≥ 1 byte. */
  private def uintBytes(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (v >>> (8 * n)) != 0) n += 1
    Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xFF).toByte)
  }

  // element IDs (the registry subset the reader walks)
  private val Ebml = 0x1A45DFA3L
  private val DocType = 0x4282L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimestampScale = 0x2AD7B1L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val TrackNumber = 0xD7L
  private val TrackType = 0x83L
  private val CodecId = 0x86L
  private val VideoEl = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL
  private val Cluster = 0x1F43B675L
  private val ClusterTimestamp = 0xE7L
  private val SimpleBlockId = 0xA3L
  private val CodecPrivateId = 0x63A2L
  private val BlockGroup = 0xA0L
  private val BlockEl = 0xA1L
  private val BlockDuration = 0x9BL

  private def header: Array[Byte] =
    el(Ebml, el(DocType, "webm".getBytes("US-ASCII")))

  private def info: Array[Byte] =
    el(Info, el(TimestampScale, uintBytes(1000000L))) // 1 ms ticks

  /** (Simple)Block body: VINT track, s16 relative timestamp, flags,
    * frame payload (no lacing).
    */
  private def blockBody(track: Long, relTs: Int, flags: Int,
                        frame: Array[Byte]): Array[Byte] =
    vint(track) ++ Array(((relTs >> 8) & 0xFF).toByte, (relTs & 0xFF).toByte,
      flags.toByte) ++ frame

  // ------------------------------------------- q167: subtitle cues

  /** WebM carrying the q160 cue corpus in an S_TEXT subtitle track
    * (track 2, after a VP9 video track entry the selector must skip),
    * rotating ALL THREE Matroska text codecs by id % 3:
    * S_TEXT/UTF8 (payload = raw cue text), S_TEXT/WEBVTT (the public
    * Matroska WebVTT storage: settings \n identifier \n text), and
    * S_TEXT/ASS (Dialogue fields after Start/End — text after the
    * 8th comma, `{\…}` overrides and `\N` hard breaks the reader
    * must clean). Cluster layout alternates by id/2 parity: one
    * cluster PER CUE (cluster ts = cue start, rel 0) vs one cluster
    * for the file (rel = cue start). Cues sit in BlockGroups with
    * BlockDuration = 1500 — exactly the standalone corpus's
    * timeline, so the q167 oracle IS q160's arithmetic.
    */
  def subtitleWebm(id: Long): Array[Byte] = {
    val n = SubtitleFixtures.nCues(id)
    val vtt = id % 3 == 1
    val ass = id % 3 == 2
    val codec =
      if (vtt) "S_TEXT/WEBVTT"
      else if (ass) "S_TEXT/ASS"
      else "S_TEXT/UTF8"
    val tracks = el(Tracks,
      el(TrackEntry,
        el(TrackNumber, uintBytes(1)),
        el(TrackType, uintBytes(1)),
        el(CodecId, "V_VP9".getBytes("US-ASCII")),
        el(VideoEl, el(PixelWidth, uintBytes(320)),
          el(PixelHeight, uintBytes(240)))),
      el(TrackEntry,
        el(TrackNumber, uintBytes(2)),
        el(TrackType, uintBytes(0x11)),
        el(CodecId, codec.getBytes("US-ASCII"))))
    def cuePayload(k: Int): Array[Byte] = {
      val body =
        if (ass) {
          // the cleaned text is the q160 closed form: overrides strip,
          // \N becomes the newline of the two-line cue
          val t = SubtitleFixtures.expectedText(id, k).replace("\n", "\\N")
          s"$k,0,Default,,0,0,0,,{\\an8}$t"
        } else {
          val raw = SubtitleFixtures.rawText(id, k)
          if (vtt) s"align:start\nc$k\n$raw" else raw
        }
      body.getBytes("UTF-8")
    }
    def group(k: Int, relTs: Int): Array[Byte] =
      el(BlockGroup,
        el(BlockEl, blockBody(2, relTs, 0, cuePayload(k))),
        el(BlockDuration, uintBytes(1500)))
    val clusters: Seq[Array[Byte]] =
      if ((id / 2) % 2 == 0)
        (0 until n).map { k =>
          el(Cluster,
            el(ClusterTimestamp, uintBytes(SubtitleFixtures.startMs(id, k))),
            group(k, 0))
        }
      else
        Seq(el(Cluster,
          (el(ClusterTimestamp, uintBytes(0)) +:
            (0 until n).map(k =>
              group(k, SubtitleFixtures.startMs(id, k).toInt))): _*))
    header ++ el(Segment, (Seq(info, tracks) ++ clusters): _*)
  }

  // ------------------------------------------- q168: block index

  def q168NBlocks(id: Long): Int = (4 + id % 5).toInt

  /** WebM with a video track whose SimpleBlock timeline is pure id
    * arithmetic — block j at t = 250·j ms, keyframe iff j % 4 == 0,
    * frame size 10 + (id + j) % 17 — the triage shape (timestamps /
    * keyframe flags / sizes without codec work) q168 hash-gates.
    * Clusters split every 3 blocks; cluster ts = its first block's t.
    */
  def blockWebm(id: Long): Array[Byte] = {
    val n = q168NBlocks(id)
    val tracks = el(Tracks,
      el(TrackEntry,
        el(TrackNumber, uintBytes(1)),
        el(TrackType, uintBytes(1)),
        el(CodecId, "V_VP8".getBytes("US-ASCII")),
        el(VideoEl, el(PixelWidth, uintBytes(640)),
          el(PixelHeight, uintBytes(360)))))
    val clusters = (0 until n).grouped(3).map { grp =>
      val base = 250L * grp.head
      el(Cluster,
        (el(ClusterTimestamp, uintBytes(base)) +:
          grp.map { j =>
            val size = (10 + (id + j) % 17).toInt
            val frame = Array.tabulate(size)(i => ((id + j * 31 + i) & 0xFF).toByte)
            el(SimpleBlockId,
              blockBody(1, (250L * j - base).toInt,
                if (j % 4 == 0) 0x80 else 0x00, frame))
          }): _*)
    }.toSeq
    header ++ el(Segment, (Seq(info, tracks) ++ clusters): _*)
  }

  /** WebM carrying a V_AV1 track whose CodecPrivate is the given
    * av1C record (round 14: the metadata triage carriage — no
    * clusters needed)
    */
  /** WebM carrying a V_AV1 track with REAL keyframe blocks (round
    * 15): av1C CodecPrivate = 4 config bytes + the sequence-header
    * OBU; one SimpleBlock per frame (frame OBUs without the seq
    * header, the Matroska AV1 mapping).
    */
  def av1VideoWebm(seqObu: Array[Byte], frames: Seq[Array[Byte]],
                   w: Int, h: Int): Array[Byte] = {
    val av1c = Array[Byte](0x81.toByte, 0x00, 0x0C, 0x00) ++ seqObu
    val tracks = el(Tracks, el(TrackEntry,
      el(TrackNumber, uintBytes(1)),
      el(TrackType, uintBytes(1)),
      el(CodecId, "V_AV1".getBytes("US-ASCII")),
      el(CodecPrivateId, av1c),
      el(VideoEl, el(PixelWidth, uintBytes(w.toLong)),
        el(PixelHeight, uintBytes(h.toLong)))))
    val clusters = frames.zipWithIndex.map { case (f, k) =>
      el(Cluster,
        el(ClusterTimestamp, uintBytes(k * 500L)),
        el(SimpleBlockId, blockBody(1, 0, 0x80, f)))
    }
    header ++ el(Segment, (Seq(info, tracks) ++ clusters): _*)
  }

  def av1Webm(codecPrivate: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val tracks = el(Tracks, el(TrackEntry,
      el(TrackNumber, uintBytes(1)),
      el(TrackType, uintBytes(1)),
      el(CodecId, "V_AV1".getBytes("US-ASCII")),
      el(0x63A2L, codecPrivate), // CodecPrivate
      el(VideoEl, el(PixelWidth, uintBytes(w.toLong)),
        el(PixelHeight, uintBytes(h.toLong)))))
    header ++ el(Segment, info, tracks)
  }

  /** WebM carrying REAL VP8 keyframes (round 14): a V_VP8 video
    * track whose SimpleBlocks hold the given `(tMs, frame)` payloads
    * (all keyframe-flagged — the [[graft.ext.Vp8Fixtures]] encoder
    * emits keyframes only). The fixture source for WebM/VP8 and
    * cross-container near-dup corpora.
    */
  /** WebM carrying an `A_VORBIS` audio track: the three Vorbis
    * headers Xiph-laced into CodecPrivate, one SimpleBlock per audio
    * packet — the carriage twin of an Ogg Vorbis stream (round 15).
    */
  def vorbisWebm(headers: Seq[Array[Byte]],
                 packets: Seq[Array[Byte]]): Array[Byte] = {
    require(headers.length == 3)
    def lace(n: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var v = n
      while (v >= 255) { out.write(255); v -= 255 }
      out.write(v)
      out.toByteArray
    }
    val cp = Array[Byte](2) ++ lace(headers(0).length) ++
      lace(headers(1).length) ++ headers(0) ++ headers(1) ++ headers(2)
    val tracks = el(Tracks, el(TrackEntry,
      el(TrackNumber, uintBytes(1)),
      el(TrackType, uintBytes(2)),
      el(CodecId, "A_VORBIS".getBytes("US-ASCII")),
      el(CodecPrivateId, cp)))
    val clusters = packets.zipWithIndex.map { case (pkt, k) =>
      el(Cluster,
        el(ClusterTimestamp, uintBytes(k * 20L)),
        el(SimpleBlockId, blockBody(1, 0, 0x80, pkt)))
    }
    header ++ el(Segment, (Seq(info, tracks) ++ clusters): _*)
  }

  /** The laced twin of [[vorbisWebm]] (round 16, ADVICE item 3):
    * audio packets grouped three-per-SimpleBlock with Xiph (groups
    * alternating with EBML) lacing — the shape real Matroska muxers
    * emit for small Vorbis packets — and a dummy video track whose
    * blocks interleave BEFORE every audio block, so a budget counted
    * across all tracks (the old bug) would truncate the audio stream.
    */
  def vorbisWebmLaced(headers: Seq[Array[Byte]],
                      packets: Seq[Array[Byte]]): Array[Byte] = {
    require(headers.length == 3)
    def lace255(n: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var v = n
      while (v >= 255) { out.write(255); v -= 255 }
      out.write(v)
      out.toByteArray
    }
    val cp = Array[Byte](2) ++ lace255(headers(0).length) ++
      lace255(headers(1).length) ++ headers(0) ++ headers(1) ++ headers(2)
    val tracks = el(Tracks,
      el(TrackEntry,
        el(TrackNumber, uintBytes(1)),
        el(TrackType, uintBytes(2)),
        el(CodecId, "A_VORBIS".getBytes("US-ASCII")),
        el(CodecPrivateId, cp)),
      el(TrackEntry,
        el(TrackNumber, uintBytes(2)),
        el(TrackType, uintBytes(1)),
        el(CodecId, "V_VP9".getBytes("US-ASCII")),
        el(VideoEl, el(PixelWidth, uintBytes(64)),
          el(PixelHeight, uintBytes(64)))))
    // signed-delta VINT with an explicit 2-byte width (covers deltas
    // in [-8191, 8191] — Vorbis packet-size deltas at test scale)
    def ebmlDelta(d: Long): Array[Byte] = {
      val v = d + 8191 // bias = 2^(7*2-1) - 1
      Array(((v >> 8) | 0x40).toByte, (v & 0xFF).toByte)
    }
    val groups = packets.grouped(3).toSeq
    val clusters = groups.zipWithIndex.map { case (g, k) =>
      val body = new java.io.ByteArrayOutputStream()
      body.write(0x81) // track 1 (1-byte VINT)
      body.write(0); body.write(0) // relative timestamp
      val useEbml = k % 2 == 1 && g.length > 1
      body.write(0x80 | (if (useEbml) 0x06 else 0x02)) // key + lacing
      body.write(g.length - 1)
      if (useEbml) {
        // first size: unsigned VINT (2-byte form); rest: signed deltas
        val s0 = g(0).length
        body.write(((s0 >> 8) | 0x40)); body.write(s0 & 0xFF)
        var i = 1
        while (i < g.length - 1) {
          body.write(ebmlDelta(g(i).length.toLong - g(i - 1).length))
          i += 1
        }
      } else {
        var i = 0
        while (i < g.length - 1) { body.write(lace255(g(i).length)); i += 1 }
      }
      g.foreach(p => body.write(p))
      val video = Array.fill(9)((k % 251).toByte)
      el(Cluster,
        el(ClusterTimestamp, uintBytes(k * 20L)),
        el(SimpleBlockId, blockBody(2, 0, 0x80, video)),
        el(SimpleBlockId, body.toByteArray))
    }
    header ++ el(Segment, (Seq(info, tracks) ++ clusters): _*)
  }

  def vp8Webm(frames: Seq[(Long, Array[Byte])], w: Int, h: Int): Array[Byte] = {
    val tracks = el(Tracks, el(TrackEntry,
      el(TrackNumber, uintBytes(1)),
      el(TrackType, uintBytes(1)),
      el(CodecId, "V_VP8".getBytes("US-ASCII")),
      el(VideoEl, el(PixelWidth, uintBytes(w.toLong)),
        el(PixelHeight, uintBytes(h.toLong)))))
    val clusters = frames.map { case (tMs, frame) =>
      el(Cluster,
        el(ClusterTimestamp, uintBytes(tMs)),
        el(SimpleBlockId, blockBody(1, 0, 0x80, frame)))
    }
    header ++ el(Segment, (Seq(info, tracks) ++ clusters): _*)
  }
}
