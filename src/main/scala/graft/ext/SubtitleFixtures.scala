package graft.ext

/** Deterministic subtitle corpus for q160 (the PdfFixtures pattern):
  * id arithmetic decides the FORMAT (every third doc SRT, the rest
  * WebVTT with a NOTE block, optional cue ids, and settings) and
  * every cue's timing/text; the oracle SQL replays the same
  * arithmetic without parsing anything.
  */
object SubtitleFixtures {

  def nCues(id: Long): Int = (2 + id % 4).toInt

  def startMs(id: Long, k: Int): Long = id % 500 + 2000L * k
  def endMs(id: Long, k: Int): Long = startMs(id, k) + 1500

  private def fmt(ms: Long, comma: Boolean): String = {
    val h = ms / 3600000
    val m = (ms / 60000) % 60
    val s = (ms / 1000) % 60
    val f = ms % 1000
    f"$h%02d:$m%02d:$s%02d${if (comma) "," else "."}$f%03d"
  }

  /** Raw (pre-strip) cue payload — tags on odd cues, the 6-entity
    * form on multiples of 3, a two-line body on cue 2, plain
    * otherwise. Precedence: odd > two-line > entity > plain.
    */
  def rawText(id: Long, k: Int): String = {
    val w = (id + k) % 7
    if (k % 2 == 1) s"<v Speaker>cue $k says word$w</v>"
    else if (k == 2) s"cue $k says word$w\nline two"
    else if (k % 3 == 0) s"cue $k says word$w &amp; more"
    else s"cue $k says word$w"
  }

  /** What [[Subtitles.cuesOrNull]] must extract. */
  def expectedText(id: Long, k: Int): String = {
    val w = (id + k) % 7
    if (k % 2 == 1) s"cue $k says word$w"
    else if (k == 2) s"cue $k says word$w\nline two"
    else if (k % 3 == 0) s"cue $k says word$w & more"
    else s"cue $k says word$w"
  }

  def doc(id: Long): String = {
    val n = nCues(id)
    val sb = new StringBuilder
    if (id % 3 == 0) {
      var k = 0
      while (k < n) {
        sb.append(k + 1).append('\n')
        sb.append(fmt(startMs(id, k), comma = true)).append(" --> ")
          .append(fmt(endMs(id, k), comma = true)).append('\n')
        sb.append(rawText(id, k)).append("\n\n")
        k += 1
      }
    } else {
      sb.append("WEBVTT synthetic\n\n")
      sb.append("NOTE corpus fixture\nsecond comment line\n\n")
      var k = 0
      while (k < n) {
        if (k % 2 == 0) sb.append("c").append(k).append('\n') // cue id line
        sb.append(fmt(startMs(id, k), comma = false)).append(" --> ")
          .append(fmt(endMs(id, k), comma = false))
        if (k % 2 == 1) sb.append(" align:start position:10%")
        sb.append('\n')
        sb.append(rawText(id, k)).append("\n\n")
        k += 1
      }
    }
    sb.toString
  }

  // ------------------- wvtt carriage (ISO 14496-30) fixtures

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(tag: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(body.length + 8L) ++ tag.getBytes("US-ASCII") ++ body
  }

  /** The doc's cues as a 14496-30 sample sequence: vtte gap samples
    * between vttc cue samples, durations reproducing exactly the
    * standalone corpus's timeline (timescale 1000 → 1 unit = 1 ms).
    */
  private def wvttSamples(id: Long): Seq[(Array[Byte], Long)] = {
    val n = nCues(id)
    val out = scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)]()
    var t = 0L
    var k = 0
    while (k < n) {
      val s0 = startMs(id, k)
      if (s0 > t) { out += ((box("vtte"), s0 - t)); t = s0 }
      out += ((box("vttc",
        box("payl", rawText(id, k).getBytes("UTF-8"))), 1500L))
      t += 1500
      k += 1
    }
    out.toSeq
  }

  /** wvtt subtitle TRACK inside an MP4 — classic stbl layout on even
    * halves of the corpus, FRAGMENTED (moof/traf/trun) on odd (the
    * CMAF caption-segment shape). Cue payloads and the sample
    * timeline reproduce [[doc]]'s corpus exactly, so the q161 oracle
    * IS q160's arithmetic.
    */
  def wvttMp4(id: Long): Array[Byte] = {
    val samples = wvttSamples(id)
    val entries = samples.map(_._1)
    val durs = samples.map(_._2)
    val stsd = box("stsd", be32(0), be32(1),
      box("wvtt", new Array[Byte](8), box("vttC", "WEBVTT".getBytes("UTF-8"))))
    val tkhd = box("tkhd", {
      val p = new Array[Byte](84)
      System.arraycopy(be32(1), 0, p, 12, 4) // track_ID = 1
      p
    })
    def mdiaOf(stbl: Array[Byte]) =
      box("mdia", box("mdhd", be32(0), be32(0), be32(0), be32(1000),
        be32(0), be32(0x55c40000L)), box("minf", stbl))
    val ftyp = box("ftyp", "isom".getBytes, be32(0x200), "iso6cmfc".getBytes)
    if (id % 2 == 0) {
      // classic layout: one chunk, per-sample stsz, run-compressed stts
      val mdatOff = ftyp.length + 8L
      val stsz = box("stsz", be32(0), be32(0), be32(entries.length.toLong),
        entries.flatMap(e => be32(e.length.toLong)).toArray)
      val stsc = box("stsc", be32(0), be32(1), be32(1),
        be32(entries.length.toLong), be32(1))
      val stco = box("stco", be32(0), be32(1), be32(mdatOff))
      val stts = box("stts", be32(0), be32(durs.length.toLong),
        durs.flatMap(d => be32(1) ++ be32(d)).toArray)
      val stbl = box("stbl", stsd, stsz, stsc, stco, stts)
      val moov = box("moov", box("mvhd", new Array[Byte](100)),
        box("trak", tkhd, mdiaOf(stbl)))
      ftyp ++ box("mdat", entries.flatten.toArray) ++ moov
    } else {
      // fragmented: zero-sample stbl, one moof+mdat per sample
      val stbl = box("stbl", stsd,
        box("stts", be32(0), be32(0)),
        box("stsc", be32(0), be32(0)),
        box("stsz", be32(0), be32(0), be32(0)),
        box("stco", be32(0), be32(0)))
      val trex = box("trex", be32(0), be32(1), be32(1),
        be32(0), be32(0), be32(0))
      val moov = box("moov", box("mvhd", new Array[Byte](100)),
        box("trak", tkhd, mdiaOf(stbl)), box("mvex", trex))
      var out = ftyp ++ moov
      samples.zipWithIndex.foreach { case ((sm, dur), gi) =>
        val tfhd = box("tfhd", be32(0x20000L), be32(1)) // default-base-is-moof
        val trunBody = be32(0x100L | 0x200L | 0x1L) ++ be32(1) ++
          be32(0 /* patched */) ++ be32(dur) ++ be32(sm.length.toLong)
        def moofOf(dataOff: Long) = box("moof",
          box("mfhd", be32(0), be32(gi + 1L)),
          box("traf", tfhd, box("trun",
            trunBody.patch(8, be32(dataOff), 4))))
        val probe = moofOf(0)
        out = out ++ moofOf(probe.length + 8L) ++ box("mdat", sm)
      }
      out
    }
  }

  // --------------- TTML / stpp carriage (ISO 14496-30) fixtures

  /** TTML time expression by cue parity — clock-time on even cues,
    * offset-time on odd — so one corpus exercises both forms.
    */
  private def ttmlTime(ms: Long, offset: Boolean): String =
    if (offset) s"${ms}ms"
    else f"${ms / 3600000}%02d:${(ms / 60000) % 60}%02d:${(ms / 1000) % 60}%02d.${ms % 1000}%03d"

  /** Raw TTML cue markup whose CLEANED text equals [[expectedText]]
    * (the q160 arithmetic): styled spans on odd cues, `<br/>` for the
    * two-line cue, the entity form on multiples of 3.
    */
  private def ttmlRawText(id: Long, k: Int): String = {
    val w = (id + k) % 7
    if (k % 2 == 1) s"""<span style="s1">cue $k says word$w</span>"""
    else if (k == 2) s"cue $k says word$w<br/>line two"
    else if (k % 3 == 0) s"cue $k says word$w &amp; more"
    else s"cue $k says word$w"
  }

  /** TTML/IMSC1 document carrying the given cues of the q160 corpus
    * — the `stpp` sample payload (and the standalone .ttml shape).
    */
  def ttmlDoc(id: Long, ks: Seq[Int]): String = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<tt xmlns=\"http://www.w3.org/ns/ttml\" xml:lang=\"en\">\n")
    sb.append("  <body><div>\n")
    ks.foreach { k =>
      sb.append("    <p begin=\"").append(ttmlTime(startMs(id, k), k % 2 == 1))
        .append("\" end=\"").append(ttmlTime(endMs(id, k), k % 2 == 1))
        .append("\">").append(ttmlRawText(id, k)).append("</p>\n")
    }
    sb.append("  </div></body>\n</tt>\n")
    sb.toString
  }

  /** TTML subtitle track inside an MP4 — the `stpp` carriage (ISO
    * 14496-30 §6, the DASH/CMAF broadcast shape). Classic stbl layout
    * on even ids with ONE SAMPLE PER CUE (each a complete TTML doc —
    * the live-DASH ISD shape); FRAGMENTED on odd ids with one
    * whole-document sample (the on-demand shape). Cue timing comes
    * from the documents' begin/end attributes, so the q165 oracle IS
    * q160's arithmetic.
    */
  def stppMp4(id: Long): Array[Byte] = {
    val n = nCues(id)
    val samples: Seq[Array[Byte]] =
      if (id % 2 == 0) (0 until n).map(k => ttmlDoc(id, Seq(k)).getBytes("UTF-8"))
      else Seq(ttmlDoc(id, 0 until n).getBytes("UTF-8"))
    val durs = samples.map(_ => 2000L) // sample spans; timing is in-doc
    // XMLSubtitleSampleEntry: 6 reserved + 2 data_reference_index,
    // then namespace / schema_location / auxiliary mime z-strings
    val stsd = box("stsd", be32(0), be32(1),
      box("stpp", new Array[Byte](8),
        "http://www.w3.org/ns/ttml".getBytes("US-ASCII"), Array[Byte](0),
        Array[Byte](0), Array[Byte](0)))
    val tkhd = box("tkhd", {
      val p = new Array[Byte](84)
      System.arraycopy(be32(1), 0, p, 12, 4) // track_ID = 1
      p
    })
    def mdiaOf(stbl: Array[Byte]) =
      box("mdia", box("mdhd", be32(0), be32(0), be32(0), be32(1000),
        be32(0), be32(0x55c40000L)), box("minf", stbl))
    val ftyp = box("ftyp", "isom".getBytes, be32(0x200), "iso6cmfc".getBytes)
    if (id % 2 == 0) {
      val mdatOff = ftyp.length + 8L
      val stsz = box("stsz", be32(0), be32(0), be32(samples.length.toLong),
        samples.flatMap(e => be32(e.length.toLong)).toArray)
      val stsc = box("stsc", be32(0), be32(1), be32(1),
        be32(samples.length.toLong), be32(1))
      val stco = box("stco", be32(0), be32(1), be32(mdatOff))
      val stts = box("stts", be32(0), be32(durs.length.toLong),
        durs.flatMap(d => be32(1) ++ be32(d)).toArray)
      val stbl = box("stbl", stsd, stsz, stsc, stco, stts)
      val moov = box("moov", box("mvhd", new Array[Byte](100)),
        box("trak", tkhd, mdiaOf(stbl)))
      ftyp ++ box("mdat", samples.flatten.toArray) ++ moov
    } else {
      val stbl = box("stbl", stsd,
        box("stts", be32(0), be32(0)),
        box("stsc", be32(0), be32(0)),
        box("stsz", be32(0), be32(0), be32(0)),
        box("stco", be32(0), be32(0)))
      val trex = box("trex", be32(0), be32(1), be32(1),
        be32(0), be32(0), be32(0))
      val moov = box("moov", box("mvhd", new Array[Byte](100)),
        box("trak", tkhd, mdiaOf(stbl)), box("mvex", trex))
      var out = ftyp ++ moov
      samples.zipWithIndex.foreach { case (sm, gi) =>
        val tfhd = box("tfhd", be32(0x20000L), be32(1)) // default-base-is-moof
        val trunBody = be32(0x100L | 0x200L | 0x1L) ++ be32(1) ++
          be32(0 /* patched */) ++ be32(durs(gi)) ++ be32(sm.length.toLong)
        def moofOf(dataOff: Long) = box("moof",
          box("mfhd", be32(0), be32(gi + 1L)),
          box("traf", tfhd, box("trun",
            trunBody.patch(8, be32(dataOff), 4))))
        val probe = moofOf(0)
        out = out ++ moofOf(probe.length + 8L) ++ box("mdat", sm)
      }
      out
    }
  }

  // --------------- legacy-encoding subtitle corpus (q162)

  /** WHATWG charset label by id — the legacy encodings real subtitle
    * files arrive in.
    */
  def encLabel(id: Long): String = (id % 3) match {
    case 0 => "utf-8"
    case 1 => "shift_jis"
    case _ => "windows-1252"
  }

  /** The charset-discriminating token each cue carries (must round-
    * trip its encoding: JIS X 0208 kanji for shift_jis, Latin-1
    * accents for 1252, multi-byte UTF-8 otherwise).
    */
  def i18nWord(id: Long): String = (id % 3) match {
    case 0 => "mañana"
    case 1 => "字幕" // 字幕
    case _ => "café"
  }

  /** Expected cue text of the i18n corpus. */
  def i18nText(id: Long, k: Int): String =
    s"cue $k ${i18nWord(id)} ${(id + k) % 7}"

  /** WebVTT document whose cue texts carry [[i18nWord]], ENCODED in
    * [[encLabel]]'s charset — the bytes a crawler actually fetches.
    */
  def encodedDoc(id: Long): Array[Byte] = {
    val n = nCues(id)
    val sb = new StringBuilder("WEBVTT\n\n")
    var k = 0
    while (k < n) {
      val s0 = startMs(id, k)
      val e0 = endMs(id, k)
      def f(ms: Long) =
        f"${ms / 3600000}%02d:${(ms / 60000) % 60}%02d:${(ms / 1000) % 60}%02d.${ms % 1000}%03d"
      sb.append(f(s0)).append(" --> ").append(f(e0)).append('\n')
      sb.append(i18nText(id, k)).append("\n\n")
      k += 1
    }
    sb.toString.getBytes(java.nio.charset.Charset.forName(encLabel(id)))
  }
}
