package graft.ext

/** Deterministic manifest corpus for q173/q174 (the q135 sitemap
  * discipline): every attribute of every playlist entry /
  * representation is a closed form of doc_id the oracle SQL
  * reconstructs with string arithmetic.
  *
  * m3u8: even ids are MASTER playlists (2 + id%3 variants; bandwidth,
  * resolution and the quoted comma-carrying CODECS all arithmetic);
  * odd ids are MEDIA playlists (3 + id%4 segments, durations
  * 4 + (id+k)%3 seconds, `#EXT-X-MEDIA-SEQUENCE` origin id%50).
  * mpd: one Period, a video AdaptationSet (2 + id%2 representations,
  * rep 1 OVERRIDING the set-level codecs — the inheritance rule under
  * test) and an audio AdaptationSet (one representation, no
  * dimensions), SegmentTemplate media at both levels.
  */
object ManifestFixtures {

  def codecOf(v: Int): String = (v % 3) match {
    case 0 => "avc1.64001f,mp4a.40.2"
    case 1 => "hvc1.1.6.L93.B0,mp4a.40.2"
    case _ => "av01.0.05M.08,opus"
  }

  def m3u8(id: Long): String = {
    val sb = new StringBuilder("#EXTM3U\n")
    if (id % 2 == 0) {
      val nv = 2 + (id % 3).toInt
      var v = 0
      while (v < nv) {
        val bw = 200000 + 150000 * v + 1000 * (id % 7)
        val w = 640 + 320 * v
        val h = 360 + 180 * v
        sb.append(s"#EXT-X-STREAM-INF:BANDWIDTH=$bw,RESOLUTION=${w}x$h,")
          .append("CODECS=\"").append(codecOf(v)).append("\"\n")
          .append(s"v$v/prog_$id.m3u8\n")
        v += 1
      }
    } else {
      sb.append("#EXT-X-VERSION:3\n#EXT-X-TARGETDURATION:6\n")
        .append(s"#EXT-X-MEDIA-SEQUENCE:${id % 50}\n")
      val ns = 3 + (id % 4).toInt
      var k = 0
      while (k < ns) {
        sb.append(s"#EXTINF:${4 + (id + k) % 3}.0,\n")
          .append(s"seg_${id}_$k.ts\n")
        k += 1
      }
      sb.append("#EXT-X-ENDLIST\n")
    }
    sb.toString
  }

  def mpd(id: Long): String = {
    val nr = 2 + (id % 2).toInt
    val reps = (0 until nr).map { r =>
      val bw = 300000 + 200000 * r + 1000 * (id % 9)
      val over = if (r == 1) " codecs=\"avc1.640028\"" else ""
      s"""      <Representation id="v$r" bandwidth="$bw" width="${640 + 320 * r}" height="${360 + 180 * r}"$over/>"""
    }.mkString("\n")
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<MPD xmlns="urn:mpeg:dash:schema:mpd:2011" type="static">
       |  <Period>
       |    <AdaptationSet mimeType="video/mp4" codecs="avc1.4d401f">
       |      <SegmentTemplate media="video_$$RepresentationID$$_$$Number$$.m4s" initialization="init_$$RepresentationID$$.m4s"/>
       |$reps
       |    </AdaptationSet>
       |    <AdaptationSet mimeType="audio/mp4" codecs="mp4a.40.2">
       |      <SegmentTemplate media="audio_$$Number$$.m4s"/>
       |      <Representation id="a0" bandwidth="${96000 + 100 * (id % 5)}"/>
       |    </AdaptationSet>
       |  </Period>
       |</MPD>
       |""".stripMargin
  }
}
