package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{SubtitleFixtures, Subtitles}

class SubtitlesSpec extends AnyFunSuite {

  test("fixture corpus: both formats parse to the documented closed forms") {
    for (id <- Seq(0L, 1L, 2L, 3L, 5L, 7L, 499L, 3999L)) {
      val cues = Subtitles.cuesOrNull(SubtitleFixtures.doc(id))
      assert(cues != null, s"id=$id")
      assert(cues.length === SubtitleFixtures.nCues(id), s"id=$id")
      cues.zipWithIndex.foreach { case (c, k) =>
        assert(c.startMs === SubtitleFixtures.startMs(id, k), s"id=$id k=$k")
        assert(c.endMs === SubtitleFixtures.endMs(id, k), s"id=$id k=$k")
        assert(c.text === SubtitleFixtures.expectedText(id, k), s"id=$id k=$k")
      }
    }
  }

  test("WebVTT corners: CRLF, hour-less stamps, settings, NOTE/STYLE, entities") {
    val doc = "WEBVTT\r\n\r\nSTYLE\r\n::cue { color: red }\r\n\r\n" +
      "intro\r\n01:02.500 --> 01:04.000 line:0 align:center\r\n" +
      "<i>he said</i> &quot;hi&quot; &amp;lt;\r\n\r\n" +
      "NOTE trailing comment"
    val cues = Subtitles.cuesOrNull(doc)
    assert(cues != null && cues.length === 1)
    assert(cues(0).startMs === 62500L && cues(0).endMs === 64000L)
    // amp decodes LAST: &amp;lt; is the literal "&lt;"
    assert(cues(0).text === "he said \"hi\" &lt;")
  }

  test("SRT corners: comma stamps, multi-digit index, blank-line runs") {
    val doc = "\n\n12\n01:00:00,001 --> 01:00:01,999\nfirst\n\n13\n" +
      "01:00:02,000 --> 01:00:03,000\nsecond line a\nsecond line b\n"
    val cues = Subtitles.cuesOrNull(doc)
    assert(cues != null && cues.length === 2)
    assert(cues(0).startMs === 3600001L && cues(0).endMs === 3601999L)
    assert(cues(1).text === "second line a\nsecond line b")
  }

  test("tolerance and rejection: malformed cues skip, non-subtitles null") {
    // bad stamp, end < start, empty body: each cue skipped, the good one kept
    val doc = "WEBVTT\n\n00:xx.000 --> 00:05.000\nbad\n\n" +
      "00:10.000 --> 00:05.000\nreversed\n\n" +
      "00:20.000 --> 00:21.000\n\n" +
      "00:30.000 --> 00:31.000\ngood\n"
    val cues = Subtitles.cuesOrNull(doc)
    assert(cues != null && cues.length === 1 && cues(0).text === "good")
    assert(Subtitles.cuesOrNull("just some prose\nwith lines") === null)
    assert(Subtitles.cuesOrNull("") === null)
    assert(Subtitles.cuesOrNull("42\nnot a timing line\nx") === null)
    // fuzz: random slices of a valid doc never throw
    val base = SubtitleFixtures.doc(11L)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 300) {
      val a = rnd.nextInt(base.length)
      val b = a + rnd.nextInt(base.length - a)
      Subtitles.cuesOrNull(base.substring(a, b))
    }
  }

  test("wvtt carriage (14496-30): both container layouts reproduce the standalone corpus") {
    for (id <- Seq(0L, 1L, 2L, 3L, 7L, 499L)) { // even = stbl, odd = fragmented
      val mp4 = SubtitleFixtures.wvttMp4(id)
      val cues = graft.ext.Avc.wvttCuesOrNull(mp4, 1 << 16)
      assert(cues != null, s"id=$id")
      assert(cues.length === SubtitleFixtures.nCues(id), s"id=$id")
      cues.zipWithIndex.foreach { case ((s0, e0, t), k) =>
        assert(s0 === SubtitleFixtures.startMs(id, k), s"id=$id k=$k")
        assert(e0 === SubtitleFixtures.endMs(id, k), s"id=$id k=$k")
        assert(t === SubtitleFixtures.expectedText(id, k), s"id=$id k=$k")
      }
      // truncation never throws
      val rnd = new scala.util.Random(id)
      for (_ <- 0 until 50)
        graft.ext.Avc.wvttCuesOrNull(
          java.util.Arrays.copyOf(mp4, 1 + rnd.nextInt(mp4.length)), 100)
    }
    // a video-only MP4 has no wvtt track
    assert(graft.ext.Avc.wvttCuesOrNull(
      graft.ext.VideoFixtures.bGop(1L), 100) === null)
  }
}
