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
      val cues = graft.ext.Avc.mp4SubtitleCuesOrNull(mp4, 1 << 16)
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
        graft.ext.Avc.mp4SubtitleCuesOrNull(
          java.util.Arrays.copyOf(mp4, 1 + rnd.nextInt(mp4.length)), 100)
    }
    // a video-only MP4 has no wvtt track
    assert(graft.ext.Avc.mp4SubtitleCuesOrNull(
      graft.ext.VideoFixtures.bGop(1L), 100) === null)
  }

  test("BOM-leading WebVTT parses (the spec allows an optional U+FEFF)") {
    val cues = Subtitles.cuesOrNull("\uFEFF" + SubtitleFixtures.doc(1L))
    assert(cues != null && cues.length === SubtitleFixtures.nCues(1L))
  }

  test("TTML: clock + offset times, span/br/entity cleaning, rejection") {
    // fixture corpus round-trip (clock times on even cues, offset on odd)
    for (id <- Seq(0L, 1L, 2L, 3L, 7L, 499L)) {
      val n = SubtitleFixtures.nCues(id)
      val cues = Subtitles.cuesOrNull(SubtitleFixtures.ttmlDoc(id, 0 until n))
      assert(cues != null && cues.length === n, s"id=$id")
      cues.zipWithIndex.foreach { case (c, k) =>
        assert(c.startMs === SubtitleFixtures.startMs(id, k), s"id=$id k=$k")
        assert(c.endMs === SubtitleFixtures.endMs(id, k), s"id=$id k=$k")
        assert(c.text === SubtitleFixtures.expectedText(id, k), s"id=$id k=$k")
      }
    }
    // hand TTML: fractional seconds, seconds offset, nested spans
    val doc = """<?xml version="1.0"?><tt xmlns="http://www.w3.org/ns/ttml">
      |<body><div>
      |<p begin="00:01:02.5" end="90.25s">a <span><i>styled</i></span> cue</p>
      |<p begin="bad" end="1s">skipped</p>
      |<p begin="2s" end="1s">reversed skipped</p>
      |</div></body></tt>""".stripMargin
    val cues = Subtitles.ttmlCuesOrNull(doc)
    assert(cues != null && cues.length === 1)
    assert(cues(0).startMs === 62500L && cues(0).endMs === 90250L)
    assert(cues(0).text === "a styled cue")
    // cue-less TTML is an EMPTY array (valid doc), non-TTML XML nulls
    assert(Subtitles.ttmlCuesOrNull(
      "<tt xmlns=\"http://www.w3.org/ns/ttml\"><body/></tt>").isEmpty)
    assert(Subtitles.ttmlCuesOrNull("<html><p>prose</p></html>") === null)
    assert(Subtitles.cuesOrNull("<html><p>prose</p></html>") === null)
    // fuzz: random slices never throw
    val base = SubtitleFixtures.ttmlDoc(11L, 0 until 4)
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 300) {
      val a = rnd.nextInt(base.length)
      Subtitles.ttmlCuesOrNull(base.substring(a, a + rnd.nextInt(base.length - a)))
    }
  }

  test("standalone ASS/SSA: Dialogue lines, centisecond stamps, overrides, breaks") {
    val doc = """[Script Info]
      |Title: fixture
      |ScriptType: v4.00+
      |
      |[V4+ Styles]
      |Format: Name, Fontname
      |Style: Default,Arial
      |
      |[Events]
      |Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
      |Dialogue: 0,0:00:01.50,0:00:03.25,Default,,0,0,0,,{\an8}first {\i1}styled{\i0} cue
      |Dialogue: 0,0:01:00.00,0:01:02.00,Default,,0,0,0,,line one\Nline two, with comma
      |Dialogue: 0,0:00:09.00,bad,Default,,0,0,0,,skipped
      |Comment: 0,0:00:05.00,0:00:06.00,Default,,0,0,0,,not a dialogue
      |""".stripMargin
    val cues = Subtitles.cuesOrNull(doc)
    assert(cues != null && cues.length === 2)
    assert(cues(0).startMs === 1500L && cues(0).endMs === 3250L)
    assert(cues(0).text === "first styled cue")
    assert(cues(1).startMs === 60000L && cues(1).endMs === 62000L)
    assert(cues(1).text === "line one\nline two, with comma")
    // dialogue-less ASS is valid-but-empty; non-ASS bracketed text nulls
    assert(Subtitles.assCuesOrNull("[Script Info]\nTitle: x\n").isEmpty)
    assert(Subtitles.cuesOrNull("[just brackets]\nprose") === null)
    // fuzz: random slices never throw
    val rnd = new scala.util.Random(17)
    for (_ <- 0 until 300) {
      val a = rnd.nextInt(doc.length)
      Subtitles.cuesOrNull(doc.substring(a, a + rnd.nextInt(doc.length - a)))
    }
  }

  test("stpp carriage (14496-30): both layouts reproduce the standalone corpus") {
    for (id <- Seq(0L, 1L, 2L, 3L, 7L, 499L)) { // even = stbl per-cue, odd = fMP4 whole-doc
      val mp4 = SubtitleFixtures.stppMp4(id)
      val cues = graft.ext.Avc.mp4SubtitleCuesOrNull(mp4, 1 << 16)
      assert(cues != null, s"id=$id")
      assert(cues.length === SubtitleFixtures.nCues(id), s"id=$id")
      cues.zipWithIndex.foreach { case ((s0, e0, t), k) =>
        assert(s0 === SubtitleFixtures.startMs(id, k), s"id=$id k=$k")
        assert(e0 === SubtitleFixtures.endMs(id, k), s"id=$id k=$k")
        assert(t === SubtitleFixtures.expectedText(id, k), s"id=$id k=$k")
      }
      val rnd = new scala.util.Random(id)
      for (_ <- 0 until 50)
        graft.ext.Avc.mp4SubtitleCuesOrNull(
          java.util.Arrays.copyOf(mp4, 1 + rnd.nextInt(mp4.length)), 100)
    }
  }

  test("mdhd version 1 (64-bit times): timescale reads from offset 20") {
    // rewrite the wvtt fixture's mdhd v0 payload as v1 in place:
    // locate the box, re-encode version + widened times
    val mp4 = SubtitleFixtures.wvttMp4(2L)
    val idx = {
      var i = -1
      var p = 0
      while (i < 0 && p + 4 <= mp4.length) {
        if (mp4(p) == 'm' && mp4(p + 1) == 'd' && mp4(p + 2) == 'h' &&
          mp4(p + 3) == 'd') i = p
        p += 1
      }
      i
    }
    assert(idx > 0, "mdhd not found")
    // v0 payload: ver/flags(4) cre(4) mod(4) ts(4) dur(4) lang+pre(4) = 24
    // v1 payload: ver/flags(4) cre(8) mod(8) ts(4) dur(8) lang+pre(4) = 36
    val start = idx - 4 // box size field
    val oldSize = java.nio.ByteBuffer.wrap(mp4, start, 4).getInt
    assert(oldSize === 32, s"unexpected mdhd size $oldSize")
    val v1Payload = new Array[Byte](36)
    v1Payload(0) = 1 // version
    // timescale 1000 at offset 20
    v1Payload(20) = 0; v1Payload(21) = 0; v1Payload(22) = 3; v1Payload(23) = (-24).toByte
    val out = new java.io.ByteArrayOutputStream()
    out.write(mp4, 0, start)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(44).array())
    out.write("mdhd".getBytes("US-ASCII"))
    out.write(v1Payload)
    out.write(mp4, start + 32, mp4.length - start - 32)
    val grown = out.toByteArray
    // grow every ancestor box size (moov, trak, mdia) by 12
    def beI(b: Array[Byte], off: Int): Int =
      java.nio.ByteBuffer.wrap(b, off, 4).getInt
    def putI(b: Array[Byte], off: Int, v: Int): Unit =
      java.nio.ByteBuffer.wrap(b, off, 4).putInt(v)
    var fixed = grown
    for (tag <- Seq("moov", "trak", "mdia")) {
      var p = 0
      var found = false
      while (!found && p + 8 <= fixed.length) {
        if (new String(fixed, p + 4, 4, "US-ASCII") == tag) {
          putI(fixed, p, beI(fixed, p) + 12)
          found = true
        }
        p += 1
      }
      assert(found, s"$tag not found")
    }
    val cues = graft.ext.Avc.mp4SubtitleCuesOrNull(fixed, 1 << 16)
    assert(cues != null, "v1 mdhd must parse")
    assert(cues.length === SubtitleFixtures.nCues(2L))
    cues.zipWithIndex.foreach { case ((s0, e0, _), k) =>
      assert(s0 === SubtitleFixtures.startMs(2L, k), s"k=$k")
      assert(e0 === SubtitleFixtures.endMs(2L, k), s"k=$k")
    }
  }
}
