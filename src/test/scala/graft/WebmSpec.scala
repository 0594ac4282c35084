package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{SubtitleFixtures, Webm, WebmFixtures}

/** Round-13 WebM block + subtitle walk: the container stops being
  * metadata-only (VERDICT r12 item 4) — S_TEXT cue extraction (pure
  * text, no codec) and the SimpleBlock triage index.
  */
class WebmSpec extends AnyFunSuite {

  test("S_TEXT subtitle cues: all three codec ids, both cluster layouts") {
    // id%3: UTF8 vs WEBVTT storage vs ASS (Dialogue fields + override
    // stripping + \N breaks); (id/2)%2: per-cue clusters vs one
    // cluster with relative timestamps
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 499L)) {
      val webm = WebmFixtures.subtitleWebm(id)
      val cues = Webm.subtitleCuesOrNull(webm, 1 << 16)
      assert(cues != null, s"id=$id")
      assert(cues.length === SubtitleFixtures.nCues(id), s"id=$id")
      cues.zipWithIndex.foreach { case ((s0, e0, t), k) =>
        assert(s0 === SubtitleFixtures.startMs(id, k), s"id=$id k=$k")
        assert(e0 === SubtitleFixtures.endMs(id, k), s"id=$id k=$k")
        assert(t === SubtitleFixtures.expectedText(id, k), s"id=$id k=$k")
      }
      // truncation never throws
      val rnd = new scala.util.Random(id)
      for (_ <- 0 until 60)
        Webm.subtitleCuesOrNull(
          java.util.Arrays.copyOf(webm, 1 + rnd.nextInt(webm.length)), 100)
    }
    // metadata walk still reads the same files (video entry first)
    val meta = Webm.metaOrNull(WebmFixtures.subtitleWebm(3L))
    assert(meta != null && meta._1 === "webm" && meta._3 === "V_VP9")
    // a subtitle-less file nulls
    assert(Webm.subtitleCuesOrNull(WebmFixtures.blockWebm(1L), 100) === null)
    // non-EBML nulls
    assert(Webm.subtitleCuesOrNull("WEBVTT\n\n".getBytes("UTF-8"), 100) === null)
  }

  test("block index: cluster bases + relative timestamps, keyframe flags, sizes") {
    for (id <- Seq(0L, 1L, 2L, 3L, 4L, 499L)) {
      val webm = WebmFixtures.blockWebm(id)
      val blocks = Webm.blockIndexOrNull(webm, 1 << 10)
      val n = WebmFixtures.q168NBlocks(id)
      assert(blocks != null && blocks.length === n, s"id=$id")
      blocks.zipWithIndex.foreach { case (b, j) =>
        assert(b.track === 1L, s"id=$id j=$j")
        assert(b.tMs === 250L * j, s"id=$id j=$j")
        assert(b.keyframe === (j % 4 == 0), s"id=$id j=$j")
        assert(b.size === 10 + (id + j) % 17, s"id=$id j=$j")
      }
      val rnd = new scala.util.Random(id + 7)
      for (_ <- 0 until 60)
        Webm.blockIndexOrNull(
          java.util.Arrays.copyOf(webm, 1 + rnd.nextInt(webm.length)), 100)
    }
    // BlockGroup subtitle blocks index too (keyframe = true, track 2)
    val sub = Webm.blockIndexOrNull(WebmFixtures.subtitleWebm(2L), 1 << 10)
    assert(sub != null && sub.forall(b => b.track === 2L && b.keyframe))
    assert(Webm.blockIndexOrNull(Array[Byte](1, 2, 3), 100) === null)
  }
}
