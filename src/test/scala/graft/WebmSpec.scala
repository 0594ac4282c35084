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

  test("blockPackets: Xiph / EBML / fixed lacing, malformed framing nulls (round 16)") {
    def sizesOf(body: Array[Byte]): Seq[Long] = {
      val r = Webm.blockPackets(body, 0, body.length)
      assert(r != null && r._1 === 1L)
      // ranges must tile the payload contiguously
      r._2.sliding(2).foreach {
        case Array(a, b) => assert(a._2 === b._1)
        case _ =>
      }
      assert(r._2.last._2 === body.length.toLong)
      r._2.toSeq.map(p => p._2 - p._1)
    }
    def hdr(flags: Int): Array[Byte] =
      Array[Byte](0x81.toByte, 0, 0, flags.toByte)
    // no lacing: one packet = whole payload
    assert(sizesOf(hdr(0x80) ++ Array.fill(7)(1.toByte)) === Seq(7L))
    // Xiph: sizes 2, 300 (255-run), last = remainder 4
    val xiph = hdr(0x82) ++ Array[Byte](2, 2, 255.toByte, 45) ++
      Array.fill(2 + 300 + 4)(9.toByte)
    assert(sizesOf(xiph) === Seq(2L, 300L, 4L))
    // EBML: first 300 as a 2-byte VINT, then delta -100 (biased 8091)
    val ebml = hdr(0x86) ++ Array[Byte](2, 0x41, 0x2C, 0x5F, 0x9B.toByte) ++
      Array.fill(300 + 200 + 7)(9.toByte)
    assert(sizesOf(ebml) === Seq(300L, 200L, 7L))
    // fixed-size: 4 frames over a 20-byte payload
    val fixed = hdr(0x84) ++ Array[Byte](3) ++ Array.fill(20)(9.toByte)
    assert(sizesOf(fixed) === Seq(5L, 5L, 5L, 5L))
    // malformed: fixed payload not divisible by the frame count
    assert(Webm.blockPackets(hdr(0x84) ++ Array[Byte](3) ++
      Array.fill(21)(9.toByte), 0, 4 + 1 + 21) === null)
    // malformed: Xiph size table overruns the block
    assert(Webm.blockPackets(hdr(0x82) ++ Array[Byte](2, 255.toByte),
      0, 4 + 2) === null)
    // malformed: declared sizes exceed the payload
    assert(Webm.blockPackets(hdr(0x82) ++ Array[Byte](2, 50, 50) ++
      Array.fill(10)(9.toByte), 0, 4 + 3 + 10) === null)
  }
}
