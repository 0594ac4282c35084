package graft

import graft.ext.{Av1, Av1Fixtures}
import org.scalatest.funsuite.AnyFunSuite

/** AV1 sequence-header metadata: the bit-written OBU fixtures round-
  * trip through both carriages, every closed form recovered exactly;
  * malformed payloads null, never throw.
  */
class Av1Spec extends AnyFunSuite {

  test("both carriages round-trip every closed form (200 ids)") {
    for (id <- 0L until 200L) {
      val m = Av1.metaOrNull(Av1Fixtures.doc(id))
      assert(m != null, s"id=$id")
      assert(m(0) === Av1Fixtures.width(id).toDouble, s"id=$id width")
      assert(m(1) === Av1Fixtures.height(id).toDouble, s"id=$id height")
      assert(m(2) === Av1Fixtures.profile(id).toDouble, s"id=$id profile")
      assert(m(3) === Av1Fixtures.level(id).toDouble, s"id=$id level")
      assert(m(4) === Av1Fixtures.tier(id).toDouble, s"id=$id tier")
      assert(m(5) === Av1Fixtures.bitDepth(id).toDouble, s"id=$id depth")
      assert(m(6) === Av1Fixtures.mono(id).toDouble, s"id=$id mono")
    }
    // explicit routing: each walk rejects the other carriages
    assert(Av1.mp4MetaOrNull(Av1Fixtures.webm(3)) === null)
    assert(Av1.webmMetaOrNull(Av1Fixtures.mp4(2)) === null)
    assert(Av1.mp4MetaOrNull(Av1Fixtures.avif(4)) === null) // no av01 track
    // the AVIF still walk agrees with the track walks on every field
    for (id <- 0L until 30L)
      assert(Av1.avifMetaOrNull(Av1Fixtures.avif(id)).toSeq ===
        Av1.mp4MetaOrNull(Av1Fixtures.mp4(id)).toSeq, s"id=$id avif")
  }

  test("non-AV1 and malformed payloads null, never throw") {
    assert(Av1.metaOrNull(null) === null)
    assert(Av1.metaOrNull("junk".getBytes) === null)
    // an H.264 MP4 has no av01 entry
    assert(Av1.metaOrNull(graft.ext.VideoFixtures.pcmKeyframeMp4(
      (x, y) => (x + y) & 0xFF)) === null)
    // a VP8 WebM has no V_AV1 track
    val g = Array.fill(256)(128)
    assert(Av1.metaOrNull(graft.ext.WebmFixtures.vp8Webm(
      Seq((0L, graft.ext.Vp8Fixtures.encodeGrayFrame(g, 16, 16, 8)._1)),
      16, 16)) === null)
    // truncation + corruption fuzz over both carriages
    val rnd = new scala.util.Random(17)
    for (id <- Seq(0L, 1L, 2L, 6L, 7L, 8L)) {
      val good = Av1Fixtures.doc(id)
      for (cut <- Seq(4, 20, good.length / 2, good.length - 2))
        Av1.metaOrNull(java.util.Arrays.copyOf(good, cut))
      for (_ <- 0 until 200) {
        val m = good.clone()
        for (_ <- 0 to rnd.nextInt(4))
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        Av1.metaOrNull(m)
      }
    }
  }
}
