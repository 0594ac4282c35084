package graft

import java.nio.file.{Files, Paths}

import graft.ext.Av1Decode
import org.scalatest.funsuite.AnyFunSuite

/** AV1 lossless-keyframe decoder — the two-validator convention:
  * the `data/av1_golden` corpus was produced by the system libaom
  * ENCODER and its YUV references by the independent libdav1d
  * DECODER (`scripts/make_av1_golden.py`), so a per-pixel match
  * means our decoder agrees with both implementations bit-for-bit.
  * The corpus spans flat / gradient / smooth / noise / edge content,
  * 64x64 and 128x64 (128-superblock chunked blocks), 96x96 and
  * 160x80 multi-superblock frames, odd crop sizes (52x36, 50x34 —
  * frame-edge partition bools), tiny 8x8 / 16x16 frames, and
  * 2x1 / 2x2 uniform tile grids (per-tile entropy contexts, the
  * tile_size framing, tile-bounded intra availability).
  */
class Av1DecodeSpec extends AnyFunSuite {

  private val goldenDir = Paths.get("data", "av1_golden")

  test("libaom/dav1d goldens decode pixel-exactly (all fourteen, Y+U+V)") {
    val index =
      new String(Files.readAllBytes(goldenDir.resolve("index.txt")), "UTF-8")
    var cases = 0
    for (line <- index.split("\n") if line.nonEmpty) {
      val Array(name, ws, hs) = line.split(",")
      val w = ws.toInt; val h = hs.toInt
      val obu = Files.readAllBytes(goldenDir.resolve(name + ".obu"))
      val yuv = Files.readAllBytes(goldenDir.resolve(name + ".yuv"))
      val f = Av1Decode.decodeOrNull(obu)
      assert(f != null, name)
      assert(f.w === w && f.h === h, name)
      val uvW = (w + 1) / 2; val uvH = (h + 1) / 2
      assert(f.y.toSeq === yuv.slice(0, w * h).toSeq, s"$name Y")
      assert(f.u.toSeq === yuv.slice(w * h, w * h + uvW * uvH).toSeq,
        s"$name U")
      assert(f.v.toSeq === yuv.slice(w * h + uvW * uvH,
        w * h + 2 * uvW * uvH).toSeq, s"$name V")
      cases += 1
    }
    assert(cases === 14)
  }

  test("test-side encoder round-trips arbitrary gray images losslessly") {
    // deterministic content exercising DC levels across the base /
    // br-chain / golomb regimes, both signs, multi-SB frames
    for ((w, h, seed) <- scala.Seq((8, 8, 1), (16, 16, 7), (48, 32, 3),
        (64, 64, 11), (72, 40, 29))) {
      val gray = Array.tabulate(w * h) { p =>
        val x = p % w; val y = p / w
        val v = 128 + (math.sin(x * 0.3 + seed) * 90 +
          math.cos(y * 0.41 - seed) * 70 +
          (((x * 31 + y * 17 + seed) % 13) - 6) * 9).toInt
        math.max(0, math.min(255, v))
      }
      val obu = graft.ext.Av1Enc.encodeGray(gray, w, h)
      val f = Av1Decode.decodeOrNull(obu)
      assert(f != null, s"${w}x$h")
      assert(f.w === w && f.h === h)
      assert(f.y.map(_ & 0xFF).toSeq === gray.toSeq, s"${w}x$h luma")
      assert(f.u.forall(b => (b & 0xFF) == 128), s"${w}x$h U flat")
      assert(f.v.forall(b => (b & 0xFF) == 128), s"${w}x$h V flat")
    }
  }

  test("AVIF wrap/extract round-trip feeds the image pipeline") {
    val gray = Array.tabulate(48 * 32)(p => (p * 7 + (p / 48) * 3) % 256)
    val obu = graft.ext.Av1Enc.encodeGray(gray, 48, 32)
    val avif = graft.ext.Av1Enc.avifWrap(obu, 48, 32)
    val plane = graft.ext.Images.grayPlaneOrNull(avif)
    assert(plane != null)
    val (g, w, h) = plane
    assert(w === 48 && h === 32)
    assert(g.map(_.toInt).toSeq === gray.toSeq)
    // and the metadata triage still reads the container
    val meta = graft.ext.Av1.avifMetaOrNull(avif)
    assert(meta != null)
  }

  test("AV1-in-WebM keyframes join the routed video near-dup index") {
    val gray = Array.tabulate(64 * 64) { p =>
      val x = p % 64; val y = p / 64
      math.max(0, math.min(255,
        (128 + 80 * math.sin(x * 0.21) + 60 * math.cos(y * 0.17)).toInt))
    }
    val obu = graft.ext.Av1Enc.encodeGray(gray, 64, 64)
    val (seq, frames) = graft.ext.Av1Enc.splitObus(obu)
    assert(seq.nonEmpty && frames.nonEmpty)
    val webm = graft.ext.WebmFixtures.av1VideoWebm(seq, scala.Seq(frames), 64, 64)
    val viaWebm = graft.ext.Webm.av1KeyframeDhashes(webm, 8)
    assert(viaWebm != null && viaWebm.length === 1)
    // the routed walk reaches the same hash
    val routed = graft.ext.Multimodal.keyframeDhashesRouted(webm, 8)
    assert(routed != null && routed.toSeq === viaWebm.toSeq)
    // cross-carriage: the AVIF still of the SAME content hashes equal
    val avif = graft.ext.Av1Enc.avifWrap(obu, 64, 64)
    val still = graft.ext.Images.grayPlaneOrNull(avif)
    val stillHash = graft.ext.Images.dhashOfThumb(
      graft.ext.Images.resizeGray(still._1, still._2, still._3, 9, 8))
    assert(stillHash === viaWebm(0), "AVIF still vs AV1-in-WebM keyframe hash")
  }

  test("malformed and unsupported inputs null, never throw") {
    assert(Av1Decode.decodeOrNull(Array[Byte]()) === null)
    assert(Av1Decode.decodeOrNull(Array[Byte](0x12, 0x00)) === null)
    assert(Av1Decode.decodeOrNull(Array.fill[Byte](64)(0x5a)) === null)
    val good = Files.readAllBytes(goldenDir.resolve("tiny8.obu"))
    // truncations must fail cleanly (decode may survive MSAC
    // trailing-zero semantics for tail cuts, but must never throw)
    for (cut <- 1 until good.length by 3)
      Av1Decode.decodeOrNull(good.take(cut))
    // header corruption
    val bad = good.clone(); bad(1) = (bad(1) ^ 0x40).toByte
    Av1Decode.decodeOrNull(bad)
    succeed
  }
}
