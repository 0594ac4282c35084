package graft

import java.nio.file.{Files, Paths}

import graft.ext.{Vp8, Vp8Fixtures, Vp8Tables}
import org.scalatest.funsuite.AnyFunSuite

/** VP8 keyframe decoder — two independent validators (the VP8L
  * convention):
  *   1. GOLDEN fixtures from the system's own libwebp (lossy encode →
  *      its own WebPDecodeYUV planes, `scripts/make_vp8_golden.py`):
  *      per-pixel Y/U/V equality across qualities 10..90, odd dims,
  *      multi-segment content, the normal loop filter;
  *   2. the independent test-side ENCODER [[Vp8Fixtures]]: its bool
  *      coder round-trips against the decoder's, and its frames must
  *      decode to the exact recon plane the encoder computed.
  */
class Vp8Spec extends AnyFunSuite {

  private val goldenDir = Paths.get("data", "vp8_golden")

  test("libwebp goldens decode pixel-exactly (all twelve, Y+U+V)") {
    val index = new String(Files.readAllBytes(goldenDir.resolve("index.txt")), "UTF-8")
    var cases = 0
    for (line <- index.split("\n") if line.nonEmpty) {
      val Array(name, ws, hs, _) = line.split(",")
      val w = ws.toInt; val h = hs.toInt
      val webp = Files.readAllBytes(goldenDir.resolve(name + ".webp"))
      val yuv = Files.readAllBytes(goldenDir.resolve(name + ".yuv"))
      val p = Vp8.decodeWebpOrNull(webp)
      assert(p != null, name)
      assert(p.w === w && p.h === h, name)
      val uvW = (w + 1) / 2; val uvH = (h + 1) / 2
      assert(p.y.toSeq === yuv.slice(0, w * h).toSeq, s"$name Y")
      assert(p.u.toSeq === yuv.slice(w * h, w * h + uvW * uvH).toSeq, s"$name U")
      assert(p.v.toSeq === yuv.slice(w * h + uvW * uvH,
        w * h + 2 * uvW * uvH).toSeq, s"$name V")
      cases += 1
    }
    assert(cases === 12)
  }

  test("bool encoder/decoder round-trip: random prob+bit sequences") {
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 50) {
      val n = 1 + rnd.nextInt(4000)
      val probs = Array.fill(n)(1 + rnd.nextInt(255))
      val bits = Array.fill(n)(rnd.nextInt(2))
      val bw = new Vp8Fixtures.Bw
      var i = 0
      while (i < n) { bw.bool(probs(i), bits(i)); i += 1 }
      val enc = bw.bytes
      val br = new Vp8.Br(enc, 0, enc.length)
      i = 0
      while (i < n) {
        assert(br.bit(probs(i)) === bits(i), s"trial $trial bit $i")
        i += 1
      }
    }
  }

  test("encoder round-trip: decoder output IS the encoder's recon plane") {
    val rnd = new scala.util.Random(7)
    for ((w, h, qi) <- Seq((16, 16, 0), (48, 32, 8), (33, 17, 24),
                           (64, 64, 60), (131, 45, 96), (24, 120, 127))) {
      // mixed content: gradient + hard blocks + noise
      val gray = Array.tabulate(w * h) { p =>
        val x = p % w; val y = p / w
        if (y < h / 3) (x * 255 / math.max(1, w - 1))
        else if (y < 2 * h / 3) (((x / 7) + (y / 5)) % 2) * 255
        else rnd.nextInt(256)
      }
      val (frame, recon) = Vp8Fixtures.encodeGrayFrame(gray, w, h, qi)
      val p = Vp8.decodeFrameOrNull(frame)
      assert(p != null, s"$w x $h qi=$qi")
      assert(p.w === w && p.h === h)
      val got = p.y.map(_ & 0xFF)
      assert(got.toSeq === recon.toSeq, s"$w x $h qi=$qi luma")
      // chroma must come out constant 128 (the encoder writes none)
      assert(p.u.forall(b => (b & 0xFF) == 128), "U")
      assert(p.v.forall(b => (b & 0xFF) == 128), "V")
      // and the recon must actually resemble the source: quantization
      // error is bounded by the quantizer scale
      val q = Vp8Tables.AcQ(qi)
      val mad = gray.indices.map(i => math.abs(gray(i) - recon(i))).sum.toDouble / gray.length
      assert(mad <= q + 2.0, s"qi=$qi mad=$mad q=$q")
    }
  }

  test("header-path variants decode exactly: delta segmentation, multi-partition, simple filter, lf deltas") {
    // libwebp never emits these header shapes, so the goldens cannot
    // cover them — the encoder writes each (effective filter level
    // stays 0) and the decoder must still reproduce the exact recon
    val rnd = new scala.util.Random(41)
    val w = 80; val h = 48
    val gray = Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w
      (127 + 70 * math.sin(x / 3.0) + 40 * math.cos(y / 2.0)).toInt
        .max(0).min(255) + rnd.nextInt(3)
    }
    val variants = Seq(
      "parts=2" -> Vp8Fixtures.EncOpts(nParts = 2),
      "parts=8" -> Vp8Fixtures.EncOpts(nParts = 8),
      "segDelta" -> Vp8Fixtures.EncOpts(segDeltas = Array(0, 8, 16, 24)),
      "segDeltaNeg" -> Vp8Fixtures.EncOpts(segDeltas = Array(12, -4, 0, 30)),
      "simpleFilter" -> Vp8Fixtures.EncOpts(simpleFilterFlag = true),
      "lfDeltas" -> Vp8Fixtures.EncOpts(lfDeltaFlag = true),
      "all" -> Vp8Fixtures.EncOpts(nParts = 4,
        segDeltas = Array(4, 0, 20, 9), simpleFilterFlag = true,
        lfDeltaFlag = true))
    for ((label, opts) <- variants) {
      val (frame, recon) = Vp8Fixtures.encodeGrayFrame(gray, w, h, 12, opts)
      val p = Vp8.decodeFrameOrNull(frame)
      assert(p != null, label)
      assert(p.y.map(_ & 0xFF).toSeq === recon.toSeq, label)
    }
    // the variants must actually produce DIFFERENT bitstreams than
    // the plain form (i.e., the options were really written)
    val plain = Vp8Fixtures.encodeGrayFrame(gray, w, h, 12)._1
    for ((label, opts) <- variants)
      assert(!java.util.Arrays.equals(
        Vp8Fixtures.encodeGrayFrame(gray, w, h, 12, opts)._1, plain), label)
  }

  test("webp container wrap: RIFF route decodes like the raw frame") {
    val gray = Array.tabulate(40 * 24)(p => (p * 7) % 256)
    val webp = Vp8Fixtures.webpGray(gray, 40, 24, 12)
    val p = Vp8.decodeWebpOrNull(webp)
    assert(p != null && p.w === 40 && p.h === 24)
    val (frame, recon) = Vp8Fixtures.encodeGrayFrame(gray, 40, 24, 12)
    assert(p.y.map(_ & 0xFF).toSeq === recon.toSeq)
    val raw = Vp8.decodeFrameOrNull(frame)
    assert(raw.y.toSeq === p.y.toSeq)
  }

  test("malformed input nulls, never throws") {
    assert(Vp8.decodeFrameOrNull(null) === null)
    assert(Vp8.decodeFrameOrNull(Array[Byte](1, 2, 3)) === null)
    assert(Vp8.decodeWebpOrNull("RIFFjunk".getBytes) === null)
    // interframe tag bit set → null (keyframe-only scope)
    val (frame, _) = Vp8Fixtures.encodeGrayFrame(Array.fill(256)(128), 16, 16, 40)
    val inter = frame.clone(); inter(0) = (inter(0) | 1).toByte
    assert(Vp8.decodeFrameOrNull(inter) === null)
    // truncations + byte corruptions: decode or null, no throw
    val golden = Files.readAllBytes(goldenDir.resolve("mixed_160x120_q45.webp"))
    for (cut <- Seq(5, 21, golden.length / 2, golden.length - 3))
      Vp8.decodeWebpOrNull(java.util.Arrays.copyOf(golden, cut))
    val rnd = new scala.util.Random(9)
    for (_ <- 0 until 300) {
      val m = golden.clone()
      for (_ <- 0 to rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Vp8.decodeWebpOrNull(m)
    }
  }
}
