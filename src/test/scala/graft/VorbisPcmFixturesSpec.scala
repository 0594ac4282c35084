package graft

import graft.ext.{VorbisDecode, VorbisPcmFixtures => F}
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.VorbisPcmFixtures]] × [[graft.ext.VorbisDecode]] —
  * the q141 corpus decodes end-to-end and every integer stage matches
  * the closed forms the DuckDB oracle replays (the forms re-derived
  * here independently of both the packer and the SQL).
  */
class VorbisPcmFixturesSpec extends AnyFunSuite {

  private def expectedStats(d: Long): (Long, Long, Long, Long) = {
    val a = F.nAudio(d)
    val c = F.channels(d)
    val rng = F.range(d)
    val mult = F.multiplier(d)
    val adx = 1 << F.rangebits(d)
    val postSum = (for (p <- 0 until a; ch <- 0 until c) yield
      ((11 * d + 7 * p + 3 * ch) % rng) + ((5 * d + 13 * p + 2 * ch + 17) % rng)).sum
    val nVecs = if (d % 3 == 2) 1 else c
    var resSum = 0L
    for (p <- 0 until a; j <- 0 until nVecs; t <- 0 until 2; k <- 0 until 4) {
      val e0 = (d + 2 * p + 3 * j + 5 * t + k) % 4
      resSum += 5 + 4 * (e0 % 2)
      if (d % 2 == 1 && (d + p + j + t) % 2 == 1) {
        val e1 = (d + 2 * p + 3 * j + 5 * t + 7 + k) % 4
        resSum += 9 - 4 * (e1 % 2)
      }
    }
    var curveSum = 0L
    for (p <- 0 until a; ch <- 0 until c) {
      val n2 = F.blockSize(d, p) / 2
      val y0m = ((11 * d + 7 * p + 3 * ch) % rng).toInt * mult
      val y1m = ((5 * d + 13 * p + 2 * ch + 17) % rng).toInt * mult
      val ady = math.abs(y1m - y0m)
      for (x <- 0 until n2) {
        curveSum +=
          (if (x >= adx) y1m
           else if (y1m < y0m) y0m - (ady * x) / adx
           else y0m + (ady * x) / adx)
      }
    }
    val pcm = (1 until a)
      .map(p => (F.blockSize(d, p - 1) + F.blockSize(d, p)) / 4L).sum
    (postSum, resSum, curveSum, pcm)
  }

  test("every docId decodes; integer stages match the oracle's closed forms") {
    for (d <- 0L until 400L) {
      val st = new VorbisDecode.Stats
      val pcm = VorbisDecode.decodeOrNull(F.stream(d), st)
      assert(pcm != null, s"doc $d failed to decode")
      assert(pcm.channels === F.channels(d), s"doc $d")
      assert(pcm.sampleRate.toLong === F.rate(d), s"doc $d")
      assert(st.audioPackets === F.nAudio(d), s"doc $d")
      val (ps, rs, cs, n) = expectedStats(d)
      assert(st.postSum === ps, s"doc $d post_sum")
      assert(st.residueSum === rs, s"doc $d res_sum")
      assert(st.curveSum === cs, s"doc $d curve_sum")
      assert(st.pcmSamples === n, s"doc $d pcm_samples")
      assert(pcm.nSamples.toLong === n, s"doc $d samples")
    }
  }

  test("decoded PCM is bounded and non-degenerate") {
    var nonZeroDocs = 0
    for (d <- 0L until 50L) {
      val pcm = VorbisDecode.decodeOrNull(F.stream(d))
      val mono = pcm.mono
      // residue ≤ ~31, floor ≤ 1, IMDCT sums n/2 cosines — loose bound
      assert(mono.forall(v => math.abs(v) < 4096.0), s"doc $d unbounded")
      if (mono.exists(_ != 0.0)) nonZeroDocs += 1
    }
    assert(nonZeroDocs === 50)
  }

  test("Audio.monoOrNull routes OggS to the Vorbis signal path") {
    val bytes = F.stream(7L)
    val direct = VorbisDecode.decodeOrNull(bytes)
    val routed = graft.ext.Audio.monoOrNull(bytes)
    assert(routed != null)
    assert(routed._2 === direct.sampleRate)
    assert(routed._1.toSeq === direct.mono.toSeq)
    assert(graft.ext.Audio.monoOrNull("OggS but not a stream".getBytes) == null)
  }

  test("fingerprints separate across docs, stable within a doc") {
    val fp = (0L until 30L).map(d =>
      graft.ext.Audio.fingerprintOfMono(
        VorbisDecode.decodeOrNull(F.stream(d)).mono))
    assert(fp.forall(_ != null))
    assert(fp.distinct.size > 15, "fingerprints collapsed")
  }
}
