package graft

import graft.ext.{VorbisDecode, VorbisEncode}
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.VorbisEncode]] — the restricted encoder's streams
  * must decode through the COMPLETE independent [[VorbisDecode]]
  * signal path (container → Huffman → VQ → floor → IMDCT →
  * overlap-add) back to the input waveform within the quantizer's
  * SNR, and the integer round-trip accounting (residue sum, packet
  * count, flat-floor closed forms) must match bit-for-bit — the
  * q148 gate's local form. A wrong forward-MDCT phase/scale, window
  * mismatch, or bit-packing defect cannot pass: un-cancelled
  * time-domain aliasing destroys the SNR and any residue bit slip
  * breaks the integer sums.
  */
class VorbisEncodeSpec extends AnyFunSuite {

  private def sine(n: Int, rate: Int, f: Double, a: Double): Array[Double] =
    Array.tabulate(n)(i => a * math.sin(2 * math.Pi * f * i / rate))

  private def mix(xs: Array[Double]*): Array[Double] =
    Array.tabulate(xs.map(_.length).min)(i => xs.map(_(i)).sum)

  private def snrDb(ref: Array[Double], got: Array[Double], gain: Double): Double = {
    require(ref.length == got.length, s"${ref.length} vs ${got.length}")
    var se = 0.0; var ss = 0.0
    var i = 0
    while (i < ref.length) {
      val e = ref(i) - got(i) / gain
      se += e * e; ss += ref(i) * ref(i)
      i += 1
    }
    10.0 * math.log10(ss / math.max(se, 1e-300))
  }

  test("encode → full decode reconstructs the waveform (quantizer SNR)") {
    for ((rate, f1, f2, n) <- Seq((8000, 220.0, 451.0, 1600),
                                  (44100, 997.0, 2333.0, 2304),
                                  (16000, 333.0, 740.0, 2000))) {
      val x = mix(sine(n, rate, f1, 0.6), sine(n, rate, f2, 0.3))
      val e = VorbisEncode.encodeMono(x, rate)
      val st = new VorbisDecode.Stats
      val pcm = VorbisDecode.decodeOrNull(e.bytes, st)
      assert(pcm != null, s"rate $rate")
      assert(pcm.channels === 1 && pcm.sampleRate === rate)
      assert(pcm.nSamples === n, s"rate $rate samples")
      // measured ~23.7–30 dB across rates at gain 24 (leakage spreads
      // energy into small coefficients, each with ±0.5 LSB error); an
      // MDCT phase/window/packing defect leaves un-cancelled aliasing
      // and reads ~0–6 dB, so 20 dB separates the regimes cleanly
      val snr = snrDb(x, pcm.samples(0), 24.0)
      assert(snr > 20.0, s"rate $rate SNR $snr dB")
      // integer round-trip accounting — the q148 gate
      assert(st.audioPackets === e.nPackets)
      assert(st.residueSum === e.resSum, s"rate $rate residue sum")
      assert(st.postSum === e.nPackets.toLong * 510)
      assert(st.curveSum === e.nPackets.toLong * 32640)
      assert(st.pcmSamples === n.toLong)
    }
  }

  test("silence and DC edge inputs stay valid and bounded") {
    val z = VorbisEncode.encodeMono(new Array[Double](700), 8000)
    val pz = VorbisDecode.decodeOrNull(z.bytes)
    assert(pz != null && pz.nSamples === 700)
    assert(z.resSum === 0L) // all-zero spectrum quantizes to zero
    // saturating input clamps (lossy), still a valid stream
    val loud = VorbisEncode.encodeMono(Array.fill(900)(10.0), 8000)
    val pl = VorbisDecode.decodeOrNull(loud.bytes)
    assert(pl != null && pl.nSamples === 900)
  }

  test("the synth kernel's closed forms match its row output") {
    for (d <- 0L until 24L) {
      val r = graft.fn.VorbisEncodeSynth.row(d)
      val e = graft.ext.VorbisEncode.encodeMono(
        graft.fn.VorbisEncodeSynth.pcm(d), graft.fn.VorbisEncodeSynth.rate(d))
      assert(r.getLong(1) === graft.fn.VorbisEncodeSynth.rate(d).toLong)
      assert(r.getInt(2) === e.nPackets)
      assert(r.getLong(3) === e.resSum)
      assert(r.getInt(4) === graft.fn.VorbisEncodeSynth.nSamples(d))
      // and the bytes themselves decode with matching accounting
      val st = new VorbisDecode.Stats
      assert(VorbisDecode.decodeOrNull(r.getBinary(0), st) != null)
      assert(st.residueSum === e.resSum)
    }
  }
}
