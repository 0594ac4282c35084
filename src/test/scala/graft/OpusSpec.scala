package graft

import graft.ext.{Opus, OpusFixtures}
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Opus]] — RFC 6716 §3 packet structure. Hand-built
  * packets transcribe the RFC's own rules (the independent anchor;
  * there is no JDK Opus to cross-check), the fixture corpus is
  * round-tripped against the closed forms the q147 oracle replays,
  * and the structural [R]-rules are exercised with violating inputs.
  */
class OpusSpec extends AnyFunSuite {

  test("frame-duration table anchors (§3.1)") {
    assert(Opus.FrameSamples(0) === 480)   // SILK NB 10 ms
    assert(Opus.FrameSamples(3) === 2880)  // SILK NB 60 ms
    assert(Opus.FrameSamples(11) === 2880) // SILK WB 60 ms
    assert(Opus.FrameSamples(12) === 480)  // Hybrid SWB 10 ms
    assert(Opus.FrameSamples(15) === 960)  // Hybrid FB 20 ms
    assert(Opus.FrameSamples(16) === 120)  // CELT NB 2.5 ms
    assert(Opus.FrameSamples(31) === 960)  // CELT FB 20 ms
    assert(Opus.mode(0) === 0 && Opus.mode(12) === 1 && Opus.mode(16) === 2)
  }

  private def pkt(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  test("code 0: one frame, rest of packet") {
    // config 16, mono, code 0 → toc 0x80
    val p = Opus.packetInfoOrNull(pkt(Seq(0x80) ++ Seq.fill(10)(7): _*))
    assert(p != null)
    assert(p.config === 16 && p.code === 0 && p.nFrames === 1)
    assert(p.payloadBytes === 10 && p.samples === 120)
  }

  test("code 1: two equal frames; odd payload is a violation") {
    val good = Opus.packetInfoOrNull(pkt(Seq(0x81) ++ Seq.fill(8)(1): _*))
    assert(good != null && good.nFrames === 2 && good.payloadBytes === 8)
    assert(Opus.packetInfoOrNull(pkt(Seq(0x81) ++ Seq.fill(7)(1): _*)) == null)
  }

  test("code 2: explicit first length, both 1-byte and 2-byte forms, DTX") {
    // 1-byte: n1=5, n2=3
    val a = Opus.packetInfoOrNull(pkt(Seq(0x82, 5) ++ Seq.fill(8)(2): _*))
    assert(a != null && a.nFrames === 2 && a.payloadBytes === 8)
    // 2-byte: n1=300 → b1=252, b2=12 (len = b2*4 + b1)
    val b = Opus.packetInfoOrNull(
      pkt(Seq(0x82, 252, 12) ++ Seq.fill(305)(3): _*))
    assert(b != null && b.payloadBytes === 305)
    // DTX first frame: n1=0
    val c = Opus.packetInfoOrNull(pkt(Seq(0x82, 0) ++ Seq.fill(4)(9): _*))
    assert(c != null && c.nFrames === 2 && c.payloadBytes === 4)
    // n1 longer than the packet is a violation
    assert(Opus.packetInfoOrNull(pkt(0x82, 50, 1, 2)) == null)
  }

  test("code 3: CBR, VBR, padding chains, the 120 ms bound") {
    // config 16 (120 samples): CBR M=4, fs=3 → toc 0x83, fc=4
    val cbr = Opus.packetInfoOrNull(pkt(Seq(0x83, 4) ++ Seq.fill(12)(1): _*))
    assert(cbr != null && cbr.nFrames === 4 && cbr.payloadBytes === 12 && !cbr.vbr)
    // CBR remainder not divisible by M is a violation
    assert(Opus.packetInfoOrNull(pkt(Seq(0x83, 4) ++ Seq.fill(13)(1): _*)) == null)
    // VBR M=2: one explicit len (3), last frame takes the rest
    val vbr = Opus.packetInfoOrNull(pkt(Seq(0x83, 0x80 | 2, 3) ++ Seq.fill(9)(1): _*))
    assert(vbr != null && vbr.vbr && vbr.nFrames === 2 && vbr.payloadBytes === 9)
    // padding: single byte (P=6) and 255-chain (P=254+46=300)
    val pad1 = Opus.packetInfoOrNull(
      pkt(Seq(0x83, 0x40 | 2, 6) ++ Seq.fill(10)(1) ++ Seq.fill(6)(0): _*))
    assert(pad1 != null && pad1.padBytes === 6 && pad1.payloadBytes === 10)
    val pad2 = Opus.packetInfoOrNull(
      pkt(Seq(0x83, 0x40 | 1, 255, 46) ++ Seq.fill(20)(1) ++ Seq.fill(300)(0): _*))
    assert(pad2 != null && pad2.padBytes === 300 && pad2.payloadBytes === 20)
    // M=0 is a violation; M×dur > 5760 (config 3, 2880 × 3) too
    assert(Opus.packetInfoOrNull(pkt(0x83, 0)) == null)
    assert(Opus.packetInfoOrNull(
      pkt(Seq(0x1B, 3) ++ Seq.fill(9)(1): _*)) == null) // toc 0x1B = cfg 3, code 3
  }

  test("fixture corpus round-trips against the oracle's closed forms") {
    for (d <- 0L until 96L) {
      val st = Opus.streamStatsOrNull(OpusFixtures.stream(d))
      assert(st != null, s"doc $d")
      assert(st.channels === OpusFixtures.channels(d))
      assert(st.preSkip === OpusFixtures.preSkip(d))
      val a = OpusFixtures.nAudio(d)
      assert(st.nPackets === a)
      // replay the closed forms
      var frames = 0L; var samples = 0L; var toc = 0L; var payload = 0L
      var pad = 0L; var vbrN = 0; var silk = 0; var hyb = 0; var celt = 0
      for (p <- 0 until a) {
        val cfg = OpusFixtures.config(d, p)
        val code = OpusFixtures.code(d, p)
        val dur = Opus.FrameSamples(cfg)
        val maxM = math.min(3, 5760 / dur)
        val m3 = (1 + (d + p) % maxM).toInt
        val f = code match { case 0 => 1; case 3 => m3; case _ => 2 }
        frames += f; samples += f.toLong * dur
        toc += (cfg << 3) | (OpusFixtures.stereoBit(d) << 2) | code
        payload += (code match {
          case 0 => 20 + (7 * d + 13L * p) % 200
          case 1 => 2 * (15 + (5 * d + 11L * p) % 120)
          case 2 => (3 * d + 17L * p) % 300 + 10 + (d + p) % 50
          case _ =>
            if ((d + 3L * p) % 2 == 1) {
              vbrN += 1
              (0 until m3 - 1).map(k => 5 + (d + p + 7L * k) % 60).sum +
                8 + (d + p) % 40
            } else m3 * (12 + (d + p) % 30)
        })
        if (code == 3 && p % 2 == 0) pad += ((d + p) % 3) * 150
        if (cfg < 12) silk += 1 else if (cfg < 16) hyb += 1 else celt += 1
      }
      assert(st.nFrames === frames, s"doc $d frames")
      assert(st.totalSamples === samples, s"doc $d samples")
      assert(st.tocSum === toc, s"doc $d toc")
      assert(st.payloadSum === payload, s"doc $d payload")
      assert(st.padSum === pad, s"doc $d pad")
      assert(st.nVbr === vbrN && st.nSilk === silk &&
        st.nHybrid === hyb && st.nCelt === celt, s"doc $d counts")
    }
  }

  test("bounded and total: garbage, truncation, wrong codec never throw") {
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 200) {
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      Opus.streamStatsOrNull(b) // may be null; must not throw
    }
    val good = OpusFixtures.stream(17L)
    for (cut <- Seq(1, 20, good.length / 2, good.length - 1)) {
      Opus.streamStatsOrNull(java.util.Arrays.copyOf(good, cut))
    }
    // a Vorbis container is not an Opus stream
    assert(Opus.streamStatsOrNull(graft.ext.VorbisPcmFixtures.stream(3L)) == null)
    // flipping a payload byte breaks the page CRC → null
    val bad = good.clone()
    bad(good.length - 3) = (bad(good.length - 3) ^ 0x5A).toByte
    assert(Opus.streamStatsOrNull(bad) == null)
  }
}
