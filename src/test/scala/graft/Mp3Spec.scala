package graft

import graft.ext.Mp3
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Mp3]] — the Layer III side-info walker validated on
  * frames BUILT HERE bit-by-bit from the ISO/IEC 11172-3 layout (an
  * independent test-side writer, the FLAC/CAVLC discipline: the spec
  * is transcribed twice, once as the reader and once as this writer,
  * and they must meet). No MP3 encoder exists in this environment,
  * which is exactly why the walker's scope stops at side info — see
  * the build-vs-defer note in BENCH_NOTES.
  */
class Mp3Spec extends AnyFunSuite {

  /** MSB-first bit writer (independent of the reader's Bits class). */
  private final class BitW {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0
    def put(v: Int, n: Int): this.type = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >> k) & 1)
        nbits += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
        k -= 1
      }
      this
    }
    def bytes: Array[Byte] = {
      require(nbits == 0, "unaligned side info")
      buf.toArray
    }
  }

  /** Build one MPEG-1 Layer III frame: header + optional CRC + side
    * info + zero main data, padded to the table frame length.
    * `gains(g)(ch)`, shapes: (2, nch).
    */
  private def frame(kbpsIdx: Int, rateIdx: Int, mono: Boolean, padding: Int,
                    gains: Array[Array[Int]], crc: Boolean = false,
                    mainDataBegin: Int = 0, shortBlocks: Boolean = false): Array[Byte] = {
    val kbps = Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)(kbpsIdx)
    val rate = Array(44100, 48000, 32000)(rateIdx)
    val nch = if (mono) 1 else 2
    // header bytes built explicitly: sync 11111111 111, ver 11, layer 01, prot
    val b1 = (0xE0 | (3 << 3) | (1 << 1) | (if (crc) 0 else 1)).toByte
    val b2 = ((kbpsIdx << 4) | (rateIdx << 2) | (padding << 1)).toByte
    val b3 = (if (mono) 0xC0 else 0x00).toByte
    val side = new BitW
    side.put(mainDataBegin, 9)
    side.put(0, if (mono) 5 else 3) // private
    side.put(0, 4 * nch) // scfsi
    for (g <- 0 until 2; ch <- 0 until nch) {
      side.put(100 + g * 7 + ch, 12) // part2_3_length
      side.put(50 + g, 9) // big_values
      side.put(gains(g)(ch), 8) // global_gain
      side.put(3, 4) // scalefac_compress
      if (shortBlocks) {
        side.put(1, 1) // window_switching_flag
        side.put(2, 2) // block_type = short
        side.put(0, 1) // mixed_block_flag
        side.put(5, 5).put(9, 5) // table_select ×2
        side.put(1, 3).put(2, 3).put(3, 3) // subblock_gain
      } else {
        side.put(0, 1)
        side.put(5, 5).put(9, 5).put(13, 5) // table_select ×3
        side.put(6, 4).put(3, 3) // region counts
      }
      side.put(0, 1).put(1, 1).put(0, 1) // preflag, sfs, count1
    }
    val sideBytes = side.bytes
    assert(sideBytes.length === (if (mono) 17 else 32))
    val frameLen = 144 * kbps * 1000 / rate + padding
    val out = new Array[Byte](frameLen)
    out(0) = 0xFF.toByte; out(1) = b1; out(2) = b2; out(3) = b3
    var p = 4
    if (crc) { out(4) = 0x12; out(5) = 0x34; p = 6 } // CRC value unchecked
    System.arraycopy(sideBytes, 0, out, p, sideBytes.length)
    out
  }

  private val g1 = Array(Array(200, 210), Array(190, 215))
  private val g2 = Array(Array(100, 101), Array(102, 103))
  private val gMono = Array(Array(210), Array(180))

  test("walks stereo frames and recovers side info bit-exactly") {
    val stream = frame(9, 0, mono = false, 0, g1) ++
      frame(9, 0, mono = false, 1, g2, mainDataBegin = 17)
    val fs = Mp3.framesOrNull(stream)
    assert(fs != null && fs.length === 2)
    assert(fs(0).bitrateKbps === 128 && fs(0).sampleRate === 44100)
    assert(fs(0).channels === 2 && !fs(0).crcProtected)
    assert(fs(0).lengthBytes === 144 * 128000 / 44100)
    assert(fs(1).lengthBytes === 144 * 128000 / 44100 + 1) // padding
    assert(fs(1).mainDataBegin === 17)
    for (g <- 0 until 2; ch <- 0 until 2) {
      assert(fs(0).granules(g)(ch).globalGain === g1(g)(ch))
      assert(fs(1).granules(g)(ch).globalGain === g2(g)(ch))
      assert(fs(0).granules(g)(ch).part23Length === 100 + g * 7 + ch)
      assert(fs(0).granules(g)(ch).bigValues === 50 + g)
      assert(fs(0).granules(g)(ch).blockType === 0)
    }
  }

  test("mono, CRC-protected, and short-block frames parse") {
    val stream = frame(5, 2, mono = true, 0, gMono, crc = true, shortBlocks = true)
    val fs = Mp3.framesOrNull(stream)
    assert(fs != null && fs.length === 1)
    assert(fs(0).channels === 1 && fs(0).crcProtected)
    assert(fs(0).sampleRate === 32000 && fs(0).bitrateKbps === 64)
    assert(fs(0).granules(1)(0).globalGain === 180)
    assert(fs(0).granules(0)(0).blockType === 2)
    assert(!fs(0).granules(0)(0).mixedBlock)
  }

  test("ID3v2 tag is skipped; trailing ID3v1 garbage ends the walk quietly") {
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 12) ++ new Array[Byte](12)
    val tail = ("TAG" + "x" * 125).getBytes("US-ASCII")
    val fs = Mp3.framesOrNull(id3 ++ frame(9, 0, mono = false, 0, g1) ++ tail)
    assert(fs != null && fs.length === 1)
    assert(fs(0).granules(0)(1).globalGain === 210)
  }

  test("gain envelope is the channel-averaged 2^((gg-210)/4) sequence") {
    val env = Mp3.gainEnvelopeOrNull(
      frame(9, 0, mono = false, 0, g1) ++ frame(9, 0, mono = false, 1, g2))
    assert(env != null && env.length === 4)
    def e(a: Int, b: Int): Double =
      (math.pow(2, (a - 210) / 4.0) + math.pow(2, (b - 210) / 4.0)) / 2
    assert(math.abs(env(0) - e(200, 210)) < 1e-12)
    assert(math.abs(env(1) - e(190, 215)) < 1e-12)
    assert(math.abs(env(3) - e(102, 103)) < 1e-12)
  }

  test("non-MP3, LSF, and free-format streams null loudly") {
    assert(Mp3.framesOrNull(null) === null)
    assert(Mp3.framesOrNull("not audio at all".getBytes) === null)
    // MPEG-2 LSF header (version bits 10): different side-info shape → null
    val lsf = frame(9, 0, mono = false, 0, g1)
    lsf(1) = (lsf(1) & ~0x08).toByte
    assert(Mp3.framesOrNull(lsf) === null)
    // free-format bitrate index 0 → null
    val free = frame(9, 0, mono = false, 0, g1)
    free(2) = (free(2) & 0x0F).toByte
    assert(Mp3.framesOrNull(free) === null)
  }

  test("q137 fixture synth: walker recovers every closed-form knob across a doc sweep") {
    import graft.ext.Mp3Fixtures
    for (docId <- 0L to 60L) {
      val bytes = Mp3Fixtures.stream(docId)
      // stream length is the sum of its predicted parts
      val id3 = Mp3Fixtures.id3Size(docId)
      val predictedLen =
        (if (id3 >= 0) 10 + id3 else 0) +
          (0 until Mp3Fixtures.nFrames(docId)).map(Mp3Fixtures.frameLen(docId, _)).sum +
          (if (Mp3Fixtures.hasId3v1Trailer(docId)) 128 else 0)
      assert(bytes.length === predictedLen, s"doc $docId length")
      val fs = Mp3.framesOrNull(bytes)
      assert(fs != null && fs.length === Mp3Fixtures.nFrames(docId), s"doc $docId frames")
      val nch = if (Mp3Fixtures.isMono(docId)) 1 else 2
      for ((fr, f) <- fs.zipWithIndex) {
        assert(fr.lengthBytes === Mp3Fixtures.frameLen(docId, f), s"doc $docId f$f len")
        assert(fr.channels === nch)
        assert(fr.crcProtected === Mp3Fixtures.hasCrc(docId, f))
        assert(fr.mainDataBegin === Mp3Fixtures.mainDataBegin(docId, f))
        for (g <- 0 until 2; ch <- 0 until nch) {
          val gi = fr.granules(g)(ch)
          assert(gi.globalGain === Mp3Fixtures.gain(docId, f, g, ch),
            s"doc $docId f$f g$g ch$ch gain")
          val wsf = Mp3Fixtures.windowSwitch(docId, f, g)
          assert((gi.blockType != 0) === wsf, s"doc $docId f$f g$g wsf")
          if (wsf) assert(gi.blockType === Mp3Fixtures.blockType(docId, g))
        }
      }
    }
  }

  test("mp3_side_stats kernel folds the walk to the oracle's integers") {
    import graft.ext.Mp3Fixtures
    val r = graft.fn.Mp3SideStats.statsOrNull(Mp3Fixtures.stream(7L))
    assert(r != null)
    val n = Mp3Fixtures.nFrames(7L)
    assert(r.getInt(0) === n)
    val gains = for (f <- 0 until n; g <- 0 until 2; ch <- 0 until 2)
      yield Mp3Fixtures.gain(7L, f, g, ch)
    assert(r.getLong(5) === gains.map(_.toLong).sum)
    assert(r.getInt(6) === gains.min && r.getInt(7) === gains.max)
    assert(graft.fn.Mp3SideStats.statsOrNull("junk".getBytes) === null)
  }

  test("corrupt-stream fuzz: total, never throws, bounded") {
    val rnd = new scala.util.Random(10_2026)
    val base = frame(9, 0, mono = false, 0, g1) ++ frame(9, 0, mono = false, 1, g2)
    (0 until 400).foreach { i =>
      val mutated = base.clone()
      (0 until 1 + rnd.nextInt(6)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      val r = Mp3.framesOrNull(mutated) // may be null or partial — just total
      if (r != null) assert(r.length <= 4)
      val t = mutated.take(rnd.nextInt(mutated.length))
      Mp3.framesOrNull(t)
    }
  }
}
