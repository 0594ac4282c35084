package graft

import graft.ext.{Ogg, OggFixtures}
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Ogg]] — pages, CRCs, packet reassembly, Vorbis/Opus
  * headers. The dual-transcription discipline: the CRC is
  * cross-checked against an independent BITWISE implementation (the
  * walker uses a table), and the walker is driven by a page writer
  * built here independently of [[graft.ext.OggFixtures]].
  */
class OggSpec extends AnyFunSuite {

  /** Independent bitwise Ogg CRC-32 (RFC 3533 §6: poly 0x04C11DB7,
    * init 0, no reflection, no xorout).
    */
  private def bitwiseCrc(b: Array[Byte]): Int = {
    var r = 0
    for (x <- b) {
      r ^= (x & 0xFF) << 24
      for (_ <- 0 until 8)
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04C11DB7 else r << 1
    }
    r
  }

  /** Independent page writer (MSB-free zone: plain little-endian
    * struct packing, CRC via [[bitwiseCrc]]).
    */
  private def writePage(htype: Int, granule: Long, serial: Long, seq: Long,
                        segs: Seq[Int], payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("OggS".getBytes("US-ASCII")); out.write(0); out.write(htype)
    for (i <- 0 until 8) out.write(((granule >> (8 * i)) & 0xFF).toInt)
    for (i <- 0 until 4) out.write(((serial >> (8 * i)) & 0xFF).toInt)
    for (i <- 0 until 4) out.write(((seq >> (8 * i)) & 0xFF).toInt)
    out.write(Array[Byte](0, 0, 0, 0)) // CRC slot
    out.write(segs.length)
    segs.foreach(out.write)
    out.write(payload)
    val full = out.toByteArray
    val c = bitwiseCrc(full)
    for (i <- 0 until 4) full(22 + i) = ((c >> (8 * i)) & 0xFF).toByte
    full
  }

  test("table CRC == independent bitwise CRC on random buffers") {
    val rnd = new scala.util.Random(3533)
    for (n <- Seq(0, 1, 27, 300, 4096)) {
      val b = new Array[Byte](n); rnd.nextBytes(b)
      assert(Ogg.crc(b, 0, n, n + 8) === bitwiseCrc(b), s"n=$n")
    }
    // and the zeroed-CRC-field form matches bitwise over a zeroed copy
    val b = new Array[Byte](100); rnd.nextBytes(b)
    val z = b.clone(); for (i <- 22 until 26) z(i) = 0
    assert(Ogg.crc(b, 0, 100, 22) === bitwiseCrc(z))
  }

  test("independently written Opus stream walks: pages, packets, headers") {
    val id = "OpusHead".getBytes("US-ASCII") ++
      Array[Byte](1, 2) ++ // version, channels
      Array[Byte](0x38, 1.toByte) ++ // pre_skip = 312
      Array[Byte](0x80.toByte, 0xBB.toByte, 0, 0) ++ // 48000
      Array[Byte](0, 0, 0) // gain, mapping 0
    val tag = "v=1".getBytes("UTF-8")
    val tags = "OpusTags".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "test".getBytes ++
      Array[Byte](1, 0, 0, 0) ++ Array[Byte](3, 0, 0, 0) ++ tag
    val audio = Array.tabulate(600)(i => (i % 251).toByte) // spans lacings
    val stream =
      writePage(0x02, 0, 7, 0, Seq(id.length), id) ++
      writePage(0, 0, 7, 1, Seq(tags.length), tags) ++
      writePage(0x04, 1920, 7, 2, Seq(255, 255, 90), audio)
    val m = Ogg.metaOrNull(stream)
    assert(m != null)
    assert(m.codec === "opus" && m.channels === 2 && m.rate === 48000L)
    assert(m.preSkip === 312 && m.nPages === 3 && m.nPackets === 3)
    assert(m.lastGranule === 1920L && m.granuleRate === 48000L)
    assert(m.vendor === "test" && m.comments.toSeq === Seq(("v", "1")))
    val pk = Ogg.packetsOrNull(stream)
    assert(pk(2).toSeq === audio.toSeq)
  }

  test("q138 fixture sweep: walker recovers every closed-form knob") {
    for (docId <- 0L to 60L) {
      val bytes = OggFixtures.stream(docId)
      val m = Ogg.metaOrNull(bytes)
      assert(m != null, s"doc $docId")
      assert(m.codec === (if (OggFixtures.isOpus(docId)) "opus" else "vorbis"))
      assert(m.channels === OggFixtures.channels(docId), s"doc $docId ch")
      assert(m.rate === OggFixtures.rate(docId))
      assert(m.preSkip === OggFixtures.preSkip(docId))
      val a = OggFixtures.nAudio(docId)
      assert(m.nPages === 3 + a, s"doc $docId pages")
      assert(m.nPackets === (if (OggFixtures.isOpus(docId)) 2 + a else 3 + a))
      assert(m.lastGranule === OggFixtures.lastGranule(docId))
      assert(m.comments.length === OggFixtures.nComments(docId))
      assert(m.vendor === OggFixtures.vendor(docId))
      val pk = Ogg.packetsOrNull(bytes)
      val nHeader = if (OggFixtures.isOpus(docId)) 2 else 3
      val audioBytes = pk.drop(nHeader).map(_.length).sum
      assert(audioBytes === (0 until a).map(OggFixtures.audioLen(docId, _)).sum)
      assert(m.audioBytes === audioBytes.toLong)
      // the split packet reassembled exactly
      assert(pk(nHeader + 2).length === OggFixtures.audioLen(docId, 2))
    }
  }

  test("corruption and structure violations null loudly") {
    val good = OggFixtures.stream(3L)
    assert(Ogg.metaOrNull(good) != null)
    // flip one payload byte: CRC must reject
    val bad = good.clone(); bad(good.length - 5) = (bad(good.length - 5) ^ 1).toByte
    assert(Ogg.pagesOrNull(bad) === null)
    // bad magic
    val magic = good.clone(); magic(0) = 'X'
    assert(Ogg.pagesOrNull(magic) === null)
    // version != 0
    val ver = good.clone(); ver(4) = 1
    assert(Ogg.pagesOrNull(ver) === null)
    // truncation mid-page
    assert(Ogg.pagesOrNull(good.take(good.length - 3)) === null)
    // no EOS: drop the final page entirely
    val lastPageStart = {
      var p = good.length - 28; var found = -1
      while (p >= 0 && found < 0) {
        if (Ogg.pagesOrNull(good.take(p)) != null) found = p
        p -= 1
      }
      found
    }
    assert(lastPageStart < 0) // every strict prefix violates (EOS or truncation)
    // grouped stream: second stream's BOS page appended -> refused
    val second = writePage(0x02, 0, 99, 0, Seq(4), Array[Byte](1, 2, 3, 4))
    assert(Ogg.pagesOrNull(good ++ second) === null)
  }

  test("continuation-flag honesty: a flag with no open packet is refused") {
    val id = "OpusHead".getBytes("US-ASCII") ++
      Array[Byte](1, 1, 0, 0) ++ Array[Byte](0x80.toByte, 0xBB.toByte, 0, 0) ++
      Array[Byte](0, 0, 0)
    val tags = "OpusTags".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0) ++ Array[Byte](0, 0, 0, 0)
    val stream =
      writePage(0x02, 0, 7, 0, Seq(id.length), id) ++
      writePage(0x01 | 0x04, 0, 7, 1, Seq(tags.length), tags) // lying flag
    assert(Ogg.packetsOrNull(stream) === null)
    assert(Ogg.metaOrNull(stream) === null)
  }

  test("corrupt-stream fuzz: total, never throws") {
    val rnd = new scala.util.Random(138)
    val base = OggFixtures.stream(11L)
    for (_ <- 0 until 300) {
      val m = base.clone()
      for (_ <- 0 until 1 + rnd.nextInt(5))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Ogg.metaOrNull(m) // null or meta — just total
      Ogg.metaOrNull(m.take(rnd.nextInt(m.length)))
    }
  }
}
