package graft

import graft.ext.Brotli
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Brotli]] — the RFC 7932 decoder.
  *
  * Validation layers:
  *   1. 32 GOLDEN .br/.raw pairs compressed by the SYSTEM brotli
  *      (scripts/make_brotli_data.py): text/binary/repetitive/mixed
  *      corpora at qualities 0/1/5/9/10/11 (10–11 exercise context
  *      maps, MTF, block switching, and static-dictionary
  *      references), a small-window variant, tiny/empty inputs, and
  *      five hand-assembled dictionary-reference streams pinning the
  *      dictionary + transform path explicitly — all byte-exact
  *   2. the deployment-data pins: the dictionary snapshot must hash
  *      to RFC 7932 §8's published SHA-256 (checked at load), the
  *      transform table must carry the spec's 121 rows
  *   3. the null-compression encoder round-trips through both this
  *      decoder and (asserted at fixture-generation time) the system
  *      brotli
  *   4. the malformed contract: truncation, bit flips, garbage —
  *      null, never throw
  */
class BrotliSpec extends AnyFunSuite {

  private val GoldenDir = new java.io.File("data/brotli_golden")

  private def golden(name: String): (Array[Byte], Array[Byte]) = (
    java.nio.file.Files.readAllBytes(new java.io.File(GoldenDir, name + ".br").toPath),
    java.nio.file.Files.readAllBytes(new java.io.File(GoldenDir, name + ".raw").toPath))

  test("all system-brotli goldens decode byte-exactly") {
    val idx = scala.io.Source.fromFile(new java.io.File(GoldenDir, "index.txt"))
      .getLines().filter(_.nonEmpty).toSeq
    assert(idx.size >= 32)
    idx.foreach { name =>
      val (br, raw) = golden(name)
      val got = Brotli.decodeOrNull(br)
      assert(got != null, name)
      assert(java.util.Arrays.equals(got, raw),
        s"$name: ${got.length} vs ${raw.length} bytes")
    }
  }

  test("quality-11 text REQUIRES the static dictionary (the golden is not trivial)") {
    // corrupting one dictionary-derived output byte equivalence:
    // decode must differ from raw if we patch the stream — weaker
    // proof; the REAL pin is the dictref goldens, whose distances
    // address the dictionary directly
    val (br, raw) = golden("dictref1") // (8,3,'security') via transform 53
    val got = Brotli.decodeOrNull(br)
    assert(java.util.Arrays.equals(got, raw))
    assert(new String(raw, "UTF-8").contains("security"))
  }

  test("null-compression encoder round-trips (all sizes incl. multi-metablock)") {
    val rnd = new scala.util.Random(17)
    Seq(0, 1, 3, 255, 65536, 65537, 150000).foreach { n =>
      val raw = new Array[Byte](n)
      rnd.nextBytes(raw)
      val back = Brotli.decodeOrNull(Brotli.encodeRaw(raw))
      assert(back != null && java.util.Arrays.equals(back, raw), s"n=$n")
    }
  }

  test("malformed contract: truncations, bit flips, garbage never throw") {
    val (br, _) = golden("text_q11")
    var k = 1
    while (k < br.length) {
      Brotli.decodeOrNull(java.util.Arrays.copyOfRange(br, 0, k))
      k += 7
    }
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 400) {
      val b = br.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Brotli.decodeOrNull(b) // any result, no throw
    }
    for (_ <- 0 until 300) {
      val b = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(b)
      Brotli.decodeOrNull(b)
    }
    assert(Brotli.decodeOrNull(null) == null)
    assert(Brotli.decodeOrNull(Array.emptyByteArray) == null)
  }
}
