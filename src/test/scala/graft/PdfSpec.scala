package graft

import graft.ext.{Pdf, PdfFixtures}
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Pdf]] — the restricted-subset PDF text extractor.
  *
  * Validation layers:
  *   1. a HAND-ASSEMBLED golden document written inline here, byte by
  *      byte, independent of [[PdfFixtures]] (so a shared bug in the
  *      writer and reader cannot self-certify)
  *   2. writer round-trips: every fixture variant × many ids must
  *      reproduce the closed-form text/pages/objects/title mirrors
  *   3. structure coverage: xref stream + ObjStm + predictor, CMap
  *      bfchar/bfrange, TJ threshold semantics, escapes
  *   4. the malformed contract: truncations at every offset, byte
  *      flips, garbage, encrypted and unsupported-filter documents
  *      null loudly and never throw
  */
class PdfSpec extends AnyFunSuite {

  private val L1 = java.nio.charset.StandardCharsets.ISO_8859_1

  // ---------------------------------------------------------------
  // 1. hand-assembled golden (classic xref, plain content)
  // ---------------------------------------------------------------
  private def handGolden(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def raw(s: String): Unit = out.write(s.getBytes(L1))
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    raw("%PDF-1.4\n")
    offs += out.size
    raw("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offs += out.size
    raw("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
    offs += out.size
    raw("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /Fa 5 0 R >> >> >>\nendobj\n")
    val content = "BT /Fa 9 Tf 5 10 Td (Hello) Tj 0 -11 Td (world \\050x\\051) Tj ET"
    offs += out.size
    raw(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    offs += out.size
    raw("5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman >>\nendobj\n")
    val xref = out.size
    raw("xref\n0 6\n")
    raw("0000000000 65535 f\r\n")
    offs.foreach(o => raw(f"$o%010d 00000 n\r\n"))
    raw("trailer\n<< /Size 6 /Root 1 0 R >>\n")
    raw(s"startxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  test("hand-assembled golden extracts exactly") {
    val d = Pdf.textOrNull(handGolden())
    assert(d != null)
    assert(d.nPages === 1)
    assert(d.nObjects === 5)
    assert(d.title === "")
    // StandardEncoding default font; \050 = '(' and \051 = ')'
    assert(d.text === "Hello\nworld (x)")
  }

  // ---------------------------------------------------------------
  // 2. writer round-trips against the closed-form mirrors
  // ---------------------------------------------------------------
  test("every fixture variant round-trips its closed forms") {
    for (id <- 0L until 64L) {
      val d = Pdf.textOrNull(PdfFixtures.pdf(id))
      assert(d != null, s"doc $id nulled")
      assert(d.text === PdfFixtures.expectedText(id), s"doc $id text")
      assert(d.nPages === PdfFixtures.expectedPages(id), s"doc $id pages")
      assert(d.nObjects === PdfFixtures.expectedObjects(id), s"doc $id objects")
      assert(d.title === PdfFixtures.expectedTitle(id), s"doc $id title")
    }
  }

  test("variant structure is what it claims (layout axes differ)") {
    // ids 4/9/2/7: one per variant, all OUTSIDE the id % 16 ∈
    // {0,1,3} encryption axis so the plaintext markers are visible
    val v0 = new String(PdfFixtures.pdf(4), L1)
    val v1 = new String(PdfFixtures.pdf(9), L1)
    val v2 = new String(PdfFixtures.pdf(2), L1)
    val v3 = new String(PdfFixtures.pdf(7), L1)
    assert(v0.contains("xref\n0 ") && !v0.contains("/Type /XRef"))
    assert(v0.contains("(Doc 4 page 0)")) // uncompressed content visible
    assert(v1.contains("/Filter /FlateDecode") && !v1.contains("(kern)"))
    assert(v2.contains("/Type /XRef") && v2.contains("/Type /ObjStm") &&
      v2.contains("/Predictor 12") && v2.contains("Identity-H"))
    assert(v3.contains("/Title (Graft Doc 7)"))
    // the encrypted siblings hide the same markers
    assert(!new String(PdfFixtures.pdf(0), L1).contains("(Doc 0 page 0)"))
    assert(!new String(PdfFixtures.pdf(3), L1).contains("Graft Doc 3"))
  }

  // ---------------------------------------------------------------
  // 3. focused structure cases
  // ---------------------------------------------------------------
  test("TJ adjustments: <= -200 is a word gap, smaller kerns vanish") {
    // id % 4 == 1 exercises [-150, -250]: "kern"+"ed" fuse, then a space
    val d = Pdf.textOrNull(PdfFixtures.pdf(1))
    assert(d.text.contains("kerned text"))
    assert(!d.text.contains("kern ed"))
  }

  test("2-byte ToUnicode CMap path decodes bfchar and bfrange cells") {
    val d = Pdf.textOrNull(PdfFixtures.pdf(2)) // 中文 + fullwidth 2
    assert(d.text === "中文 ２")
    val d6 = Pdf.textOrNull(PdfFixtures.pdf(6)) // fullwidth 6
    assert(d6.text === "中文 ６")
  }

  test("WinAnsi high bytes decode through the 1252 table") {
    val d = Pdf.textOrNull(PdfFixtures.pdf(8)) // v0, id 8 (no overrides)
    assert(d.text.contains("café €1")) // 8 % 7 = 1
  }

  test("/Differences remaps codes over the base encoding (AGL + uniXXXX)") {
    // id 4 declares /Differences [128 /bullet /uni2603]: code 0x80
    // leaves WinAnsi's € for •, 0x81 decodes through the uniXXXX rule
    val d = Pdf.textOrNull(PdfFixtures.pdf(4))
    assert(d.text.contains("café •☃4"))
    // codes OUTSIDE the differences still ride the base table
    assert(d.text.contains("café")) // é = \351 via WinAnsi
  }

  test("quote operators break lines; /Info /Title decodes") {
    val d = Pdf.textOrNull(PdfFixtures.pdf(3))
    assert(d.text === "Part 3\nalpha\nbeta 3\ngamma 0")
    assert(d.title === "Graft Doc 3")
  }

  test("UTF-16BE titles decode via the BOM") {
    val out = new java.io.ByteArrayOutputStream()
    def raw(s: String): Unit = out.write(s.getBytes(L1))
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    raw("%PDF-1.4\n")
    offs += out.size
    raw("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offs += out.size
    raw("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
    offs += out.size
    raw("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    val content = "BT (t) Tj ET"
    offs += out.size
    raw(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    // UTF-16BE "Ωmega" as a hex string with BOM
    val hex = "FEFF" + "Ωmega".map(c => f"${c.toInt}%04X").mkString
    offs += out.size
    raw(s"5 0 obj\n<< /Title <$hex> >>\nendobj\n")
    val xref = out.size
    raw("xref\n0 6\n0000000000 65535 f\r\n")
    offs.foreach(o => raw(f"$o%010d 00000 n\r\n"))
    raw("trailer\n<< /Size 6 /Root 1 0 R /Info 5 0 R >>\n")
    raw(s"startxref\n$xref\n%%EOF\n")
    val d = Pdf.textOrNull(out.toByteArray)
    assert(d != null)
    assert(d.title === "Ωmega")
    assert(d.text === "t")
  }

  // ---------------------------------------------------------------
  // 4. malformed contract: null loudly, never throw, never hang
  // ---------------------------------------------------------------
  test("truncations at every stride never throw") {
    for (id <- 0L until 4L) {
      val full = PdfFixtures.pdf(id)
      var k = 1
      while (k < full.length) {
        val cut = java.util.Arrays.copyOfRange(full, 0, k)
        Pdf.textOrNull(cut) // may be null or (rarely) still parseable; must not throw
        k += 37
      }
      // cutting the tail (startxref) must null
      assert(Pdf.textOrNull(java.util.Arrays.copyOfRange(full, 0, full.length - 24)) == null)
    }
  }

  test("byte flips never throw") {
    val rnd = new scala.util.Random(11)
    for (id <- 0L until 4L; _ <- 0 until 50) {
      val b = PdfFixtures.pdf(id).clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Pdf.textOrNull(b)
    }
  }

  test("garbage, empty, and non-PDF inputs null") {
    assert(Pdf.textOrNull(null) == null)
    assert(Pdf.textOrNull(Array.emptyByteArray) == null)
    assert(Pdf.textOrNull("not a pdf at all, nope".getBytes(L1)) == null)
    val rnd = new scala.util.Random(12)
    for (_ <- 0 until 200) {
      val b = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(b)
      assert(Pdf.textOrNull(b) == null)
    }
  }

  test("standard security handler: RC4-40/128 + AES-128 decode; wrong password nulls") {
    // the id % 16 axis: 0 → RC4-128 (V2/R3) over v0, 1 → AES-128-CBC
    // (V4/R4) over v1 (ciphertext through Flate), 3 → RC4-40 (V1/R2)
    // over v3 (whose /Title gates STRING decryption). Same closed-form
    // text/title as their plaintext siblings — decryption transparent.
    for (id <- Seq(0L, 16L, 32L, 1L, 17L, 33L, 3L, 19L, 35L)) {
      val doc = Pdf.textOrNull(PdfFixtures.pdf(id))
      assert(doc != null, s"id=$id")
      assert(doc.text === PdfFixtures.expectedText(id), s"id=$id")
      assert(doc.title === PdfFixtures.expectedTitle(id), s"id=$id title")
      assert(doc.nObjects === PdfFixtures.expectedObjects(id), s"id=$id objs")
    }
    // a NON-empty user password (here: a corrupted /U that no key
    // derived from the empty password can match) nulls loudly —
    // owner-only / passworded documents never yield garbage text
    val src = PdfFixtures.pdf(16L)
    val marker = "/U <".getBytes(L1)
    val at = new String(src, L1).indexOf("/U <")
    assert(at > 0 && marker.length > 0)
    val bad = src.clone()
    bad(at + 4) = (if (bad(at + 4) == '0') '1' else '0').toByte
    bad(at + 5) = (if (bad(at + 5) == '0') '1' else '0').toByte
    assert(Pdf.textOrNull(bad) == null, "wrong password must null")
    // truncation fuzz over an encrypted doc: null or decode, no throw
    for (cut <- Seq(30, src.length / 2, src.length - 4))
      Pdf.textOrNull(java.util.Arrays.copyOf(src, cut))
  }

  test("hostile /Length in the V4 /CFM V2 arm is rejected (5..16 bytes)") {
    // pdf(1) is the V4/R4 AESV2-encrypted sibling; relabel its crypt
    // filter as /V2 (RC4) with an out-of-range /Length — the key
    // derivation must refuse (no zero-padded multi-hundred-byte MD5
    // input), the document nulls, nothing throws
    val src = new String(PdfFixtures.pdf(1), L1)
    assert(src.contains("/CFM /AESV2") && src.contains("/Length 128"))
    for (len <- Seq(4096, 24, 0)) {
      val bad = src.replace("/CFM /AESV2", "/CFM /V2")
        .replace("/V 4 /R 4 /Length 128", s"/V 4 /R 4 /Length $len")
      assert(Pdf.textOrNull(bad.getBytes(L1)) == null, s"len=$len")
    }
  }

  test("unsupported filters null loudly (no silent garbage)") {
    val src = new String(PdfFixtures.pdf(1), L1)
    val bad = src.replace("/Filter /FlateDecode", "/Filter /DCTDecode")
    assert(Pdf.textOrNull(bad.getBytes(L1)) == null)
    // a stream RELABELED as LZW is malformed LZW — null, not garbage
    val mislabeled = src.replace("/Filter /FlateDecode", "/Filter /LZWDecode")
    assert(Pdf.textOrNull(mislabeled.getBytes(L1)) == null)
  }

  test("LZWDecode: GIF cross-validation, round-trips, full PDFs") {
    // CROSS-VALIDATION against the independently golden-validated
    // [[Gif]] decoder (the one other LZW articulation in the repo):
    // with an 8-bit root alphabet, GIF LZW and TIFF/PDF LZW share the
    // ENTIRE code semantics (clear 256 / EOD 257 / entries from 258 /
    // 9→12-bit growth at 512/1024/2048 / KwKwK) and differ only in
    // bit packing (LSB vs MSB) and PDF's EarlyChange. So one encoder
    // run at earlyChange=0 packed both ways must decode identically
    // through BOTH decoders — a shared misconception in table
    // semantics cannot survive two independent implementations.
    val rnd0 = new scala.util.Random(7)
    for (len <- Seq(10, 3000, 20000)) {
      val data = new Array[Byte](len)
      rnd0.nextBytes(data)
      val viaGif = graft.ext.Gif.lzwDecode(
        PdfFixtures.lzw(data, earlyChange = 0, msb = false), 8, len)
      assert(viaGif != null && viaGif.toSeq === data.toSeq,
        s"GIF cross-decode len=$len")
      assert(Pdf.lzwDecode(PdfFixtures.lzw(data, earlyChange = 0), 0).toSeq
        === data.toSeq, s"earlyChange=0 round-trip len=$len")
    }
    // round-trips across the width-growth boundaries (511/1023/2047
    // entries — low-redundancy random input grows the table fastest;
    // 40 KB crosses all three and a repeated motif exercises KwKwK)
    val rnd = new scala.util.Random(42)
    for (len <- Seq(1, 2, 300, 5000, 40000)) {
      val data = new Array[Byte](len)
      rnd.nextBytes(data)
      assert(Pdf.lzwDecode(PdfFixtures.lzw(data), 1).toSeq === data.toSeq,
        s"random round-trip len=$len")
    }
    val kwk = Array.fill(3000)(Array[Byte](7, 7, 7, 8, 7, 7)).flatten
    assert(Pdf.lzwDecode(PdfFixtures.lzw(kwk), 1).toSeq === kwk.toSeq,
      "repetitive round-trip (KwKwK states)")
    val kwkGif = graft.ext.Gif.lzwDecode(
      PdfFixtures.lzw(kwk, earlyChange = 0, msb = false), 8, kwk.length)
    assert(kwkGif != null && kwkGif.toSeq === kwk.toSeq, "GIF KwKwK cross")
    // end-to-end: the q151-corpus LZW arm (id % 8 == 5) extracts the
    // SAME closed-form text as its Flate siblings
    for (id <- Seq(5L, 13L, 21L, 1005L)) {
      val doc = PdfFixtures.pdf(id)
      assert(new String(doc, L1).contains("/LZWDecode"), s"id=$id routes LZW")
      val got = Pdf.textOrNull(doc)
      assert(got != null && got.text === PdfFixtures.expectedText(id), s"id=$id")
    }
    // Flate siblings unchanged
    for (id <- Seq(1L, 9L, 17L)) {
      assert(Pdf.textOrNull(PdfFixtures.pdf(id)).text ===
        PdfFixtures.expectedText(id))
    }
    // width-boundary round-trip through a REAL document: a content
    // stream long enough to push the table past 511 and 1023 entries
    val longTail = (0 until 900).map(k => s"w${k % 997}x${(k * 37) % 991}")
      .mkString(" ")
    val b = PdfFixtures.lzw(("BT (x) Tj ET % " + longTail).getBytes(L1))
    assert(b.length > 1000) // genuinely grew the code table
  }

  test("LZWDecode: truncated code stream errors (nulls the doc), EOD succeeds") {
    // the filter contract: data exhaustion BEFORE the 257 EOD code is
    // malformed and must error loudly (like a truncated Flate stream),
    // not silently return the decoded prefix
    val data = new Array[Byte](500)
    new scala.util.Random(11).nextBytes(data)
    val full = PdfFixtures.lzw(data)
    assert(Pdf.lzwDecode(full, 1).toSeq === data.toSeq)
    for (cut <- Seq(1, 5, full.length / 2, full.length - 2))
      assertThrows[RuntimeException](Pdf.lzwDecode(full.take(cut), 1))
  }
}
