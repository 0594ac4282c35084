package graft

import graft.ext.Charsets
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.Charsets]] — the JDK's own decoders are the
  * independent in-environment validator (the PiiSpec discipline:
  * parity against the platform implementation itself, plus hand
  * cases for the contract the platform can't express).
  */
class CharsetSpec extends AnyFunSuite {

  private def jdk(name: String, b: Array[Byte], from: Int = 0): String = {
    val dec = Charset.forName(name).newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(b, from, b.length - from)).toString
  }

  test("windows-1252 fallback matches the JDK's windows-1252 for every mappable byte") {
    // all 256 single bytes; the 5 WHATWG C1 passthrough cells
    // (0x81/0x8D/0x8F/0x90/0x9D) are UNMAPPED in the JDK charset
    // (it replaces them) — WHATWG keeps the C1 code point; assert
    // both behaviors explicitly
    val c1Pass = Set(0x81, 0x8D, 0x8F, 0x90, 0x9D)
    for (v <- 0 until 256) {
      val b = Array(v.toByte)
      val d = Charsets.decodeOrNull(b)
      if (Charsets.isValidUtf8(b, 0)) assert(d.charset === "utf-8")
      else {
        assert(d.charset === "windows-1252")
        if (c1Pass(v)) assert(d.text === v.toChar.toString, s"byte $v")
        else assert(d.text === jdk("windows-1252", b), s"byte $v")
      }
    }
    // a sentence with the published 0x80–0x9F row
    val s = Array[Byte](0x63, 0x61, 0x66, 0xE9.toByte, 0x20, 0x93.toByte,
      0x71, 0x94.toByte, 0x20, 0x80.toByte)
    val d = Charsets.decodeOrNull(s)
    assert(d.charset === "windows-1252")
    assert(d.text === "café “q” €")
    assert(d.text === jdk("windows-1252", s))
  }

  test("strict UTF-8 validation agrees with the JDK's REPORT decoder") {
    val rnd = new scala.util.Random(99)
    var valid = 0
    for (_ <- 0 until 4000) {
      val b = new Array[Byte](rnd.nextInt(24))
      rnd.nextBytes(b)
      val mine = Charsets.isValidUtf8(b, 0)
      val strict = StandardCharsets.UTF_8.newDecoder() // REPORT by default
      val theirs =
        try { strict.decode(java.nio.ByteBuffer.wrap(b)); true }
        catch { case _: java.nio.charset.CharacterCodingException => false }
      assert(mine === theirs, b.map(x => f"${x & 0xFF}%02x").mkString(" "))
      if (mine) valid += 1
    }
    assert(valid > 100) // short random arrays are often pure ASCII
    // the classic overlongs / surrogates / out-of-range by hand
    assert(!Charsets.isValidUtf8(Array(0xC0.toByte, 0xAF.toByte), 0)) // overlong /
    assert(!Charsets.isValidUtf8(Array(0xE0.toByte, 0x80.toByte, 0x80.toByte), 0))
    assert(!Charsets.isValidUtf8(Array(0xED.toByte, 0xA0.toByte, 0x80.toByte), 0)) // D800
    assert(!Charsets.isValidUtf8(Array(0xF4.toByte, 0x90.toByte, 0x80.toByte, 0x80.toByte), 0)) // >10FFFF
    assert(Charsets.isValidUtf8("héllo 中 🙂".getBytes("UTF-8"), 0))
  }

  test("UTF-16 BOM paths match the JDK, including lone surrogates and odd tails") {
    val texts = Seq("", "a", "w16 Ünïcodé", "pair 🙂 end", "中文 mixed ascii")
    for (t <- texts) {
      val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ t.getBytes("UTF-16LE")
      val be = Array[Byte](0xFE.toByte, 0xFF.toByte) ++ t.getBytes("UTF-16BE")
      val dl = Charsets.decodeOrNull(le)
      val db = Charsets.decodeOrNull(be)
      assert(dl.charset === "utf-16le" && dl.text === t)
      assert(db.charset === "utf-16be" && db.text === t)
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 2000) {
      val b = new Array[Byte](2 + rnd.nextInt(20))
      rnd.nextBytes(b)
      def hex = b.map(x => f"${x & 0xFF}%02x").mkString(" ")
      def cps(s: String) = s.map(c => f"${c.toInt}%04x").mkString(",")
      b(0) = 0xFF.toByte; b(1) = 0xFE.toByte
      val ml = Charsets.decodeOrNull(b).text
      val jl = jdk("UTF-16LE", b, 2)
      assert(ml === jl, s"LE [$hex] mine=${cps(ml)} jdk=${cps(jl)}")
      b(0) = 0xFE.toByte; b(1) = 0xFF.toByte
      val mb = Charsets.decodeOrNull(b).text
      val jb = jdk("UTF-16BE", b, 2)
      assert(mb === jb, s"BE [$hex] mine=${cps(mb)} jdk=${cps(jb)}")
    }
  }

  test("UTF-8 BOM wins and is stripped; invalid tails replace like the JDK") {
    val bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    val good = bom ++ "text ✓".getBytes("UTF-8")
    val d = Charsets.decodeOrNull(good)
    assert(d.charset === "utf-8" && d.text === "text ✓")
    val bad = bom ++ Array[Byte](0x61, 0xC0.toByte, 0x62)
    val db = Charsets.decodeOrNull(bad)
    assert(db.charset === "utf-8")
    assert(db.text === jdk("UTF-8", bad, 3))
  }

  test("sniff order and edges: empty, null, ascii, utf-8 multibyte") {
    assert(Charsets.decodeOrNull(null) == null)
    val e = Charsets.decodeOrNull(Array.emptyByteArray)
    assert(e.charset === "utf-8" && e.text === "")
    val a = Charsets.decodeOrNull("plain ascii".getBytes("US-ASCII"))
    assert(a.charset === "utf-8" && a.text === "plain ascii")
    val u = Charsets.decodeOrNull("中文 déjà".getBytes("UTF-8"))
    assert(u.charset === "utf-8" && u.text === "中文 déjà")
  }

  test("expression row: code-point count counts supplementary once") {
    val r = graft.fn.CharsetSniff.rowOrNull("ab🙂".getBytes("UTF-8"))
    assert(r.getUTF8String(0).toString === "utf-8")
    assert(r.getUTF8String(1).toString === "ab🙂")
    assert(r.getInt(2) === 3)
    assert(graft.fn.CharsetSniff.rowOrNull(null) == null)
  }
}
