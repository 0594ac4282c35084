package graft

import graft.ext.{Charsets, CharsetFamilies}
import java.nio.charset.{Charset, CodingErrorAction}
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ext.CharsetFamilies]] — the CharsetSpec discipline
  * extended to the legacy families: JDK-encoder-generated
  * well-formed inputs decoded byte-for-byte against the JDK's own
  * decoders (boundary disagreements in OUR state machines surface as
  * parity failures — the mapping tables are JDK-derived, the
  * lead/trail structure is not), hand-pinned anchors that are
  * independent of the JDK entirely, and the malformed-input contract
  * (prepend rule, truncated tails, never-throw) the JDK can't
  * express.
  */
class CharsetFamiliesSpec extends AnyFunSuite {

  private def jdk(name: String, b: Array[Byte]): String = {
    val dec = Charset.forName(name).newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(b)).toString
  }

  // canonical → (JDK charset backing it, a pangram-ish seed of
  // in-charset chars used to generate well-formed random inputs)
  private val Families: Seq[(String, String, String)] = Seq(
    ("shift_jis", "windows-31j", "abcあいうえお漢字カナ日本語テスト012 ｱｲｳ"),
    ("euc-jp", "EUC-JP", "abc日本語のテキストあいうえお漢字xyz ｶﾅ"),
    ("gbk", "GBK", "abc中文文本汉字测试012去来 xyz€"),
    ("big5", "Big5", "abc中文測試漢字繁體 xyz012"),
    ("euc-kr", "x-windows-949", "abc한국어 텍스트 테스트 xyz012"),
    ("koi8-r", "KOI8-R", "abc привет русский текст xyz Ёё"),
    ("koi8-u", "KOI8-U", "abc мова текст українська ҐґЄє"),
    ("iso-8859-2", "ISO-8859-2", "abc čžšěřůłą xyz"),
    ("iso-8859-5", "ISO-8859-5", "abc мир текст Ёжз xyz"),
    ("iso-8859-7", "ISO-8859-7", "abc αβγδε κείμενο ΩΣ xyz"),
    ("iso-8859-8", "ISO-8859-8", "abc שלום טקסט xyz"),
    ("iso-8859-15", "ISO-8859-15", "abc €ŠšŽžŒœŸ café xyz"),
    ("windows-1250", "windows-1250", "abc řůčž €„“ xyz"),
    ("windows-1251", "windows-1251", "abc Привет текст €„“ xyz"),
    ("windows-1254", "windows-1254", "abc ğşİı çö €„“ xyz"),
    ("windows-1256", "windows-1256", "abc مرحبا نص €„“ xyz"),
    // round-12 registry completion
    ("iso-8859-3", "ISO-8859-3", "abc ĉirkaŭ ĝis ĥoro ŝi xyz"),
    ("iso-8859-4", "ISO-8859-4", "abc āēīūņķļ žšc xyz"),
    ("iso-8859-6", "ISO-8859-6", "abc مرحبا نص عربي xyz"),
    ("iso-8859-13", "ISO-8859-13", "abc ąčęėįšųū žiema xyz"),
    ("iso-8859-16", "ISO-8859-16", "abc șțăâî română €xyz"),
    ("windows-874", "x-windows-874", "abc ไทย ทดสอบ xyz"),
    ("windows-1253", "windows-1253", "abc αβγ κείμενο € xyz"),
    ("windows-1255", "windows-1255", "abc שלום טקסט ₪€ xyz"),
    ("windows-1257", "windows-1257", "abc ąčęėįšųū € xyz"),
    ("windows-1258", "windows-1258", "abc việt nam € xyz"),
    ("ibm866", "IBM866", "abc привет текст xyz"),
    ("macintosh", "x-MacRoman", "abc café déjà vu xyz"),
    ("x-mac-cyrillic", "x-MacCyrillic", "abc привет мир xyz"))

  test("well-formed inputs decode byte-for-byte like the JDK, every family") {
    val rnd = new scala.util.Random(42)
    for ((canon, jdkName, seed) <- Families) {
      val enc = Charset.forName(jdkName)
      for (trial <- 0 until 300) {
        val len = rnd.nextInt(40)
        val s = new StringBuilder
        (0 until len).foreach(_ => s.append(seed.charAt(rnd.nextInt(seed.length))))
        val bytes = s.toString.getBytes(enc)
        val mine = CharsetFamilies.decodeCanonical(bytes, 0, canon)
        val theirs = jdk(jdkName, bytes)
        assert(mine === theirs,
          s"$canon trial $trial bytes=${bytes.map(b => f"${b & 0xFF}%02x").mkString}")
      }
    }
  }

  test("iso-2022-jp: JDK-encoder parity, escape states, hand anchors") {
    // parity on JDK-encoder-generated input (escape placement is the
    // encoder's own; our state machine must track it byte-for-byte)
    val enc = Charset.forName("ISO-2022-JP")
    val seed = "abc 日本語のテキスト xyz 漢字 012"
    val rnd = new scala.util.Random(5)
    for (trial <- 0 until 300) {
      val len = rnd.nextInt(30)
      val t = new StringBuilder
      (0 until len).foreach(_ => t.append(seed.charAt(rnd.nextInt(seed.length))))
      val bytes = t.toString.getBytes(enc)
      val mine = CharsetFamilies.decodeCanonical(bytes, 0, "iso-2022-jp")
      assert(mine === jdk("ISO-2022-JP", bytes), s"trial $trial")
    }
    def dec(hex: String): String = CharsetFamilies.decodeCanonical(
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray, 0, "iso-2022-jp")
    assert(dec("1B2442467C4B5C1B2842") === "日本")
    // ESC ( I half-width katakana (the WHATWG state the JDK encoder
    // never emits): 0x21 → U+FF61, 0x31 → U+FF71
    assert(dec("1B28492131") === "｡ｱ")
    // ESC ( J Roman: 5C → yen, 7E → overline
    assert(dec("1B284A5C7E61") === "¥‾a")
    // unknown escape: one FFFD, re-process after ESC
    assert(dec("1B2858") === "�(X")
    // truncated 0208 pair and state-invalid bytes never throw
    assert(dec("1B244246") === "�")
    assert(dec("1B24428080") === "��")
  }

  test("gb18030: JDK parity incl. 4-byte, supplementary, structure errors") {
    val enc = Charset.forName("GB18030")
    val seed = "abc 中文文本汉字 xyz €ḿ𝄞 012"
    val rnd = new scala.util.Random(6)
    for (trial <- 0 until 300) {
      val len = rnd.nextInt(30)
      val t = new StringBuilder
      (0 until len).foreach(_ => t.append(seed.charAt(rnd.nextInt(seed.length))))
      val str = t.toString
      val bytes = str.getBytes(enc)
      val mine = CharsetFamilies.decodeCanonical(bytes, 0, "gb18030")
      assert(mine === jdk("GB18030", bytes), s"trial $trial")
    }
    def dec(hex: String): String = CharsetFamilies.decodeCanonical(
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray, 0, "gb18030")
    assert(dec("D6D0CEC4") === "中文")
    assert(dec("A2E3") === "€")
    // the JDK implements GB18030-2022: ḿ (U+1E3F, the classic 2000
    // 4-byte anchor 8135F437) moved to the 2-byte plane
    assert(dec("A8BC") === "ḿ")
    assert(dec("81308B38") === "Ā") // 4-byte BMP under 2022
    assert(dec("9432BE34") === "𝄞") // supplementary plane via 4-byte
    // malformed 4-byte tail: FFFD then re-process from the digit
    assert(dec("81304142") === "�0AB")
    // lone 0x80 is an error in gb18030 (the gbk euro stays in gbk)
    assert(dec("80") === "�")
    assert(CharsetFamilies.decodeCanonical(Array(0x80.toByte), 0, "gbk") === "€")
    assert(CharsetFamilies.normalizeLabel("gb18030") === "gb18030")
    assert(CharsetFamilies.normalizeLabel("csiso2022jp") === "iso-2022-jp")
  }

  test("hand anchors independent of the JDK (public mapping knowledge)") {
    def dec(canon: String, hex: String): String =
      CharsetFamilies.decodeCanonical(
        hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray, 0, canon)
    assert(dec("shift_jis", "82A082A2") === "あい")
    assert(dec("shift_jis", "B1B2B3") === "ｱｲｳ") // halfwidth katakana row
    assert(dec("euc-jp", "C6FCCBDC") === "日本")
    assert(dec("euc-jp", "8EB1") === "ｱ") // SS2 katakana
    assert(dec("gbk", "D6D0CEC4") === "中文")
    assert(dec("gbk", "80") === "€") // lone 0x80 is the euro
    assert(dec("big5", "A4A4A4E5") === "中文")
    assert(dec("euc-kr", "C7D1B1B9") === "한국")
    assert(dec("koi8-r", "D0D2C9D7C5D4") === "привет")
    assert(dec("iso-8859-5", "DCD8E0") === "мир")
    assert(dec("iso-8859-7", "E1E2E3") === "αβγ")
    assert(dec("iso-8859-15", "A4") === "€")
    assert(dec("windows-1251", "CFF0E8E2E5F2") === "Привет")
    assert(dec("windows-1254", "F0FE") === "ğş")
  }

  test("malformed-input contract: prepend rule, truncated tails, never throws") {
    // Shift_JIS lead + ASCII non-trail: FFFD then the ASCII re-processed
    // (0x3A ':' is below the 0x40 trail floor so the table cell is empty)
    assert(CharsetFamilies.decodeCanonical(Array(0x82.toByte, ':'.toByte), 0,
      "shift_jis") === "�:")
    // Shift_JIS lead + 0x80 trail on an UNMAPPED cell: shift_jis is the
    // one family whose WHATWG error-prepend set is "ASCII byte or 0x80"
    // (a lone 0x80 decodes to U+0080 there), so the trail re-processes:
    // FFFD + U+0080, never one swallowed FFFD. The JIS rows are sparse,
    // so unmapped [lead, 0x80] cells exist; assert every one of them.
    locally {
      val unmapped = (0x81 to 0xFC).filter { l =>
        (l <= 0x9F || l >= 0xE0) && {
          val out = CharsetFamilies.decodeCanonical(
            Array(l.toByte, 0x80.toByte), 0, "shift_jis")
          out.nonEmpty && out.charAt(0) == '�'
        }
      }
      assert(unmapped.nonEmpty, "expected at least one unmapped [lead,0x80]")
      unmapped.foreach { l =>
        assert(CharsetFamilies.decodeCanonical(Array(l.toByte, 0x80.toByte), 0,
          "shift_jis") === "�", s"lead $l")
      }
    }
    // truncated multi-byte tail: one FFFD
    assert(CharsetFamilies.decodeCanonical(Array(0x82.toByte), 0, "shift_jis") === "�")
    assert(CharsetFamilies.decodeCanonical(Array(0xA4.toByte), 0, "euc-jp") === "�")
    // GBK invalid trail 0x7F: FFFD + DEL re-processed
    assert(CharsetFamilies.decodeCanonical(Array(0x81.toByte, 0x7F.toByte), 0,
      "gbk") === "�")
    // high trail on an unmapped cell consumes both bytes as one FFFD
    assert(CharsetFamilies.decodeCanonical(Array(0xA0.toByte, 0xA0.toByte), 0,
      "big5").forall(_ == '�'))
    // random garbage never throws, for every family
    val rnd = new scala.util.Random(7)
    for ((canon, _, _) <- Families; _ <- 0 until 100) {
      val b = new Array[Byte](rnd.nextInt(32))
      rnd.nextBytes(b)
      val out = CharsetFamilies.decodeCanonical(b, 0, canon)
      assert(out != null && out.length <= b.length)
    }
  }

  test("registry boundary: replacement labels, intentional absences (round 12)") {
    // WHATWG maps the stateful XSS-vector codings to `replacement`:
    // one U+FFFD for any non-empty stream, empty for empty
    Seq("iso-2022-kr", "csiso2022kr", "hz-gb-2312", "iso-2022-cn",
        "iso-2022-cn-ext", "replacement").foreach { l =>
      assert(CharsetFamilies.normalizeLabel(l) === "replacement", l)
    }
    assert(CharsetFamilies.decodeCanonical(
      "anything at all".getBytes("ISO-8859-1"), 0, "replacement") === "�")
    assert(CharsetFamilies.decodeCanonical(Array.emptyByteArray, 0,
      "replacement") === "")
    // a replacement-label header drives the full chain to one U+FFFD
    val viaChain = CharsetFamilies.detectDecode(
      "text/html; charset=iso-2022-kr", "<html>body</html>".getBytes("ISO-8859-1"))
    assert(viaChain != null && viaChain.charset === "replacement")
    assert(viaChain.text === "�")
    // the two registry rows with NO in-environment mapping source:
    // labels fail normalization and fall through to the sniff chain
    Seq("iso-8859-10", "latin6", "iso-8859-14", "iso-ir-199").foreach { l =>
      assert(CharsetFamilies.normalizeLabel(l) === null, l)
      val d = CharsetFamilies.detectDecode(s"text/html; charset=$l",
        "plain ascii body".getBytes("ISO-8859-1"))
      assert(d != null && d.charset === "utf-8", s"$l must fall through to sniff")
    }
    // new round-12 single-byte labels normalize
    assert(CharsetFamilies.normalizeLabel("tis-620") === "windows-874")
    assert(CharsetFamilies.normalizeLabel("cp866") === "ibm866")
    assert(CharsetFamilies.normalizeLabel("x-mac-roman") === "macintosh")
    assert(CharsetFamilies.normalizeLabel("x-mac-ukrainian") === "x-mac-cyrillic")
    assert(CharsetFamilies.normalizeLabel("asmo-708") === "iso-8859-6")
  }

  test("label normalization: WHATWG aliases, whitespace, case, unknowns") {
    assert(CharsetFamilies.normalizeLabel("  SJIS \t") === "shift_jis")
    assert(CharsetFamilies.normalizeLabel("Shift-JIS") === "shift_jis")
    assert(CharsetFamilies.normalizeLabel("x-sjis") === "shift_jis")
    assert(CharsetFamilies.normalizeLabel("GB2312") === "gbk")
    assert(CharsetFamilies.normalizeLabel("ISO-8859-1") === "windows-1252")
    assert(CharsetFamilies.normalizeLabel("us-ascii") === "windows-1252")
    assert(CharsetFamilies.normalizeLabel("latin5") === "windows-1254")
    assert(CharsetFamilies.normalizeLabel("ISO-8859-9") === "windows-1254")
    assert(CharsetFamilies.normalizeLabel("latin9") === "iso-8859-15")
    assert(CharsetFamilies.normalizeLabel("windows-949") === "euc-kr")
    assert(CharsetFamilies.normalizeLabel("UTF-16") === "utf-16le")
    assert(CharsetFamilies.normalizeLabel("x-user-defined") === "windows-1252")
    assert(CharsetFamilies.normalizeLabel("iso-2022-jp") === "iso-2022-jp")
    assert(CharsetFamilies.normalizeLabel("utf-7") === null)
    assert(CharsetFamilies.normalizeLabel("") === null)
    assert(CharsetFamilies.normalizeLabel(null) === null)
  }

  test("Content-Type charset parameter extraction") {
    import CharsetFamilies.headerCharset
    assert(headerCharset("text/html; charset=utf-8") === "utf-8")
    assert(headerCharset("text/html;charset=Shift_JIS") === "Shift_JIS")
    assert(headerCharset("text/html; CHARSET=\"euc-kr\"") === "euc-kr")
    assert(headerCharset("text/html; boundary=x; charset=gbk; q=1") === "gbk")
    assert(headerCharset("text/html") === null)
    assert(headerCharset("text/html; charsetx=koi8-r") === null)
    assert(headerCharset(null) === null)
  }

  test("meta prescan: charset attr, http-equiv, comments, quotes, 1024 cap") {
    def pre(html: String): String =
      CharsetFamilies.metaPrescan(html.getBytes("ISO-8859-1"))
    assert(pre("""<html><head><meta charset="shift_jis"></head>""") === "shift_jis")
    assert(pre("""<META CHARSET=EUC-KR>""") === "euc-kr")
    assert(pre("""<meta http-equiv="Content-Type" content="text/html; charset=gbk">""") === "gbk")
    assert(pre("""<meta content="text/html; charset=big5" http-equiv="content-type">""") === "big5")
    // charset attr overrides content-derived; pragma content needs http-equiv
    assert(pre("""<meta content="text/html; charset=gbk" charset="koi8-r">""") === "koi8-r")
    assert(pre("""<meta content="text/html; charset=gbk">""") === null)
    // comments are skipped, even containing meta
    assert(pre("""<!-- <meta charset="gbk"> --><meta charset="euc-jp">""") === "euc-jp")
    // utf-16 labels resolve to utf-8 in meta position (HTML §13.2)
    assert(pre("""<meta charset="utf-16le">""") === "utf-8")
    // beyond the 1024-byte window: not seen
    assert(pre(("x" * 1100) + """<meta charset="gbk">""") === null)
    // unknown labels fall through (do not abort the scan)
    assert(pre("""<meta charset="utf-7"><meta charset="sjis">""") === "shift_jis")
    // <meta> with no ws/slash after the name is not a prescan meta
    assert(pre("""<metacharset="gbk">""") === null)
  }

  test("authority chain: BOM > header > meta > utf-8 sniff > 1252") {
    import CharsetFamilies.detectDecode
    val sjis = "あい doc".getBytes("windows-31j")
    // header wins over meta
    val withMeta = ("""<meta charset="gbk">""").getBytes("ISO-8859-1") ++ sjis
    val d1 = detectDecode("text/html; charset=sjis", withMeta)
    assert(d1.charset === "shift_jis")
    assert(d1.text.contains("あい doc"))
    // meta wins when the header has no param
    val d2 = detectDecode("text/html",
      ("""<meta charset="shift_jis">""").getBytes("ISO-8859-1") ++ sjis)
    assert(d2.charset === "shift_jis" && d2.text.contains("あい doc"))
    // BOM beats even an explicit header label
    val bomed = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "x".getBytes
    assert(detectDecode("text/html; charset=koi8-r", bomed).charset === "utf-8")
    // no declarations: strict-utf8 then 1252, same as charset_sniff
    assert(detectDecode("text/html", "plain".getBytes).charset === "utf-8")
    val high = Array(0x63.toByte, 0xE9.toByte)
    assert(detectDecode("text/html", high).charset === "windows-1252")
    assert(detectDecode("text/html", high).text === "cé")
    assert(detectDecode(null, "plain".getBytes).charset === "utf-8")
    assert(detectDecode("text/html", null) == null)
  }

  test("decodeLabeled: BOM first, label routing, unknown-label fallback") {
    import CharsetFamilies.decodeLabeled
    val d = decodeLabeled("euc-kr", "한국 x".getBytes("x-windows-949"))
    assert(d.charset === "euc-kr" && d.text === "한국 x")
    val fallback = decodeLabeled("no-such-charset", "plain".getBytes)
    assert(fallback.charset === "utf-8" && fallback.text === "plain")
    val bomed = decodeLabeled("gbk",
      Array(0xFF.toByte, 0xFE.toByte) ++ "hi".getBytes("UTF-16LE"))
    assert(bomed.charset === "utf-16le" && bomed.text === "hi")
  }

  test("expression kernels: charset_decode and charset_detect rows") {
    val r = graft.fn.CharsetDecode.rowOrNull("sjis", "あ".getBytes("windows-31j"))
    assert(r.getUTF8String(0).toString === "shift_jis")
    assert(r.getUTF8String(1).toString === "あ")
    assert(r.getInt(2) === 1)
    // empty label means "no label" → sniff path
    val s = graft.fn.CharsetDecode.rowOrNull("", "plain".getBytes)
    assert(s.getUTF8String(0).toString === "utf-8")
    val t = graft.fn.CharsetDetect.rowOrNull("text/html; charset=gbk",
      "中文".getBytes("GBK"))
    assert(t.getUTF8String(0).toString === "gbk")
    assert(t.getUTF8String(1).toString === "中文")
    assert(graft.fn.CharsetDetect.rowOrNull("", null) == null)
  }
}
