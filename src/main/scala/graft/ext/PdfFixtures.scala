package graft.ext

import scala.collection.mutable

/** Deterministic PDF corpus for the [[Pdf]] reader — the engine
  * WRITES the documents it extracts (the q132 WARC / q148 Vorbis
  * synthesize-your-own-fixture loop): every byte derives from
  * `doc_id` by closed forms a SQL oracle replays with string
  * arithmetic, and the writer exercises each supported structure
  * axis so a defect in ANY layer breaks the q151 hash.
  *
  * Variants by `doc_id % 4`:
  *   0. classic xref table, UNCOMPRESSED content streams, 1–2 pages,
  *      WinAnsiEncoding with high-byte text (é = \351, € = \200) and
  *      octal escapes — gates the classic table walk, the literal-
  *      string parser, the WinAnsi table, and the page tree
  *   1. classic xref + compressed content (FlateDecode; round 13:
  *      ids ≡ 5 (mod 8) route through LZWDecode — the scanned-PDF
  *      filter — with the same text closed forms), TJ kerning arrays
  *      with gaps on both sides of the −200 word-gap threshold,
  *      escaped parens + octal \101 — gates inflate, LZW, and TJ
  *      semantics
  *   2. PDF 1.5 layout: cross-reference STREAM (/W [1 4 2],
  *      /Predictor 12 PNG-Up) + object stream holding the document
  *      dicts + a Type0/Identity-H font with a /ToUnicode CMap
  *      (bfchar + bfrange) shown via a hex string — gates the xref-
  *      stream decoder, the predictor, ObjStm extraction, and the
  *      2-byte CMap path
  *   3. classic xref, /Contents ARRAY of two Flate streams, the '
  *      and " text operators, /Info /Title — gates stream
  *      concatenation, the quote operators, and metadata
  *
  * The `expected*` mirrors are the same closed forms in Scala, used
  * by PdfSpec; q151's DuckDB oracle re-states them in SQL.
  */
object PdfFixtures {

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  /** per-thread Deflater (see [[Pdf.inflate]]'s note: per-row native
    * allocations serialize wide executors)
    */
  private val TlDeflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater()
  }

  private def flate(data: Array[Byte]): Array[Byte] = {
    val d = TlDeflater.get()
    d.reset()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 16)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    out.toByteArray
  }

  /** Standard-security-handler parameters for the encrypting writer
    * (round 14): the reader never checks /O — it only feeds the key
    * derivation — so the writer picks deterministic /O bytes, derives
    * the empty-user-password key with the READER'S OWN published
    * algorithms ([[Pdf.PdfCrypt]]), and computes a matching /U. A
    * derivation defect on either side breaks the round-trip.
    * kind: 0 = RC4-40 (V1/R2), 1 = RC4-128 (V2/R3), 2 = AES-128-CBC
    * (V4/R4, AESV2 crypt filter).
    */
  private[graft] final case class Enc(kind: Int, docId: Long) {
    import Pdf.PdfCrypt
    val fileId: Array[Byte] = PdfCrypt.md5(s"graft-pdf-id-$docId".getBytes)
    val p: Int = -44
    val o: Array[Byte] = PdfCrypt.md5(s"graft-owner-$docId".getBytes) ++
      PdfCrypt.md5(s"graft-owner-b-$docId".getBytes)
    val r: Int = kind match { case 0 => 2; case 1 => 3; case _ => 4 }
    private val keyLen = if (kind == 0) 5 else 16
    val key: Array[Byte] =
      PdfCrypt.computeKey(o, p, fileId, r, keyLen, encryptMetadata = true)
    val u: Array[Byte] =
      if (r == 2) PdfCrypt.rc4(key, PdfCrypt.Pad)
      else {
        var x = PdfCrypt.rc4(key, PdfCrypt.md5(PdfCrypt.Pad, fileId))
        var i = 1
        while (i <= 19) { x = PdfCrypt.rc4(key.map(b => (b ^ i).toByte), x); i += 1 }
        x ++ new Array[Byte](16) // 32 bytes; only the first 16 compare
      }

    def encrypt(data: Array[Byte], num: Int): Array[Byte] = {
      val salt =
        if (kind == 2) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.emptyByteArray
      val ok = PdfCrypt.md5(key,
        Array[Byte]((num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
          ((num >> 16) & 0xFF).toByte, 0, 0), salt)
      val objKey = java.util.Arrays.copyOf(ok, math.min(keyLen + 5, 16))
      if (kind == 2) {
        val iv = java.util.Arrays.copyOf(
          PdfCrypt.md5(s"graft-iv-$docId-$num".getBytes), 16)
        val padN = 16 - (data.length % 16)
        val padded = java.util.Arrays.copyOf(data, data.length + padN)
        java.util.Arrays.fill(padded, data.length, padded.length, padN.toByte)
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.ENCRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(objKey, "AES"),
          new javax.crypto.spec.IvParameterSpec(iv))
        iv ++ c.doFinal(padded)
      } else PdfCrypt.rc4(objKey, data)
    }

    private def hex(b: Array[Byte]): String =
      "<" + b.map(x => f"${x & 0xFF}%02X").mkString + ">"

    def dictBody: String = {
      val ou = s"/O ${hex(o)} /U ${hex(u)} /P $p"
      kind match {
        case 0 => s"<< /Filter /Standard /V 1 /R 2 $ou >>"
        case 1 => s"<< /Filter /Standard /V 2 /R 3 /Length 128 $ou >>"
        case _ => "<< /Filter /Standard /V 4 /R 4 /Length 128 " +
          "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >> " +
          s"/StmF /StdCF /StrF /StdCF $ou >>"
      }
    }

    def trailerExtra(encNum: Int): String =
      s" /Encrypt $encNum 0 R /ID [ ${hex(fileId)} ${hex(fileId)} ]"
  }

  /** classic-xref document assembler; pass `enc` to emit the document
    * under the standard security handler (streams and literal strings
    * written through [[Enc.encrypt]], /Encrypt + /ID in the trailer)
    */
  private final class Classic(enc: Enc = null) {
    private val out = new java.io.ByteArrayOutputStream()
    private val offsets = mutable.TreeMap.empty[Int, Int]
    raw("%PDF-1.4\n%âãÏÓ\n")

    def raw(s: String): Unit = out.write(s.getBytes(Latin1))

    def obj(num: Int, body: String): Unit = {
      offsets(num) = out.size
      raw(s"$num 0 obj\n$body\nendobj\n")
    }

    /** a literal-string token for `s`, encrypted with the containing
      * object's key when the document is encrypted (escaped so any
      * ciphertext byte survives the lexer)
      */
    def lit(s: String, objNum: Int): String = {
      val plain = s.getBytes(Latin1)
      val bytes = if (enc == null) plain else enc.encrypt(plain, objNum)
      val sb = new StringBuilder("(")
      bytes.foreach { b =>
        val v = b & 0xFF
        if (v == '(' || v == ')' || v == '\\') sb.append('\\').append(v.toChar)
        else if (v >= 32 && v < 127) sb.append(v.toChar)
        else sb.append(f"\\${v}%03o")
      }
      sb.append(")").toString
    }

    def streamObj(num: Int, extraDict: String, data: Array[Byte]): Unit = {
      offsets(num) = out.size
      val body = if (enc == null) data else enc.encrypt(data, num)
      raw(s"$num 0 obj\n<< $extraDict/Length ${body.length} >>\nstream\n")
      out.write(body)
      raw("\nendstream\nendobj\n")
    }

    def finish(rootNum: Int, infoNum: Int = -1): Array[Byte] = {
      var encExtra = ""
      if (enc != null) {
        val encNum = offsets.keys.max + 1
        obj(encNum, enc.dictBody) // plaintext by definition
        encExtra = enc.trailerExtra(encNum)
      }
      val xrefOff = out.size
      val maxNum = offsets.keys.max
      raw(s"xref\n0 ${maxNum + 1}\n")
      raw("0000000000 65535 f\r\n")
      (1 to maxNum).foreach { n =>
        raw(f"${offsets.getOrElse(n, 0)}%010d 00000 n\r\n")
      }
      val info = if (infoNum > 0) s" /Info $infoNum 0 R" else ""
      raw(s"trailer\n<< /Size ${maxNum + 1} /Root $rootNum 0 R$info$encExtra >>\n")
      raw(s"startxref\n$xrefOff\n%%EOF\n")
      out.toByteArray
    }
  }

  // ---------------------------------------------------------------
  // variants
  // ---------------------------------------------------------------
  /** the encryption axis (round 14), orthogonal to the variant axis:
    * ids ≡ 0 (mod 16) → RC4-128 over v0, ≡ 1 → AES-128 over v1
    * (string + stream + Flate composition), ≡ 3 → RC4-40 over v3
    * (whose /Title string exercises STRING decryption). Text/pages/
    * title closed forms are untouched — decryption is transparent —
    * and n_objects grows by the Encrypt dict.
    */
  private def encFor(id: Long): Enc = (id % 16) match {
    case 0 => Enc(1, id)
    case 1 => Enc(2, id)
    case 3 => Enc(0, id)
    case _ => null
  }

  private def v0(id: Long): Array[Byte] = {
    // id % 4 == 0 selects this variant, so page count derives from
    // id/4 (id % 2 would be constant-even here)
    val pages = 1 + ((id / 4) % 2).toInt
    // ids == 4 (mod 16): an /Encoding dict with /Differences REMAPPING
    // codes 128/129 away from WinAnsi (to /bullet and the AGL uniXXXX
    // form) — round 14's simple-font encoding-override arm; the text
    // closed form changes visibly so an ignored override breaks q151
    val diffs = id % 16 == 4
    val b = new Classic(encFor(id))
    val kids = (0 until pages).map(p => s"${4 + 2 * p} 0 R").mkString(" ")
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.obj(2, s"<< /Type /Pages /Kids [ $kids ] /Count $pages >>")
    val enc =
      if (diffs)
        "/Encoding << /BaseEncoding /WinAnsiEncoding " +
          "/Differences [ 128 /bullet /uni2603 ] >>"
      else "/Encoding /WinAnsiEncoding"
    b.obj(3, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      s"$enc >>")
    (0 until pages).foreach { p =>
      b.obj(4 + 2 * p, s"<< /Type /Page /Parent 2 0 R " +
        s"/Resources << /Font << /F1 3 0 R >> >> " +
        s"/MediaBox [ 0 0 612 792 ] /Contents ${5 + 2 * p} 0 R >>")
      val accent = if (diffs) "\\200\\201" else "\\200"
      val content =
        s"BT /F1 12 Tf 72 720 Td (Doc $id page $p) Tj " +
          s"0 -14 Td (caf\\351 $accent${id % 7}) Tj ET"
      b.streamObj(5 + 2 * p, "", content.getBytes(Latin1))
    }
    b.finish(1)
  }

  private def v1(id: Long): Array[Byte] = {
    val b = new Classic(encFor(id))
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.obj(2, "<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>")
    b.obj(3, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >>")
    b.obj(4, "<< /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 3 0 R >> >> " +
      "/MediaBox [ 0 0 612 792 ] /Contents 5 0 R >>")
    val content =
      s"BT /F1 12 Tf 72 720 Td (Doc $id \\(\\101\\)) Tj " +
        s"0 -14 TD [ (kern) -150 (ed) -250 (text ${id % 5}) ] TJ ET"
    // round 13: half of this variant routes through LZWDecode (the
    // scanned-PDF filter) — same text closed forms, so the q151
    // oracle is untouched while the LZW arm joins the hash gate
    if (id % 8 == 5)
      b.streamObj(5, "/Filter /LZWDecode ", lzw(content.getBytes(Latin1)))
    else
      b.streamObj(5, "/Filter /FlateDecode ", flate(content.getBytes(Latin1)))
    b.finish(1)
  }

  /** TIFF-variant LZW ENCODER (ISO 32000-1 §7.4.4 semantics):
    * leading ClearTable, trailing EOD, codes from 258, width 9→12
    * (`earlyChange` = 1 widens one code early, the PDF default) —
    * the test side of [[Pdf]]'s round-13 decoder and the generator
    * for the q151 LZW arm. `msb = false` packs the SAME code stream
    * LSB-first, which with an 8-bit root alphabet is byte-exact GIF
    * LZW — the in-repo cross-validator ([[Gif]]'s independently
    * golden-validated decoder replays it; PdfSpec does exactly
    * that). Emits ClearTable when the table fills.
    */
  private[graft] def lzw(data: Array[Byte], earlyChange: Int = 1,
                         msb: Boolean = true): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L
    var curBits = 0
    var width = 9
    def emit(code: Int): Unit = {
      if (msb) cur = (cur << width) | code
      else cur = cur | (code.toLong << curBits)
      curBits += width
      while (curBits >= 8) {
        if (msb) out.write(((cur >> (curBits - 8)) & 0xFF).toInt)
        else { out.write((cur & 0xFF).toInt); cur >>= 8 }
        curBits -= 8
      }
    }
    val table = mutable.HashMap.empty[Seq[Byte], Int]
    def reset(): Unit = {
      table.clear()
      var i = 0
      while (i < 256) { table(Seq(i.toByte)) = i; i += 1 }
    }
    reset()
    var next = 258
    emit(256) // leading ClearTable (the spec example's shape)
    var i = 0
    while (i < data.length) {
      // longest match starting at i
      var j = i + 1
      var seq: Seq[Byte] = Seq(data(i))
      var code = table(seq)
      while (j < data.length && table.contains(seq :+ data(j))) {
        seq = seq :+ data(j)
        code = table(seq)
        j += 1
      }
      emit(code)
      if (j < data.length) {
        if (next < 4096 - 1) {
          table(seq :+ data(j)) = next
          next += 1
          // width must match what the DECODER uses for the next code:
          // its delayed insert leaves its table ONE entry behind ours
          // at every code position, hence the −1 (earlyChange shifts
          // the boundary the other way; the GIF cross-validation in
          // PdfSpec pins this alignment against the independent
          // decoder)
          if (width < 12 && next - 1 + earlyChange >= (1 << width)) width += 1
        } else {
          emit(256) // table full: clear
          reset()
          next = 258
          width = 9
        }
      }
      i = j
    }
    emit(257) // EOD
    if (curBits > 0) {
      if (msb) out.write(((cur << (8 - curBits)) & 0xFF).toInt)
      else out.write((cur & 0xFF).toInt)
    }
    out.toByteArray
  }

  /** PNG Up (tag 2) forward filter for the xref stream rows. */
  private def pngUp(rows: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var prev = new Array[Byte](if (rows.isEmpty) 0 else rows.head.length)
    rows.foreach { r =>
      out.write(2)
      var i = 0
      while (i < r.length) { out.write((r(i) - prev(i)) & 0xFF); i += 1 }
      prev = r
    }
    out.toByteArray
  }

  private def v2(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def raw(s: String): Unit = out.write(s.getBytes(Latin1))
    raw("%PDF-1.5\n%âãÏÓ\n")

    // objects 1–4 live in the object stream (obj 7)
    val inner = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R " +
        "/Resources << /Font << /F1 4 0 R >> >> " +
        "/MediaBox [ 0 0 612 792 ] /Contents 6 0 R >>"),
      4 -> ("<< /Type /Font /Subtype /Type0 /BaseFont /GraftCJK " +
        "/Encoding /Identity-H /ToUnicode 5 0 R >>"))
    val bodies = inner.map(_._2)
    val offs = bodies.scanLeft(0)(_ + _.length + 1).init
    val header = inner.map(_._1).zip(offs)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val stmPayload = (header + bodies.mkString("\n") + "\n").getBytes(Latin1)

    val offsets = mutable.TreeMap.empty[Int, Int]
    def streamObj(num: Int, extraDict: String, data: Array[Byte]): Unit = {
      offsets(num) = out.size
      raw(s"$num 0 obj\n<< $extraDict/Length ${data.length} >>\nstream\n")
      out.write(data)
      raw("\nendstream\nendobj\n")
    }

    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin
        |begincmap
        |/CMapName /GraftToUni def
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |3 beginbfchar
        |<0041> <4E2D>
        |<0042> <6587>
        |<0020> <0020>
        |endbfchar
        |1 beginbfrange
        |<0030> <0039> <FF10>
        |endbfrange
        |endcmap
        |CMapName currentdict /CMap defineresource pop
        |end
        |end""".stripMargin
    streamObj(5, "/Filter /FlateDecode ", flate(cmap.getBytes(Latin1)))

    val d = (id % 10).toInt
    val content =
      f"BT /F1 12 Tf 72 720 Td <0041004200200030> Tj ET"
        .replace("0030", f"00${0x30 + d}%02X")
    streamObj(6, "/Filter /FlateDecode ", flate(content.getBytes(Latin1)))
    streamObj(7, s"/Type /ObjStm /N ${inner.length} /First ${header.length} ",
      stmPayload)

    // xref stream (obj 8): /W [1 4 2], rows for 0..8
    val xrefOff = out.size
    def row(t: Int, f2: Int, f3: Int): Array[Byte] = Array[Byte](
      t.toByte,
      (f2 >> 24).toByte, (f2 >> 16).toByte, (f2 >> 8).toByte, f2.toByte,
      (f3 >> 8).toByte, f3.toByte)
    val rows = Seq(
      row(0, 0, 65535), // obj 0 free
      row(2, 7, 0), row(2, 7, 1), row(2, 7, 2), row(2, 7, 3), // in ObjStm
      row(1, offsets(5), 0), row(1, offsets(6), 0), row(1, offsets(7), 0),
      row(1, xrefOff, 0)) // the xref stream itself
    val xdata = flate(pngUp(rows))
    raw(s"8 0 obj\n<< /Type /XRef /Size 9 /W [ 1 4 2 ] /Index [ 0 9 ] " +
      s"/Root 1 0 R /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Columns 7 >> " +
      s"/Length ${xdata.length} >>\nstream\n")
    out.write(xdata)
    raw("\nendstream\nendobj\n")
    raw(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  private def v3(id: Long): Array[Byte] = {
    val b = new Classic(encFor(id))
    b.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    b.obj(2, "<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>")
    b.obj(3, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >>")
    b.obj(4, "<< /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 3 0 R >> >> " +
      "/MediaBox [ 0 0 612 792 ] /Contents [ 5 0 R 6 0 R ] >>")
    val c1 = s"BT /F1 10 Tf 10 700 Td (Part ${id % 6}) Tj ET"
    val c2 = s"BT /F1 10 Tf 10 680 Td (alpha) Tj (beta ${id % 4}) ' " +
      s"0.5 0.1 (gamma ${id % 3}) \" ET"
    b.streamObj(5, "/Filter /FlateDecode ", flate(c1.getBytes(Latin1)))
    b.streamObj(6, "/Filter /FlateDecode ", flate(c2.getBytes(Latin1)))
    b.obj(7, s"<< /Title ${b.lit(s"Graft Doc $id", 7)} " +
      s"/Producer ${b.lit("graft", 7)} >>")
    b.finish(1, infoNum = 7)
  }

  /** the deterministic document for `doc_id` */
  def pdf(id: Long): Array[Byte] = ((id % 4).toInt: @unchecked) match {
    case 0 => v0(id)
    case 1 => v1(id)
    case 2 => v2(id)
    case 3 => v3(id)
  }

  // ---------------------------------------------------------------
  // closed-form mirrors (PdfSpec; q151's oracle re-states them in SQL)
  // ---------------------------------------------------------------
  def expectedText(id: Long): String = (id % 4).toInt match {
    case 0 =>
      val accent = if (id % 16 == 4) "•☃" else "€" // the /Differences arm
      (0 until (1 + ((id / 4) % 2).toInt))
        .map(p => s"Doc $id page $p\ncafé $accent${id % 7}").mkString("\n")
    case 1 => s"Doc $id (A)\nkerned text ${id % 5}"
    case 2 => "中文 " + (0xFF10 + (id % 10).toInt).toChar
    case _ => s"Part ${id % 6}\nalpha\nbeta ${id % 4}\ngamma ${id % 3}"
  }

  def expectedPages(id: Long): Int =
    if (id % 4 == 0) 1 + ((id / 4) % 2).toInt else 1

  def expectedObjects(id: Long): Int = {
    val base = (id % 4).toInt match {
      case 0 => 3 + 2 * (1 + ((id / 4) % 2).toInt)
      case 1 => 5
      case 2 => 8
      case _ => 7
    }
    // the Encrypt dict itself (the id % 16 encryption axis)
    base + (if (id % 16 == 0 || id % 16 == 1 || id % 16 == 3) 1 else 0)
  }

  def expectedTitle(id: Long): String =
    if (id % 4 == 3) s"Graft Doc $id" else ""
}
