package graft.ext

/** Minimal-but-conformant VP8L WRITER for gray images — the fixture
  * source for q84's WebP plants (the PdfFixtures convention: the
  * engine writes the assets it decodes; [[WebpVp8l]] and libwebp both
  * read these streams).
  *
  * Encoding strategy (fixed, deterministic):
  *   - SUBTRACT_GREEN transform → red/blue residuals are constant 0
  *     and alpha is constant 255, so those three channels are
  *     0-bit single-symbol codes
  *   - green carries the gray value through a complete fixed-length
  *     8-bit canonical code (all 256 literals at length 8, emitted
  *     with a degenerate 0-bit code-length code + the max-symbol cap
  *     — canonical assignment then maps symbol v to codeword v)
  *   - no LZ77, no color cache: 8 bits per pixel exactly
  */
object WebpFixtures {

  private final class Bw {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    /** n bits of v, LSB-first (the VP8L stream convention) */
    def bits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        i += 1
      }
    }
    /** canonical codeword bits are written MSB-first */
    def code(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bits((v >> i) & 1, 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (nBits > 0) { out.write(cur); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  /** one-symbol simple code (reads consume 0 bits) */
  private def simpleSingle(bw: Bw, symbol: Int): Unit = {
    bw.bits(1, 1) // simple
    bw.bits(0, 1) // 1 symbol
    bw.bits(1, 1) // 8-bit form
    bw.bits(symbol, 8)
  }

  /** the fixed 8-bit literal code over symbols 0..255: a degenerate
    * single-symbol code-length code (symbol 8 sits at position 11 of
    * kCodeLengthCodeOrder = {17,18,0,1,2,3,4,5,16,6,7,8,…}, so emit
    * 12 clc lengths — eleven 0s then a nonzero) makes every length
    * read free, and the max-symbol cap stops after 256 → a COMPLETE
    * fixed code whose canonical codeword for symbol v is v itself
    */
  private def fixed8Code(bw: Bw): Unit = {
    bw.bits(0, 1)      // normal code
    bw.bits(12 - 4, 4) // num_code_lengths = 12
    var i = 0
    while (i < 11) { bw.bits(0, 3); i += 1 }
    bw.bits(1, 3)      // order slot 11 = symbol 8 → nonzero
    // clc is now the degenerate single-symbol code returning 8 for
    // free; cap the symbol loop at 256 so lengths are: 0..255 → 8,
    // 256.. → 0 (a COMPLETE fixed 8-bit code, codeword(v) = v)
    bw.bits(1, 1)      // use max-symbol
    bw.bits(3, 3)      // length_nbits = 2 + 2*3 = 8
    bw.bits(254, 8)    // max_symbol = 2 + 254 = 256
  }

  /** encode a row-major gray plane ([0,255] ints) as a lossless WebP */
  def encodeGray(gray: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && gray.length == w * h)
    val bw = new Bw
    bw.bits(0x2F, 8)   // VP8L signature
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(0, 1)      // alpha hint
    bw.bits(0, 3)      // version
    bw.bits(1, 1)      // transform present
    bw.bits(2, 2)      // SUBTRACT_GREEN
    bw.bits(0, 1)      // no more transforms
    bw.bits(0, 1)      // no color cache
    bw.bits(0, 1)      // no meta prefix codes
    fixed8Code(bw)     // green: fixed 8-bit literals
    simpleSingle(bw, 0)   // red residual ≡ 0
    simpleSingle(bw, 0)   // blue residual ≡ 0
    simpleSingle(bw, 255) // alpha ≡ 255
    simpleSingle(bw, 1)   // distance (never used)
    var i = 0
    while (i < gray.length) {
      val v = gray(i) & 0xFF
      bw.code(v, 8) // canonical codeword of symbol v IS v
      i += 1
    }
    val payload = bw.toBytes
    // RIFF container
    val out = new java.io.ByteArrayOutputStream(payload.length + 20)
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    out.write("RIFF".getBytes); le32(4 + 8 + payload.length + (payload.length & 1))
    out.write("WEBP".getBytes)
    out.write("VP8L".getBytes); le32(payload.length)
    out.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }
}
