package graft.ext

import scala.util.control.NonFatal

/** Brotli (RFC 7932) decoder — hand-written from the public spec,
  * extending [[graft.io.Warc]]'s HTTP content-coding set with the
  * web's dominant modern coding (VERDICT r11 item 3: the classpath
  * probe found NO JVM brotli artifact, but the environment upgrades
  * the build-vs-defer verdict to BUILD — see BENCH_NOTES r12).
  *
  * Structure coverage (full RFC 7932):
  *   - stream header WBITS (incl. the 10–15 and 17 long forms)
  *   - metablock headers: ISLAST/ISLASTEMPTY, MNIBBLES,
  *     metadata-skip blocks, ISUNCOMPRESSED raw blocks
  *   - prefix codes: simple (1–4 symbols, tree-select, libbrotli's
  *     symbol-ordering rules) and complex (the {1,2,3,4,0,5,17,6,16,
  *     7,…} code-length order, the fixed {2,4,3,2,2,4} code-length-
  *     code, HSKIP, 16/17 repeats with the accumulation rule,
  *     32768-space completeness, 0-bit single-symbol codes)
  *   - block switching in all three categories (type codes with the
  *     prev/+1 specials, the 26-symbol block-count code)
  *   - context modeling: 4 literal context modes over the published
  *     2,048-byte lookup (deployment data, `data/brotli_context_lut
  *     .bin`), 64-context literal maps and 4-context distance maps
  *     with RLE zero-runs and inverse move-to-front
  *   - distances: the 16 short codes over the {16,15,11,4} ring
  *     buffer, NDIRECT/NPOSTFIX parameterized long codes
  *   - the STATIC DICTIONARY: the 122,784-byte table (deployment
  *     data extracted from the system's own libbrotli and REQUIRED
  *     at load to hash to the SHA-256 printed in RFC 7932 §8) with
  *     all 121 word transforms (prefix/op/suffix table derived
  *     behaviorally against the system brotli — scripts/
  *     make_brotli_data.py — incl. the UTF-8-aware ferment ops)
  *
  * Validation (BrotliSpec): 27 golden .br/.raw pairs compressed by
  * the system brotli at qualities 0–11 over text/binary/repetitive/
  * mixed corpora (quality 10–11 exercises dictionary references,
  * context maps, MTF, block switching), byte-exact; truncation/
  * bit-flip/garbage never-throw. Bounded-and-total: output capped,
  * every loop guarded, malformed input returns null.
  */
object Brotli {

  private val MaxOut = 1 << 28

  // ---------------------------------------------------------------
  // deployment data (the PSL/charset-table convention)
  // ---------------------------------------------------------------
  private def slurp(path: String): Array[Byte] = {
    val f = new java.io.File(path)
    java.nio.file.Files.readAllBytes(f.toPath)
  }

  /** RFC 7932 §8's published dictionary hash — load fails loudly on
    * a corrupted snapshot
    */
  private lazy val Dict: Array[Byte] = {
    val d = slurp("data/brotli_dict.bin")
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(d)
    val hex = sha.map(b => f"${b & 0xFF}%02x").mkString
    require(hex == "20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70",
      s"brotli dictionary snapshot hash mismatch: $hex")
    d
  }

  private lazy val CtxLut: Array[Byte] = {
    val d = slurp("data/brotli_context_lut.bin")
    require(d.length == 2048, "context lut must be 2048 bytes")
    d
  }

  /** (prefix, op, suffix) per transform id; op ∈ I, UF, UA, OFk, OLk */
  private lazy val Transforms: Array[(Array[Byte], String, Array[Byte])] = {
    def unesc(s: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '\\' && i + 3 < s.length && s.charAt(i + 1) == 'x') {
          out.write(Integer.parseInt(s.substring(i + 2, i + 4), 16))
          i += 4
        } else { out.write(s.charAt(i).toInt); i += 1 }
      }
      out.toByteArray
    }
    val rows = scala.io.Source.fromFile("data/brotli_transforms.dat", "UTF-8")
      .getLines().filterNot(l => l.startsWith("#") || l.isEmpty).toArray
    require(rows.length == 121, s"expected 121 transforms, got ${rows.length}")
    rows.map { l =>
      val parts = l.split("\t", -1)
      (unesc(parts(1)), parts(2), unesc(parts(3)))
    }
  }

  /** dictionary bucket geometry — consistent with the extracted
    * offsets (Σ len << bits == 122,784, checked at load)
    */
  private val SizeBits = Array(0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10,
    10, 9, 9, 8, 7, 7, 8, 7, 7, 6, 6, 5, 5)
  private lazy val DictOffsets: Array[Int] = {
    val o = new Array[Int](26)
    var l = 4
    while (l <= 24) { o(l + 1) = o(l) + (l << SizeBits(l)); l += 1 }
    require(o(25) == 122784, "dictionary geometry mismatch")
    o
  }
  // ---------------------------------------------------------------
  // bit reader
  // ---------------------------------------------------------------
  private final class Br(val b: Array[Byte]) {
    var bitPos: Long = 0
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bi = (bitPos >>> 3).toInt
        if (bi >= b.length) sys.error("bitstream overrun")
        v |= ((b(bi) >> (bitPos & 7).toInt) & 1) << i
        bitPos += 1
        i += 1
      }
      v
    }
    def bit(): Int = bits(1)
    def align(): Unit = {
      while ((bitPos & 7) != 0) {
        if (bit() != 0) sys.error("nonzero padding")
      }
    }
    def byteAt: Int = (bitPos >>> 3).toInt
  }

  // ---------------------------------------------------------------
  // prefix codes (canonical, MSB-first walk like DEFLATE)
  // ---------------------------------------------------------------
  private final class Tree {
    var child0 = new Array[Int](64)
    var child1 = new Array[Int](64)
    var symbol = new Array[Int](64)
    var nNodes = 1
    var single = -1
    java.util.Arrays.fill(child0, -1); java.util.Arrays.fill(child1, -1)
    java.util.Arrays.fill(symbol, -1)

    private def grow(): Unit = {
      val n2 = nNodes * 2
      child0 = java.util.Arrays.copyOf(child0, n2)
      child1 = java.util.Arrays.copyOf(child1, n2)
      symbol = java.util.Arrays.copyOf(symbol, n2)
      java.util.Arrays.fill(child0, nNodes, n2, -1)
      java.util.Arrays.fill(child1, nNodes, n2, -1)
      java.util.Arrays.fill(symbol, nNodes, n2, -1)
    }

    def insert(code: Int, len: Int, sym: Int): Unit = {
      var node = 0
      var i = len - 1
      while (i >= 0) {
        val bit = (code >> i) & 1
        if (nNodes + 1 > symbol.length) grow()
        val kids = if (bit == 0) child0 else child1
        if (kids(node) < 0) { kids(node) = nNodes; nNodes += 1 }
        node = kids(node)
        if (symbol(node) >= 0) sys.error("prefix conflict")
        i -= 1
      }
      if (child0(node) >= 0 || child1(node) >= 0) sys.error("prefix conflict")
      symbol(node) = sym
    }

    def read(br: Br): Int = {
      if (single >= 0) return single
      var node = 0
      var steps = 0
      while (symbol(node) < 0) {
        node = if (br.bit() == 0) child0(node) else child1(node)
        if (node < 0) sys.error("invalid prefix code")
        steps += 1
        if (steps > 15) sys.error("code walk too deep")
      }
      symbol(node)
    }
  }

  private def treeFromLengths(lengths: Array[Int]): Tree = {
    val t = new Tree
    var used = 0; var lastSym = -1
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) { used += 1; lastSym = i }
      i += 1
    }
    if (used == 0) sys.error("empty code")
    if (used == 1) { t.single = lastSym; return t }
    val maxLen = lengths.max
    if (maxLen > 15) sys.error("length > 15")
    val bl = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) bl(l) += 1)
    val next = new Array[Int](maxLen + 2)
    var code = 0
    var l = 1
    while (l <= maxLen) { code = (code + bl(l - 1)) << 1; next(l) = code; l += 1 }
    var kraft = 0L
    lengths.foreach(len => if (len > 0) kraft += 1L << (maxLen - len))
    if (kraft != (1L << maxLen)) sys.error("code not complete")
    var s = 0
    while (s < lengths.length) {
      if (lengths(s) > 0) {
        val c = next(lengths(s)); next(lengths(s)) += 1
        t.insert(c, lengths(s), s)
      }
      s += 1
    }
    t
  }

  /** explicit (code,len,sym) list — the simple-code shapes */
  private def treeExplicit(entries: Seq[(Int, Int, Int)]): Tree = {
    val t = new Tree
    if (entries.length == 1) { t.single = entries.head._3; return t }
    entries.foreach { case (c, l, s) => t.insert(c, l, s) }
    t
  }

  private val ClOrder = Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)
  /** the fixed code over code-length-code lengths 0..5
    * (lengths {2,4,3,2,2,4})
    */
  private lazy val FixedClTree: Tree =
    treeFromLengths(Array(2, 4, 3, 2, 2, 4))

  private def log2ceil(n: Int): Int = {
    var b = 0
    while ((1 << b) < n) b += 1
    b
  }

  private def readPrefixCode(br: Br, alphabet: Int): Tree = {
    val hskip = br.bits(2)
    if (hskip == 1) { // simple
      val abits = log2ceil(alphabet)
      val nsym = br.bits(2) + 1
      val syms = new Array[Int](nsym)
      var i = 0
      while (i < nsym) {
        syms(i) = br.bits(abits)
        if (syms(i) >= alphabet) sys.error("simple symbol out of range")
        i += 1
      }
      nsym match {
        case 1 => treeExplicit(Seq((0, 0, syms(0))))
        case 2 =>
          if (syms(0) == syms(1)) sys.error("duplicate simple symbol")
          val Array(a, b) = syms.sorted
          treeExplicit(Seq((0, 1, a), (1, 1, b)))
        case 3 =>
          if (syms.distinct.length != 3) sys.error("duplicate simple symbol")
          val a = syms(0)
          val Array(b, c) = Array(syms(1), syms(2)).sorted
          treeExplicit(Seq((0, 1, a), (2, 2, b), (3, 2, c)))
        case _ =>
          if (syms.distinct.length != 4) sys.error("duplicate simple symbol")
          if (br.bit() == 1) { // tree-select: lengths 1,2,3,3
            val a = syms(0); val b = syms(1)
            val Array(c, d) = Array(syms(2), syms(3)).sorted
            treeExplicit(Seq((0, 1, a), (2, 2, b), (6, 3, c), (7, 3, d)))
          } else { // flat 2,2,2,2 over sorted symbols
            val Array(a, b, c, d) = syms.sorted
            treeExplicit(Seq((0, 2, a), (1, 2, b), (2, 2, c), (3, 2, d)))
          }
      }
    } else { // complex, skipping the first `hskip` order slots
      val clLen = new Array[Int](18)
      var space = 0
      var numCodes = 0
      var i = hskip
      while (i < 18 && space < 32) {
        val l = FixedClTree.read(br)
        clLen(ClOrder(i)) = l
        if (l != 0) {
          space += 32 >> l
          numCodes += 1
        }
        i += 1
      }
      if (!(numCodes == 1 || space == 32)) sys.error("code-length code incomplete")
      val clTree = treeFromLengths(clLen)

      val lengths = new Array[Int](alphabet)
      var symbol = 0
      var prevLen = 8
      var repeat = 0
      var repeatLen = 0
      var space2 = 32768
      while (symbol < alphabet && space2 > 0) {
        val cl = clTree.read(br)
        if (cl < 16) {
          repeat = 0
          lengths(symbol) = cl
          symbol += 1
          if (cl != 0) { prevLen = cl; space2 -= 32768 >> cl }
        } else {
          val extraBits = if (cl == 16) 2 else 3
          val newLen = if (cl == 16) prevLen else 0
          if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
          val old = repeat
          if (repeat > 0) { repeat -= 2; repeat <<= extraBits }
          repeat += br.bits(extraBits) + 3
          val delta = repeat - old
          if (symbol + delta > alphabet) sys.error("repeat overruns alphabet")
          var k = 0
          while (k < delta) {
            lengths(symbol) = repeatLen
            symbol += 1
            k += 1
          }
          if (repeatLen != 0) space2 -= delta * (32768 >> repeatLen)
        }
      }
      if (space2 < 0) sys.error("over-subscribed code")
      treeFromLengths(lengths)
    }
  }

  /** the NBLTYPES / NTREES count code */
  private def readCount(br: Br): Int = {
    if (br.bit() == 0) 1
    else {
      val k = br.bits(3)
      (1 << k) + br.bits(k) + 1
    }
  }

  // ---------------------------------------------------------------
  // published length-code tables
  // ---------------------------------------------------------------
  private val InsBase = Array(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50,
    66, 98, 130, 194, 322, 578, 1090, 2114, 6210, 22594)
  private val InsExtra = Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
    6, 7, 8, 9, 10, 12, 14, 24)
  private val CopyBase = Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30,
    38, 54, 70, 102, 134, 198, 326, 582, 1094, 2118)
  private val CopyExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4,
    5, 5, 6, 7, 8, 9, 10, 24)
  private val BlockBase = Array(1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97,
    113, 145, 177, 209, 241, 305, 369, 497, 753, 1265, 2289, 4337, 8433, 16625)
  private val BlockExtra = Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5,
    6, 6, 7, 8, 9, 10, 11, 12, 13, 24)
  // 11×64 command cells (validated against the system brotli by the
  // transform-derivation bootstrap): insert-high, copy-high, implicit
  private val CellInsHi = Array(0, 0, 0, 0, 1, 1, 0, 2, 1, 2, 2)
  private val CellCopyHi = Array(0, 1, 0, 1, 0, 1, 2, 0, 2, 1, 2)

  // ---------------------------------------------------------------
  // context map
  // ---------------------------------------------------------------
  private def readContextMap(br: Br, size: Int, ntrees: Int): Array[Int] = {
    val map = new Array[Int](size)
    if (ntrees == 1) return map
    val rleMax = if (br.bit() == 1) br.bits(4) + 1 else 0
    val tree = readPrefixCode(br, ntrees + rleMax)
    var i = 0
    while (i < size) {
      val sym = tree.read(br)
      if (sym == 0) { map(i) = 0; i += 1 }
      else if (sym <= rleMax) {
        val reps = (1 << sym) + br.bits(sym)
        if (i + reps > size) sys.error("context-map run overruns")
        i += reps // zeros
      } else {
        map(i) = sym - rleMax
        i += 1
      }
    }
    if (br.bit() == 1) { // inverse move-to-front
      val mtf = Array.tabulate(256)(identity)
      var k = 0
      while (k < size) {
        val v = map(k)
        val value = mtf(v)
        var j = v
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = value
        map(k) = value
        k += 1
      }
    }
    map
  }

  // ---------------------------------------------------------------
  // dictionary transforms
  // ---------------------------------------------------------------
  private def ferment(word: Array[Byte], firstOnly: Boolean): Array[Byte] = {
    val out = word.clone()
    var i = 0
    var done = false
    while (i < out.length && !done) {
      val c = out(i) & 0xFF
      if (c < 192) {
        if (c >= 'a' && c <= 'z') out(i) = (c ^ 32).toByte
        i += 1
      } else if (c < 224) {
        if (i + 1 < out.length) out(i + 1) = (out(i + 1) ^ 32).toByte
        i += 2
      } else {
        if (i + 2 < out.length) out(i + 2) = (out(i + 2) ^ 5).toByte
        i += 3
      }
      if (firstOnly) done = true
    }
    out
  }

  private def transformWord(word: Array[Byte], tid: Int): Array[Byte] = {
    if (tid < 0 || tid > 120) sys.error("transform id out of range")
    val (pre, op, suf) = Transforms(tid)
    val core: Array[Byte] = op match {
      case "I" => word
      case "UF" => ferment(word, firstOnly = true)
      case "UA" => ferment(word, firstOnly = false)
      case s if s.startsWith("OF") =>
        val k = s.substring(2).toInt
        if (k >= word.length) Array.emptyByteArray
        else java.util.Arrays.copyOfRange(word, k, word.length)
      case s if s.startsWith("OL") =>
        val k = s.substring(2).toInt
        if (k >= word.length) Array.emptyByteArray
        else java.util.Arrays.copyOfRange(word, 0, word.length - k)
      case other => sys.error(s"unknown transform op $other")
    }
    val out = new Array[Byte](pre.length + core.length + suf.length)
    System.arraycopy(pre, 0, out, 0, pre.length)
    System.arraycopy(core, 0, out, pre.length, core.length)
    System.arraycopy(suf, 0, out, pre.length + core.length, suf.length)
    out
  }

  // ---------------------------------------------------------------
  // null-compression encoder (conformant uncompressed metablocks) —
  // the WARC writer's `Content-Encoding: br` wire variant; any
  // conformant decoder (incl. the system brotli, asserted in
  // BrotliSpec) reads it back byte-exactly
  // ---------------------------------------------------------------
  def encodeRaw(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length + 8 + bytes.length / 65536 * 4)
    var cur = 0
    var nBits = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        i += 1
      }
    }
    def align(): Unit = if (nBits > 0) { out.write(cur); cur = 0; nBits = 0 }
    putBits(0, 1) // WBITS = 16
    var off = 0
    while (off < bytes.length) {
      val n = math.min(65536, bytes.length - off)
      putBits(0, 1)       // ISLAST = 0
      putBits(0, 2)       // MNIBBLES code 0 → 4 nibbles
      putBits(n - 1, 16)  // MLEN - 1
      putBits(1, 1)       // ISUNCOMPRESSED
      align()
      out.write(bytes, off, n)
      off += n
    }
    putBits(1, 1) // ISLAST
    putBits(1, 1) // ISLASTEMPTY
    align()
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // decoder
  // ---------------------------------------------------------------
  def decodeOrNull(bytes: Array[Byte]): Array[Byte] =
    try decodeOrThrow(bytes) catch { case NonFatal(_) => null }

  private[graft] def decodeOrThrow(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null || bytes.length == 0) return null
    val br = new Br(bytes)
    // WBITS
    val wbits =
      if (br.bit() == 0) 16
      else {
        val n = br.bits(3)
        if (n != 0) 17 + n
        else {
          val m = br.bits(3)
          if (m == 0) 17
          else if (m == 1) sys.error("reserved WBITS")
          else 8 + m
        }
      }
    val maxBackward = (1L << wbits) - 16
    var outArr = new Array[Byte](1 << 16) // the whole produced output
    var outLen = 0
    def put(b: Byte): Unit = {
      if (outLen >= MaxOut) sys.error("output bound")
      if (outLen >= outArr.length)
        outArr = java.util.Arrays.copyOf(outArr, outArr.length * 2)
      outArr(outLen) = b
      outLen += 1
    }

    val distRb = Array(16, 15, 11, 4)
    var distIdx = 0
    def rbAt(k: Int): Int = distRb((distIdx + 4 - k) & 3) // k=1 → last
    def rbPush(d: Int): Unit = { distRb(distIdx & 3) = d; distIdx += 1 }

    var p1 = 0
    var p2 = 0 // last two output bytes (global)
    var isLast = false

    while (!isLast) {
      isLast = br.bit() == 1
      var skipBlock = false
      var mlen = 0
      if (isLast && br.bit() == 1) skipBlock = true // ISLASTEMPTY
      if (!skipBlock) {
        val mn = br.bits(2)
        if (mn == 3) { // metadata block
          if (isLast) sys.error("metadata cannot be last")
          if (br.bit() != 0) sys.error("reserved metadata bit")
          val mskip = br.bits(2)
          var skipLen = 0
          var k = 0
          while (k < mskip) { skipLen |= br.bits(8) << (8 * k); k += 1 }
          if (mskip > 0 && ((skipLen >> (8 * (mskip - 1))) & 0xFF) == 0)
            sys.error("non-minimal MSKIPLEN")
          if (mskip > 0) skipLen += 1
          br.align()
          var s = 0
          while (s < skipLen) { br.bits(8); s += 1 }
          skipBlock = true
        } else {
          mlen = br.bits(4 * (mn + 4)) + 1
        }
      }
      if (!skipBlock) {
        val uncompressed = !isLast && br.bit() == 1
        if (uncompressed) {
          br.align()
          var k = 0
          while (k < mlen) {
            put(br.bits(8).toByte)
            k += 1
          }
          if (outLen >= 2) { p1 = outArr(outLen - 1) & 0xFF; p2 = outArr(outLen - 2) & 0xFF }
        } else {
          // ---- metablock header
          val nbl = new Array[Int](3)
          val typeTrees = new Array[Tree](3)
          val countTrees = new Array[Tree](3)
          val blockLen = new Array[Int](3)
          val curType = new Array[Int](3)
          val prevType = new Array[Int](3)
          var cat = 0
          while (cat < 3) {
            nbl(cat) = readCount(br)
            curType(cat) = 0
            prevType(cat) = 1
            blockLen(cat) = Int.MaxValue
            if (nbl(cat) > 1) {
              typeTrees(cat) = readPrefixCode(br, nbl(cat) + 2)
              countTrees(cat) = readPrefixCode(br, 26)
              val c = countTrees(cat).read(br)
              blockLen(cat) = BlockBase(c) + br.bits(BlockExtra(c))
            }
            cat += 1
          }
          def switchBlock(cat: Int): Unit = {
            val sym = typeTrees(cat).read(br)
            val nt = nbl(cat)
            val newType = sym match {
              case 0 => prevType(cat)
              case 1 => (curType(cat) + 1) % nt
              case s => s - 2
            }
            if (newType >= nt) sys.error("block type out of range")
            prevType(cat) = curType(cat)
            curType(cat) = newType
            val c = countTrees(cat).read(br)
            blockLen(cat) = BlockBase(c) + br.bits(BlockExtra(c))
          }

          val npostfix = br.bits(2)
          val ndirect = br.bits(4) << npostfix
          val ctxModes = Array.fill(nbl(0))(br.bits(2))
          val ntreesL = readCount(br)
          val cmapL = readContextMap(br, 64 * nbl(0), ntreesL)
          val ntreesD = readCount(br)
          val cmapD = readContextMap(br, 4 * nbl(2), ntreesD)
          val litTrees = Array.fill(ntreesL)(readPrefixCode(br, 256))
          val cmdTrees = Array.fill(nbl(1))(readPrefixCode(br, 704))
          val distAlpha = 16 + ndirect + (48 << npostfix)
          val distTrees = Array.fill(ntreesD)(readPrefixCode(br, distAlpha))

          // ---- data
          var remaining = mlen
          while (remaining > 0) {
            if (blockLen(1) == 0) switchBlock(1)
            blockLen(1) -= 1
            val cmd = cmdTrees(curType(1)).read(br)
            val cell = cmd >> 6
            val insCode = CellInsHi(cell) * 8 + ((cmd >> 3) & 7)
            val copyCode = CellCopyHi(cell) * 8 + (cmd & 7)
            val implicitDist = cell < 2
            val insertLen = InsBase(insCode) + br.bits(InsExtra(insCode))
            var copyLen = CopyBase(copyCode) + br.bits(CopyExtra(copyCode))
            // literals
            var k = 0
            while (k < insertLen) {
              if (remaining == 0) sys.error("insert overruns metablock")
              if (blockLen(0) == 0) switchBlock(0)
              blockLen(0) -= 1
              val mode = ctxModes(curType(0))
              val ctx = (CtxLut(mode * 512 + p1) & 0xFF) |
                (CtxLut(mode * 512 + 256 + p2) & 0xFF)
              val tree = litTrees(cmapL(64 * curType(0) + ctx))
              val lit = tree.read(br)
              put(lit.toByte)
              p2 = p1; p1 = lit
              remaining -= 1
              k += 1
            }
            if (remaining > 0) {
              val maxDistance = math.min(outLen.toLong, maxBackward).toInt
              var distance = 0
              var pushIt = false
              if (implicitDist) {
                distance = rbAt(1)
              } else {
                if (blockLen(2) == 0) switchBlock(2)
                blockLen(2) -= 1
                val dctx = if (copyLen > 4) 3 else copyLen - 2
                val tree = distTrees(cmapD(4 * curType(2) + dctx))
                val dsym = tree.read(br)
                if (dsym < 16) {
                  distance = dsym match {
                    case 0 => rbAt(1)
                    case 1 => rbAt(2)
                    case 2 => rbAt(3)
                    case 3 => rbAt(4)
                    case s =>
                      val base = if (s < 10) rbAt(1) else rbAt(2)
                      val off = ((s - (if (s < 10) 4 else 10)) >> 1) + 1
                      if (((s - (if (s < 10) 4 else 10)) & 1) == 0) base - off
                      else base + off
                  }
                  if (distance <= 0) sys.error("invalid short-code distance")
                  pushIt = dsym != 0
                } else if (dsym < 16 + ndirect) {
                  distance = dsym - 16 + 1
                  pushIt = true
                } else {
                  val c = dsym - ndirect - 16
                  val ndistbits = 1 + (c >> (npostfix + 1))
                  if (ndistbits > 24) sys.error("distance bits out of range")
                  val hcode = c >> npostfix
                  val lcode = c & ((1 << npostfix) - 1)
                  val offset = ((2L + (hcode & 1)) << ndistbits) - 4
                  val dl = ((offset + br.bits(ndistbits)) << npostfix) +
                    lcode + ndirect + 1
                  if (dl > Int.MaxValue) sys.error("distance overflow")
                  distance = dl.toInt
                  pushIt = true
                }
              }
              if (distance <= maxDistance) {
                if (copyLen > remaining) sys.error("copy overruns metablock")
                var c = 0
                while (c < copyLen) {
                  put(outArr(outLen - distance))
                  c += 1
                }
                p1 = outArr(outLen - 1) & 0xFF
                p2 = if (outLen >= 2) outArr(outLen - 2) & 0xFF else 0
                remaining -= copyLen
                if (pushIt) rbPush(distance)
              } else {
                // static dictionary reference (never pushes the ring)
                if (copyLen < 4 || copyLen > 24) sys.error("dictionary length")
                val bitsL = SizeBits(copyLen)
                val address = distance - maxDistance - 1
                val wordIdx = address & ((1 << bitsL) - 1)
                val tid = address >>> bitsL
                val base = DictOffsets(copyLen) + wordIdx * copyLen
                val word = java.util.Arrays.copyOfRange(Dict, base, base + copyLen)
                val xf = transformWord(word, tid)
                if (xf.length > remaining) sys.error("dictionary word overruns metablock")
                xf.foreach(put)
                if (xf.nonEmpty) {
                  p1 = outArr(outLen - 1) & 0xFF
                  p2 = if (outLen >= 2) outArr(outLen - 2) & 0xFF else 0
                }
                remaining -= xf.length
              }
            }
            // remaining == 0 after the literals: the command's copy
            // part is ignored (the spec's insert-only final command)
          }
        }
      }
    }
    java.util.Arrays.copyOf(outArr, outLen)
  }
}
