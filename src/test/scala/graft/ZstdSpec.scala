package graft

import graft.io.Zstd
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.io.Zstd]] — the from-spec RFC 8878 decoder validated
  * against zstd-jni (the reference implementation's own JNI binding,
  * on the provided Spark classpath) as the INDEPENDENT encoder: the
  * CavlcRoundTripSpec discipline. Shapes and levels are chosen to
  * force every decode path: raw/RLE blocks, predefined and
  * FSE-compressed sequence tables, 1- and 4-stream huffman literals
  * with direct and FSE-compressed weights, treeless repeats,
  * multi-block frames, unknown-content-size streaming frames,
  * checksums, skippable frames, and frame concatenation.
  */
class ZstdSpec extends AnyFunSuite {

  private def jni(data: Array[Byte], level: Int): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(data, level)

  private val rnd = new scala.util.Random(881_2026)

  private def randomBytes(n: Int): Array[Byte] = {
    val a = new Array[Byte](n); rnd.nextBytes(a); a
  }

  /** Markov-ish text: compressible but non-trivial (forces huffman +
    * long repeat-offset chains at high levels).
    */
  private def textLike(n: Int): Array[Byte] = {
    val words = Array("the", "grid", "ocean", "model", "track", "profile",
      "salinity", "temperature", "analysis", "of", "and", "in", "42")
    val sb = new StringBuilder
    while (sb.length < n) {
      sb.append(words(rnd.nextInt(words.length))).append(' ')
      if (rnd.nextInt(12) == 0) sb.append('\n')
    }
    sb.toString.take(n).getBytes("UTF-8")
  }

  private def structLike(n: Int): Array[Byte] = {
    // float-array-ish: slowly varying little-endian values (the Zarr
    // chunk shape this decoder exists for)
    val bb = java.nio.ByteBuffer.allocate(n + 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var x = 20.0f
    while (bb.position() + 4 <= n) { bb.putFloat(x); x += 0.01f }
    java.util.Arrays.copyOf(bb.array(), n)
  }

  test("round-trips zstd-jni output across levels, sizes, and shapes") {
    val sizes = Seq(0, 1, 2, 7, 100, 1024, 17_000, 131_072, 300_000)
    val levels = Seq(1, 3, 6, 9, 15, 19)
    for (n <- sizes; level <- levels) {
      val shapes = Seq(
        ("zeros", Array.fill[Byte](n)(0)),
        ("random", randomBytes(n)),
        ("text", textLike(n)),
        ("struct", structLike(n)))
      for ((shape, data) <- shapes) {
        val compressed = jni(data, level)
        val got = Zstd.decompressSpec(compressed)
        assert(java.util.Arrays.equals(got, data),
          s"mismatch: n=$n level=$level shape=$shape")
      }
    }
  }

  test("randomized fuzz vs zstd-jni (mixed runs and entropy)") {
    (0 until 300).foreach { i =>
      val n = rnd.nextInt(40_000)
      val data = new Array[Byte](n)
      var p = 0
      while (p < n) {
        val run = math.min(1 + rnd.nextInt(600), n - p)
        rnd.nextInt(3) match {
          case 0 => java.util.Arrays.fill(data, p, p + run, rnd.nextInt(256).toByte)
          case 1 => (0 until run).foreach(k => data(p + k) = rnd.nextInt(8).toByte)
          case _ => (0 until run).foreach(k => data(p + k) = rnd.nextInt(256).toByte)
        }
        p += run
      }
      val level = Seq(1, 3, 9, 19)(i % 4)
      assert(java.util.Arrays.equals(Zstd.decompressSpec(jni(data, level)), data), s"fuzz $i")
    }
  }

  test("long-window stress: 16 MB with multi-MB match distances") {
    // periodic structure with a ~3 MB period forces the encoder into
    // long-distance matches (offsets far beyond one 128 KB block) and
    // many blocks sharing repeat-offset history
    val period = 3_000_001 // prime-ish so block boundaries drift
    val n = 16 * 1024 * 1024
    val data = new Array[Byte](n)
    var i = 0
    while (i < n) {
      data(i) = (((i % period) * 31 + (i % period >> 7)) & 0xFF).toByte
      i += 1
    }
    for (level <- Seq(3, 19)) {
      val c = jni(data, level)
      assert(java.util.Arrays.equals(Zstd.decompressSpec(c), data), s"level $level")
    }
    // and a high-entropy 8 MB body (raw-block heavy path)
    val rnd8 = randomBytes(8 * 1024 * 1024)
    assert(java.util.Arrays.equals(Zstd.decompressSpec(jni(rnd8, 3)), rnd8))
  }

  test("checksummed frames verify; corrupted payload fails loudly") {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    ctx.setLevel(3).setChecksum(true)
    val data = textLike(20_000)
    val c = ctx.compress(data)
    assert(java.util.Arrays.equals(Zstd.decompressSpec(c), data))
    // flip a byte mid-payload: either a structural check or the
    // checksum must reject it (it cannot decode silently wrong)
    val bad = c.clone(); bad(c.length / 2) = (bad(c.length / 2) ^ 0x41).toByte
    intercept[Exception] { Zstd.decompressSpec(bad) }
  }

  test("unknown-content-size streaming frames decode") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new com.github.luben.zstd.ZstdOutputStream(bos, 3)
    val data = textLike(400_000) // several 128 KB blocks
    zos.write(data); zos.close()
    assert(java.util.Arrays.equals(Zstd.decompressSpec(bos.toByteArray), data))
  }

  test("concatenated frames and skippable frames") {
    val a = textLike(5_000)
    val b = randomBytes(3_000)
    val skippable = {
      val junk = randomBytes(11)
      val out = java.nio.ByteBuffer.allocate(8 + junk.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.putInt(0x184D2A53).putInt(junk.length).put(junk)
      out.array()
    }
    val cat = jni(a, 3) ++ skippable ++ jni(b, 9)
    assert(java.util.Arrays.equals(Zstd.decompressSpec(cat), a ++ b))
  }

  test("hand-built raw and RLE blocks decode (paths encoders rarely emit)") {
    // frame: magic, FHD single-segment + 1-byte FCS, raw block + RLE block
    def le(i: Int): Array[Byte] = Array[Byte](
      (i & 0xFF).toByte, ((i >> 8) & 0xFF).toByte, ((i >> 16) & 0xFF).toByte,
      ((i >> 24) & 0xFF).toByte)
    val content = "rawpart" + ("z" * 10)
    val rawBytes = "rawpart".getBytes("UTF-8")
    def blockHeader(last: Boolean, btype: Int, size: Int): Array[Byte] = {
      val v = (if (last) 1 else 0) | (btype << 1) | (size << 3)
      Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte)
    }
    val frame = le(0xFD2FB528) ++
      Array[Byte](0x20.toByte, content.length.toByte) ++ // single-segment, FCS=1 byte
      blockHeader(last = false, btype = 0, size = rawBytes.length) ++ rawBytes ++
      blockHeader(last = true, btype = 1, size = 10) ++ Array[Byte]('z'.toByte)
    assert(new String(Zstd.decompressSpec(frame), "UTF-8") === content)
  }

  test("dictionaries and garbage are rejected loudly (both entry points)") {
    // the PUBLIC decompress falls back to the from-spec decoder on a
    // JNI rejection, so both surfaces show the same descriptive errors
    for (dec <- Seq[Array[Byte] => Array[Byte]](Zstd.decompressSpec, Zstd.decompress)) {
      val e1 = intercept[IllegalArgumentException] {
        dec(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
      }
      assert(e1.getMessage.contains("magic"))
      // declared content size mismatch: hand-truncate a valid frame's
      // final block flag cannot be built easily, so corrupt the FCS
      val c = jni(textLike(1000), 3)
      intercept[Exception] { dec(c.take(c.length - 1)) }
    }
  }

  test("dictionary-flagged frame is rejected by name (both entry points)") {
    val data = textLike(500)
    val dictBuf = new Array[Byte](16 * 1024)
    val dictLen = com.github.luben.zstd.Zstd.trainFromBuffer(
      Array.fill(64)(textLike(400)), dictBuf)
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    ctx.setLevel(3).loadDict(java.util.Arrays.copyOf(dictBuf, dictLen.toInt))
    val c = ctx.compress(data)
    for (dec <- Seq[Array[Byte] => Array[Byte]](Zstd.decompressSpec, Zstd.decompress)) {
      val e = intercept[IllegalArgumentException] { dec(c) }
      assert(e.getMessage.contains("dictionar"))
    }
  }

  test("jni fast path is active and byte-equal to the from-spec decoder") {
    assert(Zstd.fastPathAvailable,
      "zstd-jni expected on the provided Spark classpath")
    for (n <- Seq(0, 1, 100, 17_000, 300_000); level <- Seq(1, 3, 19);
         (shape, data) <- Seq(("text", textLike(n)), ("random", randomBytes(n)))) {
      val c = jni(data, level)
      val fast = Zstd.decompress(c)
      val spec = Zstd.decompressSpec(c)
      assert(java.util.Arrays.equals(fast, data), s"fast n=$n l=$level $shape")
      assert(java.util.Arrays.equals(fast, spec), s"a/b n=$n l=$level $shape")
    }
    // the shapes one-shot encoders rarely emit, through the public path:
    // concatenation + a skippable frame + an unknown-content-size frame
    val a = textLike(5_000)
    val b = randomBytes(3_000)
    val skippable = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(0x184D2A57).putInt(4).putInt(0xDEAD).array()
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new com.github.luben.zstd.ZstdOutputStream(bos, 3)
    zos.write(b); zos.close()
    val cat = jni(a, 3) ++ skippable ++ bos.toByteArray
    val fast = Zstd.decompress(cat)
    assert(java.util.Arrays.equals(fast, a ++ b))
    assert(java.util.Arrays.equals(fast, Zstd.decompressSpec(cat)))
  }
}
