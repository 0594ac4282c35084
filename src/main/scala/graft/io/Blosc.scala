package graft.io

/** Blosc-1 frame decoder — the read side of the Zarr v2 `blosc`
  * compressor, which is zarr-python's DEFAULT (numcodecs
  * `Blosc(cname='lz4', clevel=5, shuffle=SHUFFLE)`), so most
  * real-world Zarr stores hit this codec on their first chunk.
  *
  * Implemented from the public c-blosc container documentation
  * (README_HEADER.rst: the 16-byte chunk header) and the blosc1
  * block layout (blosc.c): a chunk is
  * {{{
  *   header(16) | bstarts: int32-LE × nblocks | blocks...
  * }}}
  * where each block of `blocksize` uncompressed bytes is byte-
  * shuffled (flag 0x1), split into `typesize` independent streams
  * when splitting applies, and each stream is stored as an int32-LE
  * compressed size followed by an LZ4 block (or verbatim bytes when
  * the size equals the uncompressed stream size). The LZ4 block
  * format (token nibbles, 255-extension length bytes, 16-bit match
  * offsets, overlap-copy semantics) is implemented from the public
  * LZ4 block format description. JDK-only, like every other codec in
  * this reader.
  *
  * Scope: format versions 1–2, `memcpyed` chunks, inner codecs LZ4
  * (split streams), snappy (raw block format, from the published
  * description), zlib (JDK Inflater per block), and zstd (the
  * from-spec [[graft.io.Zstd]] frame decoder, one frame per stream)
  * with byte shuffle. Bit-shuffle and the remaining inner codec
  * (blosclz) fail LOUDLY with the codec named — the same
  * discipline as the rest of [[Zarr]]: wrong answers are worse than
  * no answers.
  */
object Blosc {

  // header flag bits / fields (c-blosc blosc.h)
  private val DoShuffle = 0x1
  private val MemCpyed = 0x2
  private val DoBitShuffle = 0x4
  // compressor registry codes, flags bits 5-7
  private val CodecNames =
    Array("blosclz", "lz4", "snappy", "zlib", "zstd", "?5", "?6", "?7")
  private val Lz4Code = 1
  private val SnappyCode = 2
  private val ZlibCode = 3
  private val ZstdCode = 4
  // blosc1 split rule constants (blosc.c: MAX_SPLITS, MIN_BUFFERSIZE)
  private val MaxSplits = 16
  private val MinBufferSize = 128

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  /** blosc1's split decision, mirrored exactly: a non-leftover block
    * compressed with blosclz/LZ4 (and ONLY those two formats —
    * snappy/zlib blocks are never split, blosc.c's `blosc_d`) is
    * stored as `typesize` independent streams when the type fits the
    * stream table and the per-stream size clears the floor. The
    * decoder must re-derive this from the header alone — it is not
    * stored.
    */
  private def nsplitsFor(codec: Int, typesize: Int, blocksize: Int,
                         leftover: Boolean): Int =
    if (codec == Lz4Code && !leftover && typesize > 1 &&
        typesize <= MaxSplits &&
        blocksize / typesize >= MinBufferSize && blocksize % typesize == 0)
      typesize
    else 1

  /** Decompress one blosc chunk to exactly `expected` bytes. */
  def decompress(chunk: Array[Byte], expected: Int, ctx: String): Array[Byte] = {
    require(chunk.length >= 16, s"$ctx: blosc chunk shorter than its header")
    val version = chunk(0) & 0xFF
    require(version >= 1 && version <= 2,
      s"$ctx: blosc format version $version not supported (blosc1 only)")
    val flags = chunk(2) & 0xFF
    val typesize = chunk(3) & 0xFF
    val nbytes = le32(chunk, 4)
    val blocksize = le32(chunk, 8)
    val cbytes = le32(chunk, 12)
    require(nbytes == expected,
      s"$ctx: blosc chunk holds $nbytes bytes, expected $expected")
    require(cbytes == chunk.length,
      s"$ctx: blosc header cbytes=$cbytes but chunk is ${chunk.length} bytes")
    val out = new Array[Byte](nbytes)
    if (nbytes == 0) return out
    if ((flags & MemCpyed) != 0) {
      require(chunk.length - 16 == nbytes,
        s"$ctx: memcpyed blosc chunk is ${chunk.length - 16} bytes, expected $nbytes")
      System.arraycopy(chunk, 16, out, 0, nbytes)
      return out
    }
    require((flags & DoBitShuffle) == 0,
      s"$ctx: blosc bit-shuffle not supported (byte shuffle only)")
    val codec = (flags >>> 5) & 0x7
    require(codec == Lz4Code || codec == SnappyCode || codec == ZlibCode ||
      codec == ZstdCode,
      s"$ctx: blosc inner codec '${CodecNames(codec)}' not supported (lz4/snappy/zlib/zstd)")
    require(blocksize > 0, s"$ctx: blosc blocksize $blocksize")
    val nblocks = (nbytes.toLong + blocksize - 1) / blocksize
    require(16L + 4L * nblocks <= chunk.length,
      s"$ctx: blosc chunk truncated inside its block index")
    val doShuffle = (flags & DoShuffle) != 0 && typesize > 1
    val tmp = if (doShuffle) new Array[Byte](blocksize) else null
    var j = 0
    while (j < nblocks) {
      val off = j * blocksize
      val bsize = math.min(blocksize, nbytes - off)
      val leftover = bsize != blocksize
      val nsplits = nsplitsFor(codec, typesize, blocksize, leftover)
      require(bsize % nsplits == 0,
        s"$ctx: blosc block $j size $bsize not divisible into $nsplits streams")
      val neblock = bsize / nsplits
      val dst = if (doShuffle) tmp else out
      val dstBase = if (doShuffle) 0 else off
      var pos = le32(chunk, 16 + 4 * j)
      // a block must start past the header AND the bstarts index itself,
      // or a corrupt index would decode its own entries as stream data
      require(pos >= 16 + 4 * nblocks && pos + 4 <= chunk.length,
        s"$ctx: blosc block $j starts at $pos, outside the chunk's data region")
      var s = 0
      while (s < nsplits) {
        require(pos + 4 <= chunk.length,
          s"$ctx: blosc block $j stream $s truncated before its size")
        val sc = le32(chunk, pos); pos += 4
        require(sc > 0 && pos + sc <= chunk.length,
          s"$ctx: blosc block $j stream $s claims $sc bytes past the chunk end")
        val dpos = dstBase + s * neblock
        if (sc == neblock) System.arraycopy(chunk, pos, dst, dpos, neblock)
        else codec match {
          case SnappyCode => snappyDecompressBlock(chunk, pos, sc, dst, dpos, neblock, ctx)
          case ZlibCode => zlibDecompressBlock(chunk, pos, sc, dst, dpos, neblock, ctx)
          case ZstdCode => zstdDecompressBlock(chunk, pos, sc, dst, dpos, neblock, ctx)
          case _ => lz4DecompressBlock(chunk, pos, sc, dst, dpos, neblock, ctx)
        }
        pos += sc
        s += 1
      }
      if (doShuffle) unshuffle(typesize, bsize, tmp, out, off)
      j += 1
    }
    out
  }

  /** One zstd stream — c-blosc stores each (never-split) zstd stream
    * as a complete zstd FRAME, decoded by the repo's own from-spec
    * [[graft.io.Zstd]] decoder.
    */
  private[io] def zstdDecompressBlock(src: Array[Byte], srcOff: Int, srcLen: Int,
                                      dst: Array[Byte], dstOff: Int, dstLen: Int,
                                      ctx: String): Unit = {
    val frame = java.util.Arrays.copyOfRange(src, srcOff, srcOff + srcLen)
    val got = Zstd.decompress(frame)
    require(got.length == dstLen,
      s"$ctx: blosc zstd stream yielded ${got.length}, expected $dstLen")
    System.arraycopy(got, 0, dst, dstOff, dstLen)
  }

  /** One LZ4 block (raw block format, no frame): decode exactly
    * `dstLen` bytes from `src[srcOff, srcOff+srcLen)` into
    * `dst[dstOff, ...)`. Matches may only reference bytes at or after
    * `dstOff` — blosc compresses every split stream independently.
    */
  private[io] def lz4DecompressBlock(src: Array[Byte], srcOff: Int, srcLen: Int,
                                     dst: Array[Byte], dstOff: Int, dstLen: Int,
                                     ctx: String): Unit = {
    var s = srcOff
    val sEnd = srcOff + srcLen
    var d = dstOff
    val dEnd = dstOff + dstLen
    while (s < sEnd) {
      val token = src(s) & 0xFF; s += 1
      var litLen = token >>> 4
      if (litLen == 15) {
        var b = 255
        while (b == 255) {
          require(s < sEnd, s"$ctx: lz4 literal length runs off the stream")
          b = src(s) & 0xFF; s += 1; litLen += b
        }
      }
      require(s + litLen <= sEnd && d + litLen <= dEnd,
        s"$ctx: lz4 literal run overflows")
      System.arraycopy(src, s, dst, d, litLen)
      s += litLen; d += litLen
      if (s < sEnd) { // the final sequence carries no match
        require(s + 2 <= sEnd, s"$ctx: lz4 stream ends inside a match offset")
        val offset = (src(s) & 0xFF) | ((src(s + 1) & 0xFF) << 8); s += 2
        require(offset > 0 && d - offset >= dstOff,
          s"$ctx: lz4 match offset $offset reaches before the stream")
        var matchLen = (token & 0xF) + 4
        if ((token & 0xF) == 15) {
          var b = 255
          while (b == 255) {
            require(s < sEnd, s"$ctx: lz4 match length runs off the stream")
            b = src(s) & 0xFF; s += 1; matchLen += b
          }
        }
        require(d + matchLen <= dEnd, s"$ctx: lz4 match overflows the block")
        // byte-by-byte on purpose: offsets shorter than the match
        // length REPEAT the just-written bytes (RLE-style overlap)
        val m = d - offset
        var k = 0
        while (k < matchLen) { dst(d + k) = dst(m + k); k += 1 }
        d += matchLen
      }
    }
    require(d == dEnd,
      s"$ctx: lz4 block yielded ${d - dstOff} bytes, expected $dstLen")
  }

  /** One snappy RAW block (the block format, not the framing format):
    * varint uncompressed length, then literal / copy-1 / copy-2 /
    * copy-4 elements; overlapping copies repeat bytes. From the
    * published snappy format description.
    */
  private[io] def snappyDecompressBlock(src: Array[Byte], srcOff: Int, srcLen: Int,
                                        dst: Array[Byte], dstOff: Int, dstLen: Int,
                                        ctx: String): Unit = {
    var s = srcOff
    val sEnd = srcOff + srcLen
    // varint preamble: declared uncompressed size must be the stream size
    var declared = 0L
    var shift = 0
    var more = true
    while (more) {
      require(s < sEnd && shift <= 28, s"$ctx: snappy length varint overruns")
      val b = src(s) & 0xFF; s += 1
      declared |= (b & 0x7FL) << shift
      shift += 7
      more = (b & 0x80) != 0
    }
    require(declared == dstLen,
      s"$ctx: snappy block declares $declared bytes, expected $dstLen")
    var d = dstOff
    val dEnd = dstOff + dstLen
    while (s < sEnd) {
      val tag = src(s) & 0xFF; s += 1
      if ((tag & 3) == 0) { // literal
        var len = (tag >>> 2) + 1
        if (len > 60) {
          val extra = len - 60
          require(s + extra <= sEnd, s"$ctx: snappy literal length overruns")
          var v = 0
          var k = 0
          while (k < extra) { v |= (src(s + k) & 0xFF) << (8 * k); k += 1 }
          s += extra
          len = v + 1
        }
        require(len > 0 && s + len <= sEnd && d + len <= dEnd,
          s"$ctx: snappy literal overruns")
        System.arraycopy(src, s, dst, d, len)
        s += len; d += len
      } else {
        var len = 0
        var offset = 0
        (tag & 3) match {
          case 1 =>
            require(s < sEnd, s"$ctx: snappy copy1 truncated")
            len = ((tag >>> 2) & 0x7) + 4
            offset = ((tag >>> 5) << 8) | (src(s) & 0xFF); s += 1
          case 2 =>
            require(s + 2 <= sEnd, s"$ctx: snappy copy2 truncated")
            len = (tag >>> 2) + 1
            offset = (src(s) & 0xFF) | ((src(s + 1) & 0xFF) << 8); s += 2
          case _ =>
            require(s + 4 <= sEnd, s"$ctx: snappy copy4 truncated")
            len = (tag >>> 2) + 1
            offset = (src(s) & 0xFF) | ((src(s + 1) & 0xFF) << 8) |
              ((src(s + 2) & 0xFF) << 16) | ((src(s + 3) & 0xFF) << 24)
            s += 4
        }
        require(offset > 0 && d - offset >= dstOff && d + len <= dEnd,
          s"$ctx: snappy copy out of range (offset $offset, len $len)")
        val m = d - offset
        var k = 0
        while (k < len) { dst(d + k) = dst(m + k); k += 1 }
        d += len
      }
    }
    require(d == dEnd, s"$ctx: snappy block yielded ${d - dstOff}, expected $dstLen")
  }

  /** One zlib stream (blosc inner codec 3): a complete deflate
    * stream per block, decompressed with the JDK Inflater, with the
    * same truncation/surplus guards the Zarr zlib chunk path uses.
    */
  private[io] def zlibDecompressBlock(src: Array[Byte], srcOff: Int, srcLen: Int,
                                      dst: Array[Byte], dstOff: Int, dstLen: Int,
                                      ctx: String): Unit = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(src, srcOff, srcLen)
      var off = 0
      while (off < dstLen && !inf.finished()) {
        val n = inf.inflate(dst, dstOff + off, dstLen - off)
        require(!inf.needsDictionary(), s"$ctx: preset-dictionary zlib block")
        require(n > 0 || !inf.needsInput(), s"$ctx: truncated zlib block")
        off += n
      }
      require(off == dstLen,
        s"$ctx: zlib block inflated to $off bytes, expected $dstLen")
    } finally inf.end()
  }

  /** Inverse byte shuffle for one block: the shuffled layout stores
    * byte `j` of every element contiguously; trailing bytes past the
    * last whole element sit verbatim at their original offsets
    * (c-blosc shuffle-generic semantics).
    */
  private[io] def unshuffle(typesize: Int, bsize: Int,
                            src: Array[Byte], dst: Array[Byte],
                            dstOff: Int): Unit = {
    val elems = bsize / typesize
    var j = 0
    while (j < typesize) {
      val base = j * elems
      var i = 0
      while (i < elems) {
        dst(dstOff + i * typesize + j) = src(base + i)
        i += 1
      }
      j += 1
    }
    var t = elems * typesize
    while (t < bsize) { dst(dstOff + t) = src(t); t += 1 }
  }
}
