package graft.ext

/** Iterative radix-2 complex FFT — the production transform behind
  * [[VorbisDecode.imdct]]'s O(n log n) path. Only the unscaled
  * INVERSE orientation (positive-exponent twiddles, no 1/n) is
  * exposed because that is the exact sum the IMDCT derivation needs:
  * S[j] = Σ_k u[k]·e^{+2πikj/n}. Validated in VorbisDecodeSpec
  * against a direct O(n²) DFT transcription and transitively by the
  * imdct-vs-imdctDirect equality property.
  *
  * In-place, allocation-free beyond the caller's arrays: the decode
  * loop calls this once per audio block per channel, so constant
  * factors matter at scale (a 100 TB audio corpus is ~10¹⁰ blocks).
  */
object Fft {

  /** Per-length twiddle tables: stage `len`'s `len/2` roots
    * e^{+2πik/len} live at indices `[len/2, len)` — n entries total
    * per transform size, cached across rows/tasks (block sizes are
    * the 8 powers of two in [64, 8192]; pure values, race-benign).
    */
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]()

  private def tablesFor(n: Int): Array[Array[Double]] =
    tables.computeIfAbsent(n, { _ =>
      val c = new Array[Double](n)
      val s = new Array[Double](n)
      var len = 2
      while (len <= n) {
        var k = 0
        while (k < len / 2) {
          val ang = 2.0 * math.Pi * k / len
          c(len / 2 + k) = math.cos(ang)
          s(len / 2 + k) = math.sin(ang)
          k += 1
        }
        len <<= 1
      }
      Array(c, s)
    })

  /** In-place unscaled inverse FFT over `re`/`im` (length a power of
    * two): replaces the arrays with Σ_k x[k]·e^{+2πikj/n}.
    */
  def inverseUnscaled(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0 && n > 0,
      "fft: length must be a power of two")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies, twiddles from the cached per-stage tables
    // (positive sign: inverse orientation)
    val tw = tablesFor(n)
    val cosT = tw(0)
    val sinT = tw(1)
    var len = 2
    while (len <= n) {
      val half = len / 2
      var blk = 0
      while (blk < n) {
        var k = 0
        while (k < half) {
          val a = blk + k
          val b = a + half
          val cr = cosT(half + k)
          val ci = sinT(half + k)
          val vr = re(b) * cr - im(b) * ci
          val vi = re(b) * ci + im(b) * cr
          re(b) = re(a) - vr
          im(b) = im(a) - vi
          re(a) += vr
          im(a) += vi
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }
}
