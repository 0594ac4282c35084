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
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = 2.0 * math.Pi / len // positive: inverse orientation
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blk + k
          val b = a + len / 2
          val vr = re(b) * cr - im(b) * ci
          val vi = re(b) * ci + im(b) * cr
          re(b) = re(a) - vr
          im(b) = im(a) - vi
          re(a) += vr
          im(a) += vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }
}
