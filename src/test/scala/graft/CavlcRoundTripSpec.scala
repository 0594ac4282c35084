package graft

import graft.ext.H264
import org.scalatest.funsuite.AnyFunSuite

/** CAVLC round-trip: an independent ENCODER for residual_block written
  * in this spec straight from clause 9.2 (coeff_token/total_zeros/
  * run_before by reverse table lookup, level prefix/suffix with the
  * adaptation and escape rules), driven by randomized coefficient
  * blocks through [[H264.residualBlock]]. This reaches the paths no
  * hand golden covers — suffixLength growth, the prefix-14 four-bit
  * escape at suffixLength 0, the prefix-15 twelve-bit escape, long
  * runs, every nC table — and proves encode∘decode = id against the
  * SAME tables the decoder trusts (prefix-freeness already verified
  * structurally in H264Spec).
  */
class CavlcRoundTripSpec extends AnyFunSuite {

  private final class Bits {
    val sb = new StringBuilder
    def add(s: String): Unit = sb.append(s)
    def addBits(v: Int, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => sb.append(((v >> i) & 1).toString))
    def bytes(): Array[Byte] = {
      val s = sb.toString + "1" + "0" * 7 // pad: decoder never reads past
      val out = new Array[Byte]((s.length + 7) / 8)
      for (i <- s.indices if s(i) == '1')
        out(i / 8) = (out(i / 8) | (1 << (7 - (i % 8)))).toByte
      out
    }
  }

  private def codeOf(v: H264.Vlc, sym: Int): String = {
    val i = v.syms.indexOf(sym)
    assert(i >= 0, s"symbol $sym not in table")
    val s = Integer.toBinaryString(v.codes(i))
    "0" * (v.lens(i) - s.length) + s
  }

  /** Encode one residual block (coeffs in SCAN order, startIdx as in
    * the decoder) per 9.2; returns bits.
    */
  private def encode(bits: Bits, nC: Int, maxCoeff: Int,
                     coeffs: Array[Int], startIdx: Int): Unit = {
    val idxs = (startIdx until startIdx + maxCoeff).filter(coeffs(_) != 0)
    val totalCoeff = idxs.length
    // trailing ones: consecutive |1|s from the highest frequency, <= 3
    var t1 = 0
    var i = idxs.length - 1
    while (i >= 0 && t1 < 3 && math.abs(coeffs(idxs(i))) == 1) { t1 += 1; i -= 1 }
    val tokSym = totalCoeff * 4 + t1
    if (nC == -1) bits.add(codeOf(H264.CoeffTokenChromaDc, tokSym))
    else if (nC < 2) bits.add(codeOf(H264.CoeffToken0, tokSym))
    else if (nC < 4) bits.add(codeOf(H264.CoeffToken1, tokSym))
    else if (nC < 8) bits.add(codeOf(H264.CoeffToken2, tokSym))
    else bits.addBits(if (totalCoeff == 0) 3 else ((totalCoeff - 1) << 2) | t1, 6)
    if (totalCoeff == 0) return
    // T1 signs, highest frequency first
    for (k <- 0 until t1)
      bits.add(if (coeffs(idxs(idxs.length - 1 - k)) < 0) "1" else "0")
    // levels, highest -> lowest frequency after the T1s
    var suffixLength = if (totalCoeff > 10 && t1 < 3) 1 else 0
    for (k <- t1 until totalCoeff) {
      val level = coeffs(idxs(idxs.length - 1 - k))
      var lc = if (level > 0) 2 * level - 2 else -2 * level - 1
      if (k == t1 && t1 < 3) lc -= 2
      assert(lc >= 0, s"levelCode $lc")
      if (suffixLength == 0) {
        if (lc < 14) { bits.addBits(1, lc + 1) } // lc zeros then 1
        else if (lc < 30) { bits.addBits(1, 15); bits.addBits(lc - 14, 4) }
        else { bits.addBits(1, 16); bits.addBits(lc - 30, 12) } // prefix 15
      } else {
        val cap = 15 << suffixLength
        if (lc < cap) {
          bits.addBits(1, (lc >> suffixLength) + 1)
          bits.addBits(lc & ((1 << suffixLength) - 1), suffixLength)
        } else { bits.addBits(1, 16); bits.addBits(lc - cap, 12) }
      }
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
    }
    // total_zeros
    val highestIdx = idxs.last - startIdx
    val totalZeros = highestIdx + 1 - totalCoeff
    if (totalCoeff < maxCoeff) {
      if (nC == -1) bits.add(codeOf(H264.TotalZerosChromaDc(totalCoeff), totalZeros))
      else bits.add(codeOf(H264.TotalZeros4x4(totalCoeff), totalZeros))
    }
    // run_before, highest -> lowest frequency, last one implicit
    var zerosLeft = totalZeros
    for (k <- 0 until totalCoeff - 1) {
      val cur = idxs(idxs.length - 1 - k) // scan position of this coeff
      val next = idxs(idxs.length - 2 - k)
      val run = cur - next - 1
      if (zerosLeft > 0) {
        if (zerosLeft <= 6) bits.add(codeOf(H264.RunBefore(zerosLeft), run))
        else if (run < 7) bits.addBits(7 - run, 3)
        else { bits.addBits(0, 3); bits.addBits(1, run - 7 + 1) }
        zerosLeft -= run
      } else assert(run == 0)
    }
  }

  private def roundTrip(nC: Int, maxCoeff: Int, coeffs: Array[Int],
                        startIdx: Int): Unit = {
    val bits = new Bits
    encode(bits, nC, maxCoeff, coeffs, startIdx)
    val out = new Array[Int](startIdx + maxCoeff)
    val got = H264.residualBlock(new H264.Br(bits.bytes()), nC, maxCoeff,
      out, startIdx)
    assert(out.toSeq === coeffs.toSeq,
      s"nC=$nC maxCoeff=$maxCoeff start=$startIdx coeffs=${coeffs.toSeq}")
    assert(got === coeffs.count(_ != 0))
  }

  test("randomized round-trip: all nC tables, escapes, runs, suffix growth") {
    val rnd = new scala.util.Random(97)
    var trials = 0
    for (_ <- 0 until 4000) {
      val (nC, maxCoeff, startIdx) = rnd.nextInt(6) match {
        case 0 => (-1, 4, 0) // chroma DC
        case 1 => (0, 16, 0)
        case 2 => (1, 16, 0)
        case 3 => (3, 15, 1) // AC block, mid table
        case 4 => (5, 16, 0)
        case _ => (9, 16, 0) // FLC region
      }
      val coeffs = new Array[Int](startIdx + maxCoeff)
      val density = rnd.nextDouble() * 0.9
      for (i <- startIdx until startIdx + maxCoeff if rnd.nextDouble() < density) {
        coeffs(i) = rnd.nextInt(5) match {
          case 0 => if (rnd.nextBoolean()) 1 else -1
          case 1 | 2 => rnd.nextInt(5) + 1 - (if (rnd.nextBoolean()) 0 else 2 * (rnd.nextInt(5) + 1))
          case 3 => (rnd.nextInt(60) + 2) * (if (rnd.nextBoolean()) 1 else -1)
          case _ => (rnd.nextInt(1800) + 16) * (if (rnd.nextBoolean()) 1 else -1)
        }
        if (coeffs(i) == 0) coeffs(i) = 1
      }
      roundTrip(nC, maxCoeff, coeffs, startIdx)
      trials += 1
    }
    assert(trials === 4000)
  }

  test("directed escape cases: prefix-14 window, prefix-15 at both suffix states") {
    // suffixLength 0, levelCode 13 (prefix-13 boundary) / 14..29
    // (4-bit escape) / 30+ (12-bit escape)
    for (level <- Seq(8, 9, 15, 16, 17, 100, 500, 2000)) {
      val c = new Array[Int](16)
      c(0) = level
      roundTrip(0, 16, c, 0)
      c(0) = -level
      roundTrip(0, 16, c, 0)
    }
    // big levels AFTER a trailing one: first-coefficient adjust + growth
    val c2 = new Array[Int](16)
    c2(0) = 700; c2(3) = -44; c2(7) = 1
    roundTrip(0, 16, c2, 0)
    // full block (no total_zeros), all big
    val c3 = Array.fill(16)(33)
    roundTrip(9, 16, c3, 0)
    // chroma DC full
    roundTrip(-1, 4, Array(5, -1, 2, 1), 0)
  }
}
