package graft

import graft.ext.{Images, Tiff}
import org.scalatest.funsuite.AnyFunSuite

/** TIFF pixel decode against the JDK's own TIFF plugin (JDK 9+) —
  * the BmpSpec methodology: ground truth from a codec this code
  * never saw.
  */
class TiffSpec extends AnyFunSuite {

  private def tiffOf(w: Int, h: Int, gray: Boolean,
                     px: (Int, Int) => Int): (Array[Byte], java.awt.image.BufferedImage) = {
    val tpe = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
              else java.awt.image.BufferedImage.TYPE_INT_RGB
    val img = new java.awt.image.BufferedImage(w, h, tpe)
    for (y <- 0 until h; x <- 0 until w)
      if (gray) img.getRaster.setSample(x, y, 0, px(x, y) & 0xFF)
      else img.setRGB(x, y, px(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, "tiff", baos)
    assume(ok, "JDK TIFF writer unavailable")
    (baos.toByteArray, img)
  }

  test("8-bit grayscale: per-pixel parity with the JDK encoder") {
    val (bytes, img) = tiffOf(7, 5, gray = true, (x, y) => x * 31 + y * 7)
    val got = Tiff.decodeGrayOrNull(bytes)
    assert(got != null, "JDK TIFF output not in the baseline subset?")
    val (g, w, h) = got
    assert(w === 7 && h === 5)
    for (y <- 0 until h; x <- 0 until w)
      assert(g(y * w + x) === img.getRaster.getSample(x, y, 0).toDouble, s"($x,$y)")
  }

  test("24-bit RGB: Rec.601 parity; routed through the Images family") {
    val rnd = new scala.util.Random(41)
    val (bytes, img) = tiffOf(6, 4, gray = false, (_, _) => rnd.nextInt(0xFFFFFF))
    val got = Tiff.decodeGrayOrNull(bytes)
    assert(got != null)
    val (g, w, h) = got
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val want = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
        0.114 * (rgb & 0xFF)
      assert(math.abs(g(y * w + x) - want) < 1e-9, s"($x,$y)")
    }
    assert(Images.dhash64OrNull(bytes) != null)
    assert(Images.thumbnailOrNull(bytes, 9, 8) != null)
  }

  test("out-of-scope and fuzz: null, never a throw") {
    assert(Tiff.decodeGrayOrNull(null) === null)
    assert(Tiff.decodeGrayOrNull("II*noise".getBytes) === null)
    val (good, _) = tiffOf(8, 8, gray = true, (x, y) => x * y)
    val rnd = new scala.util.Random(43)
    for (_ <- 0 until 300) {
      val m = good.clone()
      for (_ <- 0 to rnd.nextInt(5)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Tiff.decodeGrayOrNull(m)
    }
    for (cut <- Seq(2, 9, 30, good.length / 2)) Tiff.decodeGrayOrNull(good.take(cut))
  }

  /** Minimal hand-written grayscale TIFF (LE) with an Orientation
    * entry — the JDK writer never emits tag 274, so the tag path
    * needs its own fixture.
    */
  private def tiffOriented(w: Int, h: Int, orientation: Int,
                           px: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def u32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    out.write('I'); out.write('I'); u16(42); u32(8)
    val nEntries = 10
    val stripOff = 8 + 2 + 12 * nEntries + 4
    u16(nEntries)
    def entry(tag: Int, typ: Int, value: Long): Unit = {
      u16(tag); u16(typ); u32(1)
      if (typ == 3) { u16(value.toInt); u16(0) } else u32(value)
    }
    entry(256, 3, w)             // ImageWidth
    entry(257, 3, h)             // ImageLength
    entry(258, 3, 8)             // BitsPerSample
    entry(259, 3, 1)             // Compression
    entry(262, 3, 1)             // Photometric BlackIsZero
    entry(273, 4, stripOff)      // StripOffsets
    entry(274, 3, orientation)   // Orientation
    entry(277, 3, 1)             // SamplesPerPixel
    entry(278, 3, h)             // RowsPerStrip
    entry(279, 4, w.toLong * h)  // StripByteCounts
    u32(0) // next IFD
    for (y <- 0 until h; x <- 0 until w) out.write(px(x, y) & 0xFF)
    out.toByteArray
  }

  test("orientation tag 274: all eight transforms hash the DISPLAYED image") {
    // asymmetric 3x2 scene: stored values index (x, y) uniquely
    def scene(x: Int, y: Int): Int = 10 * (y + 1) + x
    // hand goldens for the displayed plane per orientation
    val w = 3; val h = 2
    val base = Array.tabulate(h, w)((y, x) => scene(x, y).toDouble)
    val expect: Map[Int, (Array[Double], Int, Int)] = Map(
      1 -> (base.flatten, 3, 2),
      2 -> (Array(12.0, 11, 10, 22, 21, 20), 3, 2), // mirror horizontal
      3 -> (Array(22.0, 21, 20, 12, 11, 10), 3, 2), // rotate 180
      4 -> (Array(20.0, 21, 22, 10, 11, 12), 3, 2), // mirror vertical
      5 -> (Array(10.0, 20, 11, 21, 12, 22), 2, 3), // transpose
      6 -> (Array(20.0, 10, 21, 11, 22, 12), 2, 3), // rotate 90 CW
      7 -> (Array(22.0, 12, 21, 11, 20, 10), 2, 3), // transverse
      8 -> (Array(12.0, 22, 11, 21, 10, 20), 2, 3)) // rotate 270 CW
    for ((o, (want, ww, wh)) <- expect) {
      // the STORED plane is the inverse transform of the displayed
      // scene, so decode-with-orientation must return the scene...
      // simpler and equivalent: store the scene itself and check the
      // decoder displays the TRANSFORMED plane per the tag
      val bytes = tiffOriented(w, h, o, scene)
      val got = Tiff.decodeGrayOrNull(bytes)
      assert(got != null, s"o=$o")
      assert(got._2 === ww && got._3 === wh, s"o=$o dims")
      assert(got._1.toSeq === want.toSeq, s"o=$o plane")
    }
    // orientation 1 and an absent tag decode identically
    val plain = tiffOriented(w, h, 1, scene)
    assert(Tiff.decodeGrayOrNull(plain)._1.toSeq === base.flatten.toSeq)
    // fingerprint recall: a pre-rotated twin pairs with its upright
    // original only through normalization (the q84 EXIF rule, TIFF arm)
    def bigScene(x: Int, y: Int): Int =
      (127 + 55 * math.sin(x / 5.0 + y / 3.0) + 40 * math.cos(y / 2.0 - x / 7.0)).toInt & 0xFF
    val upright = tiffOriented(48, 32, 1, bigScene)
    // stored = rotate-90-CCW of the scene; tag 6 says rotate 90 CW to display
    val stored = graft.ext.Images.orientGray(
      Array.tabulate(48 * 32)(p => bigScene(p % 48, p / 48).toDouble), 48, 32, 8)
    val rotated = tiffOriented(32, 48, 6, (x, y) => stored._1(y * 32 + x).toInt)
    val h1 = Images.dhash64OrNull(upright)
    val h2 = Images.dhash64OrNull(rotated)
    assert(h1 != null && h2 != null)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 1, s"rotated twin drifted: ${java.lang.Long.bitCount(h1 ^ h2)}")
  }
}
