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
}
