package graft

import graft.ext.{Bmp, Images}
import org.scalatest.funsuite.AnyFunSuite

/** BMP pixel decode against the JDK's own encoder — ground truth from
  * a codec this code never saw, like the JPEG/PNG parity suites.
  */
class BmpSpec extends AnyFunSuite {

  private def bmpOf(w: Int, h: Int, px: (Int, Int) => Int): (Array[Byte], java.awt.image.BufferedImage) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    (baos.toByteArray, img)
  }

  test("24-bit BI_RGB: per-pixel Rec.601 parity with the JDK encoder, odd width padding") {
    // width 3 forces 4-byte row padding; arbitrary RGB per pixel
    val rnd = new scala.util.Random(17)
    val (bytes, img) = bmpOf(3, 5, (_, _) => rnd.nextInt(0xFFFFFF))
    val got = Bmp.decodeGrayOrNull(bytes)
    assert(got != null)
    val (g, w, h) = got
    assert(w === 3 && h === 5)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val want = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
        0.114 * (rgb & 0xFF)
      assert(math.abs(g(y * w + x) - want) < 1e-9, s"($x,$y)")
    }
  }

  test("BMP joins the image family: thumbnails, dHash, near-dup routing") {
    def scene(seed: Int)(x: Int, y: Int): Int = {
      val v = (127 + 90 * math.sin((1 + seed % 4) * x / 6.0 + y / 4.0 + seed)).toInt & 0xFF
      (v << 16) | (v << 8) | v
    }
    val (b1, _) = bmpOf(48, 32, scene(1))
    val (b2, _) = bmpOf(48, 32, scene(2))
    assert(Images.thumbnailOrNull(b1, 9, 8) != null)
    val h1 = Images.dhash64OrNull(b1)
    val h2 = Images.dhash64OrNull(b2)
    assert(h1 != null && h2 != null && h1 != h2)
    // identical content re-encoded: identical hash
    val (b1b, _) = bmpOf(48, 32, scene(1))
    assert(Images.dhash64OrNull(b1b) === h1)
  }

  test("GIF stills route through the image family too (round-8 first-frame decode)") {
    val img = new java.awt.image.BufferedImage(
      32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32) {
      val v = (127 + 90 * math.sin(x / 3.0 + y / 2.0)).toInt & 0xFF
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", baos)
    val gif = baos.toByteArray
    val got = Images.grayPlaneOrNull(gif)
    assert(got != null)
    assert(got._2 === 32 && got._3 === 24)
    // GIF is palette-quantized; values approximate the source
    for (y <- 0 until 24; x <- 0 until 32) {
      val rgb = img.getRGB(x, y)
      val want = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
        0.114 * (rgb & 0xFF)
      assert(math.abs(got._1(y * 32 + x) - want) < 16.0, s"($x,$y)")
    }
    assert(Images.dhash64OrNull(gif) != null)
  }

  test("scope boundaries and fuzz: null, never a throw") {
    assert(Bmp.decodeGrayOrNull(null) === null)
    assert(Bmp.decodeGrayOrNull("BMnope".getBytes) === null)
    val (good, _) = bmpOf(8, 8, (x, y) => (x * 32) << 8 | y * 32)
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 300) {
      val m = good.clone()
      for (_ <- 0 to rnd.nextInt(5)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Bmp.decodeGrayOrNull(m)
    }
    for (cut <- Seq(1, 13, 53, good.length / 2)) Bmp.decodeGrayOrNull(good.take(cut))
  }
}
