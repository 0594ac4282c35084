package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import javax.imageio.stream.MemoryCacheImageOutputStream

import graft.ext.{Jpeg, Multimodal}
import org.apache.spark.sql.functions._

/** Baseline-JPEG luma decode tested against the JDK's own ImageIO
  * JPEG codec: ImageIO ENCODES the fixtures (independent Huffman/DCT
  * implementation) and DECODES them back for per-pixel parity — the
  * strongest available ground truth without a codec dependency.
  */
class JpegSpec extends SparkSpec {

  private def encode(img: BufferedImage, quality: Float,
                     progressive: Boolean = false): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val baos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(baos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new IIOImage(img, null, null), p)
    ios.close(); writer.dispose()
    baos.toByteArray
  }

  private def grayImg(w: Int, h: Int)(px: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, px(x, y) & 0xFF)
    img
  }

  private def rgbImg(w: Int, h: Int)(px: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    img
  }

  test("grayscale: per-pixel parity with the JDK ImageIO decoder") {
    // odd dims exercise the MCU-padding crop; the gradient exercises
    // AC coefficients across the spectrum
    val img = grayImg(67, 41)((x, y) => (x * 3 + y * 5 + (x * y) % 31) % 256)
    val bytes = encode(img, 0.9f)
    val lp = Jpeg.decodeLuma(bytes)
    assert(lp != null, "decoder rejected an ImageIO-written baseline JPEG")
    assert(lp.w === 67 && lp.h === 41)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0.0; var sumDiff = 0.0
    for (y <- 0 until 41; x <- 0 until 67) {
      val ours = lp.plane(y * lp.planeW + x)
      // raw raster sample: getRGB would apply a gray->sRGB transform
      val theirs = ref.getRaster.getSample(x, y, 0).toDouble
      val d = math.abs(ours - theirs)
      maxDiff = math.max(maxDiff, d); sumDiff += d
    }
    // both are conforming IDCTs of the SAME coefficients: differences
    // are rounding only (T.81 permits ±1 per sample)
    assert(maxDiff <= 2.0, s"max per-pixel diff $maxDiff")
    assert(sumDiff / (67 * 41) <= 0.51, s"mean abs diff ${sumDiff / (67 * 41)}")
  }

  test("color 4:2:0: luma stats match the JDK decoder's Rec.601 luminance") {
    val img = rgbImg(64, 48) { (x, y) =>
      val r = (x * 4) % 256; val g = (y * 5) % 256; val b = (x + y) % 256
      (r << 16) | (g << 8) | b
    }
    val bytes = encode(img, 0.92f)
    val ours = Jpeg.grayFeaturesOrNull(bytes, 16)
    assert(ours != null)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var s = 0.0; var s2 = 0.0
    for (y <- 0 until 48; x <- 0 until 64) {
      val rgb = ref.getRGB(x, y)
      val lum = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
        0.114 * (rgb & 0xFF)
      s += lum; s2 += lum * lum
    }
    val n = 64 * 48
    val mean = s / n
    val std = math.sqrt(math.max(0.0, s2 / n - mean * mean))
    // our Y plane vs their Y->RGB->lum round trip: rounding only
    assert(math.abs(ours(0) - mean / 255) < 2.0 / 255, s"mean ${ours(0)} vs ${mean / 255}")
    assert(math.abs(ours(1) - std / 255) < 2.5 / 255, s"std ${ours(1)} vs ${std / 255}")
  }

  test("constant image: near-exact mean, near-zero std at high quality") {
    val bytes = encode(grayImg(40, 40)((_, _) => 180), 1.0f)
    val f = Jpeg.grayFeaturesOrNull(bytes, 16)
    assert(f != null)
    assert(math.abs(f(0) - 180.0 / 255) < 1.0 / 255)
    assert(f(1) < 1.0 / 255)
  }

  test("progressive grayscale: per-pixel parity with the JDK ImageIO decoder") {
    // odd dims exercise MCU padding; the gradient fills every AC band
    // across the writer's spectral-selection scan script
    val img = grayImg(67, 41)((x, y) => (x * 3 + y * 5 + (x * y) % 31) % 256)
    val bytes = encode(img, 0.9f, progressive = true)
    // confirm the writer actually produced SOF2 (else this test is vacuous)
    assert((0 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xC2),
      "fixture is not progressive")
    val lp = Jpeg.decodeLuma(bytes)
    assert(lp != null, "decoder rejected an ImageIO-written progressive JPEG")
    assert(lp.w === 67 && lp.h === 41)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0.0; var sumDiff = 0.0
    for (y <- 0 until 41; x <- 0 until 67) {
      val ours = lp.plane(y * lp.planeW + x)
      val theirs = ref.getRaster.getSample(x, y, 0).toDouble
      val d = math.abs(ours - theirs)
      maxDiff = math.max(maxDiff, d); sumDiff += d
    }
    assert(maxDiff <= 2.0, s"max per-pixel diff $maxDiff")
    assert(sumDiff / (67 * 41) <= 0.51, s"mean abs diff ${sumDiff / (67 * 41)}")
  }

  test("progressive color 4:2:0: luma stats match the JDK decoder") {
    val img = rgbImg(64, 48) { (x, y) =>
      val r = (x * 4) % 256; val g = (y * 5) % 256; val b = (x + y) % 256
      (r << 16) | (g << 8) | b
    }
    val bytes = encode(img, 0.92f, progressive = true)
    val ours = Jpeg.grayFeaturesOrNull(bytes, 16)
    assert(ours != null, "decoder rejected a progressive color JPEG")
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var s = 0.0; var s2 = 0.0
    for (y <- 0 until 48; x <- 0 until 64) {
      val rgb = ref.getRGB(x, y)
      val lum = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
        0.114 * (rgb & 0xFF)
      s += lum; s2 += lum * lum
    }
    val n = 64 * 48
    val mean = s / n
    val std = math.sqrt(math.max(0.0, s2 / n - mean * mean))
    assert(math.abs(ours(0) - mean / 255) < 2.0 / 255, s"mean ${ours(0)} vs ${mean / 255}")
    assert(math.abs(ours(1) - std / 255) < 2.5 / 255, s"std ${ours(1)} vs ${std / 255}")
  }

  test("out-of-scope and malformed payloads: null, never a throw") {
    val img = grayImg(32, 32)((x, y) => (x * 8 + y) % 256)
    assert(Jpeg.grayFeaturesOrNull(null, 16) == null)
    assert(Jpeg.grayFeaturesOrNull(Array[Byte](1, 2, 3, 4), 16) == null)
    val good = encode(img, 0.9f)
    for (cut <- Seq(2, 20, 100, good.length / 2, good.length - 3))
      Jpeg.grayFeaturesOrNull(good.take(cut), 16) // must not throw
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 300) {
      val m = good.clone()
      for (_ <- 0 to rnd.nextInt(4)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Jpeg.grayFeaturesOrNull(m, 8) // decode or reject cleanly
    }
    // progressive: same truncation/corruption robustness
    val prog = encode(img, 0.9f, progressive = true)
    for (cut <- Seq(2, 20, 100, prog.length / 2, prog.length - 3))
      Jpeg.grayFeaturesOrNull(prog.take(cut), 16) // must not throw
    for (_ <- 0 until 300) {
      val m = prog.clone()
      for (_ <- 0 to rnd.nextInt(4)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Jpeg.grayFeaturesOrNull(m, 8) // decode or reject cleanly
    }
  }

  // ---- hand-built sequential fixtures (12-bit / CMYK / YCCK): the
  // JDK codec can neither write nor read these, so the bitstreams are
  // assembled field-by-field with known flat-block ground truth —
  // quant all-ones, one 8×8 block per component, DC-only (IDCT of a
  // lone DC is exactly the flat value), shared 4-bit DC category
  // table + 1-bit EOB AC table.
  private def handJpeg(prec: Int, compVals: Seq[Int],
                       adobeTransform: Int = -1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xFF); b(0xD8) // SOI
    if (adobeTransform >= 0) {
      b(0xFF); b(0xEE); u16(14)
      "Adobe".foreach(c => b(c))
      u16(0x65); u16(0); u16(0); b(adobeTransform)
    }
    b(0xFF); b(0xDB); u16(2 + 1 + 64); b(0x00) // DQT pq=0 tq=0
    (0 until 64).foreach(_ => b(1))            // all-ones quant
    // DHT DC 0: sixteen 4-bit codes, value list = categories 0..15
    b(0xFF); b(0xC4); u16(2 + 17 + 16); b(0x00)
    (1 to 16).foreach(l => b(if (l == 4) 16 else 0))
    (0 until 16).foreach(b)
    // DHT AC 0: one 1-bit code -> EOB
    b(0xFF); b(0xC4); u16(2 + 17 + 1); b(0x10)
    (1 to 16).foreach(l => b(if (l == 1) 1 else 0))
    b(0x00)
    // SOF0 (8-bit) or SOF1 (12-bit), 8×8, all comps 1×1 sampling
    b(0xFF); b(if (prec == 8) 0xC0 else 0xC1)
    u16(8 + 3 * compVals.size); b(prec); u16(8); u16(8); b(compVals.size)
    compVals.indices.foreach { i => b(i + 1); b(0x11); b(0) }
    // SOS: every comp on tables 0/0
    b(0xFF); b(0xDA); u16(6 + 2 * compVals.size); b(compVals.size)
    compVals.indices.foreach { i => b(i + 1); b(0x00) }
    b(0); b(63); b(0)
    // entropy data: per comp, DC category (4 bits) + diff bits + EOB
    // (1 bit); emit bytes as they fill (with FF00 stuffing)
    var acc = 0L; var nBits = 0
    def bits(v: Int, n: Int): Unit = {
      acc = (acc << n) | (v & ((1L << n) - 1)); nBits += n
      while (nBits >= 8) {
        val byte = ((acc >> (nBits - 8)) & 0xFF).toInt
        b(byte)
        if (byte == 0xFF) b(0x00) // stuffing
        nBits -= 8
      }
    }
    val shift = 1 << (prec - 1)
    compVals.foreach { v =>
      val dc = 8 * (v - shift) // F00 of a flat block (IDCT divides by 8)
      val mag = math.abs(dc)
      val s = 32 - Integer.numberOfLeadingZeros(mag) // category (0 if dc == 0)
      bits(s, 4)
      if (s > 0) bits(if (dc >= 0) dc else dc + (1 << s) - 1, s)
      bits(0, 1) // EOB
    }
    if (nBits > 0) bits(0x7F, 8 - nBits) // 1-fill to the byte edge (T.81)
    b(0xFF); b(0xD9) // EOI
    out.toByteArray
  }

  test("12-bit extended sequential (SOF1): exact flat value, [0,255] rescale") {
    val v = 3000 // 12-bit sample
    val lp = Jpeg.decodeLuma(handJpeg(12, Seq(v)))
    assert(lp != null)
    val expect = v * 255.0 / 4095.0
    assert(math.abs(lp.plane(0) - expect) < 0.01,
      s"got ${lp.plane(0)}, want $expect")
    // 8-bit SOF1 also decodes (T.81 allows prec 8 in SOF1)
    val lp8 = Jpeg.decodeLuma(handJpeg(8, Seq(190)))
    assert(lp8 != null && math.abs(lp8.plane(0) - 190.0) < 0.01)
  }

  test("CMYK (Adobe inverted ink): BT.601 luma of c'k'/m'k'/y'k'") {
    val Seq(c, m, y, k) = Seq(200, 100, 50, 230)
    val lp = Jpeg.decodeLuma(handJpeg(8, Seq(c, m, y, k), adobeTransform = 0))
    assert(lp != null)
    val expect = (0.299 * c + 0.587 * m + 0.114 * y) * (k / 255.0)
    assert(math.abs(lp.plane(0) - expect) < 0.01,
      s"got ${lp.plane(0)}, want $expect")
    // no APP14 at all: 4 components still default to CMYK
    val lp2 = Jpeg.decodeLuma(handJpeg(8, Seq(c, m, y, k)))
    assert(lp2 != null && math.abs(lp2.plane(0) - expect) < 0.01)
  }

  test("YCCK (Adobe transform 2): gray = Y·K/255") {
    val lp = Jpeg.decodeLuma(handJpeg(8, Seq(180, 128, 128, 230),
      adobeTransform = 2))
    assert(lp != null)
    val expect = 180.0 * 230.0 / 255.0
    assert(math.abs(lp.plane(0) - expect) < 0.01,
      s"got ${lp.plane(0)}, want $expect")
  }

  test("12-bit CMYK composes: both extensions in one bitstream") {
    val Seq(c, m, y, k) = Seq(3200, 1600, 800, 3680) // 12-bit ink
    val lp = Jpeg.decodeLuma(handJpeg(12, Seq(c, m, y, k), adobeTransform = 0))
    assert(lp != null)
    val expect = (0.299 * c + 0.587 * m + 0.114 * y) * (k / 4095.0) * 255.0 / 4095.0
    assert(math.abs(lp.plane(0) - expect) < 0.01,
      s"got ${lp.plane(0)}, want $expect")
  }

  test("12-bit/CMYK fuzz: corrupted fixtures null or decode, never throw") {
    val rnd = new scala.util.Random(17)
    for (fixture <- Seq(handJpeg(12, Seq(3000)),
                        handJpeg(8, Seq(200, 100, 50, 230), adobeTransform = 0),
                        handJpeg(8, Seq(180, 128, 128, 230), adobeTransform = 2))) {
      for (cut <- Seq(2, 10, fixture.length / 2, fixture.length - 3))
        Jpeg.decodeLuma(fixture.take(cut))
      for (_ <- 0 until 300) {
        val x = fixture.clone()
        for (_ <- 0 to rnd.nextInt(4)) x(rnd.nextInt(x.length)) = rnd.nextInt(256).toByte
        Jpeg.decodeLuma(x)
      }
    }
    // subsampled 4-comp: out of scope -> null (alter comp0 sampling byte)
    val cmyk = handJpeg(8, Seq(200, 100, 50, 230), adobeTransform = 0)
    val sofAt = {
      var i = 0; var at = -1
      while (at < 0 && i < cmyk.length - 1) {
        if ((cmyk(i) & 0xFF) == 0xFF && (cmyk(i + 1) & 0xFF) == 0xC0) at = i
        i += 1
      }
      at
    }
    val sub = cmyk.clone()
    sub(sofAt + 11) = 0x22.toByte // comp 1 sampling 2×2
    assert(Jpeg.decodeLuma(sub) == null)
  }

  test("router + SQL surface: JPEG rows get REAL features, codegen plan") {
    import spark.implicits._
    GraftExtensions.install(spark)
    val jpg = encode(grayImg(24, 24)((x, _) => x * 10 % 256), 0.9f)
    val tmp = java.nio.file.Files.createTempDirectory("jpeg_assets").toString
    Seq(("a.jpg", jpg), ("junk.bin", Array[Byte](9, 8, 7)))
      .toDF("entry", "content").write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    // withFeatures: the jpg row takes the REAL decoder branch (its
    // features match withJpegFeatures bit-for-bit), junk hits the stub
    val routed = Multimodal.withFeatures(df, nBins = 16, stubDim = 16)
      .select($"entry", $"features").collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val real = Multimodal.withJpegFeatures(df.filter($"entry" === "a.jpg"))
      .select($"features").as[Seq[Double]].head()
    assert(routed("a.jpg") === real)
    assert(routed("junk.bin").length === 16)
    assert(routed("junk.bin") != real)
    val plan = Multimodal.withJpegFeatures(df).queryExecution.executedPlan.toString
    assert(plan.contains("jpeg_gray_features"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    df.createOrReplaceTempView("jpeg_assets")
    val viaSql = spark.sql(
      "SELECT jpeg_gray_features(content) AS f FROM jpeg_assets WHERE entry = 'a.jpg'")
      .as[Seq[Double]].head()
    assert(viaSql === real)
  }

  test("EXIF orientation: type-3 SHORT and type-4 LONG both read, junk degrades to 0") {
    // minimal SOI + APP1(Exif) prefix — exifOrientation only walks
    // the marker chain, so no scan data is needed
    def jpegWith(tiffEntry: Array[Int]): Array[Byte] = {
      val tiff = Array[Int](
        'I', 'I', 0x2A, 0, 8, 0, 0, 0, // LE header, IFD0 at 8
        1, 0) ++ tiffEntry ++ Array[Int](0, 0, 0, 0)
      val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++
        tiff.map(_.toByte)
      val len = payload.length + 2
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE1.toByte,
        ((len >> 8) & 0xFF).toByte, (len & 0xFF).toByte) ++ payload
    }
    // spec form: tag 0x0112, type 3 (SHORT), count 1, inline value
    assert(Jpeg.exifOrientation(jpegWith(
      Array(0x12, 0x01, 3, 0, 1, 0, 0, 0, 6, 0, 0, 0))) === 6)
    // real-world variant: type 4 (LONG), count 1, inline u32 value
    assert(Jpeg.exifOrientation(jpegWith(
      Array(0x12, 0x01, 4, 0, 1, 0, 0, 0, 8, 0, 0, 0))) === 8)
    // LONG with count != 1 (offset form) and out-of-range values → 0
    assert(Jpeg.exifOrientation(jpegWith(
      Array(0x12, 0x01, 4, 0, 2, 0, 0, 0, 8, 0, 0, 0))) === 0)
    assert(Jpeg.exifOrientation(jpegWith(
      Array(0x12, 0x01, 4, 0, 1, 0, 0, 0, 9, 0, 0, 0))) === 0)
    // other types (e.g. BYTE) stay unread
    assert(Jpeg.exifOrientation(jpegWith(
      Array(0x12, 0x01, 1, 0, 1, 0, 0, 0, 6, 0, 0, 0))) === 0)
  }
}
