package graft

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier, ImageWriteParam}
import javax.imageio.metadata.IIOMetadataNode
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

import graft.ext.{Gif, Multimodal}
import org.apache.spark.sql.functions._

/** GIF frame decode tested against the JDK's OWN ImageIO GIF codec as
  * an independent implementation: ImageIO WRITES the fixtures (real
  * LZW from a second encoder, not ours) and, for the parity test,
  * ImageIO READS them back so our decoder's per-frame stats are
  * checked against an independent decode of the same bytes.
  */
class GifSpec extends SparkSpec {

  // ---------- ImageIO-based fixture encoder ----------

  /** 256-level grayscale indexed image; pixel (x,y) → palette index
    * (= gray value, so luminance is the index itself).
    */
  private def grayImg(w: Int, h: Int)(px: (Int, Int) => Int): BufferedImage = {
    val ramp = Array.tabulate(256)(_.toByte)
    val icm = new IndexColorModel(8, 256, ramp, ramp, ramp)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, px(x, y) & 0xFF)
    img
  }

  private case class GFrame(img: BufferedImage, x: Int = 0, y: Int = 0,
                            delayCs: Int = 5, disposal: String = "doNotDispose",
                            transparentIdx: Int = -1)

  private def writeGifImpl(frames: Seq[GFrame], interlaced: Boolean): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(baos)
    writer.setOutput(ios)
    // GIFImageWriteParam: MODE_DEFAULT = interlaced, MODE_DISABLED =
    // sequential (the metadata interlaceFlag is overridden by these)
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(
      if (interlaced) ImageWriteParam.MODE_DEFAULT else ImageWriteParam.MODE_DISABLED)
    writer.prepareWriteSequence(null)
    frames.foreach { f =>
      val meta = writer.getDefaultImageMetadata(new ImageTypeSpecifier(f.img), param)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      def child(name: String): IIOMetadataNode = {
        var n = root.getFirstChild
        while (n != null && n.getNodeName != name) n = n.getNextSibling
        if (n != null) n.asInstanceOf[IIOMetadataNode]
        else { val c = new IIOMetadataNode(name); root.appendChild(c); c }
      }
      val gce = child("GraphicControlExtension")
      gce.setAttribute("disposalMethod", f.disposal)
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag",
        if (f.transparentIdx >= 0) "TRUE" else "FALSE")
      gce.setAttribute("delayTime", f.delayCs.toString)
      gce.setAttribute("transparentColorIndex",
        math.max(0, f.transparentIdx).toString)
      val desc = child("ImageDescriptor")
      desc.setAttribute("imageLeftPosition", f.x.toString)
      desc.setAttribute("imageTopPosition", f.y.toString)
      if (interlaced) desc.setAttribute("interlaceFlag", "TRUE")
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(f.img, null, meta), param)
    }
    writer.endWriteSequence(); ios.close()
    baos.toByteArray
  }

  private def writeGif(frames: Seq[GFrame]): Array[Byte] =
    writeGifImpl(frames, interlaced = false)

  // ---------- kernel tests ----------

  test("interlaced frames decode identically to sequential ones") {
    val frames = Seq(
      GFrame(grayImg(32, 23)((x, y) => (x * 11 + y * 5) % 256)), // odd height: uneven passes
      GFrame(grayImg(32, 23)((x, y) => (3 * x + y * y) % 256)))
    val seqBytes = writeGifImpl(frames, interlaced = false)
    val intBytes = writeGifImpl(frames, interlaced = true)
    assert(!java.util.Arrays.equals(seqBytes, intBytes), "fixture not actually interlaced")
    val a = Gif.frameFeaturesOrNull(seqBytes, 16, 1, 256)
    val b = Gif.frameFeaturesOrNull(intBytes, 16, 1, 256)
    assert(a != null && b != null)
    assert(a.length === b.length)
    a.zip(b).foreach { case (ra, rb) => assert(ra.toSeq === rb.toSeq) }
  }

  test("ImageIO-encoded constant frames: count, timeline, exact means") {
    val bytes = writeGif(Seq(
      GFrame(grayImg(16, 16)((_, _) => 10)),
      GFrame(grayImg(16, 16)((_, _) => 100)),
      GFrame(grayImg(16, 16)((_, _) => 250))))
    val f = Gif.frameFeaturesOrNull(bytes, 16, 1, 256)
    assert(f != null, "decoder rejected an ImageIO-written GIF")
    assert(f.length === 3)
    assert(f.map(_(0)).toSeq === Seq(0.0, 1.0, 2.0))
    assert(f.map(_(1)).toSeq === Seq(0.0, 50.0, 100.0)) // 5 cs per frame
    assert(math.abs(f(0)(2) - 10.0 / 255) < 1e-12)
    assert(math.abs(f(1)(2) - 100.0 / 255) < 1e-12)
    assert(math.abs(f(2)(2) - 250.0 / 255) < 1e-12)
  }

  test("decode parity vs the JDK ImageIO READER on gradient frames") {
    // patterned content exercises real LZW dictionary growth
    val bytes = writeGif(Seq(
      GFrame(grayImg(32, 24)((x, y) => (x * 7 + y * 3) % 256)),
      GFrame(grayImg(32, 24)((x, y) => (x * x + 2 * y) % 256)),
      GFrame(grayImg(32, 24)((x, y) => (255 - x * 5 + y) % 256))))
    val ours = Gif.frameFeaturesOrNull(bytes, 16, 1, 256)
    assert(ours != null && ours.length === 3)
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(new MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    for (i <- 0 until 3) {
      val img = reader.read(i) // full-canvas frames: frame == canvas
      var s = 0.0; var s2 = 0.0
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
        s += lum; s2 += lum * lum
      }
      val n = img.getWidth * img.getHeight
      val mean = s / n
      val std = math.sqrt(math.max(0.0, s2 / n - mean * mean))
      assert(math.abs(ours(i)(2) - mean / 255) < 1e-9, s"frame $i mean")
      assert(math.abs(ours(i)(3) - std / 255) < 1e-6, s"frame $i std")
    }
    reader.dispose()
  }

  test("region frame composites at its (left, top) offset") {
    val bytes = writeGif(Seq(
      GFrame(grayImg(16, 16)((_, _) => 100)),
      GFrame(grayImg(8, 8)((_, _) => 200), x = 4, y = 4)))
    val f = Gif.frameFeaturesOrNull(bytes, 16, 1, 256)
    assert(f != null && f.length === 2)
    assert(math.abs(f(0)(2) - 100.0 / 255) < 1e-12)
    assert(math.abs(f(1)(2) - (192 * 100.0 + 64 * 200.0) / 256 / 255) < 1e-12)
  }

  test("transparent pixels leave the prior canvas visible") {
    // frame 1: left half transparent (index 7), right half 200
    val bytes = writeGif(Seq(
      GFrame(grayImg(16, 16)((_, _) => 100)),
      GFrame(grayImg(16, 16)((x, _) => if (x < 8) 7 else 200), transparentIdx = 7)))
    val f = Gif.frameFeaturesOrNull(bytes, 16, 1, 256)
    assert(f != null && f.length === 2)
    assert(math.abs(f(1)(2) - (128 * 100.0 + 128 * 200.0) / 256 / 255) < 1e-12)
  }

  test("restoreToPrevious disposal reverts the region") {
    val bytes = writeGif(Seq(
      GFrame(grayImg(16, 16)((_, _) => 100)),
      GFrame(grayImg(8, 8)((_, _) => 250), x = 4, y = 4, disposal = "restoreToPrevious"),
      GFrame(grayImg(2, 2)((_, _) => 100)))) // tiny same-value repaint
    val f = Gif.frameFeaturesOrNull(bytes, 16, 1, 256)
    assert(f != null && f.length === 3)
    assert(math.abs(f(1)(2) - (192 * 100.0 + 64 * 250.0) / 256 / 255) < 1e-12)
    assert(math.abs(f(2)(2) - 100.0 / 255) < 1e-12) // canvas reverted
  }

  test("stride/maxFrames; malformed payloads return null, never throw") {
    val frames = (0 until 6).map(i => GFrame(grayImg(8, 8)((_, _) => 40 * i)))
    val bytes = writeGif(frames)
    val sampled = Gif.frameFeaturesOrNull(bytes, 4, 2, 256)
    assert(sampled.map(_(0)).toSeq === Seq(0.0, 2.0, 4.0))
    val capped = Gif.frameFeaturesOrNull(bytes, 4, 1, 2)
    assert(capped.map(_(0)).toSeq === Seq(0.0, 1.0))
    assert(Gif.frameFeaturesOrNull(null, 16, 1, 256) == null)
    assert(Gif.frameFeaturesOrNull(Array[Byte](1, 2, 3), 16, 1, 256) == null)
    assert(Gif.frameFeaturesOrNull("GIF89a".getBytes, 16, 1, 256) == null)
    // seeded byte-mutation fuzz over a valid fixture: every mutant
    // must decode or reject cleanly (no exception escapes the kernel)
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 300) {
      val m = bytes.clone()
      val n = 1 + rnd.nextInt(4)
      for (_ <- 0 until n) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Gif.frameFeaturesOrNull(m, 8, 1, 64) // must not throw
    }
    for (cut <- Seq(1, 7, 14, 40, bytes.length - 2)) {
      Gif.frameFeaturesOrNull(bytes.take(cut), 8, 1, 64) // must not throw
    }
  }

  // ---------- Spark surface ----------

  test("withVideoFrames runs unchanged on a STREAM: value-exact batch parity") {
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("entry", StringType), StructField("content", BinaryType)))
    val dir = java.nio.file.Files.createTempDirectory("vidstream").toString
    val gifs = (0 until 3).map { i =>
      (s"clip$i.gif", writeGif(Seq(
        GFrame(grayImg(8, 8)((x, y) => (x * 9 + y * i * 5) % 256)),
        GFrame(grayImg(8, 8)((x, y) => (i * 40 + x + y) % 256)))))
    }
    import spark.implicits._
    gifs.foreach { case (e, b) => // one file per micro-batch
      spark.createDataFrame(Seq((e, b)).toDF("entry", "content").rdd, sch)
        .coalesce(1).write.mode("append").parquet(dir)
    }
    // the SAME transform, batch and stream (narrow ops only — no
    // state, no watermark needed)
    val batch = Multimodal.withVideoFrames(spark.read.parquet(dir), nBins = 4)
      .select($"entry", $"frame_idx", $"t_ms", $"features")
    val q = Multimodal.withVideoFrames(
        spark.readStream.schema(sch).option("maxFilesPerTrigger", "1").parquet(dir),
        nBins = 4)
      .select($"entry", $"frame_idx", $"t_ms", $"features")
      .writeStream.format("memory").queryName("vidframes")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("vidframes").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getSeq[Double](3)))
        .toSet
      val batched = batch.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getSeq[Double](3)))
        .toSet
      assert(streamed.nonEmpty && streamed === batched)
    } finally q.stop()
  }

  test("withVideoFrames routes GIF and APNG by content; SQL surface; codegen plan") {
    import spark.implicits._
    GraftExtensions.install(spark)
    val gif = writeGif(Seq(
      GFrame(grayImg(8, 8)((_, _) => 60)),
      GFrame(grayImg(8, 8)((_, _) => 180))))
    // a 2-frame APNG from the ApngSpec encoder shape, inline here
    val apngBytes = {
      def be32(v: Int) = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      def chunk(typ: String, data: Array[Byte]) = {
        val t = typ.getBytes("US-ASCII")
        val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
        be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
      }
      def gray(v: Int) = {
        val raw = new Array[Byte]((1 + 8 * 4) * 8)
        for (y <- 0 until 8) {
          val row = y * 33; raw(row) = 0
          for (x <- 0 until 8) {
            val o = row + 1 + x * 4
            raw(o) = v.toByte; raw(o + 1) = v.toByte; raw(o + 2) = v.toByte; raw(o + 3) = -1
          }
        }
        val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
        val out = new ByteArrayOutputStream(); val buf = new Array[Byte](4096)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end(); out.toByteArray
      }
      def fctl(seq: Int) = chunk("fcTL", be32(seq) ++ be32(8) ++ be32(8) ++ be32(0) ++
        be32(0) ++ Array[Byte](0, 1, 0, 25, 0, 0))
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
        chunk("IHDR", be32(8) ++ be32(8) ++ Array[Byte](8, 6, 0, 0, 0)) ++
        chunk("acTL", be32(2) ++ be32(0)) ++
        fctl(0) ++ chunk("IDAT", gray(30)) ++
        fctl(1) ++ chunk("fdAT", be32(2) ++ gray(90)) ++
        chunk("IEND", Array.empty[Byte])
    }
    val tmp = java.nio.file.Files.createTempDirectory("gif_assets").toString
    Seq(("a.gif", gif), ("b.apng", apngBytes), ("c.bin", Array[Byte](1, 2, 3)))
      .toDF("entry", "content").write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    val out = Multimodal.withVideoFrames(df, nBins = 4)
    val rows = out.select($"entry", $"frame_idx", $"features")
      .orderBy($"entry", $"frame_idx").collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("a.gif", 0), ("a.gif", 1), ("b.apng", 0), ("b.apng", 1)))
    assert(math.abs(rows(0).getSeq[Double](2).head - 60.0 / 255) < 1e-12)
    assert(math.abs(rows(2).getSeq[Double](2).head - 30.0 / 255) < 1e-12)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("gif_frame_features") && plan.contains("apng_frame_features"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // SQL path
    df.createOrReplaceTempView("gif_assets")
    val sql = spark.sql(
      """SELECT f[0] AS frame_idx, f[2] AS mean
        |FROM gif_assets
        |LATERAL VIEW explode(gif_frame_features(content, 4)) t AS f
        |ORDER BY frame_idx""".stripMargin).collect()
    assert(sql.map(_.getDouble(0)).toSeq === Seq(0.0, 1.0))
    assert(math.abs(sql(1).getDouble(1) - 180.0 / 255) < 1e-12)
  }
}
