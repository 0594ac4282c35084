package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import javax.imageio.stream.MemoryCacheImageOutputStream

import graft.ext.{Jpeg, Mjpeg, Multimodal}
import org.apache.spark.sql.functions._

/** MJPEG-in-MP4 frame decode: a hand-assembled ISO BMFF container
  * around ImageIO-encoded JPEG samples (independent encoder), checked
  * sample-for-sample against the direct [[Jpeg]] features and through
  * the content-routed `withVideoFrames` pipeline.
  */
class MjpegSpec extends SparkSpec {
  import spark.implicits._

  private def encodeJpeg(img: BufferedImage): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val baos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(baos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.9f)
    writer.write(null, new IIOImage(img, null, null), p)
    ios.close(); writer.dispose()
    baos.toByteArray
  }

  private def frame(seed: Int): Array[Byte] = {
    val img = new BufferedImage(48, 32, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 32; x <- 0 until 48)
      img.getRaster.setSample(x, y, 0, (x * 2 + y * 7 + seed * 41) % 256)
    encodeJpeg(img)
  }

  // ---- minimal ISO BMFF writer (only the boxes the reader consumes)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(tag: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(body.length + 8L) ++ tag.getBytes("US-ASCII") ++ body
  }

  /** Container with one MJPEG track: samples packed into TWO chunks
    * (first_chunk mapping 1→2 samples, 3→1 sample) so the stsc walk
    * is actually exercised; timescale 1000, per-sample duration 40
    * (25 fps → t_ms = 0, 40, 80, ...).
    */
  private def mp4(fourcc: String, samples: Seq[Array[Byte]]): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes, be32(0x200), "isomiso2".getBytes)
    val mdatBody = samples.flatten.toArray
    val mdatOff = ftyp.length + 8L // absolute offset of first sample
    val perChunk = samples.grouped(2).toSeq // 2 samples per chunk (last may be 1)
    val chunkOffs = perChunk.scanLeft(mdatOff)((o, c) => o + c.map(_.length).sum).init
    val stsd = box("stsd", be32(0), be32(1),
      be32(86), fourcc.getBytes("US-ASCII"), new Array[Byte](78))
    val stts = box("stts", be32(0), be32(1), be32(samples.length), be32(40))
    val stscEntries =
      if (samples.length <= 2) Seq(be32(1), be32(samples.length), be32(1))
      else Seq(be32(1), be32(2), be32(1)) ++ // chunks 1.. : 2 samples each
        (if (samples.length % 2 == 1)
           Seq(be32(perChunk.length.toLong), be32(1), be32(1)) else Seq.empty)
    val stsc = box("stsc", be32(0), be32(if (samples.length > 2 && samples.length % 2 == 1) 2 else 1),
      stscEntries.flatten.toArray)
    val stsz = box("stsz", be32(0), be32(0), be32(samples.length),
      samples.map(s => be32(s.length.toLong)).flatten.toArray)
    val stco = box("stco", be32(0), be32(chunkOffs.length.toLong),
      chunkOffs.map(be32).flatten.toArray)
    val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(1000), be32(0), be32(0x55c40000L))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd, minf)
    val trak = box("trak", mdia)
    val mvhd = box("mvhd", new Array[Byte](100))
    val moov = box("moov", mvhd, trak)
    ftyp ++ box("mdat", mdatBody) ++ moov
  }

  private val frames5 = (0 until 5).map(frame)
  private lazy val video = mp4("jpeg", frames5)

  test("samples decode to the exact per-frame JPEG features, with stts timing") {
    val rows = Mjpeg.frameFeaturesOrNull(video, nBins = 8, stride = 1, maxFrames = 256)
    assert(rows != null && rows.length === 5)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r(0) === i.toDouble)
      assert(r(1) === 40.0 * i) // 25 fps from stts/mdhd
      val direct = Jpeg.grayFeaturesOrNull(frames5(i), 8)
      assert(r.drop(2).toSeq === direct.toSeq, s"frame $i")
    }
  }

  test("stride skips decode but keeps frame_idx and timing") {
    val rows = Mjpeg.frameFeaturesOrNull(video, nBins = 8, stride = 2, maxFrames = 256)
    assert(rows.map(_(0)).toSeq === Seq(0.0, 2.0, 4.0))
    assert(rows.map(_(1)).toSeq === Seq(0.0, 80.0, 160.0))
  }

  test("non-MJPEG fourcc, truncation, and garbage all yield null") {
    assert(Mjpeg.frameFeaturesOrNull(mp4("avc1", frames5), 8, 1, 256) === null)
    assert(Mjpeg.frameFeaturesOrNull(video.take(video.length / 2), 8, 1, 256) === null)
    assert(Mjpeg.frameFeaturesOrNull("not a video".getBytes, 8, 1, 256) === null)
    // a corrupted sample poisons the payload rather than emitting wrong rows
    val bad = video.clone()
    val firstSampleOff = bad.indexOfSlice(frames5.head.take(4)) + 2
    bad(firstSampleOff) = 0x00 // break the JPEG marker stream
    assert(Mjpeg.frameFeaturesOrNull(bad, 8, 1, 256) === null)
  }

  test("non-ascending stsc first_chunk table is rejected (quadratic-walk guard)") {
    // 5 samples → two stsc entries (1,2,1),(3,1,1); rewrite the second
    // entry's first_chunk to 1 so the table is non-ascending. The
    // monotone-cursor walk must reject it rather than mis-map (or, in
    // the old from-zero rescan form, burn quadratic work on it).
    val bad = video.clone()
    val stscOff = bad.indexOfSlice("stsc".getBytes("US-ASCII"))
    assert(stscOff > 0)
    // [tag][ver 4][count 4][entry1 12][entry2 first_chunk at +4+8+12]
    val e2 = stscOff + 4 + 8 + 12
    bad(e2) = 0; bad(e2 + 1) = 0; bad(e2 + 2) = 0; bad(e2 + 3) = 1
    assert(Mjpeg.frameFeaturesOrNull(bad, 8, 1, 256) === null)
  }

  test("withVideoFrames routes MP4-MJPEG next to GIF by content, UDF-free") {
    val df = Seq(
      (1L, video),
      (2L, "plain bytes".getBytes)).toDF("asset_id", "content")
    val out = Multimodal.withVideoFrames(df, nBins = 8)
    val got = out.select($"asset_id", $"frame_idx", $"t_ms").collect()
    assert(got.length === 5 && got.forall(_.getLong(0) === 1L))
    assert(out.queryExecution.executedPlan.toString.indexOf("ScalaUDF") < 0)
    // SQL surface
    GraftExtensions.install(spark)
    df.createOrReplaceTempView("mjpeg_assets")
    val n = spark.sql(
      "SELECT size(mjpeg_frame_features(content, 8, 1, 256)) FROM mjpeg_assets WHERE asset_id = 1")
      .head.getInt(0)
    assert(n === 5)
  }
}
