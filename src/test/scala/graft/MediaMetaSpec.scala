package graft

import graft.ext.MediaMeta
import org.scalatest.funsuite.AnyFunSuite

/** Format-routed image dims + audio meta: fixtures are ImageIO-encoded
  * where the JDK has an encoder (PNG/JPEG/GIF/BMP — ground truth from
  * a codec this code never saw) and hand-built from the published
  * header layouts elsewhere (WebP, TIFF, AVIF, MP3, Ogg).
  */
class MediaMetaSpec extends AnyFunSuite {

  private def encoded(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, baos)
    baos.toByteArray
  }

  test("image dims: JDK-encoded PNG/JPEG/GIF/BMP at odd sizes") {
    for ((fmt, name) <- Seq("png" -> "png", "jpg" -> "jpeg",
        "gif" -> "gif", "bmp" -> "bmp")) {
      val m = MediaMeta.imageDimsOrNull(encoded(fmt, 123, 47))
      assert(m != null, fmt)
      assert(m._1 === name && m._2 === 123L && m._3 === 47L, fmt)
    }
  }

  test("image dims: hand-built WebP (all three bitstreams), TIFF (both orders), AVIF") {
    // VP8 keyframe: RIFF/WEBP + 'VP8 ' chunk, frame tag + 9D012A + dims
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val vp8 = "RIFF".getBytes ++ le32(22) ++ "WEBP".getBytes ++
      "VP8 ".getBytes ++ le32(10) ++ Array[Byte](0, 0, 0) ++
      Array(0x9D.toByte, 0x01.toByte, 0x2A.toByte) ++ le16(320) ++ le16(240)
    assert(MediaMeta.imageDimsOrNull(vp8) === ("webp", 320L, 240L))
    // VP8L: signature 0x2F + 14-bit-packed (w-1, h-1)
    val wl = 200 - 1; val hl = 100 - 1
    val bits = (wl | (hl << 14)).toLong
    val vp8l = "RIFF".getBytes ++ le32(13) ++ "WEBP".getBytes ++
      "VP8L".getBytes ++ le32(5) ++ Array(0x2F.toByte) ++ le32(bits.toInt)
    assert(MediaMeta.imageDimsOrNull(vp8l) === ("webp", 200L, 100L))
    // VP8X: 24-bit canvas minus one
    def le24(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte)
    val vp8x = "RIFF".getBytes ++ le32(18) ++ "WEBP".getBytes ++
      "VP8X".getBytes ++ le32(10) ++ new Array[Byte](4) ++
      le24(800 - 1) ++ le24(600 - 1)
    assert(MediaMeta.imageDimsOrNull(vp8x) === ("webp", 800L, 600L))
    // TIFF little-endian: IFD with SHORT width 77, LONG height 33
    def tiff(le: Boolean): Array[Byte] = {
      def u16(v: Int) = if (le) le16(v) else Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      def u32(v: Int) = if (le) le32(v) else Array(((v >> 24) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      val hdr = (if (le) "II".getBytes ++ Array[Byte](42, 0)
                 else "MM".getBytes ++ Array[Byte](0, 42)) ++ u32(8)
      val entries =
        u16(256) ++ u16(3) ++ u32(1) ++ (if (le) le16(77) ++ le16(0) else u16(77) ++ u16(0)) ++
        u16(257) ++ u16(4) ++ u32(1) ++ u32(33)
      hdr ++ u16(2) ++ entries ++ u32(0)
    }
    assert(MediaMeta.imageDimsOrNull(tiff(le = true)) === ("tiff", 77L, 33L))
    assert(MediaMeta.imageDimsOrNull(tiff(le = false)) === ("tiff", 77L, 33L))
    // AVIF: ftyp avif + meta(full)/iprp/ipco/ispe(full, w, h)
    def box(tag: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      Array((((body.length + 8) >> 24) & 0xFF).toByte,
        (((body.length + 8) >> 16) & 0xFF).toByte,
        (((body.length + 8) >> 8) & 0xFF).toByte,
        ((body.length + 8) & 0xFF).toByte) ++ tag.getBytes ++ body
    }
    def be32(v: Int) = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val ispe = box("ispe", be32(0), be32(512), be32(384))
    val avif = box("ftyp", "avif".getBytes, be32(0), "avifmif1".getBytes) ++
      box("meta", be32(0), box("iprp", box("ipco", ispe)))
    assert(MediaMeta.imageDimsOrNull(avif) === ("avif", 512L, 384L))
  }

  test("image codec profile: av1C fields for AVIF, null elsewhere (round 15)") {
    for (id <- 0L until 60L) {
      val avif = graft.ext.Av1Fixtures.avif(id)
      val p = MediaMeta.imageCodecProfileOrNull(avif)
      assert(p != null, s"id=$id")
      assert(p._1 === "av1")
      assert(p._2 === graft.ext.Av1Fixtures.profile(id).toLong, s"id=$id profile")
      assert(p._3 === graft.ext.Av1Fixtures.bitDepth(id).toLong, s"id=$id depth")
      assert(p._4 === graft.ext.Av1Fixtures.mono(id).toLong, s"id=$id mono")
    }
    // non-ISOBMFF stills carry no codec profile
    assert(MediaMeta.imageCodecProfileOrNull("GIF89a1234".getBytes) === null)
    assert(MediaMeta.imageCodecProfileOrNull(null) === null)
  }

  test("audio meta: WAV duration from data length; FLAC routes through STREAMINFO") {
    // 1 second of 8kHz 16-bit mono PCM through the JDK's own writer
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](16000)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, 8000)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val m = MediaMeta.audioMetaOrNull(baos.toByteArray)
    assert(m != null)
    assert(m._1 === "wav" && m._2 === 8000L && m._3 === 1)
    assert(math.abs(m._4 - 1.0) < 1e-9)
  }

  test("audio meta: MP3 frame header + Xing frame count; Ogg Vorbis and Opus") {
    // MPEG-1 Layer III 44.1kHz joint-stereo frame with a Xing header
    val hdr = Array(0xFF, 0xFB, 0x90, 0x40).map(_.toByte) // v1 L3, 44100, mode 1
    val frame = new Array[Byte](400)
    hdr.copyInto(frame, 0)
    // Xing sits at frame start + 4-byte header + 32-byte MPEG-1
    // stereo side info = 36 — the offset real encoders write
    val xo = 36
    "Xing".getBytes.copyInto(frame, xo)
    frame(xo + 7) = 1 // flags: frames present
    frame(xo + 8) = 0; frame(xo + 9) = 0; frame(xo + 10) = 1; frame(xo + 11) = 44 // 300 frames
    val m = MediaMeta.audioMetaOrNull(frame)
    assert(m != null)
    assert(m._1 === "mp3" && m._2 === 44100L && m._3 === 2)
    assert(math.abs(m._4 - 300.0 * 1152 / 44100) < 1e-9)
    // Ogg Opus: OggS page with OpusHead; final page carries granule 96000
    def oggPage(granule: Long, payload: Array[Byte]): Array[Byte] = {
      val p = new Array[Byte](27 + 1 + payload.length)
      "OggS".getBytes.copyInto(p, 0)
      var g = granule
      for (i <- 0 until 8) { p(6 + i) = (g & 0xFF).toByte; g >>= 8 }
      p(26) = 1 // one segment
      p(27) = payload.length.toByte
      payload.copyInto(p, 28)
      p
    }
    val opusHead = "OpusHead".getBytes ++ Array[Byte](1, 2) ++
      Array[Byte](0, 0) ++ Array[Byte](0x80.toByte, 0xBB.toByte, 0, 0) ++ // 48000 LE
      new Array[Byte](3)
    val ogg = oggPage(0, opusHead) ++ oggPage(96000L, new Array[Byte](10))
    val o = MediaMeta.audioMetaOrNull(ogg)
    assert(o != null)
    assert(o._1 === "ogg-opus" && o._3 === 2)
    assert(math.abs(o._4 - 2.0) < 1e-9) // 96000 granules at 48kHz
    // Vorbis id header
    val vorbisId = Array[Byte](1) ++ "vorbis".getBytes ++ be4(0) ++
      Array[Byte](2) ++ le4(44100) ++ new Array[Byte](9)
    val oggV = oggPage(0, vorbisId) ++ oggPage(88200L, new Array[Byte](10))
    val v = MediaMeta.audioMetaOrNull(oggV)
    assert(v != null)
    assert(v._1 === "ogg-vorbis" && v._2 === 44100L && v._3 === 2)
    assert(math.abs(v._4 - 2.0) < 1e-9)
  }

  private def be4(x: Int) = Array(((x >> 24) & 0xFF).toByte, ((x >> 16) & 0xFF).toByte,
    ((x >> 8) & 0xFF).toByte, (x & 0xFF).toByte)
  private def le4(x: Int) = Array((x & 0xFF).toByte, ((x >> 8) & 0xFF).toByte,
    ((x >> 16) & 0xFF).toByte, ((x >> 24) & 0xFF).toByte)

  private implicit class CopyInto(val a: Array[Byte]) {
    def copyInto(dst: Array[Byte], off: Int): Unit =
      System.arraycopy(a, 0, dst, off, a.length)
  }

  test("fuzz: junk, truncations, corruptions — null or value, never a throw") {
    assert(MediaMeta.imageDimsOrNull(null) === null)
    assert(MediaMeta.audioMetaOrNull(null) === null)
    assert(MediaMeta.imageDimsOrNull("hello world".getBytes) === null)
    val goods = Seq(encoded("png", 20, 20), encoded("bmp", 20, 20))
    val rnd = new scala.util.Random(3)
    for (g <- goods; _ <- 0 until 200) {
      val m = g.clone()
      for (_ <- 0 to rnd.nextInt(5)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      MediaMeta.imageDimsOrNull(m)
      MediaMeta.audioMetaOrNull(m)
    }
    for (g <- goods; cut <- Seq(2, 5, 11, g.length / 2)) {
      MediaMeta.imageDimsOrNull(g.take(cut))
      MediaMeta.audioMetaOrNull(g.take(cut))
    }
  }
}
