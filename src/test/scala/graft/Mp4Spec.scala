package graft

import graft.ext.Avc

/** H.264 metadata extraction tested against HAND-BUILT fixtures: the
  * SPS bitstreams are written field-by-field with a local Exp-Golomb
  * writer (so every derived value has a known ground truth), wrapped
  * in a minimal avcC + ISO BMFF container. Container width/height
  * fields are deliberately ZEROED to prove the dimensions come from
  * the SPS parse, not the stsd entry.
  */
class Mp4Spec extends SparkSpec {
  import spark.implicits._

  // ---- bit-level SPS writer
  private final class BitWriter {
    private val bits = scala.collection.mutable.ArrayBuffer[Int]()
    def u(v: Int, n: Int): this.type = {
      var i = n - 1
      while (i >= 0) { bits += ((v >> i) & 1); i -= 1 }
      this
    }
    def ue(v: Int): this.type = {
      val cp = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(cp)
      u(0, len - 1); u(cp, len)
      this
    }
    def bytes(): Array[Byte] = {
      u(1, 1) // rbsp_stop_one_bit
      while (bits.length % 8 != 0) bits += 0
      bits.grouped(8).map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
    }
  }

  /** Baseline-profile SPS: 1920×1080 via 120×68 MBs + bottom crop 4
    * (crop unit 2 for 4:2:0 frame-coded → 8 pixels).
    */
  private def sps1080(): Array[Byte] = {
    val w = new BitWriter
    w.u(66, 8)  // profile_idc baseline
      .u(0, 8)  // constraint flags
      .u(31, 8) // level_idc
      .ue(0)    // sps_id
      .ue(0)    // log2_max_frame_num_minus4
      .ue(0)    // pic_order_cnt_type=0
      .ue(0)    // log2_max_pic_order_cnt_lsb_minus4
      .ue(1)    // max_num_ref_frames
      .u(0, 1)  // gaps_in_frame_num_value_allowed
      .ue(119)  // pic_width_in_mbs_minus1 -> 1920
      .ue(67)   // pic_height_in_map_units_minus1 -> 1088
      .u(1, 1)  // frame_mbs_only_flag
      .u(1, 1)  // direct_8x8_inference_flag
      .u(1, 1)  // frame_cropping_flag
      .ue(0).ue(0).ue(0).ue(4) // crop l/r/t/b -> 1088-8 = 1080
      .u(0, 1)  // vui_parameters_present_flag
    Array[Byte](0x67) ++ w.bytes() // NAL header: type 7 (SPS)
  }

  /** High-profile SPS: 1280×720, chroma_format branch exercised. */
  private def sps720(): Array[Byte] = {
    val w = new BitWriter
    w.u(100, 8) // profile_idc high -> chroma branch
      .u(0, 8).u(40, 8)
      .ue(0)    // sps_id
      .ue(1)    // chroma_format_idc 4:2:0
      .ue(0)    // bit_depth_luma_minus8
      .ue(0)    // bit_depth_chroma_minus8
      .u(0, 1)  // qpprime_y_zero_transform_bypass
      .u(0, 1)  // seq_scaling_matrix_present
      .ue(0)    // log2_max_frame_num_minus4
      .ue(2)    // pic_order_cnt_type=2 (no extra fields)
      .ue(2)    // max_num_ref_frames
      .u(0, 1)
      .ue(79)   // -> 1280
      .ue(44)   // -> 720
      .u(1, 1).u(1, 1)
      .u(0, 1)  // no cropping
      .u(0, 1)
    Array[Byte](0x67) ++ w.bytes()
  }

  /** H.265 Main-profile SPS: luma 1920×1088, conformance window
    * bottom offset 4 (4:2:0 → SubHeightC 2 → 8 px) = 1080. maxSub=0
    * keeps the PTL walk minimal. The parser stops at the conformance
    * window, so later SPS fields are omitted (stop bit follows).
    */
  private def hevcSps1080(): Array[Byte] = {
    val w = new BitWriter
    w.u(0, 4)   // sps_video_parameter_set_id
      .u(0, 3)  // sps_max_sub_layers_minus1
      .u(1, 1)  // sps_temporal_id_nesting_flag
      .u(0, 2).u(0, 1).u(1, 5) // profile_space, tier, profile_idc=1 (Main)
      .u(0, 16).u(0, 16)       // compatibility flags (32)
      .u(0, 22).u(0, 22)       // constraint + reserved (44)
      .u(120, 8)               // general_level_idc (4.0)
      .ue(0)    // sps_seq_parameter_set_id
      .ue(1)    // chroma_format_idc 4:2:0
      .ue(1920) // pic_width_in_luma_samples
      .ue(1088) // pic_height_in_luma_samples
      .u(1, 1)  // conformance_window_flag
      .ue(0).ue(0).ue(0).ue(4) // l/r/t/b -> 1088 - 2*4 = 1080
    // NAL header: type 33 (SPS), layer 0, tid+1 = 1
    Array[Byte](0x42, 0x01) ++ w.bytes()
  }

  /** H.265 4:2:2 SPS with a sub-layer PTL walk (maxSub=1, level-only
    * sub-layer): crop units SubWidthC=2/SubHeightC=1 — width
    * 1280−2·(1+1)=1276, height 720−1·(2+0)=718.
    */
  private def hevcSps422(): Array[Byte] = {
    val w = new BitWriter
    w.u(0, 4)
      .u(1, 3)  // sps_max_sub_layers_minus1 = 1
      .u(0, 1)
      .u(0, 2).u(0, 1).u(2, 5) // profile_idc = 2 (Main 10)
      .u(0, 16).u(0, 16)
      .u(0, 22).u(0, 22)
      .u(90, 8) // level 3.0
      .u(0, 1).u(1, 1)         // sub_layer: profile absent, level present
      .u(0, 14)                // reserved_zero_2bits × 7 (i = 1..7)
      .u(60, 8)                // sub_layer_level_idc
      .ue(0)
      .ue(2)    // chroma_format_idc 4:2:2
      .ue(1280)
      .ue(720)
      .u(1, 1)
      .ue(1).ue(1).ue(2).ue(0) // l/r/t/b
    Array[Byte](0x42, 0x01) ++ w.bytes()
  }

  // ---- minimal container writer (MjpegSpec pattern)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(tag: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(body.length + 8L) ++ tag.getBytes("US-ASCII") ++ body
  }

  private def avcC(sps: Array[Byte]): Array[Byte] =
    box("avcC", Array[Byte](1), sps.slice(1, 2), Array[Byte](0), sps.slice(3, 4),
      Array(0xFF.toByte), Array(0xE1.toByte), be16(sps.length), sps,
      Array[Byte](0) /* numPPS = 0 */)

  /** hvcC: 22-byte fixed header (zeroed past the version — the
    * parser must take nothing from it), then ONE array of type 33
    * holding the SPS.
    */
  private def hvcC(sps: Array[Byte]): Array[Byte] =
    box("hvcC", Array[Byte](1), new Array[Byte](21),
      Array[Byte](1) /* numOfArrays */,
      Array[Byte](33) /* NAL_unit_type = SPS */, be16(1), be16(sps.length), sps)

  /** One avc1 track, 5 samples of 100 bytes in 2 chunks (3+2), sync
    * samples 1 and 4. Container width/height fields stay ZERO.
    */
  private def mp4(sps: Array[Byte], withStss: Boolean = true): Array[Byte] =
    mp4With(box("avc1", new Array[Byte](78), avcC(sps)), withStss)

  /** Same container with an hev1 entry + hvcC. */
  private def mp4Hevc(sps: Array[Byte], withStss: Boolean = true): Array[Byte] =
    mp4With(box("hev1", new Array[Byte](78), hvcC(sps)), withStss)

  private def mp4With(entry: Array[Byte], withStss: Boolean): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes, be32(0x200), "isomiso2".getBytes)
    val mdatOff = ftyp.length + 8L
    val sizes = Seq(100L, 100L, 100L, 100L, 100L)
    val chunkOffs = Seq(mdatOff, mdatOff + 300L)
    val stsd = box("stsd", be32(0), be32(1), entry)
    val stsz = box("stsz", be32(0), be32(0), be32(5), sizes.map(be32).flatten.toArray)
    val stsc = box("stsc", be32(0), be32(2),
      be32(1), be32(3), be32(1), // chunk 1: 3 samples
      be32(2), be32(2), be32(1)) // chunk 2: 2 samples
    val stco = box("stco", be32(0), be32(2), chunkOffs.map(be32).flatten.toArray)
    val stss = box("stss", be32(0), be32(2), be32(1), be32(4))
    val stbl =
      if (withStss) box("stbl", stsd, stsz, stsc, stco, stss)
      else box("stbl", stsd, stsz, stsc, stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", box("mdhd", be32(0), be32(0), be32(0), be32(1000),
      be32(0), be32(0x55c40000L)), minf)
    val trak = box("trak", mdia)
    val moov = box("moov", box("mvhd", new Array[Byte](100)), trak)
    ftyp ++ box("mdat", new Array[Byte](500)) ++ moov
  }

  test("SPS-derived width/height/profile/level (cropped 1080p, baseline)") {
    val m = Avc.h264MetaOrNull(mp4(sps1080()))
    assert(m != null)
    // 120 MBs wide = 1920 exact; 68 map units = 1088 coded, bottom
    // crop 4 × unit 2 = 1080 — the value only an SPS parse can produce
    assert(m.toSeq === Seq(1920.0, 1080.0, 66.0, 31.0, 5.0, 2.0))
  }

  test("high-profile chroma branch (720p, no crop)") {
    val m = Avc.h264MetaOrNull(mp4(sps720()))
    assert(m != null)
    assert(m.toSeq === Seq(1280.0, 720.0, 100.0, 40.0, 5.0, 2.0))
  }

  test("sync-sample byte offsets via stss ∘ stsz/stsc/stco") {
    val video = mp4(sps1080())
    val ftypLen = 8 + 4 + 4 + 8 // box hdr + brand + ver + compat
    val mdatOff = ftypLen + 8
    // sample 1 at chunk-1 start; sample 4 at chunk-2 start (3 × 100 in)
    assert(Avc.syncOffsetsOrNull(video, 10).toSeq ===
      Seq(mdatOff.toLong, mdatOff + 300L))
    assert(Avc.syncOffsetsOrNull(video, 1).toSeq === Seq(mdatOff.toLong))
    // no stss -> every sample is a sync sample
    val all = Avc.syncOffsetsOrNull(mp4(sps1080(), withStss = false), 10)
    assert(all.toSeq === Seq(mdatOff, mdatOff + 100L, mdatOff + 200L,
      mdatOff + 300L, mdatOff + 400L).map(_.toLong))
  }

  test("malformed payloads: null, never a throw") {
    assert(Avc.h264MetaOrNull(null) === null)
    assert(Avc.h264MetaOrNull("junk".getBytes) === null)
    val good = mp4(sps1080())
    for (cut <- Seq(4, 40, good.length / 2, good.length - 5))
      Avc.h264MetaOrNull(good.take(cut)) // must not throw
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 300) {
      val m = good.clone()
      for (_ <- 0 to rnd.nextInt(4)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Avc.h264MetaOrNull(m)
      Avc.syncOffsetsOrNull(m, 8)
    }
    // an MJPEG container is not an AVC track
    assert(Avc.h264MetaOrNull(
      mp4(sps1080()).patch(0, Array.empty[Byte], 0)) != null) // sanity: unpatched works
  }

  test("HEVC: SPS-derived dimensions through the conformance window (Main, L4.0)") {
    val m = Avc.hevcMetaOrNull(mp4Hevc(hevcSps1080()))
    assert(m != null)
    // luma 1088 coded, bottom offset 4 × SubHeightC 2 = 1080 — a
    // value only the H.265 SPS parse can produce (container zeroed)
    assert(m.toSeq === Seq(1920.0, 1080.0, 1.0, 120.0, 5.0, 2.0))
    // the AVC walk must NOT claim an hev1 track
    assert(Avc.h264MetaOrNull(mp4Hevc(hevcSps1080())) === null)
  }

  test("HEVC: 4:2:2 crop units + sub-layer PTL walk") {
    val m = Avc.hevcMetaOrNull(mp4Hevc(hevcSps422()))
    assert(m != null)
    assert(m.toSeq === Seq(1276.0, 718.0, 2.0, 90.0, 5.0, 2.0))
  }

  test("HEVC: sync offsets ride the same sample tables") {
    val video = mp4Hevc(hevcSps1080())
    val mdatOff = (8 + 4 + 4 + 8) + 8
    assert(Avc.syncOffsetsOrNull(video, 10).toSeq ===
      Seq(mdatOff.toLong, mdatOff + 300L))
    val all = Avc.syncOffsetsOrNull(mp4Hevc(hevcSps1080(), withStss = false), 10)
    assert(all.length === 5)
  }

  test("HEVC: malformed payloads null, never a throw") {
    val good = mp4Hevc(hevcSps1080())
    for (cut <- Seq(4, 40, good.length / 2, good.length - 5))
      Avc.hevcMetaOrNull(good.take(cut))
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 300) {
      val m = good.clone()
      for (_ <- 0 to rnd.nextInt(4)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Avc.hevcMetaOrNull(m)
      Avc.syncOffsetsOrNull(m, 8)
    }
    assert(Avc.hevcMetaOrNull(good) != null) // sanity: unpatched works
  }

  test("SQL surface: mp4_hevc_meta, codegen plan") {
    GraftExtensions.install(spark)
    val tmp = java.nio.file.Files.createTempDirectory("hevc_assets").toString
    Seq(("v.mp4", mp4Hevc(hevcSps1080())), ("junk.bin", Array[Byte](1, 2, 3)))
      .toDF("entry", "content").write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).createOrReplaceTempView("hevc_assets")
    val got = spark.sql(
      """SELECT entry, mp4_hevc_meta(content) AS m
        |FROM hevc_assets ORDER BY entry""".stripMargin)
    val rows = got.collect().map(r => r.getString(0) -> Option(r.getSeq[Double](1))).toMap
    assert(rows("junk.bin") === None)
    assert(rows("v.mp4").get.take(4) === Seq(1920.0, 1080.0, 1.0, 120.0))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && plan.contains("mp4_hevc_meta"), plan)
  }

  test("SQL surface: mp4_avc_meta / mp4_sync_offsets, codegen plan") {
    GraftExtensions.install(spark)
    val video = mp4(sps1080())
    // parquet round-trip: a local relation would constant-fold the
    // expressions out of the plan before the codegen assert sees them
    val tmp = java.nio.file.Files.createTempDirectory("avc_assets").toString
    Seq(("v.mp4", video), ("junk.bin", Array[Byte](1, 2, 3)))
      .toDF("entry", "content").write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).createOrReplaceTempView("avc_assets")
    val got = spark.sql(
      """SELECT entry, mp4_avc_meta(content) AS m,
        |       mp4_sync_offsets(content, 8) AS ko
        |FROM avc_assets ORDER BY entry""".stripMargin)
    val rows = got.collect()
    val byEntry = rows.map(r => r.getString(0) ->
      ((Option(r.getSeq[Double](1)), Option(r.getSeq[Long](2))))).toMap
    assert(byEntry("junk.bin") === ((None, None)))
    val (Some(m), Some(ko)) = byEntry("v.mp4")
    assert(m.take(4) === Seq(1920.0, 1080.0, 66.0, 31.0))
    assert(ko.length === 2)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && plan.contains("mp4_avc_meta"), plan)
  }
}
