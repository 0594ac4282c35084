package graft

import graft.ext.{Images, Multimodal, Vp8Fixtures, Webm, WebmFixtures}
import org.apache.spark.sql.functions._

/** The VP8 decoder's ENGINE wiring (round 14): the WebM keyframe-hash
  * walk, the container-routed video index, the lossy-WebP still route
  * into [[Images]], and the SQL surface with its codegen plan.
  */
class Vp8SqlSpec extends SparkSpec {
  import spark.implicits._

  private def gray(seed: Int, w: Int, h: Int): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w
      (127 + 80 * math.sin(x / 3.0 + seed) + 40 * math.cos(y / 2.0)).toInt
        .max(0).min(255) + rnd.nextInt(2)
    }
  }

  test("Webm.vp8KeyframeDhashes: twin WebMs pair, distinct ones do not") {
    def webmOf(seed: Int, bump: Int): Array[Byte] = {
      val g = gray(seed, 32, 32).map(v => math.min(255, v + bump))
      val (frame, _) = Vp8Fixtures.encodeGrayFrame(g, 32, 32, 6)
      WebmFixtures.vp8Webm(Seq((0L, frame)), 32, 32)
    }
    val a = Webm.vp8KeyframeDhashes(webmOf(1, 0), 4)
    val a2 = Webm.vp8KeyframeDhashes(webmOf(1, 1), 4)
    val b = Webm.vp8KeyframeDhashes(webmOf(99, 0), 4)
    assert(a != null && a2 != null && b != null)
    assert(a.length === 1)
    assert(java.lang.Long.bitCount(a(0) ^ a2(0)) <= 2, "twins must be near")
    assert(java.lang.Long.bitCount(a(0) ^ b(0)) > 6, "distinct scenes far")
    // non-VP8 / non-EBML payloads null
    assert(Webm.vp8KeyframeDhashes("junk".getBytes, 4) === null)
    // multi-keyframe: both frames hash
    val g1 = gray(5, 16, 16); val g2 = gray(6, 16, 16)
    val two = WebmFixtures.vp8Webm(Seq(
      (0L, Vp8Fixtures.encodeGrayFrame(g1, 16, 16, 6)._1),
      (500L, Vp8Fixtures.encodeGrayFrame(g2, 16, 16, 6)._1)), 16, 16)
    assert(Webm.vp8KeyframeDhashes(two, 4).length === 2)
    assert(Webm.vp8KeyframeDhashes(two, 1).length === 1) // cap respected
  }

  test("container routing: one index over MP4 and WebM, cross pairs surface") {
    def scene(seed: Int)(x: Int, y: Int): Int =
      (127 + 90 * math.sin((1 + seed % 5) * x / 2.5 + y / 2.0 + seed)).toInt & 0xFF
    val mp4 = graft.ext.VideoFixtures.multiKeyframeMp4(Seq(scene(3)))
    val webm = {
      val g = Array.tabulate(16 * 16)(p => scene(3)(p % 16, p / 16))
      WebmFixtures.vp8Webm(Seq((0L, Vp8Fixtures.encodeGrayFrame(g, 16, 16, 4)._1)), 16, 16)
    }
    val hm = Multimodal.keyframeDhashesRouted(mp4, 4)
    val hw = Multimodal.keyframeDhashesRouted(webm, 4)
    assert(hm != null && hw != null)
    assert(java.lang.Long.bitCount(hm(0) ^ hw(0)) <= 3,
      "same scene across containers must pair")
    val assets = spark.createDataFrame(Seq(
      (1L, mp4), (2L, webm),
      (3L, graft.ext.VideoFixtures.multiKeyframeMp4(Seq(scene(77))))))
      .toDF("vid_id", "content")
    val pairs = Multimodal.nearDupVideoPairsCross(assets, "vid_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("Images routes lossy WebP: grayPlaneOrNull + dhash, VP8L unaffected") {
    val g = gray(11, 48, 32)
    val lossy = Vp8Fixtures.webpGray(g, 48, 32, 8)
    val p = Images.grayPlaneOrNull(lossy)
    assert(p != null && p._2 === 48 && p._3 === 32)
    // near the source within quantization noise
    val mad = (0 until g.length).map(i => math.abs(p._1(i) - g(i))).sum / g.length
    assert(mad <= 10.0, s"mad=$mad")
    // VP8L (lossless) route still intact, and both hash comparably
    val lossless = graft.ext.WebpFixtures.encodeGray(g, 48, 32)
    val dLossy = Images.dhash64OrNull(lossy)
    val dLossless = Images.dhash64OrNull(lossless)
    assert(dLossy != null && dLossless != null)
    assert(java.lang.Long.bitCount(dLossy ^ dLossless) <= 2)
  }

  test("SQL surface: webm_vp8_dhashes / video_kf_dhashes, codegen plan") {
    GraftExtensions.install(spark)
    def scene(x: Int, y: Int): Int = ((x * 13 + y * 7) % 200) + 20
    val g = Array.tabulate(16 * 16)(p => scene(p % 16, p / 16))
    val webm = WebmFixtures.vp8Webm(
      Seq((0L, Vp8Fixtures.encodeGrayFrame(g, 16, 16, 4)._1)), 16, 16)
    val mp4 = graft.ext.VideoFixtures.multiKeyframeMp4(Seq(scene))
    // parquet round-trip: a LocalRelation would fold the projection
    // into the scan and hide the codegen span we assert on
    val tmp = "/tmp/graft_test/vp8_sql_assets.parquet"
    spark.createDataFrame(Seq((1L, webm), (2L, mp4), (3L, "x".getBytes)))
      .toDF("id", "content").write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    df.createOrReplaceTempView("vassets")
    val rows = spark.sql(
      """SELECT id, webm_vp8_dhashes(content, 4) AS wh,
        |       video_kf_dhashes(content, 4) AS vh
        |FROM vassets ORDER BY id""".stripMargin).collect()
    assert(rows(0).getSeq[Long](1).nonEmpty) // webm via webm fn
    assert(rows(0).getSeq[Long](2) === rows(0).getSeq[Long](1)) // routed = direct
    assert(rows(1).isNullAt(1)) // mp4 is not EBML
    assert(rows(1).getSeq[Long](2).nonEmpty) // routed → H.264 walk
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
    val plan = spark.sql(
      "SELECT video_kf_dhashes(content, 4) FROM vassets")
      .queryExecution.executedPlan.toString()
    // `*(n)` marks a WholeStageCodegen span in the executed plan
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }
}
