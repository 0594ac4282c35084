package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Multimodal binary-column plumbing over the committed KMZ's real
  * PNGs (9 embedded icons/legend).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val kmz = "/root/repo/data/al092016_best_track.kmz"

  private lazy val assets =
    Multimodal.readZipAssets(spark, kmz, Seq("png"))

  test("zip asset scan: 9 PNGs with payloads") {
    val rows = assets.select($"entry", length($"content")).as[(String, Int)]
      .collect().toMap
    assert(rows.size === 9)
    assert(rows("cat1_nhemi.png") === 3534)
    assert(rows("breakPoint_legend.png") === 4409)
  }

  test("PNG IHDR metadata decoded via pure built-ins (no UDF)") {
    val meta = Multimodal.withPngMeta(assets)
      .select($"entry", $"meta.width", $"meta.height", $"meta.bit_depth", $"meta.color_type")
      .as[(String, Long, Long, Int, Int)].collect()
      .map { case (k, w, h, b, c) => k -> ((w, h, b, c)) }.toMap
    // ground truth from independent struct.unpack of the same files
    assert(meta("breakPoint_legend.png") === ((400L, 65L, 8, 3)))
    assert(meta("cat1_nhemi.png") === ((32L, 32L, 8, 6)))
    assert(meta("ts_nhemi.png") === ((32L, 32L, 8, 6)))
    // plan stays UDF-free / codegen-friendly
    val plan = Multimodal.withPngMeta(assets).queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }

  test("feature stub: deterministic, schema array<double>, bounded values") {
    val f1 = Multimodal.withFeatureStub(assets, dim = 16)
      .select($"entry", $"features").as[(String, Seq[Double])].collect().toMap
    val f2 = Multimodal.withFeatureStub(assets, dim = 16)
      .select($"entry", $"features").as[(String, Seq[Double])].collect().toMap
    assert(f1 === f2) // deterministic
    assert(f1.values.forall(v => v.size == 16 && v.forall(x => x >= -1.0 && x < 1.0)))
    // distinct payloads -> distinct features
    assert(f1("cat1_nhemi.png") !== f1("cat2_nhemi.png"))
  }

  test("chunk sampling: every stride-th fixed-size chunk, content dropped") {
    val chunks = Multimodal.sampleChunks(assets.filter($"entry" === "cat1_nhemi.png"),
      chunkBytes = 1000, stride = 2)
    val got = chunks.select($"chunk_idx", length($"chunk")).as[(Int, Int)]
      .collect().sortBy(_._1)
    // 3534 bytes -> chunks 0..3; stride 2 -> 0 and 2, both full 1000B
    assert(got.map(_._1).toSeq === Seq(0, 2))
    assert(got.forall(_._2 === 1000))
    assert(!chunks.columns.contains("content"))
  }

  test("chunk sampling: zero-length payload emits zero rows (ADVICE r2)") {
    val empty = Seq(("empty.bin", Array.emptyByteArray)).toDF("entry", "content")
    assert(Multimodal.sampleChunks(empty, chunkBytes = 1000, stride = 2).count() === 0)
  }

  test("stub features flow into SimJoin (multimodal similarity plumbing)") {
    val feats = Multimodal.withFeatureStub(assets, dim = 16)
      .select(monotonically_increasing_id().as("vec_id"), $"features".as("v"))
    val out = graft.ext.SimJoin.bruteForceTopK(feats, feats.limit(2), "vec_id", "v", k = 3)
    assert(out.count() === 6) // 2 queries x top-3
  }

  test("REAL PNG pixel decode: features match an independent python decoder bit-for-bit-ish") {
    // ground truth computed with an independent pure-python decoder
    // (zlib.decompress + unfilter + Rec.601) over the same committed
    // files: [mean/255, std/255, hist bins 0..3, hist bin 15]
    val f = Multimodal.withPngFeatures(assets, nBins = 16)
      .select($"entry", $"features").as[(String, Seq[Double])].collect().toMap
    def check(entry: String, mean: Double, std: Double, h03: Seq[Double], h15: Double): Unit = {
      val v = f(entry)
      assert(v.size === 18)
      assert(math.abs(v(0) - mean) < 1e-9, s"$entry mean ${v(0)}")
      assert(math.abs(v(1) - std) < 1e-9, s"$entry std ${v(1)}")
      h03.zipWithIndex.foreach { case (x, i) =>
        assert(math.abs(v(2 + i) - x) < 1e-9, s"$entry bin$i ${v(2 + i)}") }
      assert(math.abs(v(17) - h15) < 1e-9, s"$entry bin15 ${v(17)}")
    }
    // RGBA (color type 6)
    check("cat1_nhemi.png", 0.726634858, 0.376114112,
      Seq(0.09375, 0.016601562, 0.010742188, 0.01171875), 0.629882812)
    check("td_nhemi.png", 0.740908088, 0.364221593,
      Seq(0.075195312, 0.009765625, 0.009765625, 0.009765625), 0.651367188)
    // palette (color type 3, PLTE lookup)
    check("breakPoint_legend.png", 0.882018489, 0.274737976,
      Seq(0.028576923, 0.005269231, 0.043769231, 0.005115385), 0.811576923)
  }

  test("PNG features: non-PNG payload -> null; plan stays codegen (no UDF)") {
    val mixed = Seq(("not_png.bin", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))).toDF("entry", "content")
    val out = Multimodal.withPngFeatures(mixed).select($"features").collect()
    assert(out.head.isNullAt(0))
    val plan = Multimodal.withPngFeatures(assets).queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
    assert(plan.contains("png_gray_features"), plan)
  }

  test("REAL features flow into SimJoin: visually-similar storm icons cluster") {
    // the 8 32x32 storm icons are variations of one glyph; the legend
    // is a different image entirely — nearest neighbor of an icon (by
    // cosine over real pixel features) must be another icon, not the legend
    val feats = Multimodal.withPngFeatures(assets)
      .filter($"features".isNotNull)
      .select($"entry", $"features".as("v"))
    val q = feats.filter($"entry" === "cat1_nhemi.png")
      .select($"entry".as("q_entry"), $"v")
    val scored = feats.filter($"entry" =!= "cat1_nhemi.png")
      .crossJoin(q.select($"v".as("qv")))
      .withColumn("cos", graft.ext.SimJoin.cosine($"v", $"qv"))
      .orderBy($"cos".desc)
    val best = scored.select($"entry").as[String].head()
    assert(best.endsWith("_nhemi.png"), s"nearest to cat1 was $best")
  }
}
