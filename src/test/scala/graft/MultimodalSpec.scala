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
}
