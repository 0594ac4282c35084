package graft

import org.apache.spark.sql.functions._
import graft.io.{GridCatalog, SyntheticGrid}
import graft.io.SyntheticGrid.GridSpec

/** S7/J5 catalog selection: per-row assignment (the reference picks an
  * experiment from the FIRST fix only, trackplot_hycom.py:178 — a bug
  * for boundary-spanning storms; deliberately not reproduced).
  */
class GridCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def writeExperiment(times: Seq[Long]): String = {
    val spec = GridSpec(latMin = 10, latStep = 2.0, nLat = 3,
      lonMin = 270, lonStep = 2.0, nLon = 3,
      depths = Seq(0.0, 2.0), times = times)
    val dir = java.nio.file.Files.createTempDirectory("expt").resolve("g").toString
    SyntheticGrid.writeGrid(SyntheticGrid.generate(spark, spec), dir)
    dir
  }

  test("per-row assignment spans experiment boundaries; latest-starting wins overlap") {
    val exptA = writeExperiment(Seq(100L, 106L, 112L))        // covers 100-112
    val exptB = writeExperiment(Seq(112L, 118L, 124L))        // covers 112-124 (overlaps at 112)
    val catalog = GridCatalog.build(spark, Map("exptA" -> exptA, "exptB" -> exptB))
    assert(catalog.count() === 2)

    val track = Seq((0L, 100L), (1L, 110L), (2L, 112L), (3L, 120L), (4L, 200L))
      .toDF("point_id", "hour")
    val got = GridCatalog.assign(track, catalog)
      .select($"point_id", $"dataset").as[(Long, Option[String])]
      .collect().toMap
    assert(got(0L) === Some("exptA"))
    assert(got(1L) === Some("exptA"))
    assert(got(2L) === Some("exptB")) // overlap: latest-starting experiment
    assert(got(3L) === Some("exptB")) // the reference (first-hour pick) would wrongly use exptA
    assert(got(4L) === None)          // uncovered -> null, not silent bad data
  }

  test("assign preserves row multiplicity for fully-duplicate track rows (ADVICE r2)") {
    val exptA = writeExperiment(Seq(100L, 106L, 112L))
    val catalog = GridCatalog.build(spark, Map("exptA" -> exptA))
    // two IDENTICAL rows — the surrogate-key collapse must keep both
    val track = Seq((0L, 110L), (0L, 110L), (1L, 200L)).toDF("point_id", "hour")
    val out = GridCatalog.assign(track, catalog)
    assert(out.count() === 3)
    assert(out.filter($"point_id" === 0L && $"dataset" === "exptA").count() === 2)
  }
}
