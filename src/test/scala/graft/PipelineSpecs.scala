package graft

import org.apache.spark.sql.functions._
import graft.fn.GeoFns
import graft.io.{SyntheticGrid, TrackReader}
import graft.io.SyntheticGrid.GridSpec
import graft.pipeline.TrackProfile

/** S1 track readers — golden values from the committed fixtures
  * (FIXTURES.md §1).
  */
class TrackReaderSpec extends SparkSpec {

  test("NHC al092016: 80 rows, first hour 145770, wrapped lon range") {
    import spark.implicits._
    val df = TrackReader.readNhc(spark, "/root/repo/data/al092016_track.csv").cache()
    assert(df.count() === 80)
    val first = df.orderBy($"point_id").limit(1)
      .select($"hour", $"lat", $"lon").as[(Long, Double, Double)].collect().head
    assert(first === ((145770L, 12.5, 340.6)))   // -19.4 wrapped
    val r = df.agg(min($"lon"), max($"lon"), min($"lat"), max($"lat"))
      .as[(Double, Double, Double, Double)].collect().head
    assert(r === ((272.0, 340.6, 10.5, 39.6)))
    assert(df.filter($"lon" < 0).count() === 0)
  }

  test("IBTrACS Hermine (already [0,360)) and Sandy (signed) both parse") {
    import spark.implicits._
    // 13 / 45 data rows — the files lack a trailing newline, so raw
    // line counts (SURVEY.md "12 / 44") undercount by one
    val hermine = TrackReader.readIbtracs(spark, "/root/repo/data/Hermine_track.csv")
    assert(hermine.count() === 13)
    assert(hermine.filter($"lon" < 180.0).count() === 0)  // 284.5-ish, untouched
    val sandy = TrackReader.readIbtracs(spark, "/root/repo/data/Sandy_track.csv")
    assert(sandy.count() === 45)
    assert(sandy.filter($"lon" < 0).count() === 0)        // wrapped
    assert(sandy.select(min($"lon")).as[Double].collect().head > 270.0)
  }

  test("multi-storm feed: point_ids restart per storm (per-storm id window)") {
    import spark.implicits._
    // one read over BOTH storm files — the multi-storm feed shape whose
    // id minting must parallelize per storm (round-1 scale-killer fix:
    // the window partitions by the stable storm serial, never globally)
    val both = TrackReader.readIbtracs(spark,
      "/root/repo/data/{Hermine_track,Sandy_track}.csv")
    assert(both.count() === 58) // 13 + 45
    val perStorm = both.groupBy($"stormname")
      .agg(count(lit(1)).as("n"), min($"point_id").as("lo"), max($"point_id").as("hi"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(perStorm("HERMINE") === ((13L, 0L, 12L)))  // ids 0..12
    assert(perStorm("SANDY") === ((45L, 0L, 44L)))    // ids 0..44, independent
  }
}

/** §3.1 flagship integration over the deterministic synthetic grid. */
class TrackProfileSpec extends SparkSpec {

  private lazy val spec: GridSpec = SyntheticGrid.hermineSpec(step = 0.4)
  private lazy val grid = SyntheticGrid.cleanSentinels(
    SyntheticGrid.generate(spark, spec)).cache()

  test("flagship: 80 points × 25 depths = 2000 rows, no sentinels survive") {
    import spark.implicits._
    val track = TrackReader.readNhc(spark, "/root/repo/data/al092016_track.csv")
    val prof = TrackProfile.profile(track, grid, spec).cache()
    assert(prof.count() === 2000)
    assert(prof.select(countDistinct($"point_id")).as[Long].collect().head === 80)
    assert(prof.select(countDistinct($"depth_idx")).as[Long].collect().head === 25)
    // sentinel cells (-30000) were nulled at scan, never averaged in:
    assert(prof.filter($"water_temp" < -100.0).count() === 0)
    // analytic field range sanity: 25 - 0.05*depth ± ~3.5
    val (lo, hi) = prof.agg(min($"water_temp"), max($"water_temp"))
      .as[(Double, Double)].collect().head
    assert(lo > 5.0 && hi < 35.0, s"range [$lo, $hi]")
  }

  test("IDW answer matches brute-force recomputation for one point") {
    import spark.implicits._
    val track = TrackReader.readNhc(spark, "/root/repo/data/al092016_track.csv")
      .filter($"point_id" === 0)   // (12.5, 340.6) @ hour 145770
    val prof = TrackProfile.profile(track, grid, spec)
      .filter($"depth_idx" === 0)
      .select($"water_temp").as[Double].collect()
    assert(prof.length === 1)

    // independent recomputation: snap, 3x3, vincenty, idw over collected grid
    val cells = grid.filter($"time" === 145770L && $"depth_idx" === 0)
      .select($"lat_idx", $"lon_idx", $"lat", $"lon", $"water_temp")
      .as[(Int, Int, Double, Double, Option[Double])].collect()
      .map(c => ((c._1, c._2), (c._3, c._4, c._5))).toMap
    val (tLat, tLon) = (12.5, 340.6)
    val ci = math.round((tLat - spec.latMin) / spec.latStep).toInt
    val cj = math.round((tLon - spec.lonMin) / spec.lonStep).toInt
    var num = 0.0; var den = 0.0
    for (di <- -1 to 1; dj <- -1 to 1) {
      cells.get((ci + di, cj + dj)).foreach { case (nlat, nlon, v) =>
        v.foreach { vv =>
          val d = GeoFns.vincentyKmScala(tLat, tLon, nlat, nlon)
          val w = 1.0 / math.pow(d + 1e-6, 2)
          num += w * vv; den += w
        }
      }
    }
    assert(math.abs(prof.head - num / den) < 1e-9,
      s"pipeline ${prof.head} vs brute force ${num / den}")
  }

  test("nearest mode returns the snapped cell's analytic value") {
    import spark.implicits._
    val track = TrackReader.readNhc(spark, "/root/repo/data/al092016_track.csv")
      .filter($"point_id" === 10)
    val profNearest = TrackProfile.profile(track, grid, spec,
        TrackProfile.Config(interp = "nearest"))
      .filter($"depth_idx" === 0).select($"water_temp").as[Double].collect().head
    // nearest = value at the closest non-null stencil cell — recompute
    val pt3 = track.select($"lat", $"lon", $"hour").as[(Double, Double, Long)]
      .collect().head
    val pt = (pt3._1, pt3._2)
    // nearest grid time to the fix hour (first-index tie-break)
    val snapT = spec.times.minBy(t => (math.abs(t - pt3._3), t))
    val cells = grid.filter($"time" === snapT && $"depth_idx" === 0)
      .select($"lat_idx", $"lon_idx", $"lat", $"lon", $"water_temp")
      .as[(Int, Int, Double, Double, Option[Double])].collect()
      .map(c => ((c._1, c._2), (c._3, c._4, c._5))).toMap
    val ci = math.round((pt._1 - spec.latMin) / spec.latStep).toInt
    val cj = math.round((pt._2 - spec.lonMin) / spec.lonStep).toInt
    val cands = for {
      di <- -1 to 1; dj <- -1 to 1
      (nlat, nlon, Some(v)) <- cells.get((ci + di, cj + dj))
    } yield (GeoFns.vincentyKmScala(pt._1, pt._2, nlat, nlon), v)
    assert(math.abs(profNearest - cands.minBy(_._1)._2) < 1e-9)
  }
}
