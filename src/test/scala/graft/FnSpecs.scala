package graft

import org.apache.spark.sql.functions._
import graft.fn.{TimeFns, GeoFns}

/** F1/F2 time conversions — golden values from the reference fixtures
  * (FIXTURES.md: hurrtimeconv("2016081718") = 145770) + round-trip laws
  * over seeded-random samples.
  */
class TimeFnsSpec extends SparkSpec {

  test("hurrtimeconv golden value (trackplot_hycom.py:150-156)") {
    assert(TimeFns.hurrTimeConvScala("2016081718") === 145770L)
    assert(TimeFns.ymdhScala(145770L) === "2016081718")
  }

  test("hurrtimeconv column matches scala impl") {
    import spark.implicits._
    val df = Seq("2016081718", "2016090612", "2000010100", "1999123123")
      .toDF("s")
      .select(col("s"), TimeFns.hurrTimeConv(col("s")).as("h"))
      .collect()
    df.foreach { r =>
      assert(r.getLong(1) === TimeFns.hurrTimeConvScala(r.getString(0)))
    }
  }

  test("ymdh ∘ hurrtimeconv = id (property, 500 seeded samples)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val h = rnd.between(-100000L, 400000L)
      assert(TimeFns.hurrTimeConvScala(TimeFns.ymdhScala(h)) === h)
    }
  }
}

/** F4/F5 geodesic functions. */
class GeoFnsSpec extends SparkSpec {

  test("vincenty: coincident points = 0") {
    assert(GeoFns.vincentyKmScala(25.0, 280.0, 25.0, 280.0) === 0.0)
  }

  test("vincenty: 1 degree of longitude at the equator = a*pi/180") {
    val d = GeoFns.vincentyKmScala(0.0, 0.0, 0.0, 1.0)
    assert(math.abs(d - 111.3195) < 1e-3)   // WGS-84 semi-major circumference / 360
  }

  test("vincenty: symmetric, within 0.6% of haversine (500 seeded samples)") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val lat1 = rnd.between(-60.0, 60.0); val lon1 = rnd.between(0.0, 359.0)
      val lat2 = rnd.between(-60.0, 60.0); val lon2 = rnd.between(0.0, 359.0)
      val d12 = GeoFns.vincentyKmScala(lat1, lon1, lat2, lon2)
      val d21 = GeoFns.vincentyKmScala(lat2, lon2, lat1, lon1)
      assert(math.abs(d12 - d21) < 1e-6)
      if (d12 > 1.0) {
        val hav = {
          val dLat = math.toRadians(lat2 - lat1)
          val dLon = math.toRadians(lon2 - lon1)
          val a = math.pow(math.sin(dLat / 2), 2) +
            math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
              math.pow(math.sin(dLon / 2), 2)
          6371.0088 * 2 * math.asin(math.sqrt(a))
        }
        assert(math.abs(d12 - hav) / d12 < 0.006,
          s"($lat1,$lon1)->($lat2,$lon2): vincenty $d12 vs haversine $hav")
      }
    }
  }

  test("lon wrap: negative → +360, non-negative unchanged (P3)") {
    import spark.implicits._
    val rows = Seq(-88.0, -19.4, 0.0, 284.5)
      .toDF("lon").select(GeoFns.wrapLon360(col("lon"))).as[Double].collect()
    assert(rows.toSeq === Seq(272.0, 340.6, 0.0, 284.5))
  }
}
