package graft

import org.apache.spark.sql.functions._
import graft.fn.GeoFns

/** VincentyKm native expression: parity with the UDF, codegen, SQL
  * registration via GraftExtensions.
  */
class VincentySpec extends SparkSpec {
  import spark.implicits._

  private lazy val pairs = {
    val rnd = new scala.util.Random(42)
    (0 until 300).map { _ =>
      (rnd.nextDouble() * 160 - 80, rnd.nextDouble() * 360,
       rnd.nextDouble() * 160 - 80, rnd.nextDouble() * 360)
    }.toDF("lat1", "lon1", "lat2", "lon2")
  }

  test("native expression == UDF on 300 random pairs (interpreted + codegen paths)") {
    val both = pairs.select(
      GeoFns.vincentyKmNative($"lat1", $"lon1", $"lat2", $"lon2").as("native"),
      GeoFns.vincentyKm($"lat1", $"lon1", $"lat2", $"lon2").as("viaUdf"))
    val rows = both.as[(Double, Double)].collect()
    rows.foreach { case (n, u) => assert(n === u) }
  }

  test("null inputs -> null output (strict null semantics without UDF boxing)") {
    val df = Seq((Some(1.0), None: Option[Double])).toDF("a", "b")
    val out = df.select(GeoFns.vincentyKmNative($"a", $"b", lit(2.0), lit(3.0)))
      .collect().head
    assert(out.isNullAt(0))
  }

  test("flagship distance projection stays in one whole-stage codegen span (no ScalaUDF)") {
    // non-foldable source (range-derived) so the projection actually
    // compiles instead of constant-folding into a LocalTableScan
    val proj = spark.range(1000).select(
      GeoFns.vincentyKmNative(($"id" % 80).cast("double"), ($"id" % 360).cast("double"),
        ($"id" % 70).cast("double"), ($"id" % 350).cast("double")).as("d"))
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // "*(1) Project [vincenty_km(...)]" — the * marks the whole-stage
    // codegen span; the projection fuses with the Range scan
    assert(plan.contains("*(1) Project [vincenty_km"), plan)
    assert(proj.agg(sum($"d")).collect().head.getDouble(0) > 0) // executes the codegen path
  }

  test("SQL registration: vincenty_km callable from SQL after install") {
    GraftExtensions.install(spark)
    val got = spark.sql(
      "SELECT vincenty_km(0.0D, 0.0D, 0.0D, 1.0D) AS d").collect().head.getDouble(0)
    // one degree of longitude on the WGS-84 equator ≈ 111.3195 km
    assert(math.abs(got - 111.3195) < 0.01, got)
  }

  test("ZeroDistanceRule folds self-distance to 0 without running the kernel") {
    GraftExtensions.install(spark)
    val df = spark.range(100).select(
      ($"id" % 90).cast("double").as("lat"), ($"id" % 180).cast("double").as("lon"))
    val proj = df.select(GeoFns.vincentyKmNative($"lat", $"lon", $"lat", $"lon").as("d"))
    val optimized = proj.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("vincenty_km"), optimized)
    assert(proj.agg(max($"d")).collect().head.getDouble(0) === 0.0)
    // different args survive the rule
    val real = df.select(GeoFns.vincentyKmNative($"lat", $"lon", $"lat", $"lon" + 1).as("d"))
    assert(real.queryExecution.optimizedPlan.toString.contains("vincenty_km"))
  }
}
