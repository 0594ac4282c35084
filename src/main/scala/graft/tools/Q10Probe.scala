package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver-side probe (NOT an operator): stage-by-stage timing of the
  * q10 join+agg chain to find where the sf1 wall-clock goes.
  * `sbt "runMain graft.tools.Q10Probe [sfDir]"`.
  *
  * Finding (sf1, 32 threads, recorded in BENCH_NOTES round 5): the
  * cost is the HIGH-CARDINALITY per-order aggregation itself (6M rows
  * → 1.5M groups ≈ 0.8-1.9 s) plus the two downstream 1.5M-row
  * exchanges — NOT decimal boxing: a long-cents A/B (primitive
  * integer money math through every exchange, decimal only in the
  * final 25-row agg) benched within noise of the decimal form, so
  * the simpler decimal formulation stays. The staged
  * aggregate-below-join structure remains the scale-correct shape;
  * the residual vs DuckDB is exchange constant factor, which
  * bucketing lineitem/orders by orderkey would remove at 100 TB
  * (BucketedJoinSpec demonstrates the mechanism).
  */
object Q10Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[q10probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val c = spark.read.parquet(s"$dir/customer.parquet")
    l.count(); o.count(); c.count() // warm page cache + codegen

    val cents =
      (($"l_extendedprice".cast(DecimalType(18, 2)) * lit(100)).cast("long") *
        (((lit(BigDecimal(1)) - $"l_discount".cast(DecimalType(18, 2)))) * lit(100)).cast("long"))
    time("scan+project only")(l.select($"l_orderkey", cents.as("r")).count())
    time("perOrder long agg")(
      l.groupBy($"l_orderkey").agg(sum(cents).as("r"), count(lit(1))).count())
    time("perOrder decimal agg")(
      l.groupBy($"l_orderkey")
        .agg(sum($"l_extendedprice".cast(DecimalType(18, 2)) *
          (lit(BigDecimal(1)) - $"l_discount".cast(DecimalType(18, 2)))).as("r")).count())
    val perOrder = l.groupBy($"l_orderkey").agg(sum(cents).as("r"), count(lit(1)).as("n"))
    time("perOrder + orders join")(
      perOrder.join(o.select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey").count())
    time("... + perCust agg")(
      perOrder.join(o.select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_custkey").agg(sum($"r"), sum($"n")).count())
    spark.stop()
  }
}
