package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev probe: q10's revenue expression as exact long "cents"
  * arithmetic vs the BigDecimal-path decimal multiply (round-7 q10
  * constant hunt). extprice has 2 decimals, discount 2 → the product
  * is exact in 1e-4 units and fits a long with 10^3 headroom at any
  * realistic SF per-order; per-order sums < 2^62 until ~10^14 rows
  * per order. Result must be bit-identical after the final
  * double division.
  */
object Q10Cents {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    l.count()

    val dec = l.groupBy($"l_orderkey")
      .agg(sum(($"l_extendedprice".cast(DecimalType(18, 2)) *
             (lit(BigDecimal(1)) - $"l_discount".cast(DecimalType(18, 2)))))
          .as("__rev"), count(lit(1)).as("__n"))
    val cents = l.groupBy($"l_orderkey")
      .agg(sum((round($"l_extendedprice" * 100).cast("long") *
              (lit(10000L) - round($"l_discount" * 10000).cast("long"))))
          .as("__rev6"), count(lit(1)).as("__n"))

    val n = 5
    val td = new Array[Double](n); val tc = new Array[Double](n)
    for (i <- 0 until n) {
      var t0 = System.nanoTime(); dec.count()
      td(i) = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); cents.count()
      tc(i) = (System.nanoTime() - t0) / 1e9
    }
    println(f"[q10cents] decimal min=${td.min}%5.2f s  cents min=${tc.min}%5.2f s")

    // parity: decimal sum cast double == cents sum / 1e6 (both exact
    // rationals in 1e-6 units, one rounding at the cast)
    val a = dec.select($"l_orderkey", $"__rev".cast("double").as("r"))
    // exact rescale: unscaled long -> decimal, × 10^-6 (decimal
    // multiply is exact), ONE rounding at the final double cast —
    // long/1e6 in double arithmetic would round twice
    val b = cents.select($"l_orderkey",
      ($"__rev6".cast(DecimalType(38, 0)) *
        lit(BigDecimal("0.000001"))).cast("double").as("r"))
    val diff = a.join(b, "l_orderkey").filter(a("r") =!= b("r")).count()
    println(s"[q10cents] mismatched orders: $diff")
    spark.stop()
  }
}
