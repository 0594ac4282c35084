package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Opt-in bench variant (VERDICT r5 item 3): q10's join+agg chain on
  * lineitem/orders BUCKETED by orderkey — the layout BucketedJoinSpec
  * demonstrates, applied to the bench query at sf1 so the
  * exchange-free plan and its timing are on record.
  * `sbt "runMain graft.tools.Q10Bucketed [sfDir]"`.
  *
  * What bucketing buys this chain: the per-order partial aggregation
  * groups on l_orderkey (the bucket key → no exchange below the
  * aggregate) and the orders join is co-partitioned (32=32 buckets →
  * no exchange on either join input). The two 1.5M-row exchanges the
  * round-5 probe measured as q10's deficit are exactly the ones
  * removed; the downstream per-customer shuffle (o_custkey — a
  * different key) stays, as it must. The one-time bucketed write is
  * the amortized cost: at 100 TB it is paid once and every
  * orderkey-grained join/agg afterwards rides it.
  */
object Q10Bucketed {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val wh = java.nio.file.Files.createTempDirectory("q10_bucketed").toString
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val n = spark.read.parquet(s"$dir/nation.parquet")
    l.count(); o.count(); c.count() // warm page cache

    // pre-repartition on the bucket key (same Murmur3 hash as the
    // bucket spec) so every writer task holds exactly one bucket →
    // one file per bucket, not writers×buckets small files (the
    // small-file tax would otherwise be charged to every later scan)
    var t0 = System.nanoTime()
    l.repartition(32, $"l_orderkey").write.mode("overwrite")
      .option("path", s"$wh/lineitem_b")
      .bucketBy(32, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
    o.repartition(32, $"o_orderkey").write.mode("overwrite")
      .option("path", s"$wh/orders_b")
      .bucketBy(32, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    println(f"[q10bucketed] one-time bucketed write ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    println(s"[q10bucketed] lineitem_b files: ${new java.io.File(s"$wh/lineitem_b").listFiles().count(_.getName.endsWith(".parquet"))}")

    def chain(li: org.apache.spark.sql.DataFrame,
              or: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val perOrder = li.groupBy($"l_orderkey")
        .agg(sum(($"l_extendedprice".cast(DecimalType(18, 2)) *
               (lit(BigDecimal(1)) - $"l_discount".cast(DecimalType(18, 2)))))
            .as("__rev"),
          count(lit(1)).as("__n"))
      val perCust = perOrder
        .join(or.select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_custkey")
        .agg(sum($"__rev").as("__rev"), sum($"__n").as("__n"))
      perCust
        .join(c.select($"c_custkey", $"c_nationkey"),
          $"o_custkey" === $"c_custkey")
        .join(n, $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(sum($"__rev").cast("double").as("revenue"),
          sum($"__n").as("n_items"))
        .orderBy($"n_name")
    }

    val bucketed = chain(spark.table("lineitem_b"), spark.table("orders_b"))
    val plain = chain(l, o)
    // bucketing must remove every Exchange KEYED ON the orderkey (the
    // per-order aggregate's and the orders join's); the custkey /
    // nationkey exchanges belong to later stages and remain in both
    def orderkeyExchanges(df: org.apache.spark.sql.DataFrame): Int = {
      val p = df.queryExecution.executedPlan.toString
      "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
        .findAllIn(p).length
    }
    println(s"[q10bucketed] orderkey exchanges: plain=${orderkeyExchanges(plain)} bucketed=${orderkeyExchanges(bucketed)} (want >0 / 0)")

    // interleaved A/B, min-of-6: this box's steal bursts swamp any
    // single pair of runs
    val reps = 6
    val pt = new Array[Double](reps); val bt = new Array[Double](reps)
    for (i <- 0 until reps) {
      var t1 = System.nanoTime(); plain.count()
      pt(i) = (System.nanoTime() - t1) / 1e9
      t1 = System.nanoTime(); bucketed.count()
      bt(i) = (System.nanoTime() - t1) / 1e9
    }
    println(f"[q10bucketed] plain    min=${pt.min}%5.2f s  runs=${pt.map(x => f"$x%.2f").mkString(" ")}")
    println(f"[q10bucketed] bucketed min=${bt.min}%5.2f s  runs=${bt.map(x => f"$x%.2f").mkString(" ")}")
    spark.stop()
  }
}
