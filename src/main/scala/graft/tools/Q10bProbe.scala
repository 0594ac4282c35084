package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: graded q10 vs q10b at sf1 (round-7 item 4) — setup
  * (bucketed write) at construction, then interleaved min-of-N
  * execution timing.
  */
object Q10bProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val n = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.read.parquet(s"$dir/lineitem.parquet").count()
    val t0 = System.nanoTime()
    val q10b = graft.SparkEntry.queries("q10b_join_agg_bucketed")(spark, dir)
    println(f"[q10b-probe] construction incl. bucketed write ${(System.nanoTime() - t0) / 1e9}%5.2f s")
    val q10 = graft.SparkEntry.queries("q10_join_agg_chain")(spark, dir)

    val tp = new Array[Double](n); val tb = new Array[Double](n)
    for (i <- 0 until n) {
      var t1 = System.nanoTime(); q10.count()
      tp(i) = (System.nanoTime() - t1) / 1e9
      t1 = System.nanoTime(); q10b.count()
      tb(i) = (System.nanoTime() - t1) / 1e9
    }
    println(f"[q10b-probe] q10  min=${tp.min}%5.2f s runs=${tp.map(x => f"$x%.2f").mkString(" ")}")
    println(f"[q10b-probe] q10b min=${tb.min}%5.2f s runs=${tb.map(x => f"$x%.2f").mkString(" ")}")
    spark.stop()
  }
}
