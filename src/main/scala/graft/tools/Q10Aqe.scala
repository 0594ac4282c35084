package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: q10 at sf10 under AQE coalesce settings (round-7 —
  * does parallelismFirst=false shrink the 15M-group aggregate to too
  * few tasks?).
  */
object Q10Aqe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    for ((pf, adv) <- Seq(("false", "64m"), ("true", "64m"), ("false", "16m"), ("false", "8m"))) {
      val spark = SparkSession.builder().master("local[32]")
        .appName(s"q10aqe_${pf}_$adv")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", adv)
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      spark.read.parquet(s"$dir/lineitem.parquet").count()
      val df = graft.SparkEntry.queries("q10_join_agg_chain")(spark, dir)
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[q10aqe] parallelismFirst=$pf%-6s advisory=$adv%-4s $t%6.2f s (min of 3)")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
