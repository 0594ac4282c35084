package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-9 clean re-read of the two r8-flagged bench deltas with the
  * EXACT Bench methodology (count() materialization, warm session,
  * min-of-N): q56_grouping_sets 0.206→0.319 s and q89_quota_sample
  * 0.087→0.147 s. `sbt "runMain graft.tools.Q56Q89Probe [sfDir]"`.
  */
object Q56Q89Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    spark.read.parquet(s"$dir/documents.parquet").count()
    for (q <- Seq("q56_grouping_sets", "q89_quota_sample")) {
      val runs = (1 to 6).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q5689] $q%-20s min ${runs.min}%6.3f s   runs ${runs.map(r => f"$r%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
