package graft.tools
import org.apache.spark.sql.SparkSession
/** sf10 re-reading of the sampling family AFTER the bottom-k-by-key
  * aggregate rewrite (round-7 ledger rows were the window form).
  * `sbt "runMain graft.tools.SampleProbeR8 [sf10Dir] [N]"`.
  */
object SampleProbeR8 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val n = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/documents.parquet").count()
    for (q <- Seq("q89_quota_sample", "q122_weighted_sample", "q123_dsir_resample")) {
      val fn = graft.SparkEntry.queries(q)
      val t = (1 to n).map { _ =>
        val t0 = System.nanoTime(); fn(spark, dir).count(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[sample-r8] $q%-24s $t%6.2f s (min of $n, $dir)")
    }
    spark.stop()
  }
}
