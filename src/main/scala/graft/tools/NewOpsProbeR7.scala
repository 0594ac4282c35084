package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time the round-7 batch-10 queries (exact-substring
  * dedup family, Stupid Backoff, sample quantiles) at the given SF
  * dirs, min-of-N, Bench-parity session config.
  * `sbt "runMain graft.tools.NewOpsProbeR7 dir1 [dir2 ...]"`.
  */
object NewOpsProbeR7 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val family = Seq(
      "q117_dup_spans", "q117x_dup_spans_xx", "q118_strip_spans",
      "q119_stupid_backoff", "q120_sample_quantiles", "q120x_sample_quantiles_xx")
    dirs.foreach { dir =>
      spark.read.parquet(s"$dir/documents.parquet").count()
      family.foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        // noop write forces FULL materialization: count() lets the
        // optimizer eliminate q118's strip (left-join elimination on
        // the unique-keyed spans side), timing an empty plan
        val t = (1 to 4).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[newops] ${dir.split('/').last}%-6s $name%-26s $t%7.2f s")
      }
    }
    spark.stop()
  }
}
