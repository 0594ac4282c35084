package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: q122/q123 at a given SF (noop-write, min-of-2). */
object Q122Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/documents.parquet").count()
    Seq("q122_weighted_sample", "q123_dsir_resample").foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[q122p] ${dir.split('/').last} $name%-24s $t%6.2f s")
    }
    spark.stop()
  }
}
