package graft.tools

/** sf0.1/sf10 ledger rows for q133 (crawl pipeline) and q134 (robots
  * gate) — BENCH_NOTES round-9 section. */
object Q133Q134Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(name: String, dir: String): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/sf10")) {
      spark.read.parquet(s"$d/documents.parquet").count()
      println(f"q133 $d: ${timed("q133_crawl_pipeline", d)}%.3f s")
      println(f"q134 $d: ${timed("q134_robots_gate", d)}%.3f s")
    }
    spark.stop()
  }
}
