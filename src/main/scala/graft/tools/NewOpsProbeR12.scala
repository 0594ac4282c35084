package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-12 new-operator ledger rows (the BENCH_NOTES convention):
  * per query, construct once (fixture writes land at construction,
  * exactly as `graft.Bench` sees them), one warm execution, then
  * min-of-3 timed executions; /proc/stat steal printed around the
  * window. Pass query names as args (default: the round-12 set).
  */
object NewOpsProbeR12 {
  private def cpuLine(): Array[Long] =
    scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu ")).get.trim.split("\\s+").drop(1).map(_.toLong)

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val names = if (args.nonEmpty) args.toSeq else Seq("q151_pdf_text")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.install(spark)
    names.foreach { name =>
      val c0 = cpuLine()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val tc = (System.nanoTime() - t0) / 1e9
      df.count() // warm
      val times = (0 until 3).map { _ =>
        val t = System.nanoTime(); df.count(); (System.nanoTime() - t) / 1e9
      }
      val c1 = cpuLine()
      val d = c1.zip(c0).map { case (a, b) => a - b }
      val steal = 100.0 * d(7) / math.max(1L, d.sum)
      println(f"[r12ledger] $name%-24s construct ${tc}%6.2f s; " +
        f"execs ${times.map(t => f"$t%.2f").mkString("/")} s; " +
        f"min ${times.min}%.2f s; steal ${steal}%.2f%%")
    }
    spark.stop()
  }
}
