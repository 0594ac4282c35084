package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-12 sf10 ledger re-run for q139 after the fixture-persistence
  * restructure (VERDICT r11 item 5): the graded plan now reads the
  * engine-written Ogg fixture parquet and measures the setup PARSE.
  * Bench methodology: construct once (the fixture write happens at
  * construction, exactly as `graft.Bench` would see it), one warm
  * execution, then min-of-3 timed executions. Steal ledger printed
  * from /proc/stat deltas around the timed window.
  */
object Q139Ledger {
  private def cpuLine(): Array[Long] =
    scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu ")).get.trim.split("\\s+").drop(1).map(_.toLong)

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
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
    val c0 = cpuLine()
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries("q139_vorbis_books")(spark, dir)
    val tConstruct = (System.nanoTime() - t0) / 1e9
    df.count() // warm
    val times = (0 until 3).map { _ =>
      val t = System.nanoTime(); df.count(); (System.nanoTime() - t) / 1e9
    }
    val c1 = cpuLine()
    val steal = {
      val d = c1.zip(c0).map { case (a, b) => a - b }
      100.0 * d(7) / math.max(1L, d.sum)
    }
    println(f"[q139ledger] construct+fixture-write ${tConstruct}%.2f s; " +
      f"execs ${times.map(t => f"$t%.2f").mkString(", ")} s; " +
      f"min ${times.min}%.2f s; steal ${steal}%.2f%%")
    spark.stop()
  }
}
