package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-11 ledger probe: sf0.1 + sf10 wall rows for the new
  * operators (q145 legacy charsets, q146 charset chain, q147 Opus
  * TOC, q148 Vorbis round-trip, q149 stateful charsets, q150 crawl
  * v2), min-of-3 noop-write reps after a warm rep. DuckDB same-day
  * rows via `scripts/duck_bench.py` against the same dirs.
  * `sbt "runMain graft.tools.NewOpsProbeR11 [sf01] [sf10]"`.
  */
object NewOpsProbeR11 {
  def main(args: Array[String]): Unit = {
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sf10 = if (args.length > 1) args(1) else "/tmp/sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val names = Seq("q145_charset_legacy", "q146_charset_chain",
      "q147_opus_toc", "q148_vorbis_roundtrip", "q149_charset_stateful",
      "q150_crawl_v2")
    for (dir <- Seq(sf01, sf10)) {
      spark.read.parquet(s"$dir/documents.parquet").count()
      for (n <- names) {
        noop(graft.SparkEntry.queries(n)(spark, dir)) // warm
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          noop(graft.SparkEntry.queries(n)(spark, dir))
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"[r11probe] $dir%-22s $n%-24s $t%7.2f s")
      }
    }
    spark.stop()
  }
}
