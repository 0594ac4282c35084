package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-10 sf10 ledger rows: the new graded queries (q136 WET
  * extraction, q137 MP3 side-info, q138 Ogg meta) timed with the
  * Bench session config at an arbitrary SF dir, min-of-3 after a
  * warm-up, with row counts printed so the scale-up factor is
  * visible next to the time. `SPARK_GRAFT_SF_DIR` selects the data;
  * args override the default query list.
  */
object R10ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q136_wet_extract", "q137_mp3_sideinfo", "q138_ogg_meta")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val rows = fn(spark, dir).count() // warm-up + the count
      val best = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[r10] $n%-20s $best%7.2f s  rows=$rows%,d  ($dir)")
    }
    spark.stop()
  }
}
