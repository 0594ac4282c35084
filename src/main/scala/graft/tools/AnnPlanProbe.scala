package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-10 verdict item 4: q70/q73 moved together (+77%/+54%) in the
  * driver's round-9 single-session run — re-read them by name. This
  * probe prints the two executed plans so broadcast thresholds and
  * bucket counts can be checked for drift against the design
  * (q70: broadcast of the query vectors, one pass over embeddings;
  * q73: IVF bucket join, centroid broadcast), alongside the
  * fresh-JVM min-of-3 timings in BENCH_NOTES.
  */
object AnnPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq("q70_cosine_topk", "q73_ann_topk")) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.count()
      println(s"[ann] ==== $n")
      println(df.queryExecution.executedPlan.toString
        .linesIterator.map(l => "[ann] " + l.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
