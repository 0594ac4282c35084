package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: q109/q102 timing after the ngram_counts trainer switch. */
object Q109Check {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/documents.parquet").count()
    Seq("q102_lm_perplexity", "q109_bigram_lm").foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q109check] $name%-22s min=${t.min}%6.2f runs=${t.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
