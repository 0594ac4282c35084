package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the round-7 LM-scoring constant work (VERDICT r6
  * item 2): q102/q109 at sf1 and sf10, min-of-N across in-session
  * runs. `sbt "runMain graft.tools.LmProbe [sf1Dir] [sf10Dir] [N]"`.
  */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/sf1")
    val sf10 = if (args.length > 1) args(1) else "/tmp/sf10"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    Seq(sf1, sf10).foreach { d =>
      spark.read.parquet(s"$d/documents.parquet").count()
    }
    for (q <- Seq("q102_lm_perplexity", "q109_bigram_lm");
         d <- Seq(sf1, sf10)) {
      println(f"[lm-probe] $q%-20s $d%-12s ${timed(q, d)}%8.2f s (min of $n)")
    }
    spark.stop()
  }
}
