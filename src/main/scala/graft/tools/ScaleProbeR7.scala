package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-side probe (VERDICT r6 item 7): the suite's most expensive
  * non-family queries — never scale-probed before round 7 — timed at
  * sf1 AND sf10 in one session, min-of-2 per point, reporting the
  * sf10/sf1 wall ratio. Data grows 10×, so ratio ≲ 10 is
  * at-worst-linear. Includes q10/q10b for the join-agg chain's scale
  * shape on plain vs bucketed layouts.
  * `sbt "runMain graft.tools.ScaleProbeR7 [sf1Dir] [sf10Dir]"`.
  */
object ScaleProbeR7 {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/sf1")
    val sf10 = if (args.length > 1) args(1) else "/tmp/sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m") // Bench parity
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val family = Seq(
      "q26_distinct", "q67_neardup_pairs", "q68_simhash", "q90_tfidf_topk",
      "q92_repetition", "q96_inverted_index", "q10_join_agg_chain",
      "q10b_join_agg_bucketed")

    def timed(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, dir) // construction (incl. q10b's one-time write)
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    Seq(sf1, sf10).foreach { d =>
      spark.read.parquet(s"$d/documents.parquet").count()
      spark.read.parquet(s"$d/lineitem.parquet").count()
    }

    println(f"[scale-r7] ${"query"}%-24s ${"sf1"}%8s ${"sf10"}%8s ${"ratio"}%7s")
    family.foreach { name =>
      val t1 = timed(name, sf1)
      val t10 = timed(name, sf10)
      println(f"[scale-r7] $name%-24s $t1%8.2f $t10%8.2f ${t10 / t1}%7.2f")
    }
    spark.stop()
  }
}
