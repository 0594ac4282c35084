package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-side probe (VERDICT r5 item 5): the round-5/6 query family
  * (q102-q112) timed at sf1 AND sf10 in one session, reporting the
  * sf10/sf1 wall ratio per query — the asymptotics check that
  * confirmed q15/q80's shapes in earlier rounds. Data volume grows
  * 10×, so a ratio ≲ 10 is at-worst-linear; bounded-output queries
  * (fixed id slices) should sit well under it.
  * `sbt "runMain graft.tools.ScaleProbeR5 [sf1Dir] [sf10Dir]"`.
  */
object ScaleProbeR5 {
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
      "q102_lm_perplexity", "q103_semantic_dedup", "q104_winnow_fps",
      "q104x_winnow_fps_xx", "q105_kmv_distinct", "q106_winnow_pairs",
      "q106x_winnow_pairs_xx", "q107_bpe_tokens", "q108_curation_r5",
      "q109_bigram_lm", "q110_ivf_quantized", "q111_winnow_decontam",
      "q112_bpe_encode")

    def timed(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      // min-of-2: the documented steal-burst estimator on this box
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    // warm both dirs' page cache + codegen once
    Seq(sf1, sf10).foreach { d =>
      spark.read.parquet(s"$d/documents.parquet").count()
      spark.read.parquet(s"$d/embeddings.parquet").count()
    }

    println(f"[scale-r5] ${"query"}%-22s ${"sf1"}%8s ${"sf10"}%8s ${"ratio"}%7s")
    family.foreach { name =>
      val t1 = timed(name, sf1)
      val t10 = timed(name, sf10)
      println(f"[scale-r5] $name%-22s $t1%8.2f $t10%8.2f ${t10 / t1}%7.2f")
    }
    spark.stop()
  }
}
