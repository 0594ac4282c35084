package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-side probe (VERDICT r7 item 7): the round-7 entries with no
  * sf10 ledger row yet — embedding covariance, hash split, HLL, CMS —
  * plus round 8's q124 salted join, timed at sf1 AND sf10 in one
  * session, min-of-2 per point. Data grows 10×, so ratio ≲ 10 is
  * at-worst-linear. DuckDB same-day numbers come from
  * `scripts/duck_bench.py` over the same dirs.
  * `sbt "runMain graft.tools.ScaleProbeR8 [sf1Dir] [sf10Dir]"`.
  */
object ScaleProbeR8 {
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
      "q113_embed_cov", "q114_hash_split", "q115_hll_distinct",
      "q116_cms_freq", "q124_salted_join")

    def timed(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    Seq(sf1, sf10).foreach { d =>
      spark.read.parquet(s"$d/documents.parquet").count()
      spark.read.parquet(s"$d/embeddings.parquet").count()
      spark.read.parquet(s"$d/events.parquet").count()
      spark.read.parquet(s"$d/lineitem.parquet").count()
    }

    println(f"[scale-r8] ${"query"}%-24s ${"sf1"}%8s ${"sf10"}%8s ${"ratio"}%7s")
    family.foreach { name =>
      val t1 = timed(name, sf1)
      val t10 = timed(name, sf10)
      println(f"[scale-r8] $name%-24s $t1%8.2f $t10%8.2f ${t10 / t1}%7.2f")
    }
    spark.stop()
  }
}
