package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (round 7): q104 on the FULL corpus — no doc_id slice —
  * both hashers, min-of-N, for the like-for-like reading VERDICT r6
  * asked for (the benched slice is job-floor dominated). The matching
  * DuckDB SQL is q104Sql minus the WHERE; scripts/duck_bench can run
  * it from the JSON this prints a reminder for.
  */
object Q104Full {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val n = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.docsPar(spark, dir)
    docs.count()
    for (xx <- Seq(false, true)) {
      val df = graft.ext.Dedup.winnowFingerprints(
        docs, "doc_id", "text", 5, 4, xx = xx)
      val t = (1 to n).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[q104full] $dir xx=$xx%-5s $t%6.2f s (min of $n)")
    }
    spark.stop()
  }
}
