package graft.tools
import org.apache.spark.sql.SparkSession

/** Driver-side probe (NOT an operator): q103 semantic-dedup timing at
  * sf1 after the fused NearestCentroidCos assignment kernel
  * (VERDICT r5 item 2). `sbt "runMain graft.tools.Q103Probe [sfDir]"`.
  */
object Q103Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/embeddings.parquet").count()
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q103_semantic_dedup")(spark, dir).count()
      println(f"[q103probe] run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    spark.stop()
  }
}
