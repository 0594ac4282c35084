package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the round-7 order-hash xx twins: q105/q105x and
  * q82/q82x interleaved (steal-burst methodology) at sf1 and sf10,
  * min-of-N. `sbt "runMain graft.tools.KmvProbe [sf1] [sf10] [N]"`.
  */
object KmvProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/sf1")
    val sf10 = if (args.length > 1) args(1) else "/tmp/sf10"
    val n = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pairs = Seq("q105_kmv_distinct" -> "q105x_kmv_distinct_xx",
                    "q82_bottomk_sample" -> "q82x_bottomk_xx")
    for (dir <- Seq(sf1, sf10)) {
      spark.read.parquet(s"$dir/documents.parquet").count()
      for ((md5q, xxq) <- pairs) {
        val times = collection.mutable.Map[String, List[Double]]()
        for (_ <- 1 to n; q <- Seq(md5q, xxq)) { // interleaved A/B
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(q)(spark, dir).count()
          val t = (System.nanoTime() - t0) / 1e9
          times(q) = t :: times.getOrElse(q, Nil)
        }
        for (q <- Seq(md5q, xxq))
          println(f"[kmv-probe] $dir%-10s $q%-24s ${times(q).min}%6.2f s (min of $n)")
      }
    }
    spark.stop()
  }
}
