package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: dump the round-8 late-batch queries (q126+) at sf0.01
  * for a targeted DuckDB diff before the full Verify sweep.
  */
object NewOpsProbeR8b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1) else "/tmp/r8b_out"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(2).toSeq match {
      case Nil => sys.error("pass query names")
      case names => names.foreach { name =>
        val df = graft.SparkEntry.queries(name)(spark, dir)
        df.write.mode("overwrite").parquet(s"$out/$name.parquet")
        println(s"[r8b] $name rows=" + spark.read.parquet(s"$out/$name.parquet").count())
      }
    }
    spark.stop()
  }
}
