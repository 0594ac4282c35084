package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: the ACTUAL q72 as Bench runs it (no repartition), to
  * explain BENCH_r03's 4.59 s vs JsonProbe's 0.56 s on the same data.
  */
object Q72Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = graft.Queries2.all("q72_json_extract")(spark, dir).count()
      println(f"[q72probe] run$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val df = graft.Queries2.all("q72_json_extract")(spark, dir)
    println("[q72probe] scan partitions: " + df.rdd.getNumPartitions)
    df.explain("formatted")
    spark.stop()
  }
}
