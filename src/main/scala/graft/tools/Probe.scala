package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (tbl <- Seq("events", "lineitem", "orders", "embeddings", "documents")) {
      try {
        val df = spark.read.parquet(s"$dir/$tbl.parquet")
        println(s"== $tbl: ${df.count()} rows")
        df.printSchema()
        df.show(3, truncate = 60)
      } catch { case e: Throwable => println(s"== $tbl FAILED: ${e.getMessage.take(500)}") }
    }
    import graft.SparkEntry
    val e = SparkEntry.entry(spark)
    println("== entry rows: " + e.count())
    e.show(5)
    spark.stop()
  }
}
