package graft.tools
object Q125Check {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q125_video_neardup")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    val planted = rows.count(_.getAs[Int]("planted") == 1)
    println(s"[q125] rows=${rows.length} planted=$planted/12")
    require(planted == 12, "planted pairs missing")
    spark.stop()
  }
}
