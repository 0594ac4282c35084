package graft.tools
import org.apache.spark.sql.SparkSession

object FloorProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      f
      val runs = (0 until 7).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"[floor] $label%-44s min=${runs.min}%8.1f ms  med=${runs.sorted.apply(3)}%8.1f ms")
    }
    time("range(1,slices=1).count")(spark.range(0, 1, 1, 1).count())
    time("range(1,slices=32).count")(spark.range(0, 1, 1, 32).count())
    time("rdd range(1 slice) count")(spark.sparkContext.parallelize(Seq(1), 1).count())
    time("rdd range(32 slices) count")(spark.sparkContext.parallelize(1 to 32, 32).count())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("AQE OFF range(1,slices=1).count")(spark.range(0, 1, 1, 1).count())
    time("AQE OFF range(1,slices=32).count")(spark.range(0, 1, 1, 32).count())
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    import org.apache.spark.sql.functions._
    time("AQE OFF cached rel filter+agg count")(
      l.filter(col("l_quantity") > 10).groupBy("l_returnflag").agg(sum("l_extendedprice")).count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    time("AQE ON  cached rel filter+agg count")(
      l.filter(col("l_quantity") > 10).groupBy("l_returnflag").agg(sum("l_extendedprice")).count())
    spark.stop()
  }
}
