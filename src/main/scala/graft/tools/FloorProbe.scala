package graft.tools
import org.apache.spark.sql.SparkSession

/** Quantifies the per-query fixed floor at bench scale: how much of a
  * trivial query's warm wall time is (a) job scheduling, (b) parquet
  * relation re-creation (file listing + footer), (c) plan
  * analysis/optimization/codegen. Informs whether a catalog-style
  * relation cache is worth shipping in the bench session.
  */
object FloorProbe {
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
    import org.apache.spark.sql.functions._

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val runs = (0 until 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"[floor] $label%-40s min=${runs.min}%8.1f ms  med=${runs.sorted.apply(2)}%8.1f ms")
    }

    time("range(1).count")(spark.range(1).count())
    time("read.parquet(lineitem).count fresh")(
      spark.read.parquet(s"$dir/lineitem.parquet").count())
    val cached = spark.read.parquet(s"$dir/lineitem.parquet")
    time("cached relation .count")(cached.count())
    time("fresh read + filter+agg") {
      val l = spark.read.parquet(s"$dir/lineitem.parquet")
      l.filter(col("l_quantity") > 10).groupBy("l_returnflag")
        .agg(sum("l_extendedprice")).count()
    }
    time("cached rel + filter+agg") {
      cached.filter(col("l_quantity") > 10).groupBy("l_returnflag")
        .agg(sum("l_extendedprice")).count()
    }
    // same shape but a NEW column object each call (plan cache miss?)
    time("cached rel + filter+agg + distinct lit") {
      cached.filter(col("l_quantity") > lit(10)).groupBy("l_returnflag")
        .agg(sum("l_extendedprice"), max(lit(scala.util.Random.nextInt(5)))).count()
    }
    spark.stop()
  }
}
