package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q124Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val or = spark.read.parquet(s"$dir/orders.parquet")
    li.count(); or.count()
    def timeit(name: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ => val t0=System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      println(f"[q124probe] $name%-28s ${ts.min}%6.2f s")
    }
    def hotKey(c: org.apache.spark.sql.Column) =
      when(pmod(c, lit(10L)) < 9, lit(0L)).otherwise(pmod(c, lit(1000L)))
    timeit("scan lineitem 3cols") {
      li.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")).agg(count(lit(1))).collect()
    }
    timeit("li hotkey groupBy") {
      li.withColumn("k", hotKey(col("l_orderkey"))).groupBy(col("k")).agg(count(lit(1))).collect()
    }
    timeit("orders dim agg") {
      or.withColumn("k", hotKey(col("o_orderkey"))).groupBy(col("k")).agg(count(lit(1))).collect()
    }
    timeit("full q124") {
      graft.SparkEntry.queries("q124_salted_join")(spark, dir).count()
    }
    val df = graft.SparkEntry.queries("q124_salted_join")(spark, dir)
    println(df.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
