package graft.tools
import org.apache.spark.sql.SparkSession
/** A/B: q113 embedding covariance, fused VecMomentsAgg vs the prior
  * unfused vec_sum(vec_outer_upper(x)) shape, sf1 + sf10 min-of-3.
  * `sbt "runMain graft.tools.Q113Probe [sf1] [sf10]"`.
  */
object Q113Probe {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/sf1")
    val sf10 = if (args.length > 1) args(1) else "/tmp/sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.{graftbridge => gb}
    for (dir <- Seq(sf1, sf10)) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(transform(col("embedding"), _.cast("double")).as("v"))
      emb.count()
      def fused(): Unit = graft.ext.VecStats.meanCovariance(emb, col("v"))
      def unfused(): Unit = {
        val outer = gb.column(graft.fn.VecOuterUpper(gb.expression(col("v"))))
        emb.agg(count(lit(1)), graft.ext.SimJoin.vecSum(col("v")),
          graft.ext.SimJoin.vecSum(outer)).collect()
      }
      val t = collection.mutable.Map[String, List[Double]]()
      for (_ <- 1 to 3; (name, f) <- Seq("fused" -> fused _, "unfused" -> unfused _)) {
        val t0 = System.nanoTime(); f(); val dt = (System.nanoTime() - t0) / 1e9
        t(name) = dt :: t.getOrElse(name, Nil)
      }
      for (n <- Seq("unfused", "fused"))
        println(f"[q113-probe] $dir%-10s $n%-8s ${t(n).min}%6.2f s (min of 3)")
    }
    spark.stop()
  }
}
