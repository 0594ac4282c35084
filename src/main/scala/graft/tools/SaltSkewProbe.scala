package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the q124 salted-join shape at sf1: planted 90%-hot
  * join key, broadcast disabled (the at-scale regime where the dim
  * side no longer fits), salted vs plain sort-merge join, min-of-N
  * interleaved. AQE's skew-join split is ALSO measured as the third
  * arm — Salt targets the regimes AQE doesn't cover (aggregation
  * keys, broadcast-ineligible shapes, pre-AQE engines), so the probe
  * records where each lands rather than claiming one dominates.
  * `sbt "runMain graft.tools.SaltSkewProbe [sfDir] [N]"`.
  */
object SaltSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val n = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def hotKey(c: org.apache.spark.sql.Column) =
      when(pmod(c, lit(10L)) < 9, lit(0L)).otherwise(pmod(c, lit(1000L)))

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("k", hotKey(col("l_orderkey")))
    val dim = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("k", hotKey(col("o_orderkey")))
      .groupBy(col("k")).agg(count(lit(1)).as("dim_cnt"))
    li.count(); dim.count() // warm page cache

    def fin(j: DataFrame): DataFrame =
      j.groupBy(col("k"))
        .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sq"),
          max(col("dim_cnt")).as("dc"))

    def plain(): DataFrame = fin(li.join(dim, Seq("k")))
    def salted(): DataFrame = fin(graft.ops.Salt.saltedJoin(li, dim, Seq("k"),
      col("l_orderkey") * 16 + col("l_linenumber"), nSalts = 32))

    // answers agree before timing
    require(salted().exceptAll(plain()).isEmpty, "salted != plain")

    val arms: Seq[(String, () => DataFrame, Boolean)] = Seq(
      ("plain_smj_noaqe", plain _, false),
      ("plain_smj_aqe_skew", plain _, true),
      ("salted_smj", salted _, false))
    val times = collection.mutable.Map[String, List[Double]]()
    for (_ <- 1 to n; (name, mk, aqeSkew) <- arms) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqeSkew.toString)
      val t0 = System.nanoTime()
      mk().agg(count(lit(1))).collect()
      val t = (System.nanoTime() - t0) / 1e9
      times(name) = t :: times.getOrElse(name, Nil)
    }
    for ((name, _, _) <- arms)
      println(f"[salt-probe] $name%-20s ${times(name).min}%6.2f s (min of $n, $dir, 90%%-hot key, no broadcast)")
    spark.stop()
  }
}
