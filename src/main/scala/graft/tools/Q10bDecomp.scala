package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-16: why does the q10b bucketed-scan stage cost ~350 ms/task
  * when the same rows through the plain scan cost ~0.2 core-s total?
  * Times each suspect in isolation over the SAME bucketed table.
  */
object Q10bDecomp {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val lb = graft.io.BucketedLayout.table(spark, dir, "lineitem", "l_orderkey")
    val lp = graft.Tables.tbl(spark, dir, "lineitem")

    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.count()
      val best = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[q10b] $label%-42s $best%7.3f s")
    }

    time("bucketed: bare scan count")(lb.select($"l_orderkey"))
    time("plain:    bare scan count")(lp.select($"l_orderkey"))
    time("bucketed: groupBy(orderkey).count")(
      lb.groupBy($"l_orderkey").agg(count(lit(1))))
    time("plain:    groupBy(orderkey).count")(
      lp.groupBy($"l_orderkey").agg(count(lit(1))))
    time("bucketed: decimal rev agg")(
      lb.groupBy($"l_orderkey").agg(sum(($"l_extendedprice".cast(DecimalType(18, 2)) *
        (lit(BigDecimal(1)) - $"l_discount".cast(DecimalType(18, 2)))))))
    time("plain:    decimal rev agg")(
      lp.groupBy($"l_orderkey").agg(sum(($"l_extendedprice".cast(DecimalType(18, 2)) *
        (lit(BigDecimal(1)) - $"l_discount".cast(DecimalType(18, 2)))))))
    time("bucketed: double rev agg")(
      lb.groupBy($"l_orderkey").agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))))
    time("FULL q10b chain")(
      graft.SparkEntry.queries("q10b_join_agg_bucketed")(spark, dir))
    time("FULL q10 chain")(
      graft.SparkEntry.queries("q10_join_agg_chain")(spark, dir))
    spark.stop()
  }
}
