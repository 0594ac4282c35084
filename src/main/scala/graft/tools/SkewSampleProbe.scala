package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the round-8 sampling-family rewrite: per-stratum
  * `row_number()` window (every row of a stratum in ONE task, fully
  * sorted) vs the bounded [[graft.fn.BottomKRows]] aggregate
  * (O(partitions × k) exchanged, nothing globally sorted), on a
  * PLANTED-skew synthetic — one stratum owns 90% of the rows, the
  * regime where the window form's defect is visible and local test
  * SFs never are. `sbt "runMain graft.tools.SkewSampleProbe [nRows] [N]"`.
  */
object SkewSampleProbe {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(50000000L)
    val n = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 90% of ids land in stratum "hot"; the rest spread over 9 cold
    // strata. A payload column rides along so the exchanged row is
    // not degenerate-narrow.
    val df = spark.range(nRows).select(
      $"id",
      when(pmod($"id", lit(10)) < 9, lit("hot"))
        .otherwise(concat(lit("cold_"), pmod($"id", lit(97)))).as("src"),
      (pmod($"id" * 2654435761L, lit(100000)) / 1000.0).as("payload"))

    def windowForm(k: Int): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"src")
        .orderBy(graft.ext.Sketches.orderHashXx($"id"), $"id")
      df.withColumn("__rn", row_number().over(w))
        .where($"__rn" <= k).drop("__rn")
    }
    def aggForm(k: Int): DataFrame =
      graft.ext.Sketches.bottomKRows(df, Seq("src"),
        Seq(graft.ext.Sketches.orderHashXx($"id"), $"id"), k)

    val k = 1000
    // answers must agree before timings mean anything
    val a = aggForm(k).orderBy($"src", $"id")
    val b = windowForm(k).orderBy($"src", $"id")
    require(a.except(b).isEmpty && b.except(a).isEmpty, "forms disagree")
    println(s"[skew-probe] forms agree on k=$k over $nRows rows")

    val times = collection.mutable.Map[String, List[Double]]()
    for (_ <- 1 to n; (name, mk) <- Seq("window" -> windowForm _, "bottom_k_rows" -> aggForm _)) {
      val t0 = System.nanoTime()
      mk(k).agg(count(lit(1)), sum($"payload")).collect()
      val t = (System.nanoTime() - t0) / 1e9
      times(name) = t :: times.getOrElse(name, Nil)
    }
    for (name <- Seq("window", "bottom_k_rows"))
      println(f"[skew-probe] $name%-14s ${times(name).min}%6.2f s (min of $n, k=$k, 90%%-hot stratum)")
    spark.stop()
  }
}
