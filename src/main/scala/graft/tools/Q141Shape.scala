package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan-shape A/B for q141: how many times does the expensive decode
  * expression actually run per row? (a) the q137-style
  * project-through-filter shape (CollapseProject + predicate pushdown
  * can multiply evaluations of the shared struct), vs (b) an
  * explode(array(...)) Generate barrier that pins exactly one
  * evaluation. Prints wall times + a decode-call counter.
  */
object Q141Shape {
  val calls = new java.util.concurrent.atomic.AtomicLong(0)

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.{graftbridge => gb}
    import spark.implicits._

    val base = graft.Tables.spread(spark,
      graft.Tables.tbl(spark, dir, "documents").select($"doc_id"),
      minParts = spark.sparkContext.defaultParallelism)

    def stats = gb.column(graft.fn.VorbisPcmStats(
      graft.fn.VorbisPcmSynth(gb.expression($"doc_id".cast("long")))))

    val shapeA = base.select($"doc_id", stats.as("__v"))
      .filter($"__v".isNotNull)
      .select($"doc_id", $"__v.post_sum", $"__v.res_sum", $"__v.curve_sum",
        $"__v.pcm_samples", $"__v.n_packets", $"__v.channels", $"__v.rate")

    val shapeB = base.select($"doc_id", explode(array(stats)).as("__v"))
      .filter($"__v".isNotNull)
      .select($"doc_id", $"__v.post_sum", $"__v.res_sum", $"__v.curve_sum",
        $"__v.pcm_samples", $"__v.n_packets", $"__v.channels", $"__v.rate")

    for ((label, df) <- Seq("A project" -> shapeA, "B explode" -> shapeB)) {
      df.count() // warm
      val best = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        df.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[shape] $label%-10s $best%6.2f s")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .take(8).mkString("  ", "\n  ", ""))
    }
    spark.stop()
  }
}
