package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: q117 stage dissection at sf0.1 — where does the ~1.8 s
  * constant go (double window-kernel pass, dup aggregate, join-back,
  * island window)?
  */
object Q117Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.SpanDedup
    val docs = graft.Tables.docsPar(spark, dir)
    docs.count()
    def t(tag: String)(f: => Any): Unit = {
      val xs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q117] $tag%-34s min=${xs.min}%6.2f")
    }
    val wins = SpanDedup.windowHashes(docs, "doc_id", "text", 40)
    t("windows kernel+explode (count)") { wins.count() }
    val dup = wins.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select(col("h"))
    t("dup aggregate (count)") { dup.count() }
    t("hits join (count)") { wins.join(dup, Seq("h")).count() }
    t("full duplicateSpans") {
      SpanDedup.duplicateSpans(docs, "doc_id", "text", 40).count()
    }
    spark.stop()
  }
}
// (plan check appended as a second main)
object Q117Plan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.ext.SpanDedup.duplicateSpans(
      graft.Tables.docsPar(spark, dir), "doc_id", "text", 40)
    df.count()
    println("[plan] " + df.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange"))
      .mkString("\n[plan] "))
    spark.stop()
  }
}
