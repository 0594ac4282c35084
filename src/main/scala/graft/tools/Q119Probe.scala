package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Q119Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.LangModel
    val docs = graft.Tables.docsPar(spark, dir)
    docs.count()
    def t(tag: String)(f: => Unit): Unit = {
      val xs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q119] $tag%-28s min=${xs.min}%6.2f runs=${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    t("uni agg+collect") { LangModel.unigramCounts(docs, "text").limit(8000001).collect() }
    t("bi agg+collect") { LangModel.bigramCounts(docs, "text").limit(8000001).collect() }
    t("tri agg+collect") { LangModel.trigramCounts(docs, "text").limit(8000001).collect() }
    val slice = graft.Tables.tbl(spark, dir, "documents").filter(col("doc_id") < 300)
    t("full scoreStupidBackoff") {
      LangModel.scoreStupidBackoff(slice, "doc_id", "text",
        LangModel.unigramCounts(docs, "text"),
        LangModel.bigramCounts(docs, "text"),
        LangModel.trigramCounts(docs, "text")).count()
    }
    spark.stop()
  }
}
