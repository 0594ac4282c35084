package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: BM25 (q88) stage ledger — where do the seconds go at a
  * given SF?
  */
object Q88Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.TextOps

    def docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)

    def time(name: String)(f: => Long): Unit = {
      val runs = (0 until 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[q88probe] $name%-28s ${runs.map(_._1).min}%6.2fs rows=${runs.head._2}")
    }

    val q = Seq("spark", "window", "join")
    time("repartition only")(docs.count())
    time("tokens explode")(TextOps.tokens(docs, "doc_id", "text").count())
    time("tokens+filter")(TextOps.tokens(docs, "doc_id", "text")
      .filter(col("tok").isin(q: _*)).count())
    time("tf groupBy")(TextOps.tokens(docs, "doc_id", "text")
      .filter(col("tok").isin(q: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1))).count())
    time("lens narrow")(docs.select(col("doc_id"),
      size(array_remove(split(col("text"), " "), "")).as("dl")).count())
    time("FULL bm25")(TextOps.bm25(docs, "doc_id", "text", q).count())
    time("FULL q88 (with topk)")(graft.Queries6.all("q88_bm25_topk")(spark, dir).count())
    spark.stop()
  }
}
