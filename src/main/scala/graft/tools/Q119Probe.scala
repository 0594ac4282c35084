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
    // stage dissection: parallel collects / map builds / scoring job
    locally {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      var t0 = System.nanoTime()
      val fT = Future(LangModel.trigramCounts(docs, "text").limit(8000001).collect())
      val fU = Future(LangModel.unigramCounts(docs, "text").limit(8000001).collect())
      val fB = Future(LangModel.bigramCounts(docs, "text").limit(8000001).collect())
      val (triR, uniR, biR) =
        (Await.result(fT, Duration.Inf), Await.result(fU, Duration.Inf),
          Await.result(fB, Duration.Inf))
      println(f"[q119] parallel collects: ${(System.nanoTime() - t0) / 1e9}%.2f s (tri=${triR.length} bi=${biR.length} uni=${uniR.length})")
      t0 = System.nanoTime()
      val sc0 = spark.sparkContext
      val uni = sc0.broadcast(graft.fn.TokenCountMap.fromRows(uniR, 1))
      val bi = sc0.broadcast(graft.fn.TokenCountMap.fromRows(biR, 2))
      val tri = sc0.broadcast(graft.fn.TokenCountMap.fromRows(triR, 3))
      var total = 0L; uniR.foreach(r => total += r.getLong(1))
      println(f"[q119] map builds: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      (1 to 3).foreach { _ =>
        t0 = System.nanoTime()
        val nls = org.apache.spark.sql.graftbridge.column(
          graft.fn.TrigramSbNll(org.apache.spark.sql.graftbridge.expression(
            col("text")), uni, bi, tri, total))
        slice.select(col("doc_id"), nls.as("__s")).count()
        println(f"[q119] scoring job: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      (1 to 3).foreach { _ =>
        t0 = System.nanoTime()
        val nls = org.apache.spark.sql.graftbridge.column(
          graft.fn.TrigramSbNll(org.apache.spark.sql.graftbridge.expression(
            col("text")), uni, bi, tri, total))
        slice.select(col("doc_id"), nls.as("__s"))
          .filter(col("__s").isNotNull)
          .select(col("doc_id"), col("__s.n_toks").as("n_toks"),
            col("__s.avg_nls").as("avg_nls"))
          .count()
        println(f"[q119] scoring job w/ field split: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
