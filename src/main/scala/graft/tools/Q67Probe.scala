package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dev probe: stage-by-stage wall times for the q67 near-dup pipeline
  * at sf0.1 (VERDICT r2 item 6 — find the remaining cost after the
  * codegen dot-product landed).
  */
object Q67Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val H = Dedup.ParityHasher

    def time(name: String)(f: => Long): Unit = {
      val runs = (0 until 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[q67probe] $name%-28s ${runs.map(_._1).min}%6.2fs rows=${runs.head._2}")
    }

    time("shingleStream") { Dedup.shingleStream(docs, "doc_id", "text", 3).count() }
    time("shingles(distinct)") { Dedup.shingles(docs, "doc_id", "text", 3).count() }
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    time("signatures") {
      Dedup.minhashSignatures(Dedup.shingleStream(docs, "doc_id", "text", 3), "doc_id", 8, H).count()
    }
    val sigs = Dedup.minhashSignatures(Dedup.shingleStream(docs, "doc_id", "text", 3), "doc_id", 8, H)
    time("bands") { Dedup.lshBands(sigs, "doc_id", 8, 4, H).count() }
    val bands = Dedup.lshBands(sigs, "doc_id", 8, 4, H)
    time("candidatePairs") { Dedup.candidatePairs(bands, "doc_id").count() }
    val cands = Dedup.candidatePairs(bands, "doc_id")
    time("jaccardVerify") { Dedup.jaccardVerify(cands, sh, "doc_id", 0.9).count() }
    time("FULL nearDupPairs") {
      Dedup.nearDupPairs(docs, "doc_id", "text", 3, 8, 4, 0.9, H).count()
    }
    time("FULL persist=true") {
      Dedup.nearDupPairs(docs, "doc_id", "text", 3, 8, 4, 0.9, H,
        persistIntermediates = true).count()
    }
    spark.stop()
  }
}
