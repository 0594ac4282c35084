package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dev probe: where q80 (near-dup pairs → connected components)
  * spends its time at sf0.1.
  */
object CcProbe {
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

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", 3, 8, 4, 0.9, H)
      .select(col("a_id"), col("b_id"))
    time("pairs count") { pairs.count() }
    for (it <- 1 to 3) {
      time(s"CC live maxIters=$it") {
        Dedup.connectedMinLabels(
          Dedup.nearDupPairs(docs, "doc_id", "text", 3, 8, 4, 0.9, H)
            .select(col("a_id"), col("b_id")), maxIters = it).count()
      }
    }
    time("CC live localCheckpoint") {
      Dedup.connectedMinLabels(
        Dedup.nearDupPairs(docs, "doc_id", "text", 3, 8, 4, 0.9, H)
          .select(col("a_id"), col("b_id")).localCheckpoint()).count()
    }
    val frozen = spark.createDataFrame(
      pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
      .toDF("a_id", "b_id")
    time("CC on frozen pairs") { Dedup.connectedMinLabels(frozen).count() }
    spark.stop()
  }
}
