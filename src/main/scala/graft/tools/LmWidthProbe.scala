package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: q102 wall vs the docs-repartition width at sf1/sf10
  * (round-7 constant hunt — is 32-way spread paying more scheduling
  * than it buys in kernel parallelism at bench scale?).
  */
object LmWidthProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for (dir <- Seq("/tmp/sf1", "/tmp/sf10"); w <- Seq(8, 16, 32)) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      docs.count()
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val slice = docs.filter($"doc_id" < 300)
        graft.ext.LangModel.scoreNll(slice, "doc_id", "text",
            graft.ext.LangModel.unigramCounts(docs.repartition(w), "text"),
            alpha = 1.0)
          .select($"doc_id", $"n_toks",
            round($"avg_nll", 6).as("avg_nll"), round($"ppl", 4).as("ppl"))
          .orderBy($"doc_id").count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[lm-width] $dir%-10s width=$w%-3d $t%6.2f s")
    }
    spark.stop()
  }
}
