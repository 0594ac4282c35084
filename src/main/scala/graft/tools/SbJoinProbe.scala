package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the trigram Stupid Backoff JOIN form (the past-the-
  * broadcast-guard 100 TB serving path): kernel vs forced join on the
  * q119 shape at sf1, min-of-N interleaved.
  * `sbt "runMain graft.tools.SbJoinProbe [sf1Dir] [N]"`.
  */
object SbJoinProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/sf1")
    val n = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    import graft.ext.LangModel

    val docs = spark.read.parquet(s"$sf1/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.count() // warm page cache
    val slice = docs.filter(col("doc_id") < 300)

    def run(maxBroadcast: Long): Double = {
      val t0 = System.nanoTime()
      LangModel.scoreStupidBackoff(slice, "doc_id", "text",
        LangModel.unigramCounts(docs, "text"),
        LangModel.bigramCounts(docs, "text"),
        LangModel.trigramCounts(docs, "text"),
        maxBroadcast = maxBroadcast).count()
      (System.nanoTime() - t0) / 1e9
    }

    val times = collection.mutable.Map[String, List[Double]]()
    for (_ <- 1 to n; (name, mb) <- Seq("kernel" -> 8000000L, "join" -> 1L)) {
      val t = run(mb)
      times(name) = t :: times.getOrElse(name, Nil)
    }
    for (name <- Seq("kernel", "join"))
      println(f"[sb-probe] $name%-8s ${times(name).min}%6.2f s (min of $n, $sf1, q119 shape)")
    spark.stop()
  }
}
