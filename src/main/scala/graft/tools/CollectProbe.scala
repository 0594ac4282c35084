package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: cost of the model-collect guard forms at sf1 (round-7
  * q102 constant hunt): limit(n).collect vs plain collect vs
  * cache+count+collect.
  */
object CollectProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    def counts = graft.ext.LangModel.unigramCounts(docs.repartition(32), "text")

    def best(label: String)(body: => Int): Unit = {
      var n = 0
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); n = body; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[collect-probe] $label%-28s $t%6.2f s  ($n rows)")
    }

    best("limit(4M+1).collect")(counts.limit(4000001).collect().length)
    best("plain collect")(counts.collect().length)
    best("sortWithinPartitions noop")(counts.collect().length)
    spark.stop()
  }
}
