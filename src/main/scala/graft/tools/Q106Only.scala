package graft.tools
import org.apache.spark.sql.SparkSession
object Q106Only {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val xx = args(1).toBoolean
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.ext.Dedup.winnowSharedPairs(docs, "doc_id", "text", 5, 4,
        minShared = 2, xx = xx).count()
      println(f"[q106only] xx=$xx run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$n")
    }
    spark.stop()
  }
}
