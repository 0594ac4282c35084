package graft.tools
import org.apache.spark.sql.SparkSession
object Q104xProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet("/tmp/sf10/documents.parquet").count()
    for (name <- Seq("q104_winnow_fps", "q104x_winnow_fps_xx");
         dir <- Seq("/tmp/sf1", "/tmp/sf10")) {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q104x] $name%-22s $dir%-10s min=${ts.min}%5.2f runs=${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
