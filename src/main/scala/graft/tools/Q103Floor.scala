package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q103Floor {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter($"vec_id" < 4000)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    emb.count()
    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); val n = f
        (System.nanoTime() - t0) / 1e9 }
      println(f"[floor] $name%-24s min=${ts.min}%5.2f s")
    }
    time("1-job scan count")(emb.count())
    time("seedCentroids collect")({
      graft.ext.SimJoin.seedCentroids(emb, "vec_id", "v", 16).size.toLong })
    val seeds = graft.ext.SimJoin.seedCentroids(emb, "vec_id", "v", 16)
    time("pairs w/o seed job")(
      graft.ext.SimJoin.semanticDedupPairs(emb, "vec_id", "v", seeds, 0.35,
        maxCluster = 0).count())
    spark.stop()
  }
}
