package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Isolates the cost of a query's FINAL presentation orderBy under
  * the bench's `.count()` action, and of the registry/bench wrapper
  * around the raw pipeline — explains bench-vs-probe deltas for the
  * near-dup family.
  */
object OrderByProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String, reps: Int = 3)(f: => Long): Unit = {
      f
      val runs = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e6, n)
      }
      println(f"[obp] $label%-44s min=${runs.map(_._1).min}%8.1f ms  rows=${runs.head._2}")
    }
    // the bench path: SparkEntry registry query (orderBy + round)
    val q67 = graft.SparkEntry.queries("q67_neardup_pairs")
    time("SparkEntry q67 .count")(q67(spark, dir).count())
    // identical pipeline without the final orderBy/round
    val docs = graft.Tables.tbl(spark, dir, "documents").repartition(32)
    val raw = Dedup.nearDupPairs(docs, "doc_id", "text",
      n = 3, k = 8, b = 4, minJaccard = 0.9, hasher = Dedup.ParityHasher)
    time("raw nearDupPairs .count")(raw.count())
    time("raw + orderBy .count")(
      raw.select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("a_id"), col("b_id")).count())
    // a small plain query with/without orderBy for the general effect
    val li = graft.Tables.tbl(spark, dir, "lineitem")
    val agg = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("s"))
    time("lineitem agg .count")(agg.count())
    time("lineitem agg orderBy .count")(agg.orderBy(col("l_returnflag"), col("l_linestatus")).count())
    spark.stop()
  }
}
