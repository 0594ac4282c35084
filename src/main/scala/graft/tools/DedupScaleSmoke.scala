package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup
/** Dev probe: the near-dup pipeline at 20x the sf0.1 corpus (100k
  * synthetic docs, ~5% planted near-dups), production xxhash64 path —
  * the scale-up check for the headline LLM operator.
  */
object DedupScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    // deterministic synthetic corpus: ~40-token docs over a 1k vocab;
    // every 20th doc is a near-dup of its predecessor (one token changed)
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map(j =>
        concat(lit("w"), pmod(xxhash64(
          // near-dup pairs share the base id for all but one position
          when(col("id") % 20 === 1 && lit(j) =!= 7, col("id") - 1)
            .otherwise(when(col("id") % 20 === 1, col("id") * 1000).otherwise(col("id"))),
          lit(j)), lit(1000)))): _*).as("text"))
      .persist()
    println(s"[dscale] docs=" + docs.count())
    val t0 = System.nanoTime()
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text",
      n = 3, k = 16, b = 8, minJaccard = 0.8).count()
    println(f"[dscale] nearDupPairs=$pairs time=${(System.nanoTime()-t0)/1e9}%.2f s")
    val t1 = System.nanoTime()
    val kept = Dedup.dropNearDuplicatesConnected(docs, "doc_id", "text",
      n = 3, k = 16, b = 8, minJaccard = 0.8).count()
    println(f"[dscale] keptAfterCC=$kept time=${(System.nanoTime()-t1)/1e9}%.2f s")
    spark.stop()
  }
}
