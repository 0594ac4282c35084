package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: aggregate text profile (explode + groupBy — shuffles
  * the whole token stream) vs the narrow `text_profile` kernel (one
  * codegen call per row, no shuffle) on a 1M-doc synthetic corpus.
  * Verifies identical results and measures the shuffle tax the kernel
  * removes.
  */
object TextScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.TextOps

    // ~40-token docs with per-doc variation (id-derived words mixed
    // into a fixed English base, so stop/alpha ratios vary by row)
    val words = Seq("the", "cat", "and", "dog", "ran", "to", "a", "house",
      "it", "was", "warm", "in", "sun", "today", "river", "quiet")
    val base = (0 until 2).flatMap(_ => words).mkString(" ")
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
        concat_ws(" ", lit(base),
          concat(lit("w"), pmod(col("id"), lit(997))),
          concat(lit("x"), pmod(col("id") * 31, lit(1009))),
          when(pmod(col("id"), lit(7)) === 0, lit("!!! ### 123")).otherwise(lit("fine"))
        ).as("text"))
      .persist()
    println(s"[textsmoke] docs=${docs.count()}")

    def time(name: String)(f: => Long): Double = {
      val runs = (0 until 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = runs.map(_._1).min
      println(f"[textsmoke] $name%-22s $best%6.2fs rows=${runs.head._2}")
      best
    }

    val tAgg = time("profile (explode+agg)")(
      TextOps.profile(docs, "doc_id", "text").count())
    val tNar = time("profileNarrow (kernel)")(
      TextOps.profileNarrow(docs, "doc_id", "text").count())
    println(f"[textsmoke] kernel speedup: ${tAgg / tNar}%.1fx")

    // exactness on a sample (full corpus equality is the unit spec's
    // job at small n; here spot-check 10k rows bit-for-bit)
    val sample = docs.filter(col("doc_id") < 10000)
    val a = TextOps.profile(sample, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
    val b = TextOps.profileNarrow(sample, "doc_id", "text")
      .select(a.head.schema.fieldNames.map(col): _*)
      .orderBy(col("doc_id")).collect()
    require(a.sameElements(b), "kernel/aggregate mismatch")
    println(s"[textsmoke] 10k-row bit-exact parity: OK")
    spark.stop()
  }
}
