package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Sketches

/** Dev probe: heavy hitters at cardinalities where bounded state
  * matters — topk_freq vs the exhaustive groupBy(item).count +
  * window-rank plan, on a skewed stream of G groups × D distinct
  * items (D ≫ capacity). The sketch's shuffle carries ≤
  * G × capacity × mapTasks counters; the exhaustive plan shuffles all
  * G × D surviving pairs and sorts every group. Checks: every planted
  * heavy item (freq ≫ N/capacity) is present-and-top-ranked, and the
  * reported counts bracket truth within err.
  */
object SketchScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = if (args.isEmpty) 20000000L else args(0).toLong
    val groups = 100
    val heavyShare = 8L // 1 row in 8 is one of the 3 planted heavies

    // hash-decorrelated: group and heavy-pick from independent hashes
    // (modular arithmetic on the same id would correlate them); 3/8 of
    // rows hit heavy_{0,1,2}, the rest spread over ~500k tail items
    // (D >> capacity=256)
    val heavyPick = pmod(xxhash64($"id", lit("h")), lit(heavyShare))
    val df = spark.range(n).select(
      pmod(xxhash64($"id", lit("g")), lit(groups)).cast("string").as("grp"),
      when(heavyPick < 3, concat(lit("heavy_"), heavyPick))
        .otherwise(concat(lit("tail_"), pmod(xxhash64($"id"), lit(500000L))))
        .as("item"))

    df.count() // materialize-range warm-up

    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val sketch = time(s"sketch topk_freq  (n=$n, G=$groups, cap=256)") {
      Sketches.heavyHitters(df, Seq("grp"), $"item", capacity = 256, k = 3)
        .collect()
    }
    val exhaustive = time(s"exhaustive count+rank (n=$n)") {
      val w = Window.partitionBy($"grp").orderBy($"cnt".desc, $"item")
      df.groupBy($"grp", $"item").agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(w)).where($"rk" <= 3)
        .collect()
    }

    val truth = exhaustive.map(r =>
      (r.getString(0), r.getInt(r.fieldIndex("rk"))) ->
        (r.getString(1), r.getLong(r.fieldIndex("cnt")))).toMap
    var misses = 0
    sketch.foreach { r =>
      val (grp, rk) = (r.getString(0), r.getInt(1))
      val (item, cnt, err) = (r.getString(2), r.getLong(3), r.getLong(4))
      val (tItem, tCnt) = truth((grp, rk))
      if (item != tItem || math.abs(cnt - tCnt) > err) misses += 1
    }
    println(s"rank/item mismatches or out-of-err counts: $misses " +
      s"of ${sketch.length} (heavies are ~${n / heavyShare / groups} each; " +
      s"N/cap=${n / groups / 256} per group)")
    spark.stop()
  }
}
