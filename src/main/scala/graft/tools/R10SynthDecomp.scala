package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q137/q138 sf10 decomposition: how much of the wall is corpus
  * SYNTHESIS (in-plan fixture packing — work the DuckDB oracle never
  * does, the q132 asymmetry) vs the graded WALK. Times, per N rows:
  * synth-only (sum of lengths), synth+walk (the graded shape minus
  * the presentation sort). min-of-3 each, interleaved.
  */
object R10SynthDecomp {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.install(spark)
    def timed(label: String)(f: => Unit): Unit = {
      f // warm
      val t = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[decomp] $label%-24s $t%6.2f s  (${t / n * 1e6}%5.2f µs/row)")
    }
    val base = spark.range(n).repartition(32)
    timed("mp3 synth only") {
      base.selectExpr("length(mp3_synth(id)) AS l").agg(sum("l")).head
    }
    timed("mp3 synth+walk") {
      base.selectExpr("mp3_side_stats(mp3_synth(id)) AS m")
        .selectExpr("m.gain_sum AS g").agg(sum("g")).head
    }
    timed("ogg synth only") {
      base.selectExpr("length(ogg_synth(id)) AS l").agg(sum("l")).head
    }
    timed("ogg synth+walk") {
      base.selectExpr("ogg_stream_meta(ogg_synth(id)) AS m")
        .selectExpr("m.audio_bytes AS a").agg(sum("a")).head
    }
    spark.stop()
  }
}
