package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Unbounded multi-ref GOP decode scaling evidence (the PdfScaleSmoke
  * convention: the graded q153 gate is corpus-BOUNDED, so the
  * kernel's unbounded shape is verified separately): synth → full
  * 4-frame DPB decode over geometrically growing row counts; linear
  * wall growth, zero shuffle before the aggregate, and a closed-form
  * sum check so "fast" can never mean "skipped".
  */
object VideoGopScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.install(spark)
    // per id: decode all 4 frames, fold to sum of frame means — one
    // kernel evaluation per row, no explode, no shuffle before agg
    def run(n: Long): Double = spark.range(n)
      .repartition(32)
      .selectExpr(
        "aggregate(h264_gop_frames(mp4_multiref_synth(id), 4, 1, 4), " +
          "CAST(0.0 AS DOUBLE), (acc, fr) -> acc + fr[2]) AS s")
      .agg(sum("s")).head.getDouble(0)
    run(5000L) // codegen/JIT warm
    Seq(10000L, 100000L, 500000L).foreach { n =>
      var got = 0.0
      val times = (0 until 2).map { _ =>
        val t0 = System.nanoTime(); got = run(n); (System.nanoTime() - t0) / 1e9
      }
      // closed form: mean/255 of each frame from the fixture contract
      val expect = (0L until n).map { id =>
        val base = (10 + id % 40).toInt
        val d1 = (1 + id % 5).toInt
        val d2 = (2 + id % 7).toInt
        val d3t = (id % 4).toInt
        val d3b = (1 + id % 3).toInt
        def v(y: Int) = base + 13 * y
        def rowMean(f: Int => Int) = (0 until 16).map(f).sum / 16.0 / 255.0
        rowMean(y => v(y)) +
          rowMean(y => v(math.min(15, y + d1))) +
          rowMean(y => v(math.min(15, y + d2))) +
          rowMean(y => if (y < 8) v(math.min(15, y + d3t))
                       else v(math.min(15, math.min(15, y + d3b) + d1)))
      }.sum
      val ok = math.abs(got - expect) < 1e-6 * math.max(1.0, math.abs(expect))
      println(f"[gopscale] n=$n%8d wall min ${times.min}%6.2f s " +
        f"(${n / times.min / 1000}%.1fk gops/s, ${4 * n / times.min / 1000}%.1fk frames/s) " +
        (if (ok) "OK" else f"MISMATCH got=$got%.6f expect=$expect%.6f"))
    }
    spark.stop()
  }
}
