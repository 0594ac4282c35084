package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Unbounded pdf_text scaling evidence (the q146/q148 convention:
  * the graded q151 gate is corpus-BOUNDED, so the kernel's unbounded
  * shape is verified separately): synth→extract over geometrically
  * growing row counts; sub-linear-or-linear wall growth and zero
  * shuffle are the pass criteria.
  */
object PdfScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.install(spark)
    def run(n: Long): Long = spark.range(n)
      .repartition(32)
      .selectExpr("pdf_text(pdf_synth(id)) AS p")
      .selectExpr("p.n_chars AS nc")
      .agg(sum("nc")).head.getLong(0)
    run(10000L) // codegen/JIT warm
    Seq(10000L, 100000L, 1000000L).foreach { n =>
      var sum = 0L
      val times = (0 until 2).map { _ =>
        val t0 = System.nanoTime(); sum = run(n); (System.nanoTime() - t0) / 1e9
      }
      // independent closed-form check so "fast" can never mean "skipped"
      val expect = (0L until n).map { i =>
        val t = graft.ext.PdfFixtures.expectedText(i)
        t.codePointCount(0, t.length).toLong
      }.sum
      println(f"[pdfscale] n=$n%8d wall min ${times.min}%6.2f s " +
        f"(${n / times.min / 1000}%.0fk docs/s) sum=$sum " +
        (if (sum == expect) "OK" else s"MISMATCH expect=$expect"))
    }
    spark.stop()
  }
}
