package graft.tools

import org.apache.spark.sql.functions._

/** One-off stage decomposition of q132's sf10 cost (BENCH_NOTES). */
object Q132Decomp {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet("/tmp/sf10/documents.parquet")
    docs.count()
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val esc = expr("replace(replace(replace(text,'&','&amp;'),'<','&lt;'),'>','&gt;')")
    val html = concat(lit("<html><p>"), esc, lit("</p></html>"))
    val rows = docs.select(
        concat(lit("https://ex.test/doc/"), col("doc_id").cast("string")),
        lit("2026-08-14T00:00:00Z"), lit("text/html"), encode(html, "UTF-8"))
      .as[(String, String, String, Array[Byte])]
    val dir = "/tmp/q132_decomp"
    val hp = new org.apache.hadoop.fs.Path(dir)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(hp, true)
    t("write (wire variants)") {
      graft.io.Warc.writeWarcGz(rows.repartition(32), dir, wireVariants = true)
    }
    t("read only") {
      graft.io.Warc.readWarc(spark, dir).write.format("noop").mode("overwrite").save()
    }
    import org.apache.spark.sql.{graftbridge => gb}
    t("read + html_text + orderBy") {
      graft.io.Warc.responses(graft.io.Warc.readWarc(spark, dir))
        .select(regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
          gb.column(graft.fn.HtmlText(gb.expression(decode(col("payload"), "UTF-8")))).as("t"))
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    fs.delete(hp, true)
    spark.stop()
  }
}
