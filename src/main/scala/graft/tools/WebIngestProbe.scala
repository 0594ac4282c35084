package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 (second half) measurement probe — the web-ingestion
  * additions:
  *  - q131 (html_text) and q132 (WARC round-trip) at sf0.1 and sf10;
  *  - raw `html_text` kernel throughput over sf10 documents (docs/s,
  *    input MB/s), the number a 100 TB crawl-extract scan divides by;
  *  - WARC sink write + source read rates at sf10 (records/s);
  *  - from-spec zstd decode throughput vs zstd-jni (the native
  *    reference) on a documents-derived corpus at levels 3 and 19 —
  *    the honest cost of JVM-only portability for chunk decode.
  * `sbt "runMain graft.tools.WebIngestProbe [sf01] [sf10]"`.
  */
object WebIngestProbe {
  def main(args: Array[String]): Unit = {
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sf10 = if (args.length > 1) args(1) else "/tmp/sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String, dir: String, reps: Int = 3): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        noop(graft.SparkEntry.queries(name)(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }.min

    Seq(sf01, sf10).foreach(d => spark.read.parquet(s"$d/documents.parquet").count())

    println(f"q131_html_extract  sf0.1: ${timed("q131_html_extract", sf01)}%.3f s")
    println(f"q132_warc_roundtrip sf0.1: ${timed("q132_warc_roundtrip", sf01)}%.3f s")
    println(f"q131_html_extract  sf10 : ${timed("q131_html_extract", sf10)}%.3f s")
    println(f"q132_warc_roundtrip sf10: ${timed("q132_warc_roundtrip", sf10)}%.3f s")

    // ---- raw html_text kernel throughput over sf10
    val docs = spark.read.parquet(s"$sf10/documents.parquet")
    val nDocs = docs.count()
    val inBytes = docs.agg(sum(length($"text"))).head.getLong(0)
    import org.apache.spark.sql.{graftbridge => gb}
    val page = concat(lit("<html><head><style>a{b:c}</style><script>var x=1<2;</script>" +
      "</head><body><!-- c --><p>"),
      expr("replace(replace(replace(text,'&','&amp;'),'<','&lt;'),'>','&gt;')"),
      lit("</p></body></html>"))
    val ext = docs.select(gb.column(graft.fn.HtmlText(gb.expression(page))).as("t"))
    val tHtml = (1 to 4).map { _ =>
      val t0 = System.nanoTime(); noop(ext); (System.nanoTime() - t0) / 1e9
    }.min
    println(f"html_text kernel sf10: $tHtml%.3f s = ${nDocs / tHtml}%.0f docs/s, " +
      f"${inBytes / tHtml / 1e6}%.1f MB/s of document text")

    // ---- WARC sink + source rates at sf10
    val warcDir = "/tmp/graft_probe_warc"
    val rows = docs.select(
        concat(lit("https://ex.test/doc/"), $"doc_id".cast("string")),
        lit("2026-08-14T00:00:00Z"), lit("text/html; charset=utf-8"),
        encode($"text", "UTF-8"))
      .as[(String, String, String, Array[Byte])]
    val hp = new org.apache.hadoop.fs.Path(warcDir)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tWrite = (1 to 2).map { _ =>
      fs.delete(hp, true)
      val t0 = System.nanoTime()
      graft.io.Warc.writeWarcGz(rows.repartition(32), warcDir, wireVariants = true)
      (System.nanoTime() - t0) / 1e9
    }.min
    val tRead = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      noop(graft.io.Warc.readWarc(spark, warcDir))
      (System.nanoTime() - t0) / 1e9
    }.min
    val warcBytes = fs.getContentSummary(hp).getLength
    println(f"WARC sink  sf10: $tWrite%.3f s = ${nDocs / tWrite}%.0f rec/s (${warcBytes / 1e6}%.1f MB on disk)")
    println(f"WARC source sf10: $tRead%.3f s = ${nDocs / tRead}%.0f rec/s, ${warcBytes / tRead / 1e6}%.1f MB/s compressed")
    fs.delete(hp, true)

    // ---- zstd decode: from-spec vs zstd-jni, single-thread
    val corpus = {
      val texts = docs.limit(60000).select($"text").as[String].collect()
      val sb = new StringBuilder
      texts.foreach(sb.append)
      sb.toString.getBytes("UTF-8")
    }
    println(f"zstd corpus: ${corpus.length / 1e6}%.1f MB")
    for (level <- Seq(3, 19)) {
      val comp = com.github.luben.zstd.Zstd.compress(corpus, level)
      def bench(f: () => Array[Byte]): Double =
        (1 to 5).map { _ =>
          val t0 = System.nanoTime(); val r = f()
          require(r.length == corpus.length); (System.nanoTime() - t0) / 1e9
        }.min
      val tSpec = bench(() => graft.io.Zstd.decompressSpec(comp))
      val tJni = bench(() => com.github.luben.zstd.Zstd.decompress(comp, corpus.length))
      println(f"zstd L$level: ratio ${corpus.length.toDouble / comp.length}%.2f; " +
        f"from-spec ${corpus.length / tSpec / 1e6}%.0f MB/s, " +
        f"zstd-jni ${corpus.length / tJni / 1e6}%.0f MB/s (${tSpec / tJni}%.1fx slower, single-thread)")
    }
    spark.stop()
  }
}
