package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle corpus, batch 13 (round 9): web-corpus ingestion — the
  * front door of a crawl-derived training pipeline. q131 gates the
  * [[graft.fn.HtmlKernels]] visible-text extraction hash-exact (the
  * oracle replays the documented regex-pass pipeline step for step in
  * SQL); q132 gates the full [[graft.io.Warc]] path — per-record-gzip
  * WARC framing, HTTP/1.1 head parse, chunked de-framing,
  * gzip/deflate payload decoding — by writing a WARC corpus with the
  * engine's own sink (wire-variant encodings cycling per record),
  * reading it back, extracting, and letting the oracle PREDICT the
  * result from the source table alone: any framing or decode bug
  * breaks the hash.
  *
  * Both queries synthesize the page deterministically from
  * `documents` with a template defined ONCE here and interpolated
  * into both engines, entity-escaping the document text so the
  * extraction must round-trip it exactly.
  */
object Queries13 extends ColumnSyntax {

  import org.apache.spark.sql.{graftbridge => gb}

  private def htmlTextCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    gb.column(graft.fn.HtmlText(gb.expression(c)))

  // ------------------------------------------- shared HTML template
  private val H1 = "<!DOCTYPE html><html lang=\""
  private val H2 = "\"><head><title>Doc "
  private val H3 = "</title><style type=\"text/css\">body{color:#222}\n" +
    ".nav{display:none}</style><script type=\"text/javascript\">var t=1<2&&\"x\";\n" +
    "if(t){t=0}</script></head><body><!-- source: "
  private val H4 = "\n --><div class=\"nav\"><a href=\"/home\">Home</a>" +
    "&nbsp;|&nbsp;<a href=\"/about?id="
  private val H5 = "\">About</a></div><p>"
  private val H6 = "</p><p>&amp;copy; 2026 &quot;Graft&quot; &#39;q&#39; &copy;</p></body></html>"

  /** DuckDB expression for a Scala string constant: quotes doubled,
    * newlines as `chr(10)` (standard strings do not process escapes).
    */
  private def sqlStr(s: String): String =
    s.split("\n", -1).map(p => "'" + p.replace("'", "''") + "'")
      .mkString(" || chr(10) || ")

  /** doc_id, lang, source, html — the synthesized page. */
  private def synthHtml(s: SparkSession, dir: String): DataFrame = {
    val esc = expr(
      "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')")
    Tables.docsPar(s, dir).select($"doc_id", $"lang", $"source",
      concat(lit(H1), $"lang", lit(H2), $"doc_id".cast("string"), lit(H3),
        $"source", lit(H4), $"doc_id".cast("string"), lit(H5), esc,
        lit(H6)).as("html"))
  }

  private val synthSql =
    s"""synth AS (
       |  SELECT doc_id, ${sqlStr(H1)} || lang || ${sqlStr(H2)} || doc_id ||
       |    ${sqlStr(H3)} || source || ${sqlStr(H4)} || doc_id ||
       |    ${sqlStr(H5)} ||
       |    replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
       |    ${sqlStr(H6)} AS html
       |  FROM documents
       |)""".stripMargin

  /** The [[graft.fn.HtmlKernels]] pass pipeline, replayed in SQL
    * step for step (see that object's scaladoc for the contract).
    */
  private val extractSql =
    """ext AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(
      |      replace(replace(replace(replace(replace(replace(
      |        regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
      |          '<script[^>]*>.*?</script>', ' ', 'gis'),
      |          '<style[^>]*>.*?</style>', ' ', 'gis'),
      |          '<!--.*?-->', ' ', 'gs'),
      |          '<[^>]*>', ' ', 'g'),
      |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
      |        '&nbsp;', ' '), '&amp;', '&'),
      |      '[ \t\n\f\r]+', ' ', 'g')) AS text_out
      |  FROM synth
      |)""".stripMargin

  // --------------------------- q131: html_text kernel, hash-gated
  private def q131(s: SparkSession, dir: String): DataFrame =
    synthHtml(s, dir)
      .select($"doc_id", htmlTextCol($"html").as("text_out"))
      .withColumn("n_out", length($"text_out").cast("long"))
      .orderBy($"doc_id")

  private val q131Sql =
    s"""WITH $synthSql, $extractSql
       |SELECT doc_id, text_out, CAST(length(text_out) AS BIGINT) AS n_out
       |FROM ext ORDER BY doc_id""".stripMargin

  // ------------------- q132: WARC write → read → extract, hash-gated
  private val Q132Dir = "/tmp/graft_fixtures/q132_warc"

  private def q132(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = synthHtml(s, dir).select(
        concat(lit("https://ex.test/doc/"), col("doc_id").cast("string")),
        lit("2026-08-14T00:00:00Z"),
        lit("text/html; charset=utf-8"),
        encode(col("html"), "UTF-8"))
      .as[(String, String, String, Array[Byte])]
    val hp = new org.apache.hadoop.fs.Path(Q132Dir)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(hp, true) // stale segments from a prior run/partitioning
    val nSeg = math.max(8, s.sparkContext.defaultParallelism)
    graft.io.Warc.writeWarcGz(rows.repartition(nSeg), Q132Dir, wireVariants = true)
    graft.io.Warc.responses(graft.io.Warc.readWarc(s, Q132Dir))
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
        col("http_status"),
        htmlTextCol(decode(col("payload"), "UTF-8")).as("text_out"))
      .withColumn("n_out", length(col("text_out")).cast("long"))
      .orderBy(col("doc_id"))
  }

  // the oracle never reads the WARC files: it PREDICTS the round-trip
  // from `documents` alone, so the framing/decode path is the gate
  private val q132Sql =
    s"""WITH $synthSql, $extractSql
       |SELECT doc_id, CAST(200 AS INT) AS http_status, text_out,
       |  CAST(length(text_out) AS BIGINT) AS n_out
       |FROM ext ORDER BY doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q131_html_extract" -> (q131 _),
    "q132_warc_roundtrip" -> (q132 _))

  val oracles: Map[String, String] = Map(
    "q131_html_extract" -> q131Sql,
    "q132_warc_roundtrip" -> q132Sql)
}
