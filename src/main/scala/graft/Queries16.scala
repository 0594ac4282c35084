package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle corpus, batch 16 (round 12): PDF text extraction.
  *
  * q151 closes the synthesize-your-own-fixture loop for PDFs (the
  * q132 WARC / q148 Vorbis pattern, VERDICT r11 item 1): the engine
  * WRITES a crawl corpus whose payloads are [[graft.ext.PdfFixtures]]
  * documents — classic xref / Flate+TJ / xref-stream+ObjStm+CMap /
  * Contents-array+quote-ops variants — plus decoy HTML responses,
  * ships it through the real WARC container (gzip members, wire
  * variants), reads it back, and runs the full extraction chain in
  * ONE plan: readWarc → response filter → `pdf_text` → text_profile.
  * DuckDB predicts every surviving row's page count, object count,
  * title, extracted text, and profile from `documents` alone, so a
  * defect in the container, the xref walk (either kind), inflate,
  * the predictor, ObjStm, the content interpreter, an encoding
  * table, a CMap, or the profile kernel breaks the hash.
  */
object Queries16 {

  // bounded corpus (the media-gate convention, q146/q150): this entry
  // gates EXTRACTION semantics; WARC-at-scale throughput is
  // q133/q136/q144's ledger. The bound is mirrored in the oracle.
  private val Q151Dir = "/tmp/graft_fixtures/q151_warc"

  private def q151(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.{graftbridge => gb}
    val d = col("doc_id")
    val id = d.cast("string")
    val isHtml = d % 10 === 9 // decoys the response filter must drop
    val payload = when(isHtml,
        encode(concat(lit("<html><body>skip "), id, lit("</body></html>")), "UTF-8"))
      .otherwise(gb.column(graft.fn.PdfSynth(gb.expression(d.cast("long")))))
    val ctype = when(isHtml, lit("text/html")).otherwise(lit("application/pdf"))
    val rows = Tables.tbl(s, dir, "documents").select(d)
      .where(d < 2000)
      .select(
        concat(lit("https://pdf.test/doc/"), id),
        lit("2026-08-15T00:00:00Z"),
        ctype,
        payload)
      .as[(String, String, String, Array[Byte])]
    val hp = new org.apache.hadoop.fs.Path(Q151Dir)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(hp, true)
    val nSeg = math.max(8, s.sparkContext.defaultParallelism)
    graft.io.Warc.writeWarcGz(rows.repartition(nSeg), Q151Dir, wireVariants = true)

    val extracted = graft.io.Warc.responses(graft.io.Warc.readWarc(s, Q151Dir))
      .where(col("http_status") === 200 &&
             col("http_content_type") === "application/pdf")
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
        explode(array(gb.column(graft.fn.PdfTextStats(
          gb.expression(col("payload")))))).as("__p"))
      .filter(col("__p").isNotNull)
      .select(col("doc_id"),
        col("__p.n_pages").as("n_pages"),
        col("__p.n_objects").as("n_objects"),
        col("__p.title").as("title"),
        col("__p.text").as("text_out"),
        col("__p.n_chars").as("n_chars"))
    val p = gb.column(graft.fn.TextProfile(gb.expression(col("text_out"))))
    extracted.select(col("doc_id"), col("n_pages"), col("n_objects"),
        col("title"), col("text_out"), col("n_chars"),
        explode(array(p)).as("__t"))
      .filter(col("__t").isNotNull)
      .select(col("doc_id"), col("n_pages"), col("n_objects"), col("title"),
        col("text_out"), col("n_chars"),
        col("__t.n_tokens").as("n_tokens"),
        col("__t.lang_id").as("lang_id"),
        round(col("__t.quality"), 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  private val q151Sql =
    s"""WITH ext AS (
       |  SELECT doc_id,
       |    CASE CAST(doc_id % 4 AS INT)
       |      WHEN 0 THEN 'Doc ' || doc_id || ' page 0' || chr(10) ||
       |        'café €' || (doc_id % 7) ||
       |        CASE WHEN (doc_id // 4) % 2 = 1
       |          THEN chr(10) || 'Doc ' || doc_id || ' page 1' || chr(10) ||
       |            'café €' || (doc_id % 7)
       |          ELSE '' END
       |      WHEN 1 THEN 'Doc ' || doc_id || ' (A)' || chr(10) ||
       |        'kerned text ' || (doc_id % 5)
       |      WHEN 2 THEN '中文 ' || chr(65296 + CAST(doc_id % 10 AS INT))
       |      ELSE 'Part ' || (doc_id % 6) || chr(10) || 'alpha' || chr(10) ||
       |        'beta ' || (doc_id % 4) || chr(10) || 'gamma ' || (doc_id % 3)
       |    END AS text_out,
       |    CAST(CASE WHEN doc_id % 4 = 0
       |      THEN 1 + (doc_id // 4) % 2 ELSE 1 END AS INT) AS n_pages,
       |    CAST(CASE CAST(doc_id % 4 AS INT)
       |      WHEN 0 THEN 5 + 2 * ((doc_id // 4) % 2)
       |      WHEN 1 THEN 5
       |      WHEN 2 THEN 8
       |      ELSE 7 END AS INT) AS n_objects,
       |    CASE WHEN doc_id % 4 = 3 THEN 'Graft Doc ' || doc_id
       |         ELSE '' END AS title
       |  FROM documents
       |  WHERE doc_id < 2000 AND doc_id % 10 <> 9
       |),
       |${TextProfileSql.ctes("ext", "doc_id", "text_out")},
       |prof AS (
       |${TextProfileSql.select("doc_id")}
       |)
       |SELECT e.doc_id, e.n_pages, e.n_objects, e.title, e.text_out,
       |  CAST(length(e.text_out) AS INT) AS n_chars,
       |  p.n_tokens, p.lang_id, p.quality
       |FROM ext e JOIN prof p USING (doc_id)
       |ORDER BY e.doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q151_pdf_text" -> (q151 _))

  val oracles: Map[String, String] = Map(
    "q151_pdf_text" -> q151Sql)
}
