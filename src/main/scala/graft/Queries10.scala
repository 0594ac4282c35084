package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.SpanDedup

/** Oracle corpus, batch 10 (round 7): exact substring deduplication
  * (Lee et al. 2022) — q117 the detected duplicated spans, q118 the
  * applied strip verified down to the md5 of every cleaned document.
  * Same contract as batches 3-9: the Spark side runs the library
  * operator, the DuckDB oracle recomputes the answer from first
  * principles (window hashes, duplicate set, island merge, segment
  * reconstruction) over the same parquet, equality IS the claim.
  */
object Queries10 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.tbl(s, dir, name)

  /** Window length: the dedup threshold in chars. 40 chars ≈ the
    * spirit of the paper's 50-token threshold at verification scale —
    * long enough that shared spans are real duplication, short enough
    * that the synthetic corpus contains them.
    */
  private val SpanL = 40

  // ------------------------ q117: exact-substring duplicated spans
  /** Per-doc merged duplicated spans ([[SpanDedup.duplicateSpans]]).
    * The oracle replays the full algorithm in SQL: every L-char
    * window hashed with the same 60-bit md5, duplicate hashes by
    * count ≥ 2, islands by the identical gap ≤ L rule.
    */
  private def q117(s: SparkSession, dir: String): DataFrame =
    SpanDedup.duplicateSpans(Tables.docsPar(s, dir), "doc_id", "text", SpanL)
      .orderBy($"doc_id", $"span_start")

  /** xxhash64 production twin — rows-only by the q82x/q104x contract
    * (DuckDB cannot reproduce xxhash64); the md5 twin above
    * hash-gates the identical span algorithm.
    */
  private def q117x(s: SparkSession, dir: String): DataFrame =
    SpanDedup.duplicateSpans(Tables.docsPar(s, dir), "doc_id", "text", SpanL,
        xx = true)
      .orderBy($"doc_id", $"span_start")

  private val q117Sql =
    s"""WITH wins AS (
       |  SELECT doc_id, i + 1 AS pos,
       |    CAST(CONCAT('0x', SUBSTR(md5(substr(text, CAST(i + 1 AS INT), $SpanL)), 1, 15)) AS BIGINT) AS h
       |  FROM documents, UNNEST(range(0, len(text) - $SpanL + 1)) AS t(i)
       |), dup AS (
       |  SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2
       |), hit AS (
       |  SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (h)
       |), isl AS (
       |  SELECT doc_id, pos,
       |    SUM(CASE WHEN prev IS NULL OR pos - prev > $SpanL THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM (SELECT doc_id, pos,
       |          LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |        FROM hit)
       |)
       |SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + ${SpanL - 1} AS span_end
       |FROM isl GROUP BY doc_id, island
       |ORDER BY doc_id, span_start""".stripMargin

  // ------------------------------ q118: strip applied, md5-verified
  /** The apply half ([[SpanDedup.stripDuplicateSpans]]): every doc's
    * original/clean char lengths, chars removed, and the md5 of the
    * CLEANED TEXT — the oracle reconstructs each cleaned document by
    * string-aggregating the kept segments between spans, so the
    * byte-exact rewrite is what the hash gate compares.
    */
  private def q118(s: SparkSession, dir: String): DataFrame =
    SpanDedup.stripDuplicateSpans(Tables.docsPar(s, dir), "doc_id", "text", SpanL)
      .select($"doc_id",
        length($"text").cast("long").as("orig_len"),
        length($"text_clean").cast("long").as("clean_len"),
        (length($"text") - length($"text_clean")).cast("long").as("removed"),
        md5($"text_clean".cast("binary")).as("clean_md5"))
      .orderBy($"doc_id")

  private val q118Sql =
    s"""WITH wins AS (
       |  SELECT doc_id, i + 1 AS pos,
       |    CAST(CONCAT('0x', SUBSTR(md5(substr(text, CAST(i + 1 AS INT), $SpanL)), 1, 15)) AS BIGINT) AS h
       |  FROM documents, UNNEST(range(0, len(text) - $SpanL + 1)) AS t(i)
       |), dup AS (
       |  SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2
       |), hit AS (
       |  SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (h)
       |), isl AS (
       |  SELECT doc_id, pos,
       |    SUM(CASE WHEN prev IS NULL OR pos - prev > $SpanL THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM (SELECT doc_id, pos,
       |          LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |        FROM hit)
       |), spans AS (
       |  SELECT doc_id, MIN(pos) AS ss, MAX(pos) + ${SpanL - 1} AS se
       |  FROM isl GROUP BY doc_id, island
       |), segs AS (
       |  SELECT doc_id,
       |    COALESCE(LAG(se) OVER (PARTITION BY doc_id ORDER BY ss), 0) + 1 AS ks,
       |    ss - 1 AS ke
       |  FROM spans
       |  UNION ALL
       |  SELECT doc_id, MAX(se) + 1 AS ks, NULL AS ke FROM spans GROUP BY doc_id
       |), recon AS (
       |  SELECT d.doc_id,
       |    STRING_AGG(substr(d.text, CAST(s.ks AS INT),
       |        CAST(COALESCE(s.ke, len(d.text)) - s.ks + 1 AS INT)),
       |      '' ORDER BY s.ks) AS ct
       |  FROM documents d JOIN segs s ON s.doc_id = d.doc_id
       |  WHERE COALESCE(s.ke, len(d.text)) >= s.ks
       |  GROUP BY d.doc_id
       |), spanned AS (
       |  SELECT DISTINCT doc_id FROM spans
       |)
       |SELECT d.doc_id, len(d.text) AS orig_len,
       |  CASE WHEN sp.doc_id IS NULL THEN len(d.text)
       |       ELSE COALESCE(len(r.ct), 0) END AS clean_len,
       |  len(d.text) - CASE WHEN sp.doc_id IS NULL THEN len(d.text)
       |                     ELSE COALESCE(len(r.ct), 0) END AS removed,
       |  CASE WHEN sp.doc_id IS NULL THEN md5(d.text)
       |       ELSE md5(COALESCE(r.ct, '')) END AS clean_md5
       |FROM documents d
       |LEFT JOIN spanned sp ON sp.doc_id = d.doc_id
       |LEFT JOIN recon r ON r.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q117_dup_spans" -> (q117 _),
    "q117x_dup_spans_xx" -> (q117x _),
    "q118_strip_spans" -> (q118 _))

  val oracles: Map[String, String] = Map(
    "q117_dup_spans" -> q117Sql,
    // q117x: xxhash64 production twin — rows-only (no DuckDB xxhash64)
    "q118_strip_spans" -> q118Sql)

  // $"..." interpolator without a SparkSession-bound implicits import
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
