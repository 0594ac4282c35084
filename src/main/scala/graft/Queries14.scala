package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle corpus, batch 14 (round 10): percent-encoding URL
  * normalization and the WET-style crawl-text extraction shape.
  *
  * q129b plants percent-encoded URL variants (the RFC 3986 §6.2.2.2
  * cases: unreserved `%7E`/`%41`/`%5F` octets that must DECODE,
  * reserved `%2f` that must stay encoded but uppercase, an escaped
  * dot segment `%2E%2E` that must collapse like `..` AFTER decoding,
  * a malformed `%zq` that passes through, and a `utm%5Fsource`
  * tracking param that must be unmasked before the filter) and runs
  * the same [[graft.ext.WebOps.withNormalizedUrls]] kernel as q129;
  * the oracle re-derives the whole normalization generically in SQL
  * with the percent step expressed as a replace chain over the
  * planted escape set, inserted at the kernel's own pipeline position
  * (after the path/query split, before dot collapse and the
  * tracking-param filter).
  */
object Queries14 extends ColumnSyntax {

  // --------------------- q129b: percent-encoding normalization
  private def plantedPctUrlCol(d: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val scheme = element_at(array(lit("http"), lit("HTTPS")), (d % 2 + 1).cast("int"))
    val host = concat(lit("h"), (d % 5).cast("string"), lit(".ex"),
      (d % 17).cast("string"),
      element_at(array(lit(".com"), lit(".co.uk")), (d % 2 + 1).cast("int")))
    val port = element_at(array(lit(":80"), lit(""), lit(":8080")),
      (d % 3 + 1).cast("int"))
    val path = element_at(array(
        concat(lit("/%7Euser/p"), d.cast("string")),
        concat(lit("/a%2fb/"), d.cast("string")),
        concat(lit("/p/%2E%2E/q"), d.cast("string")),
        concat(lit("/x%41y/"), (d % 9).cast("string")),
        concat(lit("/m%zq/"), d.cast("string")),
        concat(lit("/n%5F/./"), d.cast("string"))),
      (d % 6 + 1).cast("int"))
    val query = element_at(array(
        concat(lit("?utm%5Fsource=t&id="), d.cast("string")),
        concat(lit("?u%5Fx="), (d % 7).cast("string"), lit("&ref="), d.cast("string")),
        lit("")),
      (d % 3 + 1).cast("int"))
    val frag = when(d % 4 === 0, lit("#a")).otherwise(lit(""))
    concat(scheme, lit("://"), host, port, path, query, frag)
  }

  private def q129b(s: SparkSession, dir: String): DataFrame =
    graft.ext.WebOps.withNormalizedUrls(
        Tables.docsPar(s, dir).select($"doc_id",
          plantedPctUrlCol($"doc_id").as("url")),
        "url")
      .select($"doc_id", $"url", $"norm_url", $"host", $"domain")
      .orderBy($"doc_id")

  private val plantedPctSql =
    """planted AS (
      |  SELECT doc_id,
      |    ['http','HTTPS'][(doc_id % 2) + 1] || '://' ||
      |    'h' || (doc_id % 5) || '.ex' || (doc_id % 17) ||
      |    ['.com','.co.uk'][(doc_id % 2) + 1] ||
      |    [':80','',':8080'][(doc_id % 3) + 1] ||
      |    ['/%7Euser/p' || doc_id, '/a%2fb/' || doc_id,
      |     '/p/%2E%2E/q' || doc_id, '/x%41y/' || (doc_id % 9),
      |     '/m%zq/' || doc_id, '/n%5F/./' || doc_id][(doc_id % 6) + 1] ||
      |    ['?utm%5Fsource=t&id=' || doc_id,
      |     '?u%5Fx=' || (doc_id % 7) || '&ref=' || doc_id,
      |     ''][(doc_id % 3) + 1] ||
      |    CASE WHEN doc_id % 4 = 0 THEN '#a' ELSE '' END AS url
      |  FROM documents
      |)""".stripMargin

  /** The generic q129 normalization chain with the §6.2.2.2 percent
    * step over the PLANTED escape set spliced in at the kernel's own
    * position: decode unreserved (`%7E %41 %5F`), uppercase the
    * reserved `%2f`, decode `%2E` so the dot collapse sees `..`,
    * leave the malformed `%zq` alone.
    */
  private val pctNormCtes =
    """parts AS (
      |  SELECT doc_id, url,
      |    lower(split_part(url, '://', 1)) AS scheme,
      |    substr(url, len(split_part(url, '://', 1)) + 4) AS rest
      |  FROM planted
      |), auth AS (
      |  SELECT *, regexp_extract(rest, '^[^/?#]*') AS authority,
      |    substr(rest, len(regexp_extract(rest, '^[^/?#]*')) + 1) AS pqf
      |  FROM parts
      |), hp AS (
      |  SELECT *,
      |    lower(CASE WHEN contains(authority, ':')
      |               THEN split_part(authority, ':', 1) ELSE authority END) AS host,
      |    CASE WHEN contains(authority, ':')
      |         THEN split_part(authority, ':', 2) ELSE '' END AS port,
      |    regexp_replace(pqf, '#.*$', '') AS nofrag
      |  FROM auth
      |), pq AS (
      |  SELECT *, regexp_extract(nofrag, '^[^?]*') AS path0,
      |    CASE WHEN contains(nofrag, '?')
      |         THEN substr(nofrag, len(regexp_extract(nofrag, '^[^?]*')) + 2)
      |         ELSE '' END AS query0
      |  FROM hp
      |), pct AS (
      |  SELECT *,
      |    replace(replace(replace(replace(replace(path0,
      |      '%7E', '~'), '%2f', '%2F'), '%2E', '.'), '%41', 'A'), '%5F', '_')
      |      AS pathp,
      |    replace(query0, '%5F', '_') AS queryp
      |  FROM pq
      |), dots AS (
      |  SELECT *, regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |    pathp, '/\./', '/', 'g'),
      |    '/[^/.][^/]*/\.\./', '/'), '/[^/.][^/]*/\.\./', '/'),
      |    '/[^/.][^/]*/\.\./', '/') AS path1
      |  FROM pct
      |), qf AS (
      |  SELECT *, array_to_string(list_filter(string_split(queryp, '&'),
      |    p -> NOT (p LIKE 'utm\_%' ESCAPE '\' OR p LIKE 'fbclid=%'
      |              OR p LIKE 'gclid=%')), '&') AS query1
      |  FROM dots
      |), dom AS (
      |  SELECT *, string_split(host, '.') AS hl FROM qf
      |), norm AS (
      |  SELECT doc_id, url, host,
      |    CASE WHEN len(hl) >= 3 AND hl[-2] || '.' || hl[-1]
      |              IN ('co.uk','org.uk','ac.uk','com.au','co.jp')
      |         THEN hl[-3] || '.' || hl[-2] || '.' || hl[-1]
      |         WHEN len(hl) >= 2 THEN hl[-2] || '.' || hl[-1]
      |         ELSE host END AS domain,
      |    scheme || '://' || host ||
      |    CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
      |              AND NOT (scheme = 'https' AND port = '443')
      |         THEN ':' || port ELSE '' END ||
      |    CASE WHEN path1 = '' THEN '/' ELSE path1 END ||
      |    CASE WHEN query1 <> '' THEN '?' || query1 ELSE '' END AS norm_url
      |  FROM dom
      |)""".stripMargin

  private val q129bSql =
    s"""WITH $plantedPctSql, $pctNormCtes
       |SELECT doc_id, url, norm_url, host, domain
       |FROM norm ORDER BY doc_id""".stripMargin

  // ------------- q131x: html_text_full production twin (rows-only)
  /** The q131 extraction with numeric character references planted —
    * the curly apostrophe `&#8217;`/`&#x2019;` real pages carry, a
    * supplementary-plane `&#x1F600;`, and the malformed/out-of-range
    * forms that must stay literal — through the PRODUCTION
    * `html_text_full` kernel (`numericRefs = true`). No SQL oracle:
    * `replace()` cannot express numeric decode (the documented q131
    * contract); the decode itself is fuzz-pinned in HtmlSpec against
    * an independent `java.util.regex` + `Character.toChars`
    * reference, and the row count is gated rows-only by the xx
    * convention.
    */
  private def q131x(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{graftbridge => gb}
    val esc = expr(
      "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')")
    val html = concat(
      lit("<html><head><title>D"), $"doc_id".cast("string"),
      lit("</title><script>if(1&#60;2){x&#8217;}</script></head><body><p>"),
      esc,
      lit("</p><p>it&#8217;s &#x2019; A=&#65; pair=&#x1F600; max=&#x10FFFF;"),
      lit(" bad=&#1114112; sur=&#xD800; z=&#0; part=&#x; q&#39;s &amp;#65;</p>"),
      lit("</body></html>"))
    Tables.docsPar(s, dir)
      .select($"doc_id",
        gb.column(graft.fn.HtmlText(gb.expression(html), numericRefs = true))
          .as("text_out"))
      .withColumn("n_out", length($"text_out").cast("long"))
      .orderBy($"doc_id")
  }

  // --------- q136: WET-style WARC→text conversion, hash-gated
  /** The conversion shape real crawl processing starts from (a
    * Common-Crawl WET job): read a WARC corpus → keep 200 text/html
    * responses → `html_text` extraction → token/quality gate → one
    * text record per page with its profile signals. Composes
    * [[graft.io.Warc]] (source AND sink, wire-variant encodings
    * cycling per record), [[graft.fn.HtmlText]], and the
    * [[graft.fn.TextProfile]] kernel in ONE plan over a corpus the
    * engine writes itself — the q132 oracle-prediction pattern: docs
    * with `doc_id % 13 = 0` are written as `application/pdf` so the
    * response filter has real work, and DuckDB predicts the surviving
    * set, the extracted text, and every profile signal from the
    * `documents` table alone. Any framing, decode, extraction, or
    * profile bug breaks the hash.
    */
  private val Q136Dir = "/tmp/graft_fixtures/q136_warc"

  private def q136(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.{graftbridge => gb}
    val rows = Queries13.synthHtml(s, dir).select(
        concat(lit("https://wet.test/doc/"), col("doc_id").cast("string")),
        lit("2026-08-15T00:00:00Z"),
        when(col("doc_id") % 13 === 0, lit("application/pdf"))
          .otherwise(lit("text/html; charset=utf-8")),
        encode(col("html"), "UTF-8"))
      .as[(String, String, String, Array[Byte])]
    val hp = new org.apache.hadoop.fs.Path(Q136Dir)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(hp, true) // stale segments from a prior run/partitioning
    val nSeg = math.max(8, s.sparkContext.defaultParallelism)
    graft.io.Warc.writeWarcGz(rows.repartition(nSeg), Q136Dir, wireVariants = true)
    val ext = graft.io.Warc.responses(graft.io.Warc.readWarc(s, Q136Dir))
      .where(col("http_status") === 200 &&
             col("http_content_type").startsWith("text/html"))
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
        Queries13.htmlTextCol(decode(col("payload"), "UTF-8")).as("text_out"))
    val p = gb.column(graft.fn.TextProfile(gb.expression(col("text_out"))))
    ext.select(col("doc_id"), col("text_out"), p.as("__p"))
      .filter(col("__p").isNotNull)
      .select(col("doc_id"), col("text_out"),
        col("__p.n_tokens").as("n_tokens"),
        col("__p.lang_id").as("lang_id"),
        round(col("__p.quality"), 6).as("quality"))
      .where(col("n_tokens") >= 20 && col("quality") >= 0.5)
      .withColumn("n_out", length(col("text_out")).cast("long"))
      .orderBy(col("doc_id"))
  }

  // the oracle never reads the WARC files: it predicts the surviving
  // records and their profiles from `documents` alone
  private val q136Sql =
    s"""WITH kept AS (SELECT * FROM documents WHERE doc_id % 13 <> 0),
       |${Queries13.synthSqlOver("kept")},
       |${Queries13.extractSql},
       |${TextProfileSql.ctes("ext", "doc_id", "text_out")},
       |prof AS (
       |${TextProfileSql.select("doc_id")}
       |)
       |SELECT p.doc_id, e.text_out, p.n_tokens, p.lang_id, p.quality,
       |  CAST(length(e.text_out) AS BIGINT) AS n_out
       |FROM prof p JOIN ext e USING (doc_id)
       |WHERE p.n_tokens >= 20 AND p.quality >= 0.5
       |ORDER BY p.doc_id""".stripMargin

  // --------- q137: MP3 side-info walk, hash-gated byte round-trip
  /** The [[graft.ext.Mp3]] walker under the correctness gate: the
    * engine packs one real MPEG-1 Layer III stream per document row
    * in-plan ([[graft.fn.Mp3Synth]] — every structural knob a
    * closed-form function of `doc_id`: frame count, per-frame
    * bitrate/samplerate indices, mono/stereo, padding, CRC, ID3v2
    * prefix, ID3v1 trailer, and every granule-channel's side-info
    * fields), walks the bytes back ([[graft.fn.Mp3SideStats]]), and
    * emits integer-exact statistics. DuckDB predicts every column
    * from `doc_id` alone — replaying the bitrate/samplerate tables,
    * the 144·kbps/rate+pad frame-length rule, and the tag framing in
    * SQL — so any bit-packing OR bit-reading defect breaks the hash.
    * One scan, two narrow kernels, no shuffle before the final sort.
    */
  /** q137/q138 corpus base: only `doc_id` feeds the synth kernels and
    * the per-row work is CPU-heavy (container packing + walking), so
    * the spread is forced to the full core count — `docsPar`'s
    * size-derived width (sized for hash-heavy text stages) would
    * throttle an sf10 run to half the box.
    */
  private def docIds(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, Tables.tbl(s, dir, "documents").select($"doc_id"),
      minParts = s.sparkContext.defaultParallelism)

  /** Every synth+walk query below wraps its struct kernel in
    * `explode(array(...))`: the Generate is a CollapseProject /
    * predicate-pushdown barrier that pins the expensive kernel to
    * exactly ONE evaluation per row. Without it the not-null filter
    * and the field-extraction project each re-run the kernel —
    * measured 7.7× slower on q141's full audio decode
    * (`tools/Q141Shape`). `explode` of a one-element array preserves
    * the row (a null struct explodes to one null row, which the
    * filter then drops), so query semantics and hashes are unchanged.
    */

  private def q137(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{graftbridge => gb}
    val synth = gb.column(graft.fn.Mp3Synth(gb.expression($"doc_id".cast("long"))))
    docIds(s, dir).select($"doc_id", synth.as("mp3"))
      .select($"doc_id", $"mp3",
        explode(array(gb.column(graft.fn.Mp3SideStats(gb.expression($"mp3"))))).as("__s"))
      .filter($"__s".isNotNull)
      .select($"doc_id",
        $"__s.n_frames".as("n_frames"),
        $"__s.crc_frames".as("crc_frames"),
        $"__s.brate_sum".as("brate_sum"),
        $"__s.rate_sum".as("rate_sum"),
        $"__s.mdb_sum".as("mdb_sum"),
        $"__s.gain_sum".as("gain_sum"),
        $"__s.gain_min".as("gain_min"),
        $"__s.gain_max".as("gain_max"),
        $"__s.wsf_grans".as("wsf_grans"),
        length($"mp3").cast("long").as("len_bytes"))
      .orderBy($"doc_id")
  }

  private val q137Sql =
    """WITH fr AS (
      |  SELECT doc_id, CAST(t.f AS BIGINT) AS f,
      |    CAST(1 + (doc_id + 5*t.f) % 14 AS INT) AS kidx,
      |    CAST((doc_id + t.f) % 3 AS INT) AS ridx
      |  FROM documents, UNNEST(range(0, 4)) AS t(f)
      |  WHERE t.f < 2 + doc_id % 3
      |), fx AS (
      |  SELECT doc_id, f,
      |    [32,40,48,56,64,80,96,112,128,160,192,224,256,320][kidx] AS kbps,
      |    [44100,48000,32000][ridx + 1] AS rate
      |  FROM fr
      |), fagg AS (
      |  SELECT doc_id,
      |    COUNT(*) AS n_frames,
      |    SUM(CASE WHEN (doc_id + f) % 3 = 0 THEN 1 ELSE 0 END) AS crc_frames,
      |    SUM(kbps) AS brate_sum,
      |    SUM(rate) AS rate_sum,
      |    SUM((doc_id*7 + f*11) % 512) AS mdb_sum,
      |    SUM(144*kbps*1000 // rate + (doc_id + f) % 2) AS frame_bytes
      |  FROM fx GROUP BY doc_id
      |), gc AS (
      |  SELECT doc_id, f, CAST(tg.g AS BIGINT) AS g, CAST(tc.ch AS BIGINT) AS ch
      |  FROM fr, UNNEST(range(0, 2)) AS tg(g), UNNEST(range(0, 2)) AS tc(ch)
      |  WHERE tc.ch < CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 2 END
      |), gagg AS (
      |  SELECT doc_id,
      |    SUM((doc_id*31 + f*13 + g*7 + ch*3) % 256) AS gain_sum,
      |    MIN((doc_id*31 + f*13 + g*7 + ch*3) % 256) AS gain_min,
      |    MAX((doc_id*31 + f*13 + g*7 + ch*3) % 256) AS gain_max,
      |    SUM(CASE WHEN (doc_id + f + g) % 2 = 1 THEN 1 ELSE 0 END) AS wsf_grans
      |  FROM gc GROUP BY doc_id
      |)
      |SELECT fa.doc_id,
      |  CAST(fa.n_frames AS INT) AS n_frames,
      |  CAST(fa.crc_frames AS INT) AS crc_frames,
      |  CAST(fa.brate_sum AS BIGINT) AS brate_sum,
      |  CAST(fa.rate_sum AS BIGINT) AS rate_sum,
      |  CAST(fa.mdb_sum AS BIGINT) AS mdb_sum,
      |  CAST(ga.gain_sum AS BIGINT) AS gain_sum,
      |  CAST(ga.gain_min AS INT) AS gain_min,
      |  CAST(ga.gain_max AS INT) AS gain_max,
      |  CAST(ga.wsf_grans AS INT) AS wsf_grans,
      |  CAST(fa.frame_bytes
      |    + CASE WHEN fa.doc_id % 6 = 0 THEN 10 + fa.doc_id % 50 ELSE 0 END
      |    + CASE WHEN fa.doc_id % 9 = 0 THEN 128 ELSE 0 END AS BIGINT) AS len_bytes
      |FROM fagg fa JOIN gagg ga USING (doc_id)
      |ORDER BY fa.doc_id""".stripMargin

  // --------- q138: Ogg Vorbis/Opus container walk, hash-gated
  /** The [[graft.ext.Ogg]] walker under the correctness gate — the
    * q137 pattern for the Ogg container family: real pages with real
    * CRCs packed in-plan ([[graft.fn.OggSynth]], layout exercising
    * zero-lacing terminators and cross-page packet continuation),
    * walked back CRC-verified ([[graft.fn.OggStreamMeta]]). DuckDB
    * replays the page/packet layout arithmetic, both codecs' header
    * fields, the 48 kHz Opus granule-rate rule, and the audio payload
    * accounting from `doc_id` alone.
    */
  private def q138(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{graftbridge => gb}
    val synth = gb.column(graft.fn.OggSynth(gb.expression($"doc_id".cast("long"))))
    docIds(s, dir).select($"doc_id", synth.as("ogg"))
      .select($"doc_id",
        explode(array(gb.column(graft.fn.OggStreamMeta(gb.expression($"ogg"))))).as("__m"))
      .filter($"__m".isNotNull)
      .select($"doc_id",
        $"__m.codec".as("codec"),
        $"__m.channels".as("channels"),
        $"__m.rate".as("rate"),
        $"__m.pre_skip".as("pre_skip"),
        $"__m.n_pages".as("n_pages"),
        $"__m.n_packets".as("n_packets"),
        $"__m.last_granule".as("last_granule"),
        $"__m.duration_ms".as("duration_ms"),
        $"__m.n_comments".as("n_comments"),
        $"__m.vendor".as("vendor"),
        $"__m.audio_bytes".as("audio_bytes"))
      .orderBy($"doc_id")
  }

  private val q138Sql =
    """WITH base AS (
      |  SELECT doc_id,
      |    doc_id % 5 = 0 AS opus,
      |    [8000,22050,44100,48000][CAST(doc_id % 4 AS INT) + 1] AS rate,
      |    3 + doc_id % 4 AS a,
      |    256 + doc_id % 512 AS spp
      |  FROM documents
      |), audio AS (
      |  SELECT b.doc_id,
      |    SUM(CASE WHEN t.p = 1 THEN 510
      |             WHEN t.p = 2 THEN 300 + b.doc_id % 100
      |             ELSE 40 + (b.doc_id*17 + t.p*97) % 200 END) AS audio_bytes
      |  FROM base b, UNNEST(range(0, 7)) AS t(p)
      |  WHERE t.p < b.a
      |  GROUP BY b.doc_id
      |)
      |SELECT b.doc_id,
      |  CASE WHEN b.opus THEN 'opus' ELSE 'vorbis' END AS codec,
      |  CAST(1 + b.doc_id % 2 AS INT) AS channels,
      |  CAST(b.rate AS BIGINT) AS rate,
      |  CAST(CASE WHEN b.opus THEN b.doc_id % 400 ELSE 0 END AS INT) AS pre_skip,
      |  CAST(3 + b.a AS INT) AS n_pages,
      |  CAST(CASE WHEN b.opus THEN 2 + b.a ELSE 3 + b.a END AS INT) AS n_packets,
      |  CAST(b.a * b.spp AS BIGINT) AS last_granule,
      |  CAST(b.a * b.spp * 1000 // (CASE WHEN b.opus THEN 48000 ELSE b.rate END)
      |    AS BIGINT) AS duration_ms,
      |  CAST(b.doc_id % 4 AS INT) AS n_comments,
      |  'graft-' || CAST(b.doc_id % 10 AS VARCHAR) AS vendor,
      |  CAST(au.audio_bytes AS BIGINT) AS audio_bytes
      |FROM base b JOIN audio au USING (doc_id)
      |ORDER BY b.doc_id""".stripMargin

  // --------- q139: Vorbis setup codebooks, hash-gated
  /** The [[graft.ext.VorbisSetup]] codebook layer under the gate:
    * q138's Vorbis fixtures carry REAL setup packets (book 0 is the
    * fixed irregular-length book whose canonical codewords are
    * hand-derivable — lengths 1,2,3,3 → words 0,10,110,111 → sum 15;
    * later books parameterized uniform), parsed back through the
    * LSB-first reader + canonical assembly trie. `cw_sum` gates the
    * codeword assignment itself; the oracle replays every statistic
    * from `doc_id`. Opus docs have no Vorbis setup and drop.
    */
  private val Q139OggFixture = "/tmp/graft_fixtures/q139_ogg.parquet"

  private def q139(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{graftbridge => gb}
    val synth = gb.column(graft.fn.OggSynth(gb.expression($"doc_id".cast("long"))))
    // Fixture persistence (the q84p/q125p/q148 convention, VERDICT r11
    // item 5): packing + CRC-ing the Ogg containers is corpus
    // SYNTHESIS — work the doc_id-arithmetic oracle never does and
    // ~2/3 of the old graded wall (`tools/Q139Decomp`). Persist the
    // synth at construction; the graded plan measures the setup
    // PARSE, which is the operator under test. The hash gate is
    // unchanged: the fixture is engine-written each construction and
    // the oracle still predicts every statistic from doc_id alone.
    docIds(s, dir).select($"doc_id", synth.as("ogg"))
      .write.mode("overwrite").parquet(Q139OggFixture)
    s.read.parquet(Q139OggFixture)
      .select($"doc_id",
        explode(array(gb.column(graft.fn.VorbisSetupStats(gb.expression($"ogg"))))).as("__v"))
      .filter($"__v".isNotNull)
      .select($"doc_id",
        $"__v.n_books".as("n_books"),
        $"__v.dim_sum".as("dim_sum"),
        $"__v.entries_sum".as("entries_sum"),
        $"__v.used_sum".as("used_sum"),
        $"__v.maxlen".as("maxlen"),
        $"__v.lookup_books".as("lookup_books"),
        $"__v.lookup_values_sum".as("lookup_values_sum"),
        $"__v.cw_sum".as("cw_sum"),
        $"__v.complete_books".as("complete_books"))
      .orderBy($"doc_id")
  }

  private val q139Sql =
    """WITH base AS (
      |  SELECT doc_id, 2 + doc_id % 2 AS n_books
      |  FROM documents WHERE doc_id % 5 <> 0
      |), bk AS (
      |  SELECT b.doc_id, b.n_books, t.k,
      |    1 + (b.doc_id + t.k) % 2 AS dims,
      |    2 + (b.doc_id + t.k) % 3 AS l,
      |    (b.doc_id + t.k) % 2 AS haslk
      |  FROM base b, UNNEST(range(1, 3)) AS t(k)
      |  WHERE t.k < b.n_books
      |), agg AS (
      |  SELECT doc_id,
      |    SUM(dims) AS dim_sum,
      |    SUM(CASE l WHEN 2 THEN 4 WHEN 3 THEN 8 ELSE 16 END) AS entries_sum,
      |    MAX(l) AS maxlen,
      |    SUM(haslk) AS lookup_books,
      |    SUM(CASE WHEN haslk = 1
      |             THEN CASE WHEN l = 4 THEN 4 ELSE 2 END ELSE 0 END)
      |      AS lookup_values_sum,
      |    SUM(CASE l WHEN 2 THEN 6 WHEN 3 THEN 28 ELSE 120 END) AS cw_sum
      |  FROM bk GROUP BY doc_id
      |)
      |SELECT b.doc_id,
      |  CAST(b.n_books AS INT) AS n_books,
      |  CAST(1 + a.dim_sum AS BIGINT) AS dim_sum,
      |  CAST(4 + a.entries_sum AS BIGINT) AS entries_sum,
      |  CAST(4 + a.entries_sum AS BIGINT) AS used_sum,
      |  CAST(GREATEST(3, a.maxlen) AS INT) AS maxlen,
      |  CAST(a.lookup_books AS INT) AS lookup_books,
      |  CAST(a.lookup_values_sum AS BIGINT) AS lookup_values_sum,
      |  CAST(15 + a.cw_sum AS BIGINT) AS cw_sum,
      |  CAST(b.n_books AS INT) AS complete_books
      |FROM base b JOIN agg a USING (doc_id)
      |ORDER BY b.doc_id""".stripMargin

  // --------- q140: the complete Vorbis setup parse, hash-gated
  /** [[graft.fn.VorbisSetupFull]] over the q138 corpus: the fixtures'
    * setup packets now run through floors (type 1 with closed-form
    * partitions/dims/multiplier/rangebits/x-lists), a residue with a
    * cascade-driven book table, a channel mapping (stereo docs carry
    * a real coupling step), modes, and the closing framing bit —
    * every statistic replayed by DuckDB from `doc_id`. A conformant
    * stream's entire decode CONFIGURATION is now validated in-plan.
    */
  private def q140(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{graftbridge => gb}
    val synth = gb.column(graft.fn.OggSynth(gb.expression($"doc_id".cast("long"))))
    docIds(s, dir).select($"doc_id", synth.as("ogg"))
      .select($"doc_id",
        explode(array(gb.column(graft.fn.VorbisSetupFull(gb.expression($"ogg"))))).as("__v"))
      .filter($"__v".isNotNull)
      .select($"doc_id",
        $"__v.n_floors".as("n_floors"),
        $"__v.floor_part_sum".as("floor_part_sum"),
        $"__v.floor_dim_sum".as("floor_dim_sum"),
        $"__v.floor_mult_sum".as("floor_mult_sum"),
        $"__v.floor_range_sum".as("floor_range_sum"),
        $"__v.floor_x_sum".as("floor_x_sum"),
        $"__v.res_type".as("res_type"),
        $"__v.res_begin".as("res_begin"),
        $"__v.res_end".as("res_end"),
        $"__v.res_psize".as("res_psize"),
        $"__v.res_classes".as("res_classes"),
        $"__v.res_cascade_sum".as("res_cascade_sum"),
        $"__v.res_books".as("res_books"),
        $"__v.coupling_steps".as("coupling_steps"),
        $"__v.n_modes".as("n_modes"),
        $"__v.blockflag_sum".as("blockflag_sum"))
      .orderBy($"doc_id")
  }

  private val q140Sql =
    """WITH base AS (
      |  SELECT doc_id, 1 + doc_id % 2 AS n_floors, 1 + doc_id % 3 AS n_cls
      |  FROM documents WHERE doc_id % 5 <> 0
      |), fl AS (
      |  SELECT b.doc_id,
      |    SUM(1 + (b.doc_id + t.f) % 2) AS part_sum,
      |    SUM(1 + (b.doc_id + t.f) % 3) AS dim_sum,
      |    SUM(1 + (b.doc_id + t.f) % 4) AS mult_sum,
      |    SUM(4 + (b.doc_id + t.f) % 3) AS range_sum,
      |    SUM(CASE 4 + (b.doc_id + t.f) % 3
      |          WHEN 4 THEN 16 WHEN 5 THEN 32 ELSE 64 END
      |        + 3 * (1 + (b.doc_id + t.f) % 2) * (1 + (b.doc_id + t.f) % 3)
      |        + (1 + (b.doc_id + t.f) % 2) * (1 + (b.doc_id + t.f) % 3)
      |          * ((1 + (b.doc_id + t.f) % 2) * (1 + (b.doc_id + t.f) % 3) - 1)
      |          // 2) AS x_sum
      |  FROM base b, UNNEST(range(0, 2)) AS t(f)
      |  WHERE t.f < b.n_floors GROUP BY b.doc_id
      |), cl AS (
      |  SELECT b.doc_id,
      |    SUM((b.doc_id + t.c) % 8) AS cascade_sum,
      |    SUM([0,1,1,2,1,2,2,3][CAST((b.doc_id + t.c) % 8 AS INT) + 1]) AS books
      |  FROM base b, UNNEST(range(0, 3)) AS t(c)
      |  WHERE t.c < b.n_cls GROUP BY b.doc_id
      |), md AS (
      |  SELECT b.doc_id,
      |    SUM((b.doc_id + t.m) % 2) AS bf_sum
      |  FROM base b, UNNEST(range(0, 2)) AS t(m)
      |  WHERE t.m < 1 + b.doc_id % 2 GROUP BY b.doc_id
      |)
      |SELECT b.doc_id,
      |  CAST(b.n_floors AS INT) AS n_floors,
      |  CAST(f.part_sum AS BIGINT) AS floor_part_sum,
      |  CAST(f.dim_sum AS BIGINT) AS floor_dim_sum,
      |  CAST(f.mult_sum AS BIGINT) AS floor_mult_sum,
      |  CAST(f.range_sum AS BIGINT) AS floor_range_sum,
      |  CAST(f.x_sum AS BIGINT) AS floor_x_sum,
      |  CAST(b.doc_id % 3 AS INT) AS res_type,
      |  CAST(b.doc_id % 50 AS BIGINT) AS res_begin,
      |  CAST(b.doc_id % 50 + 100 + b.doc_id % 100 AS BIGINT) AS res_end,
      |  CAST(8 + b.doc_id % 8 AS INT) AS res_psize,
      |  CAST(b.n_cls AS INT) AS res_classes,
      |  CAST(c.cascade_sum AS BIGINT) AS res_cascade_sum,
      |  CAST(c.books AS INT) AS res_books,
      |  CAST(b.doc_id % 2 AS INT) AS coupling_steps,
      |  CAST(1 + b.doc_id % 2 AS INT) AS n_modes,
      |  CAST(m.bf_sum AS INT) AS blockflag_sum
      |FROM base b JOIN fl f USING (doc_id) JOIN cl c USING (doc_id)
      |  JOIN md m USING (doc_id)
      |ORDER BY b.doc_id""".stripMargin

  // --------- q141: the Vorbis audio signal path, hash-gated
  /** [[graft.fn.VorbisPcmStats]] over FULLY-DECODABLE fixtures
    * ([[graft.ext.VorbisPcmFixtures]]): the engine packs a complete
    * Ogg Vorbis stream per row — real codebooks, floor posts, residue
    * classwords and VQ entries, truthful window flags, lapped
    * granules — decodes it back through the ENTIRE signal path
    * (Huffman → floor posts → residue in the doc's own type 0/1/2
    * shape and 1-or-2-pass cascade → coupling → integer floor curve →
    * IMDCT → window → overlap-add), and emits the integer-exact stage
    * sums. DuckDB replays the mode schedule, post arithmetic, the
    * classword/VQ lattice sums, the §9.2.6 integer line render, and
    * the center-to-center lapping arithmetic from `doc_id` alone —
    * a wrong bit in packing or decoding anywhere in the chain breaks
    * the hash. The float stages the oracle cannot see (dB table,
    * IMDCT, window) are gated by VorbisDecodeSpec's independent
    * synthesis and the Princen–Bradley reconstruction property.
    */
  private def q141(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{graftbridge => gb}
    val synth = gb.column(graft.fn.VorbisPcmSynth(gb.expression($"doc_id".cast("long"))))
    docIds(s, dir).select($"doc_id", synth.as("ogg"))
      .select($"doc_id",
        explode(array(gb.column(graft.fn.VorbisPcmStats(gb.expression($"ogg"))))).as("__v"))
      .filter($"__v".isNotNull)
      .select($"doc_id",
        $"__v.channels".as("channels"),
        $"__v.rate".as("rate"),
        $"__v.n_packets".as("n_packets"),
        $"__v.post_sum".as("post_sum"),
        $"__v.res_sum".as("res_sum"),
        $"__v.curve_sum".as("curve_sum"),
        $"__v.pcm_samples".as("pcm_samples"))
      .orderBy($"doc_id")
  }

  private val q141Sql =
    """WITH base AS (
      |  SELECT doc_id,
      |    CAST(1 + doc_id % 2 AS INT) AS c,
      |    [8000,22050,44100,48000][CAST(doc_id % 4 AS INT) + 1] AS rate,
      |    1 + doc_id % 2 AS m,
      |    20 + doc_id % 3 AS a,
      |    1 + doc_id % 4 AS mult,
      |    [256,128,86,64][CAST(doc_id % 4 AS INT) + 1] AS rng,
      |    [16,32,64][CAST(doc_id % 3 AS INT) + 1] AS adx,
      |    doc_id % 3 AS rt,
      |    1 + 2 * (doc_id % 2) AS casc
      |  FROM documents
      |), posts AS (
      |  SELECT b.doc_id,
      |    SUM((11*b.doc_id + 7*t.p + 3*u.ch) % b.rng
      |      + (5*b.doc_id + 13*t.p + 2*u.ch + 17) % b.rng) AS post_sum
      |  FROM base b, UNNEST(range(0, 23)) AS t(p), UNNEST(range(0, 2)) AS u(ch)
      |  WHERE t.p < b.a AND u.ch < b.c
      |  GROUP BY b.doc_id
      |), res AS (
      |  SELECT b.doc_id,
      |    SUM(5 + 4 * ((b.doc_id + 2*t.p + 3*v.j + 5*w.t + x.k) % 4 % 2)
      |      + CASE WHEN b.casc = 3 AND (b.doc_id + t.p + v.j + w.t) % 2 = 1
      |             THEN 9 - 4 * ((b.doc_id + 2*t.p + 3*v.j + 5*w.t + 7 + x.k) % 4 % 2)
      |             ELSE 0 END) AS res_sum
      |  FROM base b, UNNEST(range(0, 23)) AS t(p), UNNEST(range(0, 2)) AS v(j),
      |       UNNEST(range(0, 2)) AS w(t), UNNEST(range(0, 4)) AS x(k)
      |  WHERE t.p < b.a
      |    AND v.j < CASE WHEN b.rt = 2 THEN 1 ELSE b.c END
      |  GROUP BY b.doc_id
      |), blocks AS (
      |  SELECT b.doc_id, t.p,
      |    CASE WHEN b.m = 1 THEN 256
      |         WHEN (b.doc_id + t.p) % 2 = 1 THEN 2048 ELSE 256 END AS n
      |  FROM base b, UNNEST(range(0, 23)) AS t(p)
      |  WHERE t.p < b.a
      |), lines AS (
      |  -- per (packet, channel) the rendered line: y0m, y1m on the
      |  -- §9.2.6 integer slope over [0, adx); flat y1m beyond
      |  SELECT b.doc_id, bl.p, u.ch, b.adx, b.mult, bl.n,
      |    ((11*b.doc_id + 7*bl.p + 3*u.ch) % b.rng) * b.mult AS y0m,
      |    ((5*b.doc_id + 13*bl.p + 2*u.ch + 17) % b.rng) * b.mult AS y1m
      |  FROM base b JOIN blocks bl USING (doc_id), UNNEST(range(0, 2)) AS u(ch)
      |  WHERE u.ch < b.c
      |), curve AS (
      |  -- line part enumerates only x < min(n/2, adx) (adx <= 64);
      |  -- the flat extension is closed-form
      |  SELECT l.doc_id,
      |    SUM(CASE WHEN l.y1m < l.y0m
      |             THEN l.y0m - ((l.y0m - l.y1m) * x.x) // l.adx
      |             ELSE l.y0m + ((l.y1m - l.y0m) * x.x) // l.adx END)
      |    + SUM(CASE WHEN x.x = 0
      |               THEN GREATEST(l.n // 2 - l.adx, 0) * l.y1m
      |               ELSE 0 END) AS curve_sum
      |  FROM lines l, UNNEST(range(0, 64)) AS x(x)
      |  WHERE x.x < LEAST(l.n // 2, l.adx)
      |  GROUP BY l.doc_id
      |), pcm AS (
      |  SELECT b.doc_id,
      |    SUM((bp.n + bc.n) // 4) AS pcm_samples
      |  FROM base b
      |  JOIN blocks bc USING (doc_id)
      |  JOIN blocks bp ON bp.doc_id = b.doc_id AND bp.p = bc.p - 1
      |  WHERE bc.p >= 1
      |  GROUP BY b.doc_id
      |)
      |SELECT b.doc_id,
      |  b.c AS channels,
      |  CAST(b.rate AS BIGINT) AS rate,
      |  CAST(b.a AS INT) AS n_packets,
      |  CAST(p.post_sum AS BIGINT) AS post_sum,
      |  CAST(r.res_sum AS BIGINT) AS res_sum,
      |  CAST(cv.curve_sum AS BIGINT) AS curve_sum,
      |  CAST(pc.pcm_samples AS BIGINT) AS pcm_samples
      |FROM base b JOIN posts p USING (doc_id) JOIN res r USING (doc_id)
      |  JOIN curve cv USING (doc_id) JOIN pcm pc USING (doc_id)
      |ORDER BY b.doc_id""".stripMargin

  // --------- q142: mixed-container audio dedup, pair stage hash-gated
  /** The audio near-dup family over a MIXED-container corpus: FLAC
    * tone clips ([[graft.ext.AudioFixtures]] — with planted ±LSB
    * near-dup twins) and Ogg Vorbis streams
    * ([[graft.ext.VorbisPcmFixtures]] — decoded through the complete
    * [[graft.ext.VorbisDecode]] signal path) flow through ONE
    * format-routed fingerprint kernel into the shared band-join pair
    * stage. The q128p pattern: computed fingerprints persist to
    * parquet and BOTH engines replay the pair stage from the same
    * rows — so the gate covers the routing and the join, while the
    * decodes behind the fingerprints are gated by q128/q141 and the
    * codec spec suites.
    */
  private val Q142FpFixture = "/tmp/graft_fixtures/q142_audio_fp.parquet"

  private def q142Assets(s: SparkSession): DataFrame = {
    val flacs = (0 until 40).map(i =>
      (i.toLong, graft.ext.AudioFixtures.toneClip(i, nSamples = 8192)))
    val twins = (0 until 10).map(i =>
      (i + 1000L, graft.ext.AudioFixtures.toneClip(i, nSamples = 8192, perturb = true)))
    val oggs = (0 until 24).map(d =>
      (d + 2000L, graft.ext.VorbisPcmFixtures.stream(d.toLong)))
    s.createDataFrame(flacs ++ twins ++ oggs).toDF("aud_id", "content")
      .repartition(8)
  }

  private def q142(s: SparkSession, dir: String): DataFrame = {
    graft.ext.Audio.withFingerprint(q142Assets(s))
      .where($"afp".isNotNull)
      .select($"aud_id".as("id"), $"afp".as("dhash"))
      .coalesce(1)
      .write.mode("overwrite").parquet(Q142FpFixture)
    graft.ext.Images.nearDupPairsFromHashes(
        s.read.parquet(Q142FpFixture), maxHamming = 3)
      .orderBy($"a_id", $"b_id")
  }

  private val q142Sql =
    s"""WITH h AS (
       |  SELECT id, dhash FROM read_parquet('$Q142FpFixture/*.parquet')
       |), eq AS (
       |  SELECT x.id AS a_id, y.id AS b_id, 0 AS hamming
       |  FROM h x JOIN h y ON x.dhash = y.dhash AND x.id < y.id
       |), uniq AS (
       |  SELECT DISTINCT dhash FROM h
       |), banded AS (
       |  SELECT dhash, i AS band_idx, (dhash >> CAST(16 * i AS INT)) & 65535 AS band_val
       |  FROM uniq, UNNEST(range(0, 4)) AS t(i)
       |), near AS (
       |  SELECT DISTINCT a.dhash AS ha, b.dhash AS hb
       |  FROM banded a
       |  JOIN banded b ON a.band_idx = b.band_idx
       |    AND a.band_val = b.band_val AND a.dhash < b.dhash
       |), nearh AS (
       |  SELECT ha, hb, bit_count(xor(ha, hb)) AS hamming
       |  FROM near WHERE bit_count(xor(ha, hb)) <= 3
       |), neq AS (
       |  SELECT LEAST(x.id, y.id) AS a_id, GREATEST(x.id, y.id) AS b_id, hamming
       |  FROM nearh JOIN h x ON ha = x.dhash JOIN h y ON hb = y.dhash
       |)
       |SELECT a_id, b_id, CAST(hamming AS INT) AS hamming
       |FROM (SELECT * FROM eq UNION ALL SELECT * FROM neq)
       |ORDER BY a_id, b_id""".stripMargin

  // --------- q143: charset sniffing + decoding, hash-gated
  /** [[graft.fn.CharsetSniff]] over planted payload BYTES (the
    * q129/q137 convention, built entirely from Spark's own
    * encode/unhex so the plan carries real bytes): pure-ASCII and
    * multibyte UTF-8, a windows-1252 body whose 0xE9/0x93/0x94/0x80
    * bytes must fail strict UTF-8 validation and map through the
    * WHATWG 1252 row, a BOM'd UTF-16LE body, and a BOM'd UTF-8 body.
    * DuckDB predicts the detected charset, the decoded text, and the
    * code-point count per variant; the kernel itself is pinned
    * byte-for-byte against the JDK's own decoders in CharsetSpec.
    */
  private def plantedBytesCol(d: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    element_at(array(
      encode(concat(lit("plain doc "), d.cast("string")), "UTF-8"),
      encode(concat(lit("café 中文 – doc "), d.cast("string")), "UTF-8"),
      concat(unhex(lit("636166E92093")),
        encode(d.cast("string"), "UTF-8"), unhex(lit("942080"))),
      concat(unhex(lit("FFFE")),
        encode(concat(lit("w16 Ü doc "), d.cast("string")), "UTF-16LE")),
      concat(unhex(lit("EFBBBF")),
        encode(concat(lit("bom doc "), d.cast("string")), "UTF-8"))),
      (d % 5 + 1).cast("int"))

  private def q143(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.{graftbridge => gb}
    docIds(s, dir)
      .select($"doc_id", plantedBytesCol($"doc_id").as("payload"))
      .select($"doc_id",
        explode(array(gb.column(graft.fn.CharsetSniff(
          gb.expression($"payload"))))).as("__c"))
      .filter($"__c".isNotNull)
      .select($"doc_id",
        $"__c.charset".as("charset"),
        $"__c.text".as("text"),
        $"__c.n_chars".as("n_chars"))
      .orderBy($"doc_id")
  }

  private val q143Sql =
    """WITH expected AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 5 AS INT)
      |      WHEN 2 THEN 'windows-1252'
      |      WHEN 3 THEN 'utf-16le'
      |      ELSE 'utf-8' END AS charset,
      |    CASE CAST(doc_id % 5 AS INT)
      |      WHEN 0 THEN 'plain doc ' || doc_id
      |      WHEN 1 THEN 'café 中文 – doc ' || doc_id
      |      WHEN 2 THEN 'café “' || doc_id || '” €'
      |      WHEN 3 THEN 'w16 Ü doc ' || doc_id
      |      ELSE 'bom doc ' || doc_id END AS text
      |  FROM documents
      |)
      |SELECT doc_id, charset, text, CAST(length(text) AS INT) AS n_chars
      |FROM expected ORDER BY doc_id""".stripMargin

  // ------ q144: the full ingestion chain — WARC → charset → text
  /** q136 with the round-10 charset stage in its real position: the
    * corpus is written with MIXED payload encodings — UTF-8 pages,
    * BOM'd UTF-16LE pages (the full synth page survives any UTF
    * transform), and windows-1252 pages whose planted 0x93/0x94/0x80
    * bytes force the 1252 fallback and decode through the WHATWG row
    * — plus `application/pdf` rows for the response filter. readWarc
    * → filter → `charset_sniff` → `html_text` → `text_profile` in
    * ONE plan over a corpus the engine writes itself; DuckDB
    * predicts every surviving row's charset, extracted text, and
    * profile from `documents` alone. A defect in the container, the
    * sniffer, the 1252 table, the UTF-16 scan, the extraction, or
    * the profile breaks the hash.
    */
  private val Q144Dir = "/tmp/graft_fixtures/q144_warc"

  private def q144(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.{graftbridge => gb}
    val id = col("doc_id").cast("string")
    val base = Queries13.synthHtml(s, dir) // doc_id, lang, source, html
    val asciiPre = concat(lit(Queries13.H1), col("lang"), lit(Queries13.H2), id,
      lit(Queries13.H3), col("source"), lit(Queries13.H4), id, lit(Queries13.H5),
      lit("quote "))
    val v1252 = concat(
      encode(asciiPre, "ISO-8859-1"),
      unhex(lit("93")), encode(concat(lit("q"), id), "ISO-8859-1"),
      unhex(lit("94")),
      encode(lit(" price "), "ISO-8859-1"), unhex(lit("80")),
      encode(concat((col("doc_id") % 90).cast("string"), lit(Queries13.H6)),
        "ISO-8859-1"))
    val payload = when(col("doc_id") % 4 === 2, v1252)
      .when(col("doc_id") % 4 === 3,
        concat(unhex(lit("FFFE")), encode(col("html"), "UTF-16LE")))
      .otherwise(encode(col("html"), "UTF-8"))
    val rows = base.select(
        concat(lit("https://mixed.test/doc/"), id),
        lit("2026-08-15T00:00:00Z"),
        when(col("doc_id") % 13 === 0, lit("application/pdf"))
          .otherwise(lit("text/html")),
        payload)
      .as[(String, String, String, Array[Byte])]
    val hp = new org.apache.hadoop.fs.Path(Q144Dir)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(hp, true)
    val nSeg = math.max(8, s.sparkContext.defaultParallelism)
    graft.io.Warc.writeWarcGz(rows.repartition(nSeg), Q144Dir, wireVariants = true)
    val sniffed = graft.io.Warc.responses(graft.io.Warc.readWarc(s, Q144Dir))
      .where(col("http_status") === 200 &&
             col("http_content_type").startsWith("text/html"))
      .select(
        regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
        explode(array(gb.column(graft.fn.CharsetSniff(
          gb.expression(col("payload")))))).as("__c"))
      .filter(col("__c").isNotNull)
      .select(col("doc_id"), col("__c.charset").as("charset"),
        Queries13.htmlTextCol(col("__c.text")).as("text_out"))
    val p = gb.column(graft.fn.TextProfile(gb.expression(col("text_out"))))
    sniffed.select(col("doc_id"), col("charset"), col("text_out"),
        explode(array(p)).as("__p"))
      .filter(col("__p").isNotNull)
      .select(col("doc_id"), col("charset"), col("text_out"),
        col("__p.n_tokens").as("n_tokens"),
        col("__p.lang_id").as("lang_id"),
        round(col("__p.quality"), 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  // the oracle never reads the WARC files or the bytes: the 1252
  // plant re-enters the SHARED synth template as its decoded string
  private val q144Sql =
    s"""WITH kept AS (SELECT * FROM documents WHERE doc_id % 13 <> 0),
       |esc AS (
       |  SELECT doc_id, lang, source,
       |    CASE WHEN doc_id % 4 = 2
       |      THEN 'quote “q' || doc_id || '” price €' || (doc_id % 90)
       |      ELSE text
       |    END AS text
       |  FROM kept
       |),
       |${Queries13.synthSqlOver("esc")},
       |${Queries13.extractSql},
       |${TextProfileSql.ctes("ext", "doc_id", "text_out")},
       |prof AS (
       |${TextProfileSql.select("doc_id")}
       |)
       |SELECT e.doc_id,
       |  CASE WHEN e.doc_id % 4 = 2 THEN 'windows-1252'
       |       WHEN e.doc_id % 4 = 3 THEN 'utf-16le'
       |       ELSE 'utf-8' END AS charset,
       |  e.text_out, p.n_tokens, p.lang_id, p.quality
       |FROM ext e JOIN prof p USING (doc_id)
       |ORDER BY e.doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q129b_percent_norm" -> (q129b _),
    "q131x_html_full_xx" -> (q131x _),
    "q136_wet_extract" -> (q136 _),
    "q137_mp3_sideinfo" -> (q137 _),
    "q138_ogg_meta" -> (q138 _),
    "q139_vorbis_books" -> (q139 _),
    "q140_vorbis_setup" -> (q140 _),
    "q141_vorbis_decode" -> (q141 _),
    "q142_audio_mixed" -> (q142 _),
    "q143_charset_sniff" -> (q143 _),
    "q144_warc_charset_chain" -> (q144 _))

  val oracles: Map[String, String] = Map(
    // q131x: no oracle — numeric-ref decode is not SQL-expressible
    // (HtmlSpec fuzz parity is its gate), rows-only by the xx convention
    "q129b_percent_norm" -> q129bSql,
    "q136_wet_extract" -> q136Sql,
    "q137_mp3_sideinfo" -> q137Sql,
    "q138_ogg_meta" -> q138Sql,
    "q139_vorbis_books" -> q139Sql,
    "q140_vorbis_setup" -> q140Sql,
    "q141_vorbis_decode" -> q141Sql,
    "q142_audio_mixed" -> q142Sql,
    "q143_charset_sniff" -> q143Sql,
    "q144_warc_charset_chain" -> q144Sql)
}
