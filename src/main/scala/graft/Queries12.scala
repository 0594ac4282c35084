package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle corpus, batch 12 (round 9): audio joins the perceptual
  * dedup family — the last modality (text/image/video already decode
  * for real; audio stopped at [[graft.ext.MediaMeta]] headers until
  * the round-9 [[graft.ext.Flac]] frame decoder).
  *
  * q128 runs the pipeline end-to-end on real FLAC containers the
  * [[graft.ext.Flac]] decoder must decode sample-exactly (Rice-coded
  * fixed-predictor frames from [[graft.ext.AudioFixtures]]) —
  * rows-only by the q84 convention (DuckDB cannot decode FLAC), with
  * the planted-pair self-check column. q128p persists the computed
  * fingerprints and both engines replay the pair stage from the same
  * parquet — the audio twin of q84p/q125p.
  */
object Queries12 extends ColumnSyntax {

  // ------------------- q128: audio near-dup over decoded FLAC PCM
  private def q128Assets(s: SparkSession): DataFrame = {
    val originals = (0 until 60).map(i =>
      (i.toLong, graft.ext.AudioFixtures.toneClip(i, nSamples = 8192)))
    val copies = (0 until 12).map(i =>
      (i + 1000L, graft.ext.AudioFixtures.toneClip(i, nSamples = 8192, perturb = true)))
    s.createDataFrame(originals ++ copies).toDF("aud_id", "content")
      .repartition(8)
  }

  private def q128(s: SparkSession, dir: String): DataFrame =
    graft.ext.Audio.nearDupAudioPairs(q128Assets(s), "aud_id", maxHamming = 3)
      .withColumn("planted", ($"b_id" - $"a_id" === 1000L).cast("int"))
      .orderBy($"a_id", $"b_id")

  // ------------- q128p: the audio pair stage under the hash gate
  private val Q128FpFixture = "/tmp/graft_fixtures/q128_audio_fp.parquet"

  private def q128p(s: SparkSession, dir: String): DataFrame = {
    graft.ext.Audio.withFingerprint(q128Assets(s))
      .where($"afp".isNotNull)
      .select($"aud_id".as("id"), $"afp".as("dhash"))
      .coalesce(1)
      .write.mode("overwrite").parquet(Q128FpFixture)
    graft.ext.Images.nearDupPairsFromHashes(
        s.read.parquet(Q128FpFixture), maxHamming = 3)
      .orderBy($"a_id", $"b_id")
  }

  private val q128pSql =
    s"""WITH h AS (
       |  SELECT id, dhash FROM read_parquet('$Q128FpFixture/*.parquet')
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

  // ---------------- q129/q130: web-corpus URL provenance operators
  /** URLs planted deterministically from doc_id (the q127 convention
    * — the synthetic corpus carries none): mixed-case schemes and
    * hosts, default and non-default ports, dot-segment paths,
    * tracking parameters, fragments, a co.uk-style second-level
    * suffix. q129 runs [[graft.ext.WebOps.withNormalizedUrls]] (the
    * `url_normalize` kernel: RFC 3986 remove_dot_segments, default-
    * port strip, tracking-param drop, registered-domain rollup); the
    * oracle re-derives the normalization GENERICALLY in SQL (string
    * ops + iterated dot-segment collapse), not by replaying the
    * plant's case arms. q130 caps each domain at 3 docs through the
    * bounded [[graft.ext.Sketches.bottomKRows]] aggregate — the
    * crawl-mix quota with O(k) state per domain, no per-domain sort.
    */
  private[graft] def plantedUrlCol(d: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val scheme = element_at(
      array(lit("HTTP"), lit("https"), lit("Http"), lit("https")),
      (d % 4 + 1).cast("int"))
    val port = element_at(
      array(lit(":80"), lit(":443"), lit(""), lit(":8443")),
      (d % 4 + 1).cast("int"))
    val suffix = element_at(
      array(lit(".com"), lit(".org"), lit(".co.uk")),
      (d % 3 + 1).cast("int"))
    val hostCore = concat(lit("h"), (d % 5).cast("string"), lit(".site"),
      (d % 23).cast("string"), suffix)
    val hostRaw = when(d % 5 === 0, upper(hostCore)).otherwise(hostCore)
    val path = element_at(
      array(lit("/a/b/../c"), lit("/a/./b"), lit(""), lit("/x/y/z"),
        lit("/a/../"), lit("/p/q/../../r")),
      (d % 6 + 1).cast("int"))
    val query = element_at(
      array(concat(lit("?utm_source=x&id="), d.cast("string")),
        concat(lit("?id="), d.cast("string"), lit("&utm_campaign=z&ref="),
          (d % 9).cast("string")),
        lit("?fbclid=abc"), lit(""),
        concat(lit("?q="), (d % 13).cast("string")),
        concat(lit("?q="), (d % 13).cast("string")),
        concat(lit("?q="), (d % 13).cast("string"))),
      (d % 7 + 1).cast("int"))
    val frag = when(d % 3 === 0,
      concat(lit("#sec"), d.cast("string"))).otherwise(lit(""))
    concat(scheme, lit("://"), hostRaw, port, path, query, frag)
  }

  private def plantedUrls(s: SparkSession, dir: String): DataFrame =
    Tables.docsPar(s, dir).select($"doc_id", plantedUrlCol($"doc_id").as("url"))

  private def q129(s: SparkSession, dir: String): DataFrame =
    graft.ext.WebOps.withNormalizedUrls(plantedUrls(s, dir), "url")
      .select($"doc_id", $"url", $"norm_url", $"host", $"domain")
      .orderBy($"doc_id")

  /** The oracle's GENERIC normalization of a planted url column
    * (shared by q129/q130): scheme/host lowering, default-port strip,
    * fragment drop, iterated dot-segment collapse, tracking-param
    * filter, registered-domain rollup via label lists.
    */
  private[graft] val urlNormCtes =
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
      |), dots AS (
      |  SELECT *, regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |    path0, '/\./', '/', 'g'),
      |    '/[^/.][^/]*/\.\./', '/'), '/[^/.][^/]*/\.\./', '/'),
      |    '/[^/.][^/]*/\.\./', '/') AS path1
      |  FROM pq
      |), qf AS (
      |  SELECT *, array_to_string(list_filter(string_split(query0, '&'),
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

  private[graft] val plantedUrlSql =
    """planted AS (
      |  SELECT doc_id,
      |    ['HTTP','https','Http','https'][(doc_id % 4) + 1] || '://' ||
      |    CASE WHEN doc_id % 5 = 0
      |         THEN upper('h' || (doc_id % 5) || '.site' || (doc_id % 23) ||
      |              ['.com','.org','.co.uk'][(doc_id % 3) + 1])
      |         ELSE 'h' || (doc_id % 5) || '.site' || (doc_id % 23) ||
      |              ['.com','.org','.co.uk'][(doc_id % 3) + 1] END ||
      |    [':80',':443','',':8443'][(doc_id % 4) + 1] ||
      |    ['/a/b/../c','/a/./b','','/x/y/z','/a/../','/p/q/../../r'][(doc_id % 6) + 1] ||
      |    ['?utm_source=x&id=' || doc_id,
      |     '?id=' || doc_id || '&utm_campaign=z&ref=' || (doc_id % 9),
      |     '?fbclid=abc', '',
      |     '?q=' || (doc_id % 13), '?q=' || (doc_id % 13),
      |     '?q=' || (doc_id % 13)][(doc_id % 7) + 1] ||
      |    CASE WHEN doc_id % 3 = 0 THEN '#sec' || doc_id ELSE '' END AS url
      |  FROM documents
      |)""".stripMargin

  private val q129Sql =
    s"""WITH $plantedUrlSql, $urlNormCtes
       |SELECT doc_id, url, norm_url, host, domain
       |FROM norm ORDER BY doc_id""".stripMargin

  private def q130(s: SparkSession, dir: String): DataFrame =
    graft.ext.WebOps.domainQuota(
        graft.ext.WebOps.withNormalizedUrls(plantedUrls(s, dir), "url")
          .select($"doc_id", $"norm_url", $"domain"),
        "domain", $"doc_id", k = 3)
      .orderBy($"domain", $"doc_id")

  private val q130Sql =
    s"""WITH $plantedUrlSql, $urlNormCtes
       |SELECT doc_id, norm_url, domain FROM (
       |  SELECT doc_id, norm_url, domain,
       |    ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
       |  FROM norm)
       |WHERE rn <= 3
       |ORDER BY domain, doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q128_audio_neardup" -> (q128 _),
    "q128p_audio_fp_pairs" -> (q128p _),
    "q129_url_normalize" -> (q129 _),
    "q130_domain_quota" -> (q130 _))

  val oracles: Map[String, String] = Map(
    // q128: no oracle — DuckDB cannot decode FLAC (q84 convention);
    // its pair stage IS hash-gated via q128p's persisted fixture
    "q128p_audio_fp_pairs" -> q128pSql,
    "q129_url_normalize" -> q129Sql,
    "q130_domain_quota" -> q130Sql)
}
