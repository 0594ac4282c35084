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
object Queries10 extends ColumnSyntax {

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
      // always-true predicate on a COMPUTED column: without it the
      // bench's count() legitimately left-join-eliminates the entire
      // strip (unique-keyed spans side, no columns consumed) and
      // times an empty plan — the oracle carries the same WHERE
      .where($"removed" >= 0)
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
       |WHERE len(d.text) - CASE WHEN sp.doc_id IS NULL THEN len(d.text)
       |                         ELSE COALESCE(len(r.ct), 0) END >= 0
       |ORDER BY d.doc_id""".stripMargin

  // --------------------------- q119: trigram Stupid Backoff score
  /** Trigram Stupid Backoff fluency score (Brants et al. 2007) under
    * the corpus's own counts ([[graft.ext.LangModel
    * .scoreStupidBackoff]]): training is three n-gram-distinct
    * shuffles, scoring the narrow broadcast kernel over the graded
    * doc_id slice. The oracle rebuilds positions with two-token
    * history and folds the identical backoff cascade (same division
    * order, same 0.4 factors, same 1/N OOV floor). avg_nls rounded
    * to 6 — the q102/q109 convention.
    */
  private def q119(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.docsPar(s, dir)
    val slice = t(s, dir, "documents").filter($"doc_id" < 300)
    graft.ext.LangModel.scoreStupidBackoff(slice, "doc_id", "text",
        graft.ext.LangModel.unigramCounts(docs, "text"),
        graft.ext.LangModel.bigramCounts(docs, "text"),
        graft.ext.LangModel.trigramCounts(docs, "text"))
      .select($"doc_id", $"n_toks", round($"avg_nls", 6).as("avg_nls"))
      .orderBy($"doc_id")
  }

  private val q119Sql =
    """WITH d AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents
      |), pos AS (
      |  SELECT doc_id, i, toks[i + 1] AS tok,
      |    CASE WHEN i >= 1 THEN toks[i] END AS p1,
      |    CASE WHEN i >= 2 THEN toks[i - 1] END AS p2
      |  FROM d, UNNEST(range(0, len(toks))) AS t(i)
      |), uni AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM pos GROUP BY tok
      |), tot AS (
      |  SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM uni
      |), bi AS (
      |  SELECT p1, tok, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM pos WHERE p1 IS NOT NULL GROUP BY 1, 2
      |), tri AS (
      |  SELECT p2, p1, tok, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM pos WHERE p2 IS NOT NULL GROUP BY 1, 2, 3
      |), scored AS (
      |  SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
      |    SUM(-LN(
      |      CASE WHEN p.p1 IS NULL THEN CAST(u.cnt AS DOUBLE) / tot.n
      |           WHEN p.p2 IS NULL THEN
      |             CASE WHEN b.cnt IS NOT NULL
      |                  THEN CAST(b.cnt AS DOUBLE) / CAST(up.cnt AS DOUBLE)
      |                  ELSE 0.4 * (CAST(u.cnt AS DOUBLE) / tot.n) END
      |           ELSE
      |             CASE WHEN t3.cnt IS NOT NULL
      |                  THEN CAST(t3.cnt AS DOUBLE) / CAST(bp.cnt AS DOUBLE)
      |                  ELSE 0.4 * (CASE WHEN b.cnt IS NOT NULL
      |                    THEN CAST(b.cnt AS DOUBLE) / CAST(up.cnt AS DOUBLE)
      |                    ELSE 0.4 * (CAST(u.cnt AS DOUBLE) / tot.n) END) END
      |      END)) / COUNT(*) AS avg_nls
      |  FROM pos p
      |  JOIN uni u ON u.tok = p.tok
      |  CROSS JOIN tot
      |  LEFT JOIN uni up ON up.tok = p.p1
      |  LEFT JOIN bi b ON b.p1 = p.p1 AND b.tok = p.tok
      |  LEFT JOIN bi bp ON bp.p1 = p.p2 AND bp.tok = p.p1
      |  LEFT JOIN tri t3 ON t3.p2 = p.p2 AND t3.p1 = p.p1 AND t3.tok = p.tok
      |  WHERE p.doc_id < 300
      |  GROUP BY p.doc_id
      |)
      |SELECT doc_id, n_toks, ROUND(avg_nls, 6) AS avg_nls
      |FROM scored ORDER BY doc_id""".stripMargin

  // --------------------- q120: deterministic sample-quantile sketch
  /** Per-returnflag price quantiles from the bounded bottom-k row
    * sample ([[graft.ext.Sketches.sampleQuantiles]], k = 256 —
    * small enough that every group at every SF genuinely sketches)
    * next to the exact percentile for context. The oracle replays
    * the SKETCH, not just its answer: same md5 row-order-hash, same
    * rank ≤ k retention, same ⌈q·m⌉ sample indexing — the q115-HLL
    * contract applied to the quantile family.
    */
  private val SqK = 256
  private val SqQs = Seq(0.25, 0.5, 0.75, 0.95)

  private def q120(s: SparkSession, dir: String, xx: Boolean): DataFrame = {
    val li = t(s, dir, "lineitem")
    val rowKey = concat($"l_orderkey", lit("-"), $"l_linenumber")
    val est = graft.ext.Sketches.sampleQuantiles(rowKey, $"l_extendedprice",
      SqK, SqQs, xx)
    li.groupBy($"l_returnflag")
      .agg(est.as("__q"),
        count(lit(1)).as("n_rows"))
      .select($"l_returnflag",
        round(element_at($"__q", 1), 6).as("p25"),
        round(element_at($"__q", 2), 6).as("p50"),
        round(element_at($"__q", 3), 6).as("p75"),
        round(element_at($"__q", 4), 6).as("p95"),
        $"n_rows")
      .orderBy($"l_returnflag")
  }

  private val q120Sql =
    s"""WITH hashed AS (
       |  SELECT l_returnflag,
       |    CAST(CONCAT('0x', SUBSTR(md5(CONCAT(CAST(l_orderkey AS VARCHAR), '-',
       |      CAST(l_linenumber AS VARCHAR))), 1, 15)) AS BIGINT) AS h,
       |    CAST(l_extendedprice AS DOUBLE) AS v
       |  FROM lineitem
       |), ranked AS (
       |  SELECT l_returnflag, v,
       |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h, v) AS rk
       |  FROM hashed
       |), samp AS (
       |  SELECT l_returnflag, v FROM ranked WHERE rk <= $SqK
       |), svals AS (
       |  SELECT l_returnflag, v,
       |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY v) AS vr,
       |    COUNT(*) OVER (PARTITION BY l_returnflag) AS m
       |  FROM samp
       |), est AS (
       |  SELECT l_returnflag,
       |    MAX(CASE WHEN vr = GREATEST(1, CAST(CEIL(0.25 * m) AS BIGINT)) THEN v END) AS p25,
       |    MAX(CASE WHEN vr = GREATEST(1, CAST(CEIL(0.50 * m) AS BIGINT)) THEN v END) AS p50,
       |    MAX(CASE WHEN vr = GREATEST(1, CAST(CEIL(0.75 * m) AS BIGINT)) THEN v END) AS p75,
       |    MAX(CASE WHEN vr = GREATEST(1, CAST(CEIL(0.95 * m) AS BIGINT)) THEN v END) AS p95
       |  FROM svals GROUP BY l_returnflag
       |), n AS (
       |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows
       |  FROM lineitem GROUP BY l_returnflag
       |)
       |SELECT est.l_returnflag, ROUND(p25, 6) AS p25, ROUND(p50, 6) AS p50,
       |  ROUND(p75, 6) AS p75, ROUND(p95, 6) AS p95, n.n_rows
       |FROM est JOIN n ON n.l_returnflag = est.l_returnflag
       |ORDER BY est.l_returnflag""".stripMargin

  // ------------------------- q121: BPE TRAINING, oracle-replayed
  /** The last no-oracle contract closed: q107's merge-rule TRAINING
    * — "not SQL-expressible" since round 5 — replayed in a DuckDB
    * recursive CTE. The key: the trainer's batched merge pass is
    * EQUIVALENT to sequentially merging the leftmost occurrence until
    * none remain (a merged seg can never re-form the pair), so the
    * recursion carries (word, freq, segs, current-pair, history) rows
    * and alternates two phases — apply one leftmost occurrence per
    * word while ANY word still has the current pair (EXISTS over the
    * working table), else pick the next argmax pair (same max-count /
    * lexicographic-tie rule, via an aggregate subquery over the
    * working table). Output = the learned merge table itself,
    * (rank, l, r), numMerges = 100 — the exact table q107 trains.
    * History uses ASCII unit/record separators (chr 31/30) — tokens
    * cannot contain spaces (the seg separator) and the corpus is
    * ASCII text (the q112 BMP caveat applies).
    */
  private val BpeTrainMerges = 100

  private def q121(s: SparkSession, dir: String): DataFrame = {
    val merges = graft.ext.Bpe.trainOn(Tables.docsPar(s, dir), "text",
      BpeTrainMerges)
    import s.implicits.{localSeqToDatasetHolder, newProductEncoder}
    merges.zipWithIndex
      .map { case ((l, r), i) => ((i + 1).toLong, l, r) }
      .toDF("rank", "l", "r")
      .orderBy($"rank")
  }

  private val q121Sql =
    s"""WITH RECURSIVE wc AS (
       |  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents) t
       |  WHERE tok <> '' GROUP BY tok
       |), rec AS (
       |  SELECT word, freq,
       |    list_transform(range(1, length(word) + 1), i -> word[i]) AS segs,
       |    CAST(NULL AS VARCHAR) AS cl, CAST(NULL AS VARCHAR) AS cr,
       |    '' AS hist, 0 AS nm, 0 AS it
       |  FROM wc WHERE word <> '' AND freq > 0
       |  UNION ALL
       |  SELECT word, freq,
       |    CASE WHEN has_occ AND pos IS NOT NULL THEN
       |      segs[1:pos - 1] || [cl || cr] || segs[pos + 2:len(segs)]
       |    ELSE segs END AS segs,
       |    CASE WHEN has_occ THEN cl ELSE bl END AS cl,
       |    CASE WHEN has_occ THEN cr ELSE br END AS cr,
       |    CASE WHEN has_occ THEN hist
       |         ELSE hist || bl || chr(31) || br || chr(30) END AS hist,
       |    CASE WHEN has_occ THEN nm ELSE nm + 1 END AS nm,
       |    it + 1 AS it
       |  FROM (
       |    SELECT r.*,
       |      (cl IS NOT NULL AND EXISTS (
       |        SELECT 1 FROM rec r2, UNNEST(range(1, len(r2.segs))) AS u(i)
       |        WHERE r2.segs[i] = r.cl AND r2.segs[i + 1] = r.cr)) AS has_occ,
       |      list_min(list_filter(list_transform(range(1, len(r.segs)),
       |        p -> CASE WHEN r.segs[p] = r.cl AND r.segs[p + 1] = r.cr THEN p END),
       |        x -> x IS NOT NULL)) AS pos,
       |      (SELECT {'l': l, 'r': r} FROM (
       |         SELECT r3.segs[i] AS l, r3.segs[i + 1] AS r, SUM(r3.freq) AS c
       |         FROM rec r3, UNNEST(range(1, len(r3.segs))) AS u(i)
       |         GROUP BY 1, 2)
       |       ORDER BY c DESC, l, r LIMIT 1).l AS bl,
       |      (SELECT {'l': l, 'r': r} FROM (
       |         SELECT r3.segs[i] AS l, r3.segs[i + 1] AS r, SUM(r3.freq) AS c
       |         FROM rec r3, UNNEST(range(1, len(r3.segs))) AS u(i)
       |         GROUP BY 1, 2)
       |       ORDER BY c DESC, l, r LIMIT 1).r AS br
       |    FROM rec r) s
       |  WHERE has_occ OR (nm < $BpeTrainMerges AND bl IS NOT NULL)
       |)
       |SELECT CAST(rk AS BIGINT) AS rank,
       |  string_split(ms[CAST(rk AS INT)], chr(31))[1] AS l,
       |  string_split(ms[CAST(rk AS INT)], chr(31))[2] AS r
       |FROM (
       |  SELECT string_split(rtrim(hist, chr(30)), chr(30)) AS ms
       |  FROM rec ORDER BY it DESC, word LIMIT 1
       |), UNNEST(range(1, len(ms) + 1)) AS t(rk)
       |ORDER BY rank""".stripMargin

  // --------------------- q122: deterministic weighted sampling (A-ES)
  /** Per-source weighted sample (k = 10, weight = n_chars —
    * length-proportional selection, the quality-weighted mixing
    * primitive) via [[graft.ext.Sketches.weightedBottomK]]. The
    * oracle recomputes the exact Efraimidis–Spirakis key
    * (−ln((h+0.5)/2⁶⁰)/w from the same md5 hash) and the same
    * rank — membership AND order compared.
    */
  private val WsK = 10

  private def q122(s: SparkSession, dir: String): DataFrame =
    graft.ext.Sketches.weightedBottomK(t(s, dir, "documents"),
        Seq("source"), $"doc_id".cast("string"), $"n_chars", WsK)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_sampled"),
        sum($"n_chars").as("sampled_chars"),
        min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
      .orderBy($"source")

  private val q122Sql =
    s"""WITH keyed AS (
       |  SELECT source, doc_id, n_chars,
       |    -LN((CAST(CAST(CONCAT('0x', SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE) + 0.5)
       |        / POWER(2.0, 60)) / CAST(n_chars AS DOUBLE) AS k
       |  FROM documents WHERE n_chars > 0
       |), ranked AS (
       |  SELECT source, doc_id, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY k, CAST(doc_id AS VARCHAR)) AS rn
       |  FROM keyed
       |)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
       |  CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
       |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
       |FROM ranked WHERE rn <= $WsK
       |GROUP BY source ORDER BY source""".stripMargin

  // ---------------- q123: importance resampling (DSIR composition)
  /** Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169) composed from the library's own operators:
    * per-doc importance weight w = exp(avg_nll_raw − avg_nll_target)
    * under two add-1 unigram LMs ([[graft.ext.LangModel.scoreNll]] —
    * target = the doc_id < 50 "domain" slice, raw = the full corpus),
    * then a deterministic A-ES weighted sample of k per source
    * ([[graft.ext.Sketches.weightedBottomK]]). The oracle recomputes
    * BOTH language models, both per-doc scores, the exact weight and
    * sampling key, and the final ranks — the q100/q108 composition
    * claim extended to the importance-sampling family.
    */
  private val DsirK = 15

  private def q123(s: SparkSession, dir: String): DataFrame = {
    import graft.ext.{LangModel, Sketches}
    val docs = Tables.docsPar(s, dir)
    val target = docs.filter($"doc_id" < 50)
    val raw = LangModel.scoreNll(docs, "doc_id", "text",
        LangModel.unigramCounts(docs, "text"))
      .select($"doc_id", $"avg_nll".as("__raw"))
    val tgt = LangModel.scoreNll(docs, "doc_id", "text",
        LangModel.unigramCounts(target, "text"))
      .select($"doc_id", $"avg_nll".as("__tgt"))
    val weighted = t(s, dir, "documents")
      .join(raw, Seq("doc_id"))
      .join(tgt, Seq("doc_id"))
      .withColumn("__w", exp($"__raw" - $"__tgt"))
    Sketches.weightedBottomK(weighted, Seq("source"),
        $"doc_id".cast("string"), $"__w", DsirK)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_sampled"),
        sum($"n_chars").as("sampled_chars"),
        min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
      .orderBy($"source")
  }

  private val q123Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, tok FROM (
       |    SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
       |  WHERE tok <> ''
       |), rc AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok
       |), rt AS (
       |  SELECT CAST(SUM(cnt) AS DOUBLE) AS t, CAST(COUNT(*) AS DOUBLE) AS v FROM rc
       |), tc AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks
       |  WHERE doc_id < 50 GROUP BY tok
       |), tt AS (
       |  SELECT CAST(SUM(cnt) AS DOUBLE) AS t, CAST(COUNT(*) AS DOUBLE) AS v FROM tc
       |), scored AS (
       |  SELECT toks.doc_id,
       |    SUM(-LN((rc.cnt + 1.0) / (rt.t + rt.v))) / COUNT(*) AS raw_nll,
       |    SUM(-LN((COALESCE(tc.cnt, 0) + 1.0) / (tt.t + tt.v))) / COUNT(*) AS tgt_nll
       |  FROM toks
       |  JOIN rc USING (tok)
       |  LEFT JOIN tc USING (tok)
       |  CROSS JOIN rt CROSS JOIN tt
       |  GROUP BY toks.doc_id
       |), keyed AS (
       |  SELECT d.source, d.doc_id, d.n_chars,
       |    -LN((CAST(CAST(CONCAT('0x', SUBSTR(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE) + 0.5)
       |        / POWER(2.0, 60)) / EXP(s.raw_nll - s.tgt_nll) AS k
       |  FROM documents d JOIN scored s ON s.doc_id = d.doc_id
       |), ranked AS (
       |  SELECT source, doc_id, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY k, CAST(doc_id AS VARCHAR)) AS rn
       |  FROM keyed
       |)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
       |  CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
       |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
       |FROM ranked WHERE rn <= $DsirK
       |GROUP BY source ORDER BY source""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q117_dup_spans" -> (q117 _),
    "q117x_dup_spans_xx" -> (q117x _),
    "q118_strip_spans" -> (q118 _),
    "q119_stupid_backoff" -> (q119 _),
    "q120_sample_quantiles" -> ((s: SparkSession, dir: String) => q120(s, dir, xx = false)),
    "q120x_sample_quantiles_xx" -> ((s: SparkSession, dir: String) => q120(s, dir, xx = true)),
    "q121_bpe_train" -> (q121 _),
    "q122_weighted_sample" -> (q122 _),
    "q123_dsir_resample" -> (q123 _))

  val oracles: Map[String, String] = Map(
    "q117_dup_spans" -> q117Sql,
    // q117x: xxhash64 production twin — rows-only (no DuckDB xxhash64)
    "q118_strip_spans" -> q118Sql,
    "q119_stupid_backoff" -> q119Sql,
    // q120x: xxhash64 production twin — rows-only (no DuckDB xxhash64)
    "q120_sample_quantiles" -> q120Sql,
    "q121_bpe_train" -> q121Sql,
    "q122_weighted_sample" -> q122Sql,
    "q123_dsir_resample" -> q123Sql)

}
