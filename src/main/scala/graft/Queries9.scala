package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Corpus, Sketches, VecStats}

/** Oracle corpus, batch 9 (round 7): embedding second-moment
  * statistics (q113 — the single-aggregate covariance pass PCA
  * whitening builds on), the deterministic hash split (q114 —
  * train/val/test assignment an external engine can replay from SQL),
  * and the bounded-state cardinality/frequency sketches (q115 HLL
  * distinct with its xx production twin, q116 count-min point
  * frequencies).
  * Same contract as batches 3-8: Spark runs the library operator,
  * DuckDB recomputes from first principles, equality IS the claim.
  * Whitening itself (eigenvectors) is not SQL-expressible — its
  * correctness lives in VecStatsSpec (identity-covariance law,
  * eigen reconstruction, sign determinism); the covariance input it
  * consumes is what q113 hash-gates.
  */
object Queries9 extends ColumnSyntax {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.tbl(s, dir, name)

  // ---------------------------- q113: embedding covariance matrix
  /** Population covariance of the embedding table, upper triangle as
    * (i, j, cov) rows. The Spark side runs [[VecStats.meanCovariance]]
    * — ONE aggregate pass, d(d+1)/2 packed per-row products reduced
    * with map-side partials, driver gets a dim-sized summary — and
    * emits the matrix from driver state; the oracle recomputes every
    * cell the exhaustive way (position self-join + AVG algebra).
    * Equality is the operator's correctness claim; round(6) absorbs
    * the engines' summation-order ulp (the q34/q35 convention).
    */
  private def q113(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(transform($"embedding", _.cast("double")).as("v"))
    val (_, _, cov) = VecStats.meanCovariance(emb, $"v")
    val rows = for {
      i <- cov.indices
      j <- i until cov.length
      // + 0.0 canonicalizes IEEE signed zero: a cell that rounds to
      // -0.0 here vs +0.0 in the oracle compares == but hash-differs.
      r = BigDecimal(cov(i)(j)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    } yield (i, j, r + 0.0)
    import s.implicits.{localSeqToDatasetHolder, newProductEncoder}
    rows.toDF("i", "j", "cov").orderBy(col("i"), col("j"))
  }

  private val q113Sql =
    """WITH pos AS (
      |  SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) AS x
      |  FROM embeddings, UNNEST(range(0, len(embedding))) AS t(i)
      |), stats AS (
      |  SELECT a.i AS i, b.i AS j,
      |    AVG(a.x * b.x) - AVG(a.x) * AVG(b.x) AS cov
      |  FROM pos a JOIN pos b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY a.i, b.i
      |)
      |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
      |  ROUND(cov, 6) + 0 AS cov
      |FROM stats ORDER BY i, j""".stripMargin

  // ---------------------------- q114: deterministic hash split
  /** 8/1/1 train/val/test assignment via the portable md5 order hash
    * ([[Corpus.hashSplit]]); the oracle recomputes membership from
    * the same md5 arithmetic — the property that makes the split
    * auditable by any engine, which is the operator's whole point.
    */
  private def q114(s: SparkSession, dir: String): DataFrame =
    Corpus.hashSplit(t(s, dir, "documents"), $"doc_id")
      .groupBy($"source", $"split")
      .agg(count(lit(1)).as("n_docs"),
        min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
      .orderBy($"source", $"split")

  private val q114Sql =
    """WITH s AS (
      |  SELECT source, doc_id,
      |    CAST(CONCAT('0x', SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 AS m
      |  FROM documents
      |)
      |SELECT source,
      |  CASE WHEN m < 8 THEN 'train' WHEN m = 8 THEN 'val' ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM s GROUP BY source, split
      |ORDER BY source, split""".stripMargin

  // ---------------------------- q115: HyperLogLog distinct users
  /** Per-event-type approximate distinct-user count via the native
    * HLL aggregate ([[Sketches.hllDistinct]], p = 9 → 512 B of state
    * per group) alongside the exact count — the oracle recomputes the
    * REGISTERS (bucket / ρ / max) and the harmonic-mean estimate with
    * its linear-counting branch from the same md5 hash in plain SQL,
    * so the whole sketch algorithm is cross-engine-verified, not just
    * its answer's plausibility. At sf0.01 (150 users/type) the
    * linear-counting branch decides; at sf0.1 (1500) the raw
    * harmonic branch does — the driver gate and the bench sweep
    * between them exercise BOTH corrections.
    */
  private val HllP = 9
  private val HllM = 1 << HllP

  private def q115(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy($"event_type")
      .agg(Sketches.hllDistinct($"user_id", HllP).as("hll_users"),
        countDistinct($"user_id").as("exact_users"))
      .orderBy($"event_type")

  private def q115x(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy($"event_type")
      .agg(Sketches.hllDistinct($"user_id", HllP, xx = true).as("hll_users"),
        countDistinct($"user_id").as("exact_users"))
      .orderBy($"event_type")

  /** ρ over the (60 − p)-bit hash suffix as a generated CASE — SQL
    * has no leading-zeros builtin, and a log2-based form would risk
    * float error exactly at powers of two; the explicit thresholds
    * are the deterministic spelling.
    */
  private val q115Sql: String = {
    val wbits = 60 - HllP
    val rhoCase = (1 to wbits)
      .map(r => s"WHEN w >= ${1L << (wbits - r)} THEN $r")
      .mkString("CASE ", " ", s" ELSE ${wbits + 1} END")
    s"""WITH h AS (
       |  SELECT event_type, user_id,
       |    CAST(CONCAT('0x', SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
       |  FROM events
       |), br AS (
       |  SELECT event_type, hv % $HllM AS bucket, MAX($rhoCase) AS rho
       |  FROM (SELECT event_type, hv, hv // $HllM AS w FROM h)
       |  GROUP BY event_type, bucket
       |), s AS (
       |  SELECT event_type,
       |    SUM(POWER(2.0, -rho)) + ($HllM - COUNT(*)) AS denom,
       |    $HllM - COUNT(*) AS zeros
       |  FROM br GROUP BY event_type
       |), est AS (
       |  SELECT event_type,
       |    0.7213 / (1.0 + 1.079 / $HllM) * $HllM * $HllM / denom AS raw, zeros
       |  FROM s
       |), ex AS (
       |  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users FROM events
       |  GROUP BY event_type
       |)
       |SELECT est.event_type,
       |  CASE WHEN raw <= ${2.5 * HllM} AND zeros > 0
       |       THEN $HllM * LN($HllM.0 / zeros) ELSE raw END AS hll_users,
       |  ex.exact_users
       |FROM est JOIN ex ON est.event_type = ex.event_type
       |ORDER BY est.event_type""".stripMargin
  }

  // ---------------------------- q116: count-min frequency estimates
  /** Token frequencies for the probe set (tokens of doc_id < 3)
    * estimated from a 4×1024 count-min sketch of the whole corpus
    * ([[Sketches.cmsSketch]]). The corpus collapses to ≤ 4096
    * counter rows in one map-combined shuffle; probes then join the
    * BROADCAST sketch — at 100 TB the stream is read once however
    * many point queries follow. The oracle rebuilds every counter
    * and re-derives each estimate (min over rows of the hashed cell)
    * from the same md5 arithmetic.
    */
  private val CmsDepth = 4
  private val CmsWidth = 1024

  private def q116(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val toks = docs.select(explode(split($"text", " ")).as("tok"))
      .where($"tok" =!= "")
    val sketch = Sketches.cmsSketch(toks, $"tok", CmsDepth, CmsWidth)
    val probes = docs.where($"doc_id" < 3)
      .select(explode(split($"text", " ")).as("tok"))
      .where($"tok" =!= "").distinct()
    Sketches.cmsEstimate(sketch, probes, $"tok", CmsDepth, CmsWidth)
      .orderBy($"item")
  }

  private val q116Sql =
    s"""WITH toks AS (
       |  SELECT u.tok AS tok
       |  FROM (SELECT string_split(text, ' ') AS ts FROM documents), UNNEST(ts) AS u(tok)
       |  WHERE u.tok <> ''
       |), cells AS (
       |  SELECT d.r AS r,
       |    CAST(CONCAT('0x', SUBSTR(md5(CONCAT(CAST(d.r AS VARCHAR), '#', tok)), 1, 15)) AS BIGINT) % $CmsWidth AS c,
       |    COUNT(*) AS cnt
       |  FROM toks, UNNEST([0, 1, 2, 3]) AS d(r)
       |  GROUP BY 1, 2
       |), probes AS (
       |  SELECT DISTINCT u.tok AS item
       |  FROM (SELECT string_split(text, ' ') AS ts FROM documents WHERE doc_id < 3), UNNEST(ts) AS u(tok)
       |  WHERE u.tok <> ''
       |), pc AS (
       |  SELECT p.item, d.r AS r,
       |    CAST(CONCAT('0x', SUBSTR(md5(CONCAT(CAST(d.r AS VARCHAR), '#', p.item)), 1, 15)) AS BIGINT) % $CmsWidth AS c
       |  FROM probes p, UNNEST([0, 1, 2, 3]) AS d(r)
       |)
       |SELECT pc.item, MIN(COALESCE(cells.cnt, 0)) AS cms_est
       |FROM pc LEFT JOIN cells ON cells.r = pc.r AND cells.c = pc.c
       |GROUP BY pc.item ORDER BY pc.item""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_embed_cov" -> (q113 _),
    "q114_hash_split" -> (q114 _),
    "q115_hll_distinct" -> (q115 _),
    "q115x_hll_distinct_xx" -> (q115x _),
    "q116_cms_freq" -> (q116 _))

  val oracles: Map[String, String] = Map(
    "q113_embed_cov" -> q113Sql,
    "q114_hash_split" -> q114Sql,
    "q115_hll_distinct" -> q115Sql,
    // q115x: xxhash64 production twin — rows-only by the q82x/q104x
    // contract (DuckDB cannot reproduce xxhash64); the md5 twin above
    // hash-gates the identical register/estimate algorithm
    "q116_cms_freq" -> q116Sql)

}
