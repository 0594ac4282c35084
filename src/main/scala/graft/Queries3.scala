package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, SimJoin}

/** Oracle corpus, batch 3: the ext/ LLM-pipeline modules exercised
  * end-to-end with DuckDB parity — LSH banding (q66), the full
  * near-dup pipeline (q67), SimHash fingerprints (q68). All hashing is
  * md5-based ([[Dedup.Md5Hasher]]) so both engines compute
  * byte-identical values; the production paths use xxhash64 and are
  * covered by DedupSpec.
  */
object Queries3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Shared config for q66/q67: word 3-gram shingles, k=8 minhashes,
    * b=4 bands × r=2. On this corpus every near-dup pair (J≥0.9) lands
    * in a shared bucket deterministically — both engines compute the
    * same hashes, so the differential test is exact, not probabilistic.
    */
  private val N = 3
  private val K = 8
  private val B = 4

  /** DuckDB CTEs mirroring Dedup.shingles (3-gram) + md5 minhash +
    * banding. RANGE(1, L-1) yields 1-based shingle starts 1..L-2.
    */
  private val shinglesCte =
    """arr AS (
      |  SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS a
      |  FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, a[i] || ' ' || a[i+1] || ' ' || a[i+2] AS shingle
      |  FROM arr, UNNEST(RANGE(1, LENGTH(a) - 1)) AS t(i)
      |  WHERE LENGTH(a) >= 3
      |)""".stripMargin

  private val minhashCte =
    """m AS (
      |  SELECT doc_id,
      |    MIN(md5('0:' || shingle)) AS h0, MIN(md5('1:' || shingle)) AS h1,
      |    MIN(md5('2:' || shingle)) AS h2, MIN(md5('3:' || shingle)) AS h3,
      |    MIN(md5('4:' || shingle)) AS h4, MIN(md5('5:' || shingle)) AS h5,
      |    MIN(md5('6:' || shingle)) AS h6, MIN(md5('7:' || shingle)) AS h7
      |  FROM sh GROUP BY doc_id
      |), bands AS (
      |  SELECT doc_id, band, band_hash FROM (
      |    SELECT doc_id, UNNEST([0, 1, 2, 3]) AS band,
      |      UNNEST([md5(h0 || '|' || h1), md5(h2 || '|' || h3),
      |              md5(h4 || '|' || h5), md5(h6 || '|' || h7)]) AS band_hash
      |    FROM m)
      |)""".stripMargin

  /** The LSH band table of the near-dup pipeline: one bucket key per
    * (doc, band). This is the structure the candidate join groups on.
    */
  private def q66(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingles(t(s, dir, "documents"), "doc_id", "text", N)
    val sigs = Dedup.minhashSignatures(sh, "doc_id", K, Dedup.Md5Hasher)
    Dedup.lshBands(sigs, "doc_id", K, B, Dedup.Md5Hasher)
      .orderBy($"doc_id", $"band")
  }

  private val q66Sql =
    s"""WITH $shinglesCte, $minhashCte
       |SELECT doc_id, band, band_hash FROM bands ORDER BY doc_id, band""".stripMargin

  /** The full scalable near-dup pipeline: LSH candidates → exact
    * Jaccard verify at 0.9 — finds the corpus's 25 planted near-dup
    * pairs with an equi-join-only plan (DedupSpec asserts no
    * CartesianProduct / BroadcastNestedLoopJoin).
    */
  private def q67(s: SparkSession, dir: String): DataFrame =
    Dedup.nearDupPairs(t(s, dir, "documents"), "doc_id", "text",
        n = N, k = K, b = B, minJaccard = 0.9, hasher = Dedup.Md5Hasher)
      .select($"a_id", $"b_id", round($"jaccard", 6).as("jaccard"))
      .orderBy($"a_id", $"b_id")

  private val q67Sql =
    s"""WITH $shinglesCte, $minhashCte, cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
       |), sizes AS (
       |  SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
       |), inter AS (
       |  SELECT c.a_id, c.b_id, COUNT(*) AS n
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.a_id
       |  JOIN sh sb ON sb.doc_id = c.b_id AND sb.shingle = sa.shingle
       |  GROUP BY 1, 2
       |)
       |SELECT i.a_id, i.b_id,
       |  ROUND(CAST(i.n AS DOUBLE) / (sa.sz + sb.sz - i.n), 6) AS jaccard
       |FROM inter i
       |JOIN sizes sa ON sa.doc_id = i.a_id
       |JOIN sizes sb ON sb.doc_id = i.b_id
       |WHERE CAST(i.n AS DOUBLE) / (sa.sz + sb.sz - i.n) >= 0.9
       |ORDER BY a_id, b_id""".stripMargin

  /** 32-bit SimHash document fingerprint with cross-engine parity: bit
    * j of the fingerprint is the majority vote over the doc's distinct
    * tokens of bit j of a 32-bit md5-derived hash (hex digit j's high
    * bit: digit >= '8'). 32 sum-aggregate columns, one pass, no row
    * explosion — same shape as the 64-bit xxhash64 production
    * fingerprint (Dedup.simhash64, DedupSpec-covered).
    */
  private def q68(s: SparkSession, dir: String): DataFrame = {
    val toks = Dedup.shingles(t(s, dir, "documents"), "doc_id", "text", n = 1)
    val h = md5($"shingle")
    val votes = (0 until 32).map { j =>
      sum(when(substring(h, j + 1, 1) >= "8", 1).otherwise(-1)).as(s"v$j")
    }
    toks.groupBy($"doc_id")
      .agg(votes.head, votes.tail: _*)
      .select($"doc_id",
        (0 until 32).map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce((a, b) => a + b).as("simhash"))
      .orderBy($"doc_id")
  }

  private val q68Sql = {
    val votes = (0 until 32).map { j =>
      s"SUM(CASE WHEN SUBSTR(md5(tok), ${j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS v$j"
    }.mkString(",\n    ")
    val assemble = (0 until 32).map { j =>
      s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH toks AS (
       |  SELECT DISTINCT doc_id, tok FROM (
       |    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents)
       |  WHERE tok <> ''
       |), v AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM toks GROUP BY doc_id
       |)
       |SELECT doc_id, CAST($assemble AS BIGINT) AS simhash
       |FROM v ORDER BY doc_id""".stripMargin
  }

  /** q73 ANN config: 16 deterministic Rademacher planes, 8 bands × 2
    * bits. On this weakly-clustered corpus (true top-5 cosines ≈
    * 0.3-0.4 → per-bit agreement ≈ 0.6) the expected per-neighbor
    * recall is 1-(1-0.6²)⁸ ≈ 0.97; SimJoinSpec measures it against the
    * q70 brute-force ground truth. Plane signs are JVM md5 constants —
    * the DuckDB oracle embeds the SAME literals, so both engines
    * compute identical buckets and the differential test is exact.
    */
  private val AnnPlanes = SimJoin.planes(nPlanes = 16, dim = 64)
  private val AnnBands = 8

  private def q73(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val queries = emb.filter($"vec_id" < 5)
    SimJoin.annTopK(emb, queries, "vec_id", "v", k = 5, AnnPlanes, AnnBands)
      .select($"q_id", $"rk", $"vec_id", round($"cos_sim", 6).as("cos_sim"))
      .orderBy($"q_id", $"rk")
  }

  private val q73Sql = {
    def planeLit(p: Seq[Double]): String =
      p.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
    val bitDefs = AnnPlanes.zipWithIndex.map { case (p, i) =>
      s"CASE WHEN LIST_DOT_PRODUCT(v, ${planeLit(p)}) >= 0 THEN 1 ELSE 0 END AS bit$i"
    }.mkString(",\n    ")
    val codes = (0 until AnnBands).map(bi => s"bit${2 * bi} + 2 * bit${2 * bi + 1}")
      .mkString("[", ", ", "]")
    val bands = (0 until AnnBands).mkString("[", ", ", "]")
    s"""WITH e AS (
       |  SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings
       |), bits AS (
       |  SELECT vec_id,
       |    $bitDefs
       |  FROM e
       |), bkt AS (
       |  SELECT vec_id, band, code FROM (
       |    SELECT vec_id, UNNEST($bands) AS band, UNNEST($codes) AS code FROM bits)
       |), qb AS (
       |  SELECT vec_id AS q_id, band, code FROM bkt WHERE vec_id < 5
       |), cand AS (
       |  SELECT DISTINCT qb.q_id, c.vec_id
       |  FROM bkt c JOIN qb ON c.band = qb.band AND c.code = qb.code AND c.vec_id <> qb.q_id
       |), scored AS (
       |  SELECT cand.q_id, cand.vec_id,
       |    LIST_DOT_PRODUCT(qv.v, cv.v) /
       |      (SQRT(LIST_DOT_PRODUCT(qv.v, qv.v)) * SQRT(LIST_DOT_PRODUCT(cv.v, cv.v))) AS cos
       |  FROM cand
       |  JOIN e cv ON cv.vec_id = cand.vec_id
       |  JOIN e qv ON qv.vec_id = cand.q_id
       |), ranked AS (
       |  SELECT q_id, vec_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
       |  FROM scored
       |)
       |SELECT q_id, rk, vec_id, ROUND(cos, 6) AS cos_sim
       |FROM ranked WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin
  }

  // ------------------------------------------------------- registry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_lsh_bands" -> (q66 _),
    "q67_neardup_pairs" -> (q67 _),
    "q68_simhash" -> (q68 _),
    "q73_ann_topk" -> (q73 _)
  )

  val oracles: Map[String, String] = Map(
    "q66_lsh_bands" -> q66Sql,
    "q67_neardup_pairs" -> q67Sql,
    "q68_simhash" -> q68Sql,
    "q73_ann_topk" -> q73Sql
  )

  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
