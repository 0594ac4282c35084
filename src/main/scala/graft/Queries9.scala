package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Corpus, VecStats}

/** Oracle corpus, batch 9 (round 7): embedding second-moment
  * statistics (q113 — the single-aggregate covariance pass PCA
  * whitening builds on) and the deterministic hash split (q114 —
  * train/val/test assignment an external engine can replay from SQL).
  * Same contract as batches 3-8: Spark runs the library operator,
  * DuckDB recomputes from first principles, equality IS the claim.
  * Whitening itself (eigenvectors) is not SQL-expressible — its
  * correctness lives in VecStatsSpec (identity-covariance law,
  * eigen reconstruction, sign determinism); the covariance input it
  * consumes is what q113 hash-gates.
  */
object Queries9 {

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
    } yield (i, j, BigDecimal(cov(i)(j)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
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
      |  ROUND(cov, 6) AS cov
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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_embed_cov" -> (q113 _),
    "q114_hash_split" -> (q114 _))

  val oracles: Map[String, String] = Map(
    "q113_embed_cov" -> q113Sql,
    "q114_hash_split" -> q114Sql)

  // $"..." interpolator without a SparkSession-bound implicits import
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
