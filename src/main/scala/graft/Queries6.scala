package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Corpus, TextOps}

/** Oracle corpus, batch 6: corpus-preparation operators — benchmark
  * decontamination (q85), concat-and-split sequence packing (q86),
  * fixed-window chunking (q87), and BM25 ranked retrieval (q88). The
  * pattern of batches 3-5 continues: the Spark side runs the library
  * operator, the DuckDB oracle recomputes the same answer from first
  * principles in SQL, and equality IS the operator's correctness
  * claim.
  */
object Queries6 extends ColumnSyntax {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.tbl(s, dir, name)

  /** Single-file testdata → one input split; spread once for the
    * hash-heavy pipeline stages (same note as Queries3.docsPar).
    */
  private def docsPar(s: SparkSession, dir: String): DataFrame =
    Tables.docsPar(s, dir)

  /** Shared shingle CTE for the decontamination oracle: word 5-grams,
    * engine-identical single-space tokenization.
    */
  private val N = 5
  private val shingleCte =
    s"""sh AS (
       |  SELECT doc_id, array_to_string(list_slice(toks, i + 1, i + $N), ' ') AS shingle
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |       UNNEST(range(0, GREATEST(0, len(toks) - $N + 1))) AS t(i)
       |), dsh AS (SELECT DISTINCT doc_id, shingle FROM sh)""".stripMargin

  // --------------------------------------- q85: decontamination report
  /** Train/test n-gram decontamination: docs ≥ 50 form the training
    * corpus, docs < 50 the "benchmark"; report every training doc
    * sharing a distinct word 5-gram with the benchmark union. The
    * planted near-dup pairs that cross the id split are exactly the
    * contamination this catches (overlap ≈ the doc's whole shingle
    * set); unrelated docs share nothing at n=5.
    */
  private def q85(s: SparkSession, dir: String): DataFrame = {
    val docs = docsPar(s, dir)
    Corpus.contaminationReport(
        docs.filter($"doc_id" >= 50), "doc_id", "text",
        docs.filter($"doc_id" < 50), "text", n = N)
      .select($"doc_id", $"overlap", $"doc_shingles",
        round($"overlap_frac", 6).as("overlap_frac"))
      .orderBy($"doc_id")
  }

  private val q85Sql =
    s"""WITH $shingleCte,
       |bench AS (SELECT DISTINCT shingle FROM dsh WHERE doc_id < 50),
       |corpus AS (SELECT * FROM dsh WHERE doc_id >= 50),
       |sizes AS (SELECT doc_id, COUNT(*) AS doc_shingles FROM corpus GROUP BY 1),
       |ov AS (
       |  SELECT doc_id, COUNT(*) AS overlap
       |  FROM corpus JOIN bench USING (shingle) GROUP BY 1
       |)
       |SELECT o.doc_id, o.overlap, z.doc_shingles,
       |  ROUND(CAST(o.overlap AS DOUBLE) / z.doc_shingles, 6) AS overlap_frac
       |FROM ov o JOIN sizes z USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------- q86: sequence packing
  /** Concat-and-split packing of the whole corpus into 256-token
    * blocks across 8 id-hash shards: every (doc, block) assignment
    * with the doc-relative token range the block takes. The oracle
    * recomputes the shard-partitioned running sum and the block
    * explosion with a window + range join — the differential check
    * covers the boundary-crossing splits exactly.
    */
  private def q86(s: SparkSession, dir: String): DataFrame =
    Corpus.packBlocks(t(s, dir, "documents"), "doc_id",
        size(split($"text", " ")), blockSize = 256L, shardCol = pmod($"doc_id", lit(8)))
      .select($"shard".cast("long").as("shard"), $"block_id", $"doc_id",
        $"tok_start", $"n_toks")
      .orderBy($"shard", $"block_id", $"doc_id")

  private val q86Sql =
    """WITH base AS (
      |  SELECT doc_id, doc_id % 8 AS shard,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS cnt
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) > 0
      |), cum AS (
      |  -- DuckDB windowed SUM(BIGINT) widens to HUGEINT; pin BIGINT
      |  SELECT shard, doc_id, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS fin,
      |    CAST(SUM(cnt) OVER (PARTITION BY shard ORDER BY doc_id) - cnt AS BIGINT) AS ini
      |  FROM base
      |)
      |SELECT shard, b.block_id, doc_id,
      |  GREATEST(0, b.block_id * 256 - ini) AS tok_start,
      |  LEAST(ini + cnt, (b.block_id + 1) * 256) - GREATEST(ini, b.block_id * 256) AS n_toks
      |FROM cum, UNNEST(range(ini // 256, (fin - 1) // 256 + 1)) AS b(block_id)
      |ORDER BY shard, block_id, doc_id""".stripMargin

  // ------------------------------------------------ q87: chunking
  /** 32-token chunks with 8-token overlap over the first 200 docs:
    * (doc, chunk_idx, chunk length, chunk text). Exercises the
    * short-doc single-chunk case, the exact-fit case, and the short
    * final chunk.
    */
  private def q87(s: SparkSession, dir: String): DataFrame =
    Corpus.chunk(t(s, dir, "documents").filter($"doc_id" < 200),
        "doc_id", "text", chunkSize = 32, overlap = 8)
      .orderBy($"doc_id", $"chunk_idx")

  private val q87Sql =
    """WITH base AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |  FROM documents WHERE doc_id < 200 AND length(text) > 0
      |), counted AS (
      |  SELECT doc_id, toks, n,
      |    CASE WHEN n <= 32 THEN 1
      |         ELSE CAST(CEIL(CAST(n - 32 AS DOUBLE) / 24) AS BIGINT) + 1 END AS nchunks
      |  FROM base
      |)
      |SELECT doc_id, c.chunk_idx,
      |  CAST(len(list_slice(toks, c.chunk_idx * 24 + 1, c.chunk_idx * 24 + 32)) AS INTEGER)
      |    AS n_chunk_tokens,
      |  array_to_string(list_slice(toks, c.chunk_idx * 24 + 1, c.chunk_idx * 24 + 32), ' ')
      |    AS chunk_text
      |FROM counted, UNNEST(range(0, nchunks)) AS c(chunk_idx)
      |ORDER BY doc_id, chunk_idx""".stripMargin

  // ------------------------------------------------ q88: BM25 retrieval
  /** Okapi BM25 top-20 for a fixed query over the corpus (k1=1.2,
    * b=0.75, ln(1 + (N-df+0.5)/(df+0.5)) idf). Integer tf/df/dl feed
    * double arithmetic in the same expression shape on both engines;
    * the ordering key is the ROUNDED score with doc_id tiebreak, so
    * the top-20 cut is deterministic cross-engine.
    */
  private val Query = Seq("spark", "window", "join")

  private def q88(s: SparkSession, dir: String): DataFrame =
    TextOps.bm25(docsPar(s, dir), "doc_id", "text", Query)
      .select($"doc_id", round($"score", 6).as("score"))
      .orderBy($"score".desc, $"doc_id")
      .limit(20)

  private val q88Sql = {
    val qlist = Query.map(q => s"'$q'").mkString("(", ", ", ")")
    s"""WITH toks AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
       |), lens AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1
       |), global AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(dl) AS avgdl FROM lens
       |), tf AS (
       |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM toks WHERE tok IN $qlist GROUP BY 1, 2
       |), df AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
       |), scored AS (
       |  SELECT t.doc_id,
       |    SUM(LN(1.0 + (g.n - d.df + 0.5) / (d.df + 0.5)) *
       |        (t.tf * 2.2) /
       |        (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / g.avgdl))) AS score
       |  FROM tf t JOIN df d USING (tok) JOIN lens l USING (doc_id), global g
       |  GROUP BY 1
       |)
       |SELECT doc_id, ROUND(score, 6) AS score
       |FROM scored ORDER BY ROUND(score, 6) DESC, doc_id LIMIT 20""".stripMargin
  }

  // ------------------------------------------------------- registry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_decontaminate" -> (q85 _),
    "q86_seq_packing" -> (q86 _),
    "q87_chunking" -> (q87 _),
    "q88_bm25_topk" -> (q88 _)
  )

  val oracles: Map[String, String] = Map(
    "q85_decontaminate" -> q85Sql,
    "q86_seq_packing" -> q86Sql,
    "q87_chunking" -> q87Sql,
    "q88_bm25_topk" -> q88Sql
  )

}
