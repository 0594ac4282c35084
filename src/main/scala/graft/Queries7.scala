package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Corpus, SimJoin, TextOps}

/** Oracle corpus, batch 7: data-mixing and curation operators —
  * deterministic quota sampling (q89), TF-IDF keyword extraction
  * (q90), PII redaction (q91), repetition filtering (q92), embedding
  * int8 quantization (q93), and cross-doc boilerplate n-grams (q94).
  * Same contract as batches 3-6: the Spark side runs the library
  * operator, the DuckDB oracle recomputes the answer from first
  * principles, equality IS the correctness claim.
  */
object Queries7 extends ColumnSyntax {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.tbl(s, dir, name)

  /** Single-file testdata → one input split; spread once for the
    * hash-heavy stages (same note as Queries3.docsPar).
    */
  private def docsPar(s: SparkSession, dir: String): DataFrame =
    Tables.docsPar(s, dir)

  // ---------------------------------------- q89: quota mix sampling
  /** Per-source quota sample (40 docs/source) under a PORTABLE
    * deterministic permutation key — the Knuth multiplicative hash
    * `((id mod 2^31-1) · 2654435761) mod 2^32`, spelled identically in
    * both engines so the oracle reproduces the exact sample. The
    * pre-mod keeps the product under 2^63 for ANY Long id — without
    * it, billion-range ids overflow INT64 in BOTH engines (ANSI Spark
    * throws, DuckDB errors; caught live on the sf1 replica ids).
    * (The library default key is xxhash64 — Spark-only; the key is a
    * parameter precisely so recipes can pin a portable one.)
    */
  private val KnuthA = 2654435761L
  private val Mod32 = 4294967296L
  private val PreMod = 2147483647L

  /** The portable key as a Spark column (unit-interval form divides
    * by 2^32).
    */
  private def knuthKey(id: Column): Column =
    pmod(pmod(id, lit(PreMod)) * lit(KnuthA), lit(Mod32))

  /** The identical key in DuckDB SQL. */
  private def knuthKeySql(id: String): String =
    s"(($id % $PreMod) * $KnuthA) % $Mod32"

  private def q89(s: SparkSession, dir: String): DataFrame =
    Corpus.quotaSample(t(s, dir, "documents"), "doc_id", "source",
        quota = 40, key = knuthKey)
      .select($"source", $"doc_id")
      .orderBy($"source", $"doc_id")

  private val q89Sql =
    s"""SELECT source, doc_id FROM (
       |  SELECT source, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY ${knuthKeySql("doc_id")}, doc_id) AS rk
       |  FROM documents)
       |WHERE rk <= 40 ORDER BY source, doc_id""".stripMargin

  // ---------------------------------------- q90: TF-IDF keywords
  /** Top-3 TF-IDF terms per doc (corpus-wide df/N statistics, output
    * restricted to doc_id < 200 to keep the diff small). Ranking key
    * is the ROUNDED score + token tie-break — deterministic across
    * engines' ln implementations.
    */
  private def q90(s: SparkSession, dir: String): DataFrame =
    TextOps.tfIdfTopK(docsPar(s, dir), "doc_id", "text", k = 3)
      .filter($"doc_id" < 200)
      .select($"doc_id", $"rk".cast("long").as("rk"), $"tok", $"tfidf")
      .orderBy($"doc_id", $"rk")

  private val q90Sql =
    """WITH toks AS (
      |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
      |), tf AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM toks WHERE tok <> '' GROUP BY 1, 2
      |), df AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
      |), n AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
      |), scored AS (
      |  SELECT t.doc_id, t.tok,
      |    ROUND(t.tf * (LN((1.0 + n.n) / (1.0 + d.df)) + 1.0), 6) AS tfidf
      |  FROM tf t JOIN df d USING (tok), n
      |), ranked AS (
      |  SELECT doc_id, tok, tfidf,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY tfidf DESC, tok ASC) AS rk
      |  FROM scored
      |)
      |SELECT doc_id, rk, tok, tfidf FROM ranked
      |WHERE rk <= 3 AND doc_id < 200 ORDER BY doc_id, rk""".stripMargin

  // ---------------------------------------- q91: PII redaction
  /** PII scrub over a synthesized contact suffix (the corpus text
    * itself carries no PII, so both engines append the same
    * deterministic email/phone/card string per doc, then redact).
    * Verifies match counting AND replacement text cross-engine — the
    * regex subset is written for exact Java/RE2 agreement.
    */
  private def q91(s: SparkSession, dir: String): DataFrame = {
    val suffixed = t(s, dir, "documents")
      .select($"doc_id",
        concat(lit("contact "), $"source", $"doc_id".cast("string"),
          lit("@mail.example"), lit(" tel +1 555-01"),
          lpad(pmod($"doc_id", lit(100)).cast("string"), 2, "0"),
          when(pmod($"doc_id", lit(3)) === 0,
            lit(" card 4111111111111111")).otherwise(lit(""))).as("contact"))
    TextOps.redactPii(suffixed, "contact", "redacted")
      .select($"doc_id", $"n_pii", $"redacted")
      .orderBy($"doc_id")
  }

  private val q91Sql = {
    val email = TextOps.EmailPattern
    val card = TextOps.CardPattern
    val phone = TextOps.PhonePattern
    s"""WITH suffixed AS (
       |  SELECT doc_id,
       |    'contact ' || source || CAST(doc_id AS VARCHAR) || '@mail.example' ||
       |    ' tel +1 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
       |    CASE WHEN doc_id % 3 = 0 THEN ' card 4111111111111111' ELSE '' END
       |      AS contact
       |  FROM documents
       |), steps AS (
       |  SELECT doc_id, contact,
       |    regexp_replace(contact, '$email', '<EMAIL>', 'g') AS s1
       |  FROM suffixed
       |), steps2 AS (
       |  SELECT doc_id, contact, s1,
       |    regexp_replace(s1, '$card', '<CARD>', 'g') AS s2
       |  FROM steps
       |)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(contact, '$email')) +
       |       len(regexp_extract_all(s1, '$card')) +
       |       len(regexp_extract_all(s2, '$phone')) AS INTEGER) AS n_pii,
       |  regexp_replace(s2, '$phone', '<PHONE>', 'g') AS redacted
       |FROM steps2 ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------- q92: repetition stats
  /** Gopher-style within-doc repetition signals over word 3-grams,
    * whole corpus; fractions rounded to 6.
    */
  private def q92(s: SparkSession, dir: String): DataFrame =
    TextOps.repetitionStats(docsPar(s, dir), "doc_id", "text", n = 3)
      .select($"doc_id", $"n_grams", $"n_distinct_grams",
        round($"dup_gram_frac", 6).as("dup_gram_frac"),
        round($"top_gram_frac", 6).as("top_gram_frac"))
      .orderBy($"doc_id")

  private val q92Sql =
    """WITH sh AS (
      |  SELECT doc_id, array_to_string(list_slice(toks, i + 1, i + 3), ' ') AS shingle
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |        FROM documents),
      |       UNNEST(range(0, GREATEST(0, len(toks) - 2))) AS t(i)
      |), gc AS (
      |  SELECT doc_id, shingle, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM sh GROUP BY 1, 2
      |)
      |SELECT doc_id,
      |  CAST(SUM(c) AS BIGINT) AS n_grams,
      |  CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
      |  ROUND(1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS dup_gram_frac,
      |  ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_gram_frac
      |FROM gc GROUP BY 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------- q93: int8 quantization
  /** Symmetric int8 quantization of every embedding: the scale, the
    * quantized component sum (exact integer — catches any rounding
    * divergence component-by-component), and the cosine between the
    * vector and its dequantized reconstruction (quantization error;
    * rounded). floor(x/s + 0.5) spelling keeps negative halves
    * engine-identical.
    */
  private def q93(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
      .withColumn("scale", SimJoin.int8Scale($"v"))
      .withColumn("q", SimJoin.quantizeInt8($"v", $"scale"))
    emb.select($"vec_id",
        round($"scale", 9).as("scale"),
        aggregate($"q", lit(0L), (acc, x) => acc + x).as("q_sum"),
        // scale=0 (all-zero embedding) → reconstruction is the zero
        // vector and its cosine is 0/0; IEEE NaN-vs-NULL handling
        // differs cross-engine, so emit NULL explicitly in BOTH
        when($"scale" === 0, lit(null).cast("double"))
          .otherwise(round(SimJoin.cosine($"v", SimJoin.dequantize($"q", $"scale")), 6))
          .as("cos_recon"))
      .orderBy($"vec_id")
  }

  private val q93Sql =
    """WITH e AS (
      |  SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), scaled AS (
      |  SELECT vec_id, v,
      |    LIST_MAX(LIST_TRANSFORM(v, x -> ABS(x))) / 127.0 AS scale
      |  FROM e
      |), quant AS (
      |  SELECT vec_id, v, scale,
      |    LIST_TRANSFORM(v, x -> CASE WHEN scale = 0 THEN 0
      |      ELSE CAST(GREATEST(-127.0, LEAST(127.0, FLOOR(x / scale + 0.5))) AS INTEGER)
      |      END) AS q
      |  FROM scaled
      |)
      |SELECT vec_id, ROUND(scale, 9) AS scale,
      |  CAST(LIST_SUM(q) AS BIGINT) AS q_sum,
      |  CASE WHEN scale = 0 THEN NULL ELSE
      |  ROUND(LIST_DOT_PRODUCT(v, LIST_TRANSFORM(q, x -> x * scale)) /
      |    (SQRT(LIST_DOT_PRODUCT(v, v)) *
      |     SQRT(LIST_DOT_PRODUCT(LIST_TRANSFORM(q, x -> x * scale),
      |                           LIST_TRANSFORM(q, x -> x * scale)))), 6) + 0
      |  END AS cos_recon
      |FROM quant ORDER BY vec_id""".stripMargin

  // ---------------------------------------- q94: boilerplate n-grams
  /** Cross-document boilerplate: word 2-grams appearing in ≥ 100
    * distinct docs (the synthetic corpus's shared-vocabulary 2-grams
    * stand in for real boilerplate headers/footers), then each doc's
    * fraction of distinct 2-grams that are boilerplate (docs < 100).
    */
  private def q94(s: SparkSession, dir: String): DataFrame = {
    val docs = docsPar(s, dir)
    Corpus.boilerplateStats(docs, "doc_id", "text", n = 2, minDocs = 100)
      .filter($"doc_id" < 100)
      .select($"doc_id", $"n_distinct_grams", $"n_boilerplate",
        round($"boilerplate_frac", 6).as("boilerplate_frac"))
      .orderBy($"doc_id")
  }

  private val q94Sql =
    """WITH sh AS (
      |  SELECT doc_id, array_to_string(list_slice(toks, i + 1, i + 2), ' ') AS shingle
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |        FROM documents),
      |       UNNEST(range(0, GREATEST(0, len(toks) - 1))) AS t(i)
      |), dsh AS (
      |  SELECT DISTINCT doc_id, shingle FROM sh
      |), bp AS (
      |  SELECT shingle FROM dsh GROUP BY 1 HAVING COUNT(*) >= 100
      |)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
      |  CAST(SUM(CASE WHEN bp.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_boilerplate,
      |  ROUND(CAST(SUM(CASE WHEN bp.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*), 6) AS boilerplate_frac
      |FROM dsh LEFT JOIN bp USING (shingle)
      |WHERE doc_id < 100
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------- q95: weighted source mix
  /** Weighted mixture recipe over the 20 sources (50% of src0, 25% of
    * src1, 10% of src2, 5% of everything else) under the same
    * portable unit key as q89 — the oracle reproduces the exact
    * surviving row set, proving the recipe is deterministic, not just
    * proportional.
    */
  private def q95(s: SparkSession, dir: String): DataFrame =
    Corpus.mixBySource(t(s, dir, "documents"), "doc_id", "source",
        weights = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.1),
        default = 0.05,
        key = id => knuthKey(id).cast("double") / lit(Mod32.toDouble))
      .select($"source", $"doc_id")
      .orderBy($"source", $"doc_id")

  private val q95Sql =
    s"""SELECT source, doc_id FROM documents
       |WHERE CAST(${knuthKeySql("doc_id")} AS DOUBLE) / $Mod32.0 <
       |  CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25
       |              WHEN 'src2' THEN 0.1 ELSE 0.05 END
       |ORDER BY source, doc_id""".stripMargin

  // ---------------------------------------- q96: inverted index
  /** Full inverted-index build: per term, document frequency and the
    * doc-sorted `doc:tf` posting string (portable across engines —
    * struct-list columns stringify differently).
    */
  private def q96(s: SparkSession, dir: String): DataFrame =
    TextOps.invertedIndex(docsPar(s, dir), "doc_id", "text")
      .orderBy($"tok")

  private val q96Sql =
    """WITH toks AS (
      |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
      |), tf AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM toks WHERE tok <> '' GROUP BY 1, 2
      |)
      |SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
      |  string_agg(doc_id || ':' || tf, ' ' ORDER BY doc_id) AS postings
      |FROM tf GROUP BY tok ORDER BY tok""".stripMargin

  // ---------------------------------------- q97: embedding pooling
  /** Mean-pool embeddings per label (the chunk→document / cluster→
    * centroid roll-up) via the native bounded-state `vec_mean`
    * aggregate; the pooled vector is exploded to (label, pos,
    * component) rows — the driver's hash compare needs scalar cells —
    * with components rounded to 6 (sum order across partitions
    * differs between engines in the last ulp).
    */
  private def q97(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select($"label", transform($"embedding", _.cast("double")).as("v"))
      .groupBy($"label")
      .agg(SimJoin.vecMean($"v").as("__m"), count(lit(1)).as("n_vecs"))
      .select($"label", $"n_vecs", posexplode($"__m").as(Seq("pos", "__c")))
      .select($"label", $"n_vecs", ($"pos" + 1).cast("long").as("pos"),
        round($"__c", 6).as("component"))
      .orderBy($"label", $"pos")

  private val q97Sql =
    """WITH e AS (
      |  SELECT label, UNNEST(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)))
      |    AS v, UNNEST(range(1, len(embedding) + 1)) AS pos
      |  FROM embeddings
      |), m AS (
      |  SELECT label, pos, AVG(v) AS mv FROM e GROUP BY 1, 2
      |), cnt AS (
      |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
      |  FROM embeddings GROUP BY 1
      |)
      |SELECT label, n_vecs, pos, ROUND(mv, 6) + 0 AS component
      |FROM m JOIN cnt USING (label)
      |ORDER BY label, pos""".stripMargin

  // ---------------------------------------- q98: quality-model score
  /** `QualityModel` scoring pass with FIXED literal weights (a
    * trained model is just a weight vector; pinning one makes the
    * whole featurize→σ(w·x) path oracle-checkable): per-doc logistic
    * quality score over the text_profile features, rounded to 6. No
    * threshold filter — raw-score comparisons at a cut boundary are
    * not cross-engine stable, rounded scores are.
    */
  private val QW = Seq(-3.0, 2.0, 4.0, 3.0, -4.0, 1.0)

  private def q98(s: SparkSession, dir: String): DataFrame =
    graft.ext.QualityModel.featurize(docsPar(s, dir), "doc_id", "text")
      .select($"doc_id",
        round(graft.ext.QualityModel.score($"features", QW), 6).as("q_score"))
      .orderBy($"doc_id")

  private val q98Sql = {
    val en = TextOps.Stopwords.head._2.map(w => s"'$w'").mkString(", ")
    val Seq(w0, w1, w2, w3, w4, w5) = QW
    s"""WITH toks AS (
       |  SELECT doc_id, tok FROM (
       |    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents)
       |  WHERE tok <> ''
       |), agg AS (
       |  SELECT doc_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    SUM(CASE WHEN tok IN ($en) THEN 1 ELSE 0 END) AS hits_en,
       |    SUM(LENGTH(tok)) AS sum_len,
       |    SUM(LENGTH(REGEXP_REPLACE(tok, '[^a-zA-Z]', '', 'g'))) AS alpha,
       |    SUM(LENGTH(REGEXP_REPLACE(tok, '[a-zA-Z0-9]', '', 'g'))) AS punct
       |  FROM toks GROUP BY 1
       |), feats AS (
       |  SELECT doc_id,
       |    LEAST(n_tokens / 50.0, 1.0) AS f1,
       |    CAST(hits_en AS DOUBLE) / n_tokens AS f2,
       |    CAST(alpha AS DOUBLE) / sum_len AS f3,
       |    CAST(punct AS DOUBLE) / sum_len AS f4,
       |    LEAST((CAST(sum_len AS DOUBLE) / n_tokens) / 10.0, 1.0) AS f5
       |  FROM agg
       |)
       |SELECT doc_id,
       |  ROUND(1.0 / (1.0 + EXP(-($w0 * 1.0 + $w1 * f1 + $w2 * f2 +
       |    $w3 * f3 + $w4 * f4 + $w5 * f5))), 6) AS q_score
       |FROM feats ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------- q99: packed block text
  /** [[Corpus.materializeBlocks]]: the q86 packing assignments turned
    * into actual 256-token training sequences (fragments concatenated
    * in doc order per block) — the oracle recomputes the running-sum
    * assignment AND the fragment slicing/concatenation.
    */
  private def q99(s: SparkSession, dir: String): DataFrame =
    Corpus.materializeBlocks(t(s, dir, "documents"), "doc_id", "text",
        blockSize = 256L, shardCol = pmod($"doc_id", lit(8)))
      .select($"shard".cast("long").as("shard"), $"block_id", $"n_toks",
        $"block_text")
      .orderBy($"shard", $"block_id")

  private val q99Sql =
    """WITH base AS (
      |  SELECT doc_id, doc_id % 8 AS shard, string_split(text, ' ') AS toks,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS cnt
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) > 0
      |), cum AS (
      |  SELECT shard, doc_id, toks, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS fin,
      |    CAST(SUM(cnt) OVER (PARTITION BY shard ORDER BY doc_id) - cnt AS BIGINT) AS ini
      |  FROM base
      |), asg AS (
      |  SELECT shard, doc_id, toks, b.block_id,
      |    GREATEST(0, b.block_id * 256 - ini) AS tok_start,
      |    LEAST(ini + cnt, (b.block_id + 1) * 256) -
      |      GREATEST(ini, b.block_id * 256) AS n_toks
      |  FROM cum, UNNEST(range(ini // 256, (fin - 1) // 256 + 1)) AS b(block_id)
      |)
      |SELECT shard, block_id, CAST(SUM(n_toks) AS BIGINT) AS n_toks,
      |  string_agg(array_to_string(
      |    list_slice(toks, tok_start + 1, tok_start + n_toks), ' '),
      |    ' ' ORDER BY doc_id) AS block_text
      |FROM asg GROUP BY 1, 2 ORDER BY shard, block_id""".stripMargin

  // ---------------------------------------- q100: curation pipeline
  /** The operators COMPOSED end-to-end — the corpus-curation pipeline
    * a training run actually executes: exact dedup (keep min id per
    * content) → quality gate (fixed-weight model score, rounded-score
    * threshold so the cut is cross-engine deterministic) → weighted
    * source mixing (portable key) → sequence packing. The oracle
    * recomputes all four stages from raw SQL; matching here means the
    * stages compose without semantic drift, not just that each works
    * alone.
    */
  private def q100(s: SparkSession, dir: String): DataFrame = {
    import graft.ext.{Dedup, QualityModel}
    val docs = docsPar(s, dir)
    val deduped = Dedup.dropExactDuplicates(docs, "doc_id", "text")
    val kept = QualityModel.featurize(deduped, "doc_id", "text")
      .filter(round(QualityModel.score($"features", QW), 6) >= 0.5)
      .select($"doc_id")
    val mixed = Corpus.mixBySource(
        deduped.join(kept, "doc_id"), "doc_id", "source",
        weights = Map("src0" -> 0.8, "src1" -> 0.6), default = 0.25,
        key = id => knuthKey(id).cast("double") / lit(Mod32.toDouble))
    Corpus.packBlocks(mixed, "doc_id", size(split($"text", " ")),
        blockSize = 128L, shardCol = pmod($"doc_id", lit(4)))
      .select($"shard".cast("long").as("shard"), $"block_id", $"doc_id",
        $"tok_start", $"n_toks")
      .orderBy($"shard", $"block_id", $"doc_id")
  }

  private val q100Sql = {
    val en = TextOps.Stopwords.head._2.map(w => s"'$w'").mkString(", ")
    val Seq(w0, w1, w2, w3, w4, w5) = QW
    s"""WITH dedup AS (
       |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
       |), d AS (
       |  SELECT doc_id, text, source FROM documents
       |  WHERE doc_id IN (SELECT doc_id FROM dedup)
       |), toks AS (
       |  SELECT doc_id, tok FROM (
       |    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM d)
       |  WHERE tok <> ''
       |), agg AS (
       |  SELECT doc_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    SUM(CASE WHEN tok IN ($en) THEN 1 ELSE 0 END) AS hits_en,
       |    SUM(LENGTH(tok)) AS sum_len,
       |    SUM(LENGTH(REGEXP_REPLACE(tok, '[^a-zA-Z]', '', 'g'))) AS alpha,
       |    SUM(LENGTH(REGEXP_REPLACE(tok, '[a-zA-Z0-9]', '', 'g'))) AS punct
       |  FROM toks GROUP BY 1
       |), scored AS (
       |  SELECT doc_id,
       |    ROUND(1.0 / (1.0 + EXP(-($w0 * 1.0 +
       |      $w1 * LEAST(n_tokens / 50.0, 1.0) +
       |      $w2 * (CAST(hits_en AS DOUBLE) / n_tokens) +
       |      $w3 * (CAST(alpha AS DOUBLE) / sum_len) +
       |      $w4 * (CAST(punct AS DOUBLE) / sum_len) +
       |      $w5 * LEAST((CAST(sum_len AS DOUBLE) / n_tokens) / 10.0, 1.0)))), 6)
       |      AS q_score
       |  FROM agg
       |), mixed AS (
       |  SELECT d.doc_id, d.text, d.source FROM d
       |  JOIN scored USING (doc_id)
       |  WHERE q_score >= 0.5
       |    AND CAST(${knuthKeySql("d.doc_id")} AS DOUBLE) / $Mod32.0 <
       |      CASE d.source WHEN 'src0' THEN 0.8 WHEN 'src1' THEN 0.6
       |                    ELSE 0.25 END
       |), base AS (
       |  SELECT doc_id, doc_id % 4 AS shard,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS cnt
       |  FROM mixed
       |  WHERE len(string_split(text, ' ')) > 0
       |), cum AS (
       |  SELECT shard, doc_id, cnt,
       |    CAST(SUM(cnt) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS fin,
       |    CAST(SUM(cnt) OVER (PARTITION BY shard ORDER BY doc_id) - cnt AS BIGINT) AS ini
       |  FROM base
       |)
       |SELECT shard, b.block_id, doc_id,
       |  GREATEST(0, b.block_id * 128 - ini) AS tok_start,
       |  LEAST(ini + cnt, (b.block_id + 1) * 128) - GREATEST(ini, b.block_id * 128) AS n_toks
       |FROM cum, UNNEST(range(ini // 128, (fin - 1) // 128 + 1)) AS b(block_id)
       |ORDER BY shard, block_id, doc_id""".stripMargin
  }

  // ------------------------------- q101: sharded inverted index
  /** Hot-term-sharded inverted index under the portable Knuth routing
    * key: terms with df > 50 split into hash-routed posting segments
    * (at sf0.01 every stopword-like token shards; the oracle
    * recomputes df, shard counts, routing, and per-segment posting
    * strings from raw SQL). The bounded-task-input property this
    * buys at 100 TB is asserted separately in TextOpsSpec.
    */
  private def q101(s: SparkSession, dir: String): DataFrame =
    TextOps.invertedIndexSharded(docsPar(s, dir), "doc_id", "text",
        shardSize = 50L, key = knuthKey)
      .orderBy($"tok", $"shard")

  private val q101Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
       |), tf AS (
       |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM toks WHERE tok <> '' GROUP BY 1, 2
       |), dft AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
       |    CAST(CEIL(COUNT(*) / 50.0) AS INT) AS n_shards
       |  FROM tf GROUP BY tok
       |)
       |SELECT tf.tok,
       |  CAST(${knuthKeySql("doc_id")} % n_shards AS INT) AS shard,
       |  n_shards, df, CAST(COUNT(*) AS BIGINT) AS shard_df,
       |  string_agg(doc_id || ':' || tf, ' ' ORDER BY doc_id) AS postings
       |FROM tf JOIN dft USING (tok)
       |GROUP BY 1, 2, 3, 4
       |ORDER BY tok, shard""".stripMargin

  // ------------------------------------------------------- registry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q89_quota_sample" -> (q89 _),
    "q90_tfidf_topk" -> (q90 _),
    "q91_pii_redact" -> (q91 _),
    "q92_repetition" -> (q92 _),
    "q93_quantize_int8" -> (q93 _),
    "q94_boilerplate" -> (q94 _),
    "q95_mix_sources" -> (q95 _),
    "q96_inverted_index" -> (q96 _),
    "q97_vec_pooling" -> (q97 _),
    "q98_quality_score" -> (q98 _),
    "q99_packed_blocks" -> (q99 _),
    "q100_curation_pipeline" -> (q100 _),
    "q101_inverted_sharded" -> (q101 _)
  )

  val oracles: Map[String, String] = Map(
    "q89_quota_sample" -> q89Sql,
    "q90_tfidf_topk" -> q90Sql,
    "q91_pii_redact" -> q91Sql,
    "q92_repetition" -> q92Sql,
    "q93_quantize_int8" -> q93Sql,
    "q94_boilerplate" -> q94Sql,
    "q95_mix_sources" -> q95Sql,
    "q96_inverted_index" -> q96Sql,
    "q97_vec_pooling" -> q97Sql,
    "q98_quality_score" -> q98Sql,
    "q99_packed_blocks" -> q99Sql,
    "q100_curation_pipeline" -> q100Sql,
    "q101_inverted_sharded" -> q101Sql
  )

}
