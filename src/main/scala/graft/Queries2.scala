package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.ops.AsofJoin

/** Oracle corpus, batch 2: events (streaming-shaped, SURVEY §2.8), text
  * analysis / dedup over `documents`, similarity over `embeddings` —
  * the LLM-pipeline extension surface, each with DuckDB oracle SQL.
  *
  * Events parity note: `events.ts` is normalized to Long
  * epoch-nanoseconds at the accessor ([[Tables.events]] — the
  * testdata's physical type has varied between TIMESTAMP(NANOS) and
  * TIMESTAMP(MICROS) across rounds). All arithmetic stays in exact
  * integer nanoseconds (`epoch_ns` on the DuckDB side, valid for both
  * types); nothing round-trips through double.
  */
object Queries2 extends ColumnSyntax {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.tbl(s, dir, name)

  private val HourNs = 3600000000000L

  // --------------------------------------------------------- events (E)

  /** Tumbling 1-hour window agg (Structured Streaming shape, batch
    * semantics — SURVEY §2.8). Integer-nanos bucketing, exact.
    */
  private def q50(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("hour_bucket", expr(s"ts div $HourNs"))
      .groupBy($"hour_bucket", $"event_type")
      .agg(count(lit(1)).as("n"),
           sum($"value".cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .orderBy($"hour_bucket", $"event_type")

  private val q50Sql =
    s"""SELECT epoch_ns(ts) // $HourNs AS hour_bucket, event_type,
       |  COUNT(*) AS n,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
       |FROM events
       |GROUP BY 1, 2 ORDER BY hour_bucket, event_type""".stripMargin

  /** Sliding 2-hour / 1-hour-step windows: each event lands in two
    * buckets (explode over the offset array — the generator shape of
    * Spark's `window(ts, "2 hours", "1 hour")`).
    */
  private def q51(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("off", explode(array(lit(0L), lit(1L))))
      .withColumn("win_start", (expr(s"ts div $HourNs") - $"off"))
      .groupBy($"win_start")
      .agg(count(lit(1)).as("n"),
           countDistinct($"user_id").as("n_users"))
      .orderBy($"win_start")

  private val q51Sql =
    s"""SELECT epoch_ns(ts) // $HourNs - off AS win_start,
       |  COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
       |FROM events CROSS JOIN (VALUES (0), (1)) AS o(off)
       |GROUP BY 1 ORDER BY win_start""".stripMargin

  /** J2 as-of backward join, stream-shaped: each event picks up the
    * value of the user's most recent prior (or same-instant) `signup`
    * event — the union+window big-big formulation (AsofJoin
    * .asofBackwardUnion), one shuffle, no cross product.
    */
  private def q52(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select($"event_id", $"user_id", $"ts", $"event_type")
    val signups = Tables.events(s, dir)
      .filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"value".as("signup_value"))
    AsofJoin.asofBackwardUnion(ev, signups, Seq("user_id"), "ts", Seq("signup_value"))
      .select($"event_id", $"user_id", $"signup_value")
      .orderBy($"event_id")
  }

  private val q52Sql =
    """SELECT event_id, user_id,
      |  LAST_VALUE(CASE WHEN event_type = 'signup' THEN value END IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY epoch_ns(ts) ASC,
      |    CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_value
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Pivot on event_type (inherited surface). */
  private def q53(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = Tables.events(s, dir)
      .groupBy($"user_id")
      .pivot("event_type", types)
      .count()
    types.foldLeft(p)((d, c) => d.withColumn(c, coalesce(col(c), lit(0L))))
      .orderBy($"user_id")
  }

  private val q53Sql =
    """SELECT user_id,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Sessionization: a >30-minute gap starts a new session (lag +
    * running sum of session starts) — the batch equivalent of
    * `flatMapGroupsWithState` session windows. Exact integer nanos.
    */
  private def q54(s: SparkSession, dir: String): DataFrame = {
    val gapNs = 30L * 60 * 1000000000L
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_sess",
        when($"prev_ts".isNull || $"ts" - $"prev_ts" > gapNs, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_sess").over(wRun))
      .groupBy($"user_id")
      .agg(max($"session_id").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  private val q54Sql =
    """WITH g AS (
      |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
      |    LAG(epoch_ns(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) ASC, event_id ASC) AS prev_tns
      |  FROM events
      |), m AS (
      |  SELECT user_id, event_id,
      |    CASE WHEN prev_tns IS NULL OR tns - prev_tns > 1800000000000 THEN 1 ELSE 0 END AS new_sess,
      |    tns
      |  FROM g
      |), r AS (
      |  SELECT user_id,
      |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tns ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM m
      |)
      |SELECT user_id, MAX(session_id) AS n_sessions, COUNT(*) AS n_events
      |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin

  /** A3 argmax aggregation (max_by with deterministic tie-break —
    * SURVEY §2.4 A3 / §7.4 trap 2).
    */
  private def q55(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy($"c_nationkey")
      .agg(
        max_by($"c_custkey", struct($"c_acctbal", negate($"c_custkey"))).as("top_cust"),
        max($"c_acctbal").as("top_bal"),
        count(lit(1)).as("n"))
      .orderBy($"c_nationkey")

  private val q55Sql =
    """WITH m AS (
      |  SELECT c_nationkey, MAX(c_acctbal) AS top_bal, COUNT(*) AS n
      |  FROM customer GROUP BY c_nationkey
      |)
      |SELECT m.c_nationkey, MIN(c.c_custkey) AS top_cust,
      |  ANY_VALUE(m.top_bal) AS top_bal, ANY_VALUE(m.n) AS n
      |FROM m JOIN customer c
      |  ON c.c_nationkey = m.c_nationkey AND c.c_acctbal = m.top_bal
      |GROUP BY m.c_nationkey ORDER BY m.c_nationkey""".stripMargin

  /** GROUPING SETS via the Spark 4 Dataset API (no per-call temp-view
    * registration — catalog mutation from a query function was a
    * smell).
    */
  private def q56(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq($"l_returnflag"), Seq($"l_linestatus"), Seq()),
        $"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast(DecimalType(18, 2))).cast("double").as("qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)

  private val q56Sql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------- text analysis (T)

  /** Token counting + quality stats (LLM-pipeline text analysis):
    * whitespace tokens, char length, mean token length, stopword ratio.
    * Exact integer counts; ratios are exact int/int divisions.
    */
  private def q60(s: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "a", "and", "of", "to", "in")
    val toks = t(s, dir, "documents")
      .select($"doc_id", $"n_chars", explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "")
    toks.groupBy($"doc_id")
      .agg(
        first($"n_chars").as("n_chars"),
        count(lit(1)).as("n_tokens"),
        sum(length($"tok")).as("sum_tok_len"),
        sum(when($"tok".isin(stop: _*), 1L).otherwise(0L)).as("n_stop"))
      .withColumn("mean_tok_len", $"sum_tok_len".cast("double") / $"n_tokens")
      .withColumn("stop_ratio", $"n_stop".cast("double") / $"n_tokens")
      .select($"doc_id", $"n_chars", $"n_tokens", $"mean_tok_len", $"stop_ratio")
      .orderBy($"doc_id")
  }

  private val q60Sql =
    """WITH toks AS (
      |  SELECT doc_id, n_chars, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
      |)
      |SELECT doc_id, ANY_VALUE(n_chars) AS n_chars, COUNT(*) AS n_tokens,
      |  CAST(SUM(LENGTH(tok)) AS DOUBLE) / COUNT(*) AS mean_tok_len,
      |  CAST(SUM(CASE WHEN tok IN ('the','a','and','of','to','in') THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS stop_ratio
      |FROM toks WHERE tok <> ''
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Language/source distribution with quality gate (filter + agg). */
  private def q61(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter($"n_chars" >= 100)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_chars").as("total_chars"),
           (sum($"n_chars").cast("double") / count(lit(1))).as("mean_chars"))
      .orderBy($"lang")

  private val q61Sql =
    """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
      |FROM documents WHERE n_chars >= 100
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Regexp extraction (F8-adjacent string surface): leading word +
    * token-ish count via simple patterns identical in Java regex / RE2.
    */
  private def q62(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter($"doc_id" < 100)
      .select(
        $"doc_id",
        regexp_extract($"text", "^[a-z]+", 0).as("first_word"),
        length(regexp_replace($"text", "[aeiou]", "")).as("n_consonant_chars"),
        ($"text".contains("join")).cast("int").as("mentions_join"))
      .orderBy($"doc_id")

  private val q62Sql =
    """SELECT doc_id,
      |  REGEXP_EXTRACT(text, '^[a-z]+') AS first_word,
      |  LENGTH(REGEXP_REPLACE(text, '[aeiou]', '', 'g')) AS n_consonant_chars,
      |  CAST(CONTAINS(text, 'join') AS INTEGER) AS mentions_join
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------- dedup (D)

  /** Exact dedup on a derived key (no verbatim dup texts exist in the
    * corpus): md5 of the first-5-token prefix — keep min doc_id per
    * group, count members. md5 is byte-identical across engines.
    */
  private def q63(s: SparkSession, dir: String): DataFrame = {
    val key = md5(concat_ws(" ", slice(split($"text", " "), 1, 5)))
    t(s, dir, "documents")
      .select($"doc_id", key.as("dup_key"))
      .groupBy($"dup_key")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_members"))
      .orderBy($"dup_key")
  }

  private val q63Sql =
    """SELECT md5(ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:5], ' ')) AS dup_key,
      |  MIN(doc_id) AS keep_id, COUNT(*) AS n_members
      |FROM documents
      |GROUP BY 1 ORDER BY dup_key""".stripMargin

  /** N-gram (word) Jaccard similarity between adjacent doc pairs —
    * near-dup scoring primitive. Set sizes and intersections are exact
    * ints; jaccard = int/int division (bit-exact).
    */
  private def q64(s: SparkSession, dir: String): DataFrame = {
    // Set-based formulation (round 3, the jaccardVerify shape): ONE
    // collect_set row per doc — no distinct, set semantics applied in
    // the aggregate — then an adjacent-pair equi-join intersected by
    // codegen array_intersect. The former token-level join shuffled
    // the token relation twice and windowed it for sizes (history:
    // round 1 had a sizes aggregate + two joins; round 2 the window;
    // this shape moves each doc's token set ONCE). inter >= 1 keeps
    // the inner-join-over-tokens semantics (disjoint pairs drop).
    val toks = t(s, dir, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "")
    val sets = toks.groupBy($"doc_id").agg(collect_set($"tok").as("set"))
    val a = sets.filter($"doc_id" % 2 === 0)
      .select($"doc_id".as("a_id"), $"set".as("__sa"))
    val b = sets.filter($"doc_id" % 2 === 1)
      .select(($"doc_id" - 1).as("a_id"), $"doc_id".as("b_id"), $"set".as("__sb"))
    a.join(b, "a_id")
      .select($"a_id", $"b_id",
        size(array_intersect($"__sa", $"__sb")).as("inter"),
        size($"__sa").as("sa"), size($"__sb").as("sb"))
      .filter($"inter" >= 1)
      .select($"a_id", $"b_id",
        ($"inter".cast("double") / ($"sa" + $"sb" - $"inter")).as("jaccard"))
      .orderBy($"a_id")
  }

  private val q64Sql =
    """WITH toks AS (
      |  SELECT DISTINCT doc_id, tok FROM (
      |    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents)
      |  WHERE tok <> ''
      |), sizes AS (
      |  SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
      |  FROM toks a JOIN toks b ON a.tok = b.tok AND b.doc_id = a.doc_id + 1
      |  WHERE a.doc_id % 2 = 0
      |  GROUP BY 1, 2
      |)
      |SELECT a_id, b_id,
      |  CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = a_id
      |JOIN sizes sb ON sb.doc_id = b_id
      |ORDER BY a_id""".stripMargin

  /** MinHash signatures with exact cross-engine parity: ONE md5 per
    * token occurrence (its first 15 hex digits as a 60-bit int,
    * reduced mod 2^31-1), then K=8 affine permutations (A_i·h+B_i mod
    * P) — the classic k-permutations-of-one-hash construction.
    * Computed by the per-row [[graft.fn.ParityMinhashSig]] kernel
    * inside the scan's codegen span — NO explode, NO groupBy, NO
    * shuffle on the signature branch (`min` is idempotent over the
    * non-distinct token stream, so skipping the distinct changes
    * nothing; DedupSpec asserts bit-parity with the aggregate form).
    * The round-1 explode + per-k-md5 formulation was the bench's
    * slowest query; the round-4 aggregate form still paid the
    * exploded-stream groupBy this kernel deletes. Unpacked to
    * (doc_id, k, minhash) rows for the oracle shape.
    * graft.ext.Dedup.XxHasher is the string-free production variant.
    */
  private def q65(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism) // single-file scan -> parallelize
    graft.ext.Dedup.minhashSigPerRowParity(docs, "doc_id", "text", n = 1, k = 8)
      .select($"doc_id", posexplode($"sig").as(Seq("k", "minhash")))
      .orderBy($"doc_id", $"k")
  }

  private val q65Sql = {
    val H = graft.ext.Dedup.ParityHasher
    val mins = (0 until 8)
      .map(i => s"MIN((${H.A(i)} * h + ${H.B(i)}) % ${H.P}) AS h$i")
      .mkString(",\n    ")
    val ks = (0 until 8).mkString("[", ", ", "]")
    val hs = (0 until 8).map(i => s"h$i").mkString("[", ", ", "]")
    s"""WITH toks AS (
       |  SELECT DISTINCT doc_id, tok FROM (
       |    SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents)
       |  WHERE tok <> ''
       |), p AS (
       |  SELECT doc_id,
       |    CAST(CONCAT('0x', SUBSTR(md5(tok), 1, 15)) AS BIGINT) % ${H.P} AS h
       |  FROM toks
       |), m AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM p GROUP BY doc_id
       |)
       |SELECT doc_id, k, minhash FROM (
       |  SELECT doc_id, UNNEST($ks) AS k, UNNEST($hs) AS minhash FROM m)
       |ORDER BY doc_id, k""".stripMargin
  }

  // --------------------------------------------------- similarity (V)

  /** Brute-force cosine top-5 per query vector (ANN baseline): queries
    * = vec_id < 5 (broadcast), scored against all vectors, window
    * top-k. Dot/norms fold left-to-right in both engines; rounded to 6
    * decimals to absorb last-ulp divergence.
    */
  private def q70(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val dot = (a: Column, b: Column) => graft.ext.SimJoin.dot(a, b)
    val q = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    val scored = emb.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"q_id")
      .withColumn("cos",
        dot($"qv", $"v") / (sqrt(dot($"qv", $"qv")) * sqrt(dot($"v", $"v"))))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id".asc)
    scored.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"q_id", $"rk", $"vec_id", round($"cos", 6).as("cos_sim"))
      .orderBy($"q_id", $"rk")
  }

  private val q70Sql =
    """WITH e AS (
      |  SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), q AS (
      |  SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5
      |), scored AS (
      |  SELECT q.q_id, e.vec_id,
      |    LIST_DOT_PRODUCT(q.qv, e.v) /
      |      (SQRT(LIST_DOT_PRODUCT(q.qv, q.qv)) * SQRT(LIST_DOT_PRODUCT(e.v, e.v))) AS cos
      |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id
      |), ranked AS (
      |  SELECT q_id, vec_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rk
      |  FROM scored
      |)
      |SELECT q_id, rk, vec_id, ROUND(cos, 6) + 0 AS cos_sim
      |FROM ranked WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  /** Embedding stats: exact norms are not cross-engine stable under
    * aggregation order, but per-row sequential folds are — verify the
    * fold path itself (norm per vector, rounded).
    */
  private def q71(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .filter($"vec_id" < 100)
      .select($"vec_id", $"label",
        round(sqrt(graft.ext.SimJoin.dot($"embedding", $"embedding")), 6).as("l2_norm"),
        size($"embedding").as("dim"))
      .orderBy($"vec_id")

  private val q71Sql =
    """SELECT vec_id, label,
      |  ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
      |  LENGTH(embedding) AS dim
      |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin

  /** JSON extraction from the events props column (inherited surface).
    * The testdata events file is ONE parquet row group — an unsplit
    * scan would run the (expensive, per-row) JSON parse in a single
    * task no matter the core count (sf1: 2.3 s single-task vs 0.3 s
    * spread). Round 14 (verdict item 9): the spreading repartition is
    * CONDITIONAL on the observed scan parallelism, so a real
    * deployment — many files, many row groups — plans NO exchange
    * here, while the single-row-group testdata still spreads before
    * the parse.
    */
  private def q72(s: SparkSession, dir: String): DataFrame = {
    val src = Tables.events(s, dir).select($"event_id", $"props")
    val par = s.sparkContext.defaultParallelism
    val spread =
      if (src.rdd.getNumPartitions < math.min(par, 8)) src.repartition(par)
      else src
    spread
      .select($"event_id",
        get_json_object($"props", "$.k").cast("int").as("k"))
      .groupBy($"k")
      .agg(count(lit(1)).as("n"))
      .orderBy($"k")
  }

  private val q72Sql =
    """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, COUNT(*) AS n
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  // ------------------------------------------------------- registry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_events_tumbling" -> (q50 _),
    "q51_events_sliding" -> (q51 _),
    "q52_events_asof" -> (q52 _),
    "q53_events_pivot" -> (q53 _),
    "q54_events_sessionize" -> (q54 _),
    "q55_argmax_agg" -> (q55 _),
    "q56_grouping_sets" -> (q56 _),
    "q60_text_stats" -> (q60 _),
    "q61_lang_quality" -> (q61 _),
    "q62_regexp_fns" -> (q62 _),
    "q63_dedup_exact" -> (q63 _),
    "q64_ngram_jaccard" -> (q64 _),
    "q65_minhash_sig" -> (q65 _),
    "q70_cosine_topk" -> (q70 _),
    "q71_embed_norms" -> (q71 _),
    "q72_json_extract" -> (q72 _)
  )

  val oracles: Map[String, String] = Map(
    "q50_events_tumbling" -> q50Sql,
    "q51_events_sliding" -> q51Sql,
    "q52_events_asof" -> q52Sql,
    "q53_events_pivot" -> q53Sql,
    "q54_events_sessionize" -> q54Sql,
    "q55_argmax_agg" -> q55Sql,
    "q56_grouping_sets" -> q56Sql,
    "q60_text_stats" -> q60Sql,
    "q61_lang_quality" -> q61Sql,
    "q62_regexp_fns" -> q62Sql,
    "q63_dedup_exact" -> q63Sql,
    "q64_ngram_jaccard" -> q64Sql,
    "q65_minhash_sig" -> q65Sql,
    "q70_cosine_topk" -> q70Sql,
    "q71_embed_norms" -> q71Sql,
    "q72_json_extract" -> q72Sql
  )

}
