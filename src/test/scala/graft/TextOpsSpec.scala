package graft

import org.apache.spark.sql.functions._
import graft.ext.TextOps

/** ext/TextOps — language id on real language snippets, quality
  * monotonicity, fingerprint behavior.
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat and it was happy that the sun is out"),
    (2L, "der hund ist nicht mit der katze und das ist ein problem zu haben"),
    (3L, "le chat est dans la maison et il est content que le soleil pour"),
    (4L, "el perro es un animal y los gatos son una familia en la casa por"),
    (5L, "深度学习模型 需要 大量 数据 进行 训练"),
    (6L, "zzz qqq xxx www"),
    (7L, "the quick brown fox jumps over the lazy dog near the old river bank")
  ).toDF("doc_id", "text")

  test("language id recovers en/de/fr/es, CJK short-circuits to zh, gibberish is und") {
    val langs = TextOps.profile(docs, "doc_id", "text")
      .select($"doc_id", $"lang_id").as[(Long, String)].collect().toMap
    assert(langs(1L) === "en")
    assert(langs(2L) === "de")
    assert(langs(3L) === "fr")
    assert(langs(4L) === "es")
    assert(langs(5L) === "zh")
    assert(langs(6L) === "und")
  }

  test("quality is in [0,1] and rewards natural text over gibberish") {
    val q = TextOps.profile(docs, "doc_id", "text")
      .select($"doc_id", $"quality").as[(Long, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(6L)) // stopword-bearing English beats gibberish
  }

  test("token stats match hand counts") {
    val p = TextOps.profile(docs.filter($"doc_id" === 7L), "doc_id", "text")
      .select($"n_tokens", $"n_distinct").as[(Long, Long)].collect().head
    assert(p._1 === 14)
    assert(p._2 === 12) // "the" appears 3x
  }

  test("bpe-ish tokenizer: contractions, digit runs, punctuation split sub-word") {
    val d = Seq((1L, "don't split 1234 tokens, e.g. foo-bar!")).toDF("doc_id", "text")
    val toks = TextOps.bpeishTokens(d, "doc_id", "text")
      .select($"tok").as[String].collect().toSeq
    assert(toks === Seq("don", "'t", " split", " 1234", " tokens", ",", " e",
      ".", "g", ".", " foo", "-", "bar", "!"))
    val counts = TextOps.tokenCounts(d, "doc_id", "text")
      .select($"n_ws_tokens", $"n_bpeish_tokens").as[(Int, Int)].collect().head
    assert(counts === ((6, 14))) // punctuation-heavy: bpe-ish count >> whitespace
  }

  test("fingerprint: equal for token-identical docs, differs otherwise") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "alpha beta gamma delta zeta")
    ).toDF("doc_id", "text")
    val fp = TextOps.fingerprint(d, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("tfIdf: hand-computed scores; rare term outranks common term") {
    // 3 docs; "rare" in doc 1 only, "common" in all
    val d = Seq(
      (1L, "common rare rare"),
      (2L, "common alpha"),
      (3L, "common beta")
    ).toDF("doc_id", "text")
    val got = TextOps.tfIdf(d, "doc_id", "text")
      .as[(Long, String, Long, Long, Double)].collect()
      .map { case (id, tok, tf, df, s) => (id, tok) -> ((tf, df, s)) }.toMap
    def idf(df: Long) = math.log(4.0 / (1 + df)) + 1
    assert(got((1L, "rare"))._1 === 2L)
    assert(got((1L, "rare"))._2 === 1L)
    assert(math.abs(got((1L, "rare"))._3 - 2 * idf(1)) < 1e-12)
    assert(math.abs(got((2L, "common"))._3 - idf(3)) < 1e-12)
    // within doc 1, rare (tf 2, df 1) must outrank common (tf 1, df 3)
    val top = TextOps.tfIdfTopK(d, "doc_id", "text", k = 1)
      .filter($"doc_id" === 1L).select($"tok").as[String].head()
    assert(top === "rare")
  }

  test("redactPii: each pattern fires, counts exact, clean text untouched") {
    val d = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "call +1 (555) 010-4477 or 555 010 4477"),
      (3L, "card 4111111111111111 charged"),
      (4L, "clean text with numbers 12 345 and a.b"),
      (5L, "a@b.io then 4111111111111111 then +44 20 7946 0958")
    ).toDF("doc_id", "text")
    val got = TextOps.redactPii(d, "text")
      .select($"doc_id", $"n_pii", $"text_redacted")
      .as[(Long, Int, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((1, "mail <EMAIL> now")))
    assert(got(2L) === ((2, "call <PHONE> or <PHONE>")))
    assert(got(3L) === ((1, "card <CARD> charged")))
    assert(got(4L) === ((0, "clean text with numbers 12 345 and a.b")))
    assert(got(5L) === ((3, "<EMAIL> then <CARD> then <PHONE>")))
  }

  test("profileNarrow == profile bit-exact on varied + real corpus; plan narrow") {
    val hand = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it was good"),
      (2L, "der hund und die katze ist nicht mit dem ball zu spielen"),
      (3L, "对酒当歌 人生几何 譬如朝露 去日苦多"),
      (4L, "zz9 !!! ??? ,,, 123"),
      (5L, ""),                     // no tokens -> dropped by both forms
      (6L, "   "),                  // only spaces -> dropped by both
      (7L, "singleton"),
      (8L, "a b a b a b a b")
    ).toDF("doc_id", "text")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id" + 1000000L as "doc_id", $"text")
      .unionByName(hand)
    val cols = Seq("doc_id", "n_tokens", "n_distinct", "mean_tok_len",
      "stop_ratio", "alpha_ratio", "punct_ratio", "lang_id", "quality")
    val agg = TextOps.profile(docs, "doc_id", "text")
      .select(cols.map(col): _*).orderBy($"doc_id").collect().toSeq
    val nar = TextOps.profileNarrow(docs, "doc_id", "text")
      .select(cols.map(col): _*).orderBy($"doc_id").collect().toSeq
    assert(agg.nonEmpty)
    assert(nar === agg) // bit-exact, including every double ratio
    // the narrow form must have NO shuffle and NO generator
    val plan = TextOps.profileNarrow(docs.filter($"doc_id" < 100), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Generate"), plan)
  }

  test("SQL surface: text_profile callable after install, null on empty") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT text_profile('the cat and the dog') AS p,
        |       text_profile('') AS none""".stripMargin).collect().head
    val p = r.getStruct(0)
    assert(p.getAs[Long]("n_tokens") === 5L)
    assert(p.getAs[Long]("n_distinct") === 4L)
    assert(p.getAs[String]("lang_id") === "en")
    assert(r.isNullAt(1))
  }

  test("invertedIndex: postings sorted by doc, tf exact, minDf cut") {
    val d = Seq(
      (3L, "b a a"),
      (1L, "a b b a"),
      (2L, "c a")
    ).toDF("doc_id", "text")
    val got = TextOps.invertedIndex(d, "doc_id", "text")
      .as[(String, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") === ((3L, "1:2 2:1 3:2")))
    assert(got("b") === ((2L, "1:2 3:1")))
    assert(got("c") === ((1L, "2:1")))
    val cut = TextOps.invertedIndex(d, "doc_id", "text", minDf = 2)
      .select($"tok").as[String].collect().toSet
    assert(cut === Set("a", "b"))
  }

  test("invertedIndexSharded: planted hot term — bounded segments, lossless merge, cold terms byte-identical") {
    // 400 docs all containing the hot term "the"; every doc also has a
    // unique cold term. shardSize = 50 forces the hot term into
    // ceil(400/50) = 8 hash-routed segments.
    val d = (0L until 400L).map(i => (i, s"the w$i")).toDF("doc_id", "text")
    val sharded = TextOps.invertedIndexSharded(d, "doc_id", "text", shardSize = 50L)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
    val hot = sharded.filter(_._1 == "the")
    assert(hot.map(_._2).sorted.toSeq === (0 until 8), "8 segments, ids 0..7")
    assert(hot.forall(_._3 === 8) && hot.forall(_._4 === 400L))
    // bounded task input: every segment well under the unsharded 400
    // (hash-uniform ⇒ ~50/segment; 3× headroom kills flakiness)
    assert(hot.map(_._5).max <= 150L, s"max segment ${hot.map(_._5).max}")
    assert(hot.map(_._5).sum === 400L)
    // lossless: merged segments == the unsharded posting set
    val mergedDocs = hot.flatMap(_._6.split(" ")).toSet
    val unsharded = TextOps.invertedIndex(d, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(mergedDocs === unsharded("the").split(" ").toSet)
    // cold terms: single segment, postings byte-identical
    val cold = sharded.filter(_._1 != "the")
    assert(cold.forall(c => c._3 == 1 && c._2 == 0 && c._4 == 1L))
    cold.foreach(c => assert(c._6 === unsharded(c._1), c._1))
  }

  test("tfIdf salted fallback: salted exchange in the plan, answers identical under a planted hot key") {
    // 10% of all (doc, tok) rows share one hot token — the stopword
    // skew shape. broadcastVocab = false must route through
    // Salt.saltedJoin and still match the broadcast plan's answer.
    val d = (0L until 200L).map { i =>
      val uniq = s"u$i v$i w$i x$i y$i z$i a$i b$i c$i"
      (i, s"hot $uniq") // 1 of 10 tokens per doc is the hot key
    }.toDF("doc_id", "text")
    val viaBroadcast = TextOps.tfIdf(d, "doc_id", "text", broadcastVocab = true)
    val viaSalt = TextOps.tfIdf(d, "doc_id", "text", broadcastVocab = false, nSalts = 8)
    assert(viaSalt.queryExecution.executedPlan.toString.contains("__salt"),
      "salted join key missing from the executed plan")
    val key = Seq("doc_id", "tok")
    assert(viaSalt.exceptAll(viaBroadcast).count() === 0)
    assert(viaBroadcast.exceptAll(viaSalt).count() === 0)
    assert(viaSalt.count() === 200L * 10)
    val _ = key
  }

  test("termFrequencies: row-identical to the explode+groupBy form, shuffle-free") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
      .unionByName(Seq(
        (9000001L, "a  b   a b a"),    // multi-space runs, duplicate toks
        (9000002L, ""),                // no tokens -> no rows
        (9000003L, "   "),             // only spaces -> no rows
        (9000004L, "solo")).toDF("doc_id", "text"))
      .unionByName(Seq((9000005L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))       // null text -> no rows
    val viaGroupBy = TextOps.tokens(d, "doc_id", "text")
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
      .orderBy($"doc_id", $"tok").collect().toSeq
    val viaKernel = TextOps.termFrequencies(d, "doc_id", "text")
      .select($"doc_id", $"tok", $"tf")
      .orderBy($"doc_id", $"tok").collect().toSeq
    assert(viaGroupBy.nonEmpty)
    assert(viaKernel === viaGroupBy)
    // narrow: no exchange anywhere in the tf table build
    val plan = TextOps.termFrequencies(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("bm25 narrow form: no corpus shuffle before the 1-row global aggregate") {
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "a dog and a cat"),
      (3L, ""),                        // token-less: excluded from N/avgdl
      (4L, "dog dog dog")).toDF("doc_id", "text")
    val scored = TextOps.bm25(d, "doc_id", "text", Seq("cat", "dog"))
    // exactly the matching docs, scores positive
    val got = scored.as[(Long, Double)].collect().toMap
    assert(got.keySet === Set(1L, 2L, 4L))
    assert(got.values.forall(_ > 0.0))
    // doc 2 matches BOTH query tokens; doc 1 only "cat" (and is longer)
    assert(got(2L) > got(1L))
    // plan: the only exchanges feed the 1-row global aggregate and its
    // broadcast back — nothing hash-partitions corpus rows by a key
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(doc_id"), plan)
    assert(!plan.contains("hashpartitioning(tok"), plan)
  }

  test("repetitionStats: exact fractions; repetition-free vs looped text") {
    val d = Seq(
      (1L, "a b c d e"),          // 3 distinct 3-grams, all unique
      (2L, "x y x y x y x y"),    // 6 3-grams, 2 distinct ("x y x","y x y")
      (3L, "a b")                 // shorter than n -> no row
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionStats(d, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 3L, 3L, 0.0, 1.0 / 3)))
    assert(got(2L) === ((2L, 6L, 2L, 1.0 - 2.0 / 6, 3.0 / 6)))
    assert(!got.contains(3L))
  }
}
