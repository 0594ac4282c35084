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
}
