package graft

import org.apache.spark.sql.functions._
import graft.ext.Bpe

/** BPE trainer + encoder: hand-traced merge learning (tie rules
  * included), encode golden vectors incl. unseen words, corpus
  * round-trip via trainOn, and the narrow-plan property.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // dictionary {aaab:10, aab:5} hand-trace:
  //   r0: (a,a) 25 beats (a,b) 15            -> "aa"
  //   r1: (aa,a) 10 ties (a,b) 10, lex smaller is (a,b) -> "ab"
  //   r2: (aa,ab) 10 beats (aa,b) 5          -> "aaab"
  //   r3: (aa,b) 5                           -> "aab"
  private val dict = Seq("aaab" -> 10L, "aab" -> 5L)
  private val wantMerges =
    Seq(("a", "a"), ("a", "b"), ("aa", "ab"), ("aa", "b"))

  test("train: hand-traced merges with frequency-then-lex tie rule") {
    assert(Bpe.train(dict, 4) === wantMerges)
    // requesting more merges than exist stops when no pair remains
    assert(Bpe.train(dict, 100) === wantMerges)
    assert(Bpe.train(dict, 0) === Seq.empty)
    assert(Bpe.train(Seq("x" -> 3L), 5) === Seq.empty) // 1-char word: no pair
  }

  test("encode: golden vectors, unseen words, multi-word, empty") {
    val df = Seq(
      (1L, "aaab"), (2L, "ab"), (3L, "ba"), (4L, "aabb"),
      (5L, "aaab aab ba"), (6L, "")).toDF("doc_id", "text")
    val got = df.select($"doc_id", Bpe.encode($"text", wantMerges).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq("aaab"))
    assert(got(2L) === Seq("ab"))
    assert(got(3L) === Seq("b", "a"))          // reversed: no rule applies
    assert(got(4L) === Seq("aab", "b"))        // unseen word, rank order
    assert(got(5L) === Seq("aaab", "aab", "b", "a"))
    assert(got(6L) === Seq.empty)
    val counts = df.select($"doc_id", Bpe.tokenCount($"text", wantMerges).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(counts(5L) === 4 && counts(6L) === 0)
  }

  test("trainOn a corpus reproduces the dictionary-trained merges") {
    // 10 'aaab' + 5 'aab' spread over docs
    val docs = Seq(
      (1L, "aaab aaab aaab aab"), (2L, "aaab aaab aaab aab"),
      (3L, "aaab aaab aaab aab"), (4L, "aaab aab aaab aab")
    ).toDF("doc_id", "text")
    // dictionary: aaab -> 11, aab -> 5; same trace as the hand case
    // (ratios preserved, same winners and same (aa,a)/(a,b) tie)
    val m = Bpe.trainOn(docs, "text", numMerges = 4)
    assert(m === wantMerges, s"got $m")
  }

  test("encode plan is narrow: merge table rides the expression") {
    val docs = Seq((1L, "aaab")).toDF("doc_id", "text")
    val plan = docs.select(Bpe.encode($"text", wantMerges))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("losslessness law: concatenated BPE tokens reproduce the text minus spaces") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val merges = Bpe.trainOn(real, "text", numMerges = 30)
    val bad = real.select(
        concat_ws("", Bpe.encode($"text", merges)).as("joined"),
        regexp_replace($"text", " ", "").as("squashed"))
      .filter($"joined" =!= $"squashed")
    assert(bad.isEmpty, "BPE must never lose or invent characters")
  }

  test("non-BMP text: code-point segments, never surrogate halves (train + encode)") {
    // U+1F600 GRINNING FACE — two UTF-16 units, ONE BPE alphabet symbol
    val emoji = new String(Character.toChars(0x1F600))
    val dict = Seq(s"ab$emoji" -> 5L, s"$emoji$emoji" -> 3L)
    val merges = Bpe.train(dict, numMerges = 2)
    // every learned side is whole code points (no lone surrogates)
    merges.foreach { case (l, r) =>
      for (s <- Seq(l, r); ch <- s.toCharArray)
        assert(!Character.isSurrogate(ch) || s.length > 1,
          s"lone surrogate in merge ($l, $r)")
    }
    // most frequent pair is (a, b) then (ab, emoji) under the traced rules
    assert(merges.head === (("a", "b")))
    val df = Seq((1L, s"ab$emoji xy$emoji")).toDF("doc_id", "text")
    val toks = df.select(Bpe.encode($"text", merges).as("t"))
      .head.getSeq[String](0)
    // unseen word "xy<emoji>" stays as code-point singles — the emoji
    // must come through whole, not as two surrogate tokens
    assert(toks.contains(emoji))
    assert(toks.forall(t => t.codePointCount(0, t.length) >= 1 &&
      !(t.length == 1 && Character.isSurrogate(t.charAt(0)))))
    // losslessness holds across the plane boundary
    assert(toks.mkString("") === s"ab$emoji" + s"xy$emoji")
  }

  test("real corpus: BPE count bounded by chars and never below word count... sanity") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val merges = Bpe.trainOn(real, "text", numMerges = 50)
    assert(merges.size === 50)
    val stats = real.select(
        Bpe.tokenCount($"text", merges).as("bpe"),
        size(array_remove(split($"text", " "), "")).as("ws"),
        length(regexp_replace($"text", " ", "")).as("chars"))
      .agg(sum($"bpe"), sum($"ws"), sum($"chars"))
      .head
    val (bpe, ws, chars) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    assert(bpe >= ws, "BPE tokens can never merge across words")
    assert(bpe <= chars, "BPE tokens can never exceed characters")
  }
}
