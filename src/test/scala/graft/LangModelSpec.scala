package graft

import org.apache.spark.sql.functions._
import graft.ext.LangModel

/** Unigram LM training + perplexity scoring: hand-computed oracle on
  * a tiny corpus, kernel-vs-join-form parity, unseen-token smoothing,
  * and the narrow-plan property of the broadcast scoring path.
  */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  // corpus: T = 6 tokens, V = 3 distinct; counts a=3, b=2, c=1
  private lazy val docs = Seq(
    (1L, "a a b"), (2L, "a b c"), (3L, ""), (4L, "   ")).toDF("doc_id", "text")

  test("unigram counts and hand-computed add-1 NLL") {
    val counts = LangModel.unigramCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    val scored = LangModel.scoreNll(docs, "doc_id", "text",
        LangModel.unigramCounts(docs, "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // denom = T + aV = 6 + 3 = 9; p(a)=4/9, p(b)=3/9, p(c)=2/9
    val pa = 4.0 / 9; val pb = 3.0 / 9; val pc = 2.0 / 9
    val nll1 = -(math.log(pa) + math.log(pa) + math.log(pb)) / 3
    val nll2 = -(math.log(pa) + math.log(pb) + math.log(pc)) / 3
    assert(scored.keySet === Set(1L, 2L), "token-less docs must drop")
    assert(scored(1L)._1 === 3L && math.abs(scored(1L)._2 - nll1) < 1e-12)
    assert(scored(2L)._1 === 3L && math.abs(scored(2L)._2 - nll2) < 1e-12)
  }

  test("unseen tokens smooth instead of blowing up; ppl = exp(avg_nll)") {
    val lm = LangModel.unigramCounts(docs, "text")
    val fresh = Seq((9L, "zz zz")).toDF("doc_id", "text")
    val row = LangModel.scoreNll(fresh, "doc_id", "text", lm).head
    // p(zz) = (0+1)/9
    val want = -math.log(1.0 / 9)
    assert(math.abs(row.getDouble(2) - want) < 1e-12)
    assert(math.abs(row.getDouble(3) - math.exp(want)) < 1e-9)
  }

  test("broadcast kernel path matches the join-form fallback") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val lm = LangModel.unigramCounts(real, "text")
    val t = lm.agg(sum($"cnt"), count(lit(1))).head
    val (total, vocab) = (t.getLong(0), t.getLong(1))
    val kernel = LangModel.scoreNll(real, "doc_id", "text", lm)
      .select($"doc_id", $"n_toks", $"avg_nll")
    val joined = LangModel.scoreNllJoined(real, "doc_id", "text", lm,
        total, vocab, alpha = 1.0)
      .select($"doc_id", $"n_toks", $"avg_nll")
    val diff = kernel.as("k").join(joined.as("j"), "doc_id")
      .filter(col("k.n_toks") =!= col("j.n_toks") ||
        abs(col("k.avg_nll") - col("j.avg_nll")) > lit(1e-9))
    assert(diff.isEmpty, "kernel and join paths must agree")
    // forcing the fallback via a zero broadcast guard takes the same path
    val forced = LangModel.scoreNll(real, "doc_id", "text", lm,
      maxBroadcastVocab = 1L)
    assert(forced.count() === kernel.count())
  }

  test("scoring plan is narrow: model rides the expression, no scoring shuffle") {
    val lm = LangModel.unigramCounts(docs, "text")
    val model = lm.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    import org.apache.spark.sql.{graftbridge => gb}
    val nll = gb.column(graft.fn.UnigramNll(
      gb.expression($"text"), model, 6L, 3L, 1.0))
    val plan = docs.select($"doc_id", nll.as("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("bigram counts respect doc boundaries; hand-computed interpolated NLL") {
    // corpus: "a b" and "b a b" — bigrams: (a,b)x2, (b,a)x1; the
    // doc boundary between "a b" and "b a b" contributes NO (b,b)
    val docs2 = Seq((1L, "a b"), (2L, "b a b")).toDF("doc_id", "text")
    val bi = LangModel.bigramCounts(docs2, "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi === Map(("a", "b") -> 2L, ("b", "a") -> 1L))
    val uniC = LangModel.unigramCounts(docs2, "text")
    val scored = LangModel.scoreBigramNll(docs2, "doc_id", "text", uniC,
        LangModel.bigramCounts(docs2, "text"), alpha = 1.0, lambda = 0.7)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // uni: a->2, b->3; T=5, V=2, denom=7
    val (lam, om) = (0.7, 1.0 - 0.7)
    def uniT(c: Double) = (c + 1.0) / 7.0
    // doc 1 "a b": p(a)=uniT(2); p(b|a)= .7*2/2 + .3*uniT(3)
    val d1 = -(math.log(uniT(2)) +
      math.log(lam * 2 / 2 + om * (3 + 1.0) / 7.0)) / 2
    // doc 2 "b a b": p(b)=uniT(3); p(a|b)=.7*1/3+.3*uniT(2); p(b|a)=.7*2/2+.3*uniT(3)
    val d2 = -(math.log(uniT(3)) +
      math.log(lam * 1 / 3 + om * (2 + 1.0) / 7.0) +
      math.log(lam * 2 / 2 + om * (3 + 1.0) / 7.0)) / 3
    assert(math.abs(scored(1L) - d1) < 1e-12, s"${scored(1L)} vs $d1")
    assert(math.abs(scored(2L) - d2) < 1e-12, s"${scored(2L)} vs $d2")
  }

  test("bigram LM separates fluent word order from scrambled order") {
    // train on consistent word order; score a doc with the SAME tokens
    // in fluent vs scrambled order — unigram ppl ties, bigram must not
    val train = (1L to 20L).map(i => (i, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val uni = LangModel.unigramCounts(train, "text")
    val bi = LangModel.bigramCounts(train, "text")
    val probe = Seq((100L, "the cat sat on the mat"),
      (101L, "mat the on sat cat the")).toDF("doc_id", "text")
    val ppl = LangModel.scoreBigramNll(probe, "doc_id", "text", uni, bi)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ppl(100L) < ppl(101L),
      s"fluent ${ppl(100L)} must beat scrambled ${ppl(101L)}")
    val uniPpl = LangModel.scoreNll(probe, "doc_id", "text", uni)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(uniPpl(100L) - uniPpl(101L)) < 1e-9,
      "unigram cannot see order — the bigram separation is real signal")
  }

  test("perplexity one-call form runs end-to-end on real docs") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = LangModel.perplexity(real, "doc_id", "text")
    assert(out.count() > 0)
    assert(out.filter($"ppl" <= 1.0).isEmpty, "perplexity must exceed 1")
  }

  test("stupid backoff: hand-computed cascade on a tiny corpus") {
    // corpus "a b c" + "a b d": N=6; c(a)=c(b)=2, c(c)=c(d)=1;
    // c(a b)=2, c(b c)=c(b d)=1; c(a b c)=c(a b d)=1
    val corpus = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val uni = LangModel.unigramCounts(corpus, "text")
    val bi = LangModel.bigramCounts(corpus, "text")
    val tri = LangModel.trigramCounts(corpus, "text")
    val got = LangModel.scoreStupidBackoff(corpus, "doc_id", "text", uni, bi, tri)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc 1: S(a)=2/6; S(b|a)=c(ab)/c(a)=2/2; S(c|ab)=c(abc)/c(ab)=1/2
    val want1 = -(math.log(2.0 / 6) + math.log(2.0 / 2.0) + math.log(1.0 / 2.0)) / 3
    assert(got(1L)._1 === 3L && math.abs(got(1L)._2 - want1) < 1e-12)
    assert(math.abs(got(2L)._2 - want1) < 1e-12) // symmetric corpus
    // unseen trigram backs off: "b c" seen, "a c" unseen
    val probe = Seq((9L, "b c")).toDF("doc_id", "text")
    val p = LangModel.scoreStupidBackoff(probe, "doc_id", "text", uni, bi, tri).head
    // S(b)=2/6; S(c|b)=c(bc)/c(b)=1/2
    val wantP = -(math.log(2.0 / 6) + math.log(1.0 / 2.0)) / 2
    assert(math.abs(p.getDouble(2) - wantP) < 1e-12)
    // OOV floor: token never seen → S = 0.4-cascaded 1/N, finite
    val oov = Seq((10L, "zz yy xx")).toDF("doc_id", "text")
    val o = LangModel.scoreStupidBackoff(oov, "doc_id", "text", uni, bi, tri).head
    val s1 = 1.0 / 6
    val wantO = -(math.log(s1) + math.log(0.4 * s1) + math.log(0.4 * 0.4 * s1)) / 3
    assert(math.abs(o.getDouble(2) - wantO) < 1e-12)
  }

  test("stupid backoff: broadcast kernel matches the join-form fallback") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val uni = LangModel.unigramCounts(real, "text")
    val bi = LangModel.bigramCounts(real, "text")
    val tri = LangModel.trigramCounts(real, "text")
    val kernel = LangModel.scoreStupidBackoff(real, "doc_id", "text", uni, bi, tri)
      .select($"doc_id", $"n_toks", round($"avg_nls", 9).as("avg_nls"))
      .orderBy($"doc_id").collect()
    val joined = LangModel.scoreStupidBackoffJoined(real, "doc_id", "text",
        uni, bi, tri)
      .select($"doc_id", $"n_toks", round($"avg_nls", 9).as("avg_nls"))
      .orderBy($"doc_id").collect()
    assert(kernel.length === joined.length && kernel.length > 0)
    kernel.zip(joined).foreach { case (k, j) =>
      assert(k.getLong(0) === j.getLong(0))
      assert(k.getLong(1) === j.getLong(1), s"doc ${k.getLong(0)} n_toks")
      assert(math.abs(k.getDouble(2) - j.getDouble(2)) < 1e-9,
        s"doc ${k.getLong(0)} avg_nls ${k.getDouble(2)} vs ${j.getDouble(2)}")
    }
  }

  test("stupid backoff: maxBroadcast=1 forces the guard onto the join form, same answer") {
    // the join form is the 100 TB serving path; this drives it through
    // the PUBLIC entry point's guard (not by calling it directly), so
    // the boundary routing itself is what's under test — on the same
    // corpus the graded q119 scores
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val uni = LangModel.unigramCounts(real, "text")
    val bi = LangModel.bigramCounts(real, "text")
    val tri = LangModel.trigramCounts(real, "text")
    val kernelDf = LangModel.scoreStupidBackoff(real, "doc_id", "text", uni, bi, tri)
    val forcedDf = LangModel.scoreStupidBackoff(real, "doc_id", "text", uni, bi, tri,
      maxBroadcast = 1L)
    val kp = kernelDf.queryExecution.executedPlan.toString
    val fp = forcedDf.queryExecution.executedPlan.toString
    assert(kp.contains("sb_trigram_nll") && !kp.contains("SortMergeJoin"),
      s"kernel path not narrow:\n${kp.take(500)}")
    assert(!fp.contains("sb_trigram_nll"), s"guard did not rou" +
      s"te to the join form:\n${fp.take(500)}")
    val kernel = kernelDf
      .select($"doc_id", $"n_toks", round($"avg_nls", 9).as("avg_nls"))
      .orderBy($"doc_id").collect()
    val forced = forcedDf
      .select($"doc_id", $"n_toks", round($"avg_nls", 9).as("avg_nls"))
      .orderBy($"doc_id").collect()
    assert(kernel.length === forced.length && kernel.length > 0)
    kernel.zip(forced).foreach { case (k, j) =>
      assert(k.getLong(0) === j.getLong(0))
      assert(k.getLong(1) === j.getLong(1), s"doc ${k.getLong(0)} n_toks")
      assert(math.abs(k.getDouble(2) - j.getDouble(2)) < 1e-9,
        s"doc ${k.getLong(0)} avg_nls ${k.getDouble(2)} vs ${j.getDouble(2)}")
    }
  }
}
