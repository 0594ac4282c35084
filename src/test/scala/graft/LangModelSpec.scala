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

  test("perplexity one-call form runs end-to-end on real docs") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = LangModel.perplexity(real, "doc_id", "text")
    assert(out.count() > 0)
    assert(out.filter($"ppl" <= 1.0).isEmpty, "perplexity must exceed 1")
  }
}
