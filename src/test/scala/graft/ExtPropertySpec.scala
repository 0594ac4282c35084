package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextOps}

/** Randomized-input invariants for the ext/ modules (fixed seed —
  * deterministic): shingle counting laws, Jaccard bounds, dedup
  * subset-ness, minhash containment.
  */
class ExtPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")

  private def sentence(len: Int): String =
    Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  private lazy val docs = (0 until 60)
    .map(i => (i.toLong, sentence(rnd.nextInt(30))))
    .toDF("doc_id", "text")

  test("shingle count law: distinct shingles <= max(0, tokens - n + 1)") {
    for (n <- Seq(1, 2, 3)) {
      val counts = Dedup.shingles(docs, "doc_id", "text", n)
        .groupBy($"doc_id").count().as[(Long, Long)].collect().toMap
      val toks = docs.select($"doc_id",
          size(array_remove(split($"text", " "), "")).as("t"))
        .as[(Long, Int)].collect().toMap
      toks.foreach { case (id, t) =>
        val c = counts.getOrElse(id, 0L)
        assert(c <= math.max(0, t - n + 1), s"n=$n id=$id")
        if (t >= n) assert(c >= 1, s"n=$n id=$id")
      }
    }
  }

  test("pair invariants: jaccard in [0,1], a_id < b_id, dedup output is a subset") {
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text",
      n = 2, k = 16, b = 8, minJaccard = 0.0)
    val rows = pairs.as[(Long, Long, Double)].collect()
    rows.foreach { case (a, b, j) =>
      assert(a < b)
      assert(j >= 0.0 && j <= 1.0)
    }
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", "text",
        n = 2, k = 16, b = 8, minJaccard = 0.9)
      .select($"doc_id").as[Long].collect().toSet
    val all = docs.select($"doc_id").as[Long].collect().toSet
    assert(kept.subsetOf(all))
  }

  test("minhash containment: identical docs share full signatures") {
    val dup = docs.limit(5).union(docs.limit(5)
      .withColumn("doc_id", $"doc_id" + 1000))
    val sigs = Dedup.minhashSignatures(
        Dedup.shingles(dup, "doc_id", "text", 2), "doc_id", k = 8)
      .as[(Long, Seq[Long])].collect().toMap
    (0L until 5L).foreach { i =>
      if (sigs.contains(i)) assert(sigs(i) === sigs(i + 1000), i)
    }
  }

  test("text profile totals: 0 <= stop_ratio <= 1, n_distinct <= n_tokens") {
    val p = TextOps.profile(docs.filter(length($"text") > 0), "doc_id", "text")
      .select($"doc_id", $"n_tokens", $"n_distinct", $"stop_ratio", $"alpha_ratio")
      .as[(Long, Long, Long, Double, Double)].collect()
    p.foreach { case (id, nt, nd, sr, ar) =>
      assert(nd <= nt, id)
      assert(sr >= 0.0 && sr <= 1.0, id)
      assert(ar >= 0.0 && ar <= 1.0, id)
    }
  }
}
