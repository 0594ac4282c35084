package graft

import org.apache.spark.sql.functions._
import graft.ext.{Corpus, VecStats}

/** Embedding second-moment statistics + PCA whitening. The covariance
  * INPUT is hash-gated cross-engine by q113; these tests carry the
  * parts SQL cannot express: the Jacobi eigensolver and the whitening
  * laws.
  */
class VecStatsSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))

  test("null vector elements fail loudly instead of skewing the moments") {
    val df = Seq((1L, Seq[java.lang.Double](1.0, null, 3.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("id", "v")
      .select($"id", $"v".cast("array<double>").as("v"))
    val e = intercept[Exception] {
      VecStats.moments(df, $"v")
    }
    assert(e.getMessage != null)
  }

  test("moments == brute force on a tiny frame") {
    val df = Seq(
      (1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 5.0)), (3L, Seq(-1.0, 0.5))
    ).toDF("id", "v")
    val (n, sx, sxx) = VecStats.moments(df, $"v")
    assert(n === 3)
    assert(sx.toSeq === Seq(3.0, 7.5))
    // packed upper triangle: (0,0), (0,1), (1,1)
    assert(sxx.toSeq === Seq(1.0 + 9.0 + 1.0, 2.0 + 15.0 - 0.5, 4.0 + 25.0 + 0.25))
  }

  test("jacobiEigen: reconstruction, orthonormality, descending order, sign rule") {
    // symmetric with known spectrum: diag(5, 2) rotated 30°
    val c = math.cos(math.Pi / 6); val s = math.sin(math.Pi / 6)
    val a = Array(
      Array(5 * c * c + 2 * s * s, (5 - 2) * c * s),
      Array((5 - 2) * c * s, 5 * s * s + 2 * c * c))
    val (eig, vecs) = VecStats.jacobiEigen(a)
    assert(math.abs(eig(0) - 5.0) < 1e-9 && math.abs(eig(1) - 2.0) < 1e-9)
    // rows are unit, orthogonal, A·v = λ·v
    for (r <- 0 until 2) {
      val v = vecs(r)
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
      val av = Array(a(0)(0) * v(0) + a(0)(1) * v(1), a(1)(0) * v(0) + a(1)(1) * v(1))
      assert(math.abs(av(0) - eig(r) * v(0)) < 1e-8)
      assert(math.abs(av(1) - eig(r) * v(1)) < 1e-8)
      // sign rule: largest-|component| positive
      assert(v(v.zipWithIndex.maxBy(t => math.abs(t._1))._2) > 0)
    }
    assert(math.abs(vecs(0)(0) * vecs(1)(0) + vecs(0)(1) * vecs(1)(1)) < 1e-9)
  }

  test("jacobiEigen on the real 64-dim covariance: Frobenius reconstruction") {
    val (_, _, cov) = VecStats.meanCovariance(emb, $"v")
    val d = cov.length
    val (eig, vecs) = VecStats.jacobiEigen(cov)
    assert(eig.sliding(2).forall(p => p(0) >= p(1) - 1e-12), "descending")
    // A == Σ λ_r v_r v_rᵀ
    var frob = 0.0; var norm = 0.0
    for (i <- 0 until d; j <- 0 until d) {
      var rec = 0.0
      var r = 0
      while (r < d) { rec += eig(r) * vecs(r)(i) * vecs(r)(j); r += 1 }
      frob += (rec - cov(i)(j)) * (rec - cov(i)(j))
      norm += cov(i)(j) * cov(i)(j)
    }
    assert(math.sqrt(frob) < 1e-8 * math.max(1.0, math.sqrt(norm)),
      s"reconstruction error ${math.sqrt(frob)}")
  }

  test("pcaWhiten: whitened corpus has identity covariance on the kept components") {
    val k = 8
    val (out, eig, _) = VecStats.pcaWhiten(emb, "vec_id", "v", k, eps = 0.0)
    assert(eig.length === k && eig.forall(_ > 0))
    val (n, _, covW) = VecStats.meanCovariance(
      out.select($"vec_id", $"whitened".as("v")), $"v")
    assert(n === emb.count())
    for (i <- 0 until k; j <- 0 until k) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(covW(i)(j) - want) < 1e-6,
        s"cov($i,$j) = ${covW(i)(j)}")
    }
  }

  test("pcaWhiten plan is narrow: no exchange, literal projection") {
    val (out, _, _) = VecStats.pcaWhiten(emb, "vec_id", "v", 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"whitening must not shuffle:\n$plan")
  }

  test("hashSplit: deterministic, exhaustive, ~8/1/1, auditable md5 arithmetic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Corpus.hashSplit(docs, $"doc_id")
    val b = Corpus.hashSplit(docs.repartition(7), $"doc_id")
    // every row assigned; assignment independent of partitioning
    assert(a.filter($"split".isNull).isEmpty)
    val ma = a.select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val mb = b.select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(ma === mb)
    val frac = ma.values.groupBy(identity).view.mapValues(_.size.toDouble / ma.size).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, frac.toString)
    assert(frac("val") > 0.04 && frac("val") < 0.16, frac.toString)
    assert(frac("test") > 0.04 && frac("test") < 0.16, frac.toString)
    // custom weights cover the id space in cumulative order
    val c = Corpus.hashSplit(docs, $"doc_id", Seq("a" -> 1, "b" -> 1))
      .groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(c.keySet === Set("a", "b"))
  }
}
