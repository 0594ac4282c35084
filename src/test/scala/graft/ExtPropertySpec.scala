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

  test("winnowing laws on random docs: kernel == brute force, density, subset") {
    def hash60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).take(8)
        .map(b => f"${b & 0xff}%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def brute(t: String, k: Int, w: Int): Set[Long] = {
      val hs = t.split(" ").filter(_.nonEmpty).sliding(k)
        .filter(_.length == k).map(sh => hash60(sh.mkString(" "))).toArray
      if (hs.isEmpty) Set.empty
      else if (hs.length <= w) Set(hs.min)
      else (0 to hs.length - w).map(j => hs.slice(j, j + w).min).toSet
    }
    for ((k, w) <- Seq((3, 4), (5, 2), (2, 8))) {
      val got = Dedup.winnowFingerprints(docs, "doc_id", "text", k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val texts = docs.as[(Long, String)].collect()
      texts.foreach { case (id, t) =>
        val want = brute(t, k, w)
        assert(got.getOrElse(id, Set.empty[Long]) === want, s"k=$k w=$w id=$id")
        // fingerprints are a SUBSET of the shingle hash set
        val all = t.split(" ").filter(_.nonEmpty).sliding(k)
          .filter(_.length == k).map(sh => hash60(sh.mkString(" "))).toSet
        assert(want.subsetOf(all))
      }
    }
  }

  test("kmv law: sketch equals closed-form bottom-k on random groups, any partitioning") {
    import graft.ext.Sketches
    val rows = (0 until 3000)
      .map(i => (s"g${rnd.nextInt(4)}", s"v${rnd.nextInt(700)}"))
    val df = rows.toDF("g", "v")
    for (parts <- Seq(1, 7)) {
      val est = df.repartition(parts).groupBy($"g")
        .agg(Sketches.kmvDistinct($"v", 24).as("e"))
        .as[(String, Double)].collect().toMap
      // closed form from the exact distinct hash sets
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val hs = rs.map(_._2).distinct
          .map { v =>
            val md = java.security.MessageDigest.getInstance("MD5")
            java.lang.Long.parseLong(
              md.digest(v.getBytes("UTF-8")).take(8)
                .map(b => f"${b & 0xff}%02x").mkString.take(15), 16)
          }.distinct.sorted
        g -> (if (hs.size < 24) hs.size.toDouble
              else 23.0 * math.pow(2.0, 60) / hs(23).toDouble)
      }
      assert(est === want, s"parts=$parts")
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

  test("int8 quantization law: per-component error <= scale/2 (unclamped), cos >= 0.999") {
    import graft.ext.SimJoin
    val vecs = (0 until 100).map { i =>
      (i.toLong, Seq.fill(32)(rnd.nextDouble() * 4 - 2))
    }.toDF("vec_id", "v")
    val q = vecs
      .withColumn("scale", SimJoin.int8Scale($"v"))
      .withColumn("dq", SimJoin.dequantize(
        SimJoin.quantizeInt8($"v", $"scale"), $"scale"))
    val rows = q.select($"vec_id", $"v", $"scale", $"dq",
        SimJoin.cosine($"v", $"dq").as("cos"))
      .as[(Long, Seq[Double], Double, Seq[Double], Double)].collect()
    rows.foreach { case (id, v, s, dq, cos) =>
      // |x| <= 127*scale by construction, so no clamping: the
      // round-half-up grid guarantees |x - x̂| <= scale/2 (+ulp)
      v.zip(dq).foreach { case (x, xh) =>
        assert(math.abs(x - xh) <= s / 2 + 1e-12, s"vec $id: $x vs $xh (scale $s)")
      }
      assert(cos >= 0.999, s"vec $id cos $cos")
    }
  }

  test("sampler laws: quota subset-of-stratum; mix row set == per-source hashSample union") {
    import graft.ext.Corpus
    val src = (0L until 900L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    // quotaSample returns existing rows only, quota per stratum exact
    val qs = Corpus.quotaSample(src, "id", "src", 50)
      .as[(Long, String)].collect()
    assert(qs.length === 150)
    assert(qs.forall { case (i, s) => s == s"s${i % 3}" })
    // mixBySource == union of per-source hashSamples at the same frac
    val w = Map("s0" -> 0.4, "s1" -> 0.15)
    val mixed = Corpus.mixBySource(src, "id", "src", w, default = 0.05)
      .as[(Long, String)].collect().toSet
    val manual = Seq("s0" -> 0.4, "s1" -> 0.15, "s2" -> 0.05).flatMap {
      case (s, f) =>
        Corpus.hashSample(src.filter($"src" === s), "id", f)
          .as[(Long, String)].collect()
    }.toSet
    assert(mixed === manual)
  }
}
