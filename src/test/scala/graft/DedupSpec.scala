package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** ext/Dedup — the MinHash-LSH near-dup pipeline (production xxhash64
  * path; the md5 parity path is covered by oracle queries q65-q67).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus with one planted near-dup pair (1001 is 1000 with one word
    * changed → shingle Jaccard ≈ 0.85) and unrelated docs.
    */
  private lazy val docs = Seq(
    (1000L, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    (1001L, "the quick brown fox jumps over the lazy cat near the old river bank today"),
    (2000L, "completely different text about spark catalyst optimizer rules and codegen stages"),
    (3000L, "yet another unrelated document mentioning parquet partition pruning and shuffles"),
    (4000L, "short one"),
    (5000L, "")
  ).toDF("doc_id", "text")

  test("shingles: 3-grams, distinct, short/empty docs yield none") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val counts = sh.groupBy($"doc_id").count().as[(Long, Long)].collect().toMap
    // 15 words -> 13 distinct 3-gram starts
    assert(counts(1000L) === 13)
    assert(!counts.contains(4000L)) // 2 words < n
    assert(!counts.contains(5000L)) // empty
    val one = sh.filter($"doc_id" === 1000L && $"shingle" === "the quick brown").count()
    assert(one === 1)
  }

  test("planted near-dup pair found; unrelated docs produce no pairs") {
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text",
        n = 3, k = 16, b = 8, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((1000L, 1001L)))
    // docs differ in 1 word => the 3 shingles containing it differ per side:
    // shared = 10, union = 13 + 13 - 10 = 16
    assert(math.abs(pairs.head._3 - 10.0 / 16.0) < 1e-9)
  }

  test("plan has no cartesian product / broadcast nested loop join") {
    val plan = Dedup.nearDupPairs(docs, "doc_id", "text", n = 3, k = 16, b = 8,
      minJaccard = 0.5).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("dropNearDuplicates keeps the smaller id of a dup pair") {
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", "text",
        n = 3, k = 16, b = 8, minJaccard = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept.contains(1000L) && !kept.contains(1001L))
    assert(kept.contains(2000L) && kept.contains(3000L))
  }

  test("signature computation matches brute-force minhash") {
    // brute-force: min over shingles of hash_i(prepare(shingle))
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val sigs = Dedup.minhashSignatures(sh, "doc_id", k = 4)
      .select($"doc_id", $"sig").as[(Long, Seq[Long])].collect().toMap
    val brute = sh
      .select(($"doc_id" +: (0 until 4).map(i =>
        xxhash64(lit(i), xxhash64($"shingle")).as(s"h$i"))): _*)
      .groupBy($"doc_id")
      .agg(min($"h0"), min($"h1"), min($"h2"), min($"h3"))
      .as[(Long, Long, Long, Long, Long)].collect()
    brute.foreach { case (id, h0, h1, h2, h3) =>
      assert(sigs(id) === Seq(h0, h1, h2, h3))
    }
  }

  test("parity per-row kernel is bit-identical to the md5 aggregate form") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").unionByName(docs)
    for ((n, k) <- Seq((1, 8), (3, 8), (3, 16))) {
      val agg = Dedup.minhashSignatures(
          Dedup.shingleStream(real, "doc_id", "text", n), "doc_id", k,
          Dedup.ParityHasher)
        .orderBy($"doc_id").collect().toSeq
      val perRow = Dedup.minhashSigPerRowParity(real, "doc_id", "text", n, k)
        .orderBy($"doc_id").collect().toSeq
      assert(perRow === agg, s"parity kernel diverges at n=$n k=$k")
    }
    // shuffle-free: no exchange in the per-row signature plan
    val plan = Dedup.minhashSigPerRowParity(docs, "doc_id", "text", 3, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("winnowing: shared run >= k+w-1 tokens guarantees a shared fingerprint") {
    val k = 5; val w = 4
    // 8 shared tokens = k+w-1 exactly; surrounded by disjoint text
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val a = Seq((1L, s"one two three $shared four five six"))
    val b = Seq((2L, s"red blue green $shared yellow purple"))
    val docs = (a ++ b).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", k, w)
    val fa = fps.filter($"doc_id" === 1).select("fp").as[Long].collect().toSet
    val fb = fps.filter($"doc_id" === 2).select("fp").as[Long].collect().toSet
    assert((fa & fb).nonEmpty, "k+w-1 shared run must share a fingerprint")
    // unrelated docs share nothing
    val other = Seq((3L, "cats dogs birds fish mice lions tigers bears wolves"))
      .toDF("doc_id", "text")
    val fo = Dedup.winnowFingerprints(other, "doc_id", "text", k, w)
      .select("fp").as[Long].collect().toSet
    assert((fa & fo).isEmpty)
  }

  test("winnowing: brute-force parity, short docs, empty docs, density") {
    val k = 3; val w = 4
    // unique tokens -> all-distinct shingle hashes, so the selected
    // count tracks the theoretical ~2/(w+1) density
    val text = (1 to 60).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "a b c"), (3L, "a b"), (4L, "")).toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference: md5-60bit shingle hashes, window minima
    def hash60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).take(8)
        .map(b => f"${b & 0xff}%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def winnow(t: String): Set[Long] = {
      val toks = t.split(" ").filter(_.nonEmpty)
      val hs = toks.sliding(k).filter(_.length == k).map(sh => hash60(sh.mkString(" "))).toArray
      if (hs.isEmpty) Set.empty
      else if (hs.length <= w) Set(hs.min)
      else (0 to hs.length - w).map(j => hs.slice(j, j + w).min).toSet
    }
    val want = Seq((1L, text), (2L, "a b c"), (3L, "a b"), (4L, ""))
      .flatMap { case (id, t) => winnow(t).map(id -> _) }.toSet
    assert(got === want)
    // doc 3 has one 3-shingle? "a b" has none (2 tokens) -> no rows
    assert(!got.exists(_._1 == 3L) && !got.exists(_._1 == 4L))
    // density: ~2/(w+1) of the 58 shingle hashes for doc 1, loose band
    val n1 = got.count(_._1 == 1L)
    assert(n1 >= 10 && n1 <= 40, s"winnow density off: $n1 of 58")
  }

  test("winnowSharedPairs: planted shared span found with exact shared count") {
    val k = 5; val w = 4
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")  // 20-token run
    val rows = Seq(
      (1L, s"a1 a2 a3 $shared a4 a5"),
      (2L, s"b1 b2 $shared b3 b4 b5"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"))
    val docs = rows.toDF("doc_id", "text")
    val pairs = Dedup.winnowSharedPairs(docs, "doc_id", "text", k, w,
        minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet === Set((1L, 2L)))
    // exact count: the pair shares precisely the common fingerprints
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", k, w)
    val f1 = fps.filter($"doc_id" === 1).select("fp").as[Long].collect().toSet
    val f2 = fps.filter($"doc_id" === 2).select("fp").as[Long].collect().toSet
    assert(pairs((1L, 2L)) === (f1 & f2).size.toLong)
    // a fingerprint shared by more docs than maxBucket is guarded out
    val many = (10L to 30L).map(i => (i, s"x1 x2 $shared x3")).toDF("doc_id", "text")
    assert(Dedup.winnowSharedPairs(many, "doc_id", "text", k, w, 2,
      maxBucket = 5).isEmpty)
  }

  test("byte-level shingle hashing agrees with SQL md5 on multi-byte UTF-8") {
    // the kernel tokenizes RAW UTF-8 bytes on 0x20 (safe: no UTF-8
    // continuation byte is 0x20) — assert hash parity against Spark's
    // own conv(substr(md5)) on accented/CJK/emoji text
    val rows = Seq(
      (1L, "café über naïve résumé déjà vu encore été"),
      (2L, "東京 大阪 京都 奈良 神戸 札幌 福岡 仙台"),
      (3L, "mix of ascii und 中文 and émojis 🙂 🚀 plus more words here"))
    val docs2 = rows.toDF("doc_id", "text")
    val k = 3
    val got = Dedup.winnowFingerprints(docs2, "doc_id", "text", k, w = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // w=1 selects EVERY shingle hash -> compare to the full SQL set
    val want = docs2
      .select($"doc_id", explode(expr(
        s"""transform(sequence(0, size(filter(split(text, ' '), t -> t != '')) - $k),
           |  i -> conv(substring(md5(concat_ws(' ',
           |    slice(filter(split(text, ' '), t -> t != ''), i + 1, $k))), 1, 15), 16, 10))
           |""".stripMargin.replace("\n", ""))).as("fp"))
      .select($"doc_id", $"fp".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want, "byte-level kernel must match SQL md5 on multi-byte text")
  }

  test("winnowing kernel is narrow: no exchange below the explode") {
    val plan = Dedup.winnowFingerprints(docs, "doc_id", "text", 5, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("winnowing xx production hasher: SQL xxhash64 parity, guarantee, pairs") {
    // w=1 selects EVERY shingle hash — the xx kernel must equal SQL
    // xxhash64(shingle) exactly (same bytes, same seed 42), including
    // on multi-byte UTF-8
    val rows = Seq(
      (1L, "one two three four five six seven"),
      (2L, "café über naïve résumé déjà vu encore été"),
      (3L, "mix of ascii und 中文 and émojis 🙂 🚀 plus more words here"))
    val docs2 = rows.toDF("doc_id", "text")
    val k = 3
    val got = Dedup.winnowFingerprints(docs2, "doc_id", "text", k, w = 1, xx = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = docs2
      .select($"doc_id", explode(expr(
        s"""transform(sequence(0, size(filter(split(text, ' '), t -> t != '')) - $k),
           |  i -> xxhash64(concat_ws(' ',
           |    slice(filter(split(text, ' '), t -> t != ''), i + 1, $k))))
           |""".stripMargin.replace("\n", ""))).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want, "xx kernel must match SQL xxhash64 per shingle")
    // the winnowing guarantee holds under the xx hasher too
    val kk = 5; val w = 4
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val ab = Seq((1L, s"one two three $shared four five six"),
      (2L, s"red blue green $shared yellow purple")).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(ab, "doc_id", "text", kk, w, xx = true)
    val fa = fps.filter($"doc_id" === 1).select("fp").as[Long].collect().toSet
    val fb = fps.filter($"doc_id" === 2).select("fp").as[Long].collect().toSet
    assert((fa & fb).nonEmpty, "k+w-1 shared run must share an xx fingerprint")
    // shared-span pairs under the production hasher find the planted pair
    val run = (1 to 20).map(i => s"s$i").mkString(" ")
    val three = Seq((1L, s"a1 a2 a3 $run a4 a5"), (2L, s"b1 b2 $run b3 b4 b5"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")).toDF("doc_id", "text")
    val pairs = Dedup.winnowSharedPairs(three, "doc_id", "text", kk, w,
        minShared = 2, xx = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
    // SQL registration: winnow_fps_xx equals the DataFrame-API path
    GraftExtensions.install(spark)
    val viaSql = docs2.selectExpr("doc_id", s"explode(winnow_fps_xx(text, $k, 1)) AS fp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSql === got)
    // still narrow
    val plan = Dedup.winnowFingerprints(docs2, "doc_id", "text", kk, w, xx = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("lsh banding: identical signatures share all buckets, disjoint share none") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val sigs = Dedup.minhashSignatures(sh, "doc_id", k = 16)
    val bands = Dedup.lshBands(sigs, "doc_id", k = 16, b = 8)
    assert(bands.filter($"doc_id" === 1000L).count() === 8)
    val cands = Dedup.candidatePairs(bands, "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1000L, 1001L)))
    assert(!cands.contains((2000L, 3000L)))
  }

  test("candidatePairs bucket-size guard drops degenerate buckets") {
    // 5 docs all in one bucket; maxBucket=3 must exclude it entirely
    val bands = Seq(
      (1L, 0, 99L), (2L, 0, 99L), (3L, 0, 99L), (4L, 0, 99L), (5L, 0, 99L),
      (1L, 1, 1L), (2L, 1, 2L), (3L, 1, 3L), (4L, 1, 4L), (5L, 1, 5L)
    ).toDF("doc_id", "band", "band_hash")
    assert(Dedup.candidatePairs(bands, "doc_id", maxBucket = 3).count() === 0)
    assert(Dedup.candidatePairs(bands, "doc_id", maxBucket = 10).count() === 10)
  }

  test("connected components: min label spans chains the greedy pass misses") {
    // cluster {10,20,30} with edges (10,30),(20,30): greedy keeps 10 AND
    // 20 (20's only neighbor is larger); CC labels all three with 10
    val pairs = Seq((10L, 30L), (20L, 30L), (100L, 200L))
      .toDF("a_id", "b_id")
    // smallGraphMax = 0 forces the distributed label-propagation loop;
    // the default goes through the driver union-find fast path — both
    // must produce the identical labeling
    for (cap <- Seq(0L, 1L << 20)) {
      val labels = Dedup.connectedMinLabels(pairs, smallGraphMax = cap)
        .as[(Long, Long)].collect().toMap
      assert(labels(10L) === 10L && labels(20L) === 10L && labels(30L) === 10L,
        s"cap=$cap")
      assert(labels(100L) === 100L && labels(200L) === 100L, s"cap=$cap")
    }
  }

  test("connected components converge for STRING ids (non-summable labels)") {
    // diameter-3 chain: a-b-c-d. The integral-id fast path sums labels
    // for convergence; string labels can't be summed (cast → null), so
    // this exercises the changed-count fallback. One propagation step
    // only reaches distance-1 neighbors — a premature "converged after
    // one step" bug leaves d labeled "c".
    val pairs = Seq(("c", "d"), ("b", "c"), ("a", "b"), ("x", "y"))
      .toDF("a_id", "b_id")
    for (cap <- Seq(0L, 1L << 20)) {
      val labels = Dedup.connectedMinLabels(pairs, smallGraphMax = cap)
        .as[(String, String)].collect().toMap
      assert(labels === Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
        "x" -> "x", "y" -> "x"), s"cap=$cap")
    }
  }

  test("dropNearDuplicatesConnected agrees with greedy on the planted corpus") {
    val kept = Dedup.dropNearDuplicatesConnected(docs, "doc_id", "text",
        n = 3, k = 16, b = 8, minJaccard = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept.contains(1000L) && !kept.contains(1001L))
    assert(kept.contains(2000L) && kept.contains(3000L))
  }

  test("exact dedup: identical texts collapse to min id") {
    val d = Seq((5L, "same text"), (2L, "same text"), (9L, "other text"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactDupGroups(d, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSeq
    assert(groups.map(g => (g._2, g._3)).toSet === Set((2L, 2L), (9L, 1L)))
    val kept = Dedup.dropExactDuplicates(d, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 9L))
  }

  test("simhash64: near-dups have small hamming distance, unrelated docs large") {
    val fp = Dedup.simhash64(docs.filter(length($"text") > 0), "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val near = ham(fp(1000L), fp(1001L))
    val far = ham(fp(1000L), fp(2000L))
    assert(near < far, s"near=$near far=$far")
    assert(near <= 16, s"near-dup hamming too large: $near")
    // engine-side hamming expression agrees with JVM bitCount
    val expr = spark.range(1).select(
      Dedup.hamming64(lit(fp(1000L)), lit(fp(2000L)))).as[Int].collect().head
    assert(expr === far)
  }
}
