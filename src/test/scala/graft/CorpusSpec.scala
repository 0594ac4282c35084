package graft

import graft.ext.{Corpus, TextOps}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators: decontamination, chunking, sequence
  * packing, BM25 — hand-computed cases, invariants, and plan-shape
  * asserts (the oracle queries q85-q88 cover DuckDB parity).
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def words(n: Int, from: Int = 0): String =
    (from until from + n).map(i => s"w$i").mkString(" ")

  // ----------------------------------------------------- chunking

  test("chunk: exact windows, overlap, short final chunk, short doc, empty doc") {
    val docs = Seq(
      (1L, words(11)),       // chunkSize 4 step 3 -> [0..3][3..6][6..9][9..10]
      (2L, words(3)),        // shorter than chunkSize -> one chunk of 3
      (3L, words(4)),        // exact fit -> one chunk
      (4L, "")               // empty -> no chunks
    ).toDF("doc_id", "text")
    val out = Corpus.chunk(docs, "doc_id", "text", chunkSize = 4, overlap = 1)
      .orderBy($"doc_id", $"chunk_idx")
      .as[(Long, Long, Int, String)].collect().toSeq
    assert(out === Seq(
      (1L, 0L, 4, "w0 w1 w2 w3"),
      (1L, 1L, 4, "w3 w4 w5 w6"),
      (1L, 2L, 4, "w6 w7 w8 w9"),
      (1L, 3L, 2, "w9 w10"),
      (2L, 0L, 3, "w0 w1 w2"),
      (3L, 0L, 4, "w0 w1 w2 w3")))
  }

  test("chunk: every token covered, overlap tokens shared between neighbors") {
    val docs = Seq((1L, words(100))).toDF("doc_id", "text")
    val chunks = Corpus.chunk(docs, "doc_id", "text", chunkSize = 16, overlap = 4)
      .orderBy($"chunk_idx")
      .as[(Long, Long, Int, String)].collect()
    val step = 12
    chunks.zipWithIndex.foreach { case ((_, idx, n, text), i) =>
      assert(idx === i.toLong)
      val toks = text.split(" ")
      assert(toks.length === n)
      assert(toks.head === s"w${i * step}") // window starts advance by step
    }
    // union of chunk tokens = the doc's tokens
    assert(chunks.flatMap(_._4.split(" ")).toSet === (0 until 100).map(i => s"w$i").toSet)
  }

  test("chunk plan is narrow: no shuffle, no HOF lambdas, no UDFs") {
    // file-backed input — literal DataFrames constant-fold to
    // LocalTableScan and hide the real plan shape
    val p = java.nio.file.Files.createTempDirectory("chunkplan").toString
    Seq((1L, words(50))).toDF("doc_id", "text").write.mode("overwrite").parquet(p)
    val plan = Corpus.chunk(spark.read.parquet(p), "doc_id", "text", 8, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("LambdaFunction") && !plan.contains("ScalaUDF"), plan)
  }

  // ----------------------------------------- sequence packing

  test("packBlocks: hand-computed boundary-crossing case") {
    val docs = Seq((1L, 100L), (2L, 200L), (3L, 60L)).toDF("doc_id", "cnt")
    val out = Corpus.packBlocks(docs, "doc_id", $"cnt", blockSize = 128L,
        shardCol = lit(0))
      .orderBy($"block_id", $"doc_id")
      .select($"block_id", $"doc_id", $"tok_start", $"n_toks")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 1L, 0L, 100L),   // doc1 fully in block 0
      (0L, 2L, 0L, 28L),    // doc2 tokens 0-27 fill block 0
      (1L, 2L, 28L, 128L),  // tokens 28-155 are block 1
      (2L, 2L, 156L, 44L),  // tokens 156-199 start block 2
      (2L, 3L, 0L, 60L)))   // doc3 follows in block 2
  }

  test("packBlocks invariants: doc token conservation, blocks full except the last") {
    val docs = (1L to 200L).map(i => (i, 1L + (i * 7) % 90)).toDF("doc_id", "cnt")
    val out = Corpus.packBlocks(docs, "doc_id", $"cnt", blockSize = 64L,
      shardCol = pmod($"doc_id", lit(4)))
    // every doc's assigned spans sum to its count and tile [0, cnt)
    val perDoc = out.groupBy($"doc_id")
      .agg(sum($"n_toks").as("tot"), min($"tok_start").as("first"))
      .join(docs, "doc_id")
      .select($"doc_id", $"tot", $"first", $"cnt")
      .as[(Long, Long, Long, Long)].collect()
    perDoc.foreach { case (id, tot, first, cnt) =>
      assert(tot === cnt && first === 0L, s"doc $id")
    }
    // every block holds exactly blockSize tokens except each shard's last
    val blocks = out.groupBy($"shard", $"block_id").agg(sum($"n_toks").as("fill"))
      .orderBy($"shard", $"block_id")
      .as[(Long, Long, Long)].collect()
    blocks.groupBy(_._1).foreach { case (shard, bs) =>
      val sorted = bs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (0L until sorted.length).toSeq, s"shard $shard gapless")
      sorted.dropRight(1).foreach { case (_, b, fill) =>
        assert(fill === 64L, s"shard $shard block $b")
      }
    }
  }

  test("packBlocks shuffles by shard, not through one global partition") {
    val p = java.nio.file.Files.createTempDirectory("packplan").toString
    (1L to 50L).map(i => (i, i % 17 + 1)).toDF("doc_id", "cnt")
      .write.mode("overwrite").parquet(p)
    val plan = Corpus.packBlocks(spark.read.parquet(p), "doc_id", $"cnt",
        blockSize = 16L, shardCol = pmod($"doc_id", lit(4)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  // ----------------------------------------- decontamination

  test("contamination: duplicated bench doc flagged at frac 1.0, clean docs absent") {
    val benchText = words(20)
    val docs = Seq(
      (100L, benchText),                    // verbatim benchmark copy
      (101L, words(10, from = 5)),          // 10-token window inside bench -> partial
      (102L, words(20, from = 1000))        // disjoint vocabulary
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1(benchText)).toDF("text")
    val rep = Corpus.contaminationReport(docs, "doc_id", "text", bench, "text", n = 5)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rep.map(_._1) === Seq(100L, 101L))
    val byId = rep.map(r => r._1 -> r).toMap
    assert(byId(100L) === ((100L, 16L, 16L, 1.0)))  // 20 tokens -> 16 5-grams, all shared
    assert(byId(101L) === ((101L, 6L, 6L, 1.0)))    // w5..w14 5-grams all inside bench
    val kept = Corpus.dropContaminated(docs, "doc_id", "text", bench, "text", n = 5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(102L))
  }

  test("contamination join broadcasts the benchmark shingle set") {
    val p = java.nio.file.Files.createTempDirectory("decon").toString
    (1L to 100L).map(i => (i, words(30, from = i.toInt * 3)))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(p)
    val docs = spark.read.parquet(p)
    val plan = Corpus.contaminationReport(docs, "doc_id", "text",
        docs.filter($"doc_id" < 5), "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  // ----------------------------------------------------- BM25

  test("bm25 matches a brute-force reference on a hand corpus") {
    val docs = Seq(
      (1L, "spark join spark window agg"),
      (2L, "join line value table row"),
      (3L, "window window window scan part"),
      (4L, "key value hash scan batch")   // no query tokens
    ).toDF("doc_id", "text")
    val query = Seq("spark", "join", "window")
    val got = TextOps.bm25(docs, "doc_id", "text", query)
      .as[(Long, Double)].collect().toMap
    // brute force
    val corpus = Map(
      1L -> Seq("spark", "join", "spark", "window", "agg"),
      2L -> Seq("join", "line", "value", "table", "row"),
      3L -> Seq("window", "window", "window", "scan", "part"),
      4L -> Seq("key", "value", "hash", "scan", "batch"))
    val n = corpus.size
    val avgdl = corpus.values.map(_.size).sum.toDouble / n
    val (k1, b) = (1.2, 0.75)
    def expected(id: Long): Double = query.map { q =>
      val tf = corpus(id).count(_ == q)
      if (tf == 0) 0.0 else {
        val df = corpus.values.count(_.contains(q))
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * corpus(id).size / avgdl))
      }
    }.sum
    assert(got.keySet === Set(1L, 2L, 3L))
    Seq(1L, 2L, 3L).foreach { id =>
      assert(math.abs(got(id) - expected(id)) < 1e-9, s"doc $id")
    }
    // the all-hits doc must outrank the single-common-term doc
    assert(got(1L) > got(2L))
  }

  test("materializeBlocks: every token exactly once, in order, blocks full except last") {
    val docs = Seq(
      (1L, words(5)),          // shard 1
      (2L, words(7, 100)),     // shard 0
      (3L, words(4, 200)),     // shard 1 — crosses the size-8 boundary with doc 1
      (4L, words(9, 300))      // shard 0 — crosses with doc 2
    ).toDF("doc_id", "text")
    val blocks = Corpus.materializeBlocks(docs, "doc_id", "text",
        blockSize = 8L, shardCol = pmod($"doc_id", lit(2)))
      .orderBy($"shard", $"block_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // shard 0: docs 2 (7 toks) + 4 (9 toks) = 16 -> two full blocks
    // shard 1: docs 1 (5) + 3 (4) = 9 -> block of 8 + block of 1
    val byShard = blocks.groupBy(_._1)
    assert(byShard(0L).map(_._3) === Seq(8L, 8L))
    assert(byShard(1L).map(_._3) === Seq(8L, 1L))
    blocks.foreach { case (_, _, n, text) =>
      assert(text.split(" ").length === n)
    }
    // concatenating a shard's blocks reproduces the shard's doc-order
    // token stream exactly
    assert(byShard(0L).map(_._4).mkString(" ") ===
      (words(7, 100) + " " + words(9, 300)))
    assert(byShard(1L).map(_._4).mkString(" ") ===
      (words(5) + " " + words(4, 200)))
  }

  // ----------------------------------------------------- sampling

  test("quotaSample: exact quota per stratum, deterministic, subset of input") {
    val docs = (0L until 200L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    val got = Corpus.quotaSample(docs, "id", "src", quota = 10)
      .as[(Long, String)].collect().toSeq
    assert(got.groupBy(_._2).view.mapValues(_.size).toMap ===
      Map("s0" -> 10, "s1" -> 10, "s2" -> 10, "s3" -> 10))
    // deterministic: second run picks the identical sample
    val again = Corpus.quotaSample(docs, "id", "src", quota = 10)
      .as[(Long, String)].collect().toSeq
    assert(got.sorted === again.sorted)
    // quota >= stratum size degrades to the whole stratum
    val all = Corpus.quotaSample(docs, "id", "src", quota = 100)
      .as[(Long, String)].collect()
    assert(all.length === 200)
  }

  test("hashSample: deterministic, frac-proportional, nested for growing frac") {
    val docs = (0L until 2000L).map(i => Tuple1(i)).toDF("id")
    val s20 = Corpus.hashSample(docs, "id", 0.2).as[Long].collect().toSet
    val s40 = Corpus.hashSample(docs, "id", 0.4).as[Long].collect().toSet
    // binomial(2000, f): allow 5 sigma
    assert(math.abs(s20.size - 400) < 5 * math.sqrt(2000 * 0.2 * 0.8), s"${s20.size}")
    assert(math.abs(s40.size - 800) < 5 * math.sqrt(2000 * 0.4 * 0.6), s"${s40.size}")
    // threshold sampling nests: the 20% sample is inside the 40% one
    assert(s20.subsetOf(s40))
    assert(Corpus.hashSample(docs, "id", 0.0).count() === 0)
    assert(Corpus.hashSample(docs, "id", 1.0).count() === 2000)
  }

  test("mixBySource: per-source proportions, default weight, monotone under weight raise") {
    val docs = (0L until 3000L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    def kept(w: Map[String, Double], d: Double) =
      Corpus.mixBySource(docs, "id", "src", w, default = d)
        .as[(Long, String)].collect().toSet
    val a = kept(Map("s0" -> 0.5, "s1" -> 0.1), 0.0)
    val bySrc = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(math.abs(bySrc("s0") - 500) < 5 * math.sqrt(1000 * 0.25), s"$bySrc")
    assert(math.abs(bySrc.getOrElse("s1", 0) - 100) < 5 * math.sqrt(1000 * 0.09), s"$bySrc")
    assert(!bySrc.contains("s2")) // default 0 drops unlisted sources
    // raising one weight only ADDS rows (nested thresholds)
    val b = kept(Map("s0" -> 0.8, "s1" -> 0.1), 0.0)
    assert(a.subsetOf(b))
    assert(a.filter(_._2 == "s1") === b.filter(_._2 == "s1"))
    // default applies to unlisted sources
    val c = kept(Map("s0" -> 0.5), 1.0)
    assert(c.count(_._2 == "s1") === 1000)
  }

  // ----------------------------------------------------- boilerplate

  test("boilerplateStats: shared grams found, fraction exact, below-threshold ignored") {
    // "a b" appears in docs 1,2,3; each doc also has unique grams
    val docs = Seq(
      (1L, "a b x1 y1"),   // grams: "a b","b x1","x1 y1"
      (2L, "a b x2 y2"),
      (3L, "a b x3 y3")
    ).toDF("doc_id", "text")
    val bp = Corpus.boilerplateGrams(docs, "doc_id", "text", n = 2, minDocs = 3)
      .as[(String, Long)].collect().toMap
    assert(bp === Map("a b" -> 3L))
    val stats = Corpus.boilerplateStats(docs, "doc_id", "text", n = 2, minDocs = 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(stats === Seq(
      (1L, 3L, 1L, 1.0 / 3), (2L, 3L, 1L, 1.0 / 3), (3L, 3L, 1L, 1.0 / 3)))
  }
}
