package graft

import org.apache.spark.sql.functions._
import graft.ext.{Sketches, SimJoin}

/** ext/SimJoin — bucketed cosine ANN vs brute-force ground truth. */
class SimJoinSpec extends SparkSpec {
  import spark.implicits._

  private val planes = SimJoin.planes(nPlanes = 16, dim = 64)

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")
    .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))

  test("planes are deterministic ±1 and dim-shaped") {
    assert(planes.size === 16)
    assert(planes.forall(p => p.size === 64 && p.forall(x => x == 1.0 || x == -1.0)))
    assert(planes === SimJoin.planes(16, 64)) // stable across calls
    // not degenerate: both signs present in each plane
    assert(planes.forall(p => p.contains(1.0) && p.contains(-1.0)))
  }

  test("ann recall >= 0.9 vs brute-force ground truth (25 true top-5 pairs)") {
    val queries = emb.filter($"vec_id" < 5)
    val truth = SimJoin.bruteForceTopK(emb, queries, "vec_id", "v", k = 5)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val ann = SimJoin.annTopK(emb, queries, "vec_id", "v", k = 5, planes, b = 8)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = (truth & ann).size.toDouble / truth.size
    assert(truth.size === 25)
    assert(recall >= 0.9, s"recall $recall < 0.9 (found ${(truth & ann).size}/25)")
  }

  test("ann plan is bucketed: no cartesian product / nested loop join") {
    val queries = emb.filter($"vec_id" < 5)
    val plan = SimJoin.annTopK(emb, queries, "vec_id", "v", 5, planes, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("ivf: centroids converge, probing beats single-cell, recall >= 0.9 at nProbe=8") {
    val cents = SimJoin.ivfCentroids(emb, "vec_id", "v", k = 16, iters = 5)
    assert(cents.size === 16 && cents.forall(_.size === 64))
    val queries = emb.filter($"vec_id" < 5)
    val truth = SimJoin.bruteForceTopK(emb, queries, "vec_id", "v", k = 5)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    def recallAt(nProbe: Int): Double = {
      val got = SimJoin.ivfTopK(emb, queries, "vec_id", "v", 5, cents, nProbe)
        .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
      (truth & got).size.toDouble / truth.size
    }
    val r1 = recallAt(1)
    val r8 = recallAt(8)
    assert(r8 >= r1, s"probing more cells must not lower recall ($r1 -> $r8)")
    assert(r8 >= 0.9, s"recall@nProbe=8 $r8 < 0.9")
  }

  test("ivf plan is bucketed: no cartesian product") {
    val cents = SimJoin.ivfCentroids(emb, "vec_id", "v", k = 16, iters = 2)
    val plan = SimJoin.ivfTopK(emb, emb.filter($"vec_id" < 5), "vec_id", "v", 5, cents, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("candidate set prunes relative to all-pairs on a clustered corpus") {
    // two tight clusters around orthogonal centers: LSH must keep
    // same-cluster candidates and prune most cross-cluster pairs
    val dim = 64
    val rnd = new scala.util.Random(7)
    def jitter(center: Array[Double]): Seq[Double] = {
      val v = center.map(x => x + rnd.nextGaussian() * 0.05)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n).toSeq
    }
    val c1 = Array.fill(dim)(0.0); c1(0) = 1.0
    val c2 = Array.fill(dim)(0.0); c2(1) = 1.0
    val rows = (0 until 50).map(i => (i.toLong, jitter(c1))) ++
      (50 until 100).map(i => (i.toLong, jitter(c2)))
    val df = rows.toDF("vec_id", "v")
    val queries = df.filter($"vec_id".isin(0L, 50L))
    // tight clusters (cos≈0.995): r=4 prunes hard and still recalls
    val ann = SimJoin.annTopK(df, queries, "vec_id", "v", k = 5,
        SimJoin.planes(16, dim), b = 4)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect()
    // every returned neighbor is same-cluster
    assert(ann.forall { case (q, v) => (q < 50) == (v < 50) })
    assert(ann.count(_._1 == 0L) === 5 && ann.count(_._1 == 50L) === 5)
  }

  test("embedding near-dup: planted clones found, greedy drop keeps min ids") {
    val dim = 32
    val rnd = new scala.util.Random(7)
    def unit(): Seq[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n).toSeq
    }
    // 40 well-separated random vectors; ids 100.. are near-clones
    // (tiny jitter, cos > 0.99) of vectors 0, 1, 2
    val base = (0 until 40).map(i => (i.toLong, unit()))
    val clones = (0 until 3).map { i =>
      (100L + i, base(i)._2.map(x => x + rnd.nextGaussian() * 0.01))
    }
    val df = (base ++ clones).toDF("vec_id", "v")
    val pl = SimJoin.planes(16, dim)
    val pairs = SimJoin.embeddingNearDupPairs(df, "vec_id", "v", pl,
        b = 4, minCos = 0.98)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 100L), (1L, 101L), (2L, 102L)))
    // plan shape: bucketed, never all-pairs
    val plan = SimJoin.embeddingNearDupPairs(df, "vec_id", "v", pl, 4, 0.98)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    val kept = SimJoin.dropEmbeddingNearDups(df, "vec_id", "v", pl, 4, 0.98)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept === base.map(_._1).toSet) // clones dropped, originals kept
  }

  test("embedding near-dup: zero-norm vectors never pair (NaN cosine guarded)") {
    val dim = 8
    // two all-zero vectors share every sign-LSH bucket; cosine = 0/0 =
    // NaN, which Spark sorts ABOVE all numbers — the guard must keep
    // them out of the pair set at any threshold
    val rows = Seq(
      (1L, Seq.fill(dim)(0.0)), (2L, Seq.fill(dim)(0.0)),
      (3L, Seq.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)))
    val df = rows.toDF("vec_id", "v")
    val pairs = SimJoin.embeddingNearDupPairs(df, "vec_id", "v",
        SimJoin.planes(8, dim), b = 4, minCos = 0.0)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(!pairs.contains((1L, 2L)), s"NaN pair leaked: $pairs")
  }

  test("vec_mean/vec_sum: hand values, cross-partition merge, nulls skipped, all-null group") {
    val rows = Seq(
      (1L, Some(Seq(1.0, 2.0))), (1L, Some(Seq(3.0, 4.0))),
      (1L, None),                                      // skipped
      (2L, Some(Seq(10.0, -10.0))),
      (3L, None)                                       // all-null group -> null
    )
    val df = rows.toDF("g", "v").repartition(4)        // force partial+merge path
    val got = df.groupBy($"g")
      .agg(SimJoin.vecMean($"v").as("m"), SimJoin.vecSum($"v").as("s"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getSeq[Double](1)), Option(r.getSeq[Double](2))))).toMap
    assert(got(1L) === ((Some(Seq(2.0, 3.0)), Some(Seq(4.0, 6.0)))))
    assert(got(2L) === ((Some(Seq(10.0, -10.0)), Some(Seq(10.0, -10.0)))))
    assert(got(3L) === ((None, None)))
    // dimension mismatch inside a group is corrupt data -> error
    val bad = Seq((1L, Seq(1.0, 2.0)), (1L, Seq(1.0))).toDF("g", "v")
    val e = intercept[Exception] {
      bad.groupBy($"g").agg(SimJoin.vecMean($"v")).collect()
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("dimension mismatch"))
    // SQL surface
    GraftExtensions.install(spark)
    Seq((1L, Seq(1.0, 3.0)), (1L, Seq(3.0, 5.0))).toDF("g", "v")
      .createOrReplaceTempView("vecs")
    val sqlRow = spark.sql("SELECT vec_mean(v) AS m, vec_sum(v) AS s FROM vecs")
      .collect().head
    assert(sqlRow.getSeq[Double](0) === Seq(2.0, 4.0))
    assert(sqlRow.getSeq[Double](1) === Seq(4.0, 8.0))
  }

  test("vec_mean as streaming state: cross-batch pooling matches the batch mean") {
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("g", LongType),
      StructField("v", ArrayType(DoubleType))))
    val dir = java.nio.file.Files.createTempDirectory("vecstream").toString
    def write(rows: Seq[(Long, Seq[Double])]): Unit =
      spark.createDataFrame(rows.toDF("g", "v").rdd, sch)
        .coalesce(1).write.mode("append").parquet(dir)

    // the per-batch means differ from the union mean — only a correct
    // cross-batch buffer merge produces (3,4)
    write(Seq((1L, Seq(1.0, 2.0)), (1L, Seq(1.0, 2.0))))
    write(Seq((1L, Seq(7.0, 8.0))))

    val q = spark.readStream.schema(sch).option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .groupBy($"g").agg(SimJoin.vecMean($"v").as("m"))
      .writeStream.format("memory").queryName("vm")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("vm").select($"m").as[Seq[Double]].head()
    assert(got === Seq(3.0, 4.0))
  }

  test("int8 quantization: exact components, zero-vector convention, bounded error") {
    val rows = Seq(
      (1L, Seq(1.27, -1.27, 0.635, 0.0)),   // scale 0.01 -> (127,-127,64,0)
      (2L, Seq(0.0, 0.0, 0.0, 0.0)),        // zero vector -> zeros, scale 0
      (3L, Seq(-0.005, 0.005, 1.27, -0.635))// negative-half rounding: floor(x/s+.5)
    ).toDF("vec_id", "v")
    val q = rows
      .withColumn("scale", SimJoin.int8Scale($"v"))
      .withColumn("q", SimJoin.quantizeInt8($"v", $"scale"))
    val got = q.select($"vec_id", $"scale", $"q")
      .as[(Long, Double, Seq[Int])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(math.abs(got(1L)._1 - 0.01) < 1e-15)
    assert(got(1L)._2 === Seq(127, -127, 64, 0))  // floor(63.5+0.5)=64
    assert(got(2L) === ((0.0, Seq(0, 0, 0, 0))))
    // -0.005/0.01 = -0.5 -> floor(0) = 0 (round-half-UP on negatives)
    assert(got(3L)._2 === Seq(0, 1, 127, -63))    // -63.5 -> floor(-63) = -63
    // reconstruction cosine within the int8 error envelope for a real vector
    val cos = q.filter($"vec_id" === 1L)
      .select(SimJoin.cosine($"v", SimJoin.dequantize($"q", $"scale")))
      .as[Double].head()
    assert(cos > 0.9999, s"reconstruction cosine $cos")
  }

  test("semantic dedup: within-cluster pairs only, exact cosines, keep-lowest-id") {
    // two tight clusters around orthogonal axes + one zero vector
    val rows = Seq(
      (1L, Seq(1.0, 0.0, 0.0)), (2L, Seq(0.99, 0.1, 0.0)), (3L, Seq(0.98, -0.1, 0.0)),
      (10L, Seq(0.0, 1.0, 0.0)), (11L, Seq(0.05, 0.99, 0.0)),
      (99L, Seq(0.0, 0.0, 0.0))).toDF("vec_id", "v")
    val seeds = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))
    val pairs = SimJoin.semanticDedupPairs(rows, "vec_id", "v", seeds, minCos = 0.9)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // all x-cluster pairs qualify (cos > 0.97); cross-cluster never compared
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L)))
    val kept = SimJoin.dropSemanticDups(rows, "vec_id", "v", seeds, minCos = 0.9)
      .select($"vec_id").as[Long].collect().toSet
    // 2,3 drop (pair with 1), 11 drops (pair with 10); zero vector survives
    assert(kept === Set(1L, 10L, 99L))
  }

  test("quantization kernels on the SQL surface match the library columns") {
    GraftExtensions.install(spark)
    emb.limit(50).createOrReplaceTempView("emb_sql")
    val sql = spark.sql(
      """SELECT vec_id, int8_scale(v) AS s,
        |  cosine_sim_q8(v, quantize_int8(v, int8_scale(v)), int8_scale(v)) AS c
        |FROM emb_sql""".stripMargin)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val lib = emb.limit(50)
      .select($"vec_id", $"v", SimJoin.int8Scale($"v").as("s"))
      .withColumn("q", SimJoin.quantizeInt8($"v", $"s"))
      .withColumn("c", SimJoin.cosine($"v", SimJoin.dequantize($"q", $"s")))
      .select($"vec_id", $"s", $"c")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(sql === lib, "SQL kernels must be bit-identical to the library path")
  }

  test("quantized IVF: recall matches the fp path, fp vectors never read at query time") {
    val cents = SimJoin.ivfCentroids(emb, "vec_id", "v", k = 16, iters = 3)
    val queries = emb.filter($"vec_id" < 5)
    val fp = SimJoin.ivfTopK(emb, queries, "vec_id", "v", 5, cents, 8)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val qc = SimJoin.quantizedCorpus(emb, "vec_id", "v", cents)
    assert(qc.columns.toSet === Set("vec_id", "__cell", "__scale", "__q"),
      "quantized corpus must not carry the fp vector")
    val q8 = SimJoin.ivfTopKQuantized(qc, queries, "vec_id", "v", 5, cents, 8)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val overlap = (fp & q8).size.toDouble / fp.size
    assert(overlap >= 0.9, s"quantized recall vs fp path: $overlap")
    // scores are within the int8 reconstruction envelope
    val both = SimJoin.ivfTopK(emb, queries, "vec_id", "v", 5, cents, 8)
      .select($"q_id", $"vec_id", $"cos_sim".as("fp_cos"))
      .join(SimJoin.ivfTopKQuantized(qc, queries, "vec_id", "v", 5, cents, 8)
        .select($"q_id", $"vec_id", $"cos_sim".as("q_cos")),
        Seq("q_id", "vec_id"))
      .select(max(abs($"fp_cos" - $"q_cos"))).head.getDouble(0)
    assert(both < 0.01, s"max score drift $both")
  }

  test("semantic dedup: oversized clusters are count-guarded out of the pair stage") {
    // 5 near-identical vectors all land in cluster 0
    val rows = (1L to 5L).map(i => (i, Seq(1.0, i * 1e-6))).toDF("vec_id", "v")
    val seeds = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val unguarded = SimJoin.semanticDedupPairs(rows, "vec_id", "v", seeds, 0.9)
    assert(unguarded.count() === 10) // C(5,2)
    val guarded = SimJoin.semanticDedupPairs(rows, "vec_id", "v", seeds, 0.9,
      maxCluster = 4)
    assert(guarded.isEmpty, "cluster of 5 must be dropped at maxCluster=4")
    assert(SimJoin.dropSemanticDups(rows, "vec_id", "v", seeds, 0.9,
      maxCluster = 4).count() === 5)
  }

  test("semantic dedup assignment: argmax cosine, lowest-cluster ties, narrow plan") {
    val rows = Seq((1L, Seq(1.0, 1.0)), (2L, Seq(0.0, 0.0))).toDF("vec_id", "v")
    val seeds = Seq(Seq(1.0, 1.0), Seq(2.0, 2.0), Seq(0.0, 1.0))
    // seeds 0 and 1 both at cos=1 with row 1 -> tie breaks to cluster 0;
    // zero vector -> sentinel -2 on all -> cluster 0
    val assigned = rows.select($"vec_id",
      SimJoin.assignNearestCos($"v", seeds).as("c"))
    assert(assigned.as[(Long, Int)].collect().toMap === Map(1L -> 0, 2L -> 0))
    assert(!assigned.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("seed centroids are the bottom-k order-hash rows, in hash order") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val seeds = SimJoin.seedCentroids(emb, "vec_id", "v", 4)
    val wantIds = emb.select($"vec_id", Sketches.orderHash($"vec_id").as("h"))
      .orderBy($"h", $"vec_id").limit(4).select($"vec_id").as[Long].collect()
    val byId = emb.filter($"vec_id".isin(wantIds: _*))
      .select($"vec_id", $"v").as[(Long, Seq[Double])].collect().toMap
    assert(seeds === wantIds.map(byId).toSeq)
  }
}
