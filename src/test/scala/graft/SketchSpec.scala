package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ext.Sketches
import graft.ops.BloomJoin

/** Space-Saving heavy hitters, bottom-k sampling, Bloom semi-join
  * reduction (Queries5 operators). Differential style: every operator
  * is checked against the exhaustive computation on the same data.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")

  test("topk_freq exact mode reproduces groupBy-count + rank (merge path live)") {
    // 4 partitions force partial buffers through serialize/merge.
    val hh = Sketches.heavyHitters(part.repartition(4), Seq("p_type"),
      col("p_brand"), capacity = 64, k = 3)
    val w = Window.partitionBy($"p_type").orderBy($"cnt".desc, $"item")
    val exact = part.groupBy($"p_type", $"p_brand".as("item"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .where($"rk" <= 3)
      .select($"p_type", $"rk", $"item", $"cnt")
    assert(hh.select($"p_type", $"rk", $"item", $"cnt").except(exact).isEmpty &&
      exact.except(hh.select($"p_type", $"rk", $"item", $"cnt")).isEmpty)
    assert(hh.agg(max($"err")).head.getLong(0) === 0L) // under capacity ⇒ exact
  }

  test("topk_freq over capacity: heavy hitter survives, counts within err bound") {
    // 1 dominant key + 200 rare keys through a capacity-8 sketch.
    val rows = (1 to 400).map(i => s"heavy") ++ (1 to 200).map(i => s"rare_$i")
    val df = rows.toDF("item").repartition(4) // exercises trim-on-merge too
    val out = df.agg(Sketches.topkFreq($"item", capacity = 8, k = 1).as("tk"))
      .select(explode($"tk").as("e")).select($"e.item", $"e.cnt", $"e.err")
      .head
    assert(out.getString(0) === "heavy") // freq 400 > 600/9 ⇒ guaranteed present
    val (cnt, err) = (out.getLong(1), out.getLong(2))
    // Misra–Gries one-sided bound: trims only subtract, so
    // cnt ≤ true ≤ cnt + err with err ≤ N/(capacity+1).
    assert(cnt <= 400L && 400L <= cnt + err, s"cnt=$cnt err=$err")
    assert(err <= 600L / 9)
  }

  test("topk_freq on the SQL surface") {
    GraftExtensions.install(spark)
    part.createOrReplaceTempView("part_sql")
    val r = spark.sql(
      """SELECT e.item, e.cnt FROM (
        |  SELECT explode(topk_freq(p_brand, 64, 1)) AS e FROM part_sql)""".stripMargin)
      .head
    val top = part.groupBy($"p_brand").count()
      .orderBy($"count".desc, $"p_brand").head
    assert(r.getString(0) === top.getString(0) && r.getLong(1) === top.getLong(1))
  }

  test("winnow_fps and kmv_distinct on the SQL surface") {
    GraftExtensions.install(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("docs_sql")
    // winnow_fps == the library wrapper
    val sql = spark.sql(
      """SELECT doc_id, explode(winnow_fps(text, 5, 4)) AS fp
        |FROM docs_sql""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lib = graft.ext.Dedup.winnowFingerprints(docs, "doc_id", "text", 5, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sql === lib)
    // kmv_distinct over the SQL-spelled order hash == the library column
    val est = spark.sql(
      """SELECT source,
        |  kmv_distinct(CAST(conv(substring(md5(CAST(tok AS STRING)), 1, 15), 16, 10)
        |    AS BIGINT), 16) AS est
        |FROM (SELECT source, explode(split(text, ' ')) AS tok FROM docs_sql)
        |WHERE tok <> '' GROUP BY source""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val libEst = docs.select($"source", explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "")
      .groupBy($"source").agg(Sketches.kmvDistinct($"tok", 16).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est === libEst)
  }

  test("sampleBottomK picks exactly the k smallest order-hashes, via TakeOrdered") {
    val sample = Sketches.sampleBottomK(part, $"p_partkey", 50)
    val exact = part.withColumn("h", Sketches.orderHash($"p_partkey"))
      .orderBy($"h", $"p_partkey").limit(50).drop("h")
    assert(sample.except(exact).isEmpty && exact.except(sample).isEmpty)
    assert(sample.count() === 50)
    val phys = sample.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"), s"expected TakeOrdered, got:\n$phys")
  }

  test("xx order-hash twins: SQL xxhash64 parity, exactness below k, same selection machinery") {
    // the production hasher IS SQL xxhash64 masked non-negative —
    // pinned the same way DedupSpec pins winnow_fps_xx
    val viaSql = part.selectExpr(
        "p_partkey", "xxhash64(CAST(p_partkey AS STRING)) & 9223372036854775807 AS h")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLib = part.select($"p_partkey", Sketches.orderHashXx($"p_partkey").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql === viaLib)
    assert(viaLib.values.forall(_ >= 0L))

    // same exact-below-k law as the md5 twin, same merge machinery
    val df = spark.range(40).toDF("k")
    val est = df.agg(Sketches.kmvDistinct($"k", 64, xx = true)).head.getDouble(0)
    assert(est === 40.0)

    // bottom-k under xx = the k smallest xx hashes, still TakeOrdered
    val sample = Sketches.sampleBottomK(part, $"p_partkey", 50, xx = true)
    val exact = part.withColumn("h", Sketches.orderHashXx($"p_partkey"))
      .orderBy($"h", $"p_partkey").limit(50).drop("h")
    assert(sample.except(exact).isEmpty && exact.except(sample).isEmpty)
    assert(sample.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("bloom join equals the plain join; prefilter passes every true match") {
    val fact = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dim = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
      .where($"s_acctbal" > 5000)
    val viaBloom = BloomJoin.join(fact, "l_suppkey", dim, "s_suppkey", 10000L)
      .select($"l_orderkey", $"l_linenumber", $"s_suppkey")
    val plain = fact.join(dim, $"l_suppkey" === $"s_suppkey")
      .select($"l_orderkey", $"l_linenumber", $"s_suppkey")
    assert(viaBloom.except(plain).isEmpty && plain.except(viaBloom).isEmpty)

    // No false negatives: every key in the plain semi-join survives the filter.
    val bloom = BloomJoin.buildBloom(dim, $"s_suppkey", 10000L)
    val kept = BloomJoin.prefilter(fact, $"l_suppkey", bloom)
    assert(fact.join(dim, $"l_suppkey" === $"s_suppkey", "left_semi")
      .except(kept.join(dim, $"l_suppkey" === $"s_suppkey", "left_semi"))
      .isEmpty)
    // The predicate runs at the scan, below the join.
    val phys = kept.queryExecution.executedPlan.toString
    assert(phys.contains("might_contain"), s"expected might_contain in:\n$phys")
  }

  test("topk_freq as streaming state: cross-batch counts match the batch sketch") {
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("grp", StringType), StructField("item", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("hhstream").toString
    def write(rows: Seq[(String, String)]): Unit =
      spark.createDataFrame(rows.toDF("grp", "item").rdd, sch)
        .coalesce(1).write.mode("append").parquet(dir)

    // two micro-batches whose per-batch top-1 differs from the union's
    // top-1 for group a — only correct cross-batch merge gets b right
    write(Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "p")))
    write(Seq(("a", "y"), ("a", "y"), ("b", "p"), ("b", "q")))

    val q = spark.readStream.schema(sch).option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .groupBy($"grp").agg(Sketches.topkFreq($"item", 8, 1).as("tk"))
      .writeStream.format("memory").queryName("hh")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("hh")
      .select($"grp", $"tk"(0)("item").as("item"), $"tk"(0)("cnt").as("cnt"))
      .as[(String, String, Long)].collect()
      .map { case (g, i, c) => g -> ((i, c)) }.toMap
    assert(got("a") === ("y", 3L)) // y wins only after merging both batches
    assert(got("b") === ("p", 2L))
  }

  test("kmv_distinct as streaming state: cross-batch merge equals the batch sketch") {
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("grp", StringType), StructField("item", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("kmvstream").toString
    def write(rows: Seq[(String, String)]): Unit =
      spark.createDataFrame(rows.toDF("grp", "item").rdd, sch)
        .coalesce(1).write.mode("append").parquet(dir)
    // overlapping batches: only set-union merge counts v0..v39 once
    write((0 until 30).map(i => ("a", s"v$i")))
    write((10 until 40).map(i => ("a", s"v$i")))
    val q = spark.readStream.schema(sch).option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .groupBy($"grp").agg(Sketches.kmvDistinct($"item", 16).as("e"))
      .writeStream.format("memory").queryName("kmvst")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("kmvst").as[(String, Double)].collect().toMap
    val batch = spark.read.schema(sch).parquet(dir)
      .groupBy($"grp").agg(Sketches.kmvDistinct($"item", 16).as("e"))
      .as[(String, Double)].collect().toMap
    assert(streamed === batch, "streaming state merge must equal batch")
  }

  test("hll_distinct as streaming state: update-mode merge across 3 micro-batches == batch") {
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("grp", StringType), StructField("item", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("hllstream").toString
    def write(rows: Seq[(String, String)]): Unit =
      spark.createDataFrame(rows.toDF("grp", "item").rdd, sch)
        .coalesce(1).write.mode("append").parquet(dir)
    // three OVERLAPPING batches: only correct register-max merge
    // counts each distinct item once (sum-like merges overcount)
    write((0 until 300).map(i => ("a", s"v$i")) ++ Seq(("b", "w0")))
    write((100 until 400).map(i => ("a", s"v$i")) ++ Seq(("b", "w1")))
    write((200 until 500).map(i => ("a", s"v$i")) ++ Seq(("b", "w0")))
    val q = spark.readStream.schema(sch).option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .groupBy($"grp").agg(Sketches.hllDistinct($"item", 9).as("e"))
      .writeStream.format("memory").queryName("hllst")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    // update mode appends one row per changed group per epoch; the
    // LAST row per group is its final state
    val streamed = spark.table("hllst").as[(String, Double)].collect()
      .foldLeft(Map.empty[String, Double]) { case (m, (g, e)) => m + (g -> e) }
    val batch = spark.read.schema(sch).parquet(dir)
      .groupBy($"grp").agg(Sketches.hllDistinct($"item", 9).as("e"))
      .as[(String, Double)].collect().toMap
    assert(streamed === batch, "streaming register merge must equal batch")
  }

  test("sample_quantiles as streaming state: update-mode merge across 3 micro-batches == batch") {
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("grp", StringType), StructField("id", LongType),
      StructField("v", DoubleType)))
    val dir = java.nio.file.Files.createTempDirectory("sqstream").toString
    def write(rows: Seq[(String, Long, Double)]): Unit =
      spark.createDataFrame(rows.toDF("grp", "id", "v").rdd, sch)
        .coalesce(1).write.mode("append").parquet(dir)
    // k=16 < per-group rows, so retention genuinely evicts; the
    // bottom-k-by-hash set (and hence every quantile) is a pure
    // function of the union multiset — batch boundaries must not show
    write((0L until 200L).map(i => ("a", i, i * 1.0)))
    write((200L until 400L).map(i => ("a", i, i * 1.0)))
    write((400L until 600L).map(i => ("a", i, i * 1.0)) ++
      Seq(("b", 1L, 5.0)))
    val qs = Seq(0.25, 0.5, 0.9)
    val q = spark.readStream.schema(sch).option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .groupBy($"grp")
      .agg(Sketches.sampleQuantiles($"id", $"v", 16, qs).as("e"))
      .writeStream.format("memory").queryName("sqst")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sqst").as[(String, Seq[Double])].collect()
      .foldLeft(Map.empty[String, Seq[Double]]) { case (m, (g, e)) => m + (g -> e) }
    val batch = spark.read.schema(sch).parquet(dir)
      .groupBy($"grp")
      .agg(Sketches.sampleQuantiles($"id", $"v", 16, qs).as("e"))
      .as[(String, Seq[Double])].collect().toMap
    assert(streamed === batch, "streaming bottom-k merge must equal batch")
    assert(streamed("b") === Seq(5.0, 5.0, 5.0)) // <=k group is exact
  }

  test("randomized sketch law: capacity >= distinct ==> sketch == naive counts") {
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 5) {
      val distinct = 1 + rnd.nextInt(40)
      // zipf-ish skew: item j drawn with weight ~ 1/(j+1)
      val rows = (1 to 2000).map { _ =>
        val r = rnd.nextDouble()
        var j = 0; var acc = 0.0
        val norm = (0 until distinct).map(j => 1.0 / (j + 1.0)).sum
        while (j < distinct - 1 && { acc += 1.0 / ((j + 1) * norm); acc < r }) j += 1
        s"item_$j"
      }
      val df = rows.toDF("item").repartition(1 + rnd.nextInt(7))
      val got = df.agg(Sketches.topkFreq($"item", capacity = 48, k = 48).as("tk"))
        .select(explode($"tk").as("e"))
        .select($"e.item", $"e.cnt", $"e.err")
        .as[(String, Long, Long)].collect()
      val naive = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got.length === naive.size, s"trial $trial")
      got.foreach { case (item, cnt, err) =>
        assert(err === 0L && cnt === naive(item), s"trial $trial item $item")
      }
    }
  }

  test("stratified bottom-k: k deterministic picks per group, matching brute force") {
    val sample = Sketches.stratifiedBottomK(part, Seq("p_type"), $"p_partkey", 5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"p_type").orderBy(Sketches.orderHash($"p_partkey"), $"p_partkey")
    val exact = part.withColumn("rn", row_number().over(w))
      .where($"rn" <= 5).drop("rn")
    assert(sample.except(exact).isEmpty && exact.except(sample).isEmpty)
    val sizes = sample.groupBy($"p_type").count().select($"count").as[Long].collect()
    assert(sizes.forall(_ === 5L))
  }

  test("weighted topk_freq: per-doc token counts roll up to the corpus top-k") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = docs.select(explode(split($"text", " ")).as("tok"))
      .where($"tok" =!= "")
    // pre-aggregated path: count per (doc, token) first, then feed the
    // partial counts to the sketch as weights
    val perDoc = docs.select($"doc_id", explode(split($"text", " ")).as("tok"))
      .where($"tok" =!= "")
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("w"))
    val viaWeights = perDoc
      .agg(Sketches.topkFreqWeighted($"tok", $"w", 64, 5).as("tk"))
      .select(explode($"tk").as("e")).select($"e.item", $"e.cnt")
      .as[(String, Long)].collect().toSeq
    // direct path: one row per token occurrence
    val direct = toks.agg(Sketches.topkFreq($"tok", 64, 5).as("tk"))
      .select(explode($"tk").as("e")).select($"e.item", $"e.cnt")
      .as[(String, Long)].collect().toSeq
    // exhaustive truth
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tok").limit(5)
      .as[(String, Long)].collect().toSeq
    assert(viaWeights === exact)
    assert(direct === exact)
  }

  test("hll sketch distinct: mergeable across partitions, estimate within 2%") {
    // Spark's built-in DataSketches HLL completes the sketch family:
    // partial sketches union exactly like topk_freq buffers merge.
    val docs = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val exact = docs.select(countDistinct($"l_partkey")).head.getLong(0)
    val est = docs.repartition(8)
      .select(hll_sketch_agg($"l_partkey").as("sk"))
      .select(hll_sketch_estimate($"sk")).head.getLong(0)
    assert(math.abs(est - exact) <= exact * 2 / 100, s"est=$est exact=$exact")
    // union of per-group sketches == sketch of the union (mergeability)
    val merged = docs.groupBy($"l_returnflag")
      .agg(hll_sketch_agg($"l_partkey").as("sk"))
      .select(hll_union_agg($"sk").as("u"))
      .select(hll_sketch_estimate($"u")).head.getLong(0)
    assert(merged === est)
  }

  test("bloom join with an empty build side is empty, not a crash") {
    val fact = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dim = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
      .where(lit(false))
    assert(BloomJoin.join(fact, "l_suppkey", dim, "s_suppkey", 100L).isEmpty)
  }

  test("kmv_distinct: exact below k, duplicate-insensitive, merge-path live") {
    // 40 distinct keys × 25 duplicate rows through a k=64 sketch over
    // 8 partitions: distinct semantics + serialize/merge exercised.
    val df = (1 to 1000).map(i => s"key_${i % 40}").toDF("k").repartition(8)
    val est = df.agg(Sketches.kmvDistinct($"k", 64)).head.getDouble(0)
    assert(est === 40.0, s"below-k estimate must be exact, got $est")
  }

  test("kmv_distinct: estimator within theory bounds over k, accuracy grows with k") {
    // 5000 distinct keys; RSE ≈ 1/sqrt(k-2): k=256 → ~6.3%, assert 4σ.
    val df = (1 to 5000).map(i => s"u_$i").toDF("k").repartition(8)
    val est = df.agg(Sketches.kmvDistinct($"k", 256)).head.getDouble(0)
    assert(math.abs(est - 5000) < 5000 * 0.25, s"est=$est")
    // estimate is a pure function of the data (rerun + repartition stable)
    val est2 = df.repartition(3).agg(Sketches.kmvDistinct($"k", 256)).head.getDouble(0)
    assert(est === est2, "KMV must be deterministic under repartition")
  }

  test("kmv_distinct: per-group estimates match the oracle formula") {
    // recompute (k-1)*2^60/h_k with DataFrame ops and compare exactly
    val df = (1 to 2000).map(i => (s"g${i % 3}", s"v_${i % 500}")).toDF("g", "v")
    val k = 32
    val sketch = df.groupBy($"g").agg(Sketches.kmvDistinct($"v", k).as("est"))
    val w = Window.partitionBy($"g").orderBy($"h")
    val manual = df.select($"g", Sketches.orderHash($"v").as("h")).distinct()
      .withColumn("rk", row_number().over(w))
      .where($"rk" === k)
      .select($"g", (lit((k - 1).toDouble) * lit(Sketches.OrderHashSpan) /
        $"h".cast("double")).as("est"))
    val joined = sketch.join(manual, "g")
    assert(joined.count() === 3)
    assert(joined.filter(sketch("est") =!= manual("est")).isEmpty,
      "sketch estimate must equal the closed-form bottom-k formula")
  }

  test("hll_distinct: kernel registers == the SQL-spelled bucket/rho/max formula") {
    // The aggregate must compute EXACTLY the declarative HLL: route
    // the 60-bit md5 hash to 2^p buckets, ρ = leading-zero run of the
    // 51-bit suffix + 1, register = max ρ, estimate = harmonic mean
    // with the linear-counting branch. Re-derive all of it from Spark
    // built-ins and compare to the kernel bit-for-bit-ish (1e-12 rel:
    // only summation order differs).
    val p = 9
    val m = 1 << p
    val df = spark.range(5000).select((col("id") % 1700).as("k"))
      .repartition(8) // forces serialize/merge through partials
    val kernel = df.agg(Sketches.hllDistinct(col("k"), p).as("est"))
      .head.getDouble(0)

    val h = Sketches.orderHash(col("k"))
    val w = (h / m).cast("long")
    // rho = 51 - bitLength(w) + 1; bitLength via 64 - nlz spelled as
    // floor(log2) is float-risky, so spell it with a join against the
    // 52 possible thresholds instead: rho r matches w in
    // [2^(51-r), 2^(52-r)) for r <= 51, w = 0 -> 52.
    // build inner-out so the LARGEST threshold is the outermost test:
    // when(w >= 2^50, 1).otherwise(when(w >= 2^49, 2)...otherwise(52))
    val rho = (51 to 1 by -1).foldLeft(lit(52)) { (acc, r) =>
      when(w >= (1L << (51 - r)), lit(r)).otherwise(acc)
    }
    val regs = df.select(pmod(h, lit(m)).cast("int").as("bucket"), rho.as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("mx"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val denom = (0 until m).map(b =>
      math.pow(2.0, -regs.getOrElse(b, 0).toDouble)).sum
    val zeros = m - regs.size
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m / denom
    val expected =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    assert(math.abs(kernel - expected) / expected < 1e-12,
      s"kernel=$kernel formula=$expected")
    // 1700 true distinct at m=512: raw branch, within 5x the RSE
    assert(math.abs(kernel - 1700.0) / 1700.0 < 5 * 1.04 / math.sqrt(m.toDouble),
      s"estimate $kernel too far from 1700")
  }

  test("hll_distinct: linear-counting branch at low cardinality, merge = elementwise max") {
    val m = 512
    val df = spark.range(100).toDF("k")
    val est = df.repartition(7).agg(Sketches.hllDistinct(col("k"), 9))
      .head.getDouble(0)
    // 100 distinct << 2.5m: linear counting is near-exact
    assert(math.abs(est - 100.0) / 100.0 < 0.05, s"lc estimate $est")
    // merge associativity: union of two halves == whole corpus sketch
    val whole = spark.range(2000).toDF("k")
    val estWhole = whole.agg(Sketches.hllDistinct(col("k"), 9)).head.getDouble(0)
    val estUnion = spark.range(1000).toDF("k")
      .unionAll(spark.range(1000, 2000).toDF("k"))
      .repartition(16)
      .agg(Sketches.hllDistinct(col("k"), 9)).head.getDouble(0)
    assert(estWhole === estUnion,
      "register max-merge must be partition-order-insensitive")
    // xx twin: same machinery, different hash — still a sane estimate
    val estXx = whole.agg(Sketches.hllDistinct(col("k"), 9, xx = true))
      .head.getDouble(0)
    assert(math.abs(estXx - 2000.0) / 2000.0 < 5 * 1.04 / math.sqrt(m.toDouble))
  }

  test("hll_distinct on the SQL surface") {
    GraftExtensions.install(spark)
    spark.range(300).toDF("k").createOrReplaceTempView("hll_sql_t")
    val viaSql = spark.sql(
      """SELECT hll_distinct(CAST(conv(substring(md5(CAST(k AS STRING)), 1, 15), 16, 10)
        |  AS BIGINT), 9) FROM hll_sql_t""".stripMargin).head.getDouble(0)
    val viaLib = spark.range(300).toDF("k")
      .agg(Sketches.hllDistinct(col("k"), 9)).head.getDouble(0)
    assert(viaSql === viaLib)
  }

  test("count-min: never underestimates, exact when no cell collides, collision-safe when forced") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = docs.select(explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "")
    val truth = toks.groupBy($"tok").agg(count(lit(1)).as("true_cnt"))
    val probes = truth.select($"tok").limit(200)
    val sketch = Sketches.cmsSketch(toks.repartition(8), $"tok", 4, 4096)
    // sketch is bounded by depth x width however large the corpus
    assert(sketch.count() <= 4L * 4096)
    val est = Sketches.cmsEstimate(sketch, probes, $"tok", 4, 4096)
    val joined = est.join(truth, est("item") === truth("tok"))
    // CM estimates are one-sided: min-of-rows can only overcount
    assert(joined.filter(col("cms_est") < col("true_cnt")).isEmpty,
      "count-min must never underestimate")
    // at width >> distinct tokens nearly every estimate is exact;
    // require the overwhelming majority rather than a lucky 100%
    val n = joined.count()
    val exactN = joined.filter(col("cms_est") === col("true_cnt")).count()
    assert(exactN >= n * 9 / 10, s"only $exactN/$n exact at width 4096")

    // force collisions: width 4 must still never undercount
    val tiny = Sketches.cmsSketch(toks, $"tok", 3, 4)
    val estTiny = Sketches.cmsEstimate(tiny, probes, $"tok", 3, 4)
    assert(estTiny.join(truth, estTiny("item") === truth("tok"))
      .filter(col("cms_est") < col("true_cnt")).isEmpty)

    // xx twin: same one-sided law under the production hasher
    val sx = Sketches.cmsSketch(toks, $"tok", 4, 4096, xx = true)
    val ex = Sketches.cmsEstimate(sx, probes, $"tok", 4, 4096, xx = true)
    assert(ex.join(truth, ex("item") === truth("tok"))
      .filter(col("cms_est") < col("true_cnt")).isEmpty)
  }

  test("sample_quantiles: exact below k, rank-error-bounded above, partition-invariant") {
    import graft.ext.Sketches
    // 10_000 rows, values = a deterministic permutation of 1..10_000
    // so true quantile q = q*10_000
    val n = 10000
    val rows = (1 to n).map(i => (i.toLong, ((i * 2654435761L) % n + 1).toDouble))
    val df = rows.toDF("id", "v")
    val qs = Seq(0.25, 0.5, 0.75, 0.95)

    // k >= n: the sample IS the group -> exact order statistics
    val exact = df.agg(Sketches.sampleQuantiles($"id", $"v", 16384, qs).as("q"))
      .head.getSeq[Double](0)
    assert(exact === Seq(2500.0, 5000.0, 7500.0, 9500.0))

    // k = 256 << n: each estimate within ~4 sigma of rank error sqrt(q(1-q)/k)*n
    val est = df.agg(Sketches.sampleQuantiles($"id", $"v", 256, qs).as("q"))
      .head.getSeq[Double](0)
    qs.zip(est).foreach { case (q, e) =>
      val tol = 4 * math.sqrt(q * (1 - q) / 256) * n
      assert(math.abs(e - q * n) <= tol, s"q=$q est=$e tol=$tol")
    }

    // determinism: the answer is a pure function of the multiset —
    // any partitioning (and hence any merge tree) gives the same bits
    val est1 = df.repartition(1).agg(
      Sketches.sampleQuantiles($"id", $"v", 256, qs)).head.getSeq[Double](0)
    val est37 = df.repartition(37).agg(
      Sketches.sampleQuantiles($"id", $"v", 256, qs)).head.getSeq[Double](0)
    assert(est1 === est && est37 === est)

    // xx twin: same machinery, different (production) hash
    val ex = df.agg(Sketches.sampleQuantiles($"id", $"v", 256, qs, xx = true))
      .head.getSeq[Double](0)
    qs.zip(ex).foreach { case (q, e) =>
      val tol = 4 * math.sqrt(q * (1 - q) / 256) * n
      assert(math.abs(e - q * n) <= tol, s"xx q=$q est=$e tol=$tol")
    }
  }

  test("weightedBottomK: A-ES selection laws — weight dominance, determinism, w<=0 excluded") {
    import graft.ext.Sketches
    val rows = (1L to 500L).map(i => (i, "g", if (i == 7L) 1e9 else 1.0)) ++
      Seq((9001L, "g", 0.0), (9002L, "g", -3.0))
    val df = rows.toDF("id", "grp", "w")
    val picked = Sketches.weightedBottomK(df, Seq("grp"),
        $"id".cast("string"), $"w", 20)
      .select($"id").as[Long].collect().toSet
    // a weight 1e9x everyone else's is sampled essentially surely
    // (P(miss) < 1e-7 under A-ES) and non-positive weights never are
    assert(picked.contains(7L))
    assert(picked.size === 20)
    assert(!picked.contains(9001L) && !picked.contains(9002L))
    // pure function of the multiset: any partitioning, same sample
    val p37 = Sketches.weightedBottomK(df.repartition(37), Seq("grp"),
        $"id".cast("string"), $"w", 20)
      .select($"id").as[Long].collect().toSet
    assert(p37 === picked)
    // frequency law: uniform weights give every id equal chance; with
    // weight 3 vs 1 planted on disjoint halves, the heavy half should
    // dominate the sample (seeded single draw, wide margin)
    val halves = (1L to 2000L).map(i => (i, "h", if (i <= 1000L) 3.0 else 1.0))
    val hs = Sketches.weightedBottomK(halves.toDF("id", "grp", "w"),
        Seq("grp"), $"id".cast("string"), $"w", 100)
      .select($"id").as[Long].collect()
    val heavy = hs.count(_ <= 1000L)
    assert(heavy > 55, s"heavy-half picks=$heavy of 100") // E≈75, P(<=55)≈1e-5
  }

  test("sampling family plans: bounded bottom_k_rows aggregate, no per-stratum Window") {
    // the row_number().over(partitionBy(stratum)) form serialized each
    // stratum into ONE task and sorted it whole — the executed plans
    // must show the O(k)-state aggregate instead
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plans = Seq(
      Sketches.stratifiedBottomK(part, Seq("p_type"), $"p_partkey", 5),
      Sketches.weightedBottomK(docs, Seq("source"),
        $"doc_id".cast("string"), $"n_chars", 10),
      graft.ext.Corpus.quotaSample(docs, "doc_id", "source", 10)
    ).map(_.queryExecution.executedPlan.toString)
    plans.foreach { p =>
      assert(!p.contains("Window"), s"window survived:\n${p.take(800)}")
      assert(p.contains("bottom_k_rows"), s"aggregate missing:\n${p.take(800)}")
      // map-side combine: a partial aggregation precedes the exchange
      assert(p.contains("partial_bottom_k_rows"), s"no partial agg:\n${p.take(800)}")
    }
  }

  test("bottomKRows: null sort keys are skipped; schema and values survive round-trip") {
    val df = Seq((Some(1L), "a", 1.5), (None, "a", 2.5), (Some(3L), "a", 3.5),
        (Some(4L), "b", 4.5)).toDF("id", "grp", "v")
    val got = Sketches.bottomKRows(df, Seq("grp"),
      Seq(Sketches.orderHash($"id"), $"id"), 10)
    assert(got.schema === df.schema.copy(fields = df.schema.fields
      .map(f => f.copy(nullable = got.schema(f.name).nullable))))
    val ids = got.select($"id").as[Option[Long]].collect().toSet
    assert(ids === Set(Some(1L), Some(3L), Some(4L))) // null-keyed row dropped
  }
}
