package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ext.SimJoin

/** Native ArrayDotProduct / CosineSim expressions (VERDICT r2 item 1):
  * exact parity with the interpreted HOF folds they replaced, HOF null
  * semantics preserved, whole-stage codegen span kept, SQL surface.
  */
class ArrayExprSpec extends SparkSpec {
  import spark.implicits._

  /** The round-2 formulation these kernels must match bit-for-bit. */
  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    (0 until 200).map { i =>
      (i.toLong,
       Seq.fill(64)(rnd.nextDouble() * 2 - 1),
       Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }.toDF("id", "a", "b")
  }

  test("dot == interpreted HOF fold bit-for-bit on 200 random 64-d pairs") {
    val rows = vecs.select(
      SimJoin.dot($"a", $"b").as("native"),
      hofDot($"a", $"b").as("hof")).as[(Double, Double)].collect()
    rows.foreach { case (n, h) => assert(n === h) }
  }

  test("cosine == three-fold HOF formulation bit-for-bit (one-pass kernel, same order)") {
    val rows = vecs.select(
      SimJoin.cosine($"a", $"b").as("native"),
      (hofDot($"a", $"b") / (sqrt(hofDot($"a", $"a")) * sqrt(hofDot($"b", $"b")))).as("hof"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, h) => assert(n === h) }
  }

  test("HOF null semantics: length mismatch and null element -> null; zero norm -> NaN") {
    val df = Seq(
      (Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(3.0))),
      (Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(3.0), Some(4.0))),
      (Seq[Option[Double]](Some(0.0), Some(0.0)), Seq[Option[Double]](Some(1.0), Some(1.0))))
      .toDF("a", "b")
    val got = df.select(SimJoin.dot($"a", $"b"), SimJoin.cosine($"a", $"b")).collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1))   // length mismatch
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))   // null element
    assert(got(2).getDouble(0) === 0.0)
    assert(got(2).getDouble(1).isNaN)                  // 0/0, same as HOF division
  }

  test("float input casts implicitly (embeddings are array<float> at scan)") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    assert(df.select(SimJoin.dot($"a", $"b")).collect().head.getDouble(0) === 11.0)
  }

  test("dot/cosine projection stays in one whole-stage codegen span (no HOF, no UDF)") {
    // range-derived (non-foldable) source; plain array() construction —
    // no HOF anywhere in the plan by design
    val proj = spark.range(1000).select(
      array((0 until 64).map(j => ($"id" + j).cast("double")): _*).as("a"),
      array((0 until 64).map(j => ($"id" - j).cast("double")): _*).as("b"))
      .select(SimJoin.dot($"a", $"b").as("d"), SimJoin.cosine($"a", $"b").as("c"))
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(!plan.contains("lambdafunction"), plan) // the interpreted HOF marker
    assert(plan.contains("*(1) Project"), plan)
    assert(plan.contains("dot_product"), plan)
    assert(plan.contains("cosine_sim"), plan)
    assert(proj.agg(sum($"d")).collect().head.getDouble(0) != 0.0)
  }

  test("SQL surface: dot_product / cosine_sim / hamming64 callable after install") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       hamming64(CAST(5 AS BIGINT), CAST(6 AS BIGINT)) AS h""".stripMargin)
      .collect().head
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getInt(2) === 2)  // 101 xor 110 = 011
  }

  test("SQL surface: polyfit_solve callable after install") {
    GraftExtensions.install(spark)
    // y = 2 + 3x over x in {0,1,2}: S=[3,3,5], T=[15,21] -> c=[2,3]
    val r = spark.sql(
      """SELECT polyfit_solve(array(3.0D, 3.0D, 5.0D),
        |                     array(15.0D, 21.0D)) AS c""".stripMargin)
      .collect().head.getSeq[Double](0)
    assert(math.abs(r(0) - 2.0) < 1e-12 && math.abs(r(1) - 3.0) < 1e-12)
  }

  test("SQL surface: word_shingles / minhash_sig callable after install") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT word_shingles('a b c d', 3) AS sh,
        |       minhash_sig('a b c d', 3, 4) AS sig,
        |       minhash_sig('too short', 3, 4) AS none""".stripMargin)
      .collect().head
    assert(r.getSeq[String](0) === Seq("a b c", "b c d"))
    assert(r.getSeq[Long](1).size === 4)
    assert(r.isNullAt(2))
  }

  test("SQL surface: multimodal decoders callable after install") {
    GraftExtensions.install(spark)
    // non-decodable payloads -> null from both kernels
    val r = spark.sql(
      """SELECT png_gray_features(CAST('junk' AS BINARY)) AS p,
        |       wav_pcm_features(CAST('junk' AS BINARY)) AS w,
        |       mp4_meta(CAST('junk' AS BINARY)) AS m""".stripMargin)
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }
}
