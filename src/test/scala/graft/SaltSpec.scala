package graft

import org.apache.spark.sql.functions._
import graft.ops.Salt

/** Salted skew mitigation: results identical to the unsalted plan,
  * hot-key rows actually spread across salts.
  */
class SaltSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows of one hot key + a long tail
  private lazy val skewed = spark.range(11000)
    .select($"id",
      when($"id" < 10000, lit("HOT")).otherwise(concat(lit("k"), $"id" % 97)).as("k"),
      ($"id" % 13).cast("double").as("v"))

  test("saltedAgg == plain groupBy aggregation") {
    val salted = Salt.saltedAgg(skewed, Seq("k"), $"id", nSalts = 16,
      partial = Seq(sum($"v").as("s"), count(lit(1)).as("c")),
      finalAgg = Seq(sum($"s").as("total"), sum($"c").as("n")))
    val plain = skewed.groupBy($"k")
      .agg(sum($"v").as("total"), count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin == plain join, inner and left") {
    val dim = Seq(("HOT", 1.5), ("k3", 2.0), ("k5", 2.5)).toDF("k", "w")
    for (jt <- Seq("inner", "left")) {
      val salted = Salt.saltedJoin(skewed, dim, Seq("k"), $"id", nSalts = 8, jt)
        .select($"id", $"k", $"v", $"w")
      val plain = skewed.join(dim, Seq("k"), jt).select($"id", $"k", $"v", $"w")
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty, jt)
    }
  }

  test("q124 shape under forced no-broadcast: salt in the join keys, big side unsorted") {
    // at scale the dim side stops broadcasting; disable broadcast and
    // assert the sort-merge join actually keys on (k, __salt) — the
    // property that spreads the 90%-hot key across tasks
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dim = Seq(("HOT", 1.5), ("k3", 2.0), ("k5", 2.5)).toDF("k", "w")
      val salted = Salt.saltedJoin(skewed, dim, Seq("k"), $"id", nSalts = 8)
      val plan = salted.queryExecution.executedPlan.toString
      // the small replicated side hash-builds per partition; the huge
      // salted side is never sorted (SMJ would sort it)
      assert(plan.contains("ShuffledHashJoin"), s"expected SHJ:\n${plan.take(400)}")
      assert(plan.linesIterator.exists(l =>
        l.contains("ShuffledHashJoin") && l.contains("__salt")),
        s"salt not in the SHJ keys:\n${plan.take(600)}")
      val plain = skewed.join(dim, Seq("k"), "inner").select($"id", $"k", $"v", $"w")
      val got = salted.select($"id", $"k", $"v", $"w")
      assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hot key rows actually spread over all salts") {
    val perSalt = skewed.filter($"k" === "HOT")
      .withColumn("s", Salt.saltCol($"id", 16))
      .groupBy($"s").count()
      .as[(Int, Long)].collect().toMap
    assert(perSalt.size === 16)
    assert(perSalt.values.max < 10000L * 2 / 16 + 200) // roughly balanced
  }
}
