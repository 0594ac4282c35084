package graft

import org.apache.spark.sql.functions._

/** Bucketing for co-located joins (the brief's named technique): two
  * tables bucketed by the join key join WITHOUT any Exchange — the
  * shuffle happened once at write time and is amortized over every
  * subsequent join.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key tables join with zero exchanges") {
    val wh = java.nio.file.Files.createTempDirectory("warehouse").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

    // external-table paths: warehouse dir is a static conf in a shared
    // test session, so place the bucketed data explicitly
    orders.write.mode("overwrite").option("path", s"$wh/orders_b")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write.mode("overwrite").option("path", s"$wh/lineitem_b")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    // merge hint: at this fixture scale Spark would broadcast (also
    // fine, but then bucketing is moot); production-size tables pick
    // SMJ on their own
    val joined = spark.table("lineitem_b")
      .hint("merge")
      .join(spark.table("orders_b").hint("merge"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString

    // the join itself sees NO shuffle: both sides are pre-partitioned
    // by the key at write time (only the final small agg exchanges)
    val joinSection = plan.split("SortMergeJoin|ShuffledHashJoin").last
    assert(joinSection.sliding("Exchange".length).count(_ == "Exchange") === 0,
      s"unexpected exchange below the join:\n$plan")
    // correctness unchanged vs plain join
    val plain = lineitem.join(orders, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    assert(joined.collect().map(_.toString).sorted ===
      plain.collect().map(_.toString).sorted)
  }

  test("q10b: bucketed chain plans zero orderkey exchanges, answers match q10") {
    val dir = "/root/testdata/sf0.001"
    val q10 = SparkEntry.queries("q10_join_agg_chain")(spark, dir)
    val q10b = SparkEntry.queries("q10b_join_agg_bucketed")(spark, dir)

    def orderkeyExchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
        .findAllIn(df.queryExecution.executedPlan.toString).length

    // the plain chain pays the per-order aggregate exchange; the
    // bucketed chain must plan NONE keyed on the bucket key (later
    // custkey/nationkey exchanges are a different key and remain)
    assert(orderkeyExchanges(q10) > 0, "fixture lost its baseline exchange")
    assert(orderkeyExchanges(q10b) === 0,
      s"bucketed plan still exchanges on orderkey:\n${q10b.queryExecution.executedPlan}")
    assert(q10b.collect().map(_.toString).toSeq ===
      q10.collect().map(_.toString).toSeq)
  }
}
