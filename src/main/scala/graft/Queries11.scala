package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle corpus, batch 11 (round 8): the skew toolkit on the graded
  * path. [[graft.ops.Salt]] shipped in round 5 as a unit-tested
  * operator but no oracle query exercised it; q124 plants a 90%-hot
  * join key in lineitem (the skew regime AQE's skew-join split only
  * covers for sort-merge joins it chooses itself) and runs the
  * salted-join + two-phase aggregate shape end-to-end. The oracle
  * recomputes the identical planted key and the plain join/aggregate
  * in DuckDB — salting must be invisible in the answer, that is the
  * operator's whole correctness claim (row multiplicity unchanged:
  * each left row meets each matching right row exactly once, on its
  * own salt replica).
  */
object Queries11 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.tbl(s, dir, name)

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  // --------------------- q124: salted join + agg over a planted hot key
  /** 90% of lineitem rows collapse onto k = 0 (the planted hot key);
    * the dimension side is a per-k aggregate of orders keyed the same
    * way. [[graft.ops.Salt.saltedJoin]] spreads the hot key across 32
    * salt replicas (one per local core; on a cluster, O(executor
    * slots)) — the join key becomes (k, __salt), so no single
    * task owns k = 0 — and the final per-k aggregate re-combines.
    * At local test SF Spark would broadcast the dim side anyway; the
    * salted plan's value is at the scale where it cannot
    * (SaltSkewProbe's forced-SMJ A/B at sf1 in BENCH_NOTES).
    */
  private def hotKey(c: Column): Column =
    when(pmod(c, lit(10L)) < 9, lit(0L)).otherwise(pmod(c, lit(1000L)))

  private def q124(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .withColumn("k", hotKey($"l_orderkey"))
    val dim = t(s, dir, "orders")
      .withColumn("k", hotKey($"o_orderkey"))
      .groupBy($"k").agg(count(lit(1)).as("dim_cnt"))
    val joined = graft.ops.Salt.saltedJoin(li, dim, Seq("k"),
      $"l_orderkey" * 16 + $"l_linenumber", nSalts = 32)
    joined.groupBy($"k")
      .agg(count(lit(1)).as("n_rows"),
        dsum($"l_quantity").as("sum_qty"),
        max($"dim_cnt").as("dim_cnt"))
      .orderBy($"k")
  }

  private val q124Sql =
    """WITH lk AS (
      |  SELECT CASE WHEN l_orderkey % 10 < 9 THEN 0
      |              ELSE l_orderkey % 1000 END AS k, l_quantity
      |  FROM lineitem
      |), ok AS (
      |  SELECT CASE WHEN o_orderkey % 10 < 9 THEN 0
      |              ELSE o_orderkey % 1000 END AS k,
      |    CAST(COUNT(*) AS BIGINT) AS dim_cnt
      |  FROM orders GROUP BY 1
      |)
      |SELECT lk.k, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  MAX(ok.dim_cnt) AS dim_cnt
      |FROM lk JOIN ok ON lk.k = ok.k
      |GROUP BY lk.k ORDER BY lk.k""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q124_salted_join" -> (q124 _))

  val oracles: Map[String, String] = Map(
    "q124_salted_join" -> q124Sql)

  // $"..." interpolator without a SparkSession-bound implicits import
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
