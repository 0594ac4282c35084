package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.SimJoin

/** Dev probe (VERDICT r2 item 5): ANN at 50×-the-bench corpus sizes —
  * recall vs brute-force ground truth, runtime scaling, and CANDIDATE
  * COUNTS (the quantity that must stay bounded for the
  * bucket-candidate-verify shape to survive 100 TB).
  *
  * Corpus: deterministic synthetic 64-d vectors in 20 well-separated
  * clusters (unit-ish cluster centers + small per-vector jitter), so
  * every query's true neighbors are its cluster-mates — the regime ANN
  * indexes exist for. Queries = first vector of each cluster.
  */
object AnnScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sizes = if (args.isEmpty) Seq(25000, 100000) else args.map(_.toInt).toSeq
    val dim = 64; val nClusters = 20; val k = 10

    def corpus(n: Int): DataFrame = {
      // center c component j in [-1,1] from hash; jitter ±0.15
      val cluster = pmod(col("id"), lit(nClusters))
      val comps = (0 until dim).map { j =>
        val center = (pmod(xxhash64(lit("c"), cluster, lit(j)), lit(2000)).cast("double") / 1000.0 - 1.0)
        val jit = (pmod(xxhash64(lit("v"), col("id"), lit(j)), lit(300)).cast("double") / 1000.0 - 0.15)
        center + jit
      }
      spark.range(n).select(col("id").as("vec_id"), array(comps: _*).as("v"))
    }

    // JVM/codegen warm-up so the first measured size isn't charged
    // session startup
    SimJoin.bruteForceTopK(corpus(2000), corpus(2000).limit(5), "vec_id", "v", 3).count()

    for (n <- sizes) {
      val c = corpus(n).persist()
      c.count()
      val queries = c.filter(col("vec_id") < nClusters)

      // ground truth (brute force — the expensive baseline)
      val t0 = System.nanoTime()
      val truth = SimJoin.bruteForceTopK(c, queries, "vec_id", "v", k)
        .select(col("q_id"), col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val bruteS = (System.nanoTime() - t0) / 1e9

      // LSH path + candidate census
      val planes = SimJoin.planes(16, dim)
      val t1 = System.nanoTime()
      val lsh = SimJoin.annTopK(c, queries, "vec_id", "v", k, planes, b = 4)
        .select(col("q_id"), col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lshS = (System.nanoTime() - t1) / 1e9
      val cb = SimJoin.buckets(c, "vec_id", "v", planes, 4)
      val qb = SimJoin.buckets(queries, "vec_id", "v", planes, 4)
        .withColumnRenamed("vec_id", "q_id")
      val lshCands = cb.join(qb, Seq("band", "code"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id")).distinct().count()

      // IVF path + candidate census
      val t2 = System.nanoTime()
      val cents = SimJoin.ivfCentroids(c, "vec_id", "v", k = nClusters, iters = 3)
      val ivf = SimJoin.ivfTopK(c, queries, "vec_id", "v", k, cents, nProbe = 2)
        .select(col("q_id"), col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivfS = (System.nanoTime() - t2) / 1e9
      val ivfCands = c.withColumn("__cell", SimJoin.assignCell(col("v"), cents)).count() // corpus pass
      val lshRecall = (lsh & truth).size.toDouble / truth.size
      val ivfRecall = (ivf & truth).size.toDouble / truth.size
      println(f"[ann-scale] n=$n%7d brute=$bruteS%6.2fs " +
        f"lsh=$lshS%6.2fs recall=$lshRecall%.3f cands=$lshCands (${lshCands.toDouble / (nClusters.toLong * n)}%.4f of all-pairs) " +
        f"ivf=$ivfS%6.2fs recall=$ivfRecall%.3f probe-frac=${2.0 / nClusters}%.2f corpusPass=$ivfCands")
      c.unpersist()
    }
    spark.stop()
  }
}
