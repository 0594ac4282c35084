package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dev probe: cost of the ADVICE-r2 safety changes on q67. */
object Q67Advice {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val H = Dedup.ParityHasher

    def time(name: String)(f: => Long): Unit = {
      val runs = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[v] $name%-36s ${runs.map(_._1).min}%6.2fs rows=${runs.head._2}")
    }

    // pre-ADVICE candidatePairs: collect first, filter after
    def candsOld(bands: DataFrame, maxBucket: Int): DataFrame = {
      val buckets = bands
        .groupBy(col("band"), col("band_hash"))
        .agg(collect_list(col("doc_id")).as("__m"))
        .filter(size(col("__m")).between(2, maxBucket))
      buckets
        .select(col("__m"), posexplode(col("__m")).as(Seq("__i", "__x")))
        .select(col("__x"),
          explode(slice(col("__m"), col("__i") + lit(2), size(col("__m")))).as("__y"))
        .select(least(col("__x"), col("__y")).as("a_id"),
          greatest(col("__x"), col("__y")).as("b_id"))
        .distinct()
    }
    // pre-ADVICE verify: forced broadcast sizes
    def verifyOld(cands: DataFrame, sh: DataFrame, minJ: Double): DataFrame = {
      val candDocs = cands.select(col("a_id").as("doc_id"))
        .union(cands.select(col("b_id").as("doc_id"))).distinct()
      val shC = sh.join(candDocs, Seq("doc_id"), "left_semi")
      val sizes = shC.groupBy(col("doc_id")).agg(count(lit(1)).as("__sz"))
      val shA = shC.select(col("doc_id").as("a_id"), col("shingle"))
      val shB = shC.select(col("doc_id").as("b_id"), col("shingle"))
      cands.join(shA, "a_id").join(shB, Seq("b_id", "shingle"))
        .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("__inter"))
        .join(broadcast(sizes.select(col("doc_id").as("a_id"), col("__sz").as("__sa"))), "a_id")
        .join(broadcast(sizes.select(col("doc_id").as("b_id"), col("__sz").as("__sb"))), "b_id")
        .select(col("a_id"), col("b_id"),
          (col("__inter").cast("double") /
            (col("__sa") + col("__sb") - col("__inter"))).as("jaccard"))
        .filter(col("jaccard") >= minJ)
    }

    def full(c: DataFrame => DataFrame,
             v: (DataFrame, DataFrame) => DataFrame): Long = {
      val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      val sigs = Dedup.minhashSignatures(Dedup.shingleStream(docs, "doc_id", "text", 3), "doc_id", 8, H)
      val bands = Dedup.lshBands(sigs, "doc_id", 8, 4, H)
      v(c(bands), sh).count()
    }
    val cNew = (b: DataFrame) => Dedup.candidatePairs(b, "doc_id")
    val cOld = (b: DataFrame) => candsOld(b, 10000)
    val vNew = (c: DataFrame, s: DataFrame) => Dedup.jaccardVerify(c, s, "doc_id", 0.9)
    val vOld = (c: DataFrame, s: DataFrame) => verifyOld(c, s, 0.9)
    time("newC+newV (current)") { full(cNew, vNew) }
    time("oldC+newV") { full(cOld, vNew) }
    time("newC+oldV") { full(cNew, vOld) }
    time("oldC+oldV (round2)") { full(cOld, vOld) }
    time("newC+newV again") { full(cNew, vNew) }
    spark.stop()
  }
}
