package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage decomposition of q102's wall time at sf1 (round-7
  * constant hunt). `sbt "runMain graft.tools.LmStageProbe [dir]"`.
  */
object LmStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def best(label: String)(body: => Unit): Unit = {
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[lm-stage] $label%-32s $t%6.2f s")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm cache

    best("noop count")(docs.count())
    best("repartition only")(
      docs.repartition(32).foreach(_ => ()))
    best("termcounts+groupBy collect") {
      graft.ext.LangModel.unigramCounts(docs.repartition(32), "text")
        .limit(4000001).collect()
    }
    best("score slice only") {
      // model built once outside the timer
      ()
    }
    val counts = graft.ext.LangModel.unigramCounts(docs.repartition(32), "text")
    val rows = counts.limit(4000001).collect()
    val model = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = model.valuesIterator.sum
    val vocab = model.size.toLong
    best("kernel-score slice (prebuilt)") {
      import org.apache.spark.sql.{graftbridge => gb}
      val slice = docs.filter($"doc_id" < 300)
      val nll = gb.column(graft.fn.UnigramNll(
        gb.expression(col("text")), model, total, vocab, 1.0))
      slice.select($"doc_id", nll.as("__s")).filter($"__s".isNotNull)
        .orderBy($"doc_id").count()
    }
    spark.stop()
  }
}
