package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q138 wall decomposition at an SF dir: (a) the graded query as
  * registered; (b) without the presentation sort; (c) the
  * field-level-filter form (struct extracted in one projection, the
  * null gate on an extracted column — probes whether the
  * struct-isNotNull FilterExec costs a second kernel evaluation).
  */
object Q138Decomp {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.install(spark)
    import org.apache.spark.sql.{graftbridge => gb}
    def timed(label: String)(f: => Long): Unit = {
      f
      val t = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[q138d] $label%-28s $t%6.2f s")
    }
    val docs = graft.Tables.docsPar(spark, dir)
    timed("graded (sorted)") {
      graft.SparkEntry.queries("q138_ogg_meta")(spark, dir).count()
    }
    val synth = gb.column(graft.fn.OggSynth(gb.expression(col("doc_id").cast("long"))))
    def body = docs.select(col("doc_id"), synth.as("ogg"))
      .select(col("doc_id"),
        gb.column(graft.fn.OggStreamMeta(gb.expression(col("ogg")))).as("__m"))
    timed("no sort, struct filter") {
      body.filter(col("__m").isNotNull)
        .select(col("doc_id"), col("__m.codec"), col("__m.channels"),
          col("__m.rate"), col("__m.pre_skip"), col("__m.n_pages"),
          col("__m.n_packets"), col("__m.last_granule"),
          col("__m.duration_ms"), col("__m.n_comments"), col("__m.vendor"),
          col("__m.audio_bytes")).count()
    }
    timed("no sort, field filter") {
      body.select(col("doc_id"), col("__m.codec"), col("__m.channels"),
          col("__m.rate"), col("__m.pre_skip"), col("__m.n_pages"),
          col("__m.n_packets"), col("__m.last_granule"),
          col("__m.duration_ms"), col("__m.n_comments"), col("__m.vendor"),
          col("__m.audio_bytes").as("ab"))
        .filter(col("ab").isNotNull).count()
    }
    spark.stop()
  }
}
