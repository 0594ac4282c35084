package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q139 wall decomposition (VERDICT r10 item 3): split the one
  * perf-weak entry into fixture-synthesis µs vs graded-operator µs.
  * Stages, each min-of-3 after a warm rep:
  *   (a) the graded query as registered
  *   (b) synth only — ogg_synth → sum(length)
  *   (c) synth + CRC page walk (pagesOrNull)
  *   (d) synth + page walk + packet reassembly (packetsOrNull)
  *   (e) synth + the full setup parse (the q139 kernel)
  * (c)/(d) ride scala UDFs — constant per-row overhead vs the
  * codegen kernels, so stage DELTAS are the signal, not absolute
  * gaps to (a).
  */
object Q139Decomp {
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
      println(f"[q139d] $label%-32s $t%6.2f s")
    }
    // the q137/q138/q139 corpus base: full-core spread (Queries14.docIds)
    val docs = graft.Tables.spread(spark,
      graft.Tables.tbl(spark, dir, "documents").select(col("doc_id")),
      minParts = spark.sparkContext.defaultParallelism)
    val synth = gb.column(graft.fn.OggSynth(gb.expression(col("doc_id").cast("long"))))
    timed("graded q139 (sorted)") {
      graft.SparkEntry.queries("q139_vorbis_books")(spark, dir).count()
    }
    timed("synth only (sum length)") {
      docs.select(col("doc_id"), synth.as("ogg"))
        .select(sum(length(col("ogg")))).collect(); 0L
    }
    val pagesUdf = udf((b: Array[Byte]) => {
      val p = graft.ext.Ogg.pagesOrNull(b)
      if (p == null) -1 else p.length
    })
    timed("synth + CRC page walk (udf)") {
      docs.select(pagesUdf(synth).as("np")).agg(sum("np")).collect(); 0L
    }
    val pktUdf = udf((b: Array[Byte]) => {
      val p = graft.ext.Ogg.packetsOrNull(b)
      if (p == null) -1 else p.length
    })
    timed("synth + packet reassembly (udf)") {
      docs.select(pktUdf(synth).as("np")).agg(sum("np")).collect(); 0L
    }
    timed("synth + full setup parse") {
      // one-evaluation barrier, same as the graded query
      docs.select(col("doc_id"),
          explode(array(gb.column(graft.fn.VorbisSetupStats(
            gb.expression(synth))))).as("__s"))
        .filter(col("__s").isNotNull)
        .agg(sum(col("__s.cw_sum"))).collect(); 0L
    }
    spark.stop()
  }
}
