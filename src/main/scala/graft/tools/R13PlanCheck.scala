package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-13 closing probe (the R12PlanCheck convention): the new
  * kernels — elst-mapped pts/clip sampling, TTML/stpp carriage, the
  * WebM subtitle + block walks, and the 9-language classifier —
  * must evaluate inside whole-stage codegen, and the classifier's
  * generated plan must be the compact array form (the pairwise
  * when-chain at K = 9 blew the codegen heap; this probe pins the
  * regression).
  */
object R13PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.install(spark)
    for (sql <- Seq(
      "SELECT element_at(element_at(h264_gop_frames(mp4_elst_synth(id), 4, 1, 4), 1), 9) FROM range(50)",
      "SELECT size(h264_clip_frames(mp4_elst_synth(id), 4, 400.0, 8, 4)) FROM range(50)",
      "SELECT size(mp4_subtitle_cues(mp4_ttml_synth(id))) FROM range(50)",
      "SELECT size(webm_subtitle_cues(webm_subtitle_synth(id))) FROM range(50)",
      "SELECT size(webm_block_index(webm_block_synth(id), 64)) FROM range(50)")) {
      val df = spark.sql(sql)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(1)"), s"no codegen span:\n$plan")
      val n = df.collect().length
      assert(n == 50, s"$sql -> $n rows")
      println(s"[r13plan] OK codegen: $sql")
    }
    // the classifier: with codegen FALLBACK DISABLED a too-large
    // generated method (the inline features+argmax shape, or the old
    // pairwise chain) throws instead of silently interpreting — so a
    // clean pass proves the split featurize → classify shape (the
    // q152/q166/langGate/subtitleGate plan) truly compiles
    spark.conf.set("spark.sql.codegen.fallback", "false")
    import org.apache.spark.sql.functions._
    val df = spark.range(1000)
      .select(concat(lit("the people and "), col("id")).as("text"))
      .withColumn("__f", graft.ext.LangId.features(col("text")))
      .select(graft.ext.LangId.classify(col("__f"),
        graft.ext.LangId.PinnedW).as("lang"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"classifier fell out of codegen:\n$plan")
    val t0 = System.nanoTime()
    val n = df.filter(col("lang") === "en").count()
    println(f"[r13plan] classify 1k rows in ${(System.nanoTime() - t0) / 1e9}%.2fs (en=$n)")
    assert(n == 1000L)
    spark.conf.set("spark.sql.codegen.fallback", "true")
    spark.stop()
  }
}
