package graft

import org.apache.spark.sql.functions.sum

/** The round-10 media kernels (`mp3_synth`/`mp3_side_stats`,
  * `ogg_synth`/`ogg_stream_meta`) through their SQL surface: values
  * match the closed forms AND the whole chain stays a single
  * whole-stage-codegen span with no shuffle — the q137/q138 scale
  * shape (per-row narrow kernels; the only exchange in those queries
  * is their final presentation sort).
  */
class MediaSynthPlanSpec extends SparkSpec {

  test("mp3/ogg synth+walk kernels: one codegen span, no shuffle, exact sums") {
    GraftExtensions.install(spark)
    // spark.range keeps the plan lazy (the WebOpsSpec discipline: a
    // local Seq constant-folds and proves nothing)
    val df = spark.range(30)
      .selectExpr("mp3_side_stats(mp3_synth(id)) AS m",
        "ogg_stream_meta(ogg_synth(id)) AS o")
      .selectExpr("m.n_frames AS nf", "o.n_pages AS np")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*(1) Project"), plan)
    val r = df.agg(sum("nf"), sum("np")).head
    // Σ_{id<30} (2 + id%3) = 10·(2+3+4) = 90
    assert(r.getLong(0) === 90L)
    // Σ_{id<30} (3 + 3 + id%4) = 30·6 + (7·6 + 0 + 1) = 223
    assert(r.getLong(1) === 223L)
  }

  test("vorbis decode kernel: one codegen span, no shuffle, closed-form sums") {
    GraftExtensions.install(spark)
    val df = spark.range(20)
      .selectExpr("vorbis_pcm_stats(vorbis_pcm_synth(id)) AS v")
      .selectExpr("v.n_packets AS np", "v.pcm_samples AS ps")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*(1) Project"), plan)
    val r = df.agg(sum("np"), sum("ps")).head
    val expNp = (0L until 20L).map(d => graft.ext.VorbisPcmFixtures.nAudio(d).toLong).sum
    val expPs = (0L until 20L).map(d =>
      graft.ext.VorbisPcmFixtures.granuleAfter(d,
        graft.ext.VorbisPcmFixtures.nAudio(d) - 1)).sum
    assert(r.getLong(0) === expNp)
    assert(r.getLong(1) === expPs)
  }

  test("pdf synth+extract kernels: one codegen span, no shuffle, closed forms") {
    GraftExtensions.install(spark)
    val df = spark.range(40)
      .selectExpr("pdf_text(pdf_synth(id)) AS p")
      .selectExpr("p.n_pages AS np", "p.n_objects AS no", "p.n_chars AS nc")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*(1) Project"), plan)
    val r = df.agg(sum("np"), sum("no"), sum("nc")).head
    val ids = 0L until 40L
    assert(r.getLong(0) === ids.map(graft.ext.PdfFixtures.expectedPages(_).toLong).sum)
    assert(r.getLong(1) === ids.map(graft.ext.PdfFixtures.expectedObjects(_).toLong).sum)
    assert(r.getLong(2) === ids.map { i =>
      val t = graft.ext.PdfFixtures.expectedText(i)
      t.codePointCount(0, t.length).toLong
    }.sum)
  }
}
