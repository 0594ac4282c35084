package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 measurement probe (VERDICT r8 item 5):
  *  - clean min-of-4 re-reads of q56_grouping_sets and
  *    q89_quota_sample at sf0.1 (the two flagged deltas), plus the
  *    q56 plan-shape question: does the Dataset groupingSets form
  *    plan ONE Expand or a union of scans?
  *  - sf10 ledger rows for q126 (repetition signals) and q127 (PII
  *    scrub) over /tmp/sf10 documents;
  *  - throughput rows for the fixed-corpus media entries: q125-style
  *    video near-dup at a 20× corpus (CAVLC + CABAC mixed), MediaMeta
  *    triage over executor-synthesized mixed assets, and the round-9
  *    audio fingerprint over synthesized FLAC clips.
  * `sbt "runMain graft.tools.NewOpsProbeR9 [sf01] [sf10]"`; DuckDB
  * same-day rows via `scripts/duck_bench.py`.
  */
object NewOpsProbeR9 {
  def main(args: Array[String]): Unit = {
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sf10 = if (args.length > 1) args(1) else "/tmp/sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def timed(name: String, dir: String, reps: Int = 4): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        noop(graft.SparkEntry.queries(name)(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }.min

    // warm the inputs
    Seq(sf01, sf10).foreach { d =>
      spark.read.parquet(s"$d/documents.parquet").count()
      spark.read.parquet(s"$d/lineitem.parquet").count()
    }

    // ---- q56 plan shape
    val q56Plan = graft.SparkEntry.queries("q56_grouping_sets")(spark, sf01)
      .queryExecution.executedPlan.toString
    val nExpand = "Expand".r.findAllIn(q56Plan).length
    val nScan = "Scan parquet".r.findAllIn(q56Plan).length
    println(s"[r9] q56 plan: $nExpand Expand node(s), $nScan scan(s)")

    // ---- flagged sf0.1 re-reads
    for (q <- Seq("q56_grouping_sets", "q89_quota_sample"))
      println(f"[r9] $q%-22s sf0.1 min-of-4: ${timed(q, sf01)}%6.3f s")

    // ---- sf10 ledger rows
    for (q <- Seq("q126_repetition_signals", "q127_pii_scrub")) {
      val t01 = timed(q, sf01, 3)
      val t10 = timed(q, sf10, 2)
      println(f"[r9] $q%-22s sf0.1 $t01%6.2f s   sf10 $t10%6.2f s   growth ${t10 / t01}%5.2f (100x data)")
    }

    // ---- video near-dup at a 20x q125 corpus (mixed entropy layers)
    def scene(seed: Int)(x: Int, y: Int): Int = {
      val h = seed * 2654435761L
      val fu = 1 + (h % 6).toInt.abs; val fv = 1 + ((h >> 8) % 5).toInt.abs
      (127 + 90 * math.sin(fu * x / 2.5 + fv * y / 2.0 +
        ((h >> 16) % 628).toInt / 100.0)).toInt & 0xFF
    }
    val nVid = 1440
    val vids = (0 until nVid).map { i =>
      val b =
        if (i % 3 == 0) graft.ext.VideoFixtures.pcmKeyframeMp4Cabac(scene(i))
        else graft.ext.VideoFixtures.pcmKeyframeMp4(scene(i))
      (i.toLong, b)
    }
    val vdf = spark.createDataFrame(vids).toDF("vid_id", "content")
      .repartition(32).cache()
    vdf.count()
    val tv = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      noop(graft.ext.Multimodal.nearDupVideoPairs(vdf, "vid_id", maxHamming = 3))
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"[r9] video near-dup        $nVid%d MP4s (1/3 CABAC): $tv%6.2f s = ${nVid / tv}%,.0f videos/s")

    // ---- MediaMeta triage throughput: a 60-variant pool of real
    // containers (PNG/JPEG via the JDK's own encoders, hand WAVs,
    // AudioFixtures FLACs, VideoFixtures MP4s, junk) fanned to 200k
    // rows on executors (pool ships once per task in the closure)
    val nMedia = 200000
    def png(seed: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        48, 32, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 32; x <- 0 until 48)
        img.getRaster.setSample(x, y, 0, scene(seed)(x % 16, y % 16))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, baos)
      baos.toByteArray
    }
    def wav(seed: Int): Array[Byte] = {
      val n = 4000
      val data = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val v = (9000 * math.sin(i / (3.0 + seed % 7))).toInt
        data(2 * i) = (v & 0xFF).toByte
        data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
      def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
      "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
        le32(16000) ++ le16(2) ++ le16(16) ++ "data".getBytes ++
        le32(data.length) ++ data
    }
    val pool: Array[Array[Byte]] =
      ((0 until 15).map(i => png(i, "png")) ++
        (0 until 15).map(i => png(i, "jpg")) ++
        (0 until 10).map(wav) ++
        (0 until 10).map(i => graft.ext.AudioFixtures.toneClip(i, 4096)) ++
        (0 until 5).map(i => graft.ext.VideoFixtures.pcmKeyframeMp4(scene(i))) ++
        (0 until 5).map(i => s"junk payload $i".getBytes.asInstanceOf[Array[Byte]])).toArray
    val mediaRdd = spark.sparkContext.range(0, nMedia, numSlices = 32)
      .map(i => org.apache.spark.sql.Row(i, pool((i % pool.length).toInt)))
    val mdf = spark.createDataFrame(mediaRdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType)))).cache()
    mdf.count()
    graft.GraftExtensions.install(spark)
    mdf.createOrReplaceTempView("media_assets")
    val tm = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      noop(spark.sql(
        """SELECT id, image_dims(content) AS d, audio_meta(content) AS a
          |FROM media_assets""".stripMargin))
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"[r9] MediaMeta triage      $nMedia%,d mixed assets: $tm%6.2f s = ${nMedia / tm}%,.0f assets/s")

    // ---- audio fingerprint throughput (round-9 FLAC decode + Haar)
    val nAud = 2000
    val auds = (0 until nAud).map(i =>
      (i.toLong, graft.ext.AudioFixtures.toneClip(i, nSamples = 8192)))
    val adf = spark.createDataFrame(auds).toDF("aud_id", "content")
      .repartition(32).cache()
    adf.count()
    val ta = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      noop(graft.ext.Audio.nearDupAudioPairs(adf, "aud_id", maxHamming = 3))
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"[r9] audio near-dup        $nAud%d FLAC clips (8k samples): $ta%6.2f s = ${nAud / ta}%,.0f clips/s")

    spark.stop()
  }
}
