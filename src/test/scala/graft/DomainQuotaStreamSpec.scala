package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.DocStreams

/** [[graft.streaming.DocStreams.domainQuotaGate]] — the windowed
  * per-domain admission quota: k per (registered domain, tumbling
  * window), counter state timeout-evicted when the watermark passes
  * the window end. Single-trigger parity against the batch
  * `row_number() <= k` branch, cross-trigger first-come admission,
  * new-window reset, and the documented horizon trade (an evicted
  * window's late row re-admits — same convention as the dedup gates'
  * horizon-eviction re-admission).
  */
class DomainQuotaStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sch = StructType(Seq(
    StructField("doc_id", LongType), StructField("ts", LongType),
    StructField("url", StringType)))
  private val min = 60L * 1000000000L

  private def writeFile(dir: String, rows: Seq[(Long, Long, String)]): Unit =
    spark.createDataFrame(rows.toDF("doc_id", "ts", "url").rdd, sch)
      .coalesce(1).write.mode("append").parquet(dir)

  private def admitted(name: String): Set[(Long, String, Long, Int)] =
    spark.table(name).select($"doc_id", $"domain", $"win_start", $"seq")
      .as[(Long, String, Long, Int)].collect().toSet

  test("single trigger: stream == batch row_number form, including seq") {
    val dir = java.nio.file.Files.createTempDirectory("quota1").toString
    val rows = Seq(
      (1L, 5 * min, "https://h1.d1.com/a"),
      (2L, 6 * min, "https://h2.d1.com/b"),
      (3L, 7 * min, "https://h1.d1.com/c"), // over quota (k=2)
      (4L, 8 * min, "https://x.d2.com/a"),  // other domain, admitted
      (5L, 9 * min, "not a url"))           // no domain -> drops
    writeFile(dir, rows)
    val q = DocStreams.domainQuotaGate(
        spark.readStream.schema(sch).parquet(dir),
        k = 2, window = "1 hour", watermark = "30 minutes")
      .writeStream.format("memory").queryName("quota1")
      .outputMode("append").start()
    val streamed = try {
      q.processAllAvailable()
      admitted("quota1")
    } finally q.stop()
    val batch = DocStreams.domainQuotaGate(
        spark.read.schema(sch).parquet(dir),
        k = 2, window = "1 hour", watermark = "30 minutes")
      .select($"doc_id", $"domain", $"win_start", $"seq")
      .as[(Long, String, Long, Int)].collect().toSet
    assert(streamed === batch)
    assert(streamed.map(_._1) === Set(1L, 2L, 4L))
    assert(streamed.find(_._1 == 2L).get._4 === 2) // (ts, id) order gives seq
    assert(streamed.forall(_._3 === 0L)) // all in the epoch-start window
  }

  test("cross-trigger: earlier trigger holds the quota; a new window resets it") {
    val dir = java.nio.file.Files.createTempDirectory("quota2").toString
    writeFile(dir, Seq(
      (1L, 5 * min, "https://h1.d1.com/a"),
      (2L, 6 * min, "https://h2.d1.com/b")))
    val q = DocStreams.domainQuotaGate(
        spark.readStream.schema(sch).option("maxFilesPerTrigger", "1").parquet(dir),
        k = 2, window = "1 hour", watermark = "30 minutes")
      .writeStream.format("memory").queryName("quota2")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      writeFile(dir, Seq(
        (3L, 7 * min, "https://h1.d1.com/late-same-window"), // blocked
        (6L, 70 * min, "https://h9.d1.com/next-window")))    // new window
      q.processAllAvailable()
      val got = admitted("quota2")
      assert(got.map(_._1) === Set(1L, 2L, 6L))
      val six = got.find(_._1 == 6L).get
      assert(six._4 === 1 && six._3 === 3600L * 1000000L)
    } finally q.stop()
  }

  test("watermark eviction bounds the state; late rows drop, no quota loophole") {
    val dir = java.nio.file.Files.createTempDirectory("quota3").toString
    writeFile(dir, Seq(
      (1L, 5 * min, "https://h1.d1.com/a"),
      (2L, 6 * min, "https://h2.d1.com/b"))) // quota full for window 0
    val q = DocStreams.domainQuotaGate(
        spark.readStream.schema(sch).option("maxFilesPerTrigger", "1").parquet(dir),
        k = 2, window = "1 hour", watermark = "30 minutes")
      .writeStream.format("memory").queryName("quota3")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // sentinels far in the future: watermark = 600min - 30min >> 1h,
      // so the window-0 counter times out and evicts (the second
      // sentinel forces the post-watermark-advance trigger that fires
      // the timeout)
      writeFile(dir, Seq((9L, 600 * min, "https://s.d9.com/flush")))
      q.processAllAvailable()
      writeFile(dir, Seq((10L, 601 * min, "https://s.d10.com/flush2")))
      q.processAllAvailable()
      // a row for the evicted window is LATE past the watermark:
      // Spark drops it before the stateful operator — the quota
      // decision is final within the horizon, no re-admission loophole
      writeFile(dir, Seq((3L, 7 * min, "https://h1.d1.com/very-late")))
      q.processAllAvailable()
      val got = admitted("quota3")
      assert(got.map(_._1) === Set(1L, 2L, 9L, 10L))
      // state holds only the two live sentinel counters — the
      // window-0 counter is gone (bounded-state evidence)
      val lastState = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty).get.stateOperators(0)
      assert(lastState.numRowsTotal === 2)
    } finally q.stop()
  }
}
