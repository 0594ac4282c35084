package graft

import graft.ext.{Audio, AudioFixtures}
import org.apache.spark.sql.functions._

/** Audio curation signals ([[Audio.profileOrNull]]): exactness over
  * both lossless carriages, Vorbis routing, and the streaming gate's
  * stream ≡ batch parity.
  */
class AudioProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile closed forms: WAV and FLAC carriages agree exactly (80 ids)") {
    for (id <- 0L until 80L) {
      val (samples, rate) = AudioFixtures.profileSamples(id)
      val n = samples.length
      val nA = 200 + (id % 3).toInt * 50
      val a = if (id % 4 == 0) 32767 else 8192 + (id % 7).toInt * 1024
      val b = 100 + (id % 50).toInt
      val p = Audio.profileOrNull(AudioFixtures.profileDoc(id))
      assert(p != null, s"id=$id")
      assert(p(0) === n.toDouble && p(1) === rate.toDouble, s"id=$id")
      assert(p(2) === (if (id % 4 == 0) 300.0 else 0.0), s"id=$id clip")
      assert(p(3) === (n - 300).toDouble, s"id=$id silence")
      val expRms = math.sqrt(
        (300.0 * a * a + (n - nA - 300).toDouble * b * b) / 1073741824.0 / n)
      assert(p(4) === expRms, s"id=$id rms")
      assert(p(5) === a / 32768.0, s"id=$id peak")
      // the OTHER carriage decodes to the identical profile
      val other =
        if (id % 2 == 0) AudioFixtures.flac(Array(samples), rate)
        else AudioFixtures.wav16(samples, rate)
      assert(Audio.profileOrNull(other).toSeq === p.toSeq, s"id=$id carriage")
    }
  }

  test("vorbis routes; junk nulls") {
    // a real Vorbis clip decodes to SOME profile (lossy — no exact
    // oracle, only shape sanity)
    val ogg = graft.ext.VorbisPcmFixtures.stream(7)
    val p = Audio.profileOrNull(ogg)
    assert(p != null && p(0) > 0 && p(4) > 0)
    assert(Audio.profileOrNull(null) === null)
    assert(Audio.profileOrNull("nope".getBytes) === null)
  }

  test("WebM A_VORBIS carriage: same PCM as the Ogg carriage (round 15)") {
    var checked = 0
    for (id <- 0L until 24L) {
      val ogg = graft.ext.VorbisPcmFixtures.stream(id)
      val pages = graft.ext.Ogg.pagesOrNull(ogg)
      val packets = graft.ext.Ogg.packetsFrom(ogg, pages)
      assert(packets != null && packets.length >= 4, s"id=$id packets")
      val webm = graft.ext.WebmFixtures.vorbisWebm(
        packets.take(3).toSeq, packets.drop(3).toSeq)
      val fromWebm = graft.ext.Audio.monoOrNull(webm)
      val fromOgg = graft.ext.Audio.monoOrNull(ogg)
      assert(fromWebm != null, s"id=$id webm route")
      assert(fromOgg != null, s"id=$id ogg route")
      assert(fromWebm._2 === fromOgg._2, s"id=$id rate")
      // the Ogg walk trims to the final granule position; Matroska
      // has no granule, so the WebM PCM may carry the synthesis tail —
      // the shared prefix must be IDENTICAL and cover the Ogg stream
      assert(fromWebm._1.length >= fromOgg._1.length, s"id=$id length")
      var i = 0
      while (i < fromOgg._1.length) {
        assert(fromWebm._1(i) === fromOgg._1(i), s"id=$id sample $i")
        i += 1
      }
      checked += 1
    }
    assert(checked === 24)
    // and the audio profile flows through the WebM route end-to-end
    val ogg = graft.ext.VorbisPcmFixtures.stream(3L)
    val pk = graft.ext.Ogg.packetsFrom(ogg, graft.ext.Ogg.pagesOrNull(ogg))
    val webm = graft.ext.WebmFixtures.vorbisWebm(pk.take(3).toSeq, pk.drop(3).toSeq)
    val prof = graft.ext.Audio.profileOrNull(webm)
    assert(prof != null && prof(0) > 0)
  }

  test("WebM A_VORBIS laced carriage: Xiph/EBML-laced blocks decode to the same PCM (round 16)") {
    // real muxers lace small Vorbis packets; the laced fixture also
    // interleaves a video track so a cross-track packet budget (the
    // old bug) would truncate the audio stream
    for (id <- Seq(0L, 3L, 7L, 11L, 19L)) {
      val ogg = graft.ext.VorbisPcmFixtures.stream(id)
      val pk = graft.ext.Ogg.packetsFrom(ogg, graft.ext.Ogg.pagesOrNull(ogg))
      val plain = graft.ext.WebmFixtures.vorbisWebm(
        pk.take(3).toSeq, pk.drop(3).toSeq)
      val laced = graft.ext.WebmFixtures.vorbisWebmLaced(
        pk.take(3).toSeq, pk.drop(3).toSeq)
      val a = graft.ext.Webm.vorbisPcmOrNull(plain)
      val b = graft.ext.Webm.vorbisPcmOrNull(laced)
      assert(a != null && b != null, s"id=$id")
      val am = a.mono; val bm = b.mono
      assert(bm.length === am.length, s"id=$id length")
      var i = 0
      while (i < am.length) {
        assert(bm(i) === am(i), s"id=$id sample $i")
        i += 1
      }
      // a tight budget now counts VORBIS packets, not video blocks:
      // budget 4 must still decode (3 headers ride CodecPrivate)
      assert(graft.ext.Webm.vorbisPcmOrNull(laced, maxN = 4) != null, s"id=$id budget")
    }
  }

  test("streaming audio quality gate: stateless, stream == batch") {
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(StructField("asset_id", LongType),
      StructField("ts", LongType), StructField("content", BinaryType)))
    val dir = java.nio.file.Files.createTempDirectory("audiogate").toString
    val min = 60L * 1000000000L
    // 1: healthy tone; 2: all-silence; 3: heavily clipped; 4: junk
    def tone(a: Int, n: Int): Array[Byte] =
      AudioFixtures.wav16(Array.tabulate(n)(k =>
        if (k % 2 == 0) a else -a), 8000)
    val rows = Seq(
      (1L, 1 * min, tone(8000, 2000)),
      (2L, 2 * min, AudioFixtures.wav16(new Array[Int](2000), 8000)),
      (3L, 3 * min, tone(32767, 2000)),
      (4L, 4 * min, "junk".getBytes))
    spark.createDataFrame(rows.toDF("asset_id", "ts", "content").rdd, sch)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val batch = graft.streaming.DocStreams.audioQualityGate(
      spark.read.schema(sch).parquet(dir))
    val batchKept = batch.select("asset_id").as[Long].collect().toSet
    assert(batchKept === Set(1L), s"batch kept=$batchKept")
    val q = graft.streaming.DocStreams.audioQualityGate(
        spark.readStream.schema(sch).parquet(dir))
      .writeStream.format("memory").queryName("audiogate")
      .outputMode("append").start()
    val kept = try {
      q.processAllAvailable()
      spark.table("audiogate").select($"asset_id").as[Long].collect().toSet
    } finally q.stop()
    assert(kept === batchKept)
  }
}
