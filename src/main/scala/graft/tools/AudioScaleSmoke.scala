package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale smoke for the mixed-container audio dedup path (the q142
  * shape at corpus scale): N assets — half Ogg Vorbis decoded through
  * the complete [[graft.ext.VorbisDecode]] signal path, half FLAC
  * tone clips with planted perturbed twins — synthesized IN EXECUTORS
  * (no driver-side corpus), fingerprinted with the shared energy-band
  * kernel, and joined through the band-bucket pair stage. Prints
  * wall times at N/10 and N so the linearity of both stages is
  * visible, plus the pair count (planted twins + any accidental
  * ≤3-bit collisions — the gate's documented conservatism).
  */
object AudioScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def run(size: Int): Unit = {
      val assets = spark.range(size).repartition(64).as[Long].map { id =>
        val bytes =
          if (id % 2 == 0) graft.ext.VorbisPcmFixtures.stream(id)
          else if (id % 1001 == 1000)
            // planted near-dup twin of the previous FLAC seed
            graft.ext.AudioFixtures.toneClip((id - 2).toInt,
              nSamples = 4096, perturb = true)
          else graft.ext.AudioFixtures.toneClip(id.toInt, nSamples = 4096)
        (id, bytes)
      }.toDF("aud_id", "content")

      val t0 = System.nanoTime()
      val fps = graft.ext.Audio.withFingerprint(assets)
        .where($"afp".isNotNull)
        .select($"aud_id".as("id"), $"afp".as("dhash"))
      fps.cache()
      val nFp = fps.count()
      val tFp = (System.nanoTime() - t0) / 1e9
      // the band join's real work is over DISTINCT hashes (the
      // documented scale mechanism); id-level pairs then expand
      // exact-dup clusters — the fixtures' modular knobs make the
      // ogg half periodically EXACT-duplicate, which is precisely
      // what a dedup corpus looks like
      val nDistinct = fps.select($"dhash").distinct().count()
      val t1 = System.nanoTime()
      val pairs = graft.ext.Images.nearDupPairsFromHashes(fps, maxHamming = 3)
      val nPairs = pairs.count()
      val tPair = (System.nanoTime() - t1) / 1e9
      fps.unpersist()
      println(f"[audioscale] n=$size%,d  fingerprints=$nFp%,d in $tFp%6.2f s " +
        f"(${nFp / tFp}%,.0f/s)  distinct=$nDistinct%,d  " +
        f"id-pairs=$nPairs%,d in $tPair%6.2f s")
    }
    run(n / 10)
    run(n)
    spark.stop()
  }
}
