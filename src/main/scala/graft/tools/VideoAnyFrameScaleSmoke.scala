package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Any-frame video near-dup scale smoke (the AudioScaleSmoke
  * convention): N I/P/B GOP videos synthesized IN EXECUTORS (each a
  * distinct scene; every asset runs the full DPB/bi-prediction
  * decode 3×) plus N/10 mid-GOP re-cuts planted as exact frame
  * twins → frame-level fingerprints → the banded pair stage.
  * Asserts exact planted-pair recovery and prints stage walls.
  */
object VideoAnyFrameScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def scene(seed: Long)(x: Int, y: Int): Int = {
      val h = seed * 2654435761L
      val fu = 2 + (h % 5).toInt.abs
      val fv = 1 + ((h >> 8) % 5).toInt.abs
      val p1 = ((h >> 16) % 628).toInt / 100.0
      (127 + 110 * math.sin(fu * x / 1.9 + fv * y / 2.3 + p1)).toInt & 0xFF
    }
    // executors synthesize: originals 0..n-1 are GOPs; ids >= 1e9 are
    // re-cuts of original (id - 1e9) planting its decoded P frame
    val nRecut = n / 10
    val assets = spark.range(n + nRecut).repartition(32)
      .map { i =>
        val id: Long = i
        if (id < n) (id, graft.ext.VideoFixtures.gopSceneMp4(scene(id), 8))
        else {
          val src = id - n
          val f1 = (x: Int, y: Int) => scene(src)(math.min(15, x + 8), y)
          (1000000000L + src, graft.ext.VideoFixtures.pcmKeyframeMp4(f1))
        }
      }.toDF("vid_id", "content")

    var t0 = System.nanoTime()
    val fps = assets.select($"vid_id".as("id"),
        explode(org.apache.spark.sql.graftbridge.column(
          graft.fn.H264GopDhashes(
            org.apache.spark.sql.graftbridge.expression($"content"), 4)))
          .as("dhash"))
      .distinct()
    fps.cache()
    val nFp = fps.count()
    val tFp = (System.nanoTime() - t0) / 1e9
    println(f"[vscale] $n%d GOPs + $nRecut%d re-cuts -> $nFp%d distinct " +
      f"(id,frame-hash) rows in $tFp%.1f s " +
      f"(${(3L * n + nRecut) / tFp / 1000}%.1fk frame decodes/s/box)")

    t0 = System.nanoTime()
    val pairs = graft.ext.Multimodal.nearDupPairsFromMultiHashes(fps, maxHamming = 3)
    val planted = pairs
      .where($"b_id" - $"a_id" === 1000000000L).count()
    val total = pairs.count()
    val tPair = (System.nanoTime() - t0) / 1e9
    println(f"[vscale] pair stage $tPair%.1f s: $total%d pairs, " +
      f"$planted%d/$nRecut%d planted recovered " +
      (if (planted == nRecut) "OK" else "MISSING PLANTS"))
    spark.stop()
  }
}
