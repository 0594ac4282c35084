package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 A/B: the zstd-jni fast path vs the from-spec decoder at
  * the INGEST level (verdict item 5) — a real zstd-compressed Zarr v2
  * store read end-to-end through [[graft.io.GridIngest.ingestZarr]],
  * not a raw-buffer loop. The store is manufactured by the engine's
  * own sink ([[graft.io.Zarr.writeStore]], zlib chunks) and then
  * transcoded chunk-by-chunk to numcodecs-zstd frames with zstd-jni
  * as the independent encoder (the ZstdSpec convention), `.zarray`
  * patched to `{"id": "zstd"}`. Both sides produce the same aggregate
  * (asserted) and run interleaved min-of-3; the from-spec side is
  * pinned with `-Dgraft.zstd.forceSpec=true` (a per-call read, so one
  * JVM — and local mode's shared executor threads — can time both).
  * `sbt "runMain graft.tools.ZarrZstdProbe [step]"` (default 0.1 ≈
  * 361 MB raw / store).
  */
object ZarrZstdProbe {
  def main(args: Array[String]): Unit = {
    val step = args.headOption.map(_.toDouble).getOrElse(0.1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spec = graft.io.SyntheticGrid.hermineSpec(step)
    val cells = spec.nLat.toLong * spec.nLon *
      spec.depths.size * spec.times.size
    println(f"grid: ${spec.nLat}x${spec.nLon}x${spec.depths.size}x" +
      f"${spec.times.size} = $cells%,d cells, " +
      f"${cells * 2 * 8 / 1e6}%.0f MB raw across both vars")

    val store = "/tmp/graft_fixtures/zarr_zstd_probe/store"
    val root = new org.apache.hadoop.fs.Path(store)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    val grid = graft.io.SyntheticGrid.cleanSentinels(
      graft.io.SyntheticGrid.generate(spark, spec))
    graft.io.Zarr.writeStore(grid, spec, store)

    // ---- transcode data chunks zlib → zstd (zstd-jni, level 3)
    var inZ = 0L; var outZ = 0L
    Seq("water_temp", "salinity").foreach { v =>
      val dir = new org.apache.hadoop.fs.Path(s"$store/$v")
      fs.listStatus(dir).filterNot(_.getPath.getName.startsWith(".")).foreach { st =>
        val comp = new Array[Byte](st.getLen.toInt)
        val in = fs.open(st.getPath)
        try in.readFully(0, comp) finally in.close()
        val inf = new java.util.zip.Inflater()
        inf.setInput(comp)
        val raw = new java.io.ByteArrayOutputStream(comp.length * 4)
        val tmp = new Array[Byte](1 << 16)
        while (!inf.finished()) raw.write(tmp, 0, inf.inflate(tmp))
        inf.end()
        val z = com.github.luben.zstd.Zstd.compress(raw.toByteArray, 3)
        val out = fs.create(st.getPath, true)
        try out.write(z) finally out.close()
        inZ += comp.length; outZ += z.length
      }
      val za = new org.apache.hadoop.fs.Path(dir, ".zarray")
      val len = fs.getFileStatus(za).getLen.toInt
      val buf = new Array[Byte](len)
      val zin = fs.open(za)
      try zin.readFully(0, buf) finally zin.close()
      val patched = new String(buf, "UTF-8").replace(
        """{"id": "zlib", "level": 1}""", """{"id": "zstd", "level": 3}""")
      require(patched.contains("\"zstd\""), s"$v: .zarray patch missed")
      val zout = fs.create(za, true)
      try zout.write(patched.getBytes("UTF-8")) finally zout.close()
    }
    println(f"transcoded: zlib $inZ%,d B -> zstd $outZ%,d B")

    def ingest(): (Double, Double) = {
      val r = graft.io.GridIngest.ingestZarr(spark, store)
        .agg(sum("water_temp"), sum("salinity")).head
      (r.getDouble(0), r.getDouble(1))
    }
    require(graft.io.Zstd.fastPathAvailable, "probe needs zstd-jni on classpath")
    // double-sum combine order can vary run-to-run; equality up to
    // relative 1e-9 is the right check for a decode-parity assert
    def close(a: (Double, Double), b: (Double, Double)): Boolean =
      math.abs(a._1 - b._1) <= 1e-9 * math.abs(b._1) &&
        math.abs(a._2 - b._2) <= 1e-9 * math.abs(b._2)
    val expect = ingest() // warm-up + the reference answer (JNI side)
    System.setProperty("graft.zstd.forceSpec", "true")
    require(close(ingest(), expect), "spec path disagrees with JNI path")
    System.clearProperty("graft.zstd.forceSpec")

    // interleaved min-of-3
    def timed(force: Boolean): Double = {
      if (force) System.setProperty("graft.zstd.forceSpec", "true")
      else System.clearProperty("graft.zstd.forceSpec")
      val t0 = System.nanoTime()
      val got = ingest()
      val dt = (System.nanoTime() - t0) / 1e9
      require(close(got, expect), "answer drifted during timing")
      dt
    }
    val (jni, specT) = (1 to 3).map(_ => (timed(force = false), timed(force = true)))
      .unzip match { case (a, b) => (a.min, b.min) }
    println(f"ingestZarr zstd store: jni $jni%.3f s, from-spec $specT%.3f s " +
      f"(${specT / jni}%.2fx), ${cells * 2 * 8 / 1e6 / jni}%.0f MB/s raw via jni")
    spark.stop()
  }
}
