package graft.tools

/** Round-16 kernel micro-timings (no Spark): where do q141's
  * milliseconds-per-doc go (synth vs decode), and what does one
  * 40-byte md5 actually cost vs xxhash64 on this box — measured
  * before touching any kernel (guide §1: measure first).
  */
object R16Micro {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(2000)

    // --- vorbis: synth-only vs synth+decode, per doc
    def timeIt(label: String, reps: Int)(body: => Unit): Double = {
      body // warm
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) { body; r += 1 }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[micro] $label%-28s total=$s%8.3f s  per-rep=${s / reps * 1e3}%9.4f ms")
      s
    }

    var sink = 0L
    timeIt("vorbis synth only", 3) {
      var d = 0L
      while (d < nDocs) { sink += graft.ext.VorbisPcmFixtures.stream(d).length; d += 1 }
    }
    timeIt("vorbis synth+decode", 3) {
      var d = 0L
      while (d < nDocs) {
        val st = new graft.ext.VorbisDecode.Stats
        val pcm = graft.ext.VorbisDecode.decodeOrNull(
          graft.ext.VorbisPcmFixtures.stream(d), st)
        sink += pcm.nSamples
        d += 1
      }
    }

    // --- md5 vs xxhash64, 40-byte messages
    val buf = new Array[Byte](4096)
    new java.util.Random(7).nextBytes(buf)
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Byte](16)
    val N = 2000000
    timeIt(s"md5 40B x$N", 1) {
      var i = 0
      while (i < N) {
        md.reset(); md.update(buf, i % 1000, 40); md.digest(out, 0, 16)
        sink += out(0)
        i += 1
      }
    }
    timeIt(s"xxh64 40B x$N", 1) {
      var i = 0
      while (i < N) {
        sink += org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i % 1000, 40, 42L)
        i += 1
      }
    }
    println(s"[micro] sink=$sink")
  }
}
