package graft.tools

/** Single-thread µbenchmark of the q137/q138 kernels (no Spark): how
  * much CPU one synth + one walk costs per row, separated — the
  * constant-factor ledger behind the sf10 numbers.
  */
object MediaKernelMicro {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    def timed(label: String)(f: Long => Long): Unit = {
      var sink = 0L
      var i = 0L
      while (i < n) { sink += f(i); i += 1 } // warm
      val reps = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        var j = 0L
        while (j < n) { sink += f(j); j += 1 }
        (System.nanoTime() - t0) / 1e3 / n
      }
      println(f"[micro] $label%-18s ${reps.min}%7.2f µs/row  (sink=${sink % 10})")
    }
    timed("mp3 synth")(id => graft.ext.Mp3Fixtures.stream(id).length.toLong)
    timed("mp3 synth+walk") { id =>
      val r = graft.fn.Mp3SideStats.statsOrNull(graft.ext.Mp3Fixtures.stream(id))
      if (r == null) 0L else r.getLong(5)
    }
    timed("ogg synth")(id => graft.ext.OggFixtures.stream(id).length.toLong)
    timed("ogg synth+walk") { id =>
      val r = graft.fn.OggStreamMeta.metaOrNull(graft.ext.OggFixtures.stream(id))
      if (r == null) 0L else r.getLong(10)
    }
    timed("ogg walk only") { id =>
      val b = graft.ext.OggFixtures.stream(id % 64) // small cache set
      val m = graft.ext.Ogg.metaOrNull(b)
      if (m == null) 0L else m.audioBytes
    }
    timed("vorbis books stats") { id =>
      val r = graft.fn.VorbisSetupStats.statsOrNull(
        graft.ext.OggFixtures.stream(id * 5 / 4 * 4 / 4 + 1)) // mostly vorbis ids
      if (r == null) 0L else r.getLong(7)
    }
    timed("vorbis full stats") { id =>
      val r = graft.fn.VorbisSetupFull.statsOrNull(
        graft.ext.OggFixtures.stream(id * 5 / 4 * 4 / 4 + 1))
      if (r == null) 0L else r.getLong(5)
    }
    // the round-10 signal path: full synth + FULL AUDIO DECODE
    // (~21 packets, FFT-IMDCT, ~2.4k–11k samples per stream)
    timed("vorbis pcm synth")(id =>
      graft.ext.VorbisPcmFixtures.stream(id).length.toLong)
    timed("vorbis pcm decode") { id =>
      val r = graft.fn.VorbisPcmStats.statsOrNull(
        graft.ext.VorbisPcmFixtures.stream(id))
      if (r == null) 0L else r.getLong(6)
    }
    timed("vorbis fingerprint") { id =>
      val f = graft.ext.Audio.fingerprint64OrNull(
        graft.ext.VorbisPcmFixtures.stream(id))
      if (f == null) 0L else f.longValue()
    }
  }
}
