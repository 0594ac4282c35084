package graft

import graft.ext.{Audio, AudioFixtures, Flac}

/** [[graft.ext.Flac]] frame decoder — fixtures assembled bit-by-bit
  * from the public FLAC format spec by an INDEPENDENT test-side
  * writer (no code shared with the decoder or with
  * [[graft.ext.AudioFixtures]]' encoder), covering every subframe
  * type, both Rice methods + the raw-bits escape, partition orders,
  * all three stereo decorrelations, wasted bits, 8/16/24 bps,
  * multi-frame streams, CRC rejection, and fuzz no-throw; plus the
  * energy-band fingerprint's invariants.
  */
class FlacSpec extends SparkSpec {

  // ---- independent test-side bit writer + CRCs (fresh transcription)
  private class W {
    private val buf = scala.collection.mutable.ArrayBuffer[Int]() // bits
    def b(v: Int): this.type = { buf += (v & 1); this }
    def u(v: Long, n: Int): this.type = {
      (n - 1 to 0 by -1).foreach(k => b(((v >> k) & 1).toInt)); this
    }
    def s(v: Int, n: Int): this.type = u(v.toLong & ((1L << n) - 1), n)
    def align(): this.type = { while (buf.size % 8 != 0) b(0); this }
    def bytes: Array[Byte] = {
      require(buf.size % 8 == 0)
      buf.grouped(8).map(g => g.foldLeft(0)((a, x) => (a << 1) | x).toByte).toArray
    }
    def size: Int = buf.size
  }

  private def crc8(bs: Array[Byte]): Int =
    bs.foldLeft(0) { (c0, x) =>
      var c = c0 ^ (x & 0xFF)
      (0 until 8).foreach(_ => c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF)
      c
    }

  private def crc16(bs: Array[Byte]): Int =
    bs.foldLeft(0) { (c0, x) =>
      var c = c0 ^ ((x & 0xFF) << 8)
      (0 until 8).foreach(_ => c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF else (c << 1) & 0xFFFF)
      c
    }

  /** STREAMINFO + one hand-built frame. `writeSubframes` gets a W
    * positioned right after the header CRC.
    */
  private def stream(blocksize: Int, rate: Int, nCh: Int, bps: Int,
                     chAssign: Int, total: Int)
                    (writeSubframes: W => Unit): Array[Byte] = {
    val si = new W
    si.u(blocksize.toLong, 16).u(blocksize.toLong, 16)
      .u(0, 24).u(0, 24)
      .u(rate.toLong, 20).u(nCh - 1L, 3).u(bps - 1L, 5).u(total.toLong, 36)
    (0 until 16).foreach(_ => si.u(0, 8))
    val head = "fLaC".getBytes ++ Array[Byte](0x80.toByte, 0, 0, 34) ++ si.bytes

    val fh = new W
    fh.u(0x3FFE, 14).b(0).b(0)
    val bsCode =
      if (blocksize == 192) 1
      else if (Integer.bitCount(blocksize) == 1 && blocksize >= 256 && blocksize <= 32768)
        Integer.numberOfTrailingZeros(blocksize)
      else 7
    fh.u(bsCode.toLong, 4).u(0, 4) // rate from STREAMINFO
    fh.u(chAssign.toLong, 4)
    val ssCode = bps match {
      case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6
    }
    fh.u(ssCode.toLong, 3).b(0)
    fh.u(0, 8) // frame number 0
    if (bsCode == 7) fh.u(blocksize - 1L, 16)
    val hdr = fh.bytes
    val w = new W
    hdr.foreach(x => w.u(x & 0xFFL, 8))
    w.u(crc8(hdr).toLong, 8)
    writeSubframes(w)
    w.align()
    val body = w.bytes
    val full = new W
    body.foreach(x => full.u(x & 0xFFL, 8))
    full.u(crc16(body).toLong, 16)
    head ++ full.bytes
  }

  private def zz(v: Int): Long = (v.toLong << 1) ^ (v.toLong >> 63)

  private def riceWrite(w: W, values: Seq[Int], param: Int): Unit =
    values.foreach { v =>
      val u = zz(v)
      var q = (u >>> param).toInt
      while (q > 0) { w.b(0); q -= 1 }
      w.b(1)
      w.u(u & ((1L << param) - 1), param)
    }

  test("hand-built: constant + verbatim subframes, per-sample exact") {
    val bs = 256
    val flac = stream(bs, 8000, 2, 16, 1, bs) { w =>
      w.b(0).u(0, 6).b(0).s(-12345, 16)      // ch0 CONSTANT -12345
      w.b(0).u(1, 6).b(0)                    // ch1 VERBATIM ramp
      (0 until bs).foreach(i => w.s(i * 3 - 100, 16))
    }
    val pcm = Flac.decodeOrNull(flac)
    assert(pcm != null && pcm.channels === 2 && pcm.nSamples === bs)
    assert(pcm.data(0).forall(_ == -12345))
    (0 until bs).foreach(i => assert(pcm.data(1)(i) === i * 3 - 100))
  }

  test("hand-built: fixed orders 1..4 restore their polynomial predictors exactly") {
    for (order <- 1 to 4) {
      val bs = 256
      // ground-truth signal, then derive the residual the spec way
      val sig = Array.tabulate(bs)(i =>
        (1000 * math.sin(i / 7.0) + 20 * math.cos(i / 3.0)).toInt)
      def pred(i: Int): Int = order match {
        case 1 => sig(i - 1)
        case 2 => 2 * sig(i - 1) - sig(i - 2)
        case 3 => 3 * sig(i - 1) - 3 * sig(i - 2) + sig(i - 3)
        case 4 => 4 * sig(i - 1) - 6 * sig(i - 2) + 4 * sig(i - 3) - sig(i - 4)
      }
      val resid = (order until bs).map(i => sig(i) - pred(i))
      val flac = stream(bs, 8000, 1, 16, 0, bs) { w =>
        w.b(0).u(0x08L | order, 6).b(0)
        (0 until order).foreach(i => w.s(sig(i), 16))
        w.u(0, 2).u(0, 4) // method 0, partition order 0
        w.u(6, 4)         // rice param 6
        riceWrite(w, resid, 6)
      }
      val pcm = Flac.decodeOrNull(flac)
      assert(pcm != null, s"order $order")
      assert(pcm.data(0).toSeq === sig.toSeq, s"order $order")
    }
  }

  test("hand-built: LPC subframe with known coefficients, 64-bit accumulate, shift") {
    val bs = 256
    val order = 3
    val coefs = Array(421, -190, 73) // precision 12, shift 9
    val shift = 9
    val prec = 12
    val sig = new Array[Int](bs)
    sig(0) = 100; sig(1) = -50; sig(2) = 75
    val resid = new Array[Int](bs - order)
    val rnd = new scala.util.Random(7)
    (order until bs).foreach { i =>
      var sum = 0L
      (0 until order).foreach(j => sum += coefs(j).toLong * sig(i - j - 1))
      val r = rnd.nextInt(2001) - 1000
      sig(i) = r + (sum >> shift).toInt
      resid(i - order) = r
    }
    val flac = stream(bs, 8000, 1, 16, 0, bs) { w =>
      w.b(0).u(0x20L | (order - 1), 6).b(0)
      (0 until order).foreach(i => w.s(sig(i), 16))
      w.u(prec - 1L, 4).s(shift, 5)
      coefs.foreach(c => w.s(c, prec))
      w.u(0, 2).u(0, 4).u(8, 4)
      riceWrite(w, resid.toSeq, 8)
    }
    val pcm = Flac.decodeOrNull(flac)
    assert(pcm != null)
    assert(pcm.data(0).toSeq === sig.toSeq)
  }

  test("hand-built: Rice method 1 (5-bit), partitions > 0, and the raw-bits escape") {
    val bs = 512 // 4 partitions of 128
    val sig = Array.tabulate(bs)(i => (i % 97) - 48)
    val resid = (1 until bs).map(i => sig(i) - sig(i - 1))
    val flac = stream(bs, 8000, 1, 16, 0, bs) { w =>
      w.b(0).u(0x08L | 1, 6).b(0) // fixed order 1
      w.s(sig(0), 16)
      w.u(1, 2)  // method 1: 5-bit params
      w.u(2, 4)  // partition order 2 -> 4 partitions of 128
      // partition 0: 127 residuals (order consumed), rice p=4
      w.u(4, 5); riceWrite(w, resid.slice(0, 127), 4)
      // partition 1: escape with 9 raw bits
      w.u(31, 5).u(9, 5)
      resid.slice(127, 255).foreach(v => w.s(v, 9))
      // partition 2: rice p=0
      w.u(0, 5); riceWrite(w, resid.slice(255, 383), 0)
      // partition 3: escape with 0 raw bits would force all-zero —
      // use rice p=7 instead
      w.u(7, 5); riceWrite(w, resid.slice(383, 511), 7)
    }
    val pcm = Flac.decodeOrNull(flac)
    assert(pcm != null)
    assert(pcm.data(0).toSeq === sig.toSeq)
  }

  test("hand-built: left/side, side/right, mid/side decorrelation, side has bps+1") {
    val bs = 256
    val left = Array.tabulate(bs)(i => (3000 * math.sin(i / 5.0)).toInt)
    val right = Array.tabulate(bs)(i => (2500 * math.cos(i / 9.0)).toInt)
    def verbatim(w: W, v: Array[Int], bits: Int): Unit = {
      w.b(0).u(1, 6).b(0)
      v.foreach(x => w.s(x, bits))
    }
    // left/side (assign 8): ch1 = side = left - right, 17 bits
    val ls = stream(bs, 8000, 2, 16, 8, bs) { w =>
      verbatim(w, left, 16)
      verbatim(w, Array.tabulate(bs)(i => left(i) - right(i)), 17)
    }
    val p1 = Flac.decodeOrNull(ls)
    assert(p1 != null)
    assert(p1.data(0).toSeq === left.toSeq && p1.data(1).toSeq === right.toSeq)
    // side/right (assign 9): ch0 = side, 17 bits
    val sr = stream(bs, 8000, 2, 16, 9, bs) { w =>
      verbatim(w, Array.tabulate(bs)(i => left(i) - right(i)), 17)
      verbatim(w, right, 16)
    }
    val p2 = Flac.decodeOrNull(sr)
    assert(p2 != null)
    assert(p2.data(0).toSeq === left.toSeq && p2.data(1).toSeq === right.toSeq)
    // mid/side (assign 10): mid = (l+r)>>1 floor, side = l-r, side 17 bits
    val ms = stream(bs, 8000, 2, 16, 10, bs) { w =>
      verbatim(w, Array.tabulate(bs)(i => (left(i) + right(i)) >> 1), 16)
      verbatim(w, Array.tabulate(bs)(i => left(i) - right(i)), 17)
    }
    val p3 = Flac.decodeOrNull(ms)
    assert(p3 != null)
    assert(p3.data(0).toSeq === left.toSeq && p3.data(1).toSeq === right.toSeq)
  }

  test("hand-built: wasted bits shift samples back up; 8- and 24-bit streams decode") {
    val bs = 256
    // 16-bit constant with 3 wasted bits: stored value is v >> 3
    val flacW = stream(bs, 8000, 1, 16, 0, bs) { w =>
      w.b(0).u(0, 6)
      w.b(1).b(0).b(0).b(1) // wasted flag, unary 2 zeros + stop -> wasted = 3
      w.s(-1000 >> 3, 13)   // effective bps 13
    }
    val pw = Flac.decodeOrNull(flacW)
    assert(pw != null)
    assert(pw.data(0).forall(_ == (-1000 >> 3) << 3))
    // 8-bit verbatim
    val f8 = stream(bs, 8000, 1, 8, 0, bs) { w =>
      w.b(0).u(1, 6).b(0)
      (0 until bs).foreach(i => w.s((i % 200) - 100, 8))
    }
    val p8 = Flac.decodeOrNull(f8)
    assert(p8 != null && p8.bps === 8)
    (0 until bs).foreach(i => assert(p8.data(0)(i) === (i % 200) - 100))
    // 24-bit verbatim with full-scale values
    val f24 = stream(bs, 8000, 1, 24, 0, bs) { w =>
      w.b(0).u(1, 6).b(0)
      (0 until bs).foreach(i => w.s(i * 30000 - 4000000, 24))
    }
    val p24 = Flac.decodeOrNull(f24)
    assert(p24 != null && p24.bps === 24)
    (0 until bs).foreach(i => assert(p24.data(0)(i) === i * 30000 - 4000000))
  }

  test("CRC rejection: corrupt header CRC-8 and frame CRC-16 both null") {
    val bs = 256
    val good = stream(bs, 8000, 1, 16, 0, bs) { w =>
      w.b(0).u(0, 6).b(0).s(77, 16)
    }
    assert(Flac.decodeOrNull(good) != null)
    // header CRC byte sits right after the fixed 5-byte header + 1
    // coded-number byte (frame 0, no explicit blocksize for 256)
    val hdrCrcOff = 42 + 5 + 1
    val badH = good.clone(); badH(hdrCrcOff) = (badH(hdrCrcOff) ^ 0x5A).toByte
    assert(Flac.decodeOrNull(badH) == null)
    val badF = good.clone(); badF(badF.length - 1) = (badF(badF.length - 1) ^ 1).toByte
    assert(Flac.decodeOrNull(badF) == null)
    // flipped sample data breaks CRC-16 too
    val badD = good.clone(); badD(hdrCrcOff + 2) = (badD(hdrCrcOff + 2) ^ 0x10).toByte
    assert(Flac.decodeOrNull(badD) == null)
  }

  test("encoder round-trip: AudioFixtures fixed+Rice / verbatim, mono + stereo, multi-frame") {
    val rnd = new scala.util.Random(11)
    // tonal (compresses via fixed-2) and white-noise (verbatim fallback)
    val tonal = Array.tabulate(10000)(i => (12000 * math.sin(i / 13.0)).toInt)
    val noise = Array.tabulate(3000)(_ => rnd.nextInt(60001) - 30000)
    for (sig <- Seq(tonal, noise)) {
      val pcm = Flac.decodeOrNull(AudioFixtures.flac(Array(sig), 8000))
      assert(pcm != null && pcm.channels === 1)
      assert(pcm.data(0).toSeq === sig.toSeq)
    }
    val st = AudioFixtures.flac(Array(tonal.take(5000), tonal.take(5000).map(-_)), 16000)
    val pcm2 = Flac.decodeOrNull(st)
    assert(pcm2 != null && pcm2.channels === 2 && pcm2.sampleRate === 16000)
    assert(pcm2.data(0).toSeq === tonal.take(5000).toSeq)
    assert(pcm2.data(1).toSeq === tonal.take(5000).map(-_).toSeq)
  }

  test("fuzz: truncation and random corruption never throw") {
    val base = AudioFixtures.toneClip(3)
    for (cut <- Seq(0, 3, 8, 41, base.length / 3, base.length - 2))
      Flac.decodeOrNull(base.take(cut)) // no throw
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 400) {
      val m = base.clone()
      for (_ <- 0 to rnd.nextInt(8)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Flac.decodeOrNull(m) // any result, no throw
    }
    assert(Flac.decodeOrNull(null) == null)
    assert(Flac.decodeOrNull("not flac at all".getBytes) == null)
  }

  test("fingerprint: WAV and FLAC containers of the SAME PCM agree bit-exactly") {
    val sig = Array.tabulate(8192)(i =>
      (9000 * math.sin(i / 11.0) + 4000 * math.sin(i / 3.0)).toInt)
    val flacBytes = AudioFixtures.flac(Array(sig), 8000)
    // minimal RIFF/WAVE PCM16 around the same samples
    val data = new Array[Byte](sig.length * 2)
    sig.indices.foreach { i =>
      data(2 * i) = (sig(i) & 0xFF).toByte
      data(2 * i + 1) = ((sig(i) >> 8) & 0xFF).toByte
    }
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    val wav = "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++ "data".getBytes ++ le32(data.length) ++ data
    val fF = Audio.fingerprint64OrNull(flacBytes)
    val fW = Audio.fingerprint64OrNull(wav)
    assert(fF != null && fW != null)
    assert(fF === fW, "same PCM must fingerprint identically across containers")
  }

  test("fingerprint: perturbed clip lands within 3 bits; distinct seeds far apart; short/junk null") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val fps = (0 until 24).map(i =>
      Audio.fingerprint64OrNull(AudioFixtures.toneClip(i, nSamples = 8192)).longValue())
    for (i <- 0 until 24) {
      val p = Audio.fingerprint64OrNull(
        AudioFixtures.toneClip(i, nSamples = 8192, perturb = true)).longValue()
      assert(ham(fps(i), p) <= 3, s"seed $i perturbation moved ${ham(fps(i), p)} bits")
    }
    val near = for (i <- 0 until 24; j <- i + 1 until 24
                    if ham(fps(i), fps(j)) <= 3) yield (i, j)
    assert(near.isEmpty, s"distinct seeds collided: $near")
    assert(Audio.fingerprint64OrNull(AudioFixtures.toneClip(1, nSamples = 1000)) == null)
    assert(Audio.fingerprint64OrNull("garbage".getBytes) == null)
  }

  test("FLAC features: same contract as WAV on the same PCM; withFeatures routes FLAC to real features") {
    import spark.implicits._
    val sig = Array.tabulate(6000)(i => (8000 * math.sin(i / 9.0)).toInt)
    val flacBytes = AudioFixtures.flac(Array(sig), 8000)
    val f = Flac.pcmFeaturesOrNull(flacBytes)
    assert(f != null && f.length === 8)
    assert(f(0) === 1.0 && f(1) === 8000.0 && f(2) === 16.0 && f(3) === 6000.0)
    // rms/mean/peak/zcr must equal the WAV decoder's on identical PCM
    val data = new Array[Byte](sig.length * 2)
    sig.indices.foreach { i =>
      data(2 * i) = (sig(i) & 0xFF).toByte
      data(2 * i + 1) = ((sig(i) >> 8) & 0xFF).toByte
    }
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    val wav = "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++ "data".getBytes ++
      le32(data.length) ++ data
    val w = graft.ext.Wav.pcmFeaturesOrNull(wav)
    (4 until 8).foreach(i => assert(math.abs(f(i) - w(i)) < 1e-12, s"feature $i"))
    // routing: withFeatures gives FLAC rows the 8-dim audio vector
    val assets = spark.createDataFrame(Seq(
      (1L, flacBytes), (2L, "junk".getBytes))).toDF("asset_id", "content")
    val rows = graft.ext.Multimodal.withFeatures(assets)
      .orderBy($"asset_id").collect()
    assert(rows(0).getSeq[Double](2).length === 8, "FLAC must route to real audio features")
    assert(rows(0).getSeq[Double](2)(1) === 8000.0)
    assert(rows(1).getSeq[Double](2).length === 16, "junk stays on the stub")
    GraftExtensions.install(spark)
    assets.createOrReplaceTempView("flacassets")
    assert(spark.sql(
      "SELECT flac_pcm_features(content) f FROM flacassets WHERE flac_pcm_features(content) IS NOT NULL")
      .count() === 1L)
  }

  test("IEEE-float WAV (format 3): decodes, features track the int16 twin, fingerprint matches") {
    val n = 4096
    val samples = Array.tabulate(n)(i => 0.6 * math.sin(i / 7.0) + 0.2 * math.sin(i / 2.0))
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def wavOf(fmt: Int, bits: Int, data: Array[Byte]) =
      "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(fmt) ++ le16(1) ++ le32(8000) ++
        le32(8000 * bits / 8) ++ le16(bits / 8) ++ le16(bits) ++
        "data".getBytes ++ le32(data.length) ++ data
    val fData = new Array[Byte](n * 4)
    samples.indices.foreach { i =>
      val b = java.lang.Float.floatToIntBits(samples(i).toFloat)
      fData(4 * i) = (b & 0xFF).toByte; fData(4 * i + 1) = ((b >> 8) & 0xFF).toByte
      fData(4 * i + 2) = ((b >> 16) & 0xFF).toByte; fData(4 * i + 3) = ((b >> 24) & 0xFF).toByte
    }
    val iData = new Array[Byte](n * 2)
    samples.indices.foreach { i =>
      val v = math.round(samples(i) * 32768).toInt
      iData(2 * i) = (v & 0xFF).toByte; iData(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fw = graft.ext.Wav.pcmFeaturesOrNull(wavOf(3, 32, fData))
    val iw = graft.ext.Wav.pcmFeaturesOrNull(wavOf(1, 16, iData))
    assert(fw != null && iw != null)
    assert(fw(2) === 32.0 && fw(3) === n.toDouble)
    (4 until 8).foreach(i =>
      assert(math.abs(fw(i) - iw(i)) < 1e-3, s"feature $i: ${fw(i)} vs ${iw(i)}"))
    // same content through both containers lands on the same (or
    // near-identical) perceptual fingerprint
    val ff = Audio.fingerprint64OrNull(wavOf(3, 32, fData))
    val fi = Audio.fingerprint64OrNull(wavOf(1, 16, iData))
    assert(ff != null && fi != null)
    assert(java.lang.Long.bitCount(ff.longValue() ^ fi.longValue()) <= 2)
    // float64 stays out of scope, loudly null
    assert(graft.ext.Wav.pcmFeaturesOrNull(wavOf(3, 64, fData)) == null)
  }

  test("hostile WAV chunk sizes (near Int.MaxValue) return null, never throw") {
    def le32(v: Long) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    // a JUNK chunk whose size would wrap the walk offset negative in
    // Int arithmetic, followed by nothing useful
    val hostile = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le32(0x7FFFFFF0L) ++ new Array[Byte](64)
    assert(graft.ext.Wav.pcmFeaturesOrNull(hostile) == null)
    assert(graft.ext.Wav.monoOrNull(hostile) == null)
    // unsigned size with bit 31 set: skipped chunk, not a crash
    val hostile2 = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le32(0xFFFFFFF0L) ++ new Array[Byte](64)
    assert(graft.ext.Wav.pcmFeaturesOrNull(hostile2) == null)
    // multi-channel FLAC with unknown total hits the TOTAL-cells cap
    // loudly (null), not an 8x allocation
    assert(Audio.fingerprint64OrNull(hostile) == null)
  }

  test("nearDupAudioPairs: planted dup surfaces through the shared band-join stage; SQL surface") {
    import spark.implicits._
    val rows = (0 until 20).map(i => (i.toLong, AudioFixtures.toneClip(i, 8192))) ++
      Seq((1000L, AudioFixtures.toneClip(2, 8192, perturb = true)),
        (1001L, "junk payload".getBytes))
    val assets = spark.createDataFrame(rows).toDF("aud_id", "content")
    val pairs = Audio.nearDupAudioPairs(assets, "aud_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((2L, 1000L)), s"planted pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 1001L || p._2 == 1001L))
    GraftExtensions.install(spark)
    assets.createOrReplaceTempView("aud")
    val n = spark.sql(
      "SELECT audio_fingerprint64(content) f FROM aud WHERE audio_fingerprint64(content) IS NOT NULL")
      .count()
    assert(n === 21L)
  }
}
