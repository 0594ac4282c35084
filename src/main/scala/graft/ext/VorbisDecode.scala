package graft.ext

import graft.ext.VorbisSetup._

/** Vorbis I audio packet decode — the signal path the round-9 setup
  * parse (q139/q140) was groundwork for: Huffman decode over the
  * stream's OWN canonical codebooks, floor-1 post decode (§7.2.3
  * step 1), residue decode in all three interleave shapes (§8.6.2–4),
  * inverse channel coupling (§4.3.4's square-polar mapping), floor
  * curve synthesis ([[VorbisFloor]]) through the §7.2.4 inverse-dB
  * amplitude table, IMDCT (direct O(n²) normative form plus an
  * FFT-based O(n log n) production path, asserted equal in spec
  * tests), the §4.3.1 sin²(π/2·sin²) lapped window, and center-to-
  * center overlap-add — yielding PCM that feeds the shared
  * [[Audio]] energy-band fingerprint exactly like WAV and FLAC.
  *
  * Decoding is bounded and total ([[MediaMeta]] contract): every
  * bitstream read is range-checked, violations null the document,
  * and the deprecated floor type 0 (LSP — absent from real encoders
  * since Xiph's own beta) nulls LOUDLY as a documented scope line
  * rather than decoding approximately.
  *
  * Scale shape: one Ogg container decodes entirely inside one row's
  * kernel call — no cross-row state, no shuffle — so throughput
  * scales with executor count like every decoder in the media family
  * (cites reference behavior: the reference pipeline treats media
  * blobs as per-row opaque values; trackplot_hycom.py has no media
  * path, so this layer is brief-driven, not reference-driven).
  */
object VorbisDecode {

  /** Decoded-output budget across all channels — the same
    * bounded-and-total cap [[Flac]] enforces, applied both to the
    * id-header's declared shape and to the running produced total.
    */
  private val MaxTotalSamples = 1L << 26

  /** Decoded PCM: `samples(c)(i)` in [-1, 1] nominal range. */
  final case class Pcm(sampleRate: Int, channels: Int,
                       samples: Array[Array[Double]]) {
    def nSamples: Int = if (samples.isEmpty) 0 else samples(0).length
    def mono: Array[Double] = {
      val n = nSamples
      val out = new Array[Double](n)
      var c = 0
      while (c < channels) {
        val s = samples(c)
        var i = 0
        while (i < n) { out(i) += s(i); i += 1 }
        c += 1
      }
      var i = 0
      while (i < n) { out(i) /= channels; i += 1 }
      out
    }
  }

  /** Integer-stage accounting for the q141 oracle: every field is
    * exact integer arithmetic (floor posts, residue lattice values
    * with integral min/delta/multiplicands, the §7.2.4 integer curve)
    * so a SQL oracle can predict them from fixture knobs without
    * replaying any float signal math.
    */
  final class Stats {
    var audioPackets: Int = 0
    var postSum: Long = 0L       // Σ decoded floor-1 post values
    var residueSum: Long = 0L    // Σ rint(residue) post-decode, pre-coupling
    var curveSum: Long = 0L      // Σ synthesized integer curve values
    var pcmSamples: Long = 0L    // per-channel samples after granule trim
  }

  /** §7.2.4's normative 256-entry floor amplitude table
    * (`floor1_inverse_dB_table`): 0.546875 dB per step — 140 dB over
    * 256 steps — generated with the reference encoder's truncated
    * dB constant 0.11512925 (≈ ln 10 / 20) and rounded through
    * float32, which reproduces the spec's printed values exactly
    * (first, second, and last entries asserted in VorbisDecodeSpec).
    */
  private[graft] val InverseDb: Array[Double] =
    Array.tabulate(256)(i =>
      math.exp((i - 255) * 0.546875 * 0.11512925).toFloat.toDouble)

  private val Floor1Ranges = Array(256, 128, 86, 64)

  // ---------------------------------------------------------------
  // Huffman decode over canonical codewords (§3.2.1): codewords are
  // read MSb-first — the one MSb-first structure in Vorbis's
  // otherwise LSb-first bitpack — one bit at a time down an explicit
  // binary tree. Unboxed int-array nodes; built once per book per
  // container (books are stream-local, ≤4096 entries by the triage
  // guard in VorbisSetup).
  // ---------------------------------------------------------------
  private[graft] final class HuffTree(book: Codebook) {
    private var left = new Array[Int](128)
    private var right = new Array[Int](128)
    private var entry = new Array[Int](128)
    private var n = 1
    left(0) = -1; right(0) = -1; entry(0) = -1

    {
      var e = 0
      while (e < book.entries) {
        val len = book.lengths(e)
        if (len > 0) insert(book.codewords(e), len, e)
        e += 1
      }
    }

    private def newNode(): Int = {
      if (n == left.length) {
        left = java.util.Arrays.copyOf(left, n * 2)
        right = java.util.Arrays.copyOf(right, n * 2)
        entry = java.util.Arrays.copyOf(entry, n * 2)
      }
      left(n) = -1; right(n) = -1; entry(n) = -1
      n += 1
      n - 1
    }

    private def insert(code: Long, len: Int, e: Int): Unit = {
      var node = 0
      var bit = len - 1
      while (bit >= 0) {
        val b = ((code >>> bit) & 1L).toInt
        var next = if (b == 0) left(node) else right(node)
        if (next == -1) {
          next = newNode()
          if (b == 0) left(node) = next else right(node) = next
        }
        node = next
        bit -= 1
      }
      entry(node) = e
    }

    /** Walk one codeword off the reader; violations throw (the
      * packet-level catch nulls the document).
      */
    def decode(r: BitsLsb): Int = {
      var node = 0
      while (entry(node) < 0) {
        val next = if (r.read(1) == 0) left(node) else right(node)
        require(next != -1, "vorbis: invalid huffman codeword")
        node = next
      }
      entry(node)
    }
  }

  /** §3.3 VQ vector lookup for types 1 (multiplicative lattice) and
    * 2 (flat table).
    */
  private[graft] def vqVector(b: Codebook, entry: Int): Array[Double] = {
    val out = new Array[Double](b.dimensions)
    vqVectorInto(b, entry, out)
    out
  }

  /** Allocation-free form for the residue hot loop (one scratch per
    * partition, not one array per codeword — the decode path runs
    * ~10⁴ codewords per stream).
    */
  private def vqVectorInto(b: Codebook, entry: Int,
                           out: Array[Double]): Unit = {
    var last = 0.0
    if (b.lookupType == 1) {
      var idxDiv = 1
      var i = 0
      while (i < b.dimensions) {
        val off = (entry / idxDiv) % b.lookupValues
        out(i) = b.multiplicands(off) * b.deltaValue + b.minimumValue + last
        if (b.sequenceP) last = out(i)
        idxDiv *= b.lookupValues
        i += 1
      }
    } else {
      require(b.lookupType == 2, "vorbis: scalar book used in VQ context")
      val base = entry * b.dimensions
      var i = 0
      while (i < b.dimensions) {
        out(i) = b.multiplicands(base + i) * b.deltaValue + b.minimumValue + last
        if (b.sequenceP) last = out(i)
        i += 1
      }
    }
  }

  // ---------------------------------------------------------------
  // Floor 1 packet decode (§7.2.3 step 1): the post (Y) values.
  // Returns null when the channel's nonzero bit is clear (silence).
  // ---------------------------------------------------------------
  private[graft] def floor1PostsOrNull(r: BitsLsb, cfg: Floor1Cfg,
                                trees: Array[HuffTree]): Array[Int] = {
    if (r.read(1) == 0) return null
    val range = Floor1Ranges(cfg.multiplier - 1)
    val bits = ilog(range - 1)
    val y = new Array[Int](cfg.xList.length)
    y(0) = r.read(bits)
    y(1) = r.read(bits)
    var offset = 2
    var p = 0
    while (p < cfg.partitions) {
      val cls = cfg.classList(p)
      val cdim = cfg.classDimensions(cls)
      val cbits = cfg.classSubclasses(cls)
      val csub = (1 << cbits) - 1
      var cval = 0
      if (cbits > 0) cval = trees(cfg.classMasterbooks(cls)).decode(r)
      var j = 0
      while (j < cdim) {
        val book = cfg.subclassBooks(cls)(cval & csub)
        cval >>>= cbits
        y(offset + j) = if (book >= 0) trees(book).decode(r) else 0
        j += 1
      }
      offset += cdim
      p += 1
    }
    y
  }

  // ---------------------------------------------------------------
  // Residue decode (§8.6.2 pseudocode, transcribed exactly —
  // including the classword big-endian radix split and the
  // interleaved per-vector stream order). `format0` selects the
  // §8.6.3 strided scatter; otherwise the §8.6.4 consecutive form.
  // ---------------------------------------------------------------
  private[graft] def residue01(r: BitsLsb, cfg: ResidueCfg, format0: Boolean,
                        books: Array[Codebook], trees: Array[HuffTree],
                        vs: Array[Array[Double]],
                        doDec: Array[Boolean]): Unit = {
    val actualSize = vs(0).length
    val limitBegin = math.min(cfg.begin, actualSize.toLong).toInt
    val limitEnd = math.min(cfg.end, actualSize.toLong).toInt
    val psize = cfg.partitionSize
    val cpc = books(cfg.classbook).dimensions // classwords per codeword
    val nToRead = limitEnd - limitBegin
    if (nToRead <= 0) return
    val partitionsToRead = nToRead / psize
    val nv = vs.length
    val cls = Array.ofDim[Int](nv, partitionsToRead + cpc)
    var pass = 0
    while (pass < 8) {
      var pc = 0
      while (pc < partitionsToRead) {
        if (pass == 0) {
          var j = 0
          while (j < nv) {
            if (doDec(j)) {
              var temp = trees(cfg.classbook).decode(r)
              var i = cpc - 1
              while (i >= 0) {
                cls(j)(i + pc) = temp % cfg.classifications
                temp /= cfg.classifications
                i -= 1
              }
            }
            j += 1
          }
        }
        var i = 0
        while (i < cpc && pc < partitionsToRead) {
          var j = 0
          while (j < nv) {
            if (doDec(j)) {
              val vq = cfg.books(cls(j)(pc))(pass)
              if (vq >= 0)
                decodePartition(r, books(vq), trees(vq), vs(j),
                  limitBegin + pc * psize, psize, format0)
            }
            j += 1
          }
          pc += 1
          i += 1
        }
      }
      pass += 1
    }
  }

  private[graft] def decodePartition(r: BitsLsb, book: Codebook, tree: HuffTree,
                              v: Array[Double], offset: Int, psize: Int,
                              format0: Boolean): Unit = {
    val vec = new Array[Double](book.dimensions) // one scratch per partition
    if (format0) {
      val step = psize / book.dimensions
      var i = 0
      while (i < step) {
        vqVectorInto(book, tree.decode(r), vec)
        var d = 0
        while (d < book.dimensions) {
          v(offset + i + d * step) += vec(d)
          d += 1
        }
        i += 1
      }
    } else {
      var i = 0
      while (i < psize) {
        vqVectorInto(book, tree.decode(r), vec)
        var d = 0
        while (d < book.dimensions && i < psize) {
          v(offset + i) += vec(d)
          d += 1
          i += 1
        }
      }
    }
  }

  /** §8.6.4 residue type 2: all submap channels interleave into one
    * vector, decoded as format 1, skipped only when EVERY channel is
    * marked do-not-decode.
    */
  private[graft] def residue2(r: BitsLsb, cfg: ResidueCfg,
                       books: Array[Codebook], trees: Array[HuffTree],
                       chVecs: Array[Array[Double]],
                       doDec: Array[Boolean]): Unit = {
    if (!doDec.exists(identity)) return
    val ch = chVecs.length
    val n2 = chVecs(0).length
    val combined = new Array[Double](ch * n2)
    residue01(r, cfg, format0 = false, books, trees,
      Array(combined), Array(true))
    var k = 0
    while (k < n2) {
      var c = 0
      while (c < ch) {
        chVecs(c)(k) = combined(k * ch + c)
        c += 1
      }
      k += 1
    }
  }

  /** §4.3.4 inverse channel coupling — the square-polar
    * magnitude/angle mapping, applied in reverse step order.
    */
  private[graft] def inverseCoupling(m: Array[Double], a: Array[Double]): Unit = {
    var i = 0
    while (i < m.length) {
      val mv = m(i)
      val av = a(i)
      if (mv > 0) {
        if (av > 0) { m(i) = mv; a(i) = mv - av }
        else { a(i) = mv; m(i) = mv + av }
      } else {
        if (av > 0) { m(i) = mv; a(i) = mv + av }
        else { a(i) = mv; m(i) = mv - av }
      }
      i += 1
    }
  }

  // ---------------------------------------------------------------
  // IMDCT: y[j] = Σ_{k<n/2} X[k] cos(π/(2n)·(2j+1+n/2)·(2k+1)),
  // j ∈ [0, n). `imdctDirect` is the normative O(n²) transcription;
  // `imdct` reaches the same values (≤1e-9 asserted in spec) through
  // one size-n complex FFT: with u[k] = X[k]·e^{iπk/n}·i^k zero-padded
  // to n and S[j] = Σ u[k]·e^{+2πikj/n},
  // y[j] = Re(e^{iπ(j+0.5+n/4)/n}·S[j]).
  // ---------------------------------------------------------------
  private[graft] def imdctDirect(spec: Array[Double], n: Int): Array[Double] = {
    val out = new Array[Double](n)
    var j = 0
    while (j < n) {
      var acc = 0.0
      var k = 0
      while (k < n / 2) {
        acc += spec(k) *
          math.cos(math.Pi / (2.0 * n) * (2 * j + 1 + n / 2.0) * (2 * k + 1))
        k += 1
      }
      out(j) = acc
      j += 1
    }
    out
  }

  /** Pre/post IMDCT twiddles per block size — block sizes are the 8
    * powers of two in [64, 8192], so the cache is bounded and shared
    * across rows/tasks (pure values, race-benign).
    */
  private val twiddles =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]()

  private def twiddlesFor(n: Int): Array[Array[Double]] =
    twiddles.computeIfAbsent(n, { _ =>
      val preC = new Array[Double](n / 2)
      val preS = new Array[Double](n / 2)
      var k = 0
      while (k < n / 2) {
        val ang = math.Pi * k / n + math.Pi * k / 2.0
        preC(k) = math.cos(ang)
        preS(k) = math.sin(ang)
        k += 1
      }
      val postC = new Array[Double](n)
      val postS = new Array[Double](n)
      var j = 0
      while (j < n) {
        val ang = math.Pi * (j + 0.5 + n / 4.0) / n
        postC(j) = math.cos(ang)
        postS(j) = math.sin(ang)
        j += 1
      }
      Array(preC, preS, postC, postS)
    })

  private[graft] def imdct(spec: Array[Double], n: Int): Array[Double] = {
    val tw = twiddlesFor(n)
    val preC = tw(0); val preS = tw(1); val postC = tw(2); val postS = tw(3)
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var k = 0
    while (k < n / 2) {
      re(k) = spec(k) * preC(k)
      im(k) = spec(k) * preS(k)
      k += 1
    }
    Fft.inverseUnscaled(re, im)
    val out = new Array[Double](n)
    var j = 0
    while (j < n) {
      out(j) = re(j) * postC(j) - im(j) * postS(j)
      j += 1
    }
    out
  }

  /** §4.3.1 window: sin(π/2·sin²) slopes of width `leftN`/`rightN`
    * centered at n/4 and 3n/4 (the spec's long-block-with-short-
    * neighbor narrowing falls out of the widths), 1 between the
    * slopes, 0 outside.
    */
  /** Window cache: (n, leftN, rightN) has at most 4 shapes per block
    * size (full/full, narrow/full, full/narrow, narrow/narrow) —
    * bounded, shared, race-benign.
    */
  private val windows =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Double]]()

  private[graft] def window(n: Int, leftN: Int, rightN: Int): Array[Double] =
    windows.computeIfAbsent(
      (n.toLong << 32) | (leftN.toLong << 16) | rightN.toLong,
      _ => windowUncached(n, leftN, rightN))

  private def windowUncached(n: Int, leftN: Int, rightN: Int): Array[Double] = {
    val w = new Array[Double](n)
    val ls = n / 4 - leftN / 2
    val le = n / 4 + leftN / 2
    val rs = 3 * n / 4 - rightN / 2
    val rE = 3 * n / 4 + rightN / 2
    var i = ls
    while (i < le) {
      val x = (i - ls + 0.5) / leftN * (math.Pi / 2.0)
      val s = math.sin(x)
      w(i) = math.sin(math.Pi / 2.0 * s * s)
      i += 1
    }
    i = le
    while (i < rs) { w(i) = 1.0; i += 1 }
    i = rs
    while (i < rE) {
      val x = (i - rs + 0.5) / rightN * (math.Pi / 2.0) + math.Pi / 2.0
      val s = math.sin(x)
      w(i) = math.sin(math.Pi / 2.0 * s * s)
      i += 1
    }
    w
  }

  // ---------------------------------------------------------------
  // One audio packet → per-channel windowed time blocks.
  // ---------------------------------------------------------------
  private final case class Block(windowed: Array[Array[Double]], n: Int)

  private def decodePacket(packet: Array[Byte], setup: FullSetup,
                           channels: Int, bs0: Int, bs1: Int,
                           trees: Array[HuffTree],
                           stats: Stats): Block = {
    val r = new BitsLsb(packet, 0)
    require(r.read(1) == 0, "vorbis: not an audio packet")
    val modeBits = ilog(setup.modes.length - 1)
    val modeNum = if (modeBits > 0) r.read(modeBits) else 0
    require(modeNum < setup.modes.length, "vorbis: mode out of range")
    val mode = setup.modes(modeNum)
    val long = mode.blockFlag
    val n = if (long) bs1 else bs0
    var prevFlag = true
    var nextFlag = true
    if (long) {
      prevFlag = r.read(1) == 1
      nextFlag = r.read(1) == 1
    }
    val mapping = setup.mappings(mode.mapping)

    // floor posts per channel (null = silent channel)
    val posts = new Array[Array[Int]](channels)
    val noResidue = new Array[Boolean](channels)
    var c = 0
    while (c < channels) {
      val submap = if (mapping.submaps > 1) mapping.mux(c) else 0
      setup.floors(mapping.submapFloor(submap)) match {
        case f1: Floor1Cfg =>
          posts(c) = floor1PostsOrNull(r, f1, trees)
        case _: Floor0Cfg =>
          // deprecated LSP floor — a documented scope line, loud
          require(false, "vorbis: floor type 0 unsupported")
      }
      noResidue(c) = posts(c) == null
      c += 1
    }
    // §4.3.3: a coupled pair decodes residue if either side does
    var s = 0
    while (s < mapping.couplingSteps) {
      if (!noResidue(mapping.magnitudes(s)) || !noResidue(mapping.angles(s))) {
        noResidue(mapping.magnitudes(s)) = false
        noResidue(mapping.angles(s)) = false
      }
      s += 1
    }

    // residue per submap
    val res = Array.fill(channels)(new Array[Double](n / 2))
    s = 0
    while (s < mapping.submaps) {
      val chs = (0 until channels).filter(c =>
        mapping.submaps == 1 || mapping.mux(c) == s).toArray
      val cfg = setup.residues(mapping.submapResidue(s))
      val vecs = chs.map(res(_))
      val doDec = chs.map(c => !noResidue(c))
      if (cfg.residueType == 2)
        residue2(r, cfg, setup.codebooks, trees, vecs, doDec)
      else
        residue01(r, cfg, format0 = cfg.residueType == 0,
          setup.codebooks, trees, vecs, doDec)
      s += 1
    }
    if (stats != null) {
      var c = 0
      while (c < channels) {
        val v = res(c)
        var i = 0
        while (i < v.length) {
          stats.residueSum += math.rint(v(i)).toLong
          i += 1
        }
        c += 1
      }
    }

    // inverse coupling, in reverse step order
    s = mapping.couplingSteps - 1
    while (s >= 0) {
      inverseCoupling(res(mapping.magnitudes(s)), res(mapping.angles(s)))
      s -= 1
    }

    // floor curve synthesis → dot product → IMDCT → window
    val leftN = if (long && !prevFlag) bs0 / 2 else n / 2
    val rightN = if (long && !nextFlag) bs0 / 2 else n / 2
    val w = window(n, leftN, rightN)
    val out = new Array[Array[Double]](channels)
    c = 0
    while (c < channels) {
      val spec = new Array[Double](n / 2)
      if (posts(c) != null) {
        val submap = if (mapping.submaps > 1) mapping.mux(c) else 0
        val f1 = setup.floors(mapping.submapFloor(submap)).asInstanceOf[Floor1Cfg]
        val range = Floor1Ranges(f1.multiplier - 1)
        val (finalY, step2) = VorbisFloor.computeFinalY(f1.xList, posts(c), range)
        val curve = VorbisFloor.synthesizeCurve(f1.xList, finalY, step2,
          f1.multiplier, range, n / 2)
        if (stats != null) {
          stats.postSum += posts(c).map(_.toLong).sum
          stats.curveSum += curve.map(_.toLong).sum
        }
        var i = 0
        while (i < n / 2) {
          spec(i) = res(c)(i) * InverseDb(curve(i))
          i += 1
        }
      }
      val time = imdct(spec, n)
      var i = 0
      while (i < n) { time(i) *= w(i); i += 1 }
      out(c) = time
      c += 1
    }
    Block(out, n)
  }

  // ---------------------------------------------------------------
  // Container-level decode: id header → setup → packet loop with
  // center-to-center overlap-add (§4.3.9), trimmed to the stream's
  // final granule position.
  // ---------------------------------------------------------------
  def decodeOrNull(bytes: Array[Byte], stats: Stats = null): Pcm = {
    try {
      val pages = Ogg.pagesOrNull(bytes)
      if (pages == null) return null
      val packets = Ogg.packetsFrom(bytes, pages) // single page walk
      if (packets == null || packets.length < 4) return null
      decodePacketsOrNull(packets, pages.last.granule, stats)
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** Carriage-independent core: decode an assembled packet sequence
    * (id, comment, setup, audio...) — the entry the WebM `A_VORBIS`
    * route shares with the Ogg container walk (round 15).
    * `lastGranule` < 0 skips the final-granule trim (Matroska carries
    * no granule position).
    */
  def decodePacketsOrNull(packets: Array[Array[Byte]], lastGranule: Long,
                          stats: Stats = null): Pcm = {
    try {
      if (packets == null || packets.length < 4) return null
      val id = packets(0)
      if (id.length < 30 || id(0) != 1) return null
      var i = 0
      while (i < 6) {
        if (id(1 + i) != "vorbis".charAt(i).toByte) return null
        i += 1
      }
      def le32(o: Int): Long =
        (id(o) & 0xFFL) | ((id(o + 1) & 0xFFL) << 8) |
          ((id(o + 2) & 0xFFL) << 16) | ((id(o + 3) & 0xFFL) << 24)
      if (le32(7) != 0L) return null // vorbis_version
      val channels = id(11) & 0xFF
      val rate = le32(12)
      // rate is the unsigned 32-bit id-header field: reject values
      // past Int.MaxValue before the .toInt at the end narrows them
      // negative (crafted-container hardening, not a spec case)
      if (channels < 1 || rate < 1 || rate > 0x7FFFFFFFL) return null
      val bsByte = id(28) & 0xFF
      val bs0 = 1 << (bsByte & 0xF)
      val bs1 = 1 << (bsByte >> 4)
      if (bs0 < 64 || bs1 > 8192 || bs0 > bs1) return null
      if ((id(29) & 1) != 1) return null // framing

      val setup = fullSetupOrNull(packets(2), channels)
      if (setup == null) return null
      val trees = setup.codebooks.map(new HuffTree(_))

      // bounded-and-total contract (the Flac MaxTotalSamples rule):
      // a few KB of crafted container (255 channels × thousands of
      // tiny long-block packets) must not amplify into GBs of PCM —
      // reject an implausible declared length up front and bail
      // inside the packet loop once the produced total would pass
      // the same budget
      if (lastGranule > 0 && lastGranule * channels > MaxTotalSamples) return null
      val chans = Array.fill(channels)(
        new scala.collection.mutable.ArrayBuilder.ofDouble)
      var produced = 0L
      var pending: Array[Array[Double]] = null // prev right-of-center tails
      var np = 0
      var p = 3
      while (p < packets.length) {
        val blk = decodePacket(packets(p), setup, channels, bs0, bs1,
          trees, stats)
        if (stats != null) stats.audioPackets += 1
        val nc = blk.n
        if (pending == null) {
          pending = Array.tabulate(channels)(c =>
            java.util.Arrays.copyOfRange(blk.windowed(c), nc / 2, nc))
          np = nc
        } else {
          val outputLen = np / 4 + nc / 4
          if ((produced + outputLen) * channels > MaxTotalSamples) return null
          val shift = np / 4 - nc / 4
          var c = 0
          while (c < channels) {
            val pend = pending(c)
            val cur = blk.windowed(c)
            var k = 0
            while (k < outputLen) {
              var v = if (k < pend.length) pend(k) else 0.0
              val ci = k - shift
              if (ci >= 0 && ci < nc) v += cur(ci)
              chans(c) += v
              k += 1
            }
            pending(c) = java.util.Arrays.copyOfRange(cur, nc / 2, nc)
            c += 1
          }
          produced += outputLen
          np = nc
        }
        p += 1
      }
      var samples = chans.map(_.result())
      if (lastGranule >= 0 && lastGranule < produced) {
        samples = samples.map(s =>
          java.util.Arrays.copyOfRange(s, 0, lastGranule.toInt))
      }
      if (stats != null)
        stats.pcmSamples = if (samples.isEmpty) 0L else samples(0).length.toLong
      Pcm(rate.toInt, channels, samples)
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }
}
