package graft.ext

/** Deterministic Ogg Opus container synthesis — the q147 corpus
  * (the [[OggFixtures]] discipline: every structural knob a closed
  * form of `docId`, so a SQL oracle predicts [[Opus]]'s complete
  * TOC-walk output from `documents.doc_id` alone). Pages carry real
  * CRCs via [[OggFixtures.page]]; packets exercise all four RFC 6716
  * frame-packing codes, both frame-length encodings (1-byte < 252
  * and the 252–255 two-byte form), VBR and CBR code-3 packets, and
  * padding in all three shapes (length 0, single-byte, and the
  * 255-chained 254-per-byte form).
  *
  * Closed forms (mirrored verbatim by the q147 oracle):
  *   channels = 1 + d%2, preSkip = d%400, nAudio = 3 + d%4
  *   config(p) = (d + 5p) % 32, stereo = d%2, code(p) = (d+p) % 4
  *   code 0: f0 = 20 + (7d+13p) % 200
  *   code 1: fs = 15 + (5d+11p) % 120 (payload 2·fs)
  *   code 2: n1 = (3d+17p) % 300, n2 = 10 + (d+p) % 50
  *   code 3: maxM = min(3, 5760/dur), M = 1 + (d+p) % maxM,
  *           vbr ⟺ (d+3p)%2=1, pad present ⟺ p%2=0 with
  *           P = ((d+p)%3)·150 ∈ {0,150,300};
  *           VBR lens: 5 + (d+p+7k) % 60 for k<M−1, last 8 + (d+p)%40
  *           CBR len: 12 + (d+p) % 30 each
  */
object OpusFixtures {

  def channels(d: Long): Int = (1 + d % 2).toInt
  def preSkip(d: Long): Int = (d % 400).toInt
  def nAudio(d: Long): Int = (3 + d % 4).toInt
  def config(d: Long, p: Int): Int = ((d + 5L * p) % 32).toInt
  def stereoBit(d: Long): Int = (d % 2).toInt
  def code(d: Long, p: Int): Int = ((d + p) % 4).toInt

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xFF).toByte)

  private def opusHead(d: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("OpusHead".getBytes("US-ASCII"))
    out.write(1)
    out.write(channels(d))
    out.write(le16(preSkip(d)))
    out.write(le32(48000L))
    out.write(le16(0))
    out.write(0)
    out.toByteArray
  }

  private def opusTags(d: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("OpusTags".getBytes("US-ASCII"))
    val v = ("graft-opus-" + (d % 10)).getBytes("UTF-8")
    out.write(le32(v.length)); out.write(v)
    out.write(le32(0))
    out.toByteArray
  }

  /** Two-byte form when len ≥ 252: b1 = 252 + (len−252)%4,
    * b2 = (len−252)/4 (§3.2.1).
    */
  private def writeFrameLen(out: java.io.ByteArrayOutputStream, len: Int): Unit =
    if (len < 252) out.write(len)
    else {
      val r = len - 252
      out.write(252 + (r % 4)); out.write(r / 4)
    }

  /** §3.2.5 padding-length encoding: 255 carries 254 of padding and
    * continues; the final byte terminates.
    */
  private def writePadLen(out: java.io.ByteArrayOutputStream, pad: Int): Unit = {
    var rem = pad
    while (rem >= 255) { out.write(255); rem -= 254 }
    out.write(rem)
  }

  private def fill(out: java.io.ByteArrayOutputStream, n: Int, seed: Long): Unit = {
    var j = 0
    while (j < n) { out.write(((seed + j * 11) % 256).toInt); j += 1 }
  }

  /** One audio packet's bytes. */
  def audioPacket(d: Long, p: Int): Array[Byte] = {
    val cfg = config(d, p)
    val toc = (cfg << 3) | (stereoBit(d) << 2) | code(d, p)
    val out = new java.io.ByteArrayOutputStream()
    out.write(toc)
    code(d, p) match {
      case 0 =>
        fill(out, (20 + (7 * d + 13L * p) % 200).toInt, d + p)
      case 1 =>
        fill(out, 2 * (15 + (5 * d + 11L * p) % 120).toInt, d + p)
      case 2 =>
        val n1 = ((3 * d + 17L * p) % 300).toInt
        val n2 = (10 + (d + p) % 50).toInt
        writeFrameLen(out, n1)
        fill(out, n1, d + p); fill(out, n2, d + p + 1)
      case _ =>
        val dur = Opus.FrameSamples(cfg)
        val maxM = math.min(3, 5760 / dur)
        val m = (1 + (d + p) % maxM).toInt
        val vbr = (d + 3L * p) % 2 == 1
        val hasPad = p % 2 == 0
        val pad = if (hasPad) (((d + p) % 3) * 150).toInt else 0
        out.write((if (vbr) 0x80 else 0) | (if (hasPad) 0x40 else 0) | m)
        if (hasPad) writePadLen(out, pad)
        if (vbr) {
          val lens = (0 until m - 1).map(k => (5 + (d + p + 7L * k) % 60).toInt)
          lens.foreach(writeFrameLen(out, _))
          val last = (8 + (d + p) % 40).toInt
          lens.foreach(l => fill(out, l, d + p))
          fill(out, last, d + p + 2)
        } else {
          val fs = (12 + (d + p) % 30).toInt
          fill(out, m * fs, d + p)
        }
        fill(out, pad, 0) // padding data (must be ignored by parsers)
    }
    out.toByteArray
  }

  /** Per-packet sample count (the oracle's duration arithmetic). */
  def packetSamples(d: Long, p: Int): Long = {
    val cfg = config(d, p)
    val dur = Opus.FrameSamples(cfg)
    val frames = code(d, p) match {
      case 0 => 1
      case 1 | 2 => 2
      case _ =>
        val maxM = math.min(3, 5760 / dur)
        (1 + (d + p) % maxM).toInt
    }
    frames.toLong * dur
  }

  /** The complete Ogg Opus container for one doc. */
  def stream(d: Long): Array[Byte] = {
    val serial = 7000000L + d % 100000
    val out = new java.io.ByteArrayOutputStream(4096)
    var seq = 0L
    def emit(htype: Int, granule: Long, segs: Array[Int], payload: Array[Byte]): Unit = {
      out.write(OggFixtures.page(htype, granule, serial, seq, segs, payload))
      seq += 1
    }
    val id = opusHead(d)
    emit(0x02, 0L, OggFixtures.lacings(Seq(id.length)), id)
    val tags = opusTags(d)
    emit(0, 0L, OggFixtures.lacings(Seq(tags.length)), tags)
    val a = nAudio(d)
    var granule = preSkip(d).toLong
    for (p <- 0 until a) {
      val pkt = audioPacket(d, p)
      granule += packetSamples(d, p)
      val eos = if (p == a - 1) 0x04 else 0
      emit(eos, granule, OggFixtures.lacings(Seq(pkt.length)), pkt)
    }
    out.toByteArray
  }
}
