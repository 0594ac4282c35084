package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.io.{GridIngest, Zarr}

/** Zarr v2 store reader — fixtures hand-assembled from the public
  * spec (JSON `.zarray` + one file per chunk), never written by any
  * Zarr library, so every byte the reader consumes is spec-derived:
  * C/F order, little/big endian, raw/zlib chunks, missing-chunk =
  * fill semantics, `dimension_separator`, and the 4-D hydro-grid
  * ingest wired through [[GridIngest.ingestZarr]].
  */
class ZarrSpec extends SparkSpec {
  import spark.implicits._

  /** Write one array dir: .zarray JSON + all chunk files (values from
    * `f(globalIndices)`), honoring order/endianness/compressor.
    */
  private def writeArray(dir: String, shape: Seq[Int], chunks: Seq[Int],
                         dtype: String, order: String, compressor: String,
                         fill: Option[Double], f: Seq[Int] => Double,
                         skipChunks: Set[String] = Set.empty,
                         dimSep: String = "."): Unit = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    val compJson = compressor match {
      case "null" => "null"
      case "zlib" => """{"id": "zlib", "level": 1}"""
      case "blosc" => // numcodecs' default Blosc() JSON shape
        """{"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1, "blocksize": 0}"""
      case "zstd" => """{"id": "zstd", "level": 3}"""
      case other => s"""{"id": "$other"}"""
    }
    val fillJson = fill match {
      case None => "null"
      case Some(v) if v.isNaN => "NaN"
      case Some(v) => v.toString
    }
    val sepJson =
      if (dimSep == ".") "" else s""", "dimension_separator": "$dimSep""""
    Files.writeString(p.resolve(".zarray"),
      s"""{"zarr_format": 2, "shape": [${shape.mkString(", ")}],
         | "chunks": [${chunks.mkString(", ")}], "dtype": "$dtype",
         | "compressor": $compJson, "fill_value": $fillJson,
         | "order": "$order", "filters": null$sepJson}""".stripMargin)
    val size = dtype.substring(2).toInt
    val kind = dtype.charAt(1)
    val bo = if (dtype.charAt(0) == '>') ByteOrder.BIG_ENDIAN
             else ByteOrder.LITTLE_ENDIAN
    val rank = shape.size
    def axisOrigins(d: Int) = 0 until shape(d) by chunks(d)
    val origins = shape.indices.foldLeft(Seq(Seq.empty[Int])) { (acc, d) =>
      for (pre <- acc; o <- axisOrigins(d)) yield pre :+ o
    }
    origins.foreach { origin =>
      val key = origin.zipWithIndex.map { case (o, d) => o / chunks(d) }
        .mkString(dimSep)
      if (!skipChunks.contains(key)) {
        val nCells = chunks.product
        val buf = ByteBuffer.allocate(nCells * size).order(bo)
        // enumerate within-chunk indices in the chunk's STORAGE order
        val dimOrder = if (order == "C") (0 until rank) else (rank - 1 to 0 by -1)
        def walk(ds: List[Int], idx: Map[Int, Int]): Unit = ds match {
          case Nil =>
            val inChunk = (0 until rank).map(idx)
            val global = inChunk.zipWithIndex.map { case (i, d) => origin(d) + i }
            // out-of-bounds edge cells hold the fill (never read back)
            val v = if (global.zipWithIndex.forall { case (g, d) => g < shape(d) })
              f(global) else fill.getOrElse(0.0)
            (kind, size) match {
              case ('f', 4) => buf.putFloat(v.toFloat)
              case ('f', 8) => buf.putDouble(v)
              case ('i', 2) => buf.putShort(v.toShort)
              case ('i', 4) => buf.putInt(v.toInt)
              case ('u', 1) => buf.put(v.toInt.toByte)
              case other => fail(s"fixture writer: dtype $other not needed")
            }
          case d :: rest =>
            (0 until chunks(d)).foreach(i => walk(rest, idx + (d -> i)))
        }
        walk(dimOrder.toList, Map.empty)
        val raw = buf.array()
        val bytes = compressor match {
          case "zlib" =>
            val defl = new java.util.zip.Deflater(1)
            defl.setInput(raw); defl.finish()
            val out = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](4096)
            while (!defl.finished()) out.write(tmp, 0, defl.deflate(tmp))
            defl.end()
            out.toByteArray
          case "blosc" => bloscEncode(raw, size, shuffle = true)
          // numcodecs Zstd: one bare frame, written by zstd-jni (the
          // reference implementation — independent of io.Zstd)
          case "zstd" => com.github.luben.zstd.Zstd.compress(raw, 3)
          case _ => raw
        }
        val target = p.resolve(key)
        if (target.getParent != null) Files.createDirectories(target.getParent)
        Files.write(target, bytes)
      }
    }
  }

  // ---- test-side blosc(lz4) WRITER: an independent transcription of
  // the public c-blosc chunk container + LZ4 block format (shares no
  // code with io.Blosc), so encode∘decode = identity is evidence of
  // the spec, not a self-consistent pair.

  /** Greedy from-spec LZ4 block encoder: 4-byte hash-table matches,
    * 255-extension lengths, and the block-format end rules (final
    * sequence literal-only, last 5 bytes literals, no match starting
    * within the final 12 bytes).
    */
  private def lz4CompressBlock(src: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val end = off + len
    def read32(p: Int): Int =
      (src(p) & 0xFF) | ((src(p + 1) & 0xFF) << 8) |
        ((src(p + 2) & 0xFF) << 16) | ((src(p + 3) & 0xFF) << 24)
    def writeExt(v: Int): Unit = {
      var rem = v
      while (rem >= 255) { out.write(255); rem -= 255 }
      out.write(rem)
    }
    def emitSeq(litOff: Int, litLen: Int, offset: Int, matchLen: Int): Unit = {
      val litNib = math.min(15, litLen)
      val matchNib = if (offset > 0) math.min(15, matchLen - 4) else 0
      out.write((litNib << 4) | matchNib)
      if (litNib == 15) writeExt(litLen - 15)
      out.write(src, litOff, litLen)
      if (offset > 0) {
        out.write(offset & 0xFF); out.write((offset >>> 8) & 0xFF)
        if (matchNib == 15) writeExt(matchLen - 4 - 15)
      }
    }
    val table = new java.util.HashMap[Integer, Integer]()
    var anchor = off
    var i = off
    while (i + 12 <= end) {
      val key = Integer.valueOf((read32(i) * 0x9E3779B1) >>> 20)
      val cand = table.put(key, i)
      if (cand != null && i - cand <= 0xFFFF && cand >= off &&
          read32(cand) == read32(i)) {
        var ml = 4
        val maxEnd = end - 5
        while (i + ml < maxEnd && src(cand + ml) == src(i + ml)) ml += 1
        emitSeq(anchor, i - anchor, i - cand, ml)
        i += ml
        anchor = i
      } else i += 1
    }
    emitSeq(anchor, end - anchor, -1, 0)
    out.toByteArray
  }

  /** Forward byte shuffle of one block (byte j of every element made
    * contiguous; tail bytes past the last whole element verbatim).
    */
  private def bloscShuffleBlock(src: Array[Byte], off: Int, bsize: Int,
                                typesize: Int): Array[Byte] = {
    val dst = new Array[Byte](bsize)
    val elems = bsize / typesize
    for (i <- 0 until elems; j <- 0 until typesize)
      dst(j * elems + i) = src(off + i * typesize + j)
    for (t <- elems * typesize until bsize) dst(t) = src(off + t)
    dst
  }

  /** Assemble a full blosc-1 chunk: 16-byte header, int32 bstarts,
    * per-block streams each prefixed by its int32 size (verbatim when
    * compression does not gain), byte shuffle on. `inner` = "lz4"
    * (split-stream rule applies) or "zlib" (Deflater per block,
    * never split — blosc.c splits only blosclz/lz4).
    */
  private def bloscEncode(raw: Array[Byte], typesize: Int,
                          shuffle: Boolean,
                          inner: String = "lz4"): Array[Byte] = {
    val blocksize =
      if (raw.length <= 1024) raw.length else 1024 - 1024 % typesize
    val nblocks = (raw.length + blocksize - 1) / blocksize
    val doShuffle = shuffle && typesize > 1
    val streams = new java.io.ByteArrayOutputStream()
    val bstarts = new Array[Int](nblocks)
    val dataBase = 16 + 4 * nblocks
    for (j <- 0 until nblocks) {
      bstarts(j) = dataBase + streams.size()
      val boff = j * blocksize
      val bsize = math.min(blocksize, raw.length - boff)
      val block =
        if (doShuffle) bloscShuffleBlock(raw, boff, bsize, typesize)
        else java.util.Arrays.copyOfRange(raw, boff, boff + bsize)
      // blosc1 split rule (blosc.c): non-leftover LZ4 blocks split
      // into typesize streams when typesize<=16 and per-stream >=128;
      // other inner codecs never split
      val nsplits =
        if (inner == "lz4" && bsize == blocksize && typesize >= 1 &&
            typesize <= 16 && blocksize / typesize >= 128) typesize
        else 1
      val neblock = bsize / nsplits
      for (s <- 0 until nsplits) {
        val comp = inner match {
          case "zlib" =>
            val defl = new java.util.zip.Deflater(6)
            defl.setInput(block, s * neblock, neblock); defl.finish()
            val out = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](4096)
            while (!defl.finished()) out.write(tmp, 0, defl.deflate(tmp))
            defl.end()
            out.toByteArray
          case "zstd" =>
            com.github.luben.zstd.Zstd.compress(
              java.util.Arrays.copyOfRange(block, s * neblock, (s + 1) * neblock), 3)
          case _ => lz4CompressBlock(block, s * neblock, neblock)
        }
        val (sc, payload) =
          if (comp.length >= neblock)
            (neblock, java.util.Arrays.copyOfRange(block, s * neblock, (s + 1) * neblock))
          else (comp.length, comp)
        streams.write(sc & 0xFF); streams.write((sc >>> 8) & 0xFF)
        streams.write((sc >>> 16) & 0xFF); streams.write((sc >>> 24) & 0xFF)
        streams.write(payload)
      }
    }
    val body = streams.toByteArray
    val cbytes = dataBase + body.length
    val codecBits =
      (inner match { case "zlib" => 3; case "zstd" => 4; case _ => 1 }) << 5
    val hdr = ByteBuffer.allocate(cbytes).order(ByteOrder.LITTLE_ENDIAN)
    hdr.put(2.toByte).put(1.toByte) // version, versionlz
    hdr.put((codecBits | (if (doShuffle) 1 else 0)).toByte)
    hdr.put((typesize & 0xFF).toByte)
    hdr.putInt(raw.length).putInt(blocksize).putInt(cbytes)
    bstarts.foreach(hdr.putInt)
    hdr.put(body)
    hdr.array()
  }

  private def tmpStore(name: String): String = {
    val d = Files.createTempDirectory(s"zarr-$name").toString
    Files.writeString(Paths.get(d, ".zgroup"), """{"zarr_format": 2}""")
    d
  }

  /** 1-D coordinate array, <f8, raw. */
  private def writeCoord(store: String, name: String, vals: Seq[Double]): Unit =
    writeArray(s"$store/$name", Seq(vals.size), Seq(vals.size), "<f8", "C",
      "null", None, g => vals(g.head))

  test("4-D hydro store ingests to the canonical grid frame (zlib, C order)") {
    val store = tmpStore("hydro")
    val (nT, nD, nY, nX) = (2, 2, 5, 6)
    writeCoord(store, "time", Seq(100.0, 101.0))
    writeCoord(store, "depth", Seq(0.0, 10.0))
    writeCoord(store, "lat", (0 until nY).map(10.0 + _ * 0.5))
    writeCoord(store, "lon", (0 until nX).map(270.0 + _ * 0.5))
    def v(g: Seq[Int]): Double = g(0) * 1000 + g(1) * 100 + g(2) * 10 + g(3)
    writeArray(s"$store/water_temp", Seq(nT, nD, nY, nX), Seq(1, 1, 3, 4),
      "<f8", "C", "zlib", Some(-30000.0), v)
    writeArray(s"$store/salinity", Seq(nT, nD, nY, nX), Seq(1, 1, 3, 4),
      "<f4", "C", "zlib", Some(-30000.0), g => v(g) + 0.5)
    val df = GridIngest.ingestZarr(spark, store).cache()
    assert(df.count() === nT * nD * nY * nX)
    val row = df.filter($"time" === 101L && $"depth_idx" === 1 &&
      $"lat_idx" === 4 && $"lon_idx" === 5).head
    assert(row.getAs[Double]("water_temp") === 1145.0)
    assert(math.abs(row.getAs[Double]("salinity") - 1145.5) < 1e-6)
    assert(row.getAs[Double]("lat") === 12.0)
    assert(row.getAs[Double]("lon") === 272.5)
    // chunk-edge cell (partial chunks at y=3..4, x=4..5 boundaries)
    val edge = df.filter($"time" === 100L && $"depth_idx" === 0 &&
      $"lat_idx" === 3 && $"lon_idx" === 4).head
    assert(edge.getAs[Double]("water_temp") === 34.0)
  }

  test("missing chunk files are all-fill; fill values decode to null") {
    val store = tmpStore("fill")
    writeCoord(store, "time", Seq(0.0))
    writeCoord(store, "depth", Seq(0.0))
    writeCoord(store, "lat", Seq(0.0, 1.0))
    writeCoord(store, "lon", Seq(0.0, 1.0))
    def v(g: Seq[Int]): Double =
      if (g(2) == 0 && g(3) == 0) -30000.0 else g(2) * 10 + g(3)
    // chunk key "0.0.1.0" (second lat chunk) deliberately absent
    writeArray(s"$store/water_temp", Seq(1, 1, 2, 2), Seq(1, 1, 1, 2),
      "<f8", "C", "null", Some(-30000.0), v, skipChunks = Set("0.0.1.0"))
    writeArray(s"$store/salinity", Seq(1, 1, 2, 2), Seq(1, 1, 1, 2),
      "<f8", "C", "null", Some(-30000.0), v, skipChunks = Set("0.0.1.0"))
    val df = GridIngest.ingestZarr(spark, store)
    assert(df.count() === 4) // missing chunks still emit their cells
    val byIdx = df.collect().map(r =>
      (r.getAs[Int]("lat_idx"), r.getAs[Int]("lon_idx")) ->
        Option(r.getAs[Any]("water_temp"))).toMap
    assert(byIdx((0, 0)) === None)          // fill value -> null
    assert(byIdx((0, 1)) === Some(1.0))
    assert(byIdx((1, 0)) === None)          // missing chunk -> null
    assert(byIdx((1, 1)) === None)
  }

  test("F order and big-endian dtypes address cells correctly") {
    // 2x3 array, values v(i,j) = i*10 + j, stored column-major big-endian
    val dir = Files.createTempDirectory("zarr-forder").toString
    writeArray(dir, Seq(2, 3), Seq(2, 3), ">f4", "F", "null", None,
      g => g(0) * 10 + g(1))
    val all = Zarr.readAll(Zarr.readArrayMeta(dir))
    // readAll returns row-major: (0,0),(0,1),(0,2),(1,0)...
    assert(all.toSeq === Seq(0.0, 1.0, 2.0, 10.0, 11.0, 12.0))
  }

  test("integer dtypes, '/' separator, and unsigned decode") {
    val dir = Files.createTempDirectory("zarr-int").toString
    writeArray(dir, Seq(2, 2), Seq(1, 2), "<i2", "C", "zlib", None,
      g => -(g(0) * 100 + g(1)), dimSep = "/")
    assert(Zarr.readAll(Zarr.readArrayMeta(dir)).toSeq ===
      Seq(0.0, -1.0, -100.0, -101.0))
    val du = Files.createTempDirectory("zarr-uint").toString
    writeArray(du, Seq(2), Seq(2), "|u1", "C", "null", None, g => 200 + g.head)
    assert(Zarr.readAll(Zarr.readArrayMeta(du)).toSeq === Seq(200.0, 201.0))
  }

  test("unsupported compressor / malformed chunks fail loudly, never hang") {
    val dir = Files.createTempDirectory("zarr-bad").toString
    writeArray(dir, Seq(2), Seq(2), "<f8", "C", "lzma", None, g => g.head)
    val e = intercept[IllegalArgumentException](Zarr.readArrayMeta(dir))
    assert(e.getMessage.contains("lzma"))
    // truncated zlib chunk
    val dz = Files.createTempDirectory("zarr-trunc").toString
    writeArray(dz, Seq(4), Seq(4), "<f8", "C", "zlib", None, g => g.head)
    val key = Paths.get(dz, "0")
    val full = Files.readAllBytes(key)
    Files.write(key, java.util.Arrays.copyOf(full, math.max(1, full.length / 2)))
    val meta = Zarr.readArrayMeta(dz)
    intercept[Exception](Zarr.decodeChunk(meta, Files.readAllBytes(key)))
    // wrong-length raw chunk
    val dr = Files.createTempDirectory("zarr-short").toString
    writeArray(dr, Seq(4), Seq(4), "<f8", "C", "null", None, g => g.head)
    val meta2 = Zarr.readArrayMeta(dr)
    intercept[IllegalArgumentException](
      Zarr.decodeChunk(meta2, new Array[Byte](7)))
  }

  test("blosc(lz4): hand-written LZ4 sequence bytes decode (decoder-only direction)") {
    // One block, no shuffle, no split (16/8=2 < 128): stream is a
    // hand-assembled LZ4 block — literals "ABCD", match offset 4 len 7
    // (overlap copy), final literal-only sequence "DABCD".
    val stream = Array[Byte](0x43, 'A', 'B', 'C', 'D', 0x04, 0x00,
      0x50, 'D', 'A', 'B', 'C', 'D')
    val cbytes = 16 + 4 + 4 + stream.length // hdr, bstarts, stream size, stream
    val chunk = ByteBuffer.allocate(cbytes).order(ByteOrder.LITTLE_ENDIAN)
      .put(2.toByte).put(1.toByte).put(0x20.toByte).put(8.toByte)
      .putInt(16).putInt(16).putInt(cbytes)
      .putInt(20) // bstarts[0]
      .putInt(stream.length)
      .put(stream).array()
    val dir = Files.createTempDirectory("zarr-blosc-hand").toString
    writeArray(dir, Seq(2), Seq(2), "<f8", "C", "blosc", None, _ => 0.0)
    Files.write(Paths.get(dir, "0"), chunk)
    val meta = Zarr.readArrayMeta(dir)
    assert(Zarr.decodeChunk(meta, chunk)
      .sameElements("ABCDABCDABCDABCD".getBytes("US-ASCII")))
  }

  test("blosc: memcpyed chunks decode verbatim") {
    val raw = Array.tabulate(24)(i => (i * 7).toByte)
    val chunk = ByteBuffer.allocate(16 + raw.length)
      .order(ByteOrder.LITTLE_ENDIAN)
      .put(2.toByte).put(1.toByte).put(0x02.toByte).put(8.toByte)
      .putInt(raw.length).putInt(raw.length).putInt(16 + raw.length)
      .put(raw).array()
    val dir = Files.createTempDirectory("zarr-blosc-mc").toString
    writeArray(dir, Seq(3), Seq(3), "<f8", "C", "blosc", None, _ => 0.0)
    Files.write(Paths.get(dir, "0"), chunk)
    assert(Zarr.decodeChunk(Zarr.readArrayMeta(dir), chunk).sameElements(raw))
  }

  test("blosc: multi-block split streams + leftover block + shuffle round-trip") {
    // 4000-byte f8 chunk → blocks of 1024 (split into 8 streams of
    // 128) + a 928-byte leftover block (single stream); repetitive
    // values so the LZ4 paths emit real matches, not just verbatim
    val dir = Files.createTempDirectory("zarr-blosc-big").toString
    def v(g: Seq[Int]): Double = (g.head % 5) * 10.0 + g(1)
    writeArray(dir, Seq(50, 10), Seq(50, 10), "<f8", "C", "blosc", None, v)
    val got = Zarr.readAll(Zarr.readArrayMeta(dir))
    val want = for (a <- 0 until 50; b <- 0 until 10) yield v(Seq(a, b))
    assert(got.toSeq === want)
    // the fixture must actually have compressed (not all-verbatim)
    assert(Files.readAllBytes(Paths.get(dir, "0.0")).length < 4000)
  }

  test("blosc inner zlib: Deflater streams per block, shuffle, multi-block round-trip") {
    // same shape as the lz4 big test, inner codec 3 (never split)
    val dir = Files.createTempDirectory("zarr-blosc-zlib").toString
    def v(g: Seq[Int]): Double = (g.head % 7) * 4.0 + g(1)
    writeArray(dir, Seq(50, 10), Seq(50, 10), "<f8", "C", "blosc", None, v)
    val chunkKey = Paths.get(dir, "0.0")
    val raw = {
      val bb = ByteBuffer.allocate(4000).order(ByteOrder.LITTLE_ENDIAN)
      for (a <- 0 until 50; b <- 0 until 10) bb.putDouble(v(Seq(a, b)))
      bb.array()
    }
    Files.write(chunkKey, bloscEncode(raw, 8, shuffle = true, inner = "zlib"))
    val got = Zarr.readAll(Zarr.readArrayMeta(dir))
    val want = for (a <- 0 until 50; b <- 0 until 10) yield v(Seq(a, b))
    assert(got.toSeq === want)
  }

  test("blosc inner zstd: zstd-jni frames per block, shuffle, multi-block round-trip") {
    // inner codec 4 — frames written by the reference implementation,
    // decoded by the from-spec io.Zstd; never split (blosc.c rule)
    val dir = Files.createTempDirectory("zarr-blosc-zstd").toString
    def v(g: Seq[Int]): Double = (g.head % 11) * 3.0 + g(1) * 0.5
    writeArray(dir, Seq(60, 10), Seq(60, 10), "<f8", "C", "blosc", None, v)
    val chunkKey = Paths.get(dir, "0.0")
    val raw = {
      val bb = ByteBuffer.allocate(4800).order(ByteOrder.LITTLE_ENDIAN)
      for (a <- 0 until 60; b <- 0 until 10) bb.putDouble(v(Seq(a, b)))
      bb.array()
    }
    Files.write(chunkKey, bloscEncode(raw, 8, shuffle = true, inner = "zstd"))
    val got = Zarr.readAll(Zarr.readArrayMeta(dir))
    val want = for (a <- 0 until 60; b <- 0 until 10) yield v(Seq(a, b))
    assert(got.toSeq === want)
  }

  // ---- Zarr v3 fixtures: zarr.json + chunk objects written by hand
  // from the v3 core spec (never by a Zarr library)

  /** Minimal v3 array writer for the supported surface. */
  private def writeV3Array(dir: String, shape: Seq[Int], chunks: Seq[Int],
                           dataType: String, endian: String,
                           chain: Seq[String], keyEncoding: String,
                           sep: String, fill: String,
                           f: Seq[Int] => Double,
                           skipChunks: Set[String] = Set.empty): Unit = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    val chainJson = chain.map {
      case "gzip" => """{"name": "gzip", "configuration": {"level": 5}}"""
      case "zstd" => """{"name": "zstd", "configuration": {"level": 3, "checksum": false}}"""
      case "blosc" => """{"name": "blosc", "configuration": {"cname": "lz4", "clevel": 5, "shuffle": "shuffle", "typesize": 4, "blocksize": 0}}"""
      case "crc32c" => """{"name": "crc32c"}"""
      case other => fail(s"v3 fixture writer: codec $other")
    }
    val codecs = (s"""{"name": "bytes", "configuration": {"endian": "$endian"}}""" +: chainJson)
      .mkString("[", ", ", "]")
    Files.writeString(p.resolve("zarr.json"),
      s"""{"zarr_format": 3, "node_type": "array",
         | "shape": [${shape.mkString(", ")}],
         | "data_type": "$dataType",
         | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [${chunks.mkString(", ")}]}},
         | "chunk_key_encoding": {"name": "$keyEncoding", "configuration": {"separator": "$sep"}},
         | "fill_value": $fill,
         | "codecs": $codecs,
         | "attributes": {}}""".stripMargin)
    val size = dataType match {
      case "float64" | "int64" => 8
      case "float32" | "int32" | "uint32" => 4
      case "int16" | "uint16" => 2
      case _ => 1
    }
    val bo = if (endian == "big") ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    val rank = shape.size
    val origins = shape.indices.foldLeft(Seq(Seq.empty[Int])) { (acc, d) =>
      for (pre <- acc; o <- 0 until shape(d) by chunks(d)) yield pre :+ o
    }
    origins.foreach { origin =>
      val idx = origin.zipWithIndex.map { case (o, d) => o / chunks(d) }
      val key = keyEncoding match {
        case "v2" => idx.mkString(sep)
        case _ => "c" + sep + idx.mkString(sep)
      }
      if (!skipChunks.contains(key)) {
        val buf = ByteBuffer.allocate(chunks.product * size).order(bo)
        def walk(d: Int, inChunk: List[Int]): Unit =
          if (d == rank) {
            val global = inChunk.reverse.zipWithIndex.map { case (i, dd) => origin(dd) + i }
            val v = if (global.zipWithIndex.forall { case (g, dd) => g < shape(dd) })
              f(global) else 0.0
            dataType match {
              case "float64" => buf.putDouble(v)
              case "float32" => buf.putFloat(v.toFloat)
              case "int32" => buf.putInt(v.toInt)
              case "int16" => buf.putShort(v.toShort)
              case "uint8" => buf.put(v.toInt.toByte)
              case other => fail(s"v3 fixture: dtype $other")
            }
          } else (0 until chunks(d)).foreach(i => walk(d + 1, i :: inChunk))
        walk(0, Nil)
        var bytes = buf.array()
        chain.foreach {
          case "gzip" =>
            val o = new java.io.ByteArrayOutputStream()
            val g = new java.util.zip.GZIPOutputStream(o)
            g.write(bytes); g.close(); bytes = o.toByteArray
          case "zstd" => bytes = com.github.luben.zstd.Zstd.compress(bytes, 3)
          case "blosc" => bytes = bloscEncode(bytes, size, shuffle = true)
          case "crc32c" =>
            val c = new java.util.zip.CRC32C()
            c.update(bytes, 0, bytes.length)
            val v = c.getValue.toInt
            bytes = bytes ++ Array[Byte](
              (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
              ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
        }
        val target = p.resolve(key)
        if (target.getParent != null) Files.createDirectories(target.getParent)
        Files.write(target, bytes)
      }
    }
  }

  /** Hand-written v3 `sharding_indexed` store: each shard object is
    * [encoded inner chunks][index] (or index-first), index =
    * (offset, nbytes) uint64-LE pairs in row-major inner-grid order,
    * absent inner chunk = 2^64-1 sentinels, optional crc32c suffix.
    */
  private def writeV3Sharded(dir: String, shape: Seq[Int], outer: Seq[Int],
                             inner: Seq[Int], innerCodec: String,
                             indexCrc: Boolean, indexAtEnd: Boolean,
                             fill: String, f: Seq[Int] => Double,
                             skipInner: Set[(String, Int)] = Set.empty,
                             skipShards: Set[String] = Set.empty): Unit = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    val innerCodecJson = innerCodec match {
      case "zstd" => """, {"name": "zstd", "configuration": {"level": 3}}"""
      case "gzip" => """, {"name": "gzip", "configuration": {"level": 5}}"""
      case _ => ""
    }
    val idxCodecs = """[{"name": "bytes", "configuration": {"endian": "little"}}""" +
      (if (indexCrc) """, {"name": "crc32c"}]""" else "]")
    Files.writeString(p.resolve("zarr.json"),
      s"""{"zarr_format": 3, "node_type": "array",
         | "shape": [${shape.mkString(", ")}],
         | "data_type": "float64",
         | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [${outer.mkString(", ")}]}},
         | "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
         | "fill_value": $fill,
         | "codecs": [{"name": "sharding_indexed", "configuration": {
         |   "chunk_shape": [${inner.mkString(", ")}],
         |   "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}$innerCodecJson],
         |   "index_codecs": $idxCodecs,
         |   "index_location": "${if (indexAtEnd) "end" else "start"}"}}]}""".stripMargin)
    val rank = shape.size
    val gridDims = outer.indices.map(d => outer(d) / inner(d))
    val nInner = gridDims.product
    val shardOrigins = shape.indices.foldLeft(Seq(Seq.empty[Int])) { (acc, d) =>
      for (pre <- acc; o <- 0 until shape(d) by outer(d)) yield pre :+ o
    }
    shardOrigins.foreach { so =>
      val key = "c/" + so.zipWithIndex.map { case (o, d) => o / outer(d) }.mkString("/")
      if (!skipShards.contains(key)) {
        val indexSize = nInner * 16 + (if (indexCrc) 4 else 0)
        val chunksOut = new java.io.ByteArrayOutputStream()
        val index = ByteBuffer.allocate(nInner * 16).order(ByteOrder.LITTLE_ENDIAN)
        // inner-grid positions in row-major order
        def gridWalk(d: Int, pos: List[Int]): Seq[Seq[Int]] =
          if (d == rank) Seq(pos.reverse)
          else (0 until gridDims(d)).flatMap(i => gridWalk(d + 1, i :: pos))
        gridWalk(0, Nil).zipWithIndex.foreach { case (gpos, flat) =>
          if (skipInner.contains((key, flat))) {
            index.putLong(-1L).putLong(-1L)
          } else {
            val buf = ByteBuffer.allocate(inner.product * 8).order(ByteOrder.LITTLE_ENDIAN)
            def cellWalk(d: Int, idx: List[Int]): Unit =
              if (d == rank) {
                val global = idx.reverse.zipWithIndex.map { case (i, dd) =>
                  so(dd) + gpos(dd) * inner(dd) + i }
                val v = if (global.zipWithIndex.forall { case (g, dd) => g < shape(dd) })
                  f(global) else 0.0
                buf.putDouble(v)
              } else (0 until inner(d)).foreach(i => cellWalk(d + 1, i :: idx))
            cellWalk(0, Nil)
            val enc = innerCodec match {
              case "zstd" => com.github.luben.zstd.Zstd.compress(buf.array(), 3)
              case "gzip" =>
                val o = new java.io.ByteArrayOutputStream()
                val g = new java.util.zip.GZIPOutputStream(o)
                g.write(buf.array()); g.close(); o.toByteArray
              case _ => buf.array()
            }
            val off = (if (indexAtEnd) 0 else indexSize) + chunksOut.size()
            index.putLong(off.toLong).putLong(enc.length.toLong)
            chunksOut.write(enc)
          }
        }
        val idxBytes = if (indexCrc) {
          val c = new java.util.zip.CRC32C()
          c.update(index.array(), 0, index.array().length)
          val v = c.getValue.toInt
          index.array() ++ Array[Byte](
            (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
            ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
        } else index.array()
        val shard =
          if (indexAtEnd) chunksOut.toByteArray ++ idxBytes
          else idxBytes ++ chunksOut.toByteArray
        val target = p.resolve(key)
        Files.createDirectories(target.getParent)
        Files.write(target, shard)
      }
    }
  }

  test("v3 sharding_indexed: zstd inner chunks, crc32c index at end, absences = fill") {
    val dir = Files.createTempDirectory("zarr-v3-shard").toString
    def v(g: Seq[Int]): Double = g.head * 100.0 + g(1)
    // array 8x6, shards 4x6, inner 2x3 → 2x2 inner grid per shard
    writeV3Sharded(dir, Seq(8, 6), Seq(4, 6), Seq(2, 3), "zstd",
      indexCrc = true, indexAtEnd = true, "NaN", v,
      skipInner = Set(("c/0/0", 3)), // inner (1,1) of shard (0,0): rows 2-3, cols 3-5
      skipShards = Set("c/1/0"))     // rows 4-7 entirely
    val meta = Zarr.readArrayMeta(dir)
    val got = Zarr.readAll(meta)
    for (a <- 0 until 8; b <- 0 until 6) {
      val x = got(a * 6 + b)
      val absent = (a >= 4) || (a >= 2 && a < 4 && b >= 3)
      if (absent) assert(x.isNaN, s"($a,$b) should be fill")
      else assert(x === v(Seq(a, b)), s"($a,$b)")
    }
  }

  test("v3 sharding_indexed: plain index at start, uncompressed inner chunks") {
    val dir = Files.createTempDirectory("zarr-v3-shard2").toString
    def v(g: Seq[Int]): Double = g.head - 2.5
    writeV3Sharded(dir, Seq(9), Seq(6), Seq(3), "none",
      indexCrc = false, indexAtEnd = false, "0.0", v)
    val got = Zarr.readAll(Zarr.readArrayMeta(dir))
    (0 until 9).foreach(a => assert(got(a) === v(Seq(a)), s"($a)"))
  }

  test("v3 sharding_indexed: corrupted index crc fails loudly") {
    val dir = Files.createTempDirectory("zarr-v3-shard3").toString
    writeV3Sharded(dir, Seq(4), Seq(4), Seq(2), "none",
      indexCrc = true, indexAtEnd = true, "0.0", g => g.head)
    val shardPath = Paths.get(dir, "c", "0")
    val bytes = Files.readAllBytes(shardPath)
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x7).toByte
    Files.write(shardPath, bytes)
    val e = intercept[IllegalArgumentException] {
      Zarr.readAll(Zarr.readArrayMeta(dir))
    }
    assert(e.getMessage.contains("crc32c"))
  }

  test("v3 hydro store ingests through the SAME GridIngest path as v2") {
    // xarray layout, v3 metadata throughout: sharded water_temp,
    // plain-zstd salinity, raw v3 coordinate arrays — the transparent
    // readArrayMeta dispatch means ingestZarr needs zero changes
    val store = tmpStore("hydro-v3")
    def coordV3(name: String, vals: Seq[Double]): Unit =
      writeV3Array(s"$store/$name", Seq(vals.size), Seq(vals.size), "float64",
        "little", Seq.empty, "default", "/", "0.0", g => vals(g.head))
    val (nT, nD, nY, nX) = (2, 2, 6, 6)
    coordV3("time", Seq(200.0, 201.0))
    coordV3("depth", Seq(0.0, 8.0))
    coordV3("lat", (0 until nY).map(20.0 + _ * 0.25))
    coordV3("lon", (0 until nX).map(300.0 + _ * 0.25))
    def v(g: Seq[Int]): Double = g(0) * 1000 + g(1) * 100 + g(2) * 10 + g(3)
    writeV3Sharded(s"$store/water_temp", Seq(nT, nD, nY, nX), Seq(1, 1, 6, 6),
      Seq(1, 1, 3, 3), "zstd", indexCrc = true, indexAtEnd = true,
      "-30000.0", v)
    writeV3Array(s"$store/salinity", Seq(nT, nD, nY, nX), Seq(1, 1, 6, 6),
      "float64", "little", Seq("zstd"), "default", "/", "-30000.0",
      g => v(g) + 0.5)
    val df = GridIngest.ingestZarr(spark, store).cache()
    assert(df.count() === nT * nD * nY * nX)
    val row = df.filter($"time" === 201L && $"depth_idx" === 1 &&
      $"lat_idx" === 5 && $"lon_idx" === 4).head
    assert(row.getAs[Double]("water_temp") === 1154.0)
    assert(row.getAs[Double]("salinity") === 1154.5)
    assert(row.getAs[Double]("lat") === 21.25)
  }

  test("v3 store: default key encoding, zstd codec, missing chunk = fill") {
    val dir = Files.createTempDirectory("zarr-v3").toString
    def v(g: Seq[Int]): Double = g.head * 10.0 + g(1)
    writeV3Array(dir, Seq(6, 8), Seq(4, 4), "float64", "little",
      Seq("zstd"), "default", "/", "NaN", v, skipChunks = Set("c/1/1"))
    val meta = Zarr.readArrayMeta(dir) // transparent v3 dispatch
    assert(meta.keyPrefix === "c/")
    val got = Zarr.readAll(meta)
    for (a <- 0 until 6; b <- 0 until 8) {
      val x = got(a * 8 + b)
      if (a >= 4 && b >= 4) assert(x.isNaN, s"($a,$b) should be fill")
      else assert(x === v(Seq(a, b)), s"($a,$b)")
    }
  }

  test("v3 store: gzip+crc32c chain, big endian, v2 key encoding, float32") {
    val dir = Files.createTempDirectory("zarr-v3-gz").toString
    def v(g: Seq[Int]): Double = (g.head - 3) * 0.25
    writeV3Array(dir, Seq(10), Seq(4), "float32", "big",
      Seq("gzip", "crc32c"), "v2", ".", "0.0", v)
    val got = Zarr.readAll(Zarr.readArrayMeta(dir))
    (0 until 10).foreach(a => assert(got(a) === v(Seq(a)).toFloat.toDouble, s"($a)"))
  }

  test("v3 store: blosc codec and int16 decode through the shared path") {
    val dir = Files.createTempDirectory("zarr-v3-blosc").toString
    def v(g: Seq[Int]): Double = (g.head * 7 - 20).toDouble
    writeV3Array(dir, Seq(30, 4), Seq(30, 4), "int16", "little",
      Seq("blosc"), "default", "/", "0", v)
    val got = Zarr.readAll(Zarr.readArrayMeta(dir))
    for (a <- 0 until 30; b <- 0 until 4)
      assert(got(a * 4 + b) === v(Seq(a, b)), s"($a,$b)")
  }

  test("v3: sharding, transpose, unknown dtypes fail loudly by name") {
    def store(codecs: String, dtype: String = "float64"): String = {
      val dir = Files.createTempDirectory("zarr-v3-bad").toString
      Files.writeString(Paths.get(dir, "zarr.json"),
        s"""{"zarr_format": 3, "node_type": "array", "shape": [4],
           | "data_type": "$dtype",
           | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [4]}},
           | "fill_value": 0, "codecs": $codecs}""".stripMargin)
      dir
    }
    // sharding_indexed is SUPPORTED — but only as the sole top-level
    // codec, and the inner grid must divide the shard
    val shardPos = intercept[IllegalArgumentException](Zarr.readArrayMeta(store(
      """[{"name": "bytes", "configuration": {"endian": "little"}}, {"name": "sharding_indexed"}]""")))
    assert(shardPos.getMessage.contains("sharding_indexed"))
    val shardDiv = intercept[IllegalArgumentException](Zarr.readArrayMeta(store(
      """[{"name": "sharding_indexed", "configuration": {"chunk_shape": [3],
        |  "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
        |  "index_codecs": [{"name": "bytes", "configuration": {"endian": "little"}}]}}]""".stripMargin)))
    assert(shardDiv.getMessage.contains("divide"))
    val transpose = intercept[IllegalArgumentException](Zarr.readArrayMeta(store(
      """[{"name": "transpose", "configuration": {"order": [0]}}, {"name": "bytes"}]""")))
    assert(transpose.getMessage.contains("transpose"))
    val dt = intercept[IllegalArgumentException](Zarr.readArrayMeta(store(
      """[{"name": "bytes", "configuration": {"endian": "little"}}]""", dtype = "complex64")))
    assert(dt.getMessage.contains("complex64"))
  }

  test("zstd compressor: bare zstd-jni frames per chunk read back exactly") {
    val dir = Files.createTempDirectory("zarr-zstd").toString
    def v(g: Seq[Int]): Double = g.head * 2.5 - g(1)
    writeArray(dir, Seq(40, 12), Seq(16, 5), "<f4", "C", "zstd", Some(-9.0), v)
    val meta = Zarr.readArrayMeta(dir)
    val got = Zarr.readAll(meta)
    val want = for (a <- 0 until 40; b <- 0 until 12) yield v(Seq(a, b)).toFloat.toDouble
    assert(got.toSeq === want)
  }

  test("blosc inner snappy: hand-written block (literal + overlapping copy) decodes") {
    // 32 bytes of "abcd" repeated: varint(32), literal len 4, copy2
    // offset 4 len 28 (overlap-copy extends the pattern)
    val stream = Array[Byte](32, 0x0C, 'a', 'b', 'c', 'd', 0x6E, 0x04, 0x00)
    val cbytes = 16 + 4 + 4 + stream.length
    val chunk = ByteBuffer.allocate(cbytes).order(ByteOrder.LITTLE_ENDIAN)
      .put(2.toByte).put(1.toByte).put((2 << 5).toByte).put(8.toByte)
      .putInt(32).putInt(32).putInt(cbytes)
      .putInt(20).putInt(stream.length)
      .put(stream).array()
    val dir = Files.createTempDirectory("zarr-blosc-snappy").toString
    writeArray(dir, Seq(4), Seq(4), "<f8", "C", "blosc", None, _ => 0.0)
    Files.write(Paths.get(dir, "0"), chunk)
    val out = Zarr.decodeChunk(Zarr.readArrayMeta(dir), chunk)
    assert(out.sameElements(("abcd" * 8).getBytes("US-ASCII")))
  }

  test("blosc: bit-shuffle, foreign inner codecs, bad version, truncation fail loudly") {
    val dir = Files.createTempDirectory("zarr-blosc-bad").toString
    writeArray(dir, Seq(2), Seq(2), "<f8", "C", "blosc", None, g => g.head)
    val meta = Zarr.readArrayMeta(dir)
    def frame(version: Int, flags: Int): Array[Byte] =
      ByteBuffer.allocate(16 + 16).order(ByteOrder.LITTLE_ENDIAN)
        .put(version.toByte).put(1.toByte).put(flags.toByte).put(8.toByte)
        .putInt(16).putInt(16).putInt(32).array()
    val bitShuf = intercept[IllegalArgumentException](
      Zarr.decodeChunk(meta, frame(2, 0x20 | 0x04)))
    assert(bitShuf.getMessage.contains("bit-shuffle"))
    // zstd is a SUPPORTED inner codec since round 9 — a zstd-flagged
    // chunk with a garbage body must still fail loudly, not hang
    val zstd = intercept[IllegalArgumentException](
      Zarr.decodeChunk(meta, frame(2, 4 << 5)))
    assert(zstd.getMessage.contains("block"))
    val blosclz = intercept[IllegalArgumentException](
      Zarr.decodeChunk(meta, frame(2, 0)))
    assert(blosclz.getMessage.contains("blosclz"))
    val ver = intercept[IllegalArgumentException](
      Zarr.decodeChunk(meta, frame(4, 0x20)))
    assert(ver.getMessage.contains("version"))
    // truncated mid-stream: take a valid chunk, cut it, fix cbytes
    val full = Files.readAllBytes(Paths.get(dir, "0"))
    val cut = java.util.Arrays.copyOf(full, full.length - 3)
    val bb = ByteBuffer.wrap(cut).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(12, cut.length)
    intercept[IllegalArgumentException](Zarr.decodeChunk(meta, cut))
  }

  test("4-D hydro store ingests through blosc(lz4) chunks (zarr-python default)") {
    val store = tmpStore("hydro-blosc")
    val (nT, nD, nY, nX) = (2, 2, 5, 6)
    writeCoord(store, "time", Seq(100.0, 101.0))
    writeCoord(store, "depth", Seq(0.0, 10.0))
    writeCoord(store, "lat", (0 until nY).map(10.0 + _ * 0.5))
    writeCoord(store, "lon", (0 until nX).map(270.0 + _ * 0.5))
    def v(g: Seq[Int]): Double = g(0) * 1000 + g(1) * 100 + g(2) * 10 + g(3)
    writeArray(s"$store/water_temp", Seq(nT, nD, nY, nX), Seq(1, 1, 3, 4),
      "<f8", "C", "blosc", Some(-30000.0), v)
    writeArray(s"$store/salinity", Seq(nT, nD, nY, nX), Seq(1, 1, 3, 4),
      "<f4", "C", "blosc", Some(-30000.0), g => v(g) + 0.5)
    val df = GridIngest.ingestZarr(spark, store)
    assert(df.count() === nT * nD * nY * nX)
    val row = df.filter($"time" === 101L && $"depth_idx" === 1 &&
      $"lat_idx" === 4 && $"lon_idx" === 5).head
    assert(row.getAs[Double]("water_temp") === 1145.0)
    assert(math.abs(row.getAs[Double]("salinity") - 1145.5) < 1e-6)
  }

  test("randomized round-trip: random shape/chunks/dtype/order/codec all read back exactly") {
    val rnd = new scala.util.Random(42)
    val dtypes = Seq("<f8", ">f8", "<f4", ">f4", "<i2", ">i4", "|u1")
    (1 to 25).foreach { trial =>
      val rank = 1 + rnd.nextInt(3)
      val shape = Seq.fill(rank)(1 + rnd.nextInt(6))
      val chunks = shape.map(s => 1 + rnd.nextInt(s + 2)) // may exceed shape
      val dtype = dtypes(rnd.nextInt(dtypes.length))
      val order = if (rnd.nextBoolean()) "C" else "F"
      val codec = Seq("zlib", "null", "blosc")(rnd.nextInt(3))
      // values exactly representable in EVERY dtype above (incl. u1)
      def v(g: Seq[Int]): Double =
        g.zipWithIndex.map { case (x, d) => x * math.pow(6, d) }.sum % 120
      val dir = Files.createTempDirectory(s"zarr-prop-$trial").toString
      writeArray(dir, shape, chunks, dtype, order, codec, None, v)
      val got = Zarr.readAll(Zarr.readArrayMeta(dir))
      // expected in row-major global order
      val idxs = shape.foldLeft(Seq(Seq.empty[Int])) { (acc, s) =>
        for (p <- acc; i <- 0 until s) yield p :+ i
      }
      val want = idxs.map(v)
      assert(got.toSeq === want,
        s"trial $trial shape=$shape chunks=$chunks dtype=$dtype order=$order codec=$codec")
    }
  }

  test("writeStore sink: synthetic grid round-trips through a real store, nulls preserved") {
    import graft.io.SyntheticGrid
    val spec = SyntheticGrid.GridSpec(
      latMin = 10.0, latStep = 0.5, nLat = 7,
      lonMin = 270.0, lonStep = 0.5, nLon = 9,
      depths = Seq(0.0, 10.0, 20.0), times = Seq(100L, 106L))
    // sentinels cleaned FIRST: the store's fill_value IS the missing
    // marker, so raw -30000 sentinels would round-trip to null anyway —
    // the test input must already be in the engine's null convention
    val grid = SyntheticGrid.cleanSentinels(SyntheticGrid.generate(spark, spec))
      .withColumn("water_temp",
        when($"lat_idx" === 2 && $"lon_idx" === 3, lit(null)
          .cast("double")).otherwise($"water_temp"))
    val store = Files.createTempDirectory("zarr-sink").toString + "/store"
    // chunk sizes chosen to force PARTIAL edge chunks on every axis
    graft.io.Zarr.writeStore(grid, spec, store,
      chunkT = 1, chunkD = 2, chunkY = 4, chunkX = 5)
    val back = GridIngest.ingestZarr(spark, store)
    val cols = Seq("time", "depth_idx", "lat_idx", "lon_idx")
    val a = grid.select("time", "depth_idx", "depth", "lat_idx", "lat",
      "lon_idx", "lon", "water_temp", "salinity")
    assert(back.count() === a.count())
    // exact frame equality both directions (doubles written <f8 raw)
    assert(a.exceptAll(back).isEmpty && back.exceptAll(a).isEmpty)
    // the planted nulls specifically
    assert(back.filter($"lat_idx" === 2 && $"lon_idx" === 3 &&
      $"water_temp".isNotNull).isEmpty)
    // and an external sanity: the store parses as spec-valid metadata
    val meta = Zarr.readArrayMeta(s"$store/water_temp")
    assert(meta.shape === Seq(2L, 3L, 7L, 9L) && meta.chunks === Seq(1, 2, 4, 5))
  }

  test("writeStore formatV3: publishes a v3 store that round-trips and sniffs") {
    import graft.io.SyntheticGrid
    val spec = SyntheticGrid.GridSpec(
      latMin = -5.0, latStep = 0.5, nLat = 6,
      lonMin = 10.0, lonStep = 0.25, nLon = 7,
      depths = Seq(0.0, 15.0), times = Seq(50L, 51L, 52L))
    val grid = SyntheticGrid.cleanSentinels(SyntheticGrid.generate(spark, spec))
      .withColumn("salinity",
        when($"lat_idx" === 1 && $"lon_idx" === 6, lit(null)
          .cast("double")).otherwise($"salinity"))
    val store = Files.createTempDirectory("zarr-sink-v3").toString + "/store"
    graft.io.Zarr.writeStore(grid, spec, store,
      chunkT = 2, chunkD = 1, chunkY = 4, chunkX = 4, formatV3 = true)
    // the metadata is v3 with nested c/ chunk keys and the gzip chain
    val meta = Zarr.readArrayMeta(s"$store/salinity")
    assert(meta.keyPrefix === "c/")
    assert(meta.compressor === Zarr.V3Chain(Seq(Zarr.V3Gzip)))
    assert(Zarr.isZarr(store))
    assert(new java.io.File(s"$store/salinity/c/0/0/0/0").isFile)
    assert(new java.io.File(s"$store/zarr.json").isFile)
    // full frame equality back through the SAME ingest path
    val back = GridIngest.ingestZarr(spark, store)
    val a = grid.select("time", "depth_idx", "depth", "lat_idx", "lat",
      "lon_idx", "lon", "water_temp", "salinity")
    assert(back.count() === a.count())
    assert(a.exceptAll(back).isEmpty && back.exceptAll(a).isEmpty)
    assert(back.filter($"lat_idx" === 1 && $"lon_idx" === 6 &&
      $"salinity".isNotNull).isEmpty)
  }

  test("writeStore through an explicit file:// FileSystem handle; no UDF in the sink plan") {
    import graft.io.SyntheticGrid
    val spec = SyntheticGrid.GridSpec(
      latMin = 10.0, latStep = 0.5, nLat = 5,
      lonMin = 270.0, lonStep = 0.5, nLon = 6,
      depths = Seq(0.0, 10.0), times = Seq(100L, 106L))
    val grid = SyntheticGrid.cleanSentinels(SyntheticGrid.generate(spark, spec))
    val local = Files.createTempDirectory("zarr-sink-fs").toString + "/store"
    // scheme-qualified URI: every byte goes through the Hadoop
    // FileSystem resolved from the path, not java.nio on a cwd mount
    graft.io.Zarr.writeStore(grid, spec, "file://" + local,
      chunkT = 1, chunkD = 1, chunkY = 3, chunkX = 4)
    // read back through an explicit file:// handle too — the source
    // side goes through the same Hadoop FileSystem as the sink
    val back = GridIngest.ingestZarr(spark, "file://" + local)
    val a = grid.select("time", "depth_idx", "depth", "lat_idx", "lat",
      "lon_idx", "lon", "water_temp", "salinity")
    assert(back.count() === a.count())
    assert(a.exceptAll(back).isEmpty && back.exceptAll(a).isEmpty)
    assert(graft.io.Zarr.isZarr("file://" + local))
    // the chunk-keying projection must be pure built-ins — the former
    // time->index UDF is now an element_at over a typedLit map
    val plan = graft.io.Zarr.chunkRows(grid,
      spec.times.zipWithIndex.toMap, 1, 1, 3, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"UDF in sink plan:\n${plan.take(600)}")
  }

  test("ingestToParquet sniffs a Zarr store and round-trips through parquet") {
    val store = tmpStore("sniff")
    writeCoord(store, "time", Seq(5.0))
    writeCoord(store, "depth", Seq(0.0))
    writeCoord(store, "lat", Seq(0.0, 1.0))
    writeCoord(store, "lon", Seq(0.0, 1.0))
    def v(g: Seq[Int]): Double = 20.0 + g(2) + g(3)
    writeArray(s"$store/water_temp", Seq(1, 1, 2, 2), Seq(1, 1, 2, 2),
      "<f8", "C", "zlib", Some(-30000.0), v)
    writeArray(s"$store/salinity", Seq(1, 1, 2, 2), Seq(1, 1, 2, 2),
      "<f8", "C", "zlib", Some(-30000.0), g => 35.0 + v(g) / 100)
    val out = Files.createTempDirectory("zarr-pq").toString + "/grid"
    val spec = GridIngest.ingestToParquet(spark, store, out)
    assert(spec.nLat === 2 && spec.nLon === 2 && spec.times === Seq(5L))
    val back = spark.read.parquet(out)
    assert(back.count() === 4)
    assert(back.agg(sum($"water_temp")).head.getDouble(0) === 4 * 20.0 + 4.0)
  }
}
