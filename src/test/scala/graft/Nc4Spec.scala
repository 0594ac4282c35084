package graft

import java.nio.{ByteBuffer, ByteOrder}
import graft.io.{GridIngest, Nc4, SyntheticGrid, TrackReader}
import graft.pipeline.TrackProfile

/** netCDF-4 / HDF5 ingestion (VERDICT r4 item 4): spec-level byte
  * fixture (written raw in the test, independent of Nc4.write), the
  * writer⇄reader round-trip across pack/filter variants, and flagship
  * IDW parity between the HDF5 and GRD1 ingest paths — mirroring
  * Nc3Spec.
  */
class Nc4Spec extends SparkSpec {

  private lazy val spec = SyntheticGrid.hermineSpec(step = 1.0)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("nc4").resolve(name).toString

  /** An HDF5 file written byte-by-byte straight from the public spec —
    * NOT via Nc4.write — so the parser is tested against the format,
    * not its own mirror image. Superblock v0, old-style root group
    * (local heap + B-tree v1 + SNOD), one v1-object-header dataset
    * `x`: contiguous little-endian float64[4] with `scale_factor` and
    * `_FillValue` attributes. Every offset below is hand-computed.
    */
  private lazy val handWritten: String = {
    val p = tmp("hand.h5")
    val buf = ByteBuffer.allocate(560).order(ByteOrder.LITTLE_ENDIAN)
    def undef(): Unit = buf.putLong(-1L)
    // ---- superblock v0 @0 (96 bytes)
    buf.put(Nc4.Signature)
    buf.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // versions
    buf.put(0.toByte).put(8.toByte).put(8.toByte).put(0.toByte) // offsets/lengths = 8
    buf.putShort(4).putShort(4)            // group leaf/internal K
    buf.putInt(0)                          // consistency flags
    buf.putLong(0L)                        // base address
    undef()                                // free-space address
    buf.putLong(560L)                      // EOF
    undef()                                // driver info
    buf.putLong(0L)                        // root entry: link name offset
    buf.putLong(96L)                       //   object header address
    buf.putInt(1).putInt(0)                //   cached-group scratch follows
    buf.putLong(184L)                      //   B-tree address
    buf.putLong(136L)                      //   local heap address
    // ---- root object header @96: v1 prefix + symbol table message
    assert(buf.position() == 96)
    buf.put(1.toByte).put(0.toByte).putShort(1)
    buf.putInt(1).putInt(24).putInt(0)     // refcount, size, padding
    buf.putShort(0x0011).putShort(16)
    buf.putInt(0)                          // flags + reserved
    buf.putLong(184L).putLong(136L)        // B-tree, heap
    // ---- local heap @136 (header 32B, data @168: null + "x\0" padded)
    assert(buf.position() == 136)
    buf.put("HEAP".getBytes).putInt(0)     // signature, version+reserved
    buf.putLong(16L)                       // data segment size
    undef()                                // no free block
    buf.putLong(168L)                      // data segment address
    buf.putLong(0L)                        // heap offset 0: null name
    buf.put('x'.toByte).put(0.toByte)
    buf.put(new Array[Byte](6))            // pad name to 8
    // ---- group B-tree @184: one leaf entry pointing at the SNOD
    assert(buf.position() == 184)
    buf.put("TREE".getBytes)
    buf.put(0.toByte).put(0.toByte).putShort(1) // type 0, level 0, 1 entry
    undef(); undef()                       // siblings
    buf.putLong(0L)                        // key0: null name
    buf.putLong(232L)                      // child0: SNOD
    buf.putLong(8L)                        // key1: "x" at heap offset 8
    // ---- SNOD @232: one symbol
    assert(buf.position() == 232)
    buf.put("SNOD".getBytes)
    buf.put(1.toByte).put(0.toByte).putShort(1)
    buf.putLong(8L)                        // name at heap offset 8
    buf.putLong(280L)                      // object header address
    buf.putInt(0).putInt(0)
    buf.put(new Array[Byte](16))           // scratch
    // ---- dataset object header @280
    assert(buf.position() == 280)
    buf.put(1.toByte).put(0.toByte).putShort(5)
    buf.putInt(1).putInt(232).putInt(0)    // 5 messages, 232 bytes
    //   dataspace: 1-D [4]
    buf.putShort(0x0001).putShort(16).putInt(0)
    buf.put(1.toByte).put(1.toByte).put(0.toByte)
    buf.put(new Array[Byte](5)).putLong(4L)
    //   datatype: IEEE f64 little-endian (class 1 v1, bit fields per spec)
    def dtF64(): Unit = {
      buf.put(0x11.toByte).put(0x20.toByte).put(0x3F.toByte).put(0.toByte)
      buf.putInt(8)
      buf.putShort(0).putShort(64)
      buf.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte)
      buf.putInt(1023)
    }
    buf.putShort(0x0003).putShort(24).putInt(0)
    dtF64(); buf.putInt(0)                 // 20-byte body padded to 24
    //   layout v3 contiguous @456, 32 bytes
    buf.putShort(0x0008).putShort(24).putInt(0)
    buf.put(3.toByte).put(1.toByte)
    buf.putLong(528L).putLong(32L)
    buf.put(new Array[Byte](6))            // 18-byte body padded to 24
    //   attribute v1: scale_factor = 0.5 (f64 scalar)
    def att(name: String, value: Double): Unit = {
      val nb = name.getBytes :+ 0.toByte
      val namePad = (nb.length + 7) / 8 * 8
      buf.putShort(0x000C).putShort((8 + namePad + 24 + 8 + 8).toShort).putInt(0)
      buf.put(1.toByte).put(0.toByte)
      buf.putShort(nb.length.toShort).putShort(20).putShort(8)
      buf.put(nb).put(new Array[Byte](namePad - nb.length))
      dtF64(); buf.putInt(0)               // datatype padded to 24
      buf.put(1.toByte).put(0.toByte).put(0.toByte) // scalar dataspace v1
      buf.put(new Array[Byte](5))
      buf.putDouble(value)
    }
    att("scale_factor", 0.5)
    att("_FillValue", -9.0)
    // ---- data @528: raw [1.5, 2.5, -9.0 (fill), 4.0]
    assert(buf.position() == 528)
    Seq(1.5, 2.5, -9.0, 4.0).foreach(buf.putDouble)
    assert(buf.position() == 560)
    val out = new java.io.FileOutputStream(p)
    try out.write(buf.array(), 0, buf.position())
    finally out.close()
    p
  }

  test("hand-written HDF5 bytes parse: group walk, dataspace, dtype, CF attributes") {
    assert(Nc4.isHdf5(handWritten))
    val f = Nc4.readFile(handWritten)
    assert(f.datasets.keySet === Set("x"))
    val ds = f.dataset("x")
    assert(ds.dims === Seq(4L))
    assert(ds.dtype === Nc4.Dtype(isFloat = true, size = 8, littleEndian = true, signed = true))
    assert(ds.numAtt("scale_factor") === Some(0.5))
    assert(ds.numAtt("_FillValue") === Some(-9.0))
    assert(ds.layout === Nc4.Contiguous(528L, 32L))
  }

  test("hand-written file reads to exact hand-computed values (fill → NaN, CF unpack)") {
    val f = Nc4.readFile(handWritten)
    val vals = Nc4.readAll(handWritten, f.dataset("x"))
    // unpack = raw * 0.5; raw -9 = fill
    assert(vals(0) === 0.75 && vals(1) === 1.25 && vals(3) === 2.0)
    assert(vals(2).isNaN)
  }

  /** The `libver=latest` variant, hand-written from the spec: v2
    * superblock (root header address direct, no symbol table), v2
    * `OHDR` object headers (1-byte chunk size, packed messages, no
    * 8-padding), compact new-style group (link-info + hard-link
    * messages), dataspace v2, attribute v3. Checksums are not
    * validated by the reader and are written as zeros.
    */
  private lazy val handWrittenV2: String = {
    val p = tmp("handv2.h5")
    val buf = ByteBuffer.allocate(272).order(ByteOrder.LITTLE_ENDIAN)
    def undef(): Unit = buf.putLong(-1L)
    // ---- superblock v2 @0 (48 bytes)
    buf.put(Nc4.Signature)
    buf.put(2.toByte).put(8.toByte).put(8.toByte).put(0.toByte)
    buf.putLong(0L)                        // base address
    undef()                                // superblock extension
    buf.putLong(272L)                      // EOF
    buf.putLong(48L)                       // root group object header
    buf.putInt(0)                          // checksum (unvalidated)
    // ---- root group OHDR @48: link info + one hard link, chunk0 = 38
    assert(buf.position() == 48)
    buf.put("OHDR".getBytes)
    buf.put(2.toByte).put(0.toByte)        // version, flags (1-byte size)
    buf.put(38.toByte)                     // size of chunk 0
    //   link info v0: no creation index, dense storage undefined
    buf.put(0x02.toByte).putShort(18).put(0.toByte)
    buf.put(0.toByte).put(0.toByte); undef(); undef()
    //   hard link "y" -> dataset header @104
    buf.put(0x06.toByte).putShort(12).put(0.toByte)
    buf.put(1.toByte).put(0.toByte)        // version, flags (1-byte name len)
    buf.put(1.toByte).put('y'.toByte)
    buf.putLong(104L)
    buf.putInt(0)                          // checksum
    assert(buf.position() == 97)
    buf.put(new Array[Byte](7))            // free space to @104
    // ---- dataset OHDR @104: chunk0 = 120 (16+24+22+58)
    buf.put("OHDR".getBytes)
    buf.put(2.toByte).put(0.toByte)
    buf.put(120.toByte)
    //   dataspace v2: rank 1, simple, [4]
    buf.put(0x01.toByte).putShort(12).put(0.toByte)
    buf.put(2.toByte).put(1.toByte).put(0.toByte).put(1.toByte)
    buf.putLong(4L)
    //   datatype: IEEE f64 LE (same bit fields as the v1 fixture)
    def dtF64(): Unit = {
      buf.put(0x11.toByte).put(0x20.toByte).put(0x3F.toByte).put(0.toByte)
      buf.putInt(8)
      buf.putShort(0).putShort(64)
      buf.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte)
      buf.putInt(1023)
    }
    buf.put(0x03.toByte).putShort(20).put(0.toByte)
    dtF64()
    //   layout v3 contiguous @240 (v2 messages are NOT 8-padded)
    buf.put(0x08.toByte).putShort(18).put(0.toByte)
    buf.put(3.toByte).put(1.toByte)
    buf.putLong(240L).putLong(32L)
    //   attribute v3: scale_factor = 0.25 (name/dt/ds packed, no pad)
    buf.put(0x0C.toByte).putShort(54).put(0.toByte)
    buf.put(3.toByte).put(0.toByte)        // version, flags
    buf.putShort(13).putShort(20).putShort(4)
    buf.put(0.toByte)                      // name encoding: ASCII
    buf.put("scale_factor".getBytes).put(0.toByte)
    dtF64()
    buf.put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // scalar ds v2
    buf.putDouble(0.25)
    buf.putInt(0)                          // checksum
    assert(buf.position() == 235)
    buf.put(new Array[Byte](5))            // free space to @240
    // ---- data @240
    Seq(4.0, 8.0, 12.0, 16.0).foreach(buf.putDouble)
    assert(buf.position() == 272)
    val out = new java.io.FileOutputStream(p)
    try out.write(buf.array(), 0, buf.position())
    finally out.close()
    p
  }

  test("hand-written v2 superblock / OHDR / link-message file parses and reads") {
    val f = Nc4.readFile(handWrittenV2)
    assert(f.datasets.keySet === Set("y"))
    val ds = f.dataset("y")
    assert(ds.dims === Seq(4L))
    assert(ds.numAtt("scale_factor") === Some(0.25))
    assert(ds.layout === Nc4.Contiguous(240L, 32L))
    assert(Nc4.readAll(handWrittenV2, ds).toSeq === Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("non-HDF5 files are rejected by sniff and reader") {
    val p = tmp("not.h5")
    java.nio.file.Files.write(java.nio.file.Paths.get(p), "CDFjunk".getBytes)
    assert(!Nc4.isHdf5(p))
    val e = intercept[IllegalArgumentException](Nc4.readFile(p))
    assert(e.getMessage.contains("not an HDF5 file"))
  }

  for (packShort <- Seq(true, false); gzip <- Seq(true, false); shuffle <- Seq(false, true))
    test(s"writer/reader round-trip (packShort=$packShort, gzip=$gzip, shuffle=$shuffle)") {
      val p = tmp(s"rt_${packShort}_${gzip}_$shuffle.h5")
      val grid = SyntheticGrid.cleanSentinels(SyntheticGrid.generate(spark, spec))
      Nc4.write(grid, spec, p, packShort = packShort, gzip = gzip, shuffle = shuffle)
      val f = Nc4.readFile(p)
      assert(Nc4.gridSpecOf(f) === spec)
      val back = GridIngest.ingestNc4(spark, p)
      assert(back.count() ===
        spec.nLat.toLong * spec.nLon * spec.depths.size * spec.times.size)
      val tol = if (packShort) 5.01e-4 else 0.0
      val joined = back.as("a").join(grid.as("b"),
        Seq("time", "depth_idx", "lat_idx", "lon_idx"), "full")
      import org.apache.spark.sql.functions._
      val bad = joined.filter(
        (col("a.water_temp").isNull =!= col("b.water_temp").isNull) ||
        (col("a.salinity").isNull =!= col("b.salinity").isNull) ||
        abs(col("a.water_temp") - col("b.water_temp")) > tol ||
        abs(col("a.salinity") - col("b.salinity")) > tol).count()
      assert(bad === 0)
    }

  test("gzip actually compresses the fixture (filters are real, not pass-through)") {
    val pGz = tmp("gz.h5"); val pRaw = tmp("raw.h5")
    val grid = SyntheticGrid.cleanSentinels(SyntheticGrid.generate(spark, spec))
    Nc4.write(grid, spec, pGz, gzip = true)
    Nc4.write(grid, spec, pRaw, gzip = false)
    val (szGz, szRaw) = (new java.io.File(pGz).length, new java.io.File(pRaw).length)
    assert(szGz < szRaw, s"deflate fixture ($szGz B) not smaller than raw ($szRaw B)")
    val f = Nc4.readFile(pGz)
    assert(f.dataset("water_temp").filters.map(_.id) === Seq(1))
  }

  test("flagship over HDF5-ingested grid == flagship over GRD1-ingested grid") {
    val h5P = tmp("flag.h5"); val grdP = tmp("flag.grd1")
    val grid = SyntheticGrid.generate(spark, spec)
    Nc4.write(SyntheticGrid.cleanSentinels(grid), spec, h5P,
      packShort = false, gzip = true)
    GridIngest.Grd1.write(grid, spec, grdP)
    val track = TrackReader.readNhc(spark, "/root/repo/data/al092016_track.csv")
    def profile(df: org.apache.spark.sql.DataFrame) =
      TrackProfile.profile(track, df, spec).collect()
        .map(r => (r.getLong(0), r.getInt(3)) ->
          (Option(r.get(5)).map(_.asInstanceOf[Double]),
           Option(r.get(6)).map(_.asInstanceOf[Double]))).toMap
    val a = profile(GridIngest.ingestNc4(spark, h5P))
    val b = profile(GridIngest.ingest(spark, grdP))
    assert(a.size === 2000 && b.size === 2000)
    a.foreach { case (key, (t1, s1)) =>
      val (t2, s2) = b(key)
      assert(t1.isDefined === t2.isDefined && s1.isDefined === s2.isDefined, key)
      t1.zip(t2).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9, key) }
      s1.zip(s2).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9, key) }
    }
  }

  test("ingestToParquet sniffs HDF5 magic and lands the partitioned layout") {
    val p = tmp("sniff.h5")
    Nc4.write(SyntheticGrid.cleanSentinels(SyntheticGrid.generate(spark, spec)),
      spec, p, packShort = true, gzip = true)
    assert(Nc4.isHdf5(p) && !GridIngest.isNetcdf(p))
    val out = java.nio.file.Files.createTempDirectory("nc4pq").toString
    val gs = GridIngest.ingestToParquet(spark, p, out)
    assert(gs === spec)
    import org.apache.spark.sql.functions.col
    val scan = spark.read.parquet(out).filter(col("time") === spec.times.head)
    assert(scan.count() === spec.nLat.toLong * spec.nLon * spec.depths.size)
  }
}
