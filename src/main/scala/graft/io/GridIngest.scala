package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.SyntheticGrid.GridSpec

/** S4: real grid ingestion — dense 4-D model array → long-format
  * time-partitioned parquet (SURVEY.md §2.1 S4, §7.2 phase 3).
  *
  * The reference reads a remote netCDF 4-D array via OPeNDAP hyperslab
  * requests (`trackplot_hycom.py:144,244`). TWO container formats feed
  * the same slab-parallel distribution here, sniffed by magic in
  * [[ingestToParquet]]:
  *  - **NetCDF-3 classic** ([[Nc3]], [[ingestNc]]) — the REAL public
  *    format HYCOM publishes, parsed JDK-only (header + CF
  *    short-packing + _FillValue);
  *  - **GRD1** ([[ingest]]) — a minimal dense binary layout kept as
  *    the round-trip fixture format and generator target.
  *
  * ==GRD1 layout (big-endian)==
  * {{{
  *   magic   "GRD1"                      4 bytes
  *   nT, nD, nLat, nLon                  4 × int32
  *   times   nT × int64                  hours since 2000-01-01T00Z
  *   depths  nD × float64                meters, positive down
  *   latMin, latStep, lonMin, lonStep    4 × float64
  *   water_temp  nT·nD·nLat·nLon × float64, row-major [t][d][y][x]
  *   salinity    nT·nD·nLat·nLon × float64, same order
  * }}}
  * Missing cells hold the fill value -30000.0 (netCDF `_FillValue`
  * convention) and are decoded to SQL null at ingest — NaN never
  * enters the engine (SURVEY.md §7.4 trap 1).
  *
  * ==Scale design==
  * The file is NOT read as one blob: [[ingest]] reads the small header
  * driver-side, then `spark.range` over (t, d) slabs fans the byte
  * ranges out across the cluster — each task seeks directly to its
  * slab (one contiguous read per variable), the distributed analog of
  * the reference's per-point hyperslab requests but issued once per
  * slab instead of 9× per track point. On a cluster the
  * `RandomAccessFile` becomes any seekable stream (HDFS/S3 ranged
  * GET); the slab math is unchanged. Output goes through
  * [[SyntheticGrid.writeGrid]] → parquet partitioned by `time`,
  * sorted by (lat_idx, lon_idx) within files, so downstream queries
  * get partition pruning + row-group skipping instead of re-touching
  * the dense array.
  */
object GridIngest {

  val Fill: Double = -30000.0
  private val Magic = 0x47524431 // "GRD1"

  final case class Grd1Header(spec: GridSpec, headerBytes: Long) {
    def nT: Int = spec.times.size
    def nD: Int = spec.depths.size
    def cellsPerSlab: Long = spec.nLat.toLong * spec.nLon
    def varBlockBytes: Long = nT * nD * cellsPerSlab * 8
  }

  object Grd1 {

    def readHeader(path: String): Grd1Header = {
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(new java.io.FileInputStream(path)))
      try {
        require(in.readInt() == Magic, s"$path: not a GRD1 file")
        val nT = in.readInt(); val nD = in.readInt()
        val nLat = in.readInt(); val nLon = in.readInt()
        val times = Seq.fill(nT)(in.readLong())
        val depths = Seq.fill(nD)(in.readDouble())
        val latMin = in.readDouble(); val latStep = in.readDouble()
        val lonMin = in.readDouble(); val lonStep = in.readDouble()
        val headerBytes = 4L + 4 * 4 + nT * 8L + nD * 8L + 4 * 8L
        Grd1Header(
          GridSpec(latMin, latStep, nLat, lonMin, lonStep, nLon, depths, times),
          headerBytes)
      } finally in.close()
    }

    /** Fixture/dev writer: dump a long-format grid DataFrame (the
      * [[SyntheticGrid]] shape) to GRD1. Driver-side collect — a test
      * utility for small fixtures, NOT an operator (the engine's sink
      * is parquet; GRD1 exists to exercise the ingest path).
      */
    def write(grid: DataFrame, spec: GridSpec, path: String): Unit = {
      val nT = spec.times.size; val nD = spec.depths.size
      val n = nT.toLong * nD * spec.nLat * spec.nLon
      require(n < Int.MaxValue / 2, "Grd1.write is a small-fixture utility")
      val temp = Array.fill(n.toInt)(Fill)
      val sal = Array.fill(n.toInt)(Fill)
      val tIdx = spec.times.zipWithIndex.toMap
      grid.select("time", "depth_idx", "lat_idx", "lon_idx", "water_temp", "salinity")
        .collect()
        .foreach { r =>
          val t = tIdx(r.getLong(0)); val d = r.getInt(1)
          val y = r.getInt(2); val x = r.getInt(3)
          val off = (((t.toLong * nD + d) * spec.nLat + y) * spec.nLon + x).toInt
          if (!r.isNullAt(4)) temp(off) = r.getDouble(4)
          if (!r.isNullAt(5)) sal(off) = r.getDouble(5)
        }
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(path)))
      try {
        out.writeInt(Magic)
        out.writeInt(nT); out.writeInt(nD)
        out.writeInt(spec.nLat); out.writeInt(spec.nLon)
        spec.times.foreach(out.writeLong)
        spec.depths.foreach(out.writeDouble)
        out.writeDouble(spec.latMin); out.writeDouble(spec.latStep)
        out.writeDouble(spec.lonMin); out.writeDouble(spec.lonStep)
        temp.foreach(out.writeDouble)
        sal.foreach(out.writeDouble)
      } finally out.close()
    }
  }

  /** Ingest a GRD1 file into the long-format grid schema
    * (Schemas.gridSchema), fill values decoded to null. Slab-parallel:
    * one task reads one or more contiguous (t, d) planes.
    */
  def ingest(spark: SparkSession, path: String, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    val hdr = Grd1.readHeader(path)
    val spec = hdr.spec
    val nSlabs = hdr.nT * hdr.nD
    val slabCells = hdr.cellsPerSlab.toInt
    val rows = spark.range(0, nSlabs, 1, math.min(partitions, nSlabs))
      .as[Long]
      .mapPartitions { slabIds =>
        val raf = new java.io.RandomAccessFile(path, "r")
        // one fd per task — close it when the task ends (success OR
        // failure); without this, fds leak until executor GC and long
        // sessions eventually hit the open-file limit
        org.apache.spark.TaskContext.get().addTaskCompletionListener[Unit](
          _ => raf.close())
        val tempBuf = new Array[Byte](slabCells * 8)
        val salBuf = new Array[Byte](slabCells * 8)
        slabIds.flatMap { slab =>
          val t = (slab / hdr.nD).toInt
          val d = (slab % hdr.nD).toInt
          val slabOff = slab * slabCells * 8
          raf.seek(hdr.headerBytes + slabOff)
          raf.readFully(tempBuf)
          raf.seek(hdr.headerBytes + hdr.varBlockBytes + slabOff)
          raf.readFully(salBuf)
          val tb = java.nio.ByteBuffer.wrap(tempBuf)
          val sb = java.nio.ByteBuffer.wrap(salBuf)
          (0 until slabCells).iterator.map { c =>
            val y = c / spec.nLon
            val x = c % spec.nLon
            val wt = tb.getDouble(c * 8)
            val sa = sb.getDouble(c * 8)
            (spec.times(t), d, spec.depths(d),
              y, spec.latMin + y * spec.latStep,
              x, spec.lonMin + x * spec.lonStep,
              if (wt == Fill) None else Some(wt),
              if (sa == Fill) None else Some(sa))
          }
        }
      }
      .toDF("time", "depth_idx", "depth", "lat_idx", "lat",
        "lon_idx", "lon", "water_temp", "salinity")
    rows
  }

  /** Ingest a NetCDF-3 classic file (the reference's REAL container —
    * trackplot_hycom.py:144) into the long-format grid schema. Same
    * slab-parallel distribution as the GRD1 path: the KB-scale header
    * and axes are parsed driver-side, then each task seeks straight to
    * its (t, d) planes via [[Nc3.SlabReader]] — CF short-packing
    * (scale/offset) and `_FillValue` → null are decoded per cell,
    * exactly what the HYCOM files publish.
    */
  def ingestNc(spark: SparkSession, path: String, partitions: Int = 32,
               tempVar: String = "water_temp",
               salVar: String = "salinity"): DataFrame = {
    import spark.implicits._
    val hdr = Nc3.readHeader(path)
    val spec = Nc3.gridSpecOf(path, hdr)
    val nD = spec.depths.size
    val planeCells = spec.nLat * spec.nLon
    val tempR = Nc3.slabReaderOf(hdr, hdr.variable(tempVar), nD, planeCells)
    val salR = Nc3.slabReaderOf(hdr, hdr.variable(salVar), nD, planeCells)
    val times = spec.times; val depths = spec.depths
    val nLon = spec.nLon
    val (latMin, latStep, lonMin, lonStep) =
      (spec.latMin, spec.latStep, spec.lonMin, spec.lonStep)
    val nSlabs = times.size * nD
    spark.range(0, nSlabs, 1, math.min(partitions, nSlabs))
      .as[Long]
      .mapPartitions { slabIds =>
        val raf = new java.io.RandomAccessFile(path, "r")
        // close the per-task fd at task end (see `ingest` — same leak)
        org.apache.spark.TaskContext.get().addTaskCompletionListener[Unit](
          _ => raf.close())
        val tBuf = new Array[Byte](tempR.planeBytes)
        val sBuf = new Array[Byte](salR.planeBytes)
        slabIds.flatMap { slab =>
          val t = (slab / nD).toInt
          val d = (slab % nD).toInt
          val tb = tempR.readPlane(raf, t, d, tBuf)
          val sb = salR.readPlane(raf, t, d, sBuf)
          (0 until planeCells).iterator.map { c =>
            val y = c / nLon
            val x = c % nLon
            (times(t), d, depths(d),
              y, latMin + y * latStep,
              x, lonMin + x * lonStep,
              tempR.dec.decode(tb, c),
              salR.dec.decode(sb, c))
          }
        }
      }
      .toDF("time", "depth_idx", "depth", "lat_idx", "lat",
        "lon_idx", "lon", "water_temp", "salinity")
  }

  /** Magic-byte format sniff: NetCDF classic (`CDF\x01`/`\x02`) or
    * GRD1.
    */
  def isNetcdf(path: String): Boolean = {
    val in = new java.io.FileInputStream(path)
    try {
      val b = new Array[Byte](4); in.read(b)
      b(0) == 'C' && b(1) == 'D' && b(2) == 'F' && (b(3) == 1 || b(3) == 2)
    } finally in.close()
  }

  /** Full ingestion job: grid file (NetCDF-3 classic or GRD1, sniffed
    * by magic) → sentinel cleanup → canonical time-partitioned parquet
    * grid (ready for TrackProfile).
    */
  def ingestToParquet(spark: SparkSession, gridPath: String,
                      parquetPath: String): GridSpec = {
    val (spec, df) =
      if (isNetcdf(gridPath)) {
        val hdr = Nc3.readHeader(gridPath)
        (Nc3.gridSpecOf(gridPath, hdr), ingestNc(spark, gridPath))
      } else
        (Grd1.readHeader(gridPath).spec, ingest(spark, gridPath))
    SyntheticGrid.writeGrid(SyntheticGrid.cleanSentinels(df), parquetPath)
    spec
  }
}
