package graft.io

import java.io.{ByteArrayOutputStream, DataInputStream, EOFException, InputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.SyntheticGrid.GridSpec

/** Minimal OPeNDAP **DAP2** client (the protocol HYCOM GLBu serves and
  * the reference consumes through `netCDF4.Dataset(hycom_url)`,
  * /root/reference/trackplot_hycom.py:144,176-184), implemented
  * JDK-only from the published DAP 2.0 specification (ESE-RFC-004 /
  * the OPeNDAP "DAP/2.0" document):
  *
  *  - `{url}.dds`  — dataset descriptor (text grammar: atomic arrays
  *    and `Grid { ARRAY: … MAPS: … }` constructs);
  *  - `{url}.das`  — attribute tables (`scale_factor`, `add_offset`,
  *    `_FillValue`, the CF packing attributes);
  *  - `{url}.dods?var[hyperslab]…` — the DDS of the projected
  *    variables, the literal line `Data:`, then XDR-encoded values.
  *
  * XDR wire rules implemented (per spec): every atomic value is
  * big-endian and 4-byte aligned — `Byte` arrays are padded to a
  * multiple of 4, `Int16/UInt16` travel as 32-bit integers, arrays are
  * prefixed by their element count REPEATED TWICE (two identical
  * 32-bit counts), and a `Grid`'s payload is its array part followed
  * by each map vector in declaration order.
  *
  * Scale shape (mirrors [[GridIngest.ingestNc]] exactly): the DRIVER
  * fetches only the four coordinate axes (KB-scale); the (time, depth)
  * plane list then fans out over executors and EACH TASK issues its
  * own ranged `.dods` hyperslab request for its planes — the server
  * does the subsetting (that is OPeNDAP's whole point), the cluster
  * does the decode, and no grid byte ever passes through the driver.
  * At 100 TB-scale archives the per-task unit stays one
  * (time, depth) lat×lon plane (~tens of MB at GLBu 0.08°), the same
  * bound the Nc3/Nc4 paths guarantee.
  *
  * Guards: response bodies are size-capped (`maxBody`), connections
  * carry timeouts, and only http/https URIs are accepted — a survey
  * URL cannot point the reader at local files.
  */
object Dap2 {

  // ------------------------------------------------------- transport

  /** Fetch `uri` fully with caps. 64 MB default body cap: a GLBu 0.08°
    * lat×lon Int16 plane is ~18 MB; anything larger than the cap is a
    * mis-projected request, not data.
    */
  def fetch(uri: String, maxBody: Int = 64 << 20,
            timeoutMs: Int = 60000): Array[Byte] = {
    val u = URI.create(uri)
    require(u.getScheme == "http" || u.getScheme == "https",
      s"DAP2 endpoint must be http(s), got: $uri")
    val conn = u.toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn.setRequestProperty("Accept-Encoding", "identity")
    val in = conn.getInputStream
    try {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](64 << 10)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        require(out.size() <= maxBody,
          s"DAP2 response exceeds ${maxBody} bytes: $uri")
        n = in.read(buf)
      }
      out.toByteArray
    } finally {
      in.close()
      conn.disconnect()
    }
  }

  // ------------------------------------------------------- DDS model

  sealed trait DapType { def xdrWidth: Int }
  case object DByte extends DapType { val xdrWidth = 1 } // padded to 4 per array
  case object DInt16 extends DapType { val xdrWidth = 4 }
  case object DUInt16 extends DapType { val xdrWidth = 4 }
  case object DInt32 extends DapType { val xdrWidth = 4 }
  case object DUInt32 extends DapType { val xdrWidth = 4 }
  case object DFloat32 extends DapType { val xdrWidth = 4 }
  case object DFloat64 extends DapType { val xdrWidth = 8 }

  final case class DapDim(name: String, size: Int)

  /** An atomic array declaration (`Float64 lat[lat = 2001];`). A bare
    * scalar is an array with no dims.
    */
  final case class DapArray(dapType: DapType, name: String, dims: Seq[DapDim]) {
    def nElems: Long = dims.foldLeft(1L)(_ * _.size)
  }

  /** `Grid { ARRAY: <array> MAPS: <map vectors> } name;` */
  final case class DapGrid(name: String, array: DapArray, maps: Seq[DapArray])

  final case class Dds(name: String, arrays: Seq[DapArray], grids: Seq[DapGrid]) {
    def gridFor(v: String): Option[DapGrid] = grids.find(_.name == v)
    def arrayFor(v: String): Option[DapArray] = arrays.find(_.name == v)
    /** The data array of `v` whether it is declared bare or as a Grid. */
    def dataArray(v: String): DapArray =
      gridFor(v).map(_.array).orElse(arrayFor(v))
        .getOrElse(throw new IllegalArgumentException(
          s"variable $v not in DDS (${arrays.map(_.name) ++ grids.map(_.name)})"))
  }

  private val TypeNames: Map[String, DapType] = Map(
    "Byte" -> DByte, "Int16" -> DInt16, "UInt16" -> DUInt16,
    "Int32" -> DInt32, "UInt32" -> DUInt32,
    "Float32" -> DFloat32, "Float64" -> DFloat64)

  /** Parse the DDS text grammar (atomic arrays + Grids; the subset
    * every gridded OPeNDAP dataset uses). Tolerant of whitespace and
    * of constraint-projected DDS responses (which contain the same
    * grammar with fewer members).
    */
  def parseDds(text: String): Dds = {
    val body = text.trim
    require(body.startsWith("Dataset"),
      s"not a DDS (expected 'Dataset {…} name;'): ${body.take(60)}")
    val open = body.indexOf('{')
    val close = body.lastIndexOf('}')
    require(open >= 0 && close > open, "unbalanced DDS braces")
    val name = body.substring(close + 1).replace(";", "").trim
    val inner = body.substring(open + 1, close)
    val arrays = Seq.newBuilder[DapArray]
    val grids = Seq.newBuilder[DapGrid]
    var rest = inner.trim
    while (rest.nonEmpty) {
      if (rest.startsWith("Grid")) {
        val gOpen = rest.indexOf('{')
        val gClose = matchBrace(rest, gOpen)
        val gBody = rest.substring(gOpen + 1, gClose)
        val semi = rest.indexOf(';', gClose)
        val gName = rest.substring(gClose + 1, semi).trim
        val arrayIdx = gBody.indexOf("ARRAY:")
        val mapsIdx = gBody.indexOf("MAPS:")
        require(arrayIdx >= 0 && mapsIdx > arrayIdx,
          s"Grid $gName missing ARRAY:/MAPS: sections")
        val arr = parseDecls(gBody.substring(arrayIdx + 6, mapsIdx)) match {
          case Seq(a) => a
          case other => throw new IllegalArgumentException(
            s"Grid $gName ARRAY section must hold exactly one array, got ${other.size}")
        }
        grids += DapGrid(gName, arr, parseDecls(gBody.substring(mapsIdx + 5)))
        rest = rest.substring(semi + 1).trim
      } else {
        val semi = rest.indexOf(';')
        require(semi >= 0, s"missing ';' in DDS near: ${rest.take(40)}")
        parseDecls(rest.substring(0, semi + 1)).foreach(arrays += _)
        rest = rest.substring(semi + 1).trim
      }
    }
    Dds(name, arrays.result(), grids.result())
  }

  private def matchBrace(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '{' => depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException("unbalanced braces in DDS")
  }

  private val DeclRe =
    """(?s)\s*(\w+)\s+([\w.\-]+)\s*((?:\[[^\]]*\])*)\s*;""".r
  private val DimRe = """\[\s*(?:([\w.\-]+)\s*=\s*)?(\d+)\s*\]""".r

  private def parseDecls(s: String): Seq[DapArray] =
    DeclRe.findAllMatchIn(s).map { m =>
      val t = TypeNames.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"unsupported DAP type ${m.group(1)}"))
      val dims = DimRe.findAllMatchIn(m.group(3)).map { d =>
        DapDim(Option(d.group(1)).getOrElse(""), d.group(2).toInt)
      }.toSeq
      DapArray(t, m.group(2), dims)
    }.toSeq

  // ------------------------------------------------------- DAS model

  /** Per-variable attribute map: name → (attribute → first value as
    * string). Numeric use sites parse on demand.
    */
  def parseDas(text: String): Map[String, Map[String, String]] = {
    val out = Map.newBuilder[String, Map[String, String]]
    val body = text.trim
    val open = body.indexOf('{')
    val close = body.lastIndexOf('}')
    require(body.startsWith("Attributes") && open > 0 && close > open,
      s"not a DAS: ${body.take(40)}")
    var rest = body.substring(open + 1, close).trim
    val VarRe = """(?s)^([\w.\-]+)\s*\{""".r
    while (rest.nonEmpty) {
      VarRe.findFirstMatchIn(rest) match {
        case Some(m) =>
          val vOpen = rest.indexOf('{')
          val vClose = matchBrace(rest, vOpen)
          val atts = rest.substring(vOpen + 1, vClose)
          val AttRe = """(?m)^\s*\w+\s+([\w.\-]+)\s+("?[^;"]*"?)\s*;""".r
          out += m.group(1) -> AttRe.findAllMatchIn(atts).map { a =>
            a.group(1) -> a.group(2).stripPrefix("\"").stripSuffix("\"")
          }.toMap
          rest = rest.substring(vClose + 1).trim
        case None =>
          throw new IllegalArgumentException(
            s"unparseable DAS near: ${rest.take(40)}")
      }
    }
    out.result()
  }

  // ------------------------------------------------------ DODS (XDR)

  /** Decoded values of one projected variable, flattened row-major. */
  final case class DodsVar(array: DapArray, values: Array[Double])

  /** Parse a `.dods` response: the projected DDS, the `Data:` marker
    * line, then XDR arrays in DDS declaration order. Returns variables
    * by name (a Grid contributes its data array AND its maps).
    */
  def parseDods(bytes: Array[Byte]): Map[String, DodsVar] = {
    // the marker is the first "\nData:\n" in the BYTE stream — DDS text
    // is 7-bit, so a byte scan is exact
    val marker = "\nData:\n".getBytes(StandardCharsets.US_ASCII)
    val at = indexOf(bytes, marker)
    require(at >= 0, "DODS response missing Data: marker")
    val dds = parseDds(new String(bytes, 0, at, StandardCharsets.US_ASCII))
    val in = new DataInputStream(new java.io.ByteArrayInputStream(
      bytes, at + marker.length, bytes.length - at - marker.length))
    val out = Map.newBuilder[String, DodsVar]
    def readArray(a: DapArray): Unit = out += a.name -> DodsVar(a, readXdrArray(in, a))
    dds.arrays.foreach(readArray)
    dds.grids.foreach { g =>
      readArray(g.array)
      g.maps.foreach(readArray)
    }
    out.result()
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private def readXdrArray(in: DataInputStream, a: DapArray): Array[Double] = {
    val expected = a.nElems
    require(expected <= Int.MaxValue, s"array ${a.name} too large")
    val n =
      if (a.dims.isEmpty) 1
      else {
        val c1 = in.readInt()
        val c2 = in.readInt()
        require(c1 == c2, s"XDR array counts disagree for ${a.name}: $c1 vs $c2")
        require(c1.toLong == expected,
          s"XDR count $c1 != DDS shape product $expected for ${a.name}")
        c1
      }
    val out = new Array[Double](n)
    a.dapType match {
      case DByte =>
        val raw = new Array[Byte](n)
        in.readFully(raw)
        var pad = (4 - (n % 4)) % 4
        while (pad > 0) { in.readByte(); pad -= 1 }
        var i = 0
        while (i < n) { out(i) = raw(i) & 0xff; i += 1 }
      case DInt16 | DInt32 =>
        var i = 0
        while (i < n) { out(i) = in.readInt(); i += 1 }
      case DUInt16 | DUInt32 =>
        var i = 0
        while (i < n) { out(i) = in.readInt().toLong & 0xffffffffL; i += 1 }
      case DFloat32 =>
        var i = 0
        while (i < n) { out(i) = in.readFloat(); i += 1 }
      case DFloat64 =>
        var i = 0
        while (i < n) { out(i) = in.readDouble(); i += 1 }
    }
    out
  }

  // ----------------------------------------------------- axes + spec

  /** Fetch one 1-D axis variable via a `.dods` projection. */
  def fetchAxis(url: String, axis: String): Array[Double] = {
    val vars = parseDods(fetch(s"$url.dods?$axis"))
    vars.getOrElse(axis, throw new IllegalArgumentException(
      s"axis $axis absent from DODS response (${vars.keySet})")).values
  }

  /** Driver-side dataset probe: axes → [[GridSpec]] (uniform lat/lon
    * enforced, the [[Nc3.gridSpecOf]] contract).
    */
  def gridSpecOf(url: String,
                 timeVar: String = "time", depthVar: String = "depth",
                 latVar: String = "lat", lonVar: String = "lon"): GridSpec = {
    val times = fetchAxis(url, timeVar).map(math.round).toSeq
    val depths = fetchAxis(url, depthVar).toSeq
    val lats = fetchAxis(url, latVar)
    val lons = fetchAxis(url, lonVar)
    def uniformStep(a: Array[Double], what: String): Double = {
      if (a.length < 2) return 1.0
      val step = a(1) - a(0)
      a.sliding(2).foreach { w =>
        require(math.abs((w(1) - w(0)) - step) < 1e-6, s"$what axis not uniform")
      }
      step
    }
    GridSpec(lats.head, uniformStep(lats, "lat"), lats.length,
      lons.head, uniformStep(lons, "lon"), lons.length, depths, times)
  }

  /** CF packed-value decoder: `raw == fill → null`, else
    * `raw * scale + offset` (attributes default to identity packing).
    */
  final case class CfDecode(scale: Double, offset: Double, fill: Option[Double])
      extends Serializable {
    def decode(raw: Double): java.lang.Double =
      if (fill.exists(_ == raw)) null
      else java.lang.Double.valueOf(raw * scale + offset)
  }

  def cfDecodeOf(das: Map[String, Map[String, String]], v: String): CfDecode = {
    val atts = das.getOrElse(v, Map.empty)
    CfDecode(
      atts.get("scale_factor").map(_.toDouble).getOrElse(1.0),
      atts.get("add_offset").map(_.toDouble).getOrElse(0.0),
      atts.get("_FillValue").map(_.toDouble))
  }

  // --------------------------------------------------------- ingest

  /** Ingest a remote DAP2 grid dataset into the engine's long-format
    * grid schema — the same output as [[GridIngest.ingestNc]], so the
    * whole track-profile pipeline runs unchanged against a live
    * OPeNDAP endpoint.
    *
    * Driver work: 3 tiny text fetches (DDS, DAS) + 4 axis fetches.
    * Distributed work: one `.dods` hyperslab request per
    * (time, depth, measure) PLANE per task — the unit that keeps task
    * input bounded by one lat×lon plane regardless of archive size.
    */
  def ingest(spark: SparkSession, url: String, partitions: Int = 32,
             tempVar: String = "water_temp",
             salVar: String = "salinity"): DataFrame = {
    import spark.implicits._
    val dds = parseDds(new String(fetch(s"$url.dds"), StandardCharsets.US_ASCII))
    val das = parseDas(new String(fetch(s"$url.das"), StandardCharsets.US_ASCII))
    val spec = gridSpecOf(url)
    val tArr = dds.dataArray(tempVar)
    val sArr = dds.dataArray(salVar)
    require(tArr.dims.map(_.size) == Seq(spec.times.size, spec.depths.size,
        spec.nLat, spec.nLon),
      s"$tempVar dims ${tArr.dims.map(_.size)} don't match axes " +
        s"(${spec.times.size}, ${spec.depths.size}, ${spec.nLat}, ${spec.nLon})")
    require(sArr.dims.map(_.size) == tArr.dims.map(_.size),
      s"$salVar/$tempVar shapes differ")
    val tDec = cfDecodeOf(das, tempVar)
    val sDec = cfDecodeOf(das, salVar)
    val times = spec.times; val depths = spec.depths
    val nD = depths.size
    val nLat = spec.nLat; val nLon = spec.nLon
    val planeCells = nLat * nLon
    val (latMin, latStep, lonMin, lonStep) =
      (spec.latMin, spec.latStep, spec.lonMin, spec.lonStep)
    val nSlabs = times.size * nD
    spark.range(0, nSlabs, 1, math.min(partitions, nSlabs))
      .as[Long]
      .mapPartitions { slabIds =>
        slabIds.flatMap { slab =>
          val t = (slab / nD).toInt
          val d = (slab % nD).toInt
          val slice = s"[$t][$d][0:${nLat - 1}][0:${nLon - 1}]"
          val tv = parseDods(fetch(s"$url.dods?$tempVar$slice"))(tempVar).values
          val sv = parseDods(fetch(s"$url.dods?$salVar$slice"))(salVar).values
          require(tv.length == planeCells && sv.length == planeCells,
            s"plane $slice returned ${tv.length}/${sv.length} cells, expected $planeCells")
          (0 until planeCells).iterator.map { c =>
            val y = c / nLon
            val x = c % nLon
            (times(t), d, depths(d),
              y, latMin + y * latStep,
              x, lonMin + x * lonStep,
              tDec.decode(tv(c)), sDec.decode(sv(c)))
          }
        }
      }
      .toDF("time", "depth_idx", "depth", "lat_idx", "lat",
        "lon_idx", "lon", "water_temp", "salinity")
  }
}
