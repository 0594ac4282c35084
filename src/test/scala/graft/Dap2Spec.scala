package graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.io.Dap2

/** DAP2 client against an in-process OPeNDAP server fixture: a JDK
  * HttpServer that serves a synthetic 4-D grid (DDS/DAS text, XDR
  * DODS with real server-side hyperslab subsetting). Exercises the
  * full remote path end-to-end — URL → axes → chunk-parallel plane
  * fetch → long-format frame — cell-for-cell against the generating
  * formula, plus wire-format units (Int16-as-32-bit XDR, doubled
  * array counts, byte padding, fill→null CF decode).
  */
class Dap2Spec extends SparkSpec {

  // tiny but non-degenerate axes: 2 times x 3 depths x 4 lats x 5 lons
  private val times = Seq(730120L, 730121L)
  private val depths = Seq(0.0, 10.0, 25.0)
  private val lats = (0 until 4).map(10.0 + _ * 0.5)
  private val lons = (0 until 5).map(270.0 + _ * 0.5)
  private val Fill = -30000
  private val Scale = 0.001
  private val Offset = 20.0

  /** raw Int16 value at (t, d, y, x); one cell per plane is fill. */
  private def raw(t: Int, d: Int, y: Int, x: Int): Int =
    if (y == 1 && x == 2) Fill
    else t * 1000 + d * 100 + y * 10 + x

  private def dds(projection: Option[String]): String = {
    def gridDecl(v: String) =
      s"""    Grid {
         |     ARRAY:
         |        Int16 $v[time = 2][depth = 3][lat = 4][lon = 5];
         |     MAPS:
         |        Float64 time[time = 2];
         |        Float64 depth[depth = 3];
         |        Float64 lat[lat = 4];
         |        Float64 lon[lon = 5];
         |    } $v;""".stripMargin
    // Seq of pairs: declaration ORDER is part of the DODS wire
    // contract (values follow DDS order), a Map would scramble it
    val all = Seq(
      "time" -> "    Float64 time[time = 2];",
      "depth" -> "    Float64 depth[depth = 3];",
      "lat" -> "    Float64 lat[lat = 4];",
      "lon" -> "    Float64 lon[lon = 5];",
      "water_temp" -> gridDecl("water_temp"),
      "salinity" -> gridDecl("salinity"))
    val members = projection match {
      case None => all.map(_._2)
      case Some(p) =>
        val v = p.takeWhile(_ != '[')
        // a projected GRID hyperslab degenerates to a bare array of
        // the sliced shape (what real servers return for array slices)
        if (v == "water_temp" || v == "salinity") {
          val slicedDims = sliceDims(p)
          Seq(s"    Int16 $v" + slicedDims.map { case (n, s) => s"[$n = $s]" }
            .mkString + ";")
        } else Seq(all.toMap.apply(v))
    }
    s"Dataset {\n${members.mkString("\n")}\n} fixture;\n"
  }

  private val DimNames = Seq("time", "depth", "lat", "lon")
  private val DimSizes = Seq(2, 3, 4, 5)

  /** Parse "[a:b]" / "[i]" hyperslabs of a projection into
    * (dimName, size) pairs.
    */
  private def sliceDims(p: String): Seq[(String, Int)] = {
    val rs = ranges(p)
    rs.zipWithIndex.map { case ((lo, hi), i) => (DimNames(i), hi - lo + 1) }
  }

  private def ranges(p: String): Seq[(Int, Int)] = {
    val re = """\[(\d+)(?::(\d+))?\]""".r
    val rs = re.findAllMatchIn(p).map { m =>
      val lo = m.group(1).toInt
      val hi = Option(m.group(2)).map(_.toInt).getOrElse(lo)
      (lo, hi)
    }.toSeq
    if (rs.isEmpty) DimSizes.map(s => (0, s - 1)) else rs
  }

  private def xdrInts(out: DataOutputStream, vals: Seq[Int]): Unit = {
    out.writeInt(vals.size); out.writeInt(vals.size)
    vals.foreach(out.writeInt)
  }

  private def xdrDoubles(out: DataOutputStream, vals: Seq[Double]): Unit = {
    out.writeInt(vals.size); out.writeInt(vals.size)
    vals.foreach(out.writeDouble)
  }

  private def dodsBody(projection: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(dds(Some(projection)).getBytes(StandardCharsets.US_ASCII))
    bos.write("\nData:\n".getBytes(StandardCharsets.US_ASCII))
    val out = new DataOutputStream(bos)
    val v = projection.takeWhile(_ != '[')
    v match {
      case "time" => xdrDoubles(out, times.map(_.toDouble))
      case "depth" => xdrDoubles(out, depths)
      case "lat" => xdrDoubles(out, lats)
      case "lon" => xdrDoubles(out, lons)
      case "water_temp" | "salinity" =>
        val Seq((t0, t1), (d0, d1), (y0, y1), (x0, x1)) = ranges(projection)
        val vals = for {
          t <- t0 to t1; d <- d0 to d1; y <- y0 to y1; x <- x0 to x1
        } yield {
          val r = raw(t, d, y, x)
          if (v == "salinity" && r != Fill) r + 7 else r
        }
        xdrInts(out, vals)
      case other => fail(s"fixture server got unexpected projection: $other")
    }
    out.flush()
    bos.toByteArray
  }

  private val das: String =
    """Attributes {
      |    water_temp {
      |        Int16 _FillValue -30000;
      |        Float64 scale_factor 0.001;
      |        Float64 add_offset 20.0;
      |        String units "degC";
      |    }
      |    salinity {
      |        Int16 _FillValue -30000;
      |        Float64 scale_factor 0.001;
      |        Float64 add_offset 20.0;
      |    }
      |}""".stripMargin

  private def withServer[A](f: String => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val query = Option(ex.getRequestURI.getQuery).getOrElse("")
      val body: Array[Byte] =
        if (path.endsWith(".dds"))
          dds(None).getBytes(StandardCharsets.US_ASCII)
        else if (path.endsWith(".das"))
          das.getBytes(StandardCharsets.US_ASCII)
        else if (path.endsWith(".dods"))
          dodsBody(query)
        else Array.emptyByteArray
      ex.sendResponseHeaders(if (body.isEmpty) 404 else 200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/hycom/fixture")
    finally server.stop(0)
  }

  test("DDS parser: grids, maps, dims; DAS parser: packing attributes") {
    val d = Dap2.parseDds(dds(None))
    assert(d.name === "fixture")
    assert(d.arrays.map(_.name) === Seq("time", "depth", "lat", "lon"))
    val g = d.gridFor("water_temp").get
    assert(g.array.dapType === Dap2.DInt16)
    assert(g.array.dims.map(_.size) === Seq(2, 3, 4, 5))
    assert(g.maps.map(_.name) === Seq("time", "depth", "lat", "lon"))
    val a = Dap2.parseDas(das)
    assert(a("water_temp")("scale_factor").toDouble === 0.001)
    assert(a("water_temp")("_FillValue").toDouble === -30000.0)
    assert(a("water_temp")("units") === "degC")
  }

  test("XDR wire units: doubled counts, Int16-as-32-bit, byte padding") {
    // hand-build a DODS body for a Byte array of 5 (needs 3 pad bytes)
    val ddsTxt = "Dataset {\n    Byte b[b = 5];\n} t;\n"
    val bos = new ByteArrayOutputStream()
    bos.write(ddsTxt.getBytes(StandardCharsets.US_ASCII))
    bos.write("\nData:\n".getBytes(StandardCharsets.US_ASCII))
    val out = new DataOutputStream(bos)
    out.writeInt(5); out.writeInt(5)
    out.write(Array[Byte](1, 2, 3, 4, 5))
    out.write(Array[Byte](0, 0, 0)) // XDR pad to multiple of 4
    out.writeInt(99) // trailing garbage must not be consumed as data
    out.flush()
    val got = Dap2.parseDods(bos.toByteArray)("b").values
    assert(got.toSeq === Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    // mismatched doubled counts must fail loudly
    val bad = new ByteArrayOutputStream()
    bad.write(ddsTxt.getBytes(StandardCharsets.US_ASCII))
    bad.write("\nData:\n".getBytes(StandardCharsets.US_ASCII))
    val bo = new DataOutputStream(bad)
    bo.writeInt(5); bo.writeInt(4); bo.flush()
    assertThrows[IllegalArgumentException](Dap2.parseDods(bad.toByteArray))
  }

  test("end-to-end: URL -> spec -> chunk-parallel ingest, cell-for-cell") {
    withServer { url =>
      val spec = Dap2.gridSpecOf(url)
      assert(spec.times === times)
      assert(spec.depths === depths)
      assert(spec.nLat === 4 && spec.latMin === 10.0 && spec.latStep === 0.5)
      assert(spec.nLon === 5 && spec.lonMin === 270.0 && spec.lonStep === 0.5)

      val df = Dap2.ingest(spark, url, partitions = 3)
      val rows = df.collect()
      assert(rows.length === 2 * 3 * 4 * 5)
      val byKey = rows.map { r =>
        (r.getLong(0), r.getInt(1), r.getInt(3), r.getInt(5)) ->
          (Option(r.get(7)).map(_.asInstanceOf[Double]),
            Option(r.get(8)).map(_.asInstanceOf[Double]))
      }.toMap
      for (t <- 0 until 2; d <- 0 until 3; y <- 0 until 4; x <- 0 until 5) {
        val (wt, sal) = byKey((times(t), d, y, x))
        if (y == 1 && x == 2) {
          assert(wt.isEmpty && sal.isEmpty) // fill -> null, both measures
        } else {
          val r = raw(t, d, y, x)
          assert(math.abs(wt.get - (r * Scale + Offset)) < 1e-9)
          assert(math.abs(sal.get - ((r + 7) * Scale + Offset)) < 1e-9)
        }
      }
      // lat/lon reconstruction from indices
      val r0 = rows.find(r => r.getInt(3) == 2 && r.getInt(5) == 3).get
      assert(r0.getDouble(4) === 11.0) // 10.0 + 2*0.5
      assert(r0.getDouble(6) === 271.5) // 270.0 + 3*0.5
    }
  }

  test("guards: non-http scheme and oversized body are refused") {
    assertThrows[IllegalArgumentException](
      Dap2.fetch("file:///etc/passwd"))
    withServer { url =>
      assertThrows[IllegalArgumentException](
        Dap2.fetch(s"$url.dds", maxBody = 4))
    }
  }
}
