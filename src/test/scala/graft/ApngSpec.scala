package graft

import graft.ext.{Apng, Multimodal, Png}
import org.apache.spark.sql.functions._

/** Animated-PNG frame decode: the in-test encoder writes real APNG
  * bytes (zlib via Deflater, CRC'd chunks) with known pixel values,
  * so every expectation below is hand-computed arithmetic — no
  * reference decoder in the loop.
  */
class ApngSpec extends SparkSpec {

  // ---------- minimal APNG encoder (test fixture) ----------

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Filter-0 RGBA scanlines for a w×h region, pixel (x,y) → (r,g,b,a). */
  private def rgbaRaw(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int, Int)): Array[Byte] = {
    val out = new Array[Byte]((1 + w * 4) * h)
    for (y <- 0 until h) {
      val row = y * (1 + w * 4)
      out(row) = 0 // filter None
      for (x <- 0 until w) {
        val (r, g, b, a) = px(x, y)
        val o = row + 1 + x * 4
        out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = b.toByte; out(o + 3) = a.toByte
      }
    }
    out
  }

  private case class Fr(w: Int, h: Int, x: Int, y: Int,
                        px: (Int, Int) => (Int, Int, Int, Int),
                        delayNum: Int = 1, delayDen: Int = 25,
                        dispose: Int = 0, blend: Int = 0)

  private def fcTL(seq: Int, f: Fr): Array[Byte] =
    chunk("fcTL", be32(seq) ++ be32(f.w) ++ be32(f.h) ++ be32(f.x) ++ be32(f.y) ++
      Array(((f.delayNum >> 8) & 0xFF).toByte, (f.delayNum & 0xFF).toByte,
        ((f.delayDen >> 8) & 0xFF).toByte, (f.delayDen & 0xFF).toByte,
        f.dispose.toByte, f.blend.toByte))

  /** Assemble an APNG: frame 0 rides the default IDAT, the rest fdAT. */
  private def apng(w: Int, h: Int, frames: Seq[Fr]): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdr = chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 6, 0, 0, 0))
    val actl = chunk("acTL", be32(frames.length) ++ be32(0))
    var seq = 0
    val body = frames.zipWithIndex.flatMap { case (f, i) =>
      val ctl = fcTL(seq, f); seq += 1
      val data = deflate(rgbaRaw(f.w, f.h)(f.px))
      val dat =
        if (i == 0) chunk("IDAT", data)
        else { val c = chunk("fdAT", be32(seq) ++ data); seq += 1; c }
      ctl ++ dat
    }.toArray
    sig ++ ihdr ++ actl ++ body ++ chunk("IEND", Array.empty[Byte])
  }

  private def const(r: Int, g: Int, b: Int, a: Int = 255): (Int, Int) => (Int, Int, Int, Int) =
    (_, _) => (r, g, b, a)

  private def lum(r: Int, g: Int, b: Int): Double = 0.299 * r + 0.587 * g + 0.114 * b

  // ---------- kernel tests ----------

  test("constant full-canvas frames: exact means, timeline, frame count") {
    val bytes = apng(16, 16, Seq(
      Fr(16, 16, 0, 0, const(200, 100, 50)),
      Fr(16, 16, 0, 0, const(0, 0, 255)),
      Fr(16, 16, 0, 0, const(255, 255, 255))))
    val f = Apng.frameFeaturesOrNull(bytes, 16, 1, 256)
    assert(f != null && f.length === 3)
    // [frame_idx, t_ms, mean/255, std/255, 16-bin hist]
    assert(f(0).length === 2 + 2 + 16)
    assert(f.map(_(0)).toSeq === Seq(0.0, 1.0, 2.0))
    assert(f.map(_(1)).toSeq === Seq(0.0, 40.0, 80.0)) // 1/25 s per frame
    assert(math.abs(f(0)(2) - lum(200, 100, 50) / 255) < 1e-12)
    assert(math.abs(f(1)(2) - lum(0, 0, 255) / 255) < 1e-12)
    assert(math.abs(f(2)(2) - 1.0) < 1e-12)
    // constant frame → std 0 (sqrt amplifies fp cancellation in
    // s2/n − mean², so the bound is loose relative to the mean's)
    assert(f.forall(r => math.abs(r(3)) < 1e-5))
    // white frame: all mass in the last histogram bucket
    assert(math.abs(f(2)(2 + 2 + 15) - 1.0) < 1e-12)
  }

  test("region frame composites onto the running canvas (SOURCE)") {
    val bytes = apng(16, 16, Seq(
      Fr(16, 16, 0, 0, const(100, 100, 100)),
      Fr(8, 8, 4, 4, const(200, 200, 200)))) // 64 of 256 px overwritten
    val f = Apng.frameFeaturesOrNull(bytes, 16, 1, 256)
    assert(f != null && f.length === 2)
    assert(math.abs(f(0)(2) - 100.0 / 255) < 1e-12)
    assert(math.abs(f(1)(2) - (192 * 100.0 + 64 * 200.0) / 256 / 255) < 1e-12)
  }

  test("OVER blend alpha-composites against the existing canvas") {
    val bytes = apng(8, 8, Seq(
      Fr(8, 8, 0, 0, const(0, 0, 0)),                      // opaque black
      Fr(8, 8, 0, 0, const(255, 255, 255, 128), blend = 1))) // half-alpha white OVER
    val f = Apng.frameFeaturesOrNull(bytes, 16, 1, 256)
    assert(f != null && f.length === 2)
    // out = 255·(128/255) + 0·(1−128/255) = 128, oa = 1
    assert(math.abs(f(1)(2) - 128.0 / 255) < 1e-12)
  }

  test("dispose BACKGROUND clears the region for the NEXT frame") {
    val bytes = apng(16, 16, Seq(
      Fr(16, 16, 0, 0, const(100, 100, 100), dispose = 1),
      Fr(8, 8, 0, 0, const(200, 200, 200))))
    val f = Apng.frameFeaturesOrNull(bytes, 16, 1, 256)
    assert(f != null && f.length === 2)
    // frame 0 snapshot PRE-dispose: full gray
    assert(math.abs(f(0)(2) - 100.0 / 255) < 1e-12)
    // frame 1: canvas cleared (transparent black → lum 0), region repainted
    assert(math.abs(f(1)(2) - 64 * 200.0 / 256 / 255) < 1e-12)
  }

  test("dispose PREVIOUS reverts the region after the frame") {
    val bytes = apng(16, 16, Seq(
      Fr(16, 16, 0, 0, const(100, 100, 100)),
      Fr(8, 8, 4, 4, const(250, 250, 250), dispose = 2),
      Fr(2, 2, 0, 0, const(100, 100, 100)))) // tiny repaint, same value
    val f = Apng.frameFeaturesOrNull(bytes, 16, 1, 256)
    assert(f != null && f.length === 3)
    assert(math.abs(f(1)(2) - (192 * 100.0 + 64 * 250.0) / 256 / 255) < 1e-12)
    // frame 2: PREVIOUS restored the gray canvas → uniform 100 again
    assert(math.abs(f(2)(2) - 100.0 / 255) < 1e-12)
  }

  test("stride sampling and maxFrames cap; stub-profile rejections") {
    val frames = (0 until 6).map(i => Fr(8, 8, 0, 0, const(40 * i, 40 * i, 40 * i)))
    val bytes = apng(8, 8, frames)
    val sampled = Apng.frameFeaturesOrNull(bytes, 4, 2, 256)
    assert(sampled.map(_(0)).toSeq === Seq(0.0, 2.0, 4.0))
    // t_ms still reflects the FULL timeline (intermediate frames decoded)
    assert(sampled.map(_(1)).toSeq === Seq(0.0, 80.0, 160.0))
    val capped = Apng.frameFeaturesOrNull(bytes, 4, 1, 2)
    assert(capped.map(_(0)).toSeq === Seq(0.0, 1.0))
    // a plain still PNG (no acTL) is NOT an animation
    val kmz = "/root/reference/Hermine/nhc_test_data/al092016_best_track.kmz"
    if (new java.io.File(kmz).exists()) {
      val zin = new java.util.zip.ZipInputStream(new java.io.FileInputStream(kmz))
      val still = Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .find(_.getName.endsWith("cat1_nhemi.png")).map(_ => zin.readAllBytes())
      still.foreach(b => assert(Apng.frameFeaturesOrNull(b, 16, 1, 256) == null))
      zin.close()
    }
    assert(Apng.frameFeaturesOrNull(Array[Byte](1, 2, 3), 16, 1, 256) == null)
    assert(Apng.frameFeaturesOrNull(bytes.dropRight(30), 16, 1, 256) == null) // truncated
    assert(Apng.frameFeaturesOrNull(null, 16, 1, 256) == null)
  }

  test("frame 0 features match the still-image PNG decoder on the same payload") {
    // APNG's default image IS frame 0 here — the two decoders must agree
    val bytes = apng(12, 9, Seq(
      Fr(12, 9, 0, 0, (x, y) => (x * 20, y * 25, (x + y) * 10, 255)),
      Fr(12, 9, 0, 0, const(7, 7, 7))))
    val still = Png.grayFeaturesOrNull(bytes, 16)
    val anim = Apng.frameFeaturesOrNull(bytes, 16, 1, 256)
    assert(still != null && anim != null)
    assert(anim(0).drop(2).toSeq === still.toSeq)
  }

  test("oversized animation canvas is rejected (4M-pixel cap, not a 2GB alloc)") {
    // a few-hundred-byte payload declaring a 16000x4000 canvas would
    // allocate w*h*32 bytes before any frame data is validated
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdr = chunk("IHDR", be32(16000) ++ be32(4000) ++ Array[Byte](8, 6, 0, 0, 0))
    val actl = chunk("acTL", be32(1) ++ be32(0))
    val ctl = fcTL(0, Fr(1, 1, 0, 0, null))
    val idat = chunk("IDAT", deflate(rgbaRaw(1, 1)(const(0, 0, 0))))
    val bytes = sig ++ ihdr ++ actl ++ ctl ++ idat ++ chunk("IEND", Array.empty[Byte])
    assert(Apng.frameFeaturesOrNull(bytes, 16, 1, 256) == null)
  }

  test("still decoder rejects zlib-bomb shapes: oversized dims and infeasible IDAT") {
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val tinyDat = chunk("IDAT", deflate(rgbaRaw(1, 1)(const(0, 0, 0))))
    // 25M pixels > the 16M still cap — rejected on dims alone
    val big = sig ++ chunk("IHDR", be32(5000) ++ be32(5000) ++ Array[Byte](8, 6, 0, 0, 0)) ++
      tinyDat ++ chunk("IEND", Array.empty[Byte])
    assert(Png.grayFeaturesOrNull(big, 16) == null)
    // 4096×4096 is inside the cap, but a few-byte IDAT cannot inflate
    // to the ~67 MB raw buffer (deflate max ~1032:1) — the feasibility
    // guard must reject it BEFORE the allocation
    val infeasible = sig ++ chunk("IHDR", be32(4096) ++ be32(4096) ++ Array[Byte](8, 6, 0, 0, 0)) ++
      tinyDat ++ chunk("IEND", Array.empty[Byte])
    assert(Png.grayFeaturesOrNull(infeasible, 16) == null)
  }

  test("crafted fcTL geometry near 2^31 is rejected, not indexed out of bounds") {
    // fx + fw = 2^30 + 2^30 wraps to Int.MinValue — a 32-bit bounds
    // check would pass it and the paint loop would index off the
    // canvas; the long-arith check must return null instead
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdr = chunk("IHDR", be32(16) ++ be32(16) ++ Array[Byte](8, 6, 0, 0, 0))
    val actl = chunk("acTL", be32(1) ++ be32(0))
    val evil = fcTL(0, Fr(1 << 30, 1 << 30, 1 << 30, 0, null))
    val idat = chunk("IDAT", deflate(rgbaRaw(16, 16)(const(1, 2, 3))))
    val bytes = sig ++ ihdr ++ actl ++ evil ++ idat ++ chunk("IEND", Array.empty[Byte])
    assert(Apng.frameFeaturesOrNull(bytes, 16, 1, 256) == null)
  }

  // ---------- Spark surface ----------

  test("SQL surface: apng_frame_features callable after install") {
    import spark.implicits._
    GraftExtensions.install(spark)
    val anim = apng(8, 8, Seq(
      Fr(8, 8, 0, 0, const(50, 50, 50)),
      Fr(8, 8, 0, 0, const(150, 150, 150)),
      Fr(8, 8, 0, 0, const(250, 250, 250))))
    Seq(Tuple1(anim)).toDF("content").createOrReplaceTempView("apng_assets")
    val rows = spark.sql(
      """SELECT f[0] AS frame_idx, f[2] AS mean
        |FROM apng_assets
        |LATERAL VIEW explode(apng_frame_features(content, 4, 2, 256)) t AS f
        |ORDER BY frame_idx""".stripMargin).collect()
    assert(rows.map(_.getDouble(0)).toSeq === Seq(0.0, 2.0))
    assert(math.abs(rows(0).getDouble(1) - 50.0 / 255) < 1e-12)
    assert(math.abs(rows(1).getDouble(1) - 250.0 / 255) < 1e-12)
  }

  test("withApngFrames: exploded rows, payload dropped, codegen expression") {
    import spark.implicits._
    val anim = apng(16, 16, Seq(
      Fr(16, 16, 0, 0, const(10, 10, 10)),
      Fr(16, 16, 0, 0, const(20, 20, 20)),
      Fr(16, 16, 0, 0, const(30, 30, 30))))
    val still = apng(8, 8, Seq(Fr(8, 8, 0, 0, const(1, 2, 3)))).patch(
      // surgically drop acTL (chunk 2: 8+25 .. +20) → a still PNG
      33, Seq.empty[Byte], 20)
    // file-backed table: a literal local DataFrame constant-folds the
    // whole expression into LocalTableScan, voiding the plan assert
    val tmp = java.nio.file.Files.createTempDirectory("apng_assets").toString
    Seq(("vid.apng", anim), ("img.png", still),
      ("junk.bin", Array[Byte](9, 9, 9))).toDF("entry", "content")
      .write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    val out = Multimodal.withApngFrames(df, nBins = 4, stride = 2)
    val rows = out.select($"entry", $"frame_idx", $"t_ms", $"features")
      .orderBy($"frame_idx").collect()
    assert(rows.forall(_.getString(0) == "vid.apng")) // non-APNG rows vanish
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 2))
    assert(rows.map(_.getDouble(2)).toSeq === Seq(0.0, 80.0))
    val feats = rows.map(_.getSeq[Double](3))
    assert(feats.forall(_.length === 2 + 4))
    assert(math.abs(feats(0).head - 10.0 / 255) < 1e-12)
    assert(math.abs(feats(1).head - 30.0 / 255) < 1e-12)
    assert(!out.columns.contains("content")) // payload dropped pre-explode
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("apng_frame_features"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    // the still PNG still decodes on the STILL path
    val stillFeats = Multimodal.withPngFeatures(df.filter($"entry" === "img.png"))
      .select($"features").as[Seq[Double]].collect()
    assert(stillFeats.length === 1 && stillFeats.head != null)
  }
}
