package graft.tools

import java.nio.file.{Files, Paths}

/** Golden-compare probe for the VP8 keyframe decoder: decodes each
  * data/vp8_golden/<name>.webp and diffs Y/U/V against libwebp's own
  * WebPDecodeYUV dump (<name>.yuv). Prints per-case mismatch counts
  * and the first differing pixel — the iteration loop while bringing
  * [[graft.ext.Vp8]] to per-pixel exactness (Vp8Spec pins the result).
  */
object Vp8Check {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(if (args.nonEmpty) args(0) else "data/vp8_golden")
    val index = new String(Files.readAllBytes(dir.resolve("index.txt")), "UTF-8")
    var pass = 0; var fail = 0
    for (line <- index.split("\n") if line.nonEmpty) {
      val Array(name, ws, hs, _) = line.split(",")
      val w = ws.toInt; val h = hs.toInt
      val webp = Files.readAllBytes(dir.resolve(name + ".webp"))
      val yuv = Files.readAllBytes(dir.resolve(name + ".yuv"))
      val wantMb = args.length > 1 && args(1) == name
      graft.ext.Vp8.debugNoFilter.set(args.contains("--nofilter"))
      if (wantMb) graft.ext.Vp8.debugMb.set(new java.util.ArrayList[String])
      val planes = graft.ext.Vp8.decodeWebpOrNull(webp)
      println(s"$name hdr: ${graft.ext.Vp8.lastHeader.get}")
      if (wantMb) {
        graft.ext.Vp8.debugMb.get.forEach(s => println(s"  $s"))
        graft.ext.Vp8.debugMb.remove()
        // per-MB luma diff map
        if (planes != null) {
          val mbW = (w + 15) / 16; val mbH = (h + 15) / 16
          for (my <- 0 until mbH) {
            val row = (0 until mbW).map { mx =>
              var n = 0
              for (yy <- my * 16 until math.min(h, my * 16 + 16);
                   xx <- mx * 16 until math.min(w, mx * 16 + 16))
                if (planes.y(yy * w + xx) != yuv(yy * w + xx)) n += 1
              f"$n%4d"
            }.mkString(" ")
            println(s"  mbdiff y=$my: $row")
          }
          println("  MB(0,0) luma diff mask:")
          for (yy <- 0 until math.min(16, h)) {
            val mask = (0 until math.min(16, w)).map(x =>
              if (planes.y(yy * w + x) == yuv(yy * w + x)) '.' else 'X').mkString
            println(s"    $mask")
          }
          for (yy <- 14 to 19) {
            def rowStr(src: (Int, Int) => Int) =
              (0 until math.min(w, 24)).map(x => f"${src(x, yy)}%3d").mkString(" ")
            println(s"  got y=$yy: ${rowStr((x, y) => planes.y(y * w + x) & 0xFF)}")
            println(s"  exp y=$yy: ${rowStr((x, y) => yuv(y * w + x) & 0xFF)}")
          }
        }
      }
      if (planes == null) { println(s"$name: DECODE NULL"); fail += 1 }
      else if (planes.w != w || planes.h != h) {
        println(s"$name: dims ${planes.w}x${planes.h} != ${w}x$h"); fail += 1
      } else {
        val uvW = (w + 1) / 2; val uvH = (h + 1) / 2
        def diff(got: Array[Byte], off: Int, pw: Int, ph: Int, label: String): Int = {
          var n = 0; var first = ""
          var i = 0
          while (i < pw * ph) {
            val g = got(i) & 0xFF
            val e = yuv(off + i) & 0xFF
            if (g != e) {
              n += 1
              if (n == 1) first = s" first@(${i % pw},${i / pw}) got=$g want=$e"
            }
            i += 1
          }
          if (n > 0) println(s"  $name/$label: $n/${pw * ph} diff$first")
          n
        }
        val bad = diff(planes.y, 0, w, h, "Y") +
          diff(planes.u, w * h, uvW, uvH, "U") +
          diff(planes.v, w * h + uvW * uvH, uvW, uvH, "V")
        if (bad == 0) { println(s"$name: OK"); pass += 1 }
        else fail += 1
      }
    }
    println(s"$pass pass, $fail fail")
    if (fail > 0) sys.exit(1)
  }
}
