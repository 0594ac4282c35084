package graft.ext

/** Vorbis floor-1 curve synthesis (Vorbis I §7.2.3 step 2 + §7.2.4 +
  * the §9.2.4–9.2.7 helpers) — the packet-INDEPENDENT half of floor
  * decode: given a parsed [[VorbisSetup.Floor1Cfg]] x-list and the
  * per-point Y values a packet decodes, reconstruct the integer floor
  * curve (amplitude indices 0..255) with the spec's exact integer
  * line rendering. Everything here is closed-form spec arithmetic
  * with no bitstream dependency, so it is hand-traceable — the
  * round-11 signal path (PLANS roadmap) plugs packet-decoded Y values
  * straight in; only the dB→linear conversion and the residue/MDCT
  * stages remain after this.
  */
object VorbisFloor {

  /** §9.2.4: position in `v[0,x)` of the GREATEST value less than
    * `v(x)` (the spec guarantees existence on floor-1 x-lists because
    * entry 0 is 0 and entry 1 is the maximum).
    */
  def lowNeighbor(v: Array[Int], x: Int): Int = {
    var best = -1
    var n = 0
    while (n < x) {
      if (v(n) < v(x) && (best == -1 || v(n) > v(best))) best = n
      n += 1
    }
    best
  }

  /** §9.2.5: position in `v[0,x)` of the LEAST value greater than
    * `v(x)`.
    */
  def highNeighbor(v: Array[Int], x: Int): Int = {
    var best = -1
    var n = 0
    while (n < x) {
      if (v(n) > v(x) && (best == -1 || v(n) < v(best))) best = n
      n += 1
    }
    best
  }

  /** §9.2.6: the integer point on the line through (x0,y0)-(x1,y1)
    * at X, truncating toward zero.
    */
  def renderPoint(x0: Int, y0: Int, x1: Int, y1: Int, x: Int): Int = {
    val dy = y1 - y0
    val adx = x1 - x0
    val ady = math.abs(dy)
    val err = ady * (x - x0)
    val off = err / adx
    if (dy < 0) y0 - off else y0 + off
  }

  /** §9.2.7: render the integer line segment into `v[x0, x1)` (the
    * spec's accumulating-error form — NOT a float Bresenham; the
    * truncation behavior is normative).
    */
  def renderLine(x0: Int, y0: Int, x1: Int, y1: Int, v: Array[Int]): Unit = {
    val dy = y1 - y0
    val adx = x1 - x0
    var ady = math.abs(dy)
    val base = dy / adx
    var x = x0
    var y = y0
    var err = 0
    val sy = if (dy < 0) base - 1 else base + 1
    ady -= math.abs(base) * adx
    if (x0 < v.length) v(x0) = y
    x = x0 + 1
    while (x < x1) {
      err += ady
      if (err >= adx) { err -= adx; y += sy }
      else y += base
      if (x < v.length) v(x) = y
      x += 1
    }
  }

  /** §7.2.3 step 2: turn packet-decoded Y values into final Y values
    * + step-2 flags. `range` is floor1_ranges[multiplier−1] ∈
    * {256, 128, 86, 64}. Returns (finalY, step2Flag); the X list is
    * the PARSE-ORDER list (entry 0 = 0, entry 1 = 2^rangebits).
    */
  def computeFinalY(xList: Array[Int], yList: Array[Int], range: Int)
      : (Array[Int], Array[Boolean]) = {
    val n = xList.length
    require(yList.length == n, "floor1: Y list length mismatch")
    val finalY = new Array[Int](n)
    val flag = new Array[Boolean](n)
    flag(0) = true; flag(1) = true
    finalY(0) = yList(0); finalY(1) = yList(1)
    var i = 2
    while (i < n) {
      val low = lowNeighbor(xList, i)
      val high = highNeighbor(xList, i)
      val predicted = clamp(renderPoint(xList(low), finalY(low),
        xList(high), finalY(high), xList(i)), range)
      val v = yList(i)
      val highroom = range - predicted
      val lowroom = predicted
      val room = math.min(highroom, lowroom) * 2
      if (v != 0) {
        flag(low) = true; flag(high) = true; flag(i) = true
        finalY(i) =
          if (v >= room) {
            if (highroom > lowroom) v - lowroom + predicted
            else predicted - v + highroom - 1
          } else if ((v & 1) == 1) predicted - ((v + 1) / 2)
          else predicted + v / 2
      } else {
        flag(i) = false
        finalY(i) = predicted
      }
      i += 1
    }
    (finalY, flag)
  }

  private def clamp(y: Int, range: Int): Int =
    if (y < 0) 0 else if (y > range - 1) range - 1 else y

  /** §7.2.4: the synthesized integer curve over `[0, n)` — amplitude
    * indices `finalY·multiplier` line-rendered between the step-2
    * points in X order, extended flat past the last point. Values are
    * in [0, 256) for conformant inputs (range·multiplier = 256).
    */
  def synthesizeCurve(xList: Array[Int], finalY: Array[Int],
                      step2: Array[Boolean], multiplier: Int, range: Int,
                      n: Int): Array[Int] = {
    val order = xList.indices.sortBy(xList(_))
    val curve = new Array[Int](n)
    // entry 0 is x = 0 and always step-2 flagged — it seeds the curve
    var lx = 0
    var ly = clamp(finalY(order.head), range) * multiplier
    for (j <- order.drop(1) if step2(j)) {
      val hx = xList(j)
      val hy = clamp(finalY(j), range) * multiplier
      if (hx > lx) renderLine(lx, ly, hx, hy, curve)
      lx = hx; ly = hy
    }
    // flat extension past the last rendered point (render_line wrote
    // up to lx − 1 of the final segment)
    var x = lx
    while (x < n) { curve(x) = ly; x += 1 }
    curve
  }
}
