package graft.fn

import org.apache.spark.sql.catalyst.util.ArrayData

/** JVM kernels for embedding math, called from the native Catalyst
  * expressions in [[ArrayExpressions]] (VERDICT r2 item 1).
  *
  * Why static methods over [[ArrayData]]: Spark never codegens the
  * lambda body of a higher-order function — `aggregate(zip_with(...))`
  * walks an interpreted expression tree per element, per row, and at
  * 16 planes × 64 elements that tree-walk dominated the round-2 bench
  * (q74 7.8 s). A direct loop over the unsafe array's primitive slots
  * is JIT-compiled, allocation-free, and stays inside the whole-stage
  * codegen span as one static call — the same pattern as
  * [[GeoFns.vincentyKmScala]] / [[VincentyKm]].
  *
  * Null semantics exactly mirror the HOF formulation they replace
  * (`aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`): `zip_with` pads
  * the shorter array with nulls and a null element poisons the sum —
  * so the kernel returns null (boxed) when the lengths differ or any
  * element is null. Summation order is left-to-right, identical to the
  * fold and to DuckDB's LIST folds, so differential hashes stay exact.
  */
object VecKernels {

  /** Σ a(i)·b(i); null on length mismatch or any null element. */
  def dotBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** dot(a,b) / (√dot(a,a) · √dot(b,b)) in ONE pass; plain IEEE
    * division (zero norms yield NaN/Inf, same as the HOF expression it
    * replaces — no hidden null-masking). Null on length mismatch or
    * any null element.
    */
  def cosineBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    java.lang.Double.valueOf(ab / (math.sqrt(aa) * math.sqrt(bb)))
  }

  /** Fused quantized cosine: cos(a, q·scale) with the per-element
    * multiply INLINE — bit-identical to dequantize-then-cosine (same
    * ops, same order: y = int→double exact, ·scale, accumulate) but
    * with no intermediate array and no interpreted HOF lambda (the
    * dequantize `transform` walked ~64 interpreted evals per
    * CANDIDATE row — the q110 sf1 hot spot). Null on length mismatch
    * or null element.
    */
  def cosineQ8Boxed(a: ArrayData, q: ArrayData, scale: Double): java.lang.Double = {
    val n = a.numElements()
    if (q.numElements() != n) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || q.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = q.getInt(i).toDouble * scale
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    java.lang.Double.valueOf(ab / (math.sqrt(aa) * math.sqrt(bb)))
  }

  /** max(|x|)/127 — the symmetric int8 scale; skips null elements
    * (mirroring `array_max(transform(v, abs))`); null when the array
    * is empty or all-null. One compiled pass instead of an
    * interpreted abs-lambda plus a second array_max walk.
    */
  def int8ScaleBoxed(v: ArrayData): java.lang.Double = {
    val n = v.numElements()
    var m = java.lang.Double.NEGATIVE_INFINITY
    var seen = false
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val a = math.abs(v.getDouble(i))
        if (a > m) m = a
        seen = true
      }
      i += 1
    }
    if (!seen) null else java.lang.Double.valueOf(m / 127.0)
  }

  /** Symmetric int8 quantization: floor(x/scale + 0.5) clamped to
    * [−127, 127]; scale = 0 → all zeros. Numerically identical to the
    * HOF spelling (`greatest(-127, least(127, floor(x/s + 0.5)))`,
    * which the q93/q110 oracles replicate) with one compiled pass.
    * Null elements poison to null (zip semantics of the chain).
    */
  def quantizeInt8(v: ArrayData, scale: Double): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) out(i) = null // null element stays null, as in the HOF
      else if (scale == 0.0) out(i) = 0
      else {
        val f = math.floor(v.getDouble(i) / scale + 0.5)
        out(i) = math.max(-127.0, math.min(127.0, f)).toInt
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
