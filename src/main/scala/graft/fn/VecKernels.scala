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
}
