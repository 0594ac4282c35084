package graft.fn

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel for word n-gram shingling, called from
  * [[WordShingles]] (q67 shuffle diet, VERDICT r2 item 6).
  *
  * Semantics are EXACTLY `split(text, ' ')` + `array_remove(_, "")` +
  * sliding n-gram join-with-single-space — the formulation the Dedup
  * module (and its DuckDB oracle SQL) define — but computed in one
  * pass per row instead of posexplode + lead-window, which cost a
  * full shuffle+sort of the token stream (the round-2 pipeline's
  * single most expensive stage). Output order is document order;
  * duplicates are kept (minhash `min` is idempotent; set consumers
  * add `distinct`).
  */
object TextKernels {

  private val Empty = new GenericArrayData(new Array[Any](0))

  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    val toks = new java.util.ArrayList[String]
    var i = 0
    while (i < len) {
      while (i < len && str.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && str.charAt(i) != ' ') i += 1
      if (i > start) toks.add(str.substring(start, i))
    }
    val m = toks.size - n + 1
    if (m <= 0) return Empty
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(j + k))
        k += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }
}
