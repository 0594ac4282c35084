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

  /** Per-ROW k-wide MinHash signature over word n-gram shingles —
    * bit-identical to `Dedup.minhashSignatures(shingleStream(…),
    * XxHasher)` (asserted by DedupSpec), but computed inside the
    * row's codegen span: content hash = xxhash64(shingle) (Catalyst's
    * exact string path, `XXH64.hashUTF8String` seed 42), derived
    * hash i = xxhash64(i, content) (seed-chained hashInt→hashLong,
    * Catalyst's multi-child order). Returns null when the text has
    * fewer than n words (the aggregate form emits no row there).
    *
    * This kernel is what makes signatures SHUFFLE-FREE (the aggregate
    * form pays an explode + groupBy) and streaming near-dup possible
    * at all: a signature per arriving document with no state.
    */
  def minhashSig(s: UTF8String, n: Int, k: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
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
    if (m <= 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(toks.get(j + t))
        t += 1
      }
      val prepared = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      var h = 0
      while (h < k) {
        val v = XXH64.hashLong(prepared, XXH64.hashInt(h, 42L))
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

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
