package graft.fn

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL `char_windows(text)` — the hash of every L-char window of the
  * row ([[TextKernels.charWindowHashes]]), the fingerprint stream of
  * exact-substring duplicate detection (Lee et al. 2022). A narrow
  * codegen expression: windows are hashed inside the scan's codegen
  * span, so the exchange that follows carries 8-byte hashes — never
  * the L-char substrings themselves (at L = 40 that is a 5×
  * shuffle-byte reduction before compression, and the only part of
  * this operator that touches every corpus byte stays on the scan
  * side).
  *
  * `xx = true` selects the xxhash64 production hasher (SQL
  * `char_windows_xx`): same windows, same positions, cheaper hash —
  * the md5 default exists for DuckDB oracle parity.
  */
case class CharWindowHashes(child: Expression, L: Int, xx: Boolean = false)
  extends UnaryExpression with ExpectsInputTypes {

  require(L >= 2, s"window length must be >= 2 chars, got $L")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = if (xx) "char_windows_xx" else "char_windows"

  override protected def nullSafeEval(s: Any): Any =
    TextKernels.charWindowHashes(s.asInstanceOf[UTF8String], L, xx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  graft.fn.TextKernels.charWindowHashes($s, $L, $xx);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Open-addressing primitive long set (load ≤ 0.5, linear probe) —
  * the broadcast side of the streaming substring-contamination
  * screen. Primitive arrays serialize flat; membership is one mix +
  * probe with no boxing.
  */
final class LongHashSet private (mask: Int, keys: Array[Long],
                                 used: Array[Boolean]) extends Serializable {
  def contains(h: Long): Boolean = {
    var slot = ((h ^ (h >>> 32)).toInt) & mask
    while (used(slot)) {
      if (keys(slot) == h) return true
      slot = (slot + 1) & mask
    }
    false
  }
  def size: Int = used.count(identity)
}

object LongHashSet {
  def apply(values: Array[Long]): LongHashSet = {
    var cap = 8
    while (cap < values.length * 2) cap <<= 1
    val mask = cap - 1
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    values.foreach { h =>
      var slot = ((h ^ (h >>> 32)).toInt) & mask
      while (used(slot) && keys(slot) != h) slot = (slot + 1) & mask
      keys(slot) = h; used(slot) = true
    }
    new LongHashSet(mask, keys, used)
  }
}

object CharWindowHitsKernel {
  /** (n_windows, hits) of the row's L-char windows against the
    * broadcast reference set; null when the text has no window.
    */
  def score(s: UTF8String, L: Int, xx: Boolean,
            set: LongHashSet): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val hs = TextKernels.charWindowHashes(s, L, xx)
    if (hs == null) return null
    var hits = 0L
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      if (set.contains(hs.getLong(i))) hits += 1L
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, hits))
  }
}

/** SQL `char_window_hits(text)` — per-row count of L-char windows
  * present in a BROADCAST reference window-hash set: the
  * exact-substring analog of the winnow decontamination screen, and
  * the stateless streaming face of [[graft.ext.SpanDedup]] (a gate
  * needs no corpus-wide state when the reference rides the plan —
  * the q119 lesson applies: the set is a `Broadcast` HANDLE, never
  * an embedded payload).
  */
case class CharWindowHits(child: Expression, L: Int, xx: Boolean,
                          set: org.apache.spark.broadcast.Broadcast[LongHashSet])
  extends UnaryExpression with ExpectsInputTypes {

  require(L >= 2, s"window length must be >= 2 chars, got $L")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_windows", LongType, nullable = false),
    StructField("hits", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = if (xx) "char_window_hits_xx" else "char_window_hits"

  override protected def nullSafeEval(s: Any): Any =
    CharWindowHitsKernel.score(s.asInstanceOf[UTF8String], L, xx, set.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("cwSet", set,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |org.apache.spark.sql.catalyst.expressions.GenericInternalRow ${ev.value}_r =
         |  graft.fn.CharWindowHitsKernel.score($s, $L, $xx,
         |    (graft.fn.LongHashSet) $setRef.value());
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SQL `strip_char_spans(text, starts, ends)` — remove the 1-based
  * inclusive char spans [starts(i), ends(i)] (sorted, non-overlapping)
  * from the text ([[TextKernels.stripCharSpans]]). The APPLY half of
  * exact-substring dedup: spans arrive as per-doc arrays (bounded by
  * doc length / span length — the same order as the text column), so
  * the rewrite is one compiled pass per row with no shuffle of its
  * own.
  */
case class StripCharSpans(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "strip_char_spans"

  override protected def nullSafeEval(s: Any, st: Any, en: Any): Any =
    TextKernels.stripCharSpans(s.asInstanceOf[UTF8String],
      st.asInstanceOf[ArrayData], en.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, st, en) =>
      s"""
         |${ev.value} = graft.fn.TextKernels.stripCharSpans($s, $st, $en);
       """.stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, sec: Expression, t: Expression): Expression =
    copy(first = f, second = sec, third = t)
}
