package graft.fn

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object BpeKernel {
  /** Encode one text: whitespace words → characters → merge
    * lowest-rank-first (leftmost on position ties) until no adjacent
    * pair remains in the rank table. `ranks` maps "left right" →
    * rank. Shared by eval and codegen.
    */
  def encode(s: UTF8String,
             ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val str = s.toString
    val len = str.length
    val out = new java.util.ArrayList[UTF8String]
    var i = 0
    while (i < len) {
      while (i < len && str.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && str.charAt(i) != ' ') i += 1
      if (i > start) encodeWord(str.substring(start, i), ranks, out)
    }
    val arr = new Array[Any](out.size)
    var o = 0
    while (o < arr.length) { arr(o) = out.get(o); o += 1 }
    new GenericArrayData(arr)
  }

  private def encodeWord(word: String,
                         ranks: java.util.HashMap[String, Integer],
                         out: java.util.ArrayList[UTF8String]): Unit = {
    var segs = new java.util.ArrayList[String](word.length)
    // initial segments are CODE POINTS, not UTF-16 units: a
    // supplementary-plane character (emoji) must start as ONE segment
    // — both the trainer's dictionary split and the q112 oracle's
    // DuckDB length()/[] indexing count code points, so a surrogate
    // split here would diverge on non-BMP text
    var c = 0
    while (c < word.length) {
      val n = Character.charCount(word.codePointAt(c))
      segs.add(word.substring(c, c + n))
      c += n
    }
    var done = segs.size < 2
    while (!done) {
      // lowest-rank adjacent pair, leftmost on ties
      var bestRank = Integer.MAX_VALUE
      var bestPos = -1
      var p = 0
      while (p < segs.size - 1) {
        val r = ranks.get(segs.get(p) + " " + segs.get(p + 1))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); bestPos = p }
        p += 1
      }
      if (bestPos < 0) done = true
      else {
        segs.set(bestPos, segs.get(bestPos) + segs.get(bestPos + 1))
        segs.remove(bestPos + 1)
        if (segs.size < 2) done = true
      }
    }
    var q = 0
    while (q < segs.size) { out.add(UTF8String.fromString(segs.get(q))); q += 1 }
  }
}

/** SQL `bpe_encode(text)` — BPE subword tokens under a learned merge
  * table ([[graft.ext.Bpe]]). The ranks ride the expression into the
  * scan span (vocabulary-merge-sized, same order as any broadcast
  * dim), so tokenizing a 100 TB corpus is embarrassingly parallel
  * and moves zero corpus bytes.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_encode"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + " " + r, Integer.valueOf(i))
    }
    m
  }

  override protected def nullSafeEval(s: Any): Any =
    BpeKernel.encode(s.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |${ev.value} = graft.fn.BpeKernel.encode($s, $ranksRef);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
