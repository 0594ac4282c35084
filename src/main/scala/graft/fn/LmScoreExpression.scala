package graft.fn

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object LmScore {
  /** Per-row add-α unigram negative log-likelihood:
    * nll(doc) = Σ_tok −ln((c(tok)+α)/(T+α·V)) / n_toks. Returns
    * (n_toks, avg_nll) or null for token-less docs. Shared by eval
    * and codegen.
    */
  def score(s: UTF8String, counts: java.util.HashMap[String, java.lang.Long],
            total: Long, vocab: Long, alpha: Double): GenericInternalRow = {
    val str = s.toString
    val len = str.length
    val denom = total.toDouble + alpha * vocab.toDouble
    var n = 0L
    var nll = 0.0
    var i = 0
    while (i < len) {
      while (i < len && str.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && str.charAt(i) != ' ') i += 1
      if (i > start) {
        val c = counts.get(str.substring(start, i))
        val cnt = if (c == null) 0.0 else c.longValue().toDouble
        nll -= math.log((cnt + alpha) / denom)
        n += 1L
      }
    }
    if (n == 0L) null
    else new GenericInternalRow(Array[Any](n, nll / n))
  }
}

/** SQL `lm_nll(text)` — per-document add-α unigram language-model
  * score against a BROADCAST vocabulary (the CCNet-style LM quality
  * signal: high perplexity under an in-domain LM flags
  * boilerplate/garbled text). Returns
  * `struct<n_toks: long, avg_nll: double>`; perplexity is
  * `exp(avg_nll)`.
  *
  * Scale shape: the model (tok → count) rides the expression into
  * every task — vocabulary-sized, the same order as any broadcast
  * dim — and scoring is then a NARROW per-row loop inside the scan's
  * codegen span: scoring 100 TB of documents moves zero corpus
  * bytes. [[graft.ext.LangModel]] guards the broadcast size and
  * falls back to the join form for unbounded vocabularies.
  */
case class UnigramNll(child: Expression, counts: Map[String, Long],
                      total: Long, vocab: Long, alpha: Double)
  extends UnaryExpression with ExpectsInputTypes {

  require(total >= 0 && vocab >= 0, "total/vocab must be non-negative")
  require(alpha > 0, s"smoothing alpha must be positive, got $alpha")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("avg_nll", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "lm_nll"

  @transient private lazy val lookup: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](counts.size * 2)
    counts.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }

  override protected def nullSafeEval(s: Any): Any =
    LmScore.score(s.asInstanceOf[UTF8String], lookup, total, vocab, alpha)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("lmCounts", lookup, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |org.apache.spark.sql.catalyst.expressions.GenericInternalRow ${ev.value}_r =
         |  graft.fn.LmScore.score($s, $mapRef, ${total}L, ${vocab}L, $alpha);
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
