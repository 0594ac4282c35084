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

object BigramLmScore {
  /** Per-row interpolated bigram NLL (Jelinek-Mercer):
    * p(w_i | w_{i-1}) = λ·c(w_{i-1},w_i)/c(w_{i-1})
    *                  + (1−λ)·(c(w_i)+α)/(T+α·V);
    * the first token (no history) scores on the smoothed unigram
    * term alone. Operation order mirrors the SQL oracle EXACTLY:
    * (λ·bc)/pc + (1−λ)·(uc+α)/denom, both divisions left-assoc.
    * Bigram keys are "prev SPACE tok" (tokens never contain spaces
    * by construction of the tokenizer).
    */
  def score(s: UTF8String,
            uni: java.util.HashMap[String, java.lang.Long],
            bi: java.util.HashMap[String, java.lang.Long],
            total: Long, vocab: Long,
            alpha: Double, lambda: Double): GenericInternalRow = {
    val str = s.toString
    val len = str.length
    val denom = total.toDouble + alpha * vocab.toDouble
    var n = 0L
    var nll = 0.0
    var prev: String = null
    var i = 0
    while (i < len) {
      while (i < len && str.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && str.charAt(i) != ' ') i += 1
      if (i > start) {
        val tok = str.substring(start, i)
        val u = uni.get(tok)
        val uc = if (u == null) 0.0 else u.longValue().toDouble
        val uniTerm = (uc + alpha) / denom
        val p =
          if (prev == null) uniTerm
          else {
            val b = bi.get(prev + " " + tok)
            val bc = if (b == null) 0.0 else b.longValue().toDouble
            val pcRef = uni.get(prev)
            // prev was seen (it is a token of some doc); scoring a
            // FOREIGN doc against this LM may miss it -> pc = 0 means
            // no bigram evidence, fall back to the unigram term alone
            if (pcRef == null || pcRef.longValue() == 0L)
              (1.0 - lambda) * uniTerm
            else
              lambda * bc / pcRef.longValue().toDouble +
                (1.0 - lambda) * (uc + alpha) / denom
          }
        nll -= math.log(p)
        n += 1L
        prev = tok
      }
    }
    if (n == 0L) null
    else new GenericInternalRow(Array[Any](n, nll / n))
  }
}

/** SQL `bigram_nll(text)` — interpolated bigram LM scoring against
  * BROADCAST count tables ([[BigramLmScore.score]]). Same narrow
  * scale shape as [[UnigramNll]]: both models ride the expression
  * (the bigram table is corpus-distinct-bigram-sized — guarded by
  * the caller), scoring moves zero corpus bytes.
  */
case class BigramNll(child: Expression,
                     uni: Map[String, Long], bi: Map[String, Long],
                     total: Long, vocab: Long,
                     alpha: Double, lambda: Double)
  extends UnaryExpression with ExpectsInputTypes {

  require(total >= 0 && vocab >= 0, "total/vocab must be non-negative")
  require(alpha > 0, s"smoothing alpha must be positive, got $alpha")
  require(lambda >= 0 && lambda < 1,
    s"interpolation lambda must be in [0,1), got $lambda")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("avg_nll", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "bigram_nll"

  @transient private lazy val uniLookup: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](uni.size * 2)
    uni.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }
  @transient private lazy val biLookup: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](bi.size * 2)
    bi.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }

  override protected def nullSafeEval(s: Any): Any =
    BigramLmScore.score(s.asInstanceOf[UTF8String], uniLookup, biLookup,
      total, vocab, alpha, lambda)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val uniRef = ctx.addReferenceObj("lmUni", uniLookup, "java.util.HashMap")
    val biRef = ctx.addReferenceObj("lmBi", biLookup, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |org.apache.spark.sql.catalyst.expressions.GenericInternalRow ${ev.value}_r =
         |  graft.fn.BigramLmScore.score($s, $uniRef, $biRef, ${total}L, ${vocab}L,
         |    $alpha, $lambda);
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
