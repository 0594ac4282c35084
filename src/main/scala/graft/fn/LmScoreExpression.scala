package graft.fn

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Immutable open-addressing token-count map: UTF-8 byte-string keys
  * probed by xxhash64 with a full byte comparison on hash hits, so a
  * 64-bit collision cannot return a foreign count. Built once per
  * expression from the broadcast `Map[String, Long]`; lookups in the
  * per-row scoring loop then cost one hash of the token's byte range
  * plus a primitive array probe — no `String` materialization, no
  * boxing, no `String.hashCode` re-walk (the boxed
  * `HashMap[String, Long]` this replaces paid all three per token and
  * held q102/q109 at 4× the oracle engine at BOTH sf1 and sf10).
  * Missing keys return -1 (counts are non-negative).
  */
final class TokenCountMap private[fn] (mask: Int, hashes: Array[Long],
                                       keys: Array[Array[Byte]],
                                       vals: Array[Long]) extends Serializable {

  def get(bytes: Array[Byte], off: Int, len: Int, hash: Long): Long = {
    var slot = ((hash ^ (hash >>> 32)).toInt) & mask
    while (true) {
      val k = keys(slot)
      if (k == null) return -1L
      if (hashes(slot) == hash && k.length == len) {
        var p = 0
        while (p < len && k(p) == bytes(off + p)) p += 1
        if (p == len) return vals(slot)
      }
      slot = (slot + 1) & mask
    }
    -1L // unreachable
  }

  /** Serialize as ONE flat buffer instead of a millions-of-byte[]
    * object graph: task binaries carry every `addReferenceObj` of the
    * plan, and default Java serialization of a multi-million-entry
    * map (per-object headers, reference table) was the dominant cost
    * of trigram-model scoring jobs — not the lookups, not the build.
    * Slots serialize in place, so deserialization is a straight
    * array fill with NO rehash.
    */
  private def writeReplace(): AnyRef = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(mask)
    var i = 0
    while (i <= mask) {
      val k = keys(i)
      if (k == null) out.writeInt(-1)
      else {
        out.writeInt(k.length)
        out.write(k)
        out.writeLong(hashes(i))
        out.writeLong(vals(i))
      }
      i += 1
    }
    out.close()
    new TokenCountMapProxy(bos.toByteArray)
  }
}

/** Flat-buffer serialization proxy of [[TokenCountMap]]. */
final class TokenCountMapProxy(val blob: Array[Byte]) extends Serializable {
  private def readResolve(): AnyRef = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(blob))
    val mask = in.readInt()
    val hashes = new Array[Long](mask + 1)
    val keys = new Array[Array[Byte]](mask + 1)
    val vals = new Array[Long](mask + 1)
    var i = 0
    while (i <= mask) {
      val len = in.readInt()
      if (len >= 0) {
        val k = new Array[Byte](len)
        in.readFully(k)
        keys(i) = k
        hashes(i) = in.readLong()
        vals(i) = in.readLong()
      }
      i += 1
    }
    in.close()
    new TokenCountMap(mask, hashes, keys, vals)
  }
}

object TokenCountMap {
  /** Seed of the probe hash — internal to the map (both build and
    * lookup sides use it), so any constant works; 42 keeps the
    * engine-wide convention.
    */
  val Seed = 42L

  def hashRange(bytes: Array[Byte], off: Int, len: Int): Long =
    XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + off, len, Seed)

  /** Mutable builder with a known size hint — one allocation, no
    * intermediate collection. The n-gram model path builds multi-
    * million-entry maps straight from collected count rows; the
    * former rows → `Map[String, Long]` → rehash pipeline was the
    * dominant cost of Stupid-Backoff model prep at sf10 (an
    * immutable-Map build plus a full second hash pass, both
    * discarded immediately).
    */
  final class Builder(sizeHint: Int) {
    private var cap = 8
    while (cap < sizeHint * 2) cap <<= 1
    private val mask = cap - 1
    private val hashes = new Array[Long](cap)
    private val keys = new Array[Array[Byte]](cap)
    private val vals = new Array[Long](cap)
    private var n = 0

    /** Insert the space-joined UTF-8 key of `parts` (pre-encoded). */
    def put(parts: Array[Array[Byte]], v: Long): Unit = {
      var klen = parts.length - 1
      var i = 0
      while (i < parts.length) { klen += parts(i).length; i += 1 }
      val kb = new Array[Byte](klen)
      var pos = 0
      i = 0
      while (i < parts.length) {
        if (i > 0) { kb(pos) = ' '; pos += 1 }
        System.arraycopy(parts(i), 0, kb, pos, parts(i).length)
        pos += parts(i).length
        i += 1
      }
      val h = hashRange(kb, 0, kb.length)
      var slot = ((h ^ (h >>> 32)).toInt) & mask
      while (keys(slot) != null && !(hashes(slot) == h &&
        java.util.Arrays.equals(keys(slot), kb))) slot = (slot + 1) & mask
      if (keys(slot) == null) {
        // size check only on a NEW slot — updating an existing key in
        // a builder filled to its hint needs no capacity
        require(n < sizeHint, s"builder sized for $sizeHint entries")
        n += 1
      }
      hashes(slot) = h; keys(slot) = kb; vals(slot) = v
    }

    def result(): TokenCountMap = new TokenCountMap(mask, hashes, keys, vals)
  }

  /** Build straight from collected count rows: `nKeyCols` leading
    * string columns (joined by single spaces — the kernel key
    * convention) followed by the long count.
    */
  def fromRows(rows: Array[org.apache.spark.sql.Row], nKeyCols: Int): TokenCountMap = {
    val b = new Builder(math.max(1, rows.length))
    val parts = new Array[Array[Byte]](nKeyCols)
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      var c = 0
      while (c < nKeyCols) {
        parts(c) = r.getString(c).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        c += 1
      }
      b.put(parts, r.getLong(nKeyCols))
      i += 1
    }
    b.result()
  }

  def apply(m: Map[String, Long]): TokenCountMap = {
    val b = new Builder(math.max(1, m.size))
    val parts = new Array[Array[Byte]](1)
    m.foreach { case (s, v) =>
      parts(0) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      b.put(parts, v)
    }
    b.result()
  }
}

object LmScore {
  /** Per-row add-α unigram negative log-likelihood:
    * nll(doc) = Σ_tok −ln((c(tok)+α)/(T+α·V)) / n_toks. Returns
    * (n_toks, avg_nll) or null for token-less docs. Shared by eval
    * and codegen. Tokenizes over the document's UTF-8 bytes (0x20
    * never occurs inside a multi-byte sequence, so the byte split
    * equals the char split) and looks counts up by byte range — the
    * loop allocates nothing per token.
    */
  def score(s: UTF8String, counts: TokenCountMap,
            total: Long, vocab: Long, alpha: Double): GenericInternalRow = {
    val bytes = s.getBytes
    val len = bytes.length
    val denom = total.toDouble + alpha * vocab.toDouble
    var n = 0L
    var nll = 0.0
    var i = 0
    while (i < len) {
      while (i < len && bytes(i) == ' ') i += 1
      val start = i
      while (i < len && bytes(i) != ' ') i += 1
      if (i > start) {
        val tl = i - start
        val c = counts.get(bytes, start, tl,
          TokenCountMap.hashRange(bytes, start, tl))
        val cnt = if (c < 0L) 0.0 else c.toDouble
        nll -= math.log((cnt + alpha) / denom)
        n += 1L
      }
    }
    if (n == 0L) null
    else new GenericInternalRow(Array[Any](n, nll / n))
  }
}

object BigramLmScore {
  private val scratchLocal = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](256)
  }

  /** Per-row interpolated bigram NLL (Jelinek-Mercer):
    * p(w_i | w_{i-1}) = λ·c(w_{i-1},w_i)/c(w_{i-1})
    *                  + (1−λ)·(c(w_i)+α)/(T+α·V);
    * the first token (no history) scores on the smoothed unigram
    * term alone. Operation order mirrors the SQL oracle EXACTLY:
    * (λ·bc)/pc + (1−λ)·(uc+α)/denom, both divisions left-assoc.
    * Bigram keys are "prev SPACE tok" (tokens never contain spaces
    * by construction of the tokenizer), assembled in a reusable
    * thread-local scratch — no per-token concat. The current token's
    * unigram count is carried into the next iteration as the
    * history count, so each token pays ONE unigram probe, not two.
    */
  def score(s: UTF8String,
            uni: TokenCountMap, bi: TokenCountMap,
            total: Long, vocab: Long,
            alpha: Double, lambda: Double): GenericInternalRow = {
    val bytes = s.getBytes
    val len = bytes.length
    val denom = total.toDouble + alpha * vocab.toDouble
    var n = 0L
    var nll = 0.0
    var prevStart = -1
    var prevEnd = -1
    var prevCnt = -1L
    var scratch = scratchLocal.get()
    var i = 0
    while (i < len) {
      while (i < len && bytes(i) == ' ') i += 1
      val start = i
      while (i < len && bytes(i) != ' ') i += 1
      if (i > start) {
        val tl = i - start
        val uc0 = uni.get(bytes, start, tl,
          TokenCountMap.hashRange(bytes, start, tl))
        val uc = if (uc0 < 0L) 0.0 else uc0.toDouble
        val uniTerm = (uc + alpha) / denom
        val p =
          if (prevStart < 0) uniTerm
          else {
            // prev was seen (it is a token of some doc); scoring a
            // FOREIGN doc against this LM may miss it -> pc = 0 means
            // no bigram evidence, fall back to the unigram term alone
            if (prevCnt <= 0L) (1.0 - lambda) * uniTerm
            else {
              val pl = prevEnd - prevStart
              val klen = pl + 1 + tl
              if (klen > scratch.length) {
                scratch = new Array[Byte](
                  java.lang.Integer.highestOneBit(klen) * 2)
                scratchLocal.set(scratch)
              }
              System.arraycopy(bytes, prevStart, scratch, 0, pl)
              scratch(pl) = ' '
              System.arraycopy(bytes, start, scratch, pl + 1, tl)
              val bc0 = bi.get(scratch, 0, klen,
                TokenCountMap.hashRange(scratch, 0, klen))
              val bc = if (bc0 < 0L) 0.0 else bc0.toDouble
              lambda * bc / prevCnt.toDouble +
                (1.0 - lambda) * (uc + alpha) / denom
            }
          }
        nll -= math.log(p)
        n += 1L
        prevStart = start; prevEnd = i; prevCnt = uc0
      }
    }
    if (n == 0L) null
    else new GenericInternalRow(Array[Any](n, nll / n))
  }
}

object StupidBackoffScore {
  private val scratchLocal = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](384)
  }

  /** Per-row trigram Stupid Backoff NLL (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the non-normalized
    * score designed for EXACTLY this distributed setting: raw counts,
    * no discounting pass, backoff factor a fixed 0.4):
    *
    *   S(w₃|w₁w₂) = c(w₁w₂w₃)/c(w₁w₂)  if the trigram was seen,
    *              else 0.4·S(w₃|w₂)
    *   S(w₃|w₂)   = c(w₂w₃)/c(w₂)      if the bigram was seen,
    *              else 0.4·S(w₃)
    *   S(w₃)      = c(w₃)/N, with a 1/N floor for OOV tokens (the
    *                paper leaves OOV undefined; the floor keeps
    *                −ln S finite and is replayable in SQL).
    *
    * First token scores at the unigram level, second at the bigram
    * level. Returns (n_toks, avg_nls) where nls = −ln S (not a true
    * NLL — S is not normalized; useful as a relative fluency score,
    * which is how the paper uses it).
    *
    * Per-token cost: one unigram probe, one bigram probe, one
    * trigram probe — the trigram key "p₂ p₁ w" is assembled ONCE in
    * a thread-local scratch and the bigram key "p₁ w" probed as its
    * suffix range (no second assembly). The previous token's unigram
    * count and the previous step's bigram count carry forward as the
    * current denominators, so no context is ever probed twice.
    * Division order and the 0.4 factors mirror the SQL oracle
    * term-for-term.
    */
  def score(s: UTF8String, uni: TokenCountMap, bi: TokenCountMap,
            tri: TokenCountMap, total: Long): GenericInternalRow = {
    val bytes = s.getBytes
    val len = bytes.length
    val nTot = total.toDouble
    var n = 0L
    var nll = 0.0
    var p1s = -1; var p1e = -1
    var p2s = -1; var p2e = -1
    var ucPrev = -1L
    var bcPrev = -1L
    var scratch = scratchLocal.get()
    var i = 0
    while (i < len) {
      while (i < len && bytes(i) == ' ') i += 1
      val start = i
      while (i < len && bytes(i) != ' ') i += 1
      if (i > start) {
        val tl = i - start
        val uc = uni.get(bytes, start, tl,
          TokenCountMap.hashRange(bytes, start, tl))
        var bc = -1L
        var tc = -1L
        if (p1s >= 0) {
          val p1l = p1e - p1s
          val p2l = if (p2s >= 0) p2e - p2s + 1 else 0 // incl. its space
          val klen = p2l + p1l + 1 + tl
          if (klen > scratch.length) {
            scratch = new Array[Byte](
              java.lang.Integer.highestOneBit(klen) * 2)
            scratchLocal.set(scratch)
          }
          var pos = 0
          if (p2s >= 0) {
            System.arraycopy(bytes, p2s, scratch, 0, p2l - 1)
            scratch(p2l - 1) = ' '
            pos = p2l
          }
          System.arraycopy(bytes, p1s, scratch, pos, p1l)
          scratch(pos + p1l) = ' '
          System.arraycopy(bytes, start, scratch, pos + p1l + 1, tl)
          val biLen = p1l + 1 + tl
          bc = bi.get(scratch, p2l, biLen,
            TokenCountMap.hashRange(scratch, p2l, biLen))
          if (p2s >= 0)
            tc = tri.get(scratch, 0, klen,
              TokenCountMap.hashRange(scratch, 0, klen))
        }
        val s1 = if (uc > 0L) uc.toDouble / nTot else 1.0 / nTot
        val sc =
          if (p1s < 0) s1
          else if (p2s < 0) {
            // bc>0 with ucPrev<=0 means mutually inconsistent count
            // tables (bigram seen, its context unigram pruned) — fall
            // through to the backoff branch instead of dividing by the
            // -1 sentinel and silently emitting a NaN score
            if (bc > 0L && ucPrev > 0L) bc.toDouble / ucPrev.toDouble
            else 0.4 * s1
          } else {
            if (tc > 0L && bcPrev > 0L) tc.toDouble / bcPrev.toDouble
            else 0.4 * (if (bc > 0L && ucPrev > 0L)
                          bc.toDouble / ucPrev.toDouble
                        else 0.4 * s1)
          }
        nll -= math.log(sc)
        n += 1L
        p2s = p1s; p2e = p1e; p1s = start; p1e = i
        ucPrev = uc; bcPrev = bc
      }
    }
    if (n == 0L) null
    else new GenericInternalRow(Array[Any](n, nll / n))
  }
}

/** SQL `sb_trigram_nll(text)` — trigram Stupid Backoff scoring
  * against BROADCAST count tables ([[StupidBackoffScore.score]]).
  * Same narrow scale shape as [[BigramNll]] — scoring moves zero
  * corpus bytes — but the models are TRUE `Broadcast` variables, not
  * expression-embedded maps: a trigram table is millions of entries,
  * and the optimizer legitimately clones the expression when it
  * splits the output struct into columns (CollapseProject), so an
  * embedded model would ride the task binary ONCE PER CLONE (measured
  * 32 s of pure serialization at sf10). As a broadcast handle the
  * clone costs nothing and executors fetch the blocks once, torrent-
  * style — the right shape on a real cluster too. Guarded by the
  * caller; past the guard, [[graft.ext.LangModel
  * .scoreStupidBackoffJoined]] serves the counts by join, the
  * paper's own sharded-counts shape.
  */
case class TrigramSbNll(child: Expression,
                        uni: org.apache.spark.broadcast.Broadcast[TokenCountMap],
                        bi: org.apache.spark.broadcast.Broadcast[TokenCountMap],
                        tri: org.apache.spark.broadcast.Broadcast[TokenCountMap],
                        total: Long)
  extends UnaryExpression with ExpectsInputTypes {

  require(total > 0, s"total token count must be positive, got $total")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("avg_nls", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "sb_trigram_nll"

  override protected def nullSafeEval(s: Any): Any =
    StupidBackoffScore.score(s.asInstanceOf[UTF8String],
      uni.value, bi.value, tri.value, total)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = "org.apache.spark.broadcast.Broadcast"
    val uniRef = ctx.addReferenceObj("sbUni", uni, bcCls)
    val biRef = ctx.addReferenceObj("sbBi", bi, bcCls)
    val triRef = ctx.addReferenceObj("sbTri", tri, bcCls)
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |org.apache.spark.sql.catalyst.expressions.GenericInternalRow ${ev.value}_r =
         |  graft.fn.StupidBackoffScore.score($s,
         |    (graft.fn.TokenCountMap) $uniRef.value(),
         |    (graft.fn.TokenCountMap) $biRef.value(),
         |    (graft.fn.TokenCountMap) $triRef.value(), ${total}L);
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

  @transient private lazy val uniLookup: TokenCountMap = TokenCountMap(uni)
  @transient private lazy val biLookup: TokenCountMap = TokenCountMap(bi)

  override protected def nullSafeEval(s: Any): Any =
    BigramLmScore.score(s.asInstanceOf[UTF8String], uniLookup, biLookup,
      total, vocab, alpha, lambda)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val uniRef = ctx.addReferenceObj("lmUni", uniLookup, "graft.fn.TokenCountMap")
    val biRef = ctx.addReferenceObj("lmBi", biLookup, "graft.fn.TokenCountMap")
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

  @transient private lazy val lookup: TokenCountMap = TokenCountMap(counts)

  override protected def nullSafeEval(s: Any): Any =
    LmScore.score(s.asInstanceOf[UTF8String], lookup, total, vocab, alpha)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("lmCounts", lookup, "graft.fn.TokenCountMap")
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
