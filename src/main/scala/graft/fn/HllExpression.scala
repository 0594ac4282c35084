package graft.fn

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types._

/** HyperLogLog register file (Flajolet et al. 2007): m = 2^p byte
  * registers, each the max leading-zero-run-length-plus-one (ρ) of
  * the hash suffix routed to that bucket. Update is `max`, merge is
  * element-wise `max` — order-insensitive and idempotent, so
  * map-side partials combine exactly and re-delivered rows cannot
  * skew the sketch (the property KMV shares; a sampled counter
  * would not).
  */
final class HllBuffer(val p: Int) {
  val m: Int = 1 << p
  val regs = new Array[Byte](m)

  /** Route a pre-hashed key: bucket = h mod m (low p bits), suffix
    * w = h >> p (widthBits − p bits), ρ = leading zeros of w within
    * that width + 1 (w == 0 → width − p + 1, the all-zeros suffix).
    */
  def add(h: Long, widthBits: Int): Unit = {
    val bucket = (h & (m - 1)).toInt
    val w = h >>> p
    val wbits = widthBits - p
    // bit length of w = 64 - nlz(w); rho = wbits - bitlen + 1
    val rho =
      if (w == 0L) wbits + 1
      else wbits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rho > regs(bucket)) regs(bucket) = rho.toByte
  }

  def mergeIn(o: HllBuffer): Unit = {
    var i = 0
    while (i < m) {
      if (o.regs(i) > regs(i)) regs(i) = o.regs(i)
      i += 1
    }
  }

  /** Raw estimate α_m·m²/Σ 2^−M_j with the small-range linear-counting
    * correction (E ≤ 2.5m and empty registers exist → m·ln(m/V)).
    * No large-range correction: the hash space is ≥ 2^60, far beyond
    * any corpus cardinality. Summation runs in register-index order —
    * deterministic per sketch; cross-engine equality is to the
    * verifier's 1e-9 relative tolerance (sum order differs in SQL).
    */
  def estimate(): Double = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = regs(i)
      if (r == 0) { zeros += 1; sum += 1.0 }
      else sum += java.lang.Math.scalb(1.0, -r.toInt)
      i += 1
    }
    val alpha = HllBuffer.alpha(m)
    val e = alpha * m.toDouble * m.toDouble / sum
    if (e <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else e
  }

  def serialize(): Array[Byte] = regs.clone()
}

object HllBuffer {
  /** Bias-correction constant (Flajolet et al. 2007 §4). */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  def deserialize(p: Int, bytes: Array[Byte]): HllBuffer = {
    val b = new HllBuffer(p)
    System.arraycopy(bytes, 0, b.regs, 0, b.m)
    b
  }
}

/** `hll_distinct(hash, p, widthBits)` — per-group approximate COUNT
  * DISTINCT via a HyperLogLog register file over PRE-HASHED long
  * keys uniform on [0, 2^widthBits). State is m = 2^p BYTES per
  * group — fixed, tiny (512 B at p = 9), mergeable — versus
  * `count_distinct`'s unbounded distinct set; relative standard
  * error ≈ 1.04/√m. Like [[KmvDistinct]], the caller supplies the
  * hash column, so the sketch is PORTABLE: feed it
  * [[graft.ext.Sketches.orderHash]] (60-bit md5) and a DuckDB oracle
  * recomputes the identical registers and estimate from SQL — unlike
  * `approx_count_distinct`, whose HLL sketch is engine-private.
  * Null hashes are ignored.
  *
  * HLL vs KMV (both shipped): HLL unions cheaper (m byte-max's, no
  * key storage) and its registers are a fixed-size frame friendly to
  * sketch-table materialization; KMV is exact below k and composes
  * with bottom-k sampling. A 100 TB profile wants HLL for
  * billions-cardinality columns, KMV when small-group exactness
  * matters.
  */
case class HllDistinct(
    child: Expression,
    p: Int,
    widthBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(p >= 4 && p <= 18, s"p must be in [4, 18], got $p")
  require(widthBits > p && widthBits <= 63,
    s"hash width must be in (p, 63], got $widthBits")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)

  override def update(b: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long], widthBits)
    b
  }

  override def merge(b: HllBuffer, o: HllBuffer): HllBuffer = { b.mergeIn(o); b }

  override def eval(b: HllBuffer): Any = b.estimate()

  override def serialize(b: HllBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): HllBuffer =
    HllBuffer.deserialize(p, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
