package graft.fn

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types._

/** Bounded KMV (k-minimum-values) distinct-count state: the k
  * smallest DISTINCT hash values seen so far, kept as a sorted long
  * array (k is small — tens to low thousands — so binary-search
  * insertion beats any tree's constant factor and serializes flat).
  * Classic bottom-k sketch (Bar-Yossef et al. 2002; mergeable per
  * Cohen & Kaplan 2007): with uniform hashes on [0, span), the
  * estimator (k−1)·span/h_k is unbiased for the distinct count, with
  * relative standard error ≈ 1/√(k−2); when fewer than k distinct
  * hashes exist the sketch holds ALL of them and the count is exact.
  * Merging is set-union + retake-bottom-k — order-insensitive, so
  * map-side partials combine exactly.
  */
final class KmvBuffer(val k: Int) {
  val heap = new Array[Long](k)
  var size = 0

  /** Insert if h ranks among the k smallest and is not present. */
  def add(h: Long): Unit = {
    if (size == k && h >= heap(k - 1)) return
    val idx = java.util.Arrays.binarySearch(heap, 0, size, h)
    if (idx >= 0) return // already present: distinct semantics
    val ins = -idx - 1
    val last = if (size == k) k - 1 else size
    if (last > ins) System.arraycopy(heap, ins, heap, ins + 1, last - ins)
    heap(ins) = h
    if (size < k) size += 1
  }

  def mergeIn(o: KmvBuffer): Unit = {
    var i = 0
    while (i < o.size) { add(o.heap(i)); i += 1 }
  }

  /** Distinct estimate: exact size below k, else (k−1)·span/h_k. */
  def estimate(span: Double): Double =
    if (size < k) size.toDouble
    else (k - 1).toDouble * span / heap(k - 1).toDouble

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(size)
    var i = 0
    while (i < size) { out.writeLong(heap(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object KmvBuffer {
  def deserialize(k: Int, bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvBuffer(k)
    val n = in.readInt()
    var i = 0
    // serialized form is already sorted-distinct — bulk restore
    while (i < n) { buf.heap(i) = in.readLong(); i += 1 }
    buf.size = n
    buf
  }
}

/** `kmv_distinct(hash, k, span)` — per-group approximate COUNT
  * DISTINCT as a native [[TypedImperativeAggregate]] over
  * PRE-HASHED long keys uniform on [0, span). O(k) state per group
  * no matter how many rows or distinct keys flow through — the
  * bounded-state alternative to `count_distinct` (whose state is the
  * full distinct set) at 100 TB group cardinalities. Because the
  * caller supplies the hash column, the sketch is PORTABLE: feed it
  * [[graft.ext.Sketches.orderHash]] (60-bit md5) and a DuckDB oracle
  * reproduces the estimate bit-for-bit from the same SQL hash —
  * unlike HLL-family `approx_count_distinct`, whose sketch is
  * engine-private. Null hashes are ignored. Exact (= the true
  * distinct count) whenever the group has fewer than k distinct
  * hashes.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    span: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 2, s"k must be >= 2 for the (k-1)/h_k estimator, got $k")
  require(span > 0, s"hash span must be positive, got $span")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer = { b.mergeIn(o); b }

  override def eval(b: KmvBuffer): Any = b.estimate(span)

  override def serialize(b: KmvBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
