package graft.fn

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types._

/** Bottom-k (hash, value) sample state for quantile estimation: the k
  * pairs with the SMALLEST (hash, value) lexicographic order, kept as
  * a binary max-heap (O(log k) per offered row after the O(1)
  * root-compare rejection, which is the common case once the heap is
  * full). Row hashes are caller-supplied uniform order hashes of a
  * UNIQUE row key, so the retained set is a uniform sample of ROWS —
  * unlike KMV's distinct-hash set — and the value sorted at rank
  * ⌈q·m⌉ estimates the q-quantile with the standard uniform-sample
  * error ≈ √(q(1−q)/k) in rank space.
  *
  * DETERMINISM is the design driver: retention = "k smallest pairs"
  * is a pure multiset operation, so partial buffers merge to the same
  * state whatever the partition count, merge order, or scheduling —
  * unlike KLL/t-digest, whose randomized compactions (KLL coin
  * flips, t-digest centroid order) give better ε per byte but a
  * run-dependent answer that no external engine can replay. At a
  * fixed k the estimate here is reproducible bit-for-bit in plain
  * SQL (rank by the same md5 hash, take rk ≤ k, index the sorted
  * sample) — the portability contract of the whole sketch family.
  */
final class BottomKPairs(val k: Int) {
  val hs = new Array[Long](k)
  val vs = new Array[Double](k)
  var size = 0

  private def gt(h1: Long, v1: Double, h2: Long, v2: Double): Boolean =
    h1 > h2 || (h1 == h2 && v1 > v2)

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (gt(hs(i), vs(i), hs(p), vs(p))) {
        val th = hs(i); val tv = vs(i)
        hs(i) = hs(p); vs(i) = vs(p); hs(p) = th; vs(p) = tv
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && gt(hs(l), vs(l), hs(m), vs(m))) m = l
      if (r < size && gt(hs(r), vs(r), hs(m), vs(m))) m = r
      if (m == i) return
      val th = hs(i); val tv = vs(i)
      hs(i) = hs(m); vs(i) = vs(m); hs(m) = th; vs(m) = tv
      i = m
    }
  }

  def add(h: Long, v: Double): Unit = {
    if (size < k) {
      hs(size) = h; vs(size) = v; size += 1
      siftUp(size - 1)
    } else if (gt(hs(0), vs(0), h, v)) {
      hs(0) = h; vs(0) = v
      siftDown()
    }
  }

  def mergeIn(o: BottomKPairs): Unit = {
    var i = 0
    while (i < o.size) { add(o.hs(i), o.vs(i)); i += 1 }
  }

  /** Quantile estimates: sample values sorted ascending, estimate for
    * q = value at 1-based rank max(1, ⌈q·m⌉). Null when empty.
    */
  def quantiles(qs: Array[Double]): Array[Double] = {
    if (size == 0) return null
    val sorted = java.util.Arrays.copyOf(vs, size)
    java.util.Arrays.sort(sorted)
    qs.map { q =>
      val rank = math.max(1L, math.ceil(q * size).toLong)
      sorted(math.min(rank, size.toLong).toInt - 1)
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(size)
    var i = 0
    while (i < size) { out.writeLong(hs(i)); out.writeDouble(vs(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object BottomKPairs {
  def deserialize(k: Int, bytes: Array[Byte]): BottomKPairs = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BottomKPairs(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readLong(), in.readDouble()); i += 1 }
    buf
  }
}

/** `sample_quantiles(hash, value, k, qs)` — per-group quantile
  * estimates from a deterministic bottom-k row sample, as a native
  * [[TypedImperativeAggregate]]: O(k) state per group regardless of
  * group size (the bounded-state alternative to `percentile`'s full
  * value buffer at 100 TB group sizes), mergeable with map-side
  * partials, and — because the caller supplies the hash — portable:
  * feed it [[graft.ext.Sketches.orderHash]] of a unique row key and
  * an external engine replays the identical estimate from the same
  * SQL (rank by hash, take rk ≤ k, index the sorted sample), unlike
  * `approx_percentile`'s engine-private KLL sketch, whose randomized
  * compaction is not even reproducible across runs. Exact (sample =
  * whole group) when the group has ≤ k rows. Null hashes or values
  * are ignored. Returns array<double> aligned with `qs`.
  */
case class SampleQuantiles(
    left: Expression,
    right: Expression,
    k: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKPairs]
  with ExpectsInputTypes with BinaryLike[Expression] {

  require(k >= 1, s"sample capacity must be >= 1, got $k")
  require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
    s"quantiles must lie in (0, 1], got $qs")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sample_quantiles"

  @transient private lazy val qsArr: Array[Double] = qs.toArray

  override def createAggregationBuffer(): BottomKPairs = new BottomKPairs(k)

  override def update(b: BottomKPairs, input: InternalRow): BottomKPairs = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      b.add(h.asInstanceOf[Long], v.asInstanceOf[Double])
    b
  }

  override def merge(b: BottomKPairs, o: BottomKPairs): BottomKPairs = {
    b.mergeIn(o); b
  }

  override def eval(b: BottomKPairs): Any = {
    val out = b.quantiles(qsArr)
    if (out == null) null else new GenericArrayData(out)
  }

  override def serialize(b: BottomKPairs): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): BottomKPairs =
    BottomKPairs.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
