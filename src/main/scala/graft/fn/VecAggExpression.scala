package graft.fn

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types._

/** Element-wise running sum of `array<double>` rows — the buffer
  * behind [[VecPoolAgg]]. State is ONE dim-sized double array + a
  * count per group, fixed by the embedding dimension (64-4096 in
  * practice), independent of group size — the pooling analogue of the
  * Space-Saving buffer's bounded-state argument.
  */
final class VecPoolBuffer {
  var sum: Array[Double] = null
  var n: Long = 0L

  def add(a: ArrayData): Unit = {
    val d = a.numElements()
    if (sum == null) sum = new Array[Double](d)
    else require(d == sum.length,
      s"vec pooling dimension mismatch: $d vs ${sum.length}")
    var i = 0
    while (i < d) { sum(i) += a.getDouble(i); i += 1 }
    n += 1
  }

  def mergeIn(o: VecPoolBuffer): Unit =
    if (o.sum != null) {
      if (sum == null) { sum = o.sum.clone(); n = o.n }
      else {
        require(sum.length == o.sum.length,
          s"vec pooling dimension mismatch: ${o.sum.length} vs ${sum.length}")
        var i = 0
        while (i < sum.length) { sum(i) += o.sum(i); i += 1 }
        n += o.n
      }
    }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(n)
    out.writeInt(if (sum == null) -1 else sum.length)
    if (sum != null) sum.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }
}

object VecPoolBuffer {
  def deserialize(bytes: Array[Byte]): VecPoolBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new VecPoolBuffer
    b.n = in.readLong()
    val d = in.readInt()
    if (d >= 0) {
      b.sum = new Array[Double](d)
      var i = 0
      while (i < d) { b.sum(i) = in.readDouble(); i += 1 }
    }
    b
  }
}

/** Element-wise vector pooling aggregate — SQL `vec_sum(v)` /
  * `vec_mean(v)`: the chunk→document embedding roll-up (mean-pool the
  * chunk vectors [[graft.ext.Corpus.chunk]] produced, average
  * per-cluster embeddings into centroids, build class prototypes).
  *
  * A native [[TypedImperativeAggregate]] because Spark has no
  * element-wise array aggregate: the built-in alternatives either
  * explode every vector to (pos, value) rows — a dim× row explosion
  * through the shuffle — or `collect_list` whole groups onto single
  * rows (unbounded). Here the shuffle carries ONE dim-sized state per
  * (group × map task) with map-side partial aggregation, the same
  * bounded-state shape as `topk_freq`. Null vectors are skipped;
  * dimension mismatch within a group is an error (embeddings of mixed
  * dims in one group are corrupt data, not a pooling request); a group
  * with no non-null vectors yields SQL null.
  */
case class VecPoolAgg(
    child: Expression,
    mean: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecPoolBuffer]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = if (mean) "vec_mean" else "vec_sum"

  override def createAggregationBuffer(): VecPoolBuffer = new VecPoolBuffer

  override def update(b: VecPoolBuffer, input: InternalRow): VecPoolBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData])
    b
  }

  override def merge(b: VecPoolBuffer, o: VecPoolBuffer): VecPoolBuffer = {
    b.mergeIn(o); b
  }

  override def eval(b: VecPoolBuffer): Any =
    if (b.n == 0L) null
    else {
      val out = new Array[Any](b.sum.length)
      var i = 0
      while (i < b.sum.length) {
        out(i) = if (mean) b.sum(i) / b.n else b.sum(i)
        i += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(b: VecPoolBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): VecPoolBuffer =
    VecPoolBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecPoolAgg =
    copy(child = newChild)
}
