package graft.fn

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, InterpretedOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group row buffer: the k rows with the SMALLEST sort
  * key, kept as a binary max-heap of [[UnsafeRow]] copies (O(1)
  * root-compare rejection once full — the common case — O(log k)
  * otherwise). Entries are whole projected rows (sort fields first,
  * payload struct last), compared by an [[InterpretedOrdering]] over
  * the leading `nSort` fields only.
  *
  * Retention = "k smallest rows by sort key" is a pure multiset
  * operation, so partial buffers merge to the same state whatever the
  * partition count, merge order, or scheduling — the determinism
  * contract of the whole sketch family ([[BottomKPairs]]'s argument,
  * generalized from (hash, value) pairs to arbitrary payload rows).
  * Callers make the sort key TOTAL (unique tie-break column) so the
  * retained set is unique, not merely some k-subset of a tied
  * frontier.
  */
final class BottomKRowsBuf(val k: Int,
                           ord: org.apache.spark.sql.catalyst.expressions.BaseOrdering) {
  val rows = new Array[UnsafeRow](k)
  var size = 0

  private def gt(a: UnsafeRow, b: UnsafeRow): Boolean = ord.compare(a, b) > 0

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (gt(rows(i), rows(p))) {
        val t = rows(i); rows(i) = rows(p); rows(p) = t
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
      if (l < size && gt(rows(l), rows(m))) m = l
      if (r < size && gt(rows(r), rows(m))) m = r
      if (m == i) return
      val t = rows(i); rows(i) = rows(m); rows(m) = t
      i = m
    }
  }

  /** Would `row` (a REUSABLE scratch row) enter the buffer? Callers
    * check before paying the copy.
    */
  def admits(row: UnsafeRow): Boolean = size < k || gt(rows(0), row)

  /** Insert an OWNED row (caller has already copied). */
  def add(row: UnsafeRow): Unit = {
    if (size < k) {
      rows(size) = row; size += 1
      siftUp(size - 1)
    } else if (gt(rows(0), row)) {
      rows(0) = row
      siftDown()
    }
  }

  def mergeIn(o: BottomKRowsBuf): Unit = {
    var i = 0
    while (i < o.size) { add(o.rows(i)); i += 1 }
  }

  /** Retained rows sorted ascending by the sort key. */
  def sorted(): Array[UnsafeRow] = {
    val out = java.util.Arrays.copyOf(rows, size)
    java.util.Arrays.sort(out, ord.asInstanceOf[java.util.Comparator[UnsafeRow]])
    out
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(size)
    var i = 0
    while (i < size) {
      val bytes = rows(i).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object BottomKRowsBuf {
  def deserialize(k: Int,
                  ord: org.apache.spark.sql.catalyst.expressions.BaseOrdering,
                  numFields: Int, bytes: Array[Byte]): BottomKRowsBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BottomKRowsBuf(k, ord)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(numFields)
      row.pointTo(b, len)
      buf.add(row)
      i += 1
    }
    buf
  }
}

/** `bottom_k_rows(struct(sort..., payload), nSort, k)` — the k
  * payload rows with the smallest (sort...) key per group, as a
  * native [[TypedImperativeAggregate]]: O(k) state per group however
  * large the group, map-side partial combine, merge-order-insensitive.
  *
  * This is THE scale fix for per-stratum sampling: the
  * `row_number().over(Window.partitionBy(stratum))` form it replaces
  * lands every row of a stratum in ONE task and fully sorts it there —
  * with a handful of sources over a 100 TB corpus that is a
  * single-task sort of ~trillions of rows per source. Here each map
  * task keeps k rows per group, the exchange carries only
  * #partitions × k rows per group, and nothing is ever globally
  * sorted (the per-group analogue of `TakeOrderedAndProject`, which
  * [[graft.ext.Sketches.sampleBottomK]] already uses for the global
  * form).
  *
  * The child struct's first `nSort` fields are the ranking key
  * ascending (callers append a unique tie-break so the key is total);
  * the LAST field is the payload struct that comes back, as
  * `array<payload>` sorted ascending by key. Rows with ANY null sort
  * field are ignored — the determinism contract needs a non-null
  * total key (a null hash means a null row key upstream, which the
  * callers' generated keys never produce).
  */
case class BottomKRows(
    child: Expression,
    nSort: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKRowsBuf] with UnaryLike[Expression] {

  require(k >= 1, s"retention capacity must be >= 1, got $k")
  require(nSort >= 1, s"need at least one sort field, got $nSort")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  // child.dataType is only known post-analysis — shape checks cannot
  // live in the constructor
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case s: StructType if s.length == nSort + 1 &&
          s.fields.last.dataType.isInstanceOf[StructType] &&
          s.fields.take(nSort).forall(f =>
            org.apache.spark.sql.catalyst.expressions.RowOrdering
              .isOrderable(f.dataType)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"child must be struct(sort1..sort$nSort, payloadStruct); got $other")
    }
  }

  @transient private lazy val sortTypes: Array[DataType] =
    structType.fields.take(nSort).map(_.dataType)
  // one ordering per expression, shared by every group buffer — a
  // per-buffer InterpretedOrdering was measurable churn at
  // millions-of-groups cardinality
  @transient private lazy val ordering: InterpretedOrdering =
    InterpretedOrdering.forSchema(sortTypes.toIndexedSeq)
  @transient private lazy val payloadType: StructType =
    structType.fields.last.dataType.asInstanceOf[StructType]
  // projects the evaluated struct to a compact UnsafeRow we can copy
  @transient private lazy val proj: UnsafeProjection =
    UnsafeProjection.create(structType.fields.map(_.dataType))

  override def dataType: DataType = ArrayType(payloadType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_rows"

  override def createAggregationBuffer(): BottomKRowsBuf =
    new BottomKRowsBuf(k, ordering)

  override def update(b: BottomKRowsBuf, input: InternalRow): BottomKRowsBuf = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      var i = 0
      var nullSort = false
      while (i < nSort && !nullSort) { nullSort = row.isNullAt(i); i += 1 }
      // a null PAYLOAD struct is skipped like a null sort key —
      // eval's getStruct would otherwise NPE on the retained row
      if (row.isNullAt(nSort)) nullSort = true
      if (!nullSort) {
        val u = proj(row) // reusable scratch — copy only on admit
        if (b.admits(u)) b.add(u.copy())
      }
    }
    b
  }

  override def merge(b: BottomKRowsBuf, o: BottomKRowsBuf): BottomKRowsBuf = {
    b.mergeIn(o); b
  }

  override def eval(b: BottomKRowsBuf): Any = {
    val s = b.sorted()
    val out = new Array[Any](s.length)
    var i = 0
    while (i < s.length) {
      out(i) = s(i).getStruct(nSort, payloadType.length).copy()
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: BottomKRowsBuf): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): BottomKRowsBuf =
    BottomKRowsBuf.deserialize(k, ordering, structType.length, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
