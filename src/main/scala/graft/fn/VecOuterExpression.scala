package graft.fn

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types._

object VecOuterKernel {
  /** Packed upper-triangle outer product x⊗x: output[k] = x_i·x_j for
    * i ≤ j in row-major triangle order (k = i·dim − i(i−1)/2 + (j−i)).
    * One allocation per row, no boxing.
    */
  def outerUpper(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) { x(i) = arr.getDouble(i); i += 1 }
    val out = new Array[Double](n * (n + 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      val xi = x(i)
      var j = i
      while (j < n) { out(k) = xi * x(j); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** SQL-free codegen expression: packed upper-triangle x⊗x of a
  * double vector — the per-row moment a single [[graft.ext.SimJoin.vecSum]]
  * aggregate turns into a covariance matrix
  * ([[graft.ext.VecStats.moments]]). dim d costs d(d+1)/2 doubles per
  * row inside the scan span; the alternative (position self-explode +
  * groupBy(i,j)) shuffles N·d² rows. Null vector → null.
  */
case class VecOuterUpper(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType, containsNull = false))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_outer_upper"

  override protected def nullSafeEval(v: Any): Any =
    VecOuterKernel.outerUpper(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.fn.VecOuterKernel.outerUpper($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
