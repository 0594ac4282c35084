package graft.fn

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** ISO BMFF (MP4) container metadata as a native Catalyst expression:
  * `[timescale, duration_sec, n_tracks]` via the JDK-only box walk
  * [[graft.ext.Mp4.metaOrNull]], inside whole-stage codegen. Non-BMFF
  * payloads yield SQL null ([[PngGrayFeatures]]/[[WavPcmFeatures]]
  * pattern).
  */
case class Mp4Meta(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mp4_meta"

  override protected def nullSafeEval(bytes: Any): Any = {
    val f = graft.ext.Mp4.metaOrNull(bytes.asInstanceOf[Array[Byte]])
    if (f == null) null else new GenericArrayData(f)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""
         |double[] ${ev.value}_f = graft.ext.Mp4.metaOrNull($bytes);
         |if (${ev.value}_f == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(${ev.value}_f);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
