package graft.fn

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Real per-frame video features for animated-PNG payloads as a native
  * Catalyst expression: decodes every frame (inflate + unfilter +
  * composite, [[graft.ext.Apng]]) and emits
  * `array<array<double>>` — one inner row
  * `[frame_idx, t_ms, mean, std, nBins histogram]` per every
  * `stride`-th of the first `maxFrames` frames. One static call inside
  * the whole-stage codegen span (the PngGrayFeatures/VincentyKm
  * pattern — no ScalaUDF span break). Non-APNG payloads (including
  * plain still PNGs) yield SQL null, so mixed asset tables route
  * cleanly.
  */
case class ApngFrameFeatures(child: Expression, nBins: Int = 16,
                             stride: Int = 1, maxFrames: Int = 256)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "apng_frame_features"

  override protected def nullSafeEval(bytes: Any): Any =
    graft.ext.Apng.frameFeaturesArrayDataOrNull(
      bytes.asInstanceOf[Array[Byte]], nBins, stride, maxFrames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_f =
         |  graft.ext.Apng.frameFeaturesArrayDataOrNull($bytes, $nBins, $stride, $maxFrames);
         |if (${ev.value}_f == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_f;
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
