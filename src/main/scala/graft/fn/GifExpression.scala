package graft.fn

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Real per-frame video features for GIF payloads ([[graft.ext.Gif]]:
  * LZW decode + palette + interlace + disposal compositing) — the GIF
  * twin of [[ApngFrameFeatures]], same output contract
  * (`array<array<double>>` of `[frame_idx, t_ms, mean, std, hist]`),
  * same codegen pattern. Non-GIF payloads yield SQL null.
  */
case class GifFrameFeatures(child: Expression, nBins: Int = 16,
                            stride: Int = 1, maxFrames: Int = 256)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gif_frame_features"

  override protected def nullSafeEval(bytes: Any): Any =
    graft.ext.Gif.frameFeaturesArrayDataOrNull(
      bytes.asInstanceOf[Array[Byte]], nBins, stride, maxFrames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_f =
         |  graft.ext.Gif.frameFeaturesArrayDataOrNull($bytes, $nBins, $stride, $maxFrames);
         |if (${ev.value}_f == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_f;
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
