package graft.fn

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Real baseline-JPEG luminance features as a native Catalyst
  * expression — [[graft.ext.Jpeg]]: marker parse → Huffman entropy
  * decode → dequant → IDCT of the Y plane → [mean, std, nBins
  * histogram], the same contract as [[PngGrayFeatures]]. One static
  * call inside the whole-stage codegen span; non-JPEG or
  * out-of-scope profiles (arithmetic, 12-bit, CMYK; progressive decodes)
  * yield SQL null.
  */
case class JpegGrayFeatures(child: Expression, nBins: Int = 16)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_gray_features"

  override protected def nullSafeEval(bytes: Any): Any = {
    val f = graft.ext.Jpeg.grayFeaturesOrNull(bytes.asInstanceOf[Array[Byte]], nBins)
    if (f == null) null else new GenericArrayData(f)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""
         |double[] ${ev.value}_f = graft.ext.Jpeg.grayFeaturesOrNull($bytes, $nBins);
         |if (${ev.value}_f == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(${ev.value}_f);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
