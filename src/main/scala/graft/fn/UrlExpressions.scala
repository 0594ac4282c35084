package graft.fn

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst packing for [[graft.ext.Urls.normalizeOrNull]]. */
object UrlKernels {
  def normalizeRowOrNull(u: UTF8String): InternalRow = {
    if (u == null) return null
    val t = graft.ext.Urls.normalizeOrNull(u.toString)
    if (t == null) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(t._1), UTF8String.fromString(t._2),
      UTF8String.fromString(t._3)))
  }
}

/** `url_normalize(url)` → struct(norm_url, host, domain); null for
  * out-of-subset URLs ([[graft.ext.WebOps]] documents the rules).
  */
case class UrlNormalize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("norm_url", StringType, nullable = false),
    StructField("host", StringType, nullable = false),
    StructField("domain", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "url_normalize"

  override protected def nullSafeEval(v: Any): Any =
    UrlKernels.normalizeRowOrNull(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |org.apache.spark.sql.catalyst.InternalRow ${ev.value}_r =
         |  graft.fn.UrlKernels.normalizeRowOrNull($t);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
