package graft.fn

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `charset_sniff(content)` — [[graft.ext.Charsets]] BOM + strict
  * UTF-8 + windows-1252 sniffing/decoding as a per-row codegen
  * kernel: the crawl payload's bytes → (detected charset, decoded
  * text, code-point count). Null only for null input.
  */
case class CharsetSniff(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = CharsetSniff.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "charset_sniff"

  override protected def nullSafeEval(bytes: Any): Any =
    CharsetSniff.rowOrNull(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""
         |org.apache.spark.sql.catalyst.InternalRow ${ev.value}_r =
         |  graft.fn.CharsetSniff.rowOrNull($bytes);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharsetSniff {
  val Schema: StructType = StructType(Seq(
    StructField("charset", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))

  def rowOrNull(bytes: Array[Byte]): InternalRow = {
    val d = graft.ext.Charsets.decodeOrNull(bytes)
    if (d == null) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(d.charset),
      UTF8String.fromString(d.text),
      d.text.codePointCount(0, d.text.length)))
  }
}
