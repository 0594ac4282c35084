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
  def normalizeRowOrNull(u: UTF8String): InternalRow =
    normalizeRowOrNull(u, null)

  /** `suffixes` null → the built-in default second-level set. */
  def normalizeRowOrNull(u: UTF8String, suffixes: Set[String]): InternalRow = {
    if (u == null) return null
    val t = graft.ext.Urls.normalizeOrNull(u.toString,
      if (suffixes == null) graft.ext.Urls.DefaultSecondLevelSuffixes else suffixes)
    if (t == null) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(t._1), UTF8String.fromString(t._2),
      UTF8String.fromString(t._3)))
  }
}

/** `url_normalize(url)` → struct(norm_url, host, domain); null for
  * out-of-subset URLs ([[graft.ext.WebOps]] documents the rules).
  * `suffixes` optionally injects a public-suffix-list snapshot for
  * the registered-domain rollup — a `Broadcast` HANDLE (O(handle)
  * in the task binary even when CollapseProject clones this
  * expression), never an embedded set.
  */
case class UrlNormalize(child: Expression,
    suffixes: Option[org.apache.spark.broadcast.Broadcast[Set[String]]] = None)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("norm_url", StringType, nullable = false),
    StructField("host", StringType, nullable = false),
    StructField("domain", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "url_normalize"

  override protected def nullSafeEval(v: Any): Any =
    UrlKernels.normalizeRowOrNull(v.asInstanceOf[UTF8String],
      suffixes.map(_.value).orNull)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = suffixes match {
      case Some(bc) =>
        val r = ctx.addReferenceObj("pslSet", bc,
          "org.apache.spark.broadcast.Broadcast")
        s"(scala.collection.immutable.Set) $r.value()"
      case None => "null"
    }
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |org.apache.spark.sql.catalyst.InternalRow ${ev.value}_r =
         |  graft.fn.UrlKernels.normalizeRowOrNull($t, $setRef);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `registered_domain_psl(host)` — the FULL public-suffix-list
  * rollup ([[graft.ext.Psl]]: wildcard + exception rules, any
  * depth) as a per-row codegen kernel. The list rides a `Broadcast`
  * (the UrlNormalize rule: O(handle) in the task binary even when
  * the optimizer clones the expression). Null in, null out; a host
  * that IS a public suffix passes through, matching the
  * second-level rollup's convention.
  */
case class RegisteredDomainPsl(child: Expression,
    psl: org.apache.spark.broadcast.Broadcast[graft.ext.Psl])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "registered_domain_psl"

  override protected def nullSafeEval(v: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      psl.value.registeredDomain(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("pslRules", psl,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  ((graft.ext.Psl) $r.value()).registeredDomain($t.toString()));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
