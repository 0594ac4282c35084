package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Private-API bridge (the standard pattern for Spark extension
  * libraries, e.g. spark-native connectors and expression packages):
  * `classic.ExpressionUtils` is `private[sql]`, so the Column ⇄
  * Expression conversions needed to expose a custom Catalyst
  * expression through the typed Column API are re-exported from inside
  * the `org.apache.spark.sql` package. This is the only file outside
  * the `graft` namespace.
  */
package object graftbridge {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its analyzed Catalyst expression. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `types.AbstractDataType` is `private[sql]`; expression classes
    * outside the sql package need the alias to implement
    * `ExpectsInputTypes.inputTypes`.
    */
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType
}
