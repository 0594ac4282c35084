package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** `$"..."` interpolator without a SparkSession-bound implicits
  * import — shared by every Queries* batch (one definition, not one
  * copy per file).
  */
private[graft] trait ColumnSyntax {
  protected implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
