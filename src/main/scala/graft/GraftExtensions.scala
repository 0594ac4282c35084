package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.fn.VincentyKm

/** Engine extension point (SURVEY.md §2.8 UDF surface): registers the
  * engine's native expressions with the session's function registry so
  * they are callable from SQL and `call_function`.
  *
  * Activate per session with either
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.vincentyFn)
}

object GraftExtensions {

  private val vincentyFn = (
    new FunctionIdentifier("vincenty_km"),
    new ExpressionInfo(classOf[VincentyKm].getName, "vincenty_km"),
    (children: Seq[Expression]) => {
      require(children.size == 4,
        s"vincenty_km expects (lat1, lon1, lat2, lon2); got ${children.size} args")
      VincentyKm(children(0), children(1), children(2), children(3))
    })

  /** Register the same functions on an ALREADY-RUNNING session (the
    * extensions config only applies at session construction).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(vincentyFn._1, vincentyFn._2, vincentyFn._3)
}
