package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** J2 as-of (temporal nearest) join (SURVEY.md §2.3).
  *
  * The reference argmins `(t - hour)^2` over the grid time axis per track
  * point (`find_time_index`, trackplot_hycom.py:186-197, numba-jitted).
  * Spark has no native as-of join; two formulations:
  *
  *  - [[nearestBroadcast]]: right side is a small axis (grid time axis —
  *    thousands of entries max): broadcast + `min_by` argmin. Since
  *    `keyCols` are unique per row the groupBy has no reduction — the
  *    left relation shuffles once with non-key columns carried through
  *    `first()`; for wide rows, run it on a narrow (key, t) projection
  *    and join back. The strategy of choice whenever the right side
  *    fits in a broadcast — including the stream-static case
  *    (SURVEY.md §2.8).
  *  - [[asofBackwardUnion]]: general big-big backward as-of
  *    (`last value with rt <= lt`): union the two sides tagged, single
  *    sort-partitioned window pass with `last(_, ignoreNulls)` — one
  *    shuffle on the partition keys, no cross product. This is the
  *    100 TB-safe plan for stream-stream-sized inputs.
  *
  * Nearest-tie: reference keeps the first (earliest) axis entry on exact
  * ties (strict `<`, trackplot_hycom.py:194) — reproduced via the
  * (dist, idx) min_by ordering.
  */
object AsofJoin {

  /** Nearest (not backward) as-of against a small broadcast axis.
    *
    * @param df      left rows (any size)
    * @param keyCols unique row identifier columns, carried through
    * @param t       left time column name (numeric or timestamp-cast-long)
    * @param axis    small table (`axisIdx`, `axisT`)
    * @return df + `{prefix}_idx`, `{prefix}_t` (nearest axis entry)
    */
  def nearestBroadcast(df: DataFrame, keyCols: Seq[String], t: String,
                       axis: DataFrame, axisIdx: String, axisT: String,
                       prefix: String): DataFrame = {
    val a = broadcast(axis.select(col(axisIdx).as("__tidx"), col(axisT).as("__tval")))
    val joined = df.crossJoin(a)
    val dist = abs(col(t).cast("double") - col("__tval").cast("double"))
    val best = min_by(struct(col("__tidx"), col("__tval")), struct(dist, col("__tidx")))
    joined
      .groupBy(keyCols.map(col): _*)
      .agg(
        best.as("__best"),
        joined.columns
          .filterNot(c => keyCols.contains(c) || c == "__tidx" || c == "__tval")
          .map(c => first(col(c)).as(c)): _*)
      .withColumn(s"${prefix}_idx", col("__best.__tidx"))
      .withColumn(s"${prefix}_t", col("__best.__tval"))
      .drop("__best")
  }

  /** General backward as-of join: for each left row, attach `valueCols`
    * of the latest right row with `right.t <= left.t`, matching on
    * `partitionCols`. One shuffle (union + window), scales to big-big.
    */
  def asofBackwardUnion(left: DataFrame, right: DataFrame,
                        partitionCols: Seq[String], t: String,
                        valueCols: Seq[String]): DataFrame = {
    val lTagged = left
      .withColumn("__side", lit(0))
      .select((left.columns.map(col) :+ col("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")): _*)
    val rTagged = right
      .withColumn("__side", lit(1))
      .select((left.columns.map(c =>
          if (partitionCols.contains(c) || c == t) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)) :+ col("__side")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    val unioned = lTagged.unionByName(rTagged)
    // right rows sort before left rows at equal t => "<=" semantics
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(t).asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"__v_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    val out = filled.filter(col("__side") === 0).drop("__side")
    valueCols.foldLeft(out)((d, c) => d.withColumnRenamed(s"__v_$c", c))
  }
}
