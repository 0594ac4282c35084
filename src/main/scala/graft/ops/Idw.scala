package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A1 IDW weighted mean + A5 OLS — the reference's aggregates
  * (SURVEY.md §2.4), as pure built-in compositions (no UDAF: partial
  * aggregation, codegen, and AQE all apply for free).
  */
object Idw {

  /** Notebook epsilon (TrackPlotter_Hycom.ipynb:41): adopted over the
    * .py's bare `1/x²` (division by zero when a neighbor coincides —
    * SURVEY.md §2.9 decision 1).
    */
  val Eps: Double = 1e-6

  /** Inverse-distance weight `1/(d+eps)²` (F6). */
  def weight(dist: Column): Column = lit(1.0) / pow(dist + lit(Eps), 2)

  /** IDW aggregate: `Σ w·v / Σ w` over the group, where null values are
    * skipped in BOTH numerator and normalizer — exactly np.nansum
    * semantics (`IDW_interp`, trackplot_hycom.py:28-37 / nb:37-48): a
    * null neighbor contributes neither its value nor its weight. The
    * normalizer summing weights only where v is non-null is the
    * oracle-parity-critical detail (SURVEY.md §7.4 trap 1).
    *
    * Returns null when every neighbor is null (np.nansum of empty = 0/0).
    */
  def idw(value: Column, dist: Column): Column = {
    val w = weight(dist)
    sum(when(value.isNotNull, w * value)) /
      sum(when(value.isNotNull, w))
  }

  /** Degenerate "nearest" mode (`tempcolumn_nc4`,
    * trackplot_hycom.py:115-133 — dead code in the reference, kept as an
    * engine option per SURVEY.md §2.9 item 4): value of the single
    * nearest non-null neighbor.
    */
  def nearestValue(value: Column, dist: Column): Column =
    min_by(value, when(value.isNotNull, dist))

  /** A5 deg-1 OLS slope via population moments
    * (`np.polyfit(x, y, 1)`, nb:427-429): covar_pop(x,y)/var_pop(x).
    */
  def olsSlope(x: Column, y: Column): Column =
    covar_pop(x, y) / var_pop(x)

  /** A5 OLS intercept: avg(y) - slope*avg(x). */
  def olsIntercept(x: Column, y: Column): Column =
    avg(y) - olsSlope(x, y) * avg(x)
}
