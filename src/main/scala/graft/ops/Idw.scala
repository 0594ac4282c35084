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

  /** Renormalized IDW aggregate: `Σ w·v / Σ w` over the group, where
    * null values are skipped in BOTH numerator and normalizer — a null
    * neighbor contributes neither its value nor its weight, so the
    * surviving weights are renormalized to sum to 1.
    *
    * DELIBERATE DEVIATION from the reference (`IDW_interp`,
    * trackplot_hycom.py:28-37 / nb:37-48): there, weights are a pure
    * function of distance and never NaN, so `np.nansum(w)` sums ALL 9
    * neighbor weights — a NaN-valued (masked/land) neighbor still
    * contributes its weight to the denominator, silently biasing
    * coastal results toward 0. We renormalize instead (the
    * statistically standard choice); [[idwReferenceParity]] reproduces
    * the reference bit-for-bit when parity is wanted. The SQL oracle
    * (q42) mirrors THIS renormalized semantics.
    *
    * Returns null when every neighbor is null (0/0 → null).
    */
  def idw(value: Column, dist: Column): Column = {
    val w = weight(dist)
    sum(when(value.isNotNull, w * value)) /
      sum(when(value.isNotNull, w))
  }

  /** Reference-parity IDW: numerator skips null values (np.nansum over
    * w·v where NaN poisons the product) but the normalizer sums the
    * weights of ALL neighbors, null-valued or not — exactly
    * `np.nansum(w*v)/np.nansum(w)` of trackplot_hycom.py:32-34, where
    * `w` never contains NaN. With any masked neighbor present the two
    * variants differ by the factor Σw_all / Σw_nonnull.
    */
  def idwReferenceParity(value: Column, dist: Column): Column = {
    val w = weight(dist)
    sum(when(value.isNotNull, w * value)) / sum(w)
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
