package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting (the brief's explicit scale technique;
  * complements AQE's runtime skew-join splitting, which only covers
  * sort-merge JOINS — a skewed AGGREGATION key or a broadcast-
  * ineligible join still needs manual salting).
  *
  * Mechanics: a hot key's rows are spread over `nSalts` synthetic
  * sub-keys, so no single task owns the whole key.
  *
  *  - [[saltedAgg]]: two-phase aggregation — partial agg on
  *    (key, salt), final agg on key. Correct for any algebraic
  *    aggregate (sum/count/min/max); the caller supplies both phases.
  *  - [[saltedJoin]]: skewed-left equi-join — left rows get a salt,
  *    the (smaller, but not broadcastable) right side is replicated
  *    `nSalts`× via explode, and the join key becomes (key, salt).
  *    Row multiplicity is unchanged: each left row meets each matching
  *    right row exactly once (on its own salt replica).
  *
  * The salt is `xxhash64` of a per-row unique expression —
  * deterministic given the input (no `rand()`: re-executed stages
  * must re-derive the same salt or shuffle retries corrupt results).
  */
object Salt {

  /** Deterministic per-row salt in [0, nSalts). `rowExpr` must be
    * unique-ish per row (an id column; NOT the join key — all rows of
    * a hot key would land on one salt).
    */
  def saltCol(rowExpr: Column, nSalts: Int): Column = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    pmod(xxhash64(rowExpr), lit(nSalts.toLong)).cast("int")
  }

  /** Two-phase salted aggregation.
    *
    * @param partial aggregates applied per (keys..., salt) — must be
    *                partial-izable (sum/count/min/max/...)
    * @param finalAgg aggregates combining the partials per key, seeing
    *                 the partial columns by their aliases
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], rowExpr: Column, nSalts: Int,
                partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(rowExpr, nSalts))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Skewed-left equi-join on `keys`: left salted per row, right
    * replicated across all salts. Inner or left joins only (right
    * rows are replicated, so right-outer semantics would duplicate
    * unmatched right rows).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftRowExpr: Column, nSalts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin supports inner/left joins, not $joinType")
    val saltedLeft = left.withColumn("__salt", saltCol(leftRowExpr, nSalts))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    // the right side is small by this operator's contract (a broadcast
    // candidate that didn't fit) — hash-build it per partition instead
    // of letting the planner pick sort-merge, which would SORT the
    // huge salted left side; the skewed side should never be sorted
    saltedLeft.join(saltedRight.hint("shuffle_hash"), keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
