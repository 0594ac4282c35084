package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.{graftbridge => gb}

/** Semi-join reduction via a Bloom filter — the classic 100 TB
  * shuffle-diet: build a compact membership sketch over the small
  * (already-filtered) side's join keys, and drop non-matching fact
  * rows BEFORE the join's exchange, so the shuffle moves only rows
  * that can possibly match. Uses Spark's own native machinery
  * (`BloomFilterAggregate` + `BloomFilterMightContain`, the codegen
  * expressions behind `spark.sql.optimizer.runtime.bloomFilter`) —
  * this operator is the explicit, always-available form for when the
  * optimizer's injection thresholds don't fire (missing stats, build
  * side over the 10 MB creation threshold, non-shuffle join plans).
  *
  * The sketch round-trips through the driver as ONE compact binary
  * (the same evaluation Spark's injected runtime filter performs on
  * its build-side subquery); the fact table itself never moves until
  * after the filter. False positives only pass extra rows into the
  * join, which the join then drops — results are exactly equal to the
  * plain join, which is what the q83 oracle checks.
  */
object BloomJoin {

  /** Optimal bit count for `n` items at false-positive rate `fpp`:
    * m = -n·ln(p)/ln(2)². 1 M keys at 3% ≈ 0.9 MB.
    */
  def numBits(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** Aggregate the build side's keys into a serialized Bloom filter
    * (distributed build, map-side combine; one sketch to the driver).
    * Returns null when the build side is empty.
    */
  def buildBloom(dim: DataFrame, dimKey: Column,
                 expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      gb.expression(xxhash64(dimKey)),
      Literal(expectedItems), Literal(numBits(expectedItems, fpp)))
    dim.select(gb.column(agg.toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]]("bf")
  }

  /** Keep only fact rows whose key might be in the sketch — a codegen
    * predicate evaluated at the scan, before any exchange.
    */
  def prefilter(fact: DataFrame, factKey: Column, bloom: Array[Byte]): DataFrame =
    if (bloom == null) fact.where(lit(false))
    else fact.where(gb.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), gb.expression(xxhash64(factKey)))))

  /** Equi-join with Bloom semi-join reduction on the fact side.
    * Result is row-for-row equal to `fact.join(dim, keys)`; the
    * difference is how many fact rows reach the join's shuffle.
    */
  def join(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
           expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bloom = buildBloom(dim, dim(dimKey), expectedItems, fpp)
    prefilter(fact, fact(factKey), bloom)
      .join(dim, fact(factKey) === dim(dimKey))
  }
}
