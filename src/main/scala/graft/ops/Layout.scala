package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout control for scan locality: Z-order (Morton) clustering.
  *
  * At 100 TB the cheapest predicate is the one that never reads its
  * input: parquet keeps per-row-group min/max stats for every column,
  * and the reader skips a row group when a pushed predicate cannot
  * match its range. Stats only help if the data is CLUSTERED on the
  * predicate columns — a multi-dimensional sort problem, solved the
  * standard way (Delta OPTIMIZE ZORDER BY, Iceberg sort orders): map
  * each row to its Morton code (bit-interleaved quantized
  * coordinates), then range-partition + sort by that single key. Rows
  * close in N-dim space land in the same row groups, so a box
  * predicate on ANY subset of the dimensions prunes most groups —
  * unlike a lexicographic sort, which only helps its leading column.
  *
  * Pure built-in bitwise columns (shiftright/and/or) — the whole key
  * stays inside whole-stage codegen; no custom kernel, no UDF.
  */
object Layout {

  /** Quantize `c` from [min, max] onto the `bits`-bit integer grid
    * (clamped; nulls → cell 0 so they cluster together).
    */
  def quantize(c: Column, min: Double, max: Double, bits: Int): Column = {
    require(max > min, s"need max > min, got [$min, $max]")
    val cells = (1L << bits) - 1
    val scaled = (c.cast("double") - lit(min)) / lit(max - min) * lit(cells.toDouble)
    coalesce(least(greatest(scaled.cast("long"), lit(0L)), lit(cells)), lit(0L))
  }

  /** Morton code of pre-quantized cell ids (each in [0, 2^bits)):
    * bit i of dimension d lands at position i * nDims + d. Dimension
    * count × bits must fit a long (≤ 63 bits total).
    */
  def interleave(cells: Seq[Column], bits: Int): Column = {
    val nDims = cells.size
    require(nDims >= 1, "need at least one dimension")
    require(nDims * bits <= 63, s"$nDims dims x $bits bits exceeds a long")
    val pieces = for {
      i <- 0 until bits
      (cell, d) <- cells.zipWithIndex
    } yield shiftleft(shiftright(cell, i).bitwiseAND(lit(1L)), i * nDims + d)
    pieces.reduce(_.bitwiseOR(_))
  }

  /** Z-order key for `(column, min, max)` dimensions on a shared
    * `bits`-deep grid.
    */
  def zorderKey(dims: Seq[(Column, Double, Double)], bits: Int): Column =
    interleave(dims.map { case (c, lo, hi) => quantize(c, lo, hi, bits) }, bits)

  /** Cluster `df` into `numFiles` Z-ordered output slices:
    * range-partition by the Morton key (contiguous, balanced key
    * ranges per file — sampling picks the split points, so skew in
    * the key space does not skew file sizes), then sort inside each
    * partition so row groups within a file stay tight too. Write the
    * result with any sink; every retained column's min/max stats
    * become selective for predicates on the Z dimensions.
    */
  def zorder(df: DataFrame, dims: Seq[(Column, Double, Double)],
             bits: Int = 16, numFiles: Int = 64): DataFrame = {
    val keyed = df.withColumn("__z", zorderKey(dims, bits))
    keyed.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
