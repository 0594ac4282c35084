package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{graftbridge => gb}
import graft.fn.SpaceSavingTopK

/** Bounded-state summary operators for 100 TB-scale profiling: the
  * Space-Saving heavy-hitters aggregate and deterministic bottom-k
  * hash sampling. Both keep per-group / per-job state O(k) no matter
  * how many rows flow through — the property that separates "profile
  * the corpus" from "shuffle the corpus".
  */
object Sketches {

  /** Per-group top-k frequent items via the native
    * [[graft.fn.SpaceSavingTopK]] aggregate —
    * `array<struct<item, cnt, err>>`, count-desc. One shuffle with
    * map-side partial aggregation; O(capacity) state per group.
    * Exact (err = 0) whenever the group distinct-item cardinality
    * stays ≤ capacity; otherwise counts under-estimate by ≤ err ≤
    * N/(capacity+1) (Misra–Gries; amortized O(1) updates).
    */
  def topkFreq(item: Column, capacity: Int, k: Int): Column =
    gb.column(SpaceSavingTopK(gb.expression(item), capacity, k)
      .toAggregateExpression())

  /** Weighted form: each row contributes `weight` (long, > 0; null or
    * non-positive rows are ignored). Composes with pre-aggregation —
    * per-document token counts roll up to corpus heavy hitters
    * without re-exploding the corpus.
    */
  def topkFreqWeighted(item: Column, weight: Column, capacity: Int, k: Int): Column =
    gb.column(SpaceSavingTopK(gb.expression(item), gb.expression(weight),
      capacity, k).toAggregateExpression())

  /** Heavy hitters per group, exploded to one row per (group, rank):
    * `groupCols..., rk (1-based), item, cnt, err`. The scalable
    * alternative to `groupBy(group, item).count` + window-rank, which
    * at 100 TB shuffles every distinct (group, item) pair and sorts
    * unbounded groups; this shuffles only O(capacity) per group.
    */
  def heavyHitters(df: DataFrame, groupCols: Seq[String], item: Column,
                   capacity: Int, k: Int): DataFrame = {
    df.groupBy(groupCols.map(col): _*)
      .agg(topkFreq(item, capacity, k).as("__tk"))
      .select(groupCols.map(col) ++ Seq(posexplode(col("__tk"))): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("int").as("rk"),
        col("col.item").as("item"),
        col("col.cnt").as("cnt"),
        col("col.err").as("err")): _*)
  }

  /** 60-bit md5-derived order key — byte-identical in DuckDB as
    * `CAST(CONCAT('0x', SUBSTR(md5(x), 1, 15)) AS BIGINT)`, so
    * hash-ordered samples are reproducible cross-engine (same
    * construction as [[Dedup.ParityHasher]], without the mod-P fold:
    * sampling wants the full 60 bits to make order ties negligible).
    */
  def orderHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** PRODUCTION order key — xxhash64 of the key string masked to the
    * non-negative range (63 uniform bits; dropping the sign bit of a
    * uniform 64-bit hash keeps uniformity, and keeps the ordering
    * convention "smaller = selected" identical to [[orderHash]]).
    * Same role, ~20× cheaper per key than the md5 digest — the exact
    * trade the winnow family's `_xx` twins made in round 6: md5 stays
    * the ORACLE default because DuckDB reproduces it bit-for-bit;
    * a corpus run with no oracle in the loop should prefer this.
    * Hash values are not comparable between the two hashers.
    */
  def orderHashXx(key: Column): Column =
    xxhash64(key.cast("string")).bitwiseAND(lit(Long.MaxValue))

  /** Deterministic uniform sample WITHOUT a full shuffle or sort: the
    * k rows with the smallest [[orderHash]] (the classic bottom-k /
    * KMV sample — uniform over distinct keys, stable under reruns and
    * engine changes, mergeable across partitions). Physically a
    * TakeOrderedAndProject: each partition keeps a k-element heap and
    * the driver merges #partitions × k candidates — no exchange of
    * the data itself, which is what `ORDER BY rand() LIMIT k` costs
    * when the optimizer cannot see through the non-determinism.
    */
  def sampleBottomK(df: DataFrame, key: Column, k: Int,
                    xx: Boolean = false): DataFrame =
    df.withColumn("__h", if (xx) orderHashXx(key) else orderHash(key))
      .orderBy(col("__h"), key)
      .limit(k)
      .drop("__h")

  /** The k rows with the smallest `sortKeys` value per group, via the
    * bounded [[graft.fn.BottomKRows]] aggregate — the shared engine of
    * the whole per-stratum sampling family ([[stratifiedBottomK]],
    * [[weightedBottomK]], [[graft.ext.Corpus.quotaSample]]).
    *
    * Scale shape: each map task retains k rows per group (O(1)
    * root-compare rejection in steady state), the exchange carries
    * only #partitions × k rows per group, and NOTHING is globally
    * sorted — the per-group analogue of [[sampleBottomK]]'s
    * TakeOrderedAndProject. The `row_number().over(Window.partitionBy
    * (stratum))` form this replaces serialized every row of a stratum
    * into ONE task and sorted it there: with a handful of sources
    * over a 100 TB corpus, a single-task sort of ~trillions of rows —
    * the textbook skew scale-killer, and invisible at test SF because
    * local strata are small.
    *
    * `sortKeys` must be a TOTAL order (append a unique tie-break
    * column) and non-null — rows with a null sort field are skipped.
    * Output column set, types, and row multiset are identical to the
    * window form; only the plan changes.
    */
  def bottomKRows(df: DataFrame, groupCols: Seq[String],
                  sortKeys: Seq[Column], k: Int): DataFrame = {
    val cols = df.columns.toSeq
    val payload = struct(cols.map(col): _*)
    val child = struct(
      sortKeys.zipWithIndex.map { case (c, i) => c.as(s"__s$i") } :+
        payload.as("__p"): _*)
    val agg = gb.column(graft.fn.BottomKRows(
      gb.expression(child), sortKeys.length, k).toAggregateExpression())
    df.groupBy(groupCols.map(col): _*)
      .agg(agg.as("__bk"))
      .select(explode(col("__bk")).as("__r"))
      .select(cols.map(c => col("__r").getField(c).as(c)): _*)
  }

  /** Per-group (stratified) bottom-k sample: k deterministic uniform
    * picks per group, same order-hash construction as
    * [[sampleBottomK]]. One shuffle carrying O(partitions × k) rows
    * per group ([[bottomKRows]]) — use the global form when no strata
    * are needed (it never shuffles the data at all).
    */
  def stratifiedBottomK(df: DataFrame, groupCols: Seq[String], key: Column,
                        k: Int, xx: Boolean = false): DataFrame =
    bottomKRows(df, groupCols,
      Seq(if (xx) orderHashXx(key) else orderHash(key), key), k)

  /** The [[orderHash]] span: 15 hex digits = 2⁶⁰ possible values, so
    * h/2⁶⁰ is uniform on [0, 1).
    */
  val OrderHashSpan: Double = math.pow(2.0, 60)

  /** Deterministic WEIGHTED sample without replacement (Efraimidis &
    * Spirakis 2006, "Weighted random sampling with a reservoir"): each
    * row ranks by key = −ln(u)/w with u = (orderHash(rowKey)+0.5)/2⁶⁰
    * — u deterministic-uniform, so the k smallest keys per group are
    * an exact A-ES weighted sample, stable under reruns, partitioning,
    * and engine changes (the same md5 + ln arithmetic replays in SQL —
    * the ln-parity the q102/q109/q119 hash matches already pin).
    * Rows with weight ≤ 0 are excluded (zero-weight rows have no
    * selection probability; a negative weight is a caller bug).
    * The quality-weighted data-mixing primitive: sampling ∝ quality
    * score / length / any per-row importance, with none of
    * `rand()`'s retry instability.
    */
  def weightedBottomK(df: DataFrame, groupCols: Seq[String],
                      rowKey: Column, weight: Column, k: Int,
                      xx: Boolean = false): DataFrame = {
    val span = if (xx) OrderHashXxSpan else OrderHashSpan
    val h = if (xx) orderHashXx(rowKey) else orderHash(rowKey)
    val u = (h.cast("double") + 0.5) / lit(span)
    val key = -log(u) / weight.cast("double")
    bottomKRows(df.filter(weight > 0), groupCols, Seq(key, rowKey), k)
  }

  /** The [[orderHashXx]] span: 63 masked bits. */
  val OrderHashXxSpan: Double = math.pow(2.0, 63)

  /** Per-group quantile estimates from a DETERMINISTIC bottom-k row
    * sample ([[graft.fn.SampleQuantiles]]): state = the k (hash,
    * value) pairs with smallest [[orderHash]] of a UNIQUE row key —
    * O(k) per group however large the group, mergeable,
    * merge-order-insensitive, and replayable in plain SQL (rank by
    * the same md5 hash, rk ≤ k, index the value-sorted sample at
    * ⌈q·m⌉). The determinism-first alternative to KLL/t-digest
    * `approx_percentile`: those buy better ε per byte with
    * randomized compaction, which no oracle can reproduce and no two
    * runs need agree on; a uniform k-sample's rank error
    * ≈ √(q(1−q)/k) is the price of a portable, auditable answer.
    * Exact when the group has ≤ k rows.
    */
  def sampleQuantiles(rowKey: Column, value: Column, k: Int,
                      qs: Seq[Double], xx: Boolean = false): Column =
    gb.column(graft.fn.SampleQuantiles(
      gb.expression(if (xx) orderHashXx(rowKey) else orderHash(rowKey)),
      gb.expression(value.cast("double")), k, qs))

  /** Per-group approximate COUNT DISTINCT via the native bounded KMV
    * aggregate ([[graft.fn.KmvDistinct]]): state = the k smallest
    * distinct [[orderHash]] values per group (O(k) no matter the
    * cardinality), estimate = (k−1)·2⁶⁰/h_k, EXACT below k distinct
    * keys. One shuffle with map-side partial merge — the
    * bounded-state, CROSS-ENGINE-REPRODUCIBLE alternative to both
    * `count_distinct` (unbounded state) and `approx_count_distinct`
    * (engine-private HLL sketch): a DuckDB oracle recomputes the
    * identical estimate from the same md5 hash and formula. Relative
    * standard error ≈ 1/√(k−2) (Bar-Yossef et al. 2002).
    */
  def kmvDistinct(key: Column, k: Int, xx: Boolean = false): Column =
    if (xx)
      gb.column(graft.fn.KmvDistinct(gb.expression(orderHashXx(key)), k,
        OrderHashXxSpan).toAggregateExpression())
    else
      gb.column(graft.fn.KmvDistinct(gb.expression(orderHash(key)), k,
        OrderHashSpan).toAggregateExpression())

  /** Per-group approximate COUNT DISTINCT via the native HyperLogLog
    * aggregate ([[graft.fn.HllDistinct]]): m = 2^p byte registers per
    * group (512 B at p = 9) no matter the cardinality, merged by
    * element-wise max — the cheapest mergeable distinct sketch when
    * cardinalities reach billions. Relative standard error ≈ 1.04/√m.
    * Same portability contract as [[kmvDistinct]]: the md5 default is
    * reproduced bit-for-bit by a DuckDB oracle (bucket/ρ/register-max
    * /harmonic-mean all plain SQL); `xx = true` swaps in the ~20×
    * cheaper xxhash64 for production runs with no oracle in the loop.
    */
  def hllDistinct(key: Column, p: Int, xx: Boolean = false): Column =
    if (xx)
      gb.column(graft.fn.HllDistinct(gb.expression(orderHashXx(key)), p, 63)
        .toAggregateExpression())
    else
      gb.column(graft.fn.HllDistinct(gb.expression(orderHash(key)), p, 60)
        .toAggregateExpression())

  /** One of the `depth` count-min row hashes for `item`: the 60-bit
    * md5 order hash of `"<row>#<item>"` mod `width` (or xxhash64 of
    * the same string for production). Deriving each row's hash from a
    * distinct prefixed string gives the pairwise-independent family
    * the CM guarantee needs, stays engine-portable, and costs one
    * digest per (row, item).
    */
  def cmsCell(row: Int, item: Column, width: Int, xx: Boolean = false): Column = {
    val keyed = concat_ws("#", lit(row), item.cast("string"))
    val h = if (xx) orderHashXx(keyed) else orderHash(keyed)
    pmod(h, lit(width.toLong)).cast("int")
  }

  /** Count-min sketch of an item stream (Cormode & Muthukrishnan
    * 2005): `depth × width` counters, cell (r, c) = Σ over items with
    * hash_r(item) = c of their weight. Returned as a DataFrame
    * `(r, c, cnt)` with ≤ depth·width rows — the 100 TB property:
    * the corpus collapses to a FIXED-size table (one shuffle keyed by
    * (r, c), map-side combined), against which any number of point
    * frequency queries then run without touching the corpus again.
    * Estimates are biased UP (collisions only add), never down;
    * err ≤ e·N/width with probability 1 − e^−depth.
    */
  def cmsSketch(items: DataFrame, item: Column, depth: Int, width: Int,
                xx: Boolean = false): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    val rows = (0 until depth).map { r =>
      items.select(lit(r).as("r"), cmsCell(r, item, width, xx).as("c"))
    }.reduce(_ unionAll _)
    rows.groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))
  }

  /** Point frequency estimates for `probes` (a DataFrame with an
    * `item` column) against a [[cmsSketch]]: est(q) = min over rows r
    * of sketch(r, hash_r(q)) — the count-min estimator. Physically
    * the sketch side is ≤ depth·width rows, so the join broadcasts
    * it; probing never rescans the stream the sketch summarized. A
    * probe whose cell was never touched estimates 0.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, item: Column,
                  depth: Int, width: Int, xx: Boolean = false): DataFrame = {
    val probed = (0 until depth).map { r =>
      probes.select(item.as("item"), lit(r).as("r"),
        cmsCell(r, item, width, xx).as("c"))
    }.reduce(_ unionAll _)
    probed.join(broadcast(sketch), Seq("r", "c"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
