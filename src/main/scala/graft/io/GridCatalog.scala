package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7/J5: dataset-catalog selection across model experiments
  * (`find_hycom_dir`, trackplot_hycom.py:173-184).
  *
  * The reference probes each HYCOM experiment's time axis and picks
  * ONE experiment covering the storm's FIRST hour (`:178`) — a
  * documented bug for storms spanning experiment boundaries
  * (SURVEY.md §2.9): later fixes silently read out-of-coverage data.
  * Here selection is PER ROW: every track fix joins the experiment
  * whose [t_min, t_max] covers it (interval-containment range join
  * against a broadcast catalog), ties broken toward the
  * latest-starting experiment (reanalyses supersede older runs).
  */
object GridCatalog {

  /** Build the catalog (dataset, path, t_min, t_max) by reading each
    * dataset's time coverage — a metadata-scale aggregate over the
    * `time` partition column (partition listing, not data).
    */
  def build(spark: SparkSession, datasets: Map[String, String]): DataFrame =
    datasets.map { case (name, path) =>
      spark.read.parquet(path)
        .agg(min(col("time")).as("t_min"), max(col("time")).as("t_max"))
        .select(lit(name).as("dataset"), lit(path).as("path"),
          col("t_min"), col("t_max"))
    }.reduce(_ unionByName _)

  /** Per-row dataset assignment: track + (dataset, path) of the
    * covering experiment, null when nothing covers the fix. The
    * catalog is tiny (one row per experiment) and broadcasts; the
    * track side shuffles once for the per-fix argmax collapse.
    */
  def assign(track: DataFrame, catalog: DataFrame,
             hourCol: String = "hour"): DataFrame = {
    // collapse on a SURROGATE row key, not the track columns (ADVICE
    // r2): grouping by every track column silently merged
    // fully-duplicate track rows (multiplicity change) and required
    // every column type to be groupable. The id is partition-local
    // arithmetic (no shuffle to mint), each input row keeps exactly
    // one output row, and the track attributes ride along in a struct
    // (first() of a per-key-constant value — any column type works).
    val withKey = track.withColumn("__row_id", monotonically_increasing_id())
    val joined = withKey.join(
      broadcast(catalog),
      col(hourCol) >= col("t_min") && col(hourCol) <= col("t_max"),
      "left")
    val pick = max_by(
      struct(col("dataset"), col("path")),
      // latest-starting covering experiment wins; null coverage loses
      when(col("t_min").isNotNull, struct(col("t_min"), col("dataset"))))
    joined
      .groupBy(col("__row_id"))
      .agg(first(struct(track.columns.map(col): _*)).as("__row"),
        pick.as("__pick"))
      .select(col("__row.*") +:
        Seq(col("__pick.dataset").as("dataset"),
            col("__pick.path").as("dataset_path")): _*)
  }
}
