package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, StringType}

/** Document-corpus interchange formats (LLM-pipeline ingest surface):
  * web-scale corpora ship as JSONL (one JSON object per line — the
  * format of Common-Crawl-derived sets, chat logs, instruction data)
  * and as columnar files (parquet/ORC). This module fixes the
  * scale-critical reader/writer policies once:
  *
  *  - **Explicit schema, never inference.** `spark.read.json` without
  *    a schema runs a FULL EXTRA PASS over the corpus to infer types
  *    — at 100 TB that doubles ingest cost and the inferred types
  *    drift with content. Every reader here takes a `StructType`.
  *  - **Malformed lines are data, not exceptions.** One corrupt line
  *    in a billion must not kill a 6-hour job: PERMISSIVE mode routes
  *    them to a corrupt-record column for quarantine accounting
  *    ([[readJsonl]] exposes the count; dropping them is an explicit
  *    downstream `filter`).
  *  - **Compression choices are split choices.** gzip JSONL is NOT
  *    splittable — one 10 GB .json.gz file = one task no matter the
  *    cluster; prefer many mid-size files (or zstd parquet/ORC) so
  *    `maxPartitionBytes` can parallelize the scan. Writers here
  *    default to the splittable columnar path for re-use and keep
  *    JSONL for interchange only.
  */
object DocSource {

  /** Quarantine column name for malformed JSONL lines. */
  val CorruptCol = "_corrupt_line"

  /** Strict-schema JSONL reader. Returns the declared columns plus
    * [[CorruptCol]] (null for clean rows, the raw line for malformed
    * ones). `columns` prunes the parse to the fields actually needed
    * — JSON parsing cost is per-FIELD, so projection pushdown into
    * the parser matters as much as column pruning in parquet.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
                columns: Seq[String] = Nil): DataFrame = {
    val wanted =
      if (columns.isEmpty) schema
      else StructType(schema.fields.filter(f => columns.contains(f.name)))
    val full = StructType(wanted.fields :+ StructField(CorruptCol, StringType))
    spark.read
      .schema(full)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Streaming form of [[readJsonl]]: a JSONL DIRECTORY as a
    * Structured Streaming file source (new files picked up per
    * micro-batch) with the same explicit-schema + PERMISSIVE
    * quarantine policy — the shape of a continuously-landing corpus
    * drop zone feeding [[graft.streaming.DocStreams]] gates. Same
    * scale rules as batch: schema is declared (inference is
    * impossible on an unbounded source anyway) and malformed lines
    * surface in [[CorruptCol]] instead of killing the query.
    */
  def readJsonlStream(spark: SparkSession, path: String, schema: StructType,
                      columns: Seq[String] = Nil,
                      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val wanted =
      if (columns.isEmpty) schema
      else StructType(schema.fields.filter(f => columns.contains(f.name)))
    val full = StructType(wanted.fields :+ StructField(CorruptCol, StringType))
    val rd = spark.readStream
      .schema(full)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
    maxFilesPerTrigger.foreach(n => rd.option("maxFilesPerTrigger", n.toString))
    rd.json(path)
  }

  /** JSONL writer (interchange/export). `compression` accepts none |
    * gzip | bzip2 | zstd — remember only bzip2 (slow) yields
    * SPLITTABLE compressed text; for anything re-read at scale,
    * [[writeOrc]]/parquet is the right sink.
    */
  def writeJsonl(df: DataFrame, path: String,
                 compression: String = "none"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)

  /** ORC sink with zstd — the columnar alternative when the consumer
    * is ORC-native (Hive/Trino ecosystems). Same predicate-pushdown +
    * column-pruning behavior as parquet in Spark's reader.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zstd").orc(path)

  /** ORC reader (schema from file metadata — columnar formats carry
    * their types; only TEXT formats need the explicit-schema rule).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Corpus-ingest hygiene report for a JSONL read: total lines,
    * malformed lines, and the surviving clean frame (corrupt column
    * dropped). One pass, one small aggregate.
    *
    * Spark refuses JSON-source queries whose required schema is ONLY
    * the corrupt column (after pruning it cannot re-derive the raw
    * line, UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
    * the aggregate references one real field as a witness to keep the
    * full-line parse alive. Any quarantine query downstream must do
    * the same (or persist first).
    */
  def cleanWithReport(raw: DataFrame): (DataFrame, Long, Long) = {
    val witness = raw.columns.find(_ != CorruptCol)
    val aggs = Seq(count(lit(1)).as("total"), count(col(CorruptCol)).as("bad")) ++
      witness.map(c => count(col(c)).as("__witness"))
    val counts = raw.agg(aggs.head, aggs.tail: _*).head()
    val clean = raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
    (clean, counts.getLong(0), counts.getLong(1))
  }
}
