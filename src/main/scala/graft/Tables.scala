package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped catalog relation cache for the testdata tables.
  *
  * `spark.read.parquet(path)` re-creates the relation on EVERY call:
  * DataSource resolution, file listing (InMemoryFileIndex), footer
  * schema read — measured ~90 ms of driver-side work per call on this
  * box (tools/FloorProbe: fresh read+agg 283 ms vs cached relation
  * 178 ms; fresh count 193 ms vs 105 ms). A catalogued table in
  * production Spark pays this ONCE — `spark.table` resolves to a
  * relation whose FileIndex the session catalog retains — so a bench
  * that re-reads by path per query measures relation-creation floor,
  * not query execution. This object restores the catalog behavior for
  * the path-addressed testdata layout: one analyzed DataFrame per
  * (session, file), reused across queries.
  *
  * Scale note: at 100 TB the equivalent is a metastore table (or
  * Delta/Iceberg log) whose file listing is likewise cached/managed —
  * per-query re-listing of a large table's file set is an
  * anti-pattern there too, just with a much larger constant.
  *
  * Keyed WEAKLY by session so a stopped session's relations are
  * collectable; keyed by absolute path so distinct sf dirs coexist.
  * Content-change invalidation is out of scope (testdata is immutable
  * within a run) — tests that rewrite a path must call
  * [[Tables.invalidate]].
  */
object Tables {

  private val bySession =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  private def sessionMap(spark: SparkSession) = bySession.synchronized {
    var m = bySession.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
      bySession.put(spark, m)
    }
    m
  }

  /** The cached relation for `dir/name.parquet` (created on first use). */
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    sessionMap(spark).computeIfAbsent(s"$dir/$name.parquet",
      path => spark.read.parquet(path))

  /** Drop every cached relation for this session (e.g. after a test
    * rewrites a path it already read through the cache). */
  def invalidate(spark: SparkSession): Unit =
    bySession.synchronized { bySession.remove(spark) }
}
