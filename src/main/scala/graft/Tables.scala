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
  * Keyed strongly by session in a bounded LRU (a WEAK session key
  * cannot work here: the cached DataFrames strongly reference their
  * owning session, so a value→key cycle would pin every entry
  * forever and the "collectable" claim would be false). Memory is bounded
  * instead: at most [[Tables.maxSessions]] sessions are retained,
  * least-recently-used evicted first — a hard bound that holds
  * regardless of GC behavior. Keyed by absolute path within a session
  * so distinct sf dirs coexist. Content-change invalidation is out of
  * scope (testdata is immutable within a run) — tests that rewrite a
  * path they already read must call [[Tables.invalidate]].
  */
object Tables {

  /** Hard cap on retained sessions (LRU beyond this). */
  val maxSessions = 8

  private val bySession =
    new java.util.LinkedHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]](
      16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]])
        : Boolean = size() > maxSessions
    }

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
