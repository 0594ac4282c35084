package graft

/** Shared DuckDB-SQL generators for oracle queries that mirror engine
  * modules parameterized by compile-time constants (LSH plane
  * matrices, band geometry). Keeping one generator guarantees q73/q74
  * mirror the SAME bucket arithmetic as graft.ext.SimJoin.buckets.
  */
object OracleSqlGen {

  def planeLit(p: Seq[Double]): String =
    p.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]")

  /** CTEs `e` (cast vectors, optionally filtered), `bits` (one sign
    * bit per plane) and `bkt` (banded bit codes) — the SQL mirror of
    * SimJoin.buckets over the same plane literals.
    */
  def annBucketCtes(planes: Seq[Seq[Double]], b: Int,
                    vecFilter: String = ""): String = {
    val r = planes.size / b
    require(planes.size % b == 0, s"${planes.size} planes not divisible into $b bands")
    val bitDefs = planes.zipWithIndex.map { case (p, i) =>
      s"CASE WHEN LIST_DOT_PRODUCT(v, ${planeLit(p)}) >= 0 THEN 1 ELSE 0 END AS bit$i"
    }.mkString(",\n    ")
    val codes = (0 until b).map { bi =>
      (0 until r).map(j => s"${1 << j} * bit${bi * r + j}").mkString(" + ")
    }.mkString("[", ", ", "]")
    val bands = (0 until b).mkString("[", ", ", "]")
    s"""e AS (
       |  SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings$vecFilter
       |), bits AS (
       |  SELECT vec_id,
       |    $bitDefs
       |  FROM e
       |), bkt AS (
       |  SELECT vec_id, band, code FROM (
       |    SELECT vec_id, UNNEST($bands) AS band, UNNEST($codes) AS code FROM bits)
       |)""".stripMargin
  }
}
