package graft

import graft.io.DocSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus interchange formats: JSONL round-trip under an explicit
  * schema, malformed-line quarantine, parser-level projection, and
  * the ORC columnar path with predicate pushdown visible in the plan.
  */
class DocSourceSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("jsonl round-trip: explicit schema, value-exact, no corrupt rows") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    DocSource.writeJsonl(docs, s"$dir/docs")
    val raw = DocSource.readJsonl(spark, s"$dir/docs", docSchema)
    val (clean, total, bad) = DocSource.cleanWithReport(raw)
    assert(total === docs.count())
    assert(bad === 0L)
    val a = docs.orderBy($"doc_id").collect().toSeq
    val b = clean.select(docs.columns.map(col): _*).orderBy($"doc_id").collect().toSeq
    assert(a === b)
  }

  test("jsonl: malformed lines quarantined, clean rows survive") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_bad").toString
    val f = new java.io.File(s"$dir/part-0.json")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("""{"doc_id": 1, "text": "alpha", "lang": "en", "source": "s", "n_chars": 5}""")
    w.println("""{"doc_id": 2, "text": "beta""")   // truncated object
    w.println("""not json at all""")
    w.println("""{"doc_id": 3, "text": "gamma", "lang": "en", "source": "s", "n_chars": 5}""")
    w.close()
    val raw = DocSource.readJsonl(spark, dir, docSchema)
    val (clean, total, bad) = DocSource.cleanWithReport(raw)
    assert(total === 4L)
    assert(bad === 2L)
    assert(clean.select($"doc_id").as[Long].collect().sorted === Seq(1L, 3L))
    // quarantined rows carry the raw line for forensics (a real column
    // must ride along — corrupt-only queries are disallowed, see
    // DocSource.cleanWithReport)
    val badLines = raw.filter(col(DocSource.CorruptCol).isNotNull)
      .select($"doc_id", col(DocSource.CorruptCol))
      .as[(Option[Long], String)].collect().map(_._2)
    assert(badLines.exists(_.contains("not json at all")))
  }

  test("jsonl: projection prunes the parse to requested fields") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_proj").toString
    DocSource.writeJsonl(docs, s"$dir/docs")
    val slim = DocSource.readJsonl(spark, s"$dir/docs", docSchema,
      columns = Seq("doc_id", "lang"))
    assert(slim.columns.toSeq === Seq("doc_id", "lang", DocSource.CorruptCol))
    val langs = slim.groupBy($"lang").count().collect().map(_.getLong(1)).sum
    assert(langs === docs.count())
  }

  test("orc round-trip: value-exact, filter pushed to the reader") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    DocSource.writeOrc(docs, s"$dir/docs")
    val back = DocSource.readOrc(spark, s"$dir/docs")
    assert(back.orderBy($"doc_id").collect().toSeq ===
      docs.orderBy($"doc_id").collect().toSeq)
    val plan = back.filter($"doc_id" < 10).select($"doc_id", $"lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"),
      s"expected ORC pushdown in plan:\n$plan")
  }
}
