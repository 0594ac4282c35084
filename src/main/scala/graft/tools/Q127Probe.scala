package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-9 A/B: q127 PII scrub, java.util.regex 6-pass form vs the
  * fused hand-scanner kernel, same session, min-of-3, noop-write.
  * `sbt "runMain graft.tools.Q127Probe [sf10Dir]"`.
  */
object Q127Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.ext.TextOps.{EmailRe, Ipv4Re, PhoneRe}

    spark.read.parquet(s"$dir/documents.parquet").count()

    def q127Input(s: SparkSession) = {
      import s.implicits._
      graft.Tables.docsPar(s, dir).select($"doc_id",
        concat($"text",
          when($"doc_id" % 7 === 0,
            concat(lit(" contact user"), $"doc_id".cast("string"),
              lit("@example.com now"))).otherwise(lit("")),
          when($"doc_id" % 5 === 0,
            concat(lit(" from 10.0."), ($"doc_id" % 256).cast("string"),
              lit("."), ($"doc_id" % 100).cast("string"), lit(" up")))
            .otherwise(lit("")),
          when($"doc_id" % 11 === 0,
            concat(lit(" call +1-555-"), (lit(1000) + $"doc_id" % 9000).cast("string"),
              lit(" ok"))).otherwise(lit(""))).as("text"))
    }

    def timed(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[q127] $label%-28s $t%6.2f s")
    }

    val in = q127Input(spark)
    timed("regex 6-pass (old form)") {
      in.select(col("doc_id"),
        regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_email"),
        regexp_count(col("text"), lit(Ipv4Re)).cast("long").as("n_ipv4"),
        regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phone"),
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          lit(EmailRe), lit("<EMAIL>")), lit(Ipv4Re), lit("<IP>")),
          lit(PhoneRe), lit("<PHONE>")).as("redacted"))
    }
    timed("pii_scan fused kernel (new)") {
      graft.ext.TextOps.piiScrub(in, "doc_id", "text")
    }
    spark.stop()
  }
}
