package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe: q72's JSON extraction cost by method (sf1 found
  * get_json_object 18× DuckDB's json_extract_string).
  */
object JsonProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    println(s"[jsonprobe] rows=${ev.count()}")

    def time(name: String)(f: => Long): Unit = {
      val runs = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[jsonprobe] $name%-24s ${runs.map(_._1).min}%6.2fs rows=${runs.head._2}")
    }

    time("get_json_object") {
      ev.select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("k")).agg(count(lit(1))).count()
    }
    time("from_json(struct)") {
      ev.select(from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k"))
        .groupBy(col("k")).agg(count(lit(1))).count()
    }
    time("variant_get(parse_json)") {
      ev.select(try_variant_get(parse_json(col("props")), "$.k", "int").as("k"))
        .groupBy(col("k")).agg(count(lit(1))).count()
    }
    spark.stop()
  }
}
