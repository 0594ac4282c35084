package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16: isolate the ~300 ms/task cost observed in every 32-task
  * stage over the events table (q72's "JSON cost" reproduced with no
  * JSON at all?). Times minimal stages over the same exchange.
  */
object TaskFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("GRAFT_LOCAL_DIR", "/tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ev = spark.read.parquet(s"$dir/events.parquet")

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val runs = (0 until 4).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[taskfloor] $name%-34s ${runs.map(_._1).min}%6.3fs")
    }

    time("scan only: count")(ev.count())
    time("repart(32) + count")(ev.repartition(32).count())
    time("repart(32) + agg(bigint%200)")(
      ev.repartition(32).groupBy(($"event_id" % 200).as("k"))
        .agg(count(lit(1))).count())
    time("repart(8) + agg(bigint%200)")(
      ev.repartition(8).groupBy(($"event_id" % 200).as("k"))
        .agg(count(lit(1))).count())
    time("repart(32) + agg(props substr)")(
      ev.repartition(32).groupBy(substring($"props", 7, 2).as("k"))
        .agg(count(lit(1))).count())
    time("repart(32) + json + agg")(
      ev.repartition(32)
        .groupBy(get_json_object($"props", "$.k").cast("int").as("k"))
        .agg(count(lit(1))).count())
    // same but WITHOUT the ts normalization projection
    val evRaw = spark.read.parquet(s"$dir/events.parquet")
      .select($"event_id", $"props")
    time("props-only repart(32)+json+agg")(
      evRaw.repartition(32)
        .groupBy(get_json_object($"props", "$.k").cast("int").as("k"))
        .agg(count(lit(1))).count())
    spark.stop()
  }
}
