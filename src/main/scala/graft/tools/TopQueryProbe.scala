package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Steady-state timing + job/stage/task counts for the bench's most
  * expensive queries — separates "one slow stage" from "too many
  * orchestration round-trips" (each AQE stage materialization is a
  * driver round-trip; each job a scheduling quantum).
  */
object TopQueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q80_neardup_cc", "q67_neardup_pairs", "q90_tfidf_topk",
      "q101_inverted_sharded", "q85_decontaminate", "q100_curation_pipeline")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(); val stages = new AtomicInteger()
    val tasks = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, dir).count() // warm: codegen + relation
      val reps = (0 until 4).map { _ =>
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50) // let listener drain
        (dt, jobs.get(), stages.get(), tasks.get())
      }
      val best = reps.minBy(_._1)
      println(f"[top] $n%-24s min=${best._1}%6.2f s  med=${reps.map(_._1).sorted.apply(2)}%6.2f s  jobs=${best._2}%3d stages=${best._3}%3d tasks=${best._4}%5d")
    }
    spark.stop()
  }
}
