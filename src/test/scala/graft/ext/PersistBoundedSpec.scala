package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bounded persist registry behind the candidate tables: CacheManager
  * keys entries by canonical plan, so the registry must dedupe re-pins of
  * the same pipeline — a naive FIFO would evict the OLD pin and silently
  * uncache the entry the NEW pin shares with it.
  */
class PersistBoundedSpec extends graft.SparkSpec {

  private def samePlan(): DataFrame = {
    import spark.implicits._
    (1 to 100).toDF("x").filter($"x" % 2 === 0).select(($"x" * 3).as("y"))
  }

  private def distinctPlan(k: Int): DataFrame = {
    import spark.implicits._
    (1 to 100).toDF("x").select(($"x" + k).as(s"y$k"))
  }

  test("re-pinning the same plan dedupes; the shared cache entry survives") {
    for (_ <- 0 until 10) Dedup.persistBounded(samePlan())
    // a fresh frame with the same canonical plan must still hit cache
    assert(samePlan().storageLevel.useMemory,
      "same-plan re-pins evicted the shared CacheManager entry")
    samePlan().unpersist()
  }

  test("distinct plans evict oldest-first, bounded at the registry size") {
    val frames = (0 until 7).map(k => Dedup.persistBounded(distinctPlan(k)))
    assert(!frames.head.storageLevel.useMemory, "oldest frame not evicted")
    assert(frames.takeRight(4).forall(_.storageLevel.useMemory),
      "a frame inside the bound was evicted")
    frames.foreach(_.unpersist())
  }
}
