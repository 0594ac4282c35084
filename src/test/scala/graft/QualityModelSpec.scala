package graft

import graft.ext.QualityModel
import org.apache.spark.sql.functions._

/** Model-based quality filtering: the DataFrame-native logistic
  * trainer separates planted good/bad documents and the scoring pass
  * is a narrow plan.
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private def good(i: Int) =
    s"the cat and the dog number $i ran to the house and it was warm in the sun today"
  private def bad(i: Int) =
    s"zx$i!! ##%% 99$i @@qq ,,, !!$i== ``|| %%a"

  private val docs = ((0 until 60).map(i => (i.toLong, good(i), 1)) ++
    (0 until 60).map(i => (1000L + i, bad(i), 0))).toDF("doc_id", "text", "label")

  test("train separates planted good/bad docs; scores ordered; filter keeps good") {
    val feats = QualityModel.featurize(docs, "doc_id", "text")
      .join(docs.select($"doc_id", $"label"), "doc_id")
    val w = QualityModel.train(feats, "features", "label")
    assert(w.length === QualityModel.Dim)

    val scored = feats
      .withColumn("s", QualityModel.score($"features", w.toSeq))
      .select($"doc_id", $"label", $"s").as[(Long, Int, Double)].collect()
    val acc = scored.count { case (_, y, s) => (s >= 0.5) == (y == 1) }.toDouble /
      scored.length
    assert(acc >= 0.99, s"train accuracy $acc")
    // scores actually separate, not just straddle the threshold
    val minGood = scored.filter(_._2 == 1).map(_._3).min
    val maxBad = scored.filter(_._2 == 0).map(_._3).max
    assert(minGood > maxBad, s"overlap: minGood=$minGood maxBad=$maxBad")

    // held-out docs (unseen ids/content, same regimes) classify right
    val held = Seq(
      (5000L, "a warm evening and the quiet river was good to see in the end"),
      (5001L, "??!! 00-- ;;zz ^^## 11@@ ~~..")).toDF("doc_id", "text")
    val kept = QualityModel.filterByQuality(held, "doc_id", "text",
        w.toSeq, threshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(5000L), s"kept=$kept")
  }

  test("scoring plan is narrow: no shuffle, no generator, no UDF") {
    val w = Seq.fill(QualityModel.Dim)(0.1)
    val plan = QualityModel.filterByQuality(docs, "doc_id", "text", w, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Generate"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"), plan)
  }

  test("gradient job is one bounded aggregate per iteration") {
    val feats = QualityModel.featurize(docs, "doc_id", "text")
      .join(docs.select($"doc_id", $"label"), "doc_id")
    // loss decreases over iterations (separable data, fixed lr)
    def loss(w: Array[Double]): Double = {
      val s = feats.withColumn("p", QualityModel.score($"features", w.toSeq))
        .select(
          sum(when($"label" === 1, -log($"p")).otherwise(-log(lit(1.0) - $"p"))))
        .head().getDouble(0)
      s
    }
    val w10 = QualityModel.train(feats, "features", "label", iters = 10)
    val w50 = QualityModel.train(feats, "features", "label", iters = 50)
    assert(loss(w50) < loss(w10), s"${loss(w50)} !< ${loss(w10)}")
  }
}
