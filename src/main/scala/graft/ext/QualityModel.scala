package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the "train a small classifier on
  * labeled good/bad documents, score the corpus, keep the top" step
  * of web-scale curation (the role fastText plays in the public
  * CCNet/RefinedWeb recipes), built entirely from the engine's own
  * primitives:
  *
  *  - features come from the narrow `text_profile` kernel (one codegen
  *    call per row, no shuffle);
  *  - training is full-batch logistic regression by gradient descent
  *    where each iteration is ONE distributed aggregate: the per-row
  *    gradient `(σ(w·x) − y)·x` is an element-wise scaled feature
  *    array, summed with the bounded-state [[SimJoin.vecSum]]
  *    aggregate — the only driver round-trip is the |w|-sized gradient
  *    (the same bounded pattern as `SimJoin.ivfCentroids`: model
  *    state ≪ data, data never moves);
  *  - scoring is `σ(w·x)` with the literal trained weights inside the
  *    codegen span ([[SimJoin.dotConst]]) — a narrow filter at any
  *    corpus size.
  *
  * The model is deliberately tiny (a linear head over profile
  * signals); the engine contribution is the DISTRIBUTED shape: at
  * 100 TB, featurize+score is embarrassingly parallel and training
  * touches the corpus `iters` times with nothing but a dim-sized
  * aggregate on the wire.
  */
object QualityModel {

  /** Feature vector from the per-row profile struct:
    * [1 (intercept), min(n_tokens/50, 1), stop_ratio, alpha_ratio,
    * punct_ratio, min(mean_tok_len/10, 1)]. All in [0,1] — GD needs
    * no per-feature scaling. Docs with no tokens get no row (same
    * convention as the profile operators).
    */
  val Dim = 6

  def featurize(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    TextOps.profileNarrow(docs, idCol, textCol)
      .select(col(idCol), array(
        lit(1.0),
        least(col("n_tokens") / 50.0, lit(1.0)),
        col("stop_ratio"),
        col("alpha_ratio"),
        col("punct_ratio"),
        least(col("mean_tok_len") / 10.0, lit(1.0))).as("features"))

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Full-batch logistic-regression GD. `labeled` needs `featCol`
    * (array<double>, length [[Dim]]-compatible) and `labelCol`
    * (0/1). Returns the weight vector. One [[SimJoin.vecSum]] job per
    * iteration; L2 on everything but the intercept.
    */
  def train(labeled: DataFrame, featCol: String, labelCol: String,
            iters: Int = 50, lr: Double = 2.0, l2: Double = 1e-4): Array[Double] = {
    require(iters > 0 && lr > 0, s"iters/lr must be positive; got $iters/$lr")
    val firstRow = labeled.select(size(col(featCol))).limit(1).collect()
    require(firstRow.nonEmpty, "train needs at least one labeled row")
    val dim = firstRow.head.getInt(0)
    val n = labeled.count().toDouble
    var w = new Array[Double](dim)
    var it = 0
    while (it < iters) {
      val err = sigmoid(SimJoin.dotConst(col(featCol), w.toSeq)) -
        col(labelCol).cast("double")
      val grad = labeled
        .select(transform(col(featCol), x => x * err).as("__g"))
        .agg(SimJoin.vecSum(col("__g")).as("__grad"))
        .head().getSeq[Double](0).toArray
      var j = 0
      while (j < dim) {
        val reg = if (j == 0) 0.0 else l2 * w(j)
        w(j) -= lr * (grad(j) / n + reg)
        j += 1
      }
      it += 1
    }
    w
  }

  /** σ(w·x) as a narrow column over `featCol` — the corpus-wide
    * scoring/filter pass (weights are literals inside codegen).
    */
  def score(featCol: Column, w: Seq[Double]): Column =
    sigmoid(SimJoin.dotConst(featCol, w))

  /** End-to-end: featurize docs, score with trained weights, keep
    * docs with score ≥ threshold. Narrow except the featurize
    * projection — the shape a 100 TB quality pass must have.
    */
  def filterByQuality(docs: DataFrame, idCol: String, textCol: String,
                      w: Seq[Double], threshold: Double): DataFrame =
    featurize(docs, idCol, textCol)
      .withColumn("q_score", score(col("features"), w))
      .filter(col("q_score") >= threshold)
      .select(col(idCol), col("q_score"))
}
