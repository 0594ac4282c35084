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

  /** Full-batch logistic-regression GD with early stopping. `labeled`
    * needs `featCol` (array<double>, length [[Dim]]-compatible) and
    * `labelCol` (0/1). Returns the weight vector. One job per
    * iteration — the [[SimJoin.vecSum]] gradient aggregate CARRIES the
    * log-loss in the same pass; when the relative loss improvement
    * falls below `tol` the loop stops (separable profile features
    * typically converge in 10-20 iterations, not the `iters` cap).
    * L2 on everything but the intercept.
    *
    * Scale shape: quality classifiers train on a LABELED SAMPLE (the
    * fastText-style curation recipe), never the corpus — rows beyond
    * `maxTrainRows` are deterministically down-sampled (hash-threshold
    * on the (features, label) content, retry-stable) and the training
    * frame is PERSISTED so each iteration re-reads the bounded sample,
    * not the full input lineage. Rows with null features are dropped
    * BEFORE counting, so the 1/n gradient scale matches exactly the
    * rows the aggregate sums over.
    */
  def train(labeled: DataFrame, featCol: String, labelCol: String,
            iters: Int = 50, lr: Double = 2.0, l2: Double = 1e-4,
            tol: Double = 1e-6, maxTrainRows: Long = 100000L): Array[Double] = {
    require(iters > 0 && lr > 0, s"iters/lr must be positive; got $iters/$lr")
    require(maxTrainRows > 0, s"maxTrainRows must be positive; got $maxTrainRows")
    val nonNull = labeled.filter(col(featCol).isNotNull)
    val total = nonNull.count()
    require(total > 0, "train needs at least one labeled row with non-null features")
    val sampled =
      if (total <= maxTrainRows) nonNull
      else nonNull.filter(
        shiftrightunsigned(xxhash64(col(featCol), col(labelCol)), 11)
          .cast("double") * lit(math.pow(2, -53)) <
          lit(maxTrainRows.toDouble / total))
    val train = sampled.persist()
    try {
      val firstRow = train.select(size(col(featCol))).limit(1).collect()
      require(firstRow.nonEmpty, "train sample is empty")
      val dim = firstRow.head.getInt(0)
      val n = train.count().toDouble
      var w = new Array[Double](dim)
      var prevLoss = Double.MaxValue
      var it = 0
      var converged = false
      while (it < iters && !converged) {
        val p = sigmoid(SimJoin.dotConst(col(featCol), w.toSeq))
        val y = col(labelCol).cast("double")
        val row = train
          .select(transform(col(featCol), x => x * (p - y)).as("__g"),
            (-(y * log(greatest(p, lit(1e-15))) +
              (lit(1.0) - y) * log(greatest(lit(1.0) - p, lit(1e-15)))))
              .as("__l"))
          .agg(SimJoin.vecSum(col("__g")).as("__grad"), sum(col("__l")).as("__loss"))
          .head()
        val grad = row.getSeq[Double](0).toArray
        val loss = row.getDouble(1) / n
        var j = 0
        while (j < dim) {
          val reg = if (j == 0) 0.0 else l2 * w(j)
          w(j) -= lr * (grad(j) / n + reg)
          j += 1
        }
        converged = prevLoss - loss < tol * math.max(prevLoss, 1.0)
        prevLoss = loss
        it += 1
      }
      w
    } finally train.unpersist()
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
