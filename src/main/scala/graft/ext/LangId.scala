package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED language identification — the round-12 upgrade of
  * `text_profile`'s character-class heuristic (VERDICT r11 item 6):
  * now that the charset subsystem decodes legacy pages correctly,
  * the curation quality lever is a real classifier over
  * language-discriminative character n-grams, built exactly like
  * [[QualityModel]] (the fastText-shaped slot in public CCNet/
  * RefinedWeb-style recipes, re-expressed engine-native):
  *
  *  - features are counts of a FIXED, documented n-gram set, length-
  *    normalized — each count is `(len(text) − len(replace(text, g,
  *    ''))) / len(g)`, a codegen-able expression a SQL oracle replays
  *    verbatim (no hashing trick, no UDF);
  *  - training is one-vs-rest logistic regression through
  *    [[QualityModel.train]] (one distributed vecSum aggregate per
  *    iteration, model state ≪ data);
  *  - scoring is K σ(w_k·x) columns with literal weights inside one
  *    codegen span; the language is the deterministic argmax (ties
  *    break in [[Langs]] order).
  *
  * Scale shape: featurize+score is a narrow per-row pass — no
  * shuffle, no state — so batch and streaming plans are identical
  * (the [[graft.streaming.DocStreams.langGate]] composition) and the
  * pass parallelizes embarrassingly at 100 TB.
  */
object LangId {

  val Langs: Seq[String] = Seq("en", "de", "fr", "es")

  /** the fixed feature n-grams (4 per language, function-word
    * anchored — the classic char-n-gram language signal)
    */
  val Ngrams: Seq[String] = Seq(
    " the ", " and ", " of ", " to ",
    " der ", " und ", " die ", " mit ",
    " les ", " des ", " est ", " une ",
    " los ", " las ", " para ", " como ")

  val Dim: Int = 1 + Ngrams.length

  /** occurrence count of literal `g` — the replace/length identity
    * both engines evaluate exactly
    */
  private def cnt(text: Column, g: String): Column =
    (length(text) - length(replace(text, lit(g), lit("")))) / g.length

  /** [1, min(1, 8·count_g/len)…] over ' '+text+' ' (so edge words
    * count); all components in [0,1] for GD
    */
  def features(textCol: Column): Column = {
    val padded = concat(lit(" "), textCol, lit(" "))
    val len = greatest(length(padded).cast("double"), lit(1.0))
    array(lit(1.0) +: Ngrams.map(g =>
      least(lit(1.0), cnt(padded, g).cast("double") * 8.0 / len)): _*)
  }

  def featurize(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), features(col(textCol)).as("features"))

  /** one-vs-rest training: K binary heads through
    * [[QualityModel.train]]; `labeled` needs `features` + `lang`
    */
  def train(labeled: DataFrame, iters: Int = 80, lr: Double = 4.0): Seq[Array[Double]] =
    Langs.map { l =>
      QualityModel.train(
        labeled.withColumn("__y", (col("lang") === l).cast("int")),
        "features", "__y", iters = iters, lr = lr)
    }

  /** per-language σ(w_k·x) scores, literal weights in codegen */
  def scores(featCol: Column, weights: Seq[Seq[Double]]): Seq[Column] =
    weights.map(w => QualityModel.score(featCol, w))

  /** deterministic argmax over the K scores, ties in [[Langs]] order
    * — the exact comparison chain the SQL twin states
    */
  def classify(featCol: Column, weights: Seq[Seq[Double]]): Column = {
    val s = scores(featCol, weights)
    when(s(0) >= s(1) && s(0) >= s(2) && s(0) >= s(3), lit(Langs(0)))
      .when(s(1) >= s(2) && s(1) >= s(3), lit(Langs(1)))
      .when(s(2) >= s(3), lit(Langs(2)))
      .otherwise(lit(Langs(3)))
  }

  /** Weights trained by `tools/LangIdTrain` (one-vs-rest GD over a
    * deterministic 4-language synthetic corpus disjoint from every
    * oracle corpus; LangIdSpec RE-TRAINS and asserts holdout accuracy
    * and sign structure) and PINNED as literals — the q98 convention:
    * a trained model is a weight vector, and pinning one makes the
    * whole featurize → K·σ(w·x) → argmax path oracle-checkable.
    */
  val PinnedW: Seq[Seq[Double]] = Seq(
    // en
    Seq(-1.4950, 4.7379, 4.6472, 4.6338, 4.7324, -1.5872, -1.5487, -1.5469,
      -1.5837, -1.5703, -1.5391, -1.5382, -1.5760, -1.4786, -1.4531, -1.4547,
      -1.4815),
    // de
    Seq(-1.4655, -1.6102, -1.5782, -1.5746, -1.6096, 4.7160, 4.6086, 4.6021,
      4.7075, -1.5864, -1.5548, -1.5540, -1.5922, -1.4944, -1.4686, -1.4703,
      -1.4973),
    // fr
    Seq(-1.4359, -1.6259, -1.5936, -1.5900, -1.6253, -1.6191, -1.5799, -1.5781,
      -1.6156, 4.6716, 4.5731, 4.5766, 4.6828, -1.5098, -1.4838, -1.4854,
      -1.5127),
    // es
    Seq(-1.2164, -1.7448, -1.7102, -1.7063, -1.7441, -1.7382, -1.6962, -1.6943,
      -1.7344, -1.7207, -1.6864, -1.6856, -1.7268, 4.3896, 4.3138, 4.3195,
      4.4002))
}
