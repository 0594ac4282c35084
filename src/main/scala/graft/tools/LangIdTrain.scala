package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Derives [[graft.ext.LangId.PinnedW]]: one-vs-rest GD over a
  * deterministic 4-language synthetic corpus (word pools are
  * function-word anchored per language; doc words picked by LCG
  * arithmetic on the row id — disjoint from every oracle corpus).
  * Prints the weight matrix to paste into LangId.PinnedW, plus
  * holdout accuracy.
  */
object LangIdTrain {

  val Pools: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "people", "first", "water", "time",
      "word", "small", "great", "house"),
    "de" -> Seq("der", "und", "die", "mit", "nicht", "haus", "wasser", "zeit",
      "wort", "klein", "gross", "leute"),
    "fr" -> Seq("les", "des", "est", "une", "gens", "premier", "eau", "temps",
      "mot", "petit", "grande", "maison"),
    "es" -> Seq("los", "las", "para", "como", "gente", "primero", "agua",
      "tiempo", "palabra", "casa", "grande", "tierra"))

  /** deterministic doc: 14 words from the language pool */
  def doc(lang: String, seed: Long): String = {
    val pool = Pools(lang)
    (0 until 14).map(k => pool(((seed * 31 + k * 7 + seed / 13) % pool.size).toInt.abs))
      .mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val langs = graft.ext.LangId.Langs
    val train = (0 until 2000).map { i =>
      val lang = langs(i % 4)
      (i.toLong, lang, doc(lang, 1000 + i))
    }.toDF("id", "lang", "text")
    val feats = graft.ext.LangId.featurize(train, "id", "text")
      .join(train.select($"id", $"lang"), "id")
    val w = graft.ext.LangId.train(feats)
    println("[langid] trained weights (paste into LangId.PinnedW):")
    w.zip(langs).foreach { case (wk, l) =>
      println(s"    // $l")
      println("    Seq(" + wk.map(v => f"$v%.4f").mkString(", ") + "),")
    }
    // holdout
    val test = (0 until 400).map { i =>
      val lang = langs(i % 4)
      (i.toLong, lang, doc(lang, 90000 + i * 3))
    }.toDF("id", "lang", "text")
    val pred = graft.ext.LangId.featurize(test, "id", "text")
      .withColumn("pred", graft.ext.LangId.classify($"features", w.map(_.toSeq)))
      .join(test.select($"id", $"lang"), "id")
    val acc = pred.select(avg(($"pred" === $"lang").cast("double"))).head.getDouble(0)
    println(f"[langid] holdout accuracy ${acc * 100}%.1f%%")
    spark.stop()
  }
}
