package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{graftbridge => gb}

/** Byte-pair-encoding tokenizer: classic merge-rule training
  * (Sennrich et al. 2016) and a narrow codegen encoder — the real
  * subword tokenization a training-data pipeline needs for token
  * budgeting, packing, and vocabulary studies (the `text_profile`
  * token count is whitespace-level; this is the BPE-level count).
  *
  * Scale shape: BPE training NEVER iterates over the corpus — the
  * classic algorithm runs on the WORD-FREQUENCY DICTIONARY, which is
  * exactly [[LangModel.unigramCounts]]'s vocabulary-sized output (one
  * corpus shuffle), collected under a size guard and merged
  * driver-locally (sentencepiece/GPT-2 train the same way). Encoding
  * is a per-row kernel with the merge table riding the expression —
  * zero corpus bytes move, any corpus size.
  *
  * Conventions (documented, deterministic): word-internal merges
  * only (a word = whitespace token); candidate pairs score by total
  * frequency, ties break to the LEXICOGRAPHICALLY SMALLEST (left,
  * right) pair; merge ranks apply lowest-rank-first at encode time,
  * position ties leftmost-first.
  */
object Bpe {

  /** Classic BPE training over a word-frequency dictionary:
    * `numMerges` (left, right) rules in learned order. Driver-local —
    * the dictionary is vocabulary-sized by construction.
    */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    // current segmentation of each word; start at CODE POINTS (not
    // UTF-16 units — the encoder kernel and the q112 oracle both
    // treat a supplementary-plane character as one unit, and the
    // trainer must learn over the same alphabet)
    def codePointSegs(w: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var c = 0
      while (c < w.length) {
        val n = Character.charCount(w.codePointAt(c))
        out += w.substring(c, c + n)
        c += n
      }
      out.toArray
    }
    var words: Seq[(Array[String], Long)] = wordCounts
      .filter { case (w, c) => w.nonEmpty && c > 0 }
      .map { case (w, c) => (codePointSegs(w), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    while (step < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((segs, c) <- words; i <- 0 until segs.length - 1)
        pairCounts.updateWith((segs(i), segs(i + 1)))(o => Some(o.getOrElse(0L) + c))
      if (pairCounts.isEmpty) step = numMerges
      else {
        // max count, ties to lexicographically smallest pair
        val best = pairCounts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (segs, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < segs.length) {
            if (i < segs.length - 1 && segs(i) == best._1 && segs(i + 1) == best._2) {
              out += joined; i += 2
            } else { out += segs(i); i += 1 }
          }
          (out.toArray, c)
        }
        step += 1
      }
    }
    merges.toSeq
  }

  /** Train merge rules from a corpus: ONE vocabulary-sized shuffle
    * ([[LangModel.unigramCounts]]), dictionary collected under
    * `maxVocab`, merges learned driver-locally.
    */
  def trainOn(docs: DataFrame, textCol: String, numMerges: Int,
              maxVocab: Long = 4000000L): Seq[(String, String)] = {
    // one-job guard-and-fetch (the LangModel.collectModel pattern):
    // count()-then-collect() ran the counting shuffle twice
    val rows = LangModel.unigramCounts(docs, textCol)
      .limit((maxVocab + 1).toInt).collect()
    require(rows.length <= maxVocab,
      s"vocabulary exceeds maxVocab=$maxVocab; raise the guard or pre-truncate")
    train(rows.map(r => r.getString(0) -> r.getLong(1)).toSeq, numMerges)
  }

  /** Encode a text column: `array<string>` of BPE tokens (word-
    * internal merges under the learned ranks). Narrow codegen kernel
    * ([[graft.fn.BpeEncode]]); null text → null.
    */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    gb.column(graft.fn.BpeEncode(gb.expression(text), merges))

  /** BPE token count per doc — `size(encode(...))` without leaving
    * the codegen span.
    */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(encode(text, merges))
}
