package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for LLM training-data pipelines:
  * benchmark decontamination, fixed-window chunking, and
  * concat-and-split sequence packing. These are the steps between
  * "deduplicated documents" ([[Dedup]]) and "token blocks on the
  * trainer" — each designed around the 100 TB asymmetry of the
  * problem: the corpus is huge, but the benchmark set (decontaminate),
  * the per-doc token list (chunk), and the per-shard running total
  * (pack) are all small.
  */
object Corpus {

  // ------------------------------------------------ decontamination

  /** Per-document n-gram overlap against a benchmark/eval set — the
    * standard train-test decontamination check (report first, drop
    * second; both live here).
    *
    * Returns (idCol, overlap, doc_shingles, overlap_frac) for every
    * corpus document with `overlap > 0`: `overlap` = distinct word
    * n-grams the doc shares with the UNION of the benchmark's n-grams,
    * `doc_shingles` = the doc's distinct n-gram count, `overlap_frac`
    * their ratio.
    *
    * Scale shape: benchmarks are KBs-to-MBs while the corpus is TBs,
    * so the benchmark shingle set is aggregated small and BROADCAST —
    * the corpus-side shingle stream joins it map-side with no shuffle
    * of corpus bytes, then one groupBy(doc) with map-side combine.
    * The only corpus-wide shuffle is the per-doc count aggregation,
    * which [[Dedup.shingles]]' distinct already pays anyway.
    */
  def contaminationReport(docs: DataFrame, idCol: String, textCol: String,
                          bench: DataFrame, benchTextCol: String,
                          n: Int = 8): DataFrame = {
    val docSh = Dedup.shingles(docs, idCol, textCol, n)
    val benchSh = Dedup.shingles(
        bench.select(lit(0L).as("__bid"), col(benchTextCol)),
        "__bid", benchTextCol, n)
      .select(col("shingle")).distinct()
    val sizes = docSh.groupBy(col(idCol))
      .agg(count(lit(1)).as("doc_shingles"))
    val overlaps = docSh.join(broadcast(benchSh), "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("overlap"))
    overlaps.join(sizes, idCol)
      .select(col(idCol), col("overlap"), col("doc_shingles"),
        (col("overlap").cast("double") / col("doc_shingles")).as("overlap_frac"))
  }

  /** Drop every corpus document whose benchmark n-gram overlap
    * fraction reaches `maxFrac` (0 = drop on ANY shared n-gram, the
    * strict published-eval convention). Anti-join against the (small)
    * flagged-id set — corpus rows stream through untouched.
    */
  def dropContaminated(docs: DataFrame, idCol: String, textCol: String,
                       bench: DataFrame, benchTextCol: String,
                       n: Int = 8, maxFrac: Double = 0.0): DataFrame = {
    val flagged = contaminationReport(docs, idCol, textCol, bench, benchTextCol, n)
      .filter(col("overlap_frac") > maxFrac ||
        (lit(maxFrac) === 0.0 && col("overlap") > 0))
      .select(col(idCol))
    docs.join(flagged, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------------- chunking

  /** Fixed-size token chunks with overlap (RAG / context-window prep):
    * one row per chunk — (idCol, chunk_idx, n_chunk_tokens,
    * chunk_text). Chunk i covers tokens [i·step, i·step + chunkSize)
    * with step = chunkSize − overlap; the final chunk may be shorter;
    * a doc shorter than chunkSize yields exactly one chunk. Documents
    * with empty text yield no chunks.
    *
    * Scale shape: pure narrow per-row work — split, sequence,
    * slice, array_join are all codegen built-ins, no shuffle, no HOF
    * lambdas. A 100 TB corpus chunks at scan speed.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize; got chunkSize=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    val toks = split(col(textCol), " ")
    val nTok = size(toks)
    val nChunks = when(nTok <= chunkSize, lit(1L))
      .otherwise(ceil((nTok - chunkSize).cast("double") / step).cast("long") + 1L)
    docs
      .filter(length(col(textCol)) > 0)
      .select(col(idCol), toks.as("__toks"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        slice(col("__toks"), (col("chunk_idx") * step + 1).cast("int"),
            lit(chunkSize)).as("__chunk"))
      .select(col(idCol), col("chunk_idx"),
        size(col("__chunk")).as("n_chunk_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  // ------------------------------------------------ sequence packing

  /** Concat-and-split sequence packing (the GPT-style trainer layout):
    * within each shard, documents are concatenated in `idCol` order
    * into one token stream and cut into fixed `blockSize` blocks; a
    * document spanning a cut appears in BOTH blocks. One row per
    * (document, block) assignment: (shard, block_id, idCol, tok_start,
    * n_toks) — tok_start = the first token of the doc that lands in
    * this block (0-based within the doc), n_toks = how many of the
    * doc's tokens the block takes. Docs with `tokCol <= 0` are
    * dropped.
    *
    * Scale shape: the running total is a window per SHARD — never a
    * global single-partition sort. Shard count is the parallelism
    * knob: real pipelines pack per input shard/file (thousands of
    * independent streams); a global pack is shard = lit(0) and is the
    * caller's explicit scale decision. The block explode adds one row
    * per boundary crossing — bounded by tokens/blockSize, the
    * trainer's own output size.
    */
  def packBlocks(docs: DataFrame, idCol: String, tokCol: Column,
                 blockSize: Long, shardCol: Column): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive; got $blockSize")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    val b = lit(blockSize)
    docs.select(shardCol.as("shard"), col(idCol), tokCol.cast("long").as("__cnt"))
      .filter(col("__cnt") > 0)
      .withColumn("__end", sum(col("__cnt")).over(w))
      .withColumn("__start", col("__end") - col("__cnt"))
      .select(col("shard"), col(idCol), col("__cnt"), col("__start"),
        explode(sequence(floor(col("__start") / b),
          floor((col("__end") - 1) / b))).as("block_id"))
      .select(col("shard"), col("block_id"), col(idCol),
        greatest(lit(0L), col("block_id") * b - col("__start")).as("tok_start"),
        (least(col("__start") + col("__cnt"), (col("block_id") + 1) * b) -
          greatest(col("__start"), col("block_id") * b)).as("n_toks"))
  }
}
