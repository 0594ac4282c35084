package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at scale: MinHash + LSH banding as a real
  * pipeline (SURVEY.md §7.1 ext/; the brief's headline LLM-data op).
  *
  *   shingles → minhash signatures → LSH bands → band-bucket candidate
  *   join → exact-Jaccard verify → greedy keep-min-id dedup
  *
  * Scale design (the whole point — the reference has nothing here):
  *
  *  - Signatures are computed WITHOUT row explosion: the k hash values
  *    are k columns (`min` aggregates) over one pass of the shingle
  *    table — map-side partial aggregation collapses each partition to
  *    one row per doc before the single shuffle. The naive
  *    `explode(0..k-1)` alternative multiplies the shingle table k×
  *    (it was this repo's slowest query in round 1 at 4.6 s; this
  *    formulation is ~k× less shuffle IO).
  *  - Candidate generation is an equi-join on (band, band_hash) — a
  *    shuffle hash join over bucket keys. No CartesianProduct, no
  *    BroadcastNestedLoopJoin anywhere in the plan (asserted by
  *    DedupSpec): all-pairs O(N²) never materializes.
  *  - Bucket-size guard: a degenerate bucket (e.g. the empty-text
  *    signature) would produce |bucket|² candidate pairs. Buckets
  *    larger than `maxBucket` are dropped from candidate generation —
  *    the standard LSH skew guard; at 100 TB this is what keeps the
  *    join bounded. Dropped buckets mean those docs are only compared
  *    through their other b-1 bands.
  *  - Verification is exact set-Jaccard over shingles via equi-joins
  *    keyed on (doc, shingle) — shuffle-safe, no skew risk beyond the
  *    shingle frequency distribution itself.
  *
  * Hashing is pluggable via [[Hasher]]: [[XxHasher]] (64-bit longs,
  * codegen'd, the production path) and [[Md5Hasher]] (hex strings —
  * byte-identical in DuckDB, used by the oracle queries q65-q67 so the
  * differential tests hash-match across engines).
  */
object Dedup {

  /** k seeded hash functions + a band combiner, as Catalyst columns. */
  trait Hasher {
    /** Hash of `shingle` under seed `i` — orderable (min = MinHash). */
    def hash(i: Int, shingle: Column): Column
    /** Combine one band's r signature elements into a bucket key. */
    def band(parts: Seq[Column]): Column
  }

  /** Production hasher: xxhash64 (long, codegen, no string materialization). */
  object XxHasher extends Hasher {
    def hash(i: Int, shingle: Column): Column = xxhash64(lit(i), shingle)
    def band(parts: Seq[Column]): Column = xxhash64(parts: _*)
  }

  /** Cross-engine parity hasher: md5 hex strings, min in string order —
    * identical in Spark and DuckDB (oracle queries).
    */
  object Md5Hasher extends Hasher {
    def hash(i: Int, shingle: Column): Column =
      md5(concat(lit(s"$i:"), shingle))
    def band(parts: Seq[Column]): Column = md5(concat_ws("|", parts: _*))
  }

  /** Distinct word n-gram shingles per document: (idCol, shingle).
    * Single-space tokenization (engine-identical, like q40/q60); empty
    * tokens dropped; docs shorter than n words yield no shingles.
    */
  def shingles(docs: DataFrame, idCol: String, textCol: String,
               n: Int = 3): DataFrame = {
    val toks = array_remove(split(col(textCol), " "), "")
    // sequence(0, size-n) would DESCEND for size < n — guard to empty
    val starts = when(size(toks) >= n, sequence(lit(0), size(toks) - n))
      .otherwise(array().cast("array<int>"))
    docs.select(
        col(idCol),
        explode(transform(starts, i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
          .as("shingle"))
      .distinct()
  }

  /** MinHash signature per doc: (idCol, sig) where sig is a k-element
    * array — element i = min over the doc's shingles of hash_i(shingle).
    * One groupBy with k `min` aggregate columns: no row explosion, full
    * map-side combine.
    */
  def minhashSignatures(sh: DataFrame, idCol: String, k: Int,
                        hasher: Hasher = XxHasher): DataFrame = {
    val mins = (0 until k).map(i => min(hasher.hash(i, col("shingle"))).as(s"__h$i"))
    sh.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"__h$i")): _*).as("sig"))
  }

  /** LSH banding: split the k-element signature into `b` bands of
    * r = k/b rows each; a band's bucket key hashes its r elements.
    * Output (idCol, band, band_hash) — b small rows per doc (explode
    * AFTER aggregation, so the fan-out is b× of the doc count, not of
    * the shingle count).
    */
  def lshBands(sigs: DataFrame, idCol: String, k: Int, b: Int,
               hasher: Hasher = XxHasher): DataFrame = {
    require(k % b == 0, s"signature length $k not divisible into $b bands")
    val r = k / b
    val bandStructs = (0 until b).map { bi =>
      val parts = (0 until r).map(j => element_at(col("sig"), bi * r + j + 1))
      struct(lit(bi).as("band"), hasher.band(parts).as("band_hash"))
    }
    sigs.select(col(idCol), explode(array(bandStructs: _*)).as("__bs"))
      .select(col(idCol), col("__bs.band").as("band"), col("__bs.band_hash").as("band_hash"))
  }

  /** Candidate pairs: docs sharing at least one (band, band_hash)
    * bucket, as (a_id, b_id) with a_id < b_id, distinct. Equi-join on
    * the bucket key — never a cross product. Buckets with more than
    * `maxBucket` members are excluded (LSH skew guard, see object doc).
    */
  def candidatePairs(bands: DataFrame, idCol: String,
                     maxBucket: Int = 10000): DataFrame = {
    val ok = bands.groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket)
      .drop("__n")
    val pruned = bands.join(ok, Seq("band", "band_hash"))
    val a = pruned.select(col(idCol).as("a_id"), col("band"), col("band_hash"))
    val b = pruned.select(col(idCol).as("b_id"), col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  /** Exact set-Jaccard verification of candidate pairs against the
    * shingle table: (a_id, b_id, jaccard), keeping pairs with
    * jaccard >= minJaccard. Intersection via equi-join on
    * (doc, shingle); sizes via one aggregate — all shuffle joins on
    * real keys.
    */
  def jaccardVerify(cands: DataFrame, sh: DataFrame, idCol: String,
                    minJaccard: Double): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("__sz"))
    val shA = sh.select(col(idCol).as("a_id"), col("shingle"))
    val shB = sh.select(col(idCol).as("b_id"), col("shingle"))
    val inter = cands
      .join(shA, "a_id")
      .join(shB, Seq("b_id", "shingle"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("__inter"))
    inter
      .join(sizes.select(col(idCol).as("a_id"), col("__sz").as("__sa")), "a_id")
      .join(sizes.select(col(idCol).as("b_id"), col("__sz").as("__sb")), "b_id")
      .select(col("a_id"), col("b_id"),
        (col("__inter").cast("double") /
          (col("__sa") + col("__sb") - col("__inter"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** The full near-dup pipeline: docs → verified near-dup pairs
    * (a_id, b_id, jaccard), a_id < b_id.
    *
    * Defaults (n=3 word shingles, k=16 hashes, b=8 bands of r=2):
    * match probability 1-(1-J²)⁸ — ≈0.9997 at J=0.8, ≈0.64 at J=0.5 —
    * tuned for the "same doc, light edits" regime.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, k: Int = 16, b: Int = 8,
                   minJaccard: Double = 0.8,
                   hasher: Hasher = XxHasher,
                   maxBucket: Int = 10000): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    val sigs = minhashSignatures(sh, idCol, k, hasher)
    val bands = lshBands(sigs, idCol, k, b, hasher)
    val cands = candidatePairs(bands, idCol, maxBucket)
    jaccardVerify(cands, sh, idCol, minJaccard)
  }

  /** Greedy near-dup removal: drop every doc that has a verified
    * near-duplicate with a SMALLER id; keep the rest. This is
    * edge-greedy, not full transitive closure (a doc whose only
    * duplicate-neighbors have larger ids survives even inside a larger
    * duplicate cluster) — the standard single-pass production choice;
    * iterate-to-fixpoint connected components would need a loop of
    * joins and is rarely worth it for dedup.
    */
  def dropNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                         n: Int = 3, k: Int = 16, b: Int = 8,
                         minJaccard: Double = 0.8,
                         hasher: Hasher = XxHasher): DataFrame = {
    val dupIds = nearDupPairs(docs, idCol, textCol, n, k, b, minJaccard, hasher)
      .select(col("b_id").as(idCol)).distinct()
    docs.join(dupIds, Seq(idCol), "left_anti")
  }

  /** 64-bit SimHash fingerprint per doc over its distinct tokens:
    * bit j of the fingerprint is set iff the sum over tokens of
    * (bit j of xxhash64(token) ? +1 : -1) is positive. Computed as 64
    * `sum` aggregate columns in one pass (no explosion), then OR-folded
    * into a single long. Near-dups have small Hamming distance between
    * fingerprints.
    */
  def simhash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(array_remove(split(col(textCol), " "), "")).as("__tok"))
      .distinct()
    val h = xxhash64(col("__tok"))
    val votes = (0 until 64).map { j =>
      sum(when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"__v$j")
    }
    toks.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until 64).map(j => when(col(s"__v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints (for simhash
    * near-dup banding/verification): bit_count(a XOR b).
    */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
