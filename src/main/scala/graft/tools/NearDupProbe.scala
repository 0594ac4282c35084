package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Per-branch steady-state timing of the q67 near-dup pipeline:
  * signature branch vs candidate generation vs exact verify — names
  * which branch owns the warm wall time before optimizing it.
  */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String, reps: Int = 3)(f: => Long): Unit = {
      f // warm
      val runs = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e6, n)
      }
      println(f"[ndp] $label%-42s min=${runs.map(_._1).min}%8.1f ms  rows=${runs.head._2}")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet").repartition(32)
    val (n, k, b) = (3, 8, 4)
    val h = Dedup.ParityHasher

    val stream = Dedup.shingleStream(docs, "doc_id", "text", n)
    time("shingleStream.count")(stream.count())
    val sigs = Dedup.minhashSignatures(stream, "doc_id", k, h)
    time("sigs (aggregate md5 path)")(sigs.count())
    val sigsXx = Dedup.minhashSigPerRow(docs, "doc_id", "text", n, k)
    time("sigs (per-row xx kernel)")(sigsXx.count())
    val bands = Dedup.lshBands(sigs, "doc_id", k, b, h)
    time("bands")(bands.count())
    val cands = Dedup.candidatePairs(bands, "doc_id")
    time("cands (uncached full chain)")(cands.count())
    val cp = cands.persist()
    cp.count()
    val verified = Dedup.jaccardVerify(cp, stream, "doc_id", 0.9)
    time("verify stream-form (cands cached)")(verified.count())
    val verifiedDocs = Dedup.jaccardVerifyDocs(cp, docs, "doc_id", "text", n, 0.9)
    time("verify doc-pruned (cands cached)")(verifiedDocs.count())
    val full = Dedup.nearDupPairs(docs, "doc_id", "text", n, k, b, 0.9, h)
    time("full nearDupPairs (persistBounded warm)")(full.count())
    spark.stop()
  }
}
