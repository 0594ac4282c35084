package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-side probe (NOT an operator): A/B of the winnow-family
  * shingle hasher — md5 oracle-parity path vs the xxhash64 production
  * path (`xx = true`) — on the q104 fingerprint dump and the q106
  * shared-span pair join at sf1.
  * `sbt "runMain graft.tools.WinnowHashProbe [sfDir]"`.
  *
  * The two hashers run the IDENTICAL winnowing selection (same
  * tokenization, same window minima, same ~2/(w+1) density); only the
  * per-shingle hash differs, so the timing delta is purely the
  * ~n_tokens-per-doc hash cost the round-5 verdict flagged (~230M
  * JVM MessageDigest calls at sf1).
  */
object WinnowHashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm page cache + codegen

    def time(name: String)(f: => Long): Unit = {
      // print every run — sub-second queries carry ±50% noise and
      // the q106 shuffle is GC-sensitive, so medians can mislead
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val all = ts.map(t => f"${t._1}%5.2f").mkString(" ")
      println(f"[winnowhash] $name%-26s [$all] s  rows=${ts.head._2}")
    }

    for (xx <- Seq(false, true)) {
      val tag = if (xx) "xx " else "md5"
      time(s"$tag q104 fingerprints")(
        graft.ext.Dedup.winnowFingerprints(docs, "doc_id", "text", 5, 4, xx)
          .filter($"doc_id" < 400).count())
      time(s"$tag q104 full corpus")(
        graft.ext.Dedup.winnowFingerprints(docs, "doc_id", "text", 5, 4, xx)
          .count())
      time(s"$tag q106 shared pairs")(
        graft.ext.Dedup.winnowSharedPairs(docs, "doc_id", "text", 5, 4,
          minShared = 2, xx = xx).count())
    }
    spark.stop()
  }
}
