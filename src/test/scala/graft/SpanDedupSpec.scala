package graft

import org.apache.spark.sql.functions._
import graft.ext.SpanDedup

/** ext/SpanDedup — exact substring duplicate spans (Lee et al. 2022
  * semantics: any L-char substring occurring ≥ 2 times corpus-wide).
  * The md5 path's cross-engine parity is gated by oracle queries
  * q117/q118; this suite pins the algorithm itself: planted-span
  * detection, brute-force parity on a seeded corpus (including
  * supplementary-plane code points), strip correctness down to the
  * bytes, md5 ≡ xx selection equality, and the no-fan-out join shape.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val L = 20

  /** Brute-force duplicated spans over code points: windows by
    * count ≥ 2 of the window STRING (hashes are injective here),
    * islands merged at gap ≤ L.
    */
  private def bruteSpans(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val wins = for {
      (id, text) <- docs
      cps = text.codePoints().toArray
      i <- 0 to cps.length - L if cps.length >= L
    } yield (id, i + 1L, new String(cps, i, L))
    val dup = wins.groupBy(_._3).filter(_._2.size >= 2).keySet
    val hits = wins.filter(w => dup.contains(w._3)).map(w => (w._1, w._2))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    (for {
      (id, ps) <- hits.toSeq
      island <- ps.foldLeft(List.empty[List[Long]]) {
        case (acc @ (cur :: rest), p) if p - cur.head <= L => (p :: cur) :: rest
        case (acc, p) => List(p) :: acc
      }
    } yield (id, island.min, island.max + (L - 1))).sortBy(t => (t._1, t._2))
  }

  private def bruteStrip(text: String, spans: Seq[(Long, Long)]): String = {
    val cps = text.codePoints().toArray
    val keep = cps.indices.filterNot { i =>
      spans.exists { case (s, e) => i + 1 >= s && i + 1 <= e }
    }
    new String(keep.map(cps).toArray, 0, keep.length)
  }

  test("planted shared run is found exactly once per doc, full extent") {
    val shared = "0123456789abcdefghijklmnopqrstuvwxyz" // 36 chars > L
    val docs = Seq(
      (1L, "prefix-one " + shared + " suffix-one"),
      (2L, "other lead " + shared + " other tail"),
      (3L, "no duplication in this document at all, long enough to window")
    ).toDF("doc_id", "text")
    val spans = SpanDedup.duplicateSpans(docs, "doc_id", "text", L)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    // the maximal shared run includes the FLANKING SPACES both docs
    // share (" " + shared + " " = 38 chars, 1-based chars 11..48);
    // detected span = exactly that run
    assert(spans === Seq((1L, 11L, 48L), (2L, 11L, 48L)))
  }

  test("intra-doc repetition is a duplicate too (count, not distinct docs)") {
    val run = "ABCDEFGHIJKLMNOPQRSTUV" // 22 chars > L
    val docs = Seq((7L, run + "-middle-" + run)).toDF("doc_id", "text")
    val spans = SpanDedup.duplicateSpans(docs, "doc_id", "text", L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(spans.nonEmpty)
    assert(spans.head._1 === 7L)
  }

  test("brute-force parity on a seeded corpus with multibyte text") {
    val rnd = new scala.util.Random(42)
    // small alphabet → organic repeats; é (2-byte), 汉 (3-byte),
    // 𝕏 (4-byte, surrogate pair) exercise code-point arithmetic
    val alphabet = "ab é汉𝕏".codePoints().toArray
    val corpus = (0L until 30L).map { id =>
      val n = 30 + rnd.nextInt(60)
      val sb = new java.lang.StringBuilder
      (0 until n).foreach(_ => sb.appendCodePoint(alphabet(rnd.nextInt(alphabet.length))))
      (id, sb.toString)
    }
    val expected = bruteSpans(corpus)
    val got = SpanDedup.duplicateSpans(corpus.toDF("doc_id", "text"),
        "doc_id", "text", L)
      .orderBy($"doc_id", $"span_start").as[(Long, Long, Long)].collect().toSeq
    assert(got === expected)
  }

  test("xx production twin selects the same spans as the md5 path") {
    val docs = Tables.tbl(spark, "/root/testdata/sf0.001", "documents")
    val md5Spans = SpanDedup.duplicateSpans(docs, "doc_id", "text", 40)
      .orderBy($"doc_id", $"span_start").as[(Long, Long, Long)].collect().toSeq
    val xxSpans = SpanDedup.duplicateSpans(docs, "doc_id", "text", 40, xx = true)
      .orderBy($"doc_id", $"span_start").as[(Long, Long, Long)].collect().toSeq
    assert(md5Spans === xxSpans)
    assert(md5Spans.nonEmpty) // the corpus genuinely contains duplicates
  }

  test("stripDuplicateSpans rewrites to the brute-force residue") {
    val shared = "0123456789abcdefghijklmnopqrstuvwxyz"
    val corpus = Seq(
      (1L, "prefix-one " + shared + " suffix-one"),
      (2L, "other lead " + shared + " other tail"),
      (3L, "unique text long enough to produce windows but no dups"))
    val spansByDoc = bruteSpans(corpus)
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap
    val cleaned = SpanDedup.stripDuplicateSpans(corpus.toDF("doc_id", "text"),
        "doc_id", "text", L)
      .select($"doc_id", $"text_clean").as[(Long, String)].collect().toMap
    corpus.foreach { case (id, text) =>
      assert(cleaned(id) === bruteStrip(text, spansByDoc.getOrElse(id, Seq.empty)),
        s"doc $id")
    }
    // doc 3 untouched
    assert(cleaned(3L) === corpus(2)._2)
  }

  test("strip output contains no duplicated full-L window from the input dup set") {
    // conservative-removal property: every window of the ORIGINAL
    // duplicate set is gone from the cleaned corpus
    val docs = Tables.tbl(spark, "/root/testdata/sf0.001", "documents")
    val cleaned = SpanDedup.stripDuplicateSpans(docs, "doc_id", "text", 40)
    val dupWins = SpanDedup.windowHashes(docs, "doc_id", "text", 40)
      .groupBy($"h").count().where($"count" >= 2).select($"h")
    val leftover = SpanDedup.windowHashes(
        cleaned.select($"doc_id", $"text_clean".as("text")), "doc_id", "text", 40)
      .join(dupWins, Seq("h")).count()
    assert(leftover === 0L)
  }

  test("docs shorter than L and empty docs survive (no windows, no spans)") {
    val docs = Seq((1L, "short"), (2L, ""), (3L, "x" * (L - 1))).toDF("doc_id", "text")
    assert(SpanDedup.duplicateSpans(docs, "doc_id", "text", L).count() === 0L)
    val out = SpanDedup.stripDuplicateSpans(docs, "doc_id", "text", L)
      .select($"doc_id", $"text_clean").as[(Long, String)].collect().toMap
    assert(out(1L) === "short" && out(2L) === "" && out(3L) === "x" * (L - 1))
  }

  test("plan: no cartesian product; windows join has no fan-out side") {
    val docs = Tables.tbl(spark, "/root/testdata/sf0.001", "documents")
    val plan = SpanDedup.duplicateSpans(docs, "doc_id", "text", 40)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("IslandBuffer == windowed gaps-and-islands reference (any order, any split)") {
    val rnd = new scala.util.Random(421)
    for (trial <- 0 until 300) {
      val l = 2 + rnd.nextInt(40)
      val n = 1 + rnd.nextInt(60)
      // distinct positions (a doc's window starts are distinct), any order
      val ps = rnd.shuffle(
        Iterator.continually(1L + rnd.nextInt(400)).distinct.take(n).toList)
      // reference: the pre-round-16 formulation — sort, lag, new island
      // on gap > L, span = [min, max + L - 1]
      val ref = ps.sorted.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: rest, p) if p - e <= l => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.reverse.map { case (s, e) => (s, e + (l - 1)) }
      def spans(b: graft.fn.IslandBuffer) =
        (0 until b.size).map(i => (b.starts(i), b.ends(i)))
      // single buffer, stream order
      val one = new graft.fn.IslandBuffer
      ps.foreach(p => one.addInterval(p, p + (l - 1)))
      assert(spans(one) == ref, s"trial $trial L=$l ps=$ps")
      // split across two partial buffers at a random point, then merge
      // (the map-side-combine path), via a serialize round trip
      val cut = rnd.nextInt(ps.length + 1)
      val (pa, pb) = ps.splitAt(cut)
      val ba = new graft.fn.IslandBuffer
      val bb = new graft.fn.IslandBuffer
      pa.foreach(p => ba.addInterval(p, p + (l - 1)))
      pb.foreach(p => bb.addInterval(p, p + (l - 1)))
      val merged = graft.fn.IslandBuffer.deserialize(ba.serialize())
      merged.mergeIn(graft.fn.IslandBuffer.deserialize(bb.serialize()))
      assert(spans(merged) == ref, s"merge trial $trial L=$l cut=$cut ps=$ps")
    }
  }

  test("IslandBuffer: empty buffer serializes and evals to no spans") {
    val b = new graft.fn.IslandBuffer
    assert(graft.fn.IslandBuffer.deserialize(b.serialize()).size === 0)
    assert(b.toArrayData.numElements() === 0)
  }
}
