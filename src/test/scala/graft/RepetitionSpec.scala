package graft

import org.apache.spark.sql.functions._
import graft.ext.TextOps

/** fn/TextKernels.repetitionProfile + TextOps.repetitionSignals —
  * the Gopher repetition signals: hand-computed fractions, tie-break
  * convention, sub-n and empty-doc edges, the documented >1.0
  * occurrence-sum behavior, SQL registration, and the zero-shuffle
  * plan claim.
  */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def signals(rows: (Long, String)*) =
    TextOps.repetitionSignals(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("hand-computed fractions on a tiny doc") {
    // tokens: a b a b a → n=5, joined chars = 9
    // 2-grams: "a b"×2, "b a"×2 → tie; lex-larger gram "b a" wins, len 3
    val m = signals(1L -> "a b a b a")
    val r = m(1L)
    assert(r.getLong(1) === 5L)       // n_tokens
    assert(r.getLong(2) === 9L)       // total_chars
    assert(r.getDouble(3) === 2 * 3 / 9.0)  // top2
    // 3-grams: "a b a"×2 > "b a b"×1 → 2*5/9
    assert(r.getDouble(4) === 2 * 5 / 9.0)  // top3
    // 4-grams: "a b a b", "b a b a" → tie at 1; "b a b a" lex-larger, len 7
    assert(r.getDouble(5) === 1 * 7 / 9.0)  // top4
    // only one 5-gram (count 1) → no duplicated 5-gram
    assert(r.getDouble(6) === 0.0)    // dup5
    assert(r.getDouble(7) === 0.0)    // dup6 (n_tokens < 6)
  }

  test("occurrence-sum dup form can exceed 1.0 on degenerate repetition (documented)") {
    // x ×6: total_chars 11; 5-grams "x x x x x"×2 → dup5 = 2*9/11
    val r = signals(1L -> "x x x x x x")(1L)
    assert(r.getDouble(3) === 5 * 3 / 11.0)  // top2 "x x"×5 > 1.0
    assert(r.getDouble(6) === 2 * 9 / 11.0)  // dup5
    assert(r.getDouble(3) > 1.0)
  }

  test("sub-n docs contribute 0.0, tokenization drops extra spaces, empty docs drop") {
    val m = signals(1L -> "one", 2L -> "  two   tokens  ", 3L -> "   ")
    assert(!m.contains(3L))                   // no tokens → null → filtered
    assert(m(1L).getDouble(3) === 0.0)        // n_tokens=1 < 2
    assert(m(2L).getLong(1) === 2L)
    assert(m(2L).getLong(2) === "two tokens".length.toLong)
  }

  test("non-BMP text counts code points, not UTF-16 units (DuckDB length() parity)") {
    // U+1D11E (musical G clef) is 2 UTF-16 units but 1 code point.
    // tokens: 𝄞𝄞 x 𝄞𝄞 x 𝄞𝄞 → joined code points = 2+1+2+1+2 + 4 = 12
    val clef = new String(Character.toChars(0x1D11E))
    val tok = clef * 2
    val r = signals(1L -> s"$tok x $tok x $tok")(1L)
    assert(r.getLong(1) === 5L)
    assert(r.getLong(2) === 12L)              // 17 under UTF-16 counting
    // 2-grams: "𝄞𝄞 x"×2 and "x 𝄞𝄞"×2 tie — both grams have 4 code
    // points, so top2 is tie-break-independent here
    assert(r.getDouble(3) === 2 * 4 / 12.0)
  }

  test("SQL surface: repetition_profile registered by GraftExtensions") {
    GraftExtensions.install(spark)
    val got = spark.sql(
      "SELECT repetition_profile('a b a b a').top2_frac AS f").head().getDouble(0)
    assert(got === 2 * 3 / 9.0)
  }

  test("plan: per-row kernel — no Exchange, stays in WholeStageCodegen") {
    // spark.range keeps the plan lazy (a local Seq constant-folds to
    // LocalTableScan and proves nothing about the executed shape)
    val df = TextOps.repetitionSignals(
      spark.range(50).selectExpr("id AS doc_id",
        "concat('tok', id, ' a b a b') AS text"),
      "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*(1)"), plan) // one whole-stage codegen span
  }
}
