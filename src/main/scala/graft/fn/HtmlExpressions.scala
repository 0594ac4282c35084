package graft.fn

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → visible-text extraction for web-corpus curation (the first
  * transform a crawl-derived training pipeline applies, upstream of
  * language ID / quality scoring / dedup). The semantics are a fixed,
  * documented regex-pass pipeline — each pass hand-compiled into a
  * linear scan (no `java.util.regex`, no backtracking), and the exact
  * same pipeline is expressible in ANSI SQL so the q131 oracle replays
  * it hash-exact:
  *
  *  1. `<script[^>]*>.*?</script>` → `' '`  (global, case-insensitive, dotall)
  *  2. `<style[^>]*>.*?</style>`   → `' '`  (same flags)
  *  3. `<!--.*?-->`                → `' '`  (global, dotall)
  *  4. `<[^>]*>`                   → `' '`  (global)
  *  5. literal entity decode, sequential passes in this order:
  *     `&lt;`→`<`, `&gt;`→`>`, `&quot;`→`"`, `&#39;`→`'`,
  *     `&nbsp;`→`' '`, `&amp;`→`&` (amp LAST so `&amp;lt;` yields the
  *     literal text `&lt;`, the standard double-escape resolution);
  *     unknown entities (`&copy;` …) pass through untouched
  *  6. `[ \t\n\f\r]+` → `' '`, then trim
  *
  * The whitespace class in step 6 is written explicitly rather than
  * `\s` because RE2 (the oracle's engine) excludes `\x0B` from `\s`
  * while `java.util.regex` includes it — the explicit class is the
  * portable intersection. Numeric character references (`&#x..;`,
  * `&#NN;` beyond `&#39;`) are NOT decoded — SQL `replace()` cannot
  * express them; documents needing them keep the reference as text on
  * both engines, so parity holds. HtmlSpec pins every pass against a
  * `java.util.regex` reference implementation (adversarial corners +
  * randomized tag-soup fuzz), the PiiSpec discipline.
  */
object HtmlKernels {

  /** Case-insensitive ASCII match of `tag` at `i` (tag is lowercase). */
  private def tagAt(s: String, i: Int, tag: String): Boolean = {
    val tn = tag.length
    if (i + tn > s.length) return false
    var k = 0
    while (k < tn) {
      val c = s.charAt(i + k)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if (lc != tag.charAt(k)) return false
      k += 1
    }
    true
  }

  /** First case-insensitive occurrence of lowercase `needle` at
    * index >= from, or -1 — the lazy `.*?</tag>` resolution.
    */
  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      if (tagAt(s, i, needle)) return i
      i += 1
    }
    -1
  }

  /** Pass 1/2: `<tag[^>]*>.*?</tag>` (g, i, s) → `' '`. `tag` is
    * lowercase. Matches the regex exactly: the element open is `<tag`
    * followed by any non-`>` run then the FIRST `>`; the body is lazy
    * up to the FIRST case-insensitive `</tag>`; an open with no `>`
    * or no closing tag never matches (the raw text then falls through
    * to the later tag-strip pass, as it does under the regex chain).
    */
  def removeElement(s: String, tag: String): String = {
    val n = s.length
    val close = "</" + tag + ">"
    var sb: java.lang.StringBuilder = null
    var i = 0
    var emitted = 0
    while (i < n) {
      if (s.charAt(i) == '<' && tagAt(s, i + 1, tag)) {
        val gt = s.indexOf('>', i + 1)
        if (gt >= 0) {
          // [^>]* admits any chars between the tag name and '>' —
          // including '<' — exactly as the character class does
          val ci = indexOfIgnoreCase(s, close, gt + 1)
          if (ci >= 0) {
            if (sb == null) sb = new java.lang.StringBuilder(n)
            sb.append(s, emitted, i).append(' ')
            i = ci + close.length
            emitted = i
          } else i += 1
        } else i += 1
      } else i += 1
    }
    if (sb == null) s
    else { sb.append(s, emitted, n); sb.toString }
  }

  /** Pass 3: `<!--.*?-->` (g, s) → `' '`. */
  def removeComments(s: String): String = {
    val n = s.length
    var sb: java.lang.StringBuilder = null
    var i = 0
    var emitted = 0
    while (i < n) {
      if (s.charAt(i) == '<' && s.startsWith("<!--", i)) {
        val ci = s.indexOf("-->", i + 4)
        if (ci >= 0) {
          if (sb == null) sb = new java.lang.StringBuilder(n)
          sb.append(s, emitted, i).append(' ')
          i = ci + 3
          emitted = i
        } else i += 1
      } else i += 1
    }
    if (sb == null) s
    else { sb.append(s, emitted, n); sb.toString }
  }

  /** Pass 4: `<[^>]*>` (g) → `' '`. */
  def stripTags(s: String): String = {
    val n = s.length
    var sb: java.lang.StringBuilder = null
    var i = 0
    var emitted = 0
    while (i < n) {
      if (s.charAt(i) == '<') {
        val gt = s.indexOf('>', i + 1)
        if (gt >= 0) {
          if (sb == null) sb = new java.lang.StringBuilder(n)
          sb.append(s, emitted, i).append(' ')
          i = gt + 1
          emitted = i
        } else {
          // no '>' anywhere ahead: no further tag can match
          i = n
        }
      } else i += 1
    }
    if (sb == null) s
    else { sb.append(s, emitted, n); sb.toString }
  }

  /** Pass 5: sequential literal replaces, amp last (see scaladoc). */
  def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Pass 6: `[ \t\n\f\r]+` → `' '` then trim — fused (leading and
    * trailing runs emit nothing, interior runs one space).
    */
  def collapseWs(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) { pendingSpace = sb.length() > 0 }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** The whole pipeline (see object scaladoc for the exact passes). */
  def htmlText(s: String): String =
    collapseWs(decodeEntities(stripTags(removeComments(
      removeElement(removeElement(s, "script"), "style")))))

  def htmlTextOrNull(u: UTF8String): UTF8String =
    if (u == null) null else UTF8String.fromString(htmlText(u.toString))
}

/** `html_text(html)` → visible text (see [[HtmlKernels]]). */
case class HtmlText(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "html_text"

  override protected def nullSafeEval(v: Any): Any =
    HtmlKernels.htmlTextOrNull(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.fn.HtmlKernels.htmlTextOrNull($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
