package graft

import graft.fn.HtmlKernels
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.fn.HtmlKernels]] — the hand-compiled passes must reproduce
  * the documented regex pipeline EXACTLY, since the q131/q132 oracles
  * replay the same pipeline under RE2. The reference here IS
  * `java.util.regex` (restricted to the portable subset: explicit
  * whitespace class, dotall via `(?s)`): adversarial tag-soup corners
  * plus randomized fuzz. The PiiSpec discipline.
  */
class HtmlSpec extends AnyFunSuite {

  import java.util.regex.Pattern

  private def refRemove(s: String, tag: String): String =
    Pattern.compile(s"(?is)<$tag[^>]*>.*?</$tag>").matcher(s).replaceAll(" ")

  private def refComments(s: String): String =
    Pattern.compile("(?s)<!--.*?-->").matcher(s).replaceAll(" ")

  private def refTags(s: String): String =
    Pattern.compile("<[^>]*>").matcher(s).replaceAll(" ")

  private def refEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")

  private def refCollapse(s: String): String = {
    val t = Pattern.compile("[ \t\n\f\r]+").matcher(s).replaceAll(" ")
    // SQL trim() strips spaces; after the collapse every boundary
    // whitespace IS a space
    var a = 0; var b = t.length
    while (a < b && t.charAt(a) == ' ') a += 1
    while (b > a && t.charAt(b - 1) == ' ') b -= 1
    t.substring(a, b)
  }

  private def refHtmlText(s: String): String =
    refCollapse(refEntities(refTags(refComments(
      refRemove(refRemove(s, "script"), "style")))))

  // independent reference for the PRODUCTION pass 5': java.util.regex
  // alternation + Long.parseLong + Character.toChars (the kernel is a
  // hand scanner with its own accumulator — different machinery, same
  // contract). Out-of-range/surrogate refs pass through via group().
  private def refEntitiesNumeric(s: String): String = {
    val p = Pattern.compile(
      "&(?:(lt|gt|quot|nbsp|amp);|#([0-9]{1,10});|#[xX]([0-9a-fA-F]{1,8});)")
    val m = p.matcher(s)
    val sb = new java.lang.StringBuffer
    while (m.find()) {
      val rep =
        if (m.group(1) != null) m.group(1) match {
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "nbsp" => " "
          case "amp" => "&"
        } else {
          val v =
            if (m.group(2) != null) java.lang.Long.parseLong(m.group(2))
            else java.lang.Long.parseLong(m.group(3), 16)
          if (v < 1 || v > 0x10FFFF || (v >= 0xD800 && v <= 0xDFFF)) m.group()
          else new String(Character.toChars(v.toInt))
        }
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(rep))
    }
    m.appendTail(sb)
    sb.toString
  }

  private def refHtmlTextFull(s: String): String =
    refCollapse(refEntitiesNumeric(refTags(refComments(
      refRemove(refRemove(s, "script"), "style")))))

  private def check(s: String): Unit = {
    assert(HtmlKernels.removeElement(s, "script") === refRemove(s, "script"), s"script: <$s>")
    assert(HtmlKernels.removeElement(s, "style") === refRemove(s, "style"), s"style: <$s>")
    assert(HtmlKernels.removeComments(s) === refComments(s), s"comments: <$s>")
    assert(HtmlKernels.stripTags(s) === refTags(s), s"tags: <$s>")
    assert(HtmlKernels.decodeEntities(s) === refEntities(s), s"entities: <$s>")
    assert(HtmlKernels.collapseWs(s) === refCollapse(s), s"collapse: <$s>")
    assert(HtmlKernels.htmlText(s) === refHtmlText(s), s"pipeline: <$s>")
  }

  test("adversarial corners match the regex reference") {
    Seq(
      "",
      "plain text, no markup",
      "<p>hello</p>",
      "a<script>x</script>b",
      "a<SCRIPT>x</ScRiPt>b",
      "a<script type=\"x\">1<2 && y</script>b",
      "a<script>multi\nline\ncontent</script>b",
      "<script>no close tag",
      "<script no gt at all",
      "a<scriptmore attr>x</script>b",   // [^>]* admits the run-on name
      "a<script></script><script>y</script>b",
      "nested <script>a<style>b</script>c</style> soup",
      "<style>p{a:1}</style>text",
      "<!-- comment -->x",
      "<!---->x",
      "<!--->x",                          // no terminator: stays, then tag-strip
      "<!-- spans\nlines -->x",
      "a<!-- c1 --><!-- c2 -->b",
      "<div class=\"a>b\">text",          // '>' inside attr: regex semantics
      "<unclosed text after lone lt: a < b",
      "a<>b",                             // empty tag
      "&lt;tag&gt; &amp;amp; &quot;q&quot; &#39;s&#39; &nbsp;x",
      "&amp;lt; stays literal",
      "&copy; unknown entity",
      "&; & &#x41; partials",
      "  \t\n multiple \f\r ws  ",
      "é café <b>中文</b> &amp; done",
      "<script><!-- tricky --></script><!-- <script>x</script> -->y"
    ).foreach(check)
  }

  test("randomized tag-soup fuzz matches the regex reference") {
    val rnd = new scala.util.Random(20260814)
    val atoms = Array(
      "<script>", "</script>", "<SCRIPT t=1>", "</SCRIPT>", "<style>",
      "</style>", "<!--", "-->", "<div>", "</div>", "<a href=\"x\">", ">",
      "<", "&lt;", "&gt;", "&amp;", "&quot;", "&#39;", "&nbsp;", "&copy;",
      "text", "x y", " ", "\n", "\t", "\r", "\f", "42", "<b", "p>", "&",
      ";", "<!-- c -->", "café")
    (0 until 4000).foreach { _ =>
      val n = 1 + rnd.nextInt(24)
      val s = (0 until n).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
      check(s)
    }
  }

  test("numeric character references: adversarial corners match the regex reference") {
    Seq(
      "it&#8217;s here",                   // the curly apostrophe that poisons dedup keys
      "x&#x2019;y &#X2019; mixed case",
      "A is &#65; and &#x41;",
      "&#39; both forms &#x27;",
      "emoji &#x1F600; pair",              // supplementary plane → surrogate pair
      "max &#1114111; &#x10FFFF;",
      "over &#1114112; &#x110000;",        // out of range → literal
      "surrogate &#xD800; &#55296; block", // → literal
      "zero &#0; &#x0;",
      "&#; &#x; &#xG; &# partials",
      "&#123456789012; too many digits",
      "&#0000000065; leading zeros",
      "&amp;#65; one escape level only",
      "&amp;lt; still literal",
      "100% &formed & loose",
      "&#13;&#10;&#9; controls then collapse",
      "&#160; is NBSP the char, not the collapse space"
    ).foreach { s =>
      assert(HtmlKernels.decodeEntitiesNumeric(s) === refEntitiesNumeric(s), s"numeric: <$s>")
      assert(HtmlKernels.htmlText(s, numericRefs = true) === refHtmlTextFull(s), s"full: <$s>")
    }
  }

  test("numeric-ref fuzz matches the regex reference; variants agree without numeric refs") {
    val rnd = new scala.util.Random(20260815)
    val atoms = Array(
      "&#", "#", ";", "&", "x", "X", "8217", "41", "1F600", "D800",
      "110000", "0", "65", "&#8217;", "&#x2019;", "&amp;", "&lt;", "&#39;",
      "&nbsp;", "text", " ", "<b>", "</b>", "9999999999", "99999999999",
      "&#xD7FF;", "&#xE000;", "é")
    (0 until 4000).foreach { _ =>
      val n = 1 + rnd.nextInt(20)
      val s = (0 until n).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
      assert(HtmlKernels.decodeEntitiesNumeric(s) === refEntitiesNumeric(s), s"numeric: <$s>")
      assert(HtmlKernels.htmlText(s, numericRefs = true) === refHtmlTextFull(s), s"full: <$s>")
    }
    // on inputs with no numeric refs, the production variant degrades
    // to exactly the default pipeline (the documented agreement)
    val namedAtoms = Array("&lt;", "&gt;", "&amp;", "&quot;", "&nbsp;",
      "&copy;", "text", " ", "&", ";", "amp;", "<i>", "</i>")
    (0 until 2000).foreach { _ =>
      val n = 1 + rnd.nextInt(16)
      val s = (0 until n).map(_ => namedAtoms(rnd.nextInt(namedAtoms.length))).mkString
      assert(HtmlKernels.htmlText(s, numericRefs = true) === HtmlKernels.htmlText(s),
        s"variant agreement: <$s>")
    }
  }

  test("null propagates") {
    assert(HtmlKernels.htmlTextOrNull(null) === null)
    assert(HtmlKernels.htmlTextOrNull(null, true) === null)
  }

  test("the synthesized-page shape extracts the visible text") {
    val html = "<!DOCTYPE html><html lang=\"en\"><head><title>Doc 7</title>" +
      "<style type=\"text/css\">body{color:#222}\n.nav{display:none}</style>" +
      "<script type=\"text/javascript\">var t=1<2&&\"x\";\nif(t){t=0}</script>" +
      "</head><body><!-- source: web\n --><div class=\"nav\">" +
      "<a href=\"/home\">Home</a>&nbsp;|&nbsp;<a href=\"/about?id=7\">About</a>" +
      "</div><p>Hello &amp; goodbye &lt;eof&gt;</p>" +
      "<p>&amp;copy; 2026 &quot;Graft&quot; &#39;q&#39; &copy;</p></body></html>"
    assert(HtmlKernels.htmlText(html) ===
      "Doc 7 Home | About Hello & goodbye <eof> &copy; 2026 \"Graft\" 'q' &copy;")
  }
}
