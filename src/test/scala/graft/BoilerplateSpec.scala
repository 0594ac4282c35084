package graft

import graft.ext.{Boilerplate, BoilerplateFixtures}
import org.scalatest.funsuite.AnyFunSuite

/** jusText-style boilerplate extraction: segmentation, the context-
  * free rules at their thresholds, the revision passes, and planted-
  * chrome recall/precision over a templated corpus.
  */
class BoilerplateSpec extends AnyFunSuite {

  private val good200 =
    "<p>" + ("the data was fine and " * 10) + "</p>" // 219 chars, density .6

  test("segmentation: inline tags join, block tags split, skip subtrees drop") {
    val html =
      """<html><head><title>x</title><style>p{}</style></head><body>
        |<p>one <b>two</b> <a href="#">three</a></p>
        |<div>four</div>five<br>six<br><br>seven
        |<script>var a = "<p>not text</p>";</script>
        |<!-- comment --><h3>Head</h3></body></html>""".stripMargin
    val bs = Boilerplate.segment(html)
    assert(bs.map(_.text).toSeq === Seq(
      "one two three", "four", "five six", "seven", "Head"))
    assert(bs(0).linkChars === 5) // "three"
    assert(bs(4).heading)
    assert(!bs(0).heading)
  }

  test("context-free rules at their exact thresholds") {
    def cls(html: String): String = Boilerplate.classify(html).head.cfClass
    // link density > 0.2 → bad (10 of 44 chars ≈ 0.227)
    assert(cls("<p>" + ("the data was fine and " * 10) +
      "<a>0123456789</a></p>") === "good") // 10/229 ≈ 0.04
    assert(cls("<p>word " + "<a>0123456789</a> of the data and the rest is here ok</p>") === "bad")
    // copyright → bad regardless of content
    assert(cls(good200.replace("fine", "©alt")) === "bad")
    // short without links
    assert(cls("<p>tiny</p>") === "short")
    // short WITH link chars → bad
    assert(cls("<p>tiny <a>x</a></p>") === "bad")
    // length in (70, 200] with high stopword density → neargood
    assert(cls("<p>" + ("the data was fine and " * 4) + "</p>") === "neargood")
    // low stopword density → bad
    assert(cls("<p>" + ("lorem ipsum dolor sit amet " * 10) + "</p>") === "bad")
  }

  test("revision: heading promotion, short smoothing, neargood smoothing") {
    // short heading right before good content → good (pass 1 + 3)
    val c1 = Boilerplate.classify("<h2>Title</h2>" + good200)
    assert(c1(0).cfClass === "short" && c1(0).cls === "good")
    // the same short text NOT a heading, surrounded by bad → bad
    val c2 = Boilerplate.classify(
      "<div>©x</div><p>Title</p><div>©y</div>")
    assert(c2(1).cfClass === "short" && c2(1).cls === "bad")
    // short between two goods → good
    val c3 = Boilerplate.classify(good200 + "<p>Mid</p>" + good200)
    assert(c3(1).cfClass === "short" && c3(1).cls === "good")
    // neargood adjacent to good → good; isolated between bads → bad
    val ng = "<p>" + ("the data was fine and " * 4) + "</p>"
    val c4 = Boilerplate.classify(good200 + ng)
    assert(c4(1).cfClass === "neargood" && c4(1).cls === "good")
    val c5 = Boilerplate.classify("<div>©x</div>" + ng + "<div>©y</div>")
    assert(c5(1).cfClass === "neargood" && c5(1).cls === "bad")
  }

  test("planted chrome recall/precision: 100 templated pages, exact separation") {
    // every page plants 4 content blocks (heading + 2 long + 1
    // neargood-promoted) and 4 chrome blocks (nav, cookie banner,
    // teaser, footer) — the classifier must keep ALL content and drop
    // ALL chrome on every page: recall = precision = 1.0
    var keptContent = 0; var keptChrome = 0
    var totContent = 0; var totChrome = 0
    for (id <- 0L until 100L) {
      val cs = Boilerplate.classify(BoilerplateFixtures.fixtureHtml(id))
      assert(cs.length === 8, s"id=$id blocks=${cs.length}")
      val contentIdx = Set(1, 2, 4, 5)
      cs.zipWithIndex.foreach { case (c, i) =>
        if (contentIdx(i)) { totContent += 1; if (c.cls == "good") keptContent += 1 }
        else { totChrome += 1; if (c.cls == "good") keptChrome += 1 }
      }
    }
    assert(keptContent === totContent, "content recall < 1")
    assert(keptChrome === 0, "chrome leaked into main text")
    // and the main text is exactly the content blocks
    val mt = Boilerplate.mainTextOrNull(BoilerplateFixtures.fixtureHtml(7L))
    val exp = "Section 7\n" +
      ("the data was fine and " * BoilerplateFixtures.m1(7)).trim + "\n" +
      ("the data was fine and " * BoilerplateFixtures.m2(7)).trim + "\n" +
      ("the data was fine and " * 4).trim
    assert(mt === exp)
  }

  test("malformed input: null in, null out; junk never throws") {
    assert(Boilerplate.mainTextOrNull(null) === null)
    assert(Boilerplate.mainTextOrNull("") === "")
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 200) {
      val junk = Array.fill(rnd.nextInt(400))(
        "<>&;ab c/\"='p".charAt(rnd.nextInt(13))).mkString
      Boilerplate.classify(junk) // no throw
    }
    // unclosed tags, nested anchors, stray closers
    Boilerplate.classify("<p><a><a>x</a><div></div></h2><p <p>y")
  }

  test("per-language stoplists: deployment data routes the classifier (round 15)") {
    // the deployment snapshot parses with all six heads present
    val sl = Boilerplate.Stoplists
    for (lang <- Seq("en", "de", "fr", "es", "it", "pt"))
      assert(sl.contains(lang) && sl(lang).size > 40, lang)
    // a German paragraph: function-word dense under the de stoplist,
    // sparse under en — the classification flips with the routing
    val de = "<p>" + ("der kleine hund lief durch die stadt und " +
      "über die brücke weil er zu dem haus von einem freund wollte " +
      "aber auf dem weg gab es sehr viele dinge die er noch nicht " +
      "gesehen hatte und so blieb er immer wieder stehen ") * 3 + "</p>"
    val viaDe = Boilerplate.classify(de, Boilerplate.stoplistFor("de"))
    val viaEn = Boilerplate.classify(de, Boilerplate.stoplistFor("en"))
    assert(viaDe.head.cls === "good", s"de-routed: ${viaDe.head.cls}")
    assert(viaEn.head.cls === "bad", s"en-routed: ${viaEn.head.cls}")
    // routing composes with language heads (the stoplist keys are
    // the LangId head inventory)
    assert(Boilerplate.stoplistFor("de").contains("und"))
    // unknown language falls back to English
    assert(Boilerplate.stoplistFor("xx") === Boilerplate.EnglishStoplist)
    // and the q170/q171 surface (default English) is untouched
    assert(Boilerplate.stoplistFor("en").contains("the"))
  }
}
