package graft

import graft.fn.RobotsKernels
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.fn.RobotsKernels]] — RFC 9309 semantics pinned on the
  * protocol's own documented examples: wildcard/anchor pattern
  * matching, longest-match with allow-wins ties, group selection and
  * merging, and the parse tolerances (comments, unknown keys,
  * malformed lines).
  */
class RobotsSpec extends AnyFunSuite {

  private def m(pat: String, path: String) = RobotsKernels.matches(pat, path)

  test("pattern matching: the published prefix/wildcard/anchor examples") {
    // /fish — prefix
    assert(m("/fish", "/fish"))
    assert(m("/fish", "/fish.html"))
    assert(m("/fish", "/fishheads/yummy.html"))
    assert(m("/fish", "/fish/salmon"))
    assert(!m("/fish", "/Fish.asp")) // case-sensitive
    assert(!m("/fish", "/catfish"))
    assert(!m("/fish", "/desert/fish"))
    // /fish* — identical to /fish
    assert(m("/fish*", "/fishheads"))
    assert(!m("/fish*", "/desert/fish"))
    // /fish/ — trailing slash bounds the subtree
    assert(m("/fish/", "/fish/"))
    assert(m("/fish/", "/fish/salmon.htm"))
    assert(!m("/fish/", "/fish"))
    assert(!m("/fish/", "/fishheads"))
    // /*.php
    assert(m("/*.php", "/filename.php"))
    assert(m("/*.php", "/folder/filename.php"))
    assert(m("/*.php", "/folder/filename.php?parameters"))
    assert(m("/*.php", "/folder/any.php.file.html"))
    assert(m("/*.php", "/filename.php/"))
    assert(!m("/*.php", "/"))
    assert(!m("/*.php", "/windows.PHP"))
    // /*.php$ — anchored
    assert(m("/*.php$", "/filename.php"))
    assert(m("/*.php$", "/folder/filename.php"))
    assert(!m("/*.php$", "/filename.php?parameters"))
    assert(!m("/*.php$", "/filename.php/"))
    assert(!m("/*.php$", "/filename.php5"))
    // /fish*.php
    assert(m("/fish*.php", "/fish.php"))
    assert(m("/fish*.php", "/fishheads/catfish.php?parameters"))
    assert(!m("/fish*.php", "/Fish.PHP"))
    // degenerate anchors
    assert(m("$", ""))
    assert(!m("$", "/x"))
    assert(m("/**", "/anything"))
  }

  test("longest match wins; allow wins length ties; no match = allowed") {
    val rules = Seq(
      RobotsKernels.Rule(allow = false, "/example/page/"),
      RobotsKernels.Rule(allow = true, "/example/page/allowed.gif"))
    assert(!RobotsKernels.decide(rules, "/example/page/other.gif"))
    assert(RobotsKernels.decide(rules, "/example/page/allowed.gif"))
    assert(RobotsKernels.decide(rules, "/elsewhere"))
    // the RFC §5.2 tie: equivalent rules → allow wins
    val tie = Seq(
      RobotsKernels.Rule(allow = true, "/page"),
      RobotsKernels.Rule(allow = false, "/page"))
    assert(RobotsKernels.decide(tie, "/page/x"))
  }

  test("group selection: exact token, star fallback, merging, comments") {
    val robots =
      """# graft test corpus
        |User-agent: otherbot
        |Disallow: /
        |
        |User-agent: GraftBot  # token match is case-insensitive
        |Disallow: /private/
        |Allow: /private/pub/
        |
        |User-agent: graftbot
        |Disallow: /also-merged/
        |
        |User-agent: a
        |User-agent: b
        |Disallow: /shared/
        |
        |User-agent: *
        |Disallow: /star-only/
        |Sitemap: https://x.example/sitemap.xml
        |""".stripMargin
    def allowed(agent: String, path: String) =
      RobotsKernels.isAllowed(robots, agent, path)
    // exact groups merge; star group is NOT merged in
    assert(!allowed("graftbot", "/private/x"))
    assert(allowed("graftbot", "/private/pub/x"))
    assert(!allowed("graftbot", "/also-merged/y"))
    assert(allowed("graftbot", "/star-only/z"))
    // consecutive user-agent lines share one rule block
    assert(!allowed("a", "/shared/1") && !allowed("b", "/shared/1"))
    assert(allowed("a", "/private/x"))
    // unmatched agents fall to the star group
    assert(!allowed("somebot", "/star-only/z"))
    assert(allowed("somebot", "/private/x"))
    // otherbot's total ban applies only to it
    assert(!allowed("otherbot", "/anything"))
  }

  test("a matched-but-empty specific group shadows the * group (whitelist shape)") {
    // the common 'whitelist this bot' robots.txt: the specific group
    // matched, its empty Disallow means no restrictions — the * total
    // ban must NOT apply (§2.2.1)
    val whitelist = "User-agent: graftbot\nDisallow:\n\nUser-agent: *\nDisallow: /"
    assert(RobotsKernels.isAllowed(whitelist, "graftbot", "/x"))
    assert(!RobotsKernels.isAllowed(whitelist, "somebot", "/x"))
    // same when the specific group holds only non-rule keys
    val delayOnly = "User-agent: graftbot\nCrawl-delay: 5\n\nUser-agent: *\nDisallow: /"
    assert(RobotsKernels.isAllowed(delayOnly, "graftbot", "/x"))
  }

  test("a UTF-8 BOM on the first line does not hide the first group") {
    val bom = "﻿User-agent: *\nDisallow: /"
    assert(!RobotsKernels.isAllowed(bom, "graftbot", "/x"))
  }

  test("crawl-delay: group-selected; sitemaps: site-wide, colons intact") {
    val robots =
      """User-agent: graftbot
        |Crawl-delay: 2.5
        |Disallow: /x
        |
        |User-agent: *
        |Crawl-delay: 10
        |Sitemap: https://x.example/sitemap.xml
        |Sitemap: https://x.example/sitemap2.xml.gz
        |""".stripMargin
    assert(RobotsKernels.crawlDelay(robots, "graftbot") === Some(2.5))
    assert(RobotsKernels.crawlDelay(robots, "otherbot") === Some(10.0))
    assert(RobotsKernels.crawlDelay("User-agent: *\nDisallow: /", "b") === None)
    // a matched specific group WITHOUT a delay shadows the * delay
    assert(RobotsKernels.crawlDelay(
      "User-agent: graftbot\nDisallow: /x\n\nUser-agent: *\nCrawl-delay: 9",
      "graftbot") === None)
    // negative / garbage delays are skipped
    assert(RobotsKernels.crawlDelay("User-agent: *\nCrawl-delay: -1", "b") === None)
    assert(RobotsKernels.crawlDelay("User-agent: *\nCrawl-delay: soon", "b") === None)
    assert(RobotsKernels.sitemaps(robots) ===
      Seq("https://x.example/sitemap.xml", "https://x.example/sitemap2.xml.gz"))
    assert(RobotsKernels.sitemaps("no directives here") === Seq.empty)
  }

  test("parse tolerances: empty disallow, malformed lines, empty file") {
    assert(RobotsKernels.isAllowed("User-agent: *\nDisallow:", "g", "/x"))
    assert(RobotsKernels.isAllowed("", "g", "/x"))
    assert(RobotsKernels.isAllowed("garbage line no colon\nUser-agent: *\nDisallow:\n", "g", "/x"))
    // a rule before any user-agent line belongs to no group
    assert(RobotsKernels.isAllowed("Disallow: /\nUser-agent: *\nAllow: /", "g", "/x"))
  }
}
