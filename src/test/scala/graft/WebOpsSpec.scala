package graft

import graft.ext.{Urls, WebOps}
import org.apache.spark.sql.functions._

/** [[graft.ext.Urls]] / [[graft.ext.WebOps]] — URL canonicalization
  * corner cases (RFC 3986 remove_dot_segments traces, default
  * ports, tracking params, suffix rollup, out-of-subset nulls), the
  * quota operator's bounded-aggregate plan shape, and the SQL
  * surface.
  */
class WebOpsSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeOrNull: hand-traced RFC cases") {
    def n(u: String): String = {
      val t = Urls.normalizeOrNull(u)
      if (t == null) null else t._1
    }
    assert(n("HTTP://WWW.Example.COM:80/a/b/../c?utm_source=x&id=7#frag") ===
      "http://www.example.com/a/c?id=7")
    assert(n("https://h.site.org:443/a/./b") === "https://h.site.org/a/b")
    assert(n("https://h.site.org:8443/x") === "https://h.site.org:8443/x")
    assert(n("http://a.b.com") === "http://a.b.com/")
    assert(n("http://a.b.com/p/q/../../r") === "http://a.b.com/r")
    assert(n("http://a.b.com/a/..") === "http://a.b.com/")
    assert(n("http://a.b.com/a/../") === "http://a.b.com/")
    assert(n("http://a.b.com/?fbclid=zz") === "http://a.b.com/")
    assert(n("http://a.b.com/?gclid=1&keep=2&utm_x=3") === "http://a.b.com/?keep=2")
    // out-of-subset: loud nulls
    assert(n("not a url") == null)
    assert(n("http://user@host.com/") == null)
    assert(n("http://[::1]/x") == null)
    assert(n("://nohost") == null)
    assert(n("h ttp://x.com/") == null)
  }

  test("percentNormalize: RFC 3986 §6.2.2.2 goldens") {
    // unreserved octets decode; reserved stay encoded but uppercase
    assert(Urls.percentNormalize("%7e%41%2d%5f%2e") === "~A-_.")
    assert(Urls.percentNormalize("a%2Fb%3fc") === "a%2Fb%3Fc")
    assert(Urls.percentNormalize("%2fx%2F") === "%2Fx%2F")
    // malformed escapes pass through verbatim
    assert(Urls.percentNormalize("%zz%4") === "%zz%4")
    assert(Urls.percentNormalize("100%") === "100%")
    // no-% fast path returns the same reference
    val s = "plain/path"
    assert(Urls.percentNormalize(s) eq s)
  }

  test("normalizeOrNull: percent normalization in host, path, query") {
    def n(u: String): String = {
      val t = Urls.normalizeOrNull(u)
      if (t == null) null else t._1
    }
    // %7E → ~ in path; mixed-case reserved hex uppercased
    assert(n("http://a.com/%7Euser/x%2fy") === "http://a.com/~user/x%2Fy")
    // §6.2.2 order: an escaped dot segment collapses like a literal one
    assert(n("http://a.com/a/%2E%2E/b") === "http://a.com/b")
    // host percent-decodes then lowercases
    assert(Urls.normalizeOrNull("http://%41.com/x")._2 === "a.com")
    // a disguised utm param is unmasked before the tracking filter
    assert(n("http://a.com/?utm%5Fsource=x&id=3") === "http://a.com/?id=3")
    // multi-colon authority is out of subset, not a silent "a:1" host
    assert(n("http://a:1:2/x") == null)
  }

  test("registeredDomain and withNormalizedUrls accept an injected suffix set") {
    val psl = Urls.DefaultSecondLevelSuffixes + "com.br" + "net.nz"
    assert(Urls.registeredDomain("shop.example.com.br", psl) === "example.com.br")
    // the default set does NOT know com.br — that's the injection point
    assert(Urls.registeredDomain("shop.example.com.br") === "com.br")
    assert(Urls.registeredDomain("sub.demo.co.uk", psl) === "demo.co.uk")
    val bc = spark.sparkContext.broadcast(psl)
    val got = WebOps.withNormalizedUrls(
        Seq((1L, "https://Shop.Example.COM.br/a/../b")).toDF("id", "url"),
        "url", Some(bc))
      .select($"norm_url", $"domain").head()
    assert(got.getString(0) === "https://shop.example.com.br/b")
    assert(got.getString(1) === "example.com.br")
  }

  test("registered domain: PSL second-level mechanism") {
    assert(Urls.registeredDomain("a.b.example.com") === "example.com")
    assert(Urls.registeredDomain("sub.demo.co.uk") === "demo.co.uk")
    assert(Urls.registeredDomain("demo.co.uk") === "demo.co.uk")
    assert(Urls.registeredDomain("co.uk") === "co.uk")
    assert(Urls.registeredDomain("localhost") === "localhost")
    assert(Urls.registeredDomain("x.ac.uk") === "x.ac.uk")
  }

  test("full PSL snapshot file: wildcard + exception rules end-to-end") {
    val psl = graft.ext.Psl.parseFile("data/psl_snapshot.dat")
    assert(psl.rules.size + psl.wildcards.size + psl.exceptions.size > 4000)
    // plain rules, any depth
    assert(psl.registeredDomain("shop.example.co.uk") === "example.co.uk")
    assert(psl.registeredDomain("a.b.gov.qab") === "b.gov.qab") // synthetic family
    // wildcard *.ck: every single label under ck is itself a suffix
    assert(psl.registeredDomain("a.b.ck") === "a.b.ck")
    assert(psl.registeredDomain("x.a.b.ck") === "a.b.ck")
    assert(psl.registeredDomain("b.ck") === "b.ck") // IS a public suffix → pass through
    // exception !www.ck: registrable directly at the TLD
    assert(psl.registeredDomain("www.ck") === "www.ck")
    assert(psl.registeredDomain("a.www.ck") === "www.ck")
    // deep wildcard + exception pair (*.kobe.jp / !city.kobe.jp)
    assert(psl.registeredDomain("x.chuo.kobe.jp") === "x.chuo.kobe.jp")
    assert(psl.registeredDomain("city.kobe.jp") === "city.kobe.jp")
    assert(psl.registeredDomain("x.city.kobe.jp") === "city.kobe.jp")
    // unknown TLD falls to the implicit default rule `*`
    assert(psl.registeredDomain("foo.bar.unknowntld") === "bar.unknowntld")
    // rollup changes ONLY where the list says so: hosts governed by
    // plain second-level semantics agree with the built-in mechanism
    for (h <- Seq("a.b.example.com", "sub.demo.co.uk", "demo.co.uk",
                  "x.ac.uk", "localhost"))
      assert(psl.registeredDomain(h) === Urls.registeredDomain(h), h)
    // ...and wildcard/deep rules diverge exactly as the PSL dictates
    assert(Urls.registeredDomain("x.a.b.ck") === "b.ck") // default 2-label view
    assert(psl.registeredDomain("x.a.b.ck") === "a.b.ck") // PSL wildcard view
  }

  test("removeDotSegments: the RFC 3986 §5.2.4 examples") {
    assert(Urls.removeDotSegments("/a/b/c/./../../g") === "/a/g")
    assert(Urls.removeDotSegments("mid/content=5/../6") === "mid/6")
    assert(Urls.removeDotSegments("/../x") === "/x")
    assert(Urls.removeDotSegments("/a/b/..") === "/a/")
    assert(Urls.removeDotSegments(".") === "")
    assert(Urls.removeDotSegments("..") === "")
  }

  test("domainQuota: bounded aggregate (no window sort), k rows per domain, determinism") {
    val df = (0 until 200).map(i =>
      (i.toLong, s"http://h$i.d${i % 7}.com/p", s"d${i % 7}.com"))
      .toDF("doc_id", "norm_url", "domain").repartition(8)
    val out = WebOps.domainQuota(df, "domain", $"doc_id", 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    val rows = out.collect().map(r => (r.getAs[String]("domain"), r.getAs[Long]("doc_id")))
    assert(rows.length === 7 * 3)
    rows.groupBy(_._1).foreach { case (d, g) =>
      val want = (0 until 200).filter(i => s"d${i % 7}.com" == d).sorted.take(3)
      assert(g.map(_._2).sorted.toSeq === want.map(_.toLong), d)
    }
  }

  test("SQL surface: url_normalize registered; nulls propagate") {
    GraftExtensions.install(spark)
    val got = spark.sql(
      "SELECT url_normalize('HTTPS://X.co.UK:443/a/./b?utm_a=1&z=2#f') AS u")
      .select($"u.norm_url", $"u.domain").head()
    assert(got.getString(0) === "https://x.co.uk/a/b?z=2")
    assert(got.getString(1) === "x.co.uk")
    assert(spark.sql("SELECT url_normalize('junk') IS NULL AS n").head().getBoolean(0))
  }

  test("sitemapUrls and sitemapIndex: entries, pretty-printing, escapes") {
    val xml = """<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |<url><loc>https://a.example/p?x=1&amp;y=2</loc><lastmod>2026-01-02</lastmod></url>
      |<url><loc>
      |  https://a.example/q
      |</loc></url>
      |</urlset>""".stripMargin
    val idx = """<sitemapindex><sitemap><loc> https://a.example/s1.xml.gz </loc>
      |<lastmod>2026-02-03</lastmod></sitemap>
      |<sitemap><loc>https://a.example/s2.xml</loc></sitemap></sitemapindex>""".stripMargin
    val df = Seq((1L, xml, idx)).toDF("id", "sm", "ix")
    val urls = WebOps.sitemapUrls(df, "id", "sm")
      .orderBy($"seq").collect().map(r => (r.getString(2), r.getString(3)))
    assert(urls.toSeq === Seq(
      ("https://a.example/p?x=1&y=2", "2026-01-02"),
      ("https://a.example/q", null)))
    val subs = WebOps.sitemapIndex(df, "id", "ix")
      .orderBy($"seq").collect().map(r => (r.getString(2), r.getString(3)))
    assert(subs.toSeq === Seq(
      ("https://a.example/s1.xml.gz", "2026-02-03"),
      ("https://a.example/s2.xml", null)))
    // the <urlset ...> preamble never splits as a <url> entry
    assert(WebOps.sitemapUrls(df, "id", "sm").count() === 2)
  }

  test("html_text and robots_allowed stay inside whole-stage codegen") {
    GraftExtensions.install(spark)
    // spark.range keeps the plan lazy (the RepetitionSpec discipline:
    // a local Seq constant-folds and proves nothing)
    val df = spark.range(50)
      .selectExpr("id", "concat('<p>tok', id, '</p>') AS html")
      .selectExpr("html_text(html) AS t",
        "robots_allowed('User-agent: *' || chr(10) || 'Disallow: /p', 'bot', concat('/x', id)) AS a")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // the PROJECT carrying the kernels must itself be starred — a
    // bare *(1) Range with an unstarred Project would mean the
    // kernels fell out of codegen
    assert(plan.contains("*(1) Project"), plan)
  }

  test("q133 crawl pipeline: no Window operator anywhere in the plan") {
    // dedup = argmin-struct aggregate, quota = bounded bottom-k — a
    // Window.partitionBy over the corpus is the skew scale-killer
    // this pipeline must never reintroduce
    val df = SparkEntry.queries("q133_crawl_pipeline")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "q133 plan must not contain a Window")
    assert(df.count() > 0)
  }
}
