package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL operators — the provenance half of a crawl
  * pipeline's curation stage (the text half lives in [[TextOps]]):
  * URL canonicalization so the SAME page under cosmetic URL variants
  * dedups, host/registered-domain extraction, and per-domain quotas
  * (crawl corpora are Zipf-distributed over domains; training mixes
  * cap each domain's share so one site cannot dominate — the quota
  * rides the bounded [[Sketches.bottomKRows]] aggregate, O(k) state
  * per domain, never a per-domain sort).
  *
  * Normalization rules ([[Urls.normalizeOrNull]], RFC 3986 §6
  * subset): scheme + host lowercased; percent-encodings normalized
  * per §6.2.2.2 (hex uppercased, unreserved octets decoded — applied
  * to host/path/query BEFORE dot-segment removal, the RFC's §6.2.2
  * order, so `/%2E%2E/` collapses like `/../`); default ports
  * stripped (http:80, https:443); path dot-segments resolved by the
  * RFC remove_dot_segments algorithm; empty path → "/"; tracking
  * parameters (utm_*, fbclid, gclid) dropped with the other params'
  * order preserved; fragment dropped. Registered domain = last two
  * host labels, or three under a second-level-suffix set — the
  * built-in 5-entry set is the default; a production deployment
  * injects a full public-suffix-list snapshot as a `Broadcast`
  * (never an embedded payload — CollapseProject clones expressions,
  * so a ~240 KB PSL would ride the task binary once per clone).
  * Out-of-subset URLs (no "://", userinfo, bracketed IPv6, a colon
  * left in the host after the port split) → null, loudly documented.
  */
object WebOps {

  /** Adds `norm_url`, `host`, `domain` from `urlCol` via the
    * [[graft.fn.UrlNormalize]] codegen kernel (null for
    * out-of-subset URLs). `suffixes` injects a public-suffix-list
    * snapshot for the registered-domain rollup (broadcast once,
    * shared by every task); None keeps the built-in default set.
    */
  def withNormalizedUrls(df: DataFrame, urlCol: String,
      suffixes: Option[org.apache.spark.broadcast.Broadcast[Set[String]]] = None)
      : DataFrame = {
    import org.apache.spark.sql.{graftbridge => gb}
    df.withColumn("__u",
        gb.column(graft.fn.UrlNormalize(gb.expression(col(urlCol)), suffixes)))
      .withColumn("norm_url", col("__u.norm_url"))
      .withColumn("host", col("__u.host"))
      .withColumn("domain", col("__u.domain"))
      .drop("__u")
  }

  /** At most `k` rows per domain, picked deterministically by the
    * ascending `rank` column — the crawl-mix quota as a bounded
    * aggregate (map-side combine, O(partitions × k) rows per domain
    * on the exchange; no per-domain window sort).
    */
  def domainQuota(df: DataFrame, domainCol: String, rank: Column,
                  k: Int): DataFrame =
    Sketches.bottomKRows(df, Seq(domainCol), Seq(rank), k)

  /** XML entity unescape for sitemap values (the five predefined XML
    * entities — sitemaps REQUIRE `&` in URLs escaped as `&amp;`),
    * amp last so double escapes resolve one level.
    */
  private def xmlUnescape(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      org.apache.spark.sql.functions.replace(acc,
        org.apache.spark.sql.functions.lit(from),
        org.apache.spark.sql.functions.lit(to))
    }
  }

  /** Whitespace trim covering newlines/tabs (SQL `trim` is
    * space-only in both engines; the explicit class is the portable
    * RE2 ∩ java.util.regex set, the HtmlKernels rule).
    */
  private def wsTrim(c: Column): Column =
    regexp_replace(c, "^[ \t\n\f\r]+|[ \t\n\f\r]+$", "")

  /** Sitemap-protocol `<urlset>` extraction (sitemaps.org): one row
    * per `<url>` entry — `(id, seq, loc, lastmod)`, `loc` trimmed
    * (the protocol allows surrounding whitespace) and XML-unescaped,
    * `lastmod` null when absent. Pure built-in plan (split → explode
    * → regexp_extract → replace chain): no UDF, no XML library, and
    * the exact same pipeline is SQL-expressible so q135 gates it
    * hash-exact. `seq` is the entry's document position (1-based;
    * fragment 0 is the preamble before the first `<url>`).
    */
  def sitemapUrls(df: DataFrame, idCol: String, xmlCol: String): DataFrame =
    sitemapEntries(df, idCol, xmlCol, "url")

  /** The `<sitemapindex>` form (an index of child sitemaps) — the
    * same entry shape under the `<sitemap>` tag; a crawl-discovery
    * walk reads the index first, then fans out over the children.
    */
  def sitemapIndex(df: DataFrame, idCol: String, xmlCol: String): DataFrame =
    sitemapEntries(df, idCol, xmlCol, "sitemap")

  private def sitemapEntries(df: DataFrame, idCol: String, xmlCol: String,
                             tag: String): DataFrame = {
    val frag = col("frag")
    df.select(col(idCol),
        posexplode(split(col(xmlCol), s"<$tag>")).as(Seq("seq", "frag")))
      .filter(frag.contains(s"</$tag>"))
      .select(col(idCol), col("seq").cast("long").as("seq"),
        // (?s): pretty-printed sitemaps put the value on its own line;
        // the trim must strip that newline too, not just spaces
        xmlUnescape(wsTrim(regexp_extract(frag, "(?s)<loc>(.*?)</loc>", 1))).as("loc"),
        when(regexp_extract(frag, "(?s)<lastmod>(.*?)</lastmod>", 1) === "", lit(null))
          .otherwise(wsTrim(regexp_extract(frag, "(?s)<lastmod>(.*?)</lastmod>", 1)))
          .as("lastmod"))
      .filter(col("loc") =!= "")
  }
}

/** The pure URL kernel behind [[WebOps]]. */
object Urls {

  // second-level public suffixes the domain rollup recognizes by
  // default (the mechanism; the full PSL is deployment data, injected
  // per call — see registeredDomain's suffix parameter)
  val DefaultSecondLevelSuffixes: Set[String] =
    Set("co.uk", "org.uk", "ac.uk", "com.au", "co.jp")

  private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10

  private def isUnreservedOctet(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  /** RFC 3986 §6.2.2.2 percent-encoding normalization: hex digits of
    * an escape uppercased; octets that encode unreserved characters
    * (ALPHA / DIGIT / "-" / "." / "_" / "~") decoded. Escapes of
    * reserved octets are left encoded (decoding them would CHANGE the
    * URL — `%2F` is not `/`). Malformed escapes (no two hex digits)
    * pass through verbatim: normalization must never reject what the
    * fetcher accepted. Single linear pass; the common no-`%` string
    * returns itself with no allocation.
    */
  def percentNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          isHexDigit(s.charAt(i + 1)) && isHexDigit(s.charAt(i + 2))) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        if (isUnreservedOctet(v)) out.append(v.toChar)
        else out.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else {
        out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(path: String): String = {
    val out = new java.lang.StringBuilder
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../") || in == "/..") {
        in = if (in == "/..") "/" else "/" + in.substring(4)
        val i = out.lastIndexOf("/")
        out.setLength(math.max(i, 0))
      } else if (in == "." || in == "..") in = ""
      else {
        val from = if (in.charAt(0) == '/') 1 else 0
        val i = in.indexOf('/', from)
        val seg = if (i < 0) in else in.substring(0, i)
        out.append(seg)
        in = if (i < 0) "" else in.substring(i)
      }
    }
    out.toString
  }

  private def dropTracking(query: String): String =
    if (query.isEmpty) ""
    else {
      val kept = query.split("&", -1).filterNot(p =>
        p.startsWith("utm_") || p.startsWith("fbclid=") || p.startsWith("gclid="))
      kept.mkString("&")
    }

  /** Registered domain: last two labels, three under the
    * second-level-suffix set (the built-in default, or an injected
    * PSL snapshot); hosts with fewer labels pass through.
    */
  def registeredDomain(host: String): String =
    registeredDomain(host, DefaultSecondLevelSuffixes)

  def registeredDomain(host: String, secondLevel: Set[String]): String = {
    val parts = host.split('.')
    if (parts.length < 2) host
    else {
      val last2 = parts(parts.length - 2) + "." + parts(parts.length - 1)
      if (parts.length >= 3 && secondLevel.contains(last2))
        parts(parts.length - 3) + "." + last2
      else last2
    }
  }

  /** (norm_url, host, domain) or null for out-of-subset URLs. */
  def normalizeOrNull(url: String): (String, String, String) =
    normalizeOrNull(url, DefaultSecondLevelSuffixes)

  def normalizeOrNull(url: String,
                      secondLevel: Set[String]): (String, String, String) = {
    if (url == null) return null
    val sep = url.indexOf("://")
    if (sep <= 0) return null
    val scheme = url.substring(0, sep).toLowerCase
    if (!scheme.forall(c => c >= 'a' && c <= 'z')) return null
    val rest = url.substring(sep + 3)
    var authEnd = rest.length
    var i = 0
    var found = false
    while (i < rest.length && !found) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') { authEnd = i; found = true }
      i += 1
    }
    val authority = rest.substring(0, authEnd)
    if (authority.isEmpty || authority.contains('@') || authority.contains('['))
      return null
    val colon = authority.lastIndexOf(':')
    val (hostRaw, port) =
      if (colon < 0) (authority, "")
      else (authority.substring(0, colon), authority.substring(colon + 1))
    if (port.nonEmpty && !port.forall(c => c >= '0' && c <= '9')) return null
    // a colon LEFT in the host after the port split (http://a:1:2/x)
    // is out of subset, like userinfo and bracketed IPv6 above
    if (hostRaw.indexOf(':') >= 0) return null
    val host = percentNormalize(hostRaw).toLowerCase
    if (host.isEmpty) return null
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))
    val afterAuth = rest.substring(authEnd)
    val hashIdx = afterAuth.indexOf('#')
    val noFrag = if (hashIdx < 0) afterAuth else afterAuth.substring(0, hashIdx)
    val qIdx = noFrag.indexOf('?')
    val pathRaw = if (qIdx < 0) noFrag else noFrag.substring(0, qIdx)
    val queryRaw = if (qIdx < 0) "" else noFrag.substring(qIdx + 1)
    // §6.2.2 order: percent normalization BEFORE dot-segment removal,
    // so a "%2E%2E" segment collapses exactly like ".."
    val path0 = removeDotSegments(percentNormalize(pathRaw))
    val path = if (path0.isEmpty) "/" else path0
    // unreserved decode never yields '&' or '=' (both reserved stay
    // encoded), so the tracking-param split sees stable boundaries —
    // and a "utm%5Fsource" disguise is unmasked before the filter
    val query = dropTracking(percentNormalize(queryRaw))
    val norm = new java.lang.StringBuilder(scheme).append("://").append(host)
    if (keepPort) norm.append(':').append(port)
    norm.append(path)
    if (query.nonEmpty) norm.append('?').append(query)
    (norm.toString, host, registeredDomain(host, secondLevel))
  }
}
