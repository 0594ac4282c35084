package graft.ext

/** Full public-suffix-list semantics (publicsuffix.org/list format
  * and matching algorithm) — the round-11 completion of the
  * injected-suffix mechanism behind [[WebOps.registeredDomain]]:
  * rules of ANY depth, `*.` wildcard rules (one label), and
  * `!` exception rules, not just the two-label second-level set the
  * default rollup recognizes.
  *
  * The LIST ITSELF is deployment data (the real PSL is fetched and
  * pinned per deployment; this environment has no egress, so
  * `data/psl_snapshot.dat` is a realistic synthetic snapshot in the
  * exact file format — comment lines, plain/wildcard/exception
  * rules — swapped for the genuine article at deploy time). The
  * ALGORITHM here is the published one:
  *
  *   1. every rule whose labels equal the host's trailing labels
  *      matches (`*` matches exactly one label)
  *   2. an exception rule prevails over everything; its public
  *      suffix is the rule minus its leftmost label
  *   3. otherwise the matching rule with the most labels prevails
  *   4. no match → the default rule `*` (the bare TLD)
  *   5. registered domain = public suffix + one preceding label;
  *      a host that IS a public suffix has none (passes through,
  *      the rollup convention [[WebOps.registeredDomain]] uses)
  *
  * Scale shape: the parsed form is three hash sets totalling the
  * list size, broadcast once; matching is O(labels) set probes per
  * host — the same cost class as the existing second-level lookup.
  */
final case class Psl(rules: Set[String], wildcards: Set[String],
                     exceptions: Set[String]) extends Serializable {

  /** Number of labels in the host's public suffix (≥ 1). */
  def publicSuffixLabels(labels: Array[String]): Int = {
    val n = labels.length
    var best = 1 // the implicit default rule `*`
    var k = n
    while (k >= 1) {
      val suffix = labels.slice(n - k, n).mkString(".")
      if (exceptions.contains(suffix)) return k - 1
      if (rules.contains(suffix) && k > best) best = k
      if (k >= 2 && wildcards.contains(labels.slice(n - k + 1, n).mkString(".")) &&
        k > best) best = k
      k -= 1
    }
    best
  }

  /** Registered domain under this list: public suffix + one label;
    * hosts at or below the suffix boundary pass through.
    */
  def registeredDomain(host: String): String = {
    val labels = host.split('.')
    if (labels.length < 2) return host
    val ps = publicSuffixLabels(labels)
    if (labels.length <= ps) host
    else labels.slice(labels.length - ps - 1, labels.length).mkString(".")
  }
}

object Psl {

  /** Parse the publicsuffix.org file format: `//` comments and blank
    * lines skipped, `!` marks an exception, `*.` a wildcard; rules
    * are lowercased (the list is ASCII/punycode by its own
    * contract).
    */
  def parse(lines: Iterator[String]): Psl = {
    val rules = Set.newBuilder[String]
    val wilds = Set.newBuilder[String]
    val excs = Set.newBuilder[String]
    lines.foreach { raw =>
      val line = raw.trim.toLowerCase
      if (line.nonEmpty && !line.startsWith("//")) {
        if (line.startsWith("!")) excs += line.substring(1)
        else if (line.startsWith("*.")) wilds += line.substring(2)
        else rules += line
      }
    }
    Psl(rules.result(), wilds.result(), excs.result())
  }

  def parseFile(path: String): Psl = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }
}
