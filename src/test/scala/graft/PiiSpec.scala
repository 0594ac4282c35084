package graft

import graft.ext.TextOps
import graft.fn.PiiKernels
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.fn.PiiKernels]] — the hand-compiled PII scanners must
  * reproduce `java.util.regex` on the published patterns EXACTLY
  * (counts and sequential redaction), since the q127 oracle replays
  * the same regexes under RE2. The reference here IS
  * `java.util.regex` over [[TextOps.EmailRe]]/Ipv4Re/PhoneRe:
  * adversarial corner cases plus a randomized soup of planted
  * matches and near-misses.
  */
class PiiSpec extends AnyFunSuite {

  private val emailP = java.util.regex.Pattern.compile(TextOps.EmailRe)
  private val ipv4P = java.util.regex.Pattern.compile(TextOps.Ipv4Re)
  private val phoneP = java.util.regex.Pattern.compile(TextOps.PhoneRe)

  private def refCount(p: java.util.regex.Pattern, s: String): Long = {
    val m = p.matcher(s)
    var c = 0L
    while (m.find()) c += 1
    c
  }

  private def refRedact(s: String): String =
    phoneP.matcher(
      ipv4P.matcher(
        emailP.matcher(s).replaceAll("<EMAIL>"))
        .replaceAll("<IP>"))
      .replaceAll("<PHONE>")

  private def check(s: String): Unit = {
    assert(PiiKernels.countEmail(s) === refCount(emailP, s), s"email count: <$s>")
    assert(PiiKernels.countIpv4(s) === refCount(ipv4P, s), s"ipv4 count: <$s>")
    assert(PiiKernels.countPhone(s) === refCount(phoneP, s), s"phone count: <$s>")
    assert(PiiKernels.redact(s) === refRedact(s), s"redact: <$s>")
  }

  test("adversarial corner cases match java.util.regex exactly") {
    Seq(
      "", "plain text with none",
      // email: greedy domain backtracking (latest dot wins), dotted
      // local parts, leading dots, trailing junk, consecutive @
      "a@b.cc", "a@b.c.dd", "a@b.cc.dd-", "x..y@z.org!", "..a@b.cc",
      "a@@b.cc", "a@b", "a@b.c", "@b.cc", "a@", "a@b.cc1.2.3.4",
      "1.2.3.4@x.yy", "a@b.cc b@c.dd", "mail a.b+c%d@e-f.gh.ij now",
      "a@b.cc.c", "a@-.cc", "a@....cc", "end a@b.ccc",
      // ipv4: boundaries, long runs, octet lengths
      "1.2.3.4", " 1.2.3.4 ", "x1.2.3.4", "1.2.3.4x", "1234.1.1.1",
      "1.1.1.1234", "1.2.3", "255.255.255.255", "1.2.3.4.5",
      "a 10.0.200.99 b", "_1.2.3.4", "1.2.3.4_", "0.0.0.0",
      "ip:1.2.3.4,5.6.7.8", "1..2.3.4", ".1.2.3.4.",
      // phone: country-code lengths, over-long runs, missing dashes
      "+1-555-1234", "+12-555-1234", "+123-555-1234", "+1-5555-1234",
      "+1-555-123", "+1-555-12345", "call +1-555-1234 now",
      "++1-555-1234", "+-555-1234", "+1-555-1234+2-666-7777",
      // interactions: email containing ip-ish, phone after email
      "u1.2.3.4@h.ex 10.0.0.1 +1-555-0000",
      "a@b.cc+1-555-1234", "10.0.0.1@x.yy"
    ).foreach(check)
  }

  test("randomized soup: 2000 generated texts match java.util.regex") {
    val rnd = new scala.util.Random(42)
    val frags = Seq(
      "word", " ", ".", "-", "@", "+", "_", "!", "1", "12", "123",
      "1234", "a@b.cc", "x.y@z.w.org", "1.2.3.4", "10.0.200.9",
      "+1-555-1234", "+12-333-4444", "a@b", "1.2.3", "+1-55-1234",
      "ab.cd", "%", "5.6.7.8.9", "@@", "..", "--")
    for (_ <- 0 until 2000) {
      val s = (0 until 1 + rnd.nextInt(12))
        .map(_ => frags(rnd.nextInt(frags.length))).mkString
      check(s)
    }
  }

  test("q127 planted shapes redact to the expected tokens") {
    val s = "doc text contact user42@example.com from 10.0.42.42 up call +1-555-1042 ok"
    assert(PiiKernels.countEmail(s) === 1L)
    assert(PiiKernels.countIpv4(s) === 1L)
    assert(PiiKernels.countPhone(s) === 1L)
    assert(PiiKernels.redact(s) ===
      "doc text contact <EMAIL> from <IP> up call <PHONE> ok")
  }
}
