package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The PSL algorithm contract of [[DomainOps.registrableDomains]]:
  * every rule kind (normal single- and multi-label, wildcard,
  * exception, implicit default), the exact-suffix null case, private
  * multi-tenant suffixes, and the non-domain inputs (IP, non-URL). */
class DomainOpsSpec extends SparkSpec {
  import spark.implicits._

  private def run(urls: (Long, String)*) =
    DomainOps.registrableDomains(
        urls.toSeq.toDF("id", "u"), "id", col("u"))
      .collect().map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[String]("host")),
          Option(r.getAs[String]("public_suffix")),
          Option(r.getAs[String]("registrable_domain"))))).toMap

  test("normal rules: single-label TLD and multi-label suffix; the " +
    "LONGEST matching rule prevails (co.uk over uk)") {
    val out = run(
      1L -> "https://A.Example.COM/x",
      2L -> "https://news.bbc.co.uk/story",
      3L -> "https://www.bbc.co.uk/")
    assert(out(1L) == ((Some("a.example.com"), Some("com"),
      Some("example.com"))))
    assert(out(2L) == ((Some("news.bbc.co.uk"), Some("co.uk"),
      Some("bbc.co.uk"))))
    // canonicalization strips www. first: same registrable as 2
    assert(out(3L) == ((Some("bbc.co.uk"), Some("co.uk"),
      Some("bbc.co.uk"))))
  }

  test("exact-suffix hosts: nothing below the public suffix is " +
    "registered, so registrable_domain is null") {
    val out = run(
      1L -> "https://com/x",
      2L -> "https://co.uk/x",
      3L -> "https://github.io/")
    assert(out(1L) == ((Some("com"), Some("com"), None)))
    assert(out(2L) == ((Some("co.uk"), Some("co.uk"), None)))
    assert(out(3L) == ((Some("github.io"), Some("github.io"), None)))
  }

  test("wildcard *.ck makes every label under ck a public suffix; " +
    "exception !www.ck carves www.ck back out as registrable") {
    val out = run(
      1L -> "https://foo.bar.ck/x",
      2L -> "https://bar.ck/x",
      3L -> "https://a.www.ck/x",
      4L -> "https://ck/x")
    assert(out(1L) == ((Some("foo.bar.ck"), Some("bar.ck"),
      Some("foo.bar.ck"))))
    // host IS the wildcard-made suffix: nothing registered below it
    assert(out(2L) == ((Some("bar.ck"), Some("bar.ck"), None)))
    // exception: public suffix is ck, so www.ck is registrable
    assert(out(3L) == ((Some("a.www.ck"), Some("ck"),
      Some("www.ck"))))
    assert(out(4L) == ((Some("ck"), Some("ck"), None)))
  }

  test("private-section suffixes: per-tenant subdomains of github.io " +
    "/ blogspot.com are distinct registrable domains") {
    val out = run(
      1L -> "https://alice.github.io/repo",
      2L -> "https://deep.path.bob.github.io/",
      3L -> "https://cook.blogspot.com/recipe")
    assert(out(1L) == ((Some("alice.github.io"), Some("github.io"),
      Some("alice.github.io"))))
    assert(out(2L) == ((Some("deep.path.bob.github.io"),
      Some("github.io"), Some("bob.github.io"))))
    assert(out(3L) == ((Some("cook.blogspot.com"),
      Some("blogspot.com"), Some("cook.blogspot.com"))))
  }

  test("default rule: an unknown TLD's last label is the public " +
    "suffix; deep subdomains still yield eTLD+1") {
    val out = run(
      1L -> "https://host.unknowntld/x",
      2L -> "https://a.b.c.host.unknowntld/x",
      3L -> "https://unknowntld/x")
    assert(out(1L) == ((Some("host.unknowntld"), Some("unknowntld"),
      Some("host.unknowntld"))))
    assert(out(2L) == ((Some("a.b.c.host.unknowntld"),
      Some("unknowntld"), Some("host.unknowntld"))))
    assert(out(3L) == ((Some("unknowntld"), Some("unknowntld"), None)))
  }

  test("non-domains: IPv4, bracketed IPv6, userinfo/port stripping, " +
    "and non-URL strings") {
    val out = run(
      1L -> "https://192.168.0.1/x",
      2L -> "http://[2001:db8::1]:8080/x",
      3L -> "https://user:pw@a.example.com:8443/x",
      4L -> "not a url at all")
    assert(out(1L) == ((None, None, None)))
    assert(out(2L) == ((None, None, None)))
    assert(out(3L) == ((Some("a.example.com"), Some("com"),
      Some("example.com"))))
    assert(out(4L) == ((None, None, None)))
  }

  test("a fully-qualified trailing-dot host is the same host (PSL " +
    "strip) — no phantom empty label wins the default rule") {
    val out = run(
      1L -> "https://a.example.com./x",
      2L -> "https://news.bbc.co.uk./y",
      3L -> "https://a.example.com../x")
    assert(out(1L) == ((Some("a.example.com"), Some("com"),
      Some("example.com"))))
    assert(out(2L) == ((Some("news.bbc.co.uk"), Some("co.uk"),
      Some("bbc.co.uk"))))
    // a malformed dot-RUN strips entirely too (r18 ADVICE): the
    // empty last label must not survive to win the default rule
    assert(out(3L) == ((Some("a.example.com"), Some("com"),
      Some("example.com"))))
  }

  test("loud 10-bit bounds: a swap-in rules row with rule_labels " +
    "out of range fails the broadcast build, not the answer") {
    import spark.implicits._
    val badDim = Seq(("com", "normal", 2000))
      .toDF("rule", "kind", "rule_labels")
    val df = Seq((1L, "https://a.example.com/x")).toDF("id", "u")
    val e = intercept[Exception] {
      DomainOps.registrableDomains(df, "id", col("u"),
        rules = Some(badDim)).collect()
    }
    assert(e.getMessage.contains("rule_labels") ||
      Option(e.getCause).exists(_.getMessage.contains("rule_labels")))
    val e2 = intercept[IllegalArgumentException] {
      DomainOps.suffixDim(spark,
        Seq(Seq.fill(1500)("a").mkString(".")))
    }
    assert(e2.getMessage.contains("labels"))
  }

  test("parsePslList: a real-FORMAT slice — comments, blanks, the " +
    "private-section marker, trailing annotations, IDN rules — " +
    "parses into working rules") {
    val slice = Seq(
      "// ===BEGIN ICANN DOMAINS===",
      "// com : https://en.wikipedia.org/wiki/.com",
      "com",
      "",
      "uk",
      "co.uk",
      "*.sch.uk\t// wildcard with a trailing annotation",
      "!known.sch.uk",
      "// IDN: unicode spelling and its punycode twin",
      "xn--p1ai",
      "ИСПЫТАНИЕ",
      "",
      "// ===BEGIN PRIVATE DOMAINS===",
      "github.io")
    val rules = DomainOps.parsePslList(slice)
    assert(rules == Seq("com", "uk", "co.uk", "*.sch.uk",
      "!known.sch.uk", "xn--p1ai", "xn--80akhbyknj4f", "github.io"))
    val dim = DomainOps.suffixDim(spark, rules)
    val out = DomainOps.registrableDomains(
        Seq(
          1L -> "https://foo.example.com/x",
          2L -> "https://x.some.sch.uk/",
          3L -> "https://known.sch.uk/x",
          4L -> "https://site.xn--p1ai/x",
          // the unicode rule, punycoded by the parser, matches an
          // already-punycoded host
          5L -> "https://a.xn--80akhbyknj4f/x").toDF("id", "u"),
        "id", col("u"), rules = Some(dim))
      .collect().map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[String]("public_suffix")),
          Option(r.getAs[String]("registrable_domain"))))).toMap
    assert(out(1L) == ((Some("com"), Some("example.com"))))
    assert(out(2L) == ((Some("some.sch.uk"), Some("x.some.sch.uk"))))
    // exception rule carves known.sch.uk back out: ps = sch.uk
    assert(out(3L) == ((Some("sch.uk"), Some("known.sch.uk"))))
    assert(out(4L) == ((Some("xn--p1ai"), Some("site.xn--p1ai"))))
    assert(out(5L) == ((Some("xn--80akhbyknj4f"),
      Some("a.xn--80akhbyknj4f"))))
  }

  test("parsePslList IDNA2003 edges (r19 ADVICE): a label java.net" +
    ".IDN cannot encode fails THIS parse loudly naming the rule; " +
    "the ss-mapping divergence from UTS-46 is pinned") {
    // a label whose punycode exceeds the 63-octet DNS label limit is
    // rejected by IDNA2003's toASCII — must throw, not fall through
    // to a silently-unmatchable spelling
    val tooLong = "ü" * 60
    val e = intercept[IllegalArgumentException] {
      DomainOps.parsePslList(Seq("com", s"$tooLong.example"))
    }
    assert(e.getMessage.contains("punycoded PSL"), e.getMessage)
    // IDNA2003 maps ß -> ss (UTS-46 encoders keep xn--zca...): the
    // divergence is documented; this pins which side we are on
    assert(DomainOps.parsePslList(Seq("straße.example")) ==
      Seq("strasse.example"))
  }

  test("IDN contract pinned: a RAW-unicode host (not punycoded " +
    "upstream) matches no rule and resolves through the default " +
    "rule — encode at ingestion when crawling IDN space") {
    val dim = DomainOps.suffixDim(spark,
      DomainOps.parsePslList(Seq("испытание", "com")))
    val out = DomainOps.registrableDomains(
        Seq(1L -> "https://b.испытание/x").toDF("id", "u"),
        "id", col("u"), rules = Some(dim))
      .collect().head
    // default rule, NOT the (punycoded) испытание rule
    assert(out.getAs[String]("public_suffix") == "испытание")
    assert(out.getAs[String]("registrable_domain") == "b.испытание")
  }

  test("one output row per distinct (id, url): exact input " +
    "duplicates collapse, distinct ids with the same url do not") {
    val df = Seq((1L, "https://a.example.com/x"),
      (1L, "https://a.example.com/x"),
      (2L, "https://a.example.com/x")).toDF("id", "u")
    val out = DomainOps.registrableDomains(df, "id", col("u"))
    assert(out.count() == 2L)
  }
}
