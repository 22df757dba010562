package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[RobotsOps]] contract: the RFC 9309 file format (groups,
  * comments, empty Disallow), group selection, wildcard/anchor
  * translation, and the longest-match / tie-to-Allow filter. */
class RobotsOpsSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    """# policy
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /private/ # inline comment stripped
      |Allow: /private/ok$
      |
      |User-agent: *
      |Crawl-delay: 10
      |Disallow: /all
      |Disallow:
      |""".stripMargin

  test("parseRobots: comments and blanks skipped, adjacent " +
    "user-agent lines share one group, a user-agent line AFTER " +
    "rules opens a new group, empty Disallow dropped, unknown " +
    "fields ignored") {
    val rules = RobotsOps.parseRobots(body)
    assert(rules == Seq(
      RobotsOps.RobotsRule("graftbot", allow = false, "/private/"),
      RobotsOps.RobotsRule("otherbot", allow = false, "/private/"),
      RobotsOps.RobotsRule("graftbot", allow = true, "/private/ok$"),
      RobotsOps.RobotsRule("otherbot", allow = true, "/private/ok$"),
      RobotsOps.RobotsRule("*", allow = false, "/all")))
  }

  test("rulesFor: the exact agent group is preferred over *; groups " +
    "never merge; agents match case-insensitively") {
    val rules = RobotsOps.parseRobots(body)
    assert(RobotsOps.rulesFor(rules, "GraftBot").map(_.path) ==
      Seq("/private/", "/private/ok$"))
    assert(RobotsOps.rulesFor(rules, "unknownbot").map(_.path) ==
      Seq("/all"))
  }

  test("pathRegex: literals quoted (regex metachars inert), * spans " +
    "any run, trailing $ anchors, always start-anchored") {
    // find(), not matches(): the translation targets PARTIAL-match
    // engines (regexp_like / regexp_matches) and carries its own
    // anchors
    def m(rule: String, path: String) =
      java.util.regex.Pattern.compile(RobotsOps.pathRegex(rule))
        .matcher(path).find()
    assert(m("/a.b", "/a.b/c") && !m("/a.b", "/aXb/c"))
    assert(m("/*.pdf$", "/x/y.pdf") && !m("/*.pdf$", "/x/y.pdfz"))
    assert(m("/tmp*/", "/tmp123/f") && !m("/tmp*/", "/tmp"))
    assert(!m("/a", "/b/a"))
  }

  test("robotsFilter: longest rule wins, equal-length tie goes to " +
    "Allow, hosts without rules (or with no match) are allowed, " +
    "bare-host URLs get path /") {
    val perHost = Seq(
      "h1.test" -> "User-agent: *\nDisallow: /p\nAllow: /p\n",
      "h2.test" -> ("User-agent: *\nDisallow: /private/\n" +
        "Allow: /private/ok$\nDisallow: /*.pdf$\n"))
    val dim = RobotsOps.robotsDim(spark, perHost, "graftbot")
    val out = RobotsOps.robotsFilter(
        Seq(
          1L -> "https://h1.test/p/x",      // tie at len 2 -> Allow
          2L -> "https://h2.test/private/doc",
          3L -> "https://h2.test/private/ok",
          4L -> "https://h2.test/docs/f.pdf",
          5L -> "https://h2.test",           // bare host -> path /
          6L -> "https://h3.test/anything")  // no rules -> allowed
          .toDF("id", "u"),
        "id", col("u"), dim)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Boolean]("allowed"), r.getAs[String]("path"))))
      .toMap
    assert(out(1L) == ((true, "/p/x")))
    assert(out(2L) == ((false, "/private/doc")))
    assert(out(3L) == ((true, "/private/ok")))
    assert(out(4L) == ((false, "/docs/f.pdf")))
    assert(out(5L) == ((true, "/")))
    assert(out(6L) == ((true, "/anything")))
  }

  test("robotsFilter matches the URL AS FETCHED (r19 review fix): " +
    "trailing slash preserved (a directory Disallow covers it), " +
    "path case-sensitive and query included per the RFC; only the " +
    "authority lowercases") {
    val dim = RobotsOps.robotsDim(spark, Seq(
      "h2.test" -> ("User-agent: *\nDisallow: /private/\n" +
        "Disallow: /q?session=\n")), "graftbot")
    val out = RobotsOps.robotsFilter(
        Seq(
          // canonicalizeUrl would strip the trailing slash and
          // escape the directory rule — politeness must not
          1L -> "https://h2.test/private/",
          // path case preserved: /Private/ is a DIFFERENT path
          2L -> "HTTPS://H2.test/Private/x",
          // query participates in matching (canonicalization would
          // drop/sort params)
          3L -> "https://h2.test/q?session=abc",
          4L -> "https://h2.test/q?other=1")
          .toDF("id", "u"),
        "id", col("u"), dim)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Boolean]("allowed"), r.getAs[String]("path"),
          r.getAs[String]("host")))).toMap
    assert(out(1L) == ((false, "/private/", "h2.test")))
    assert(out(2L) == ((true, "/Private/x", "h2.test")))
    assert(out(3L) == ((false, "/q?session=abc", "h2.test")))
    assert(out(4L) == ((true, "/q?other=1", "h2.test")))
  }
}
