package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Sitemaps]] contract: urlset and sitemapindex parsing, optional
  * fields, malformed-XML null quarantine; plus the robots.txt
  * `Sitemap:` discovery hook. */
class SitemapsSpec extends SparkSpec {
  import spark.implicits._

  test("parseUrlset: loc/lastmod/changefreq/priority per entry; " +
    "absent optional fields are null; malformed XML yields a null " +
    "array (quarantine, not failure)") {
    val good = "<urlset>" +
      "<url><loc>https://a/1</loc><lastmod>2026-01-02</lastmod>" +
      "<changefreq>daily</changefreq><priority>0.8</priority></url>" +
      "<url><loc>https://a/2</loc></url>" +
      "</urlset>"
    val bad = "<urlset><url><loc>https://a/3"
    val out = Seq((1L, good), (2L, bad)).toDF("id", "xml")
      .select(col("id"), Sitemaps.parseUrlset(col("xml")).as("u"))
      .collect().map(r => r.getAs[Long]("id") -> r.get(1)).toMap
    val entries = out(1L)
      .asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]]
    assert(entries.length == 2)
    assert(entries.head.getAs[String]("loc") == "https://a/1" &&
      entries.head.getAs[String]("lastmod") == "2026-01-02" &&
      entries.head.getAs[String]("changefreq") == "daily" &&
      entries.head.getAs[Double]("priority") == 0.8)
    assert(entries(1).getAs[String]("loc") == "https://a/2" &&
      entries(1).getAs[String]("lastmod") == null)
    assert(out(2L) == null)
  }

  test("parseIndex: child sitemap locs + lastmod") {
    val idx = "<sitemapindex>" +
      "<sitemap><loc>https://a/s1.xml</loc>" +
      "<lastmod>2026-02-03</lastmod></sitemap>" +
      "<sitemap><loc>https://a/s2.xml</loc></sitemap>" +
      "</sitemapindex>"
    val rows = Seq(Tuple1(idx)).toDF("xml")
      .select(explode(Sitemaps.parseIndex(col("xml"))).as("s"))
      .select(col("s.loc"), col("s.lastmod"))
      .as[(String, Option[String])].collect().toSeq
    assert(rows == Seq(
      ("https://a/s1.xml", Some("2026-02-03")),
      ("https://a/s2.xml", None)))
  }

  test("parseW3cDatetime: every W3C NOTE-datetime precision parses " +
    "(reduced forms resolve to their interval start, tz offsets " +
    "normalize to UTC); junk and out-of-grammar spellings go null") {
    val cases = Seq(
      "2026" -> "2026-01-01 00:00:00",
      "2026-03" -> "2026-03-01 00:00:00",
      "2026-03-15" -> "2026-03-15 00:00:00",
      "2026-03-15T10:30Z" -> "2026-03-15 10:30:00",
      "2026-03-15T10:30+02:00" -> "2026-03-15 08:30:00",
      "2026-03-15T10:30:45Z" -> "2026-03-15 10:30:45",
      "2026-03-15T10:30:45-05:00" -> "2026-03-15 15:30:45",
      "2026-03-15T10:30:45.5Z" -> "2026-03-15 10:30:45.5",
      "2026-03-15T10:30:45.25Z" -> "2026-03-15 10:30:45.25",
      "2026-03-15T10:30:45.123Z" -> "2026-03-15 10:30:45.123",
      " 2026-03-15 " -> "2026-03-15 00:00:00", // trimmed
      // out of grammar: no tz on a time, slash dates, prose, empty
      "2026-03-15T10:30:45" -> null,
      "15/03/2026" -> null,
      "last tuesday" -> null,
      "" -> null)
    val out = cases.map(_._1).toDF("lm")
      .select(Sitemaps.parseW3cDatetime(col("lm")).cast("string"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    cases.zip(out).foreach { case ((in, want), got) =>
      assert(got == want, s"'$in': got $got want $want")
    }
  }

  test("RobotsOps.sitemapsOf: Sitemap lines surface regardless of " +
    "group position, comments stripped, order preserved") {
    val body =
      """User-agent: *
        |Disallow: /p
        |Sitemap: https://a/s1.xml # primary
        |
        |User-agent: bot
        |Allow: /
        |sitemap: https://a/s2.xml
        |Sitemap:
        |""".stripMargin
    assert(graft.text.RobotsOps.sitemapsOf(body) ==
      Seq("https://a/s1.xml", "https://a/s2.xml"))
  }
}
