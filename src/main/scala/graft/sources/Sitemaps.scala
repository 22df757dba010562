package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sitemap protocol (sitemaps.org) parsing — the crawl-discovery
  * surface beside [[graft.text.HtmlOps.extractLinks]] (page links)
  * and [[graft.text.RobotsOps.sitemapsOf]] (the robots.txt
  * `Sitemap:` hook that points here): a site's own enumeration of
  * its URLs with freshness metadata, the highest-precision frontier
  * seed a crawler gets.
  *
  * Both document kinds parse as pure Catalyst `from_xml` projections
  * (Spark's native XML path — row-local, zero UDFs, zero shuffles):
  * `<urlset>` bodies yield (loc, lastmod, changefreq, priority)
  * entry arrays to explode; `<sitemapindex>` bodies yield child
  * sitemap locs (crawl recursion is the caller's loop — it owns
  * fetching). Malformed XML follows the engine's cast-to-null
  * convention: `from_xml` yields null structs, quarantine with
  * `isNull` downstream (the s5_jsonl_corrupt pattern). */
object Sitemaps {

  /** One `<url>` entry's shape; `priority` parses numeric (protocol
    * range 0.0–1.0), everything else stays string — `lastmod` is
    * W3C datetime with several legal precisions, a policy cast for
    * the caller. */
  val urlsetSchema: StructType = StructType.fromDDL(
    "url ARRAY<STRUCT<loc: STRING, lastmod: STRING, " +
      "changefreq: STRING, priority: DOUBLE>>")

  val indexSchema: StructType = StructType.fromDDL(
    "sitemap ARRAY<STRUCT<loc: STRING, lastmod: STRING>>")

  /** `<urlset>` XML → array of url-entry structs (explode to rows). */
  def parseUrlset(xml: Column): Column =
    from_xml(xml, urlsetSchema).getField("url")

  /** `<sitemapindex>` XML → array of child-sitemap structs. */
  def parseIndex(xml: Column): Column =
    from_xml(xml, indexSchema).getField("sitemap")

  /** W3C datetime (the `lastmod` grammar — W3C NOTE-datetime, the
    * sitemap protocol's reference) → timestamp: every legal
    * precision — `YYYY`, `YYYY-MM`, `YYYY-MM-DD`,
    * `...Thh:mmTZD`, `...Thh:mm:ssTZD`, `...Thh:mm:ss.sTZD`, with
    * `TZD` either `Z` or `±hh:mm`. Reduced precisions resolve to
    * their interval's START (Jan 1 / the 1st / midnight — the
    * conservative freshness reading: a page stamped `2026-03` is
    * AT LEAST as old as Mar 1). Anything outside the grammar →
    * null (the cast-to-null convention), so crawl junk ranks as
    * unknown freshness instead of killing the frontier job.
    *
    * One `coalesce` of literal-format `to_timestamp` branches —
    * codegen'd, row-local; each format is anchored by a full-string
    * regex gate so Spark's lenient parser cannot cross-accept a
    * shorter spelling. */
  def parseW3cDatetime(lastmod: Column): Column = {
    val t = trim(lastmod)
    def gated(re: String, fmt: String, c: Column): Column =
      when(t.rlike(re), to_timestamp(c, fmt))
    coalesce(
      gated("^\\d{4}$", "yyyy", t),
      gated("^\\d{4}-\\d{2}$", "yyyy-MM", t),
      gated("^\\d{4}-\\d{2}-\\d{2}$", "yyyy-MM-dd", t),
      gated("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}(Z|[+-]\\d{2}:\\d{2})$",
        "yyyy-MM-dd'T'HH:mmXXX", t),
      gated("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}" +
          "(Z|[+-]\\d{2}:\\d{2})$",
        "yyyy-MM-dd'T'HH:mm:ssXXX", t),
      // one gated branch per fractional-digit count (the NOTE allows
      // any; 1-3 covers real sitemaps) — literal formats, no
      // replacement-string games
      gated("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}\\.\\d" +
          "(Z|[+-]\\d{2}:\\d{2})$",
        "yyyy-MM-dd'T'HH:mm:ss.SXXX", t),
      gated("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}\\.\\d{2}" +
          "(Z|[+-]\\d{2}:\\d{2})$",
        "yyyy-MM-dd'T'HH:mm:ss.SSXXX", t),
      gated("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}\\.\\d{3}" +
          "(Z|[+-]\\d{2}:\\d{2})$",
        "yyyy-MM-dd'T'HH:mm:ss.SSSXXX", t),
      lit(null).cast("timestamp"))
  }
}
