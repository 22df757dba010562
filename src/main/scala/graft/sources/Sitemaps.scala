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
}
