package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[UrlOps]] contract: the RFC 3986 §5.4 reference-resolution
  * examples (normal AND abnormal), the crawl-policy fragment drop,
  * dot-segment bounds, base-href handling, and null edges. */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def resolve(base: String, refs: Seq[String]): Seq[String] =
    refs.map(r => (base, r)).toDF("b", "r")
      .select(UrlOps.resolveUrl(col("b"), col("r")))
      .collect().map(row =>
        if (row.isNullAt(0)) null else row.getString(0)).toSeq

  private val Base = "http://a/b/c/d;p?q"

  test("RFC 3986 §5.4.1 normal examples (fragment-bearing refs " +
    "resolve to the fragment-less target — crawl policy)") {
    val cases = Seq(
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      // RFC keeps the fragment; the crawl policy strips it
      "#s" -> "http://a/b/c/d;p?q",
      "g#s" -> "http://a/b/c/g",
      "g?y#s" -> "http://a/b/c/g?y",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    val out = resolve(Base, cases.map(_._1))
    cases.zip(out).foreach { case ((ref, want), got) =>
      assert(got == want, s"ref '$ref': got $got want $want")
    }
  }

  test("RFC 3986 §5.4.2 abnormal examples: over-deep ../, literal " +
    "dot-bearing segments, dots in the QUERY untouched") {
    val cases = Seq(
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      // §5.2.4 applies to the path ONLY — query dots survive
      "g?y/./x" -> "http://a/b/c/g?y/./x",
      "g?y/../x" -> "http://a/b/c/g?y/../x")
    val out = resolve(Base, cases.map(_._1))
    cases.zip(out).foreach { case ((ref, want), got) =>
      assert(got == want, s"ref '$ref': got $got want $want")
    }
  }

  test("scheme-bearing refs pass through (path dot-normalized for " +
    "hierarchical ones, non-hierarchical untouched); network-path " +
    "inherits the base scheme; base query survives only empty refs") {
    val cases = Seq(
      "https://other.host/x/../y?k=1" -> "https://other.host/y?k=1",
      "mailto:someone@example.com" -> "mailto:someone@example.com",
      "//cdn.example.com/a/./b" -> "http://cdn.example.com/a/b",
      "//cdn.example.com" -> "http://cdn.example.com")
    val out = resolve(Base, cases.map(_._1))
    cases.zip(out).foreach { case ((ref, want), got) =>
      assert(got == want, s"ref '$ref': got $got want $want")
    }
  }

  test("edges: a root base merges relative refs at '/', a scheme-" +
    "less base yields null for relative refs, nulls propagate, " +
    "whitespace-padded hrefs (crawl HTML) are trimmed") {
    assert(resolve("https://h", Seq("g", "/g", "?y", "")) ==
      Seq("https://h/g", "https://h/g", "https://h?y", "https://h"))
    assert(resolve("not a url", Seq("g")) == Seq(null))
    assert(resolve(Base, Seq(" g ")) == Seq("http://a/b/c/g"))
    val out = Seq((Option(Base), Option.empty[String]))
      .toDF("b", "r")
      .select(UrlOps.resolveUrl(col("b"), col("r")))
      .collect().head
    assert(out.isNullAt(0))
  }

  test("dot-collapse bound: DotPasses levels of right-packed ../ " +
    "normalize fully; deeper chains keep residual dots " +
    "deterministically (documented bound, not silent corruption)") {
    val deep = ("x/" * UrlOps.DotPasses) + ("../" * UrlOps.DotPasses) + "g"
    assert(resolve("http://h/", Seq(deep)) == Seq("http://h/g"))
    // one level past the bound: the residual ../ survives verbatim —
    // same bytes every run, never a wrong collapse
    val over = ("x/" * 40) + ("../" * 40) + "g"
    val got = resolve("http://h/", Seq(over)).head
    assert(got == "http://h/g" || got.contains(".."),
      s"past-bound input must fully collapse or keep residual " +
        s"dots, never mis-collapse: $got")
  }

  test("effectiveBase: <base href> wins when present (resolved " +
    "against the fetch URI when itself relative), fetch URI " +
    "otherwise; composes with resolveUrl for the frontier shape") {
    val rows = Seq(
      // absolute base tag
      ("https://host/dir/p.html", "https://cdn.h/assets/", "img/x"),
      // relative base tag: resolves against the fetch URI first
      ("https://host/dir/p.html", "sub/", "img/x"),
      // no base tag
      ("https://host/dir/p.html", "", "img/x"))
      .toDF("uri", "bh", "href")
    val out = rows.select(UrlOps.resolveUrl(
        UrlOps.effectiveBase(col("uri"), col("bh")), col("href")))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq(
      "https://cdn.h/assets/img/x",
      "https://host/dir/sub/img/x",
      "https://host/dir/img/x"))
  }
}
