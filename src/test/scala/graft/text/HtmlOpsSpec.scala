package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[HtmlOps]] contract: the strip chain (scripts/styles/comments
  * swallowed, block tags → line structure, entities, whitespace), the
  * density-based main-content filter, and the edge inputs (empty,
  * null, markup-free, unclosed script). */
class HtmlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(Tuple1(html)).toDF("h")
      .select(HtmlOps.stripHtml(col("h"))).collect().head.getString(0)

  private def main(html: String, minTok: Int = 5): String =
    Seq(Tuple1(html)).toDF("h")
      .select(HtmlOps.mainText(col("h"), minTok))
      .collect().head.getString(0)

  test("stripHtml: scripts/styles/comments swallowed WITH content; " +
    "block tags become newlines; inline tags become spaces") {
    val html = "<html><head><title>T</title>" +
      "<style>p { color: red }</style>" +
      "<script type='x'>var a = '<p>not text</p>';</script></head>" +
      "<body><!-- hidden --><p>First <b>bold</b> para.</p>" +
      "<div>Second block</div>tail</body></html>"
    assert(strip(html) == "T\nFirst bold para.\nSecond block\ntail")
  }

  test("stripHtml: entity decode with &amp; last (no double decode); " +
    "&nbsp; collapses with surrounding whitespace") {
    assert(strip("a &lt;tag&gt; &quot;q&quot; &#39;s&#39; b&nbsp;&nbsp;c") ==
      "a <tag> \"q\" 's' b c")
    // &amp;lt; is the LITERAL text "&lt;", not "<"
    assert(strip("x &amp;lt; y") == "x &lt; y")
  }

  test("stripHtml: whitespace normalization — space runs to one, " +
    "padded newline runs to one newline, ends trimmed") {
    assert(strip("  <p>a   b</p>\n\n  <p>  c  </p>  ") == "a b\nc")
  }

  test("stripHtml edge inputs: empty and markup-free pass through; " +
    "an unclosed script falls back to tag-level stripping") {
    assert(strip("") == "")
    assert(strip("no markup here.") == "no markup here.")
    // no closing </script>: the pair rule can't swallow; the generic
    // tag strip still removes the tags themselves (deterministic,
    // oracle-replayable degradation)
    assert(strip("<script>var x = 1;</script2") == "var x = 1;")
  }

  test("mainText: short unpunctuated blocks (nav/footer boilerplate) " +
    "drop; long or sentence-terminated blocks survive") {
    val html = "<ul><li>Home</li><li>About Us</li><li>Contact</li></ul>" +
      "<p>This paragraph carries enough tokens to be kept as body.</p>" +
      "<p>Short but ends.</p>" +
      "<div>© 2026 SomeCorp</div>"
    assert(main(html) ==
      "This paragraph carries enough tokens to be kept as body.\n" +
        "Short but ends.")
  }

  test("extractLinks: hrefs in document order, both quote styles, " +
    "case-insensitive tags, attributes before href; fragment and " +
    "relative values returned raw; anchors without href skipped") {
    val html = "<a class=\"n\" href=\"https://a.example.com/l1\">1</a>" +
      "<A HREF='https://gamma.org/l2'>2</A>" +
      "<a name=\"x\">no href</a>" +
      "<a href=\"#top\">frag</a><a href='/rel'>rel</a>"
    val out = Seq(Tuple1(html)).toDF("h")
      .select(HtmlOps.extractLinks(col("h")))
      .collect().head.getSeq[String](0)
    assert(out == Seq("https://a.example.com/l1",
      "https://gamma.org/l2", "#top", "/rel"))
  }

  test("stripHtml hardening (r19 verdict #6): CDATA swallows whole; " +
    "nested and unclosed block tags still yield line structure; " +
    "numeric entities on the pinned list decode, others survive") {
    // CDATA = markup island, dropped like script/style
    assert(strip("a <![CDATA[ raw <b>bytes</b> & junk ]]> b") == "a b")
    // nested + UNCLOSED tags (truncated real page): every block tag
    // still becomes a newline, the dangling open tag is dropped
    assert(strip("<div><p>first<div>second") == "first\nsecond")
    assert(strip("<p>cut off mid <b class=\"hi") == "cut off mid")
    // pinned numeric/typographic entities: decimal, lowercase hex,
    // and named spellings of the curly apostrophe and friends
    assert(strip("it&#x2019;s &#8220;fine&#8221; &ndash; ok&hellip;") ==
      "it’s “fine” – ok…")
    assert(strip("A&#160;B&#xa0;C &#34;q&#x22;") == "A B C \"q\"")
    // NOT on the list: uppercase hex and arbitrary numerics survive
    // verbatim (documented contract, not silent corruption)
    assert(strip("x &#X2019; y &#12345; z") == "x &#X2019; y &#12345; z")
    // the double-decode guard still holds through the longer list
    assert(strip("x &amp;#8217; y &amp;lt; z") == "x &#8217; y &lt; z")
  }

  test("baseHref: first <base href> wins, '' when absent; feeds " +
    "effectiveBase for relative-link resolution") {
    val page = "<html><head><base target=\"_x\" href='/sub/dir/'>" +
      "<base href='/LOSER/'></head><body><a href='p'>x</a></body></html>"
    val out = Seq(Tuple1(page), Tuple1("<p>no base</p>")).toDF("h")
      .select(HtmlOps.baseHref(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("/sub/dir/", ""))
  }

  test("canonicalHref: both attribute orders, other link rels " +
    "ignored, '' when absent — the canonical-dedup key source") {
    val cases = Seq(
      "<head><link rel=\"canonical\" href=\"https://e.com/c\"></head>" ->
        "https://e.com/c",
      "<head><link href='/rel/c' rel='canonical'></head>" -> "/rel/c",
      "<head><link rel=\"stylesheet\" href=\"/s.css\">" +
        "<link rel=\"canonical\" href=\"/c2\"></head>" -> "/c2",
      "<head><link rel=\"stylesheet\" href=\"/s.css\"></head>" -> "",
      "<p>no links at all</p>" -> "")
    val out = cases.map(c => Tuple1(c._1)).toDF("h")
      .select(HtmlOps.canonicalHref(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(out == cases.map(_._2))
  }

  test("mainText: a markup-free input is one block under the same " +
    "density rule; null propagates") {
    assert(main("tiny") == "")
    assert(main("tiny but punctuated.") == "tiny but punctuated.")
    val out = Seq(Tuple1(null: String)).toDF("h")
      .select(HtmlOps.mainText(col("h"))).collect().head
    assert(out.isNullAt(0))
  }
}
