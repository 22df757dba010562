package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the step between WARC ingestion
  * ([[graft.sources.WarcSource]]) and the curation board's clean
  * `documents.text`: CCNet/RefinedWeb-class training-data pipelines
  * start at crawled HTML, and everything in [[TextOps]] (quality,
  * langid, dedup keys) assumes markup is already gone.
  *
  * Two levels:
  *   - [[stripHtml]]: comment/script/style/noscript removal, block-
  *     level tags → newline (so document structure survives as line
  *     structure), all remaining tags → space, the six standard
  *     entities decoded, whitespace normalized (runs of spaces → one;
  *     blank-padded newline runs → one newline; ends trimmed).
  *   - [[mainText]]: boilerplate removal by block text-density — a
  *     block (one stripped line) survives when it carries at least
  *     `minBlockTokens` whitespace tokens OR ends in sentence
  *     punctuation (`.`/`!`/`?`). Nav menus, button labels and footer
  *     link-farms are short and unpunctuated; body prose is long or
  *     sentence-terminated. This is the jusText/boilerpipe family's
  *     core density signal reduced to its deterministic, engine-
  *     replayable form.
  *
  * Everything is a pure Catalyst expression chain — regexp_replace /
  * replace / higher-order filter — zero UDFs, zero shuffles, fully
  * replayable in the DuckDB oracle. The regexes stay inside the
  * java.util.regex ∩ RE2 common subset (DuckDB is RE2: NO
  * backreferences — the script/style/noscript closers are spelled
  * per-tag — and only `(?is)` inline flags, `\b`, lazy `.*?`).
  *
  * Interpreted-tree caveat (the canonicalizeUrl discipline):
  * [[mainText]] contains a higher-order lambda, so the full tree runs
  * interpreted and must evaluate ONCE per row — keep it a grouping
  * key / pre-exchange projection, never re-derivable above an
  * exchange as a pushable predicate.
  */
object HtmlOps {

  /** Block-level elements whose open/close tags become newlines —
    * one alternation shared with the SQL recipe and oracle. */
  val BlockTags: String =
    "p|div|br|hr|h1|h2|h3|h4|h5|h6|li|ul|ol|dl|dt|dd|table|thead" +
      "|tbody|tr|td|th|blockquote|pre|section|article|aside|header" +
      "|footer|nav|form|figure|figcaption|title|head|body|html"

  /** The ordered (regex → replacement) strip chain of [[stripHtml]]
    * BEFORE entity decode — exposed so the oracle/recipe replays the
    * identical passes in the identical order. Order matters: comments
    * go first (a commented-out `<script>` must not eat to the next
    * real closer), the content-swallowing pairs next, block tags
    * before the generic tag strip (or there would be nothing left to
    * turn into newlines). */
  val TagChain: Seq[(String, String)] = Seq(
    "(?is)<!--.*?-->" -> " ",
    // CDATA sections swallow WHOLE (r19 verdict #6): in the HTML
    // namespace `<![CDATA[...]]>` is a bogus comment, and the rare
    // legitimate ones (inline SVG/MathML islands) carry markup-side
    // data, not body prose — the conservative, deterministic stance
    // is the script/style treatment. Ordered after comments (a
    // commented-out CDATA is already gone) and before the generic
    // tag strip (which would otherwise eat only to the first '>')
    "(?is)<!\\[CDATA\\[.*?\\]\\]>" -> " ",
    "(?is)<script\\b[^>]*>.*?</script>" -> " ",
    "(?is)<style\\b[^>]*>.*?</style>" -> " ",
    "(?is)<noscript\\b[^>]*>.*?</noscript>" -> " ",
    s"(?is)</?(?:$BlockTags)\\b[^>]*>" -> "\n",
    "(?is)<[^>]*>" -> " ",
    // an unterminated tag at end-of-input (truncated page) is markup,
    // not text — real parsers drop it too
    "<[^>]*$" -> " ")

  /** The named/numeric entities decoded, in decode order — `&amp;`
    * LAST, the classic double-decode guard: `&amp;lt;` is the four
    * LITERAL characters `&lt;` and must not become `<` (and every
    * numeric spelling here is safe before it: `&amp;#39;` contains
    * no contiguous `&#39;`, so the specialty passes can't touch it).
    *
    * The entity CONTRACT (pinned, r19 verdict #6): this exact list,
    * nothing else. Covered: the five XML names, `&nbsp;`, the
    * typographic punctuation real pages carry (curly quotes, en/em
    * dash, ellipsis — named, decimal and lowercase-hex spellings),
    * and the decimal/hex quote/apostrophe/nbsp variants. NOT
    * covered, deliberately: arbitrary numeric entities (sequential
    * replace cannot chr() a captured number), UPPERCASE hex digits
    * (`&#X2019;`/`&#x201C;` — replace() is case-sensitive; the
    * lowercase spelling dominates real markup), and any
    * `&`-PRODUCING numeric spelling (`&#38;`/`&#x26;`): decoding
    * those in ANY sequential order opens a double-decode hole
    * against `&amp;` — `&amp;` stays the single amp spelling. An
    * uncovered entity survives verbatim — visible, deterministic,
    * same bytes on both engines. */
  val Entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&#160;" -> " ", "&#xa0;" -> " ",
    "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#34;" -> "\"", "&#x22;" -> "\"",
    "&#39;" -> "'", "&#x27;" -> "'", "&apos;" -> "'",
    "&lsquo;" -> "‘", "&#8216;" -> "‘",
    "&#x2018;" -> "‘",
    "&rsquo;" -> "’", "&#8217;" -> "’",
    "&#x2019;" -> "’",
    "&ldquo;" -> "“", "&#8220;" -> "“",
    "&#x201c;" -> "“",
    "&rdquo;" -> "”", "&#8221;" -> "”",
    "&#x201d;" -> "”",
    "&ndash;" -> "–", "&#8211;" -> "–",
    "&#x2013;" -> "–",
    "&mdash;" -> "—", "&#8212;" -> "—",
    "&#x2014;" -> "—",
    "&hellip;" -> "…", "&#8230;" -> "…",
    "&#x2026;" -> "…",
    "&amp;" -> "&")

  /** Markup → newline-blocked plain text (see object doc). The
    * whitespace passes run AFTER entity decode so `&nbsp;` runs
    * collapse like any other spaces. */
  def stripHtml(html: Column): Column = {
    val tagless = TagChain.foldLeft(html) { case (c, (re, sub)) =>
      regexp_replace(c, re, sub)
    }
    val decoded = Entities.foldLeft(tagless) { case (c, (e, ch)) =>
      call_function("replace", c, lit(e), lit(ch))
    }
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(decoded, "[ \\t\\r\\f]+", " "),
        " ?\\n[ \\n]*", "\n"),
      "^\\n+|\\n+$", ""))
  }

  /** The anchor-href regex — one alternation-free pattern in the
    * java.regex ∩ RE2 subset, shared with the oracle replay: an `<a`
    * tag's FIRST quoted href value (single or double quotes; the
    * lazy `[^>]*?` stops at the first href so a preceding attribute
    * can't swallow it). Matching quote pairing is approximated (a
    * mismatched `href="x'` pair extracts deterministically the same
    * on both engines — crawl junk, not a correctness surface). */
  val HrefRegex: String =
    "(?is)<a\\b[^>]*?href\\s*=\\s*[\"']([^\"']*)[\"']"

  /** All anchor hrefs of a page, in document order — the crawl-graph
    * edge source (URL frontier, link-based centrality). Returns the
    * RAW attribute values; callers filter to absolute links
    * (`rlike "^https?://"`) and resolve/canonicalize downstream —
    * relative-URL resolution needs the page's base URL and belongs
    * to the caller, who has it. Pure `regexp_extract_all`: row-local,
    * codegen'd, zero shuffles. */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit(HrefRegex), lit(1))

  /** The page's `<base href>` value — the FIRST one, as browsers
    * take it — or '' when the page declares none. Feeds
    * [[UrlOps.effectiveBase]]: a declared base overrides the fetch
    * URI as the resolution base for every relative href on the page
    * (RFC 3986 §5.1.1). Same quoting tolerance as [[HrefRegex]];
    * row-local, codegen'd. */
  def baseHref(html: Column): Column =
    regexp_extract(html,
      "(?is)<base\\b[^>]*?href\\s*=\\s*[\"']([^\"']*)[\"']", 1)

  /** The page's declared canonical URL (`<link rel="canonical"
    * href=...>`) — the dedup signal mirror/parameter/session-id
    * duplicates of the SAME content all point at: keying a crawl
    * dedup on the canonical (resolved against the page URL — it may
    * be relative) collapses them without any content comparison.
    * Both attribute orders occur in the wild; first match wins,
    * empty string when the page declares none (callers fall back to
    * the page's own URL). Same java.regex ∩ RE2 subset as the rest
    * of this object. */
  def canonicalHref(html: Column): Column = {
    val relFirst = regexp_extract(html,
      "(?is)<link\\b[^>]*?rel\\s*=\\s*[\"']canonical[\"']" +
        "[^>]*?href\\s*=\\s*[\"']([^\"']*)[\"']", 1)
    val hrefFirst = regexp_extract(html,
      "(?is)<link\\b[^>]*?href\\s*=\\s*[\"']([^\"']*)[\"']" +
        "[^>]*?rel\\s*=\\s*[\"']canonical[\"']", 1)
    when(relFirst =!= "", relFirst).otherwise(hrefFirst)
  }

  /** The density filter alone, over an ALREADY-stripped column —
    * split out so a query that outputs both the stripped text and the
    * main text can keep the strip chain in its own projection and
    * evaluate it ONCE per row (selecting `mainText(html)` beside
    * `stripHtml(html)` would evaluate the whole chain twice). */
  def mainTextFromStripped(stripped: Column,
                           minBlockTokens: Int = 5): Column =
    array_join(filter(split(stripped, "\n"), b =>
      (size(split(b, " ")) >= minBlockTokens) || b.rlike("[.!?]$")),
      "\n")

  /** Main-content extraction: [[stripHtml]] then the block density
    * filter (object doc). Degenerate/markup-free inputs pass through
    * the same rule — a bare prose string is one block and survives
    * iff it meets the density test. */
  def mainText(html: Column, minBlockTokens: Int = 5): Column =
    mainTextFromStripped(stripHtml(html), minBlockTokens)
}
