package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** RFC 3986 §5 relative-reference resolution as a pure Catalyst
  * column expression — the missing step between
  * [[HtmlOps.extractLinks]] (which returns RAW href attribute
  * values) and everything downstream that needs an absolute URL
  * (link graph, URL frontier, robots filtering, canonical dedup
  * keys): most real page links are relative, so a crawl graph built
  * from absolute hrefs alone silently drops the majority of edges
  * (r19 verdict gap #2).
  *
  * Semantics are the RFC 3986 §5.2.2 transform with ONE deliberate,
  * crawl-scoped divergence: FRAGMENTS ARE DROPPED from both base and
  * reference before resolution (`#s` resolves to the base itself,
  * `g#s` to `g`'s resolution) — fragments are never sent to servers
  * and a frontier keyed on them would refetch every page once per
  * anchor. Everything else follows the spec:
  *
  *   - a reference WITH a scheme is returned as-is (its own path
  *     dot-normalized) — including non-hierarchical ones (`mailto:`)
  *     which pass through untouched for the caller's scheme filter;
  *   - `//h/p` (network-path) inherits the base scheme;
  *   - `/p` (absolute-path) inherits scheme + authority;
  *   - `?q` (query-only) replaces the base query, keeps its path;
  *   - anything else merges onto the base path (§5.2.3): base path
  *     up to its last `/`, or `/` itself when the base has an
  *     authority and an empty path;
  *   - dot segments are removed from the PATH ONLY (§5.2.4) — a
  *     query like `?y/./x` keeps its dots (the §5.4.2 cases).
  *
  * Dot-segment removal (`remove_dot_segments`) is a bounded fold of
  * `maxDepth` regex passes, each collapsing every non-overlapping
  * `/./`, `/seg/../`, and boundary variant at once; one pass removes
  * at least one level of the worst-case right-packed `a/b/../../`
  * chain, so paths up to `maxDepth` levels of `..` normalize fully
  * and anything deeper (crawl junk, not real site structure) keeps
  * its residual dots DETERMINISTICALLY — same bytes every run, both
  * engines. All patterns sit in the java.util.regex ∩ RE2 subset
  * (no lookaround, no backreferences) per the house oracle-replay
  * contract.
  *
  * Scale shape: row-local, zero shuffles, whole-stage-codegen'd
  * (regex + conditionals only — no higher-order lambdas, so unlike
  * canonicalizeUrl this tree does NOT fall back to interpretation
  * and may appear in predicates safely).
  */
object UrlOps {

  /** How many dot-collapse passes [[removeDotSegments]] folds: each
    * pass removes ≥ 1 `..` level even in the adversarial
    * right-packed shape (and ALL of them in the common left-packed
    * one), real URL trees sit at 1-3 levels, and every RFC 3986
    * §5.4 example needs ≤ 4 — six buys slack without bloating the
    * expression tree past whole-stage codegen's method budget
    * (resolveUrl instantiates this fold four times; at 12 passes
    * the per-link projection of a link-graph query fell back to
    * interpreted evaluation, ~3x wall). */
  val DotPasses: Int = 6

  /** Scheme + the trailing colon, UNANCHORED (interpolated mid-pattern). */
  private val Sch = "[A-Za-z][A-Za-z0-9+.-]*:"

  /** A path segment that is NOT `.` and NOT `..` (so `/seg/../` can
    * collapse without eating `/../../`): first char not a dot, or a
    * dot-led segment with a non-dot second char, or `..` followed by
    * at least one more char (`...` is a legal literal segment). */
  private val Seg = "(?:[^./][^/]*|\\.[^./][^/]*|\\.\\.[^/]+)"

  /** §5.2.4 remove_dot_segments over a `/`-rooted path column, as a
    * bounded fold (object doc). Applied to the PATH only — callers
    * split the query off first. */
  def removeDotSegments(path: Column): Column =
    (1 to DotPasses).foldLeft(path) { (p, _) =>
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(p, "/\\./", "/"),
              "/\\.$", "/"),
            s"/$Seg/\\.\\./", "/"),
          s"/$Seg/\\.\\.$$", "/"),
        "^/\\.\\.(?:/|$)", "/")
    }

  /** Resolve `ref` against `base` (object doc). `base` must be an
    * absolute hierarchical URL (`scheme://auth...`) for the relative
    * branches to produce one; a scheme-less base resolves relative
    * refs to null — callers seed the frontier with fetched page URIs,
    * which are absolute by construction. Null base/ref → null. */
  def resolveUrl(base: Column, ref: Column): Column = {
    // crawl policy: fragments off BOTH sides before anything else
    val b = regexp_replace(base, "#.*$", "")
    val r = regexp_replace(trim(ref), "#.*$", "")
    val bScheme = regexp_extract(b, s"^($Sch)", 1) // with ':'
    val bAuth = regexp_extract(b, s"^$Sch//([^/?#]*)", 1)
    val bHasAuth = b.rlike(s"^$Sch//")
    val bPath = regexp_extract(b, s"^$Sch//[^/?#]*([^?#]*)", 1)
    val bQuery = regexp_extract(b, "(\\?[^#]*)", 1) // '' when absent
    // ref path/query split: dots are collapsed in the path ONLY
    val rPath = regexp_extract(r, "^([^?#]*)", 1)
    val rQuery = regexp_extract(r, "(\\?[^#]*)", 1)
    // §5.2.3 merge: base path up to its LAST '/', or '/' when the
    // base has an authority and an empty path
    val bDir = when(bPath === "" , lit("/"))
      .otherwise(regexp_replace(bPath, "/[^/]*$", "/"))
    val prefix = concat(bScheme, lit("//"), bAuth)
    when(b.isNull || r.isNull, lit(null).cast("string"))
      // ref has its own scheme: take it whole; normalize a
      // hierarchical path, pass a non-hierarchical ref through
      .when(r.rlike(s"^$Sch//"),
        concat(regexp_extract(r, s"^($Sch//[^/?#]*)", 1),
          removeDotSegments(
            regexp_extract(r, s"^$Sch//[^/?#]*([^?#]*)", 1)),
          regexp_extract(r, "(\\?[^#]*)", 1)))
      .when(r.rlike(s"^$Sch"), r)
      // scheme-less branches need an absolute base
      .when(!bHasAuth, lit(null).cast("string"))
      // network-path //h/p: inherit the scheme only
      .when(r.startsWith("//"),
        concat(bScheme,
          regexp_extract(r, "^(//[^/?#]*)", 1),
          removeDotSegments(
            regexp_extract(r, "^//[^/?#]*([^?#]*)", 1)),
          regexp_extract(r, "(\\?[^#]*)", 1)))
      // empty ref (or fragment-only): the base, query kept
      .when(r === "", concat(prefix, bPath, bQuery))
      // query-only ?q: base path, replaced query
      .when(r.startsWith("?"), concat(prefix, bPath, r))
      // absolute path /p
      .when(r.startsWith("/"),
        concat(prefix, removeDotSegments(rPath), rQuery))
      // relative path: merge onto the base directory
      .otherwise(concat(prefix,
        removeDotSegments(concat(bDir, rPath)), rQuery))
  }

  /** The effective resolution base of a fetched page: its `<base
    * href>` when the document declares one ([[HtmlOps.baseHref]]),
    * resolved against the fetch URI (a base tag may itself be
    * relative, RFC 3986 §5.1.1), else the fetch URI itself. */
  def effectiveBase(fetchUri: Column, baseHref: Column): Column =
    when(baseHref.isNull || baseHref === "", fetchUri)
      .otherwise(resolveUrl(fetchUri, baseHref))

  /** SURT (Sort-friendly URI Reordering Transform) index key of an
    * absolute http(s) URL — the key CDX crawl indexes sort and
    * prefix-scan on: `com,example)/path?query`. Reversing the host
    * labels puts every page of a registrable domain (and every
    * subdomain under it) in ONE contiguous key range, so "all of
    * example.com" is a range scan over a sorted index instead of a
    * full-index host filter — the property the whole Common Crawl
    * index layout builds on.
    *
    * Canonicalization is the pywb/webarchive-commons core, stated
    * explicitly: lowercase everything; drop the scheme and any
    * `user:pass@`; drop a leading `www.` label; drop default ports
    * `:80`/`:443` (any other port survives AFTER the reversed host,
    * `com,example:8080)/`); drop the fragment and a bare trailing
    * `?`; an empty path becomes `/`. Row-local, regex + string ops
    * only (java.regex ∩ RE2, codegen'd) — safe in predicates. */
  def surtKey(url: Column): Column = {
    val u = lower(url)
    // strip scheme, userinfo, fragment (in that order — an `@` or
    // `#` later in the path/query must not be eaten)
    val noScheme = regexp_replace(u, s"^$Sch//", "")
    val noUser = regexp_replace(noScheme, "^[^/?#@]*@", "")
    val noFrag = regexp_replace(noUser, "#.*$", "")
    val hostPort = regexp_extract(noFrag, "^([^/?]*)", 1)
    val rest = regexp_replace(noFrag, "^[^/?]*", "")
    val noDefPort = regexp_replace(hostPort, ":(80|443)$", "")
    val noWww = regexp_replace(noDefPort, "^www\\.", "")
    val host = regexp_replace(noWww, ":[0-9]+$", "")
    val port = regexp_extract(noWww, "(:[0-9]+)$", 1)
    val rev = array_join(reverse(split(host, "\\.")), ",")
    val pathq = regexp_replace(
      when(rest === "", lit("/"))
        .when(rest.startsWith("?"), concat(lit("/"), rest))
        .otherwise(rest),
      "\\?$", "")
    concat(rev, port, lit(")"), pathq)
  }
}
