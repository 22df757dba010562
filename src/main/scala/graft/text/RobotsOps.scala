package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt (RFC 9309, the Robots Exclusion Protocol) parsing and
  * URL filtering — crawl politeness as a batch op: given the fetched
  * robots.txt per host and the candidate URL frontier, which URLs may
  * be crawled? The missing gate between [[HtmlOps.extractLinks]]'s
  * edge discovery and the fetch queue.
  *
  * Rule semantics implemented (the RFC's normative core):
  *   - groups open with one or more `User-agent:` lines and hold
  *     `Allow:`/`Disallow:` path rules; matching is per-agent with
  *     `*` as the fallback group ([[parseRobots]] selects the group
  *     serving a given agent — exact agent match preferred over `*`);
  *   - a URL matches a rule when its PATH starts with the rule path,
  *     with `*` matching any char run and `$` anchoring the end;
  *   - the MOST SPECIFIC match wins: longest rule path (octets, per
  *     RFC §2.2.2) — ties broken toward Allow (RFC: "least
  *     restrictive");
  *   - no matching rule, no group, or an empty `Disallow:` ⇒ allowed.
  *
  * Split of labor (the [[DomainOps]] pattern): [[parseRobots]] is a
  * DRIVER-SIDE parser for the file format — robots.txt files are a
  * per-host dim, thousands of rows, never corpus-sized — producing
  * the rules dim [[robotsDim]] broadcasts; [[robotsFilter]] is the
  * corpus-sized operator: candidate (host, path-rule) matches via one
  * BROADCAST join, the prevailing rule a plain long-encoded max()
  * HashAggregate (the registrableDomains packed-priority discipline —
  * `len*2 + isAllow` IS the RFC order), everything row-local around
  * it — one shuffle total at any corpus size.
  *
  * Wildcard rules are translated to anchored regexes ONCE,
  * driver-side ([[pathRegex]]), and shipped as a COLUMN of the rules
  * dim — the engine and the DuckDB oracle match against the same
  * stored pattern, so regex-translation can never diverge between
  * them.
  */
object RobotsOps {

  /** One path rule: allow/disallow + the raw rule path. */
  case class RobotsRule(agent: String, allow: Boolean, path: String)

  /** Parse one robots.txt body (driver-side, file-format dim work):
    * comments (`#` to end of line) stripped, `field: value` lines,
    * fields case-insensitive, adjacent `User-agent` lines share the
    * following rule block (RFC §2.2.1), unknown fields ignored, an
    * empty Disallow value dropped (it means "allow everything" —
    * matching nothing achieves exactly that). Agents lowercased. */
  def parseRobots(body: String): Seq[RobotsRule] = {
    val lines = body.split("\n").toSeq
      .map(l => l.takeWhile(_ != '#').trim)
      .filter(_.nonEmpty)
    val out = Seq.newBuilder[RobotsRule]
    var agents: Seq[String] = Nil
    var inRules = false
    lines.foreach { l =>
      val i = l.indexOf(':')
      if (i > 0) {
        val field = l.substring(0, i).trim.toLowerCase
        val value = l.substring(i + 1).trim
        field match {
          case "user-agent" =>
            // a user-agent line AFTER rules starts a NEW group;
            // adjacent user-agent lines accumulate into one group
            if (inRules) { agents = Nil; inRules = false }
            agents = agents :+ value.toLowerCase
          case "allow" | "disallow" =>
            inRules = true
            if (value.nonEmpty)
              agents.foreach(a =>
                out += RobotsRule(a, field == "allow", value))
          case _ => () // crawl-delay, sitemap, unknown: ignored here
        }
      }
    }
    out.result()
  }

  /** The `Sitemap:` lines of a robots.txt body — the discovery hook
    * the sitemaps.org protocol specifies (group-independent per the
    * RFC: a sitemap line applies regardless of user-agent, so this
    * is a separate accessor, not a rule kind). Order preserved,
    * comments stripped like [[parseRobots]]. */
  def sitemapsOf(body: String): Seq[String] =
    body.split("\n").toSeq
      .map(l => l.takeWhile(_ != '#').trim)
      .filter(_.nonEmpty)
      .flatMap { l =>
        val i = l.indexOf(':')
        if (i > 0 && l.substring(0, i).trim.toLowerCase == "sitemap")
          Some(l.substring(i + 1).trim).filter(_.nonEmpty)
        else None
      }

  /** The rules serving `agent`: its exact group when one exists,
    * else the `*` group (RFC: the most specific group applies and
    * the rest are ignored — groups do not merge). */
  def rulesFor(rules: Seq[RobotsRule], agent: String): Seq[RobotsRule] = {
    val a = agent.toLowerCase
    val exact = rules.filter(_.agent == a)
    if (exact.nonEmpty) exact else rules.filter(_.agent == "*")
  }

  /** A rule path as an anchored match regex: literal chars quoted,
    * `*` → `.*`, a TRAILING `$` → end anchor; always start-anchored
    * (rule paths match from the path's first octet). */
  def pathRegex(rulePath: String): String = {
    val endAnchor = rulePath.endsWith("$")
    val body = if (endAnchor) rulePath.dropRight(1) else rulePath
    val quoted = body.split("\\*", -1)
      .map(seg => if (seg.isEmpty) "" else java.util.regex.Pattern.quote(seg))
      .mkString(".*")
    "^" + quoted + (if (endAnchor) "$" else "")
  }

  /** The rules-dim rows for ONE crawler agent across many hosts:
    * (host, allow, rule_path, path_len, path_re) — `path_len` is the
    * RAW rule string's octet count (wildcards and the `$` anchor
    * included; the RFC's "number of octets of the path" made
    * deterministic). `path_re` is the driver-side regex translation
    * and is NULL for plain rules (no `*`, no trailing `$`): those
    * match by literal startsWith — codegen'd, no per-row
    * Pattern.compile — and only genuine wildcard rules pay the
    * non-foldable-regex cost. Exposed separately from [[robotsDim]]
    * so the oracle renders the SAME rows (same null split) as SQL
    * VALUES. */
  def dimRows(perHost: Seq[(String, String)], agent: String)
      : Seq[(String, Boolean, String, Long, String)] =
    perHost.flatMap { case (host, body) =>
      rulesFor(parseRobots(body), agent).map { r =>
        require(r.path.length < (1L << 20),
          s"rule path of ${r.path.length} octets on $host: the " +
            "packed match priority gives path_len 20 bits")
        val wild = r.path.contains("*") || r.path.endsWith("$")
        (host, r.allow, r.path, r.path.length.toLong,
          if (wild) pathRegex(r.path) else null)
      }
    }

  /** The broadcastable rules dim for ONE crawler agent across many
    * hosts: (host, allow, rule_path, path_len, path_re). `perHost`
    * maps host → that host's robots.txt body. */
  def robotsDim(spark: SparkSession, perHost: Seq[(String, String)],
                agent: String): DataFrame = {
    import spark.implicits._
    dimRows(perHost, agent)
      .toDF("host", "allow", "rule_path", "path_len", "path_re")
  }

  /** The rules dim rendered as SQL VALUES rows
    * `('host', allow, 'path', len, 'regex'|NULL)` — shared by the
    * DuckDB oracle so engine and oracle read the SAME translated
    * patterns and the same plain-vs-wildcard split. */
  def rulesValuesSql(dim: Seq[(String, Boolean, String, Long, String)])
      : String =
    dim.map { case (h, a, p, l, re) =>
      def q(s: String) = s.replace("'", "''")
      val reSql = Option(re).map(r => s"'${q(r)}'").getOrElse("NULL")
      s"('${q(h)}', $a, '${q(p)}', $l, $reSql)"
    }.mkString(", ")

  /** Filter a URL frontier against the rules dim: one row per input
    * (idCol, url) with (host, path, allowed, rule_path_len). The
    * URL's host joins the BROADCAST dim (rules are per-host dim
    * data); the prevailing rule is max() over the packed priority
    * `path_len * 2 + isAllow` — exactly the RFC longest-match /
    * tie-to-Allow order; hosts with no matching rule (or no rules at
    * all) are allowed. Plain rules match by codegen'd startsWith;
    * only wildcard rules pay the non-foldable-regex cost (dimRows'
    * null split). One hash agg back to input cardinality; no
    * corpus-sized window, no UDF.
    *
    * Matching is against the URL AS FETCHED (r19 review fix): only
    * the scheme/authority are lowercased (case-insensitive per the
    * URI spec) for host extraction; the PATH-AND-QUERY keeps its
    * exact bytes and case, because RFC 9309 matching is
    * case-sensitive and includes the query — canonicalization
    * (trailing-slash strip, tracking-param drop, query sort) belongs
    * to DEDUP KEYS and would silently green-light disallowed fetches
    * here (`/private/` canonicalized to `/private` escapes a
    * directory Disallow). Fragments are not sent to servers and are
    * excluded; a URL with no path matches as `/`. */
  def robotsFilter(urls: DataFrame, idCol: String, urlCol: Column,
                   dim: DataFrame): DataFrame = {
    val rawPath = regexp_extract(col("url"),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val in = urls.select(col(idCol), urlCol.as("url"))
      .withColumn("host", DomainOps.hostOf(
        lower(regexp_extract(col("url"),
          "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0))))
      .withColumn("path",
        when(rawPath === "", "/").otherwise(rawPath))
    val ruleMatch = when(dim("path_re").isNull,
        col("path").startsWith(dim("rule_path")))
      .otherwise(regexp_like(col("path"), dim("path_re")))
    val matched = in.join(broadcast(dim),
        in("host") === dim("host") && ruleMatch, "left")
      .groupBy(in(idCol), in("url"), in("host"), col("path"))
      .agg(max(when(col("path_len").isNull, lit(-1L))
        .otherwise(col("path_len") * 2 +
          when(col("allow"), 1L).otherwise(0L))).as("__code"))
    matched.select(col(idCol), col("url"), col("host"), col("path"),
      (col("__code") === -1L || col("__code") % 2 === 1L)
        .as("allowed"),
      when(col("__code") >= 0, (col("__code") / 2).cast("long"))
        .as("rule_path_len"))
  }
}
