package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registrable-domain extraction — the crawl-curation key one level
  * above [[TextOps.canonicalizeUrl]]'s page key: per-domain quotas
  * ([[TextOps.capPerGroup]]), domain mixing ([[TextOps.mixCorpus]])
  * and URL blocklists in the CCNet/RefinedWeb lineage all group by
  * the REGISTRABLE domain (eTLD+1), because `a.blogspot.com` and
  * `b.blogspot.com` are different publishers while `news.bbc.co.uk`
  * and `www.bbc.co.uk` are one.
  *
  * Implements the publicsuffix.org list algorithm (the public spec)
  * against a rules dim table:
  *   - a NORMAL rule matches the host suffix equal to it;
  *   - a WILDCARD rule `*.X` matches any suffix `l.X`;
  *   - an EXCEPTION rule `!Y` matches the host suffix `Y`, wins
  *     outright, and its public suffix is `Y` minus its leftmost
  *     label;
  *   - otherwise the matching rule with the MOST labels prevails;
  *   - no rule matching falls back to the implicit default rule `*`
  *     (the host's last label is the public suffix).
  * The registrable domain is the public suffix plus one more host
  * label — null when the host IS a public suffix (nothing was
  * registered) and for IP-literal hosts (not domains).
  *
  * Scale shape: candidate generation is row-local (a host of L
  * labels emits ≤ 3·L+1 candidate keys — normal/exception/wildcard
  * per suffix plus one default — via two narrow explodes), the rules
  * table is a BROADCAST dim (the real list is ~15k rows; the
  * xlsx-vocab small-dim pattern), and the prevailing match is ONE
  * hash agg (max_by over an (is_exception, rule_labels) priority)
  * back to input cardinality. The default-rule candidate means every
  * host matches something, so no join-back pass exists — one
  * shuffle total, no window over the corpus.
  *
  * [[suffixRulesSnapshot]] is a CHECKED-IN SUBSET of the public
  * suffix list (publicsuffix.org/list/) — enough to exercise every
  * rule kind; production swaps in the full list via the `rules`
  * parameter (same one-line-per-rule PSL format).
  */
object DomainOps {

  /** Snapshot subset of the public suffix list in PSL line format
    * (publicsuffix.org/list/ — rule kinds: normal, `*.` wildcard,
    * `!` exception; includes two private-section entries, github.io
    * and blogspot.com, the multi-tenant hosts quota policies care
    * about most). */
  val suffixRulesSnapshot: Seq[String] = Seq(
    "com", "net", "org", "edu", "gov", "mil", "int", "info", "biz",
    "io", "co", "ai", "dev", "app", "xyz",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "jp", "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "au", "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "br", "com.br", "net.br", "org.br", "gov.br",
    "cn", "com.cn", "net.cn", "org.cn", "gov.cn",
    "in", "co.in", "net.in", "org.in",
    "nz", "co.nz", "net.nz", "org.nz", "govt.nz",
    "za", "co.za", "org.za", "web.za",
    "kr", "co.kr", "or.kr",
    "mx", "com.mx", "org.mx",
    "de", "fr", "it", "nl", "es", "se", "no", "fi", "dk", "pl", "ru",
    "ch", "at", "be", "ie", "pt", "gr", "cz", "hu", "ro",
    "ck", "*.ck", "!www.ck",
    "bd", "*.bd",
    "github.io", "blogspot.com")

  /** A PSL line's (kind, label count): `!` exception / `*.` wildcard
    * / normal; labels counts the `*` (the PSL prevailing-rule
    * order). Shared by [[suffixDim]] and the oracle replay. */
  def ruleMeta(r: String): (String, Int) = {
    val kind =
      if (r.startsWith("!")) "exception"
      else if (r.startsWith("*.")) "wildcard"
      else "normal"
    (kind, r.stripPrefix("!").split("\\.").length)
  }

  /** The rules dim: (rule, kind, rule_labels), one row per PSL line,
    * plus the implicit default rule (`*`, kind `default`, 0 labels)
    * every host matches. */
  def suffixDim(spark: SparkSession,
                rules: Seq[String] = suffixRulesSnapshot): DataFrame = {
    import spark.implicits._
    (rules.map { r =>
      val (kind, labels) = ruleMeta(r)
      (r, kind, labels)
    } :+ (("*", "default", 0))).toDF("rule", "kind", "rule_labels")
  }

  /** The host of a CANONICAL url ([[TextOps.canonicalizeUrl]] output:
    * scheme/host already lowercased, `www.` already off): the
    * authority with userinfo and any surviving non-default port
    * stripped. Empty string for non-URL inputs. */
  def hostOf(canonicalUrl: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_extract(canonicalUrl,
          "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1),
        "^[^/?#]*@", ""),
      ":[0-9]*$", "")

  /** Emit one row per distinct input (idCol, url): (idCol, url, host,
    * public_suffix, registrable_domain). `urlCol` is canonicalized
    * first (the dedup-key discipline: domain stats must not split
    * across case/port/param variants of one page). Non-URL inputs
    * and IP-literal hosts (v4 dotted-decimal or bracketed v6) yield
    * null host/suffix/domain. */
  def registrableDomains(df: DataFrame, idCol: String, urlCol: Column,
                         rules: Option[DataFrame] = None): DataFrame = {
    val spark = df.sparkSession
    val dim = rules.getOrElse(suffixDim(spark))
    // canonicalize once into `url`, then derive the host from THAT
    // column (deriving from urlCol after the projection would
    // reference a dropped input column)
    val rawHost = hostOf(col("url"))
    val isIp = rawHost.rlike("^[0-9.]+$") || rawHost.contains("[")
    val in = df.select(col(idCol),
        TextOps.canonicalizeUrl(urlCol).as("url"))
      .withColumn("host", when(isIp || rawHost === "", lit(null))
        .otherwise(rawHost))
      .withColumn("__ls", split(col("host"), "\\."))
      .withColumn("__n", size(col("__ls")))
      .distinct()
    // hostless rows (non-URL, IP) carry their nulls straight through;
    // everything below runs on the hosted slice only
    val hostless = in.filter(col("host").isNull)
      .select(col(idCol), col("url"), col("host"),
        lit(null).cast("string").as("public_suffix"),
        lit(null).cast("string").as("registrable_domain"))
    // suffix rows (row-local): the suffix starting at label i
    // (1-based), with __slen = labels AFTER its first (its parent's
    // label count)
    val sfx = in.filter(col("host").isNotNull)
      .select(col(idCol), col("url"), col("host"), col("__ls"),
        col("__n"),
        posexplode(transform(sequence(lit(1), col("__n")), i =>
          array_join(slice(col("__ls"), i, col("__n") - i + 1), ".")))
          .as(Seq("__i0", "__suffix")))
      .withColumn("__slen", col("__n") - col("__i0") - 1)
    // candidate keys per suffix row: normal, exception, wildcard
    // (when a parent exists), and — once per host, on its full-host
    // suffix row — the always-matching default key
    val cands = sfx
      .select(col(idCol), col("url"), col("host"), col("__ls"),
        col("__n"), col("__suffix"), col("__slen"),
        explode(array(
          struct(col("__suffix").as("__key"),
            lit("normal").as("__want")),
          struct(concat(lit("!"), col("__suffix")).as("__key"),
            lit("exception").as("__want")),
          struct(when(col("__slen") >= 1,
              concat(lit("*."), call_function("substring_index",
                col("__suffix"), lit("."), -col("__slen"))))
            .as("__key"), lit("wildcard").as("__want")),
          struct(when(col("__i0") === 0, lit("*")).as("__key"),
            lit("default").as("__want")))).as("__cand"))
      .filter(col("__cand.__key").isNotNull)
    // broadcast match + per-match implied public suffix and priority
    val matched = cands.join(broadcast(dim),
        cands("__cand.__key") === dim("rule") &&
          cands("__cand.__want") === dim("kind"))
      .withColumn("__ps",
        when(col("kind") === "exception",
          call_function("substring_index",
            col("__suffix"), lit("."), -col("__slen")))
          .when(col("kind") === "default",
            element_at(col("__ls"), -1))
          .otherwise(col("__suffix")))
      .withColumn("__prio", struct(
        when(col("kind") === "exception", 1).otherwise(0).as("exc"),
        col("rule_labels").as("rl")))
    // prevailing rule: exception outranks, else most labels — ONE
    // hash agg back to input cardinality (url/host/__ls/__n are
    // functionally dependent on the distinct (id, url) key)
    val best = matched
      .groupBy(col(idCol), col("url"), col("host"), col("__ls"),
        col("__n"))
      .agg(max_by(col("__ps"), col("__prio")).as("__ps"))
      .withColumn("__pslen", size(split(col("__ps"), "\\.")))
      .select(col(idCol), col("url"), col("host"),
        col("__ps").as("public_suffix"),
        when(col("__n") <= col("__pslen"), lit(null))
          .otherwise(array_join(
            slice(col("__ls"), col("__n") - col("__pslen"),
              col("__pslen") + 1), "."))
          .as("registrable_domain"))
    best.unionByName(hostless)
  }
}
