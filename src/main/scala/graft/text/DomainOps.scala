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

  /** Parse the publicsuffix.org list's FILE format into rule lines
    * for [[suffixDim]] — the production swap-in path for the real
    * ~15k-line list. Per the public spec: a line is read up to its
    * first whitespace; `//` lines are comments (including the
    * `===BEGIN PRIVATE DOMAINS===` section markers — private-section
    * RULES are kept, matching [[suffixRulesSnapshot]]'s stance that
    * multi-tenant hosts are distinct publishers); blank lines are
    * skipped. Rules are lowercased and any non-ASCII (IDN) label is
    * punycoded via java.net.IDN, so the list's unicode spellings
    * match the ASCII hosts [[hostOf]] produces.
    *
    * IDN contract (spec-pinned): HOSTS must arrive punycoded —
    * [[TextOps.canonicalizeUrl]] lowercases but does not IDN-encode,
    * so a raw-unicode host matches no rule and resolves through the
    * default rule; crawlers of IDN space encode upstream
    * (java.net.IDN.toASCII at ingestion). RULES may be unicode (the
    * real list mixes spellings) — this parser normalizes them via
    * java.net.IDN, which implements IDNA2003 (r19 ADVICE): it maps
    * e.g. `ß`→`ss` where UTS-46 encoders keep `xn--`-encoded `ß`,
    * and it REJECTS some labels UTS-46 accepts. A label it rejects
    * fails THIS PARSE loudly (IllegalArgumentException naming the
    * rule) rather than silently normalizing to a spelling the
    * matching hosts never carry — and the sanctioned way around both
    * divergences is to feed the PUNYCODED PSL variant publicsuffix
    * .org ships (every label already ASCII, this branch never
    * fires). */
  def parsePslList(lines: Seq[String]): Seq[String] =
    lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map(_.split("\\s+")(0).toLowerCase(java.util.Locale.ROOT))
      .map { r =>
        val (prefix, body) =
          if (r.startsWith("!")) ("!", r.substring(1))
          else if (r.startsWith("*.")) ("*.", r.substring(2))
          else ("", r)
        prefix + body.split("\\.").map { lbl =>
          if (lbl.forall(_ < 128)) lbl
          else try java.net.IDN.toASCII(lbl)
          catch {
            case e: IllegalArgumentException =>
              throw new IllegalArgumentException(
                s"PSL rule '$r': label '$lbl' is not IDNA2003-" +
                  "encodable (java.net.IDN); feed the punycoded " +
                  "PSL variant from publicsuffix.org instead of " +
                  "the unicode one", e)
          }
        }.mkString(".")
      }

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

  /** The snapshot rendered as SQL VALUES rows `('rule','kind',labels)`
    * including the implicit default rule — shared by the DuckDB
    * oracle and the Spark SQL cookbook recipe so neither can drift
    * from the engine's checked-in list. */
  def rulesValuesSql: String =
    (suffixRulesSnapshot.map { r =>
      val (kind, labels) = ruleMeta(r)
      s"('$r','$kind',$labels)"
    } :+ "('*','default',0)").mkString(", ")

  /** The rules dim: (rule, kind, rule_labels), one row per PSL line,
    * plus the implicit default rule (`*`, kind `default`, 0 labels)
    * every host matches. */
  def suffixDim(spark: SparkSession,
                rules: Seq[String] = suffixRulesSnapshot): DataFrame = {
    import spark.implicits._
    (rules.map { r =>
      val (kind, labels) = ruleMeta(r)
      require(labels < 1024,
        s"PSL rule '${r.take(40)}' has $labels labels: the packed " +
          "match priority gives rule_labels 10 bits (valid DNS names " +
          "have at most 127 labels)")
      (r, kind, labels)
    } :+ (("*", "default", 0))).toDF("rule", "kind", "rule_labels")
  }

  /** The host of a CANONICAL url ([[TextOps.canonicalizeUrl]] output:
    * scheme/host already lowercased, `www.` already off): the
    * authority with userinfo, any surviving non-default port, and ALL
    * trailing dots stripped (a fully-qualified `example.com.` is the
    * same host as `example.com` — the PSL algorithm specifies the
    * strip, and without it the empty trailing label would win the
    * default rule and emit a phantom domain; a malformed crawl host
    * like `example.com..` must strip BOTH dots or its empty last
    * label wins the same way — r18 ADVICE). Empty string for
    * non-URL inputs. */
  def hostOf(canonicalUrl: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_extract(canonicalUrl,
            "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1),
          "^[^/?#]*@", ""),
        ":[0-9]*$", ""),
      "\\.+$", "")

  /** Emit one row per distinct input (idCol, url): (idCol, url, host,
    * public_suffix, registrable_domain). `urlCol` is canonicalized
    * first (the dedup-key discipline: domain stats must not split
    * across case/port/param variants of one page). Non-URL inputs
    * and IP-literal hosts (v4 dotted-decimal or bracketed v6) yield
    * null host/suffix/domain.
    *
    * Plan notes (r18 measured — 3.7 s → 0.4 s at sf0.1): the
    * canonicalize/host projection is a LARGE expression tree with
    * higher-order lambdas (no whole-stage codegen — it runs
    * interpreted), so it must evaluate EXACTLY ONCE per row, under
    * the distinct's exchange. That dictates three structural rules:
    * ONE pipeline (a hosted/hostless union would re-scan and
    * re-canonicalize), NO predicate on host above the distinct (a
    * `host IS NOT NULL` filter gets pushed below the exchange and
    * re-evaluates the whole tree per row — hostless rows instead
    * ride through on the default-rule candidate and resolve to
    * nulls), and a LONG-encoded match priority so the prevailing
    * pick is a plain max() HashAggregate (max_by over a struct
    * forces a SortAggregate). */
  def registrableDomains(df: DataFrame, idCol: String, urlCol: Column,
                         rules: Option[DataFrame] = None): DataFrame = {
    val spark = df.sparkSession
    // loud bound on the arbitrary-rules swap-in path (r18 ADVICE):
    // the packed priority gives rule_labels and __i0 ten bits each
    // (valid DNS hosts/rules have ≤ 127 labels); a malformed rules
    // row past the bound must fail the broadcast build, not silently
    // pick the wrong prevailing rule. suffixDim already requires this
    // driver-side; an externally-built dim gets the same check as a
    // per-dim-row branch (evaluated once per ~15k broadcast rows).
    val dim = rules.getOrElse(suffixDim(spark)).withColumn(
      "rule_labels",
      when(col("rule_labels").between(0, 1023), col("rule_labels"))
        .otherwise(raise_error(concat(
          lit("PSL rule_labels out of [0,1024) for rule '"),
          col("rule"), lit("'")))))
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
    // suffix rows (row-local): the suffix starting at label i0+1
    // (__i0 is posexplode's 0-based position), with __slen = labels
    // AFTER its first. A hostless row (null __ls/__n) emits exactly
    // one row with a null suffix via the coalesce'd sequence — its
    // only surviving candidate below is the default rule.
    val sfx = in
      .select(col(idCol), col("url"), col("host"), col("__ls"),
        col("__n"),
        posexplode(transform(
          sequence(lit(1), coalesce(col("__n"), lit(1))), i =>
            array_join(slice(col("__ls"), i,
              coalesce(col("__n"), lit(1)) - i + 1), ".")))
          .as(Seq("__i0", "__suffix")))
      .withColumn("__slen", col("__n") - col("__i0") - 1)
    // candidate keys per suffix row: normal, exception, wildcard
    // (when a parent exists), and — once per row group, on the
    // full-host suffix row — the always-matching default key
    val cands = sfx
      .select(col(idCol), col("url"), col("host"), col("__n"),
        col("__i0"), col("__suffix"), col("__slen"),
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
    // broadcast match; the whole decision packs into ONE long —
    // (exception?, rule_labels) is the PSL prevailing order, (i0,
    // kind) the deterministic remainder that lets ps reconstruct
    // post-agg. Equal (exc, rl) matches imply the same public suffix
    // (a rule of L labels can only match the last-L-labels suffix),
    // so the tiebreak bits never change the answer.
    val kindCode = when(col("kind") === "normal", 0)
      .when(col("kind") === "wildcard", 1)
      .when(col("kind") === "exception", 2)
      .otherwise(3)
    // __i0 gets the same 10-bit loud bound as rule_labels: a
    // pathological dot-run "host" past 1024 labels must fail, not
    // wrap into a wrong priority (valid DNS is ≤ 127 labels; real
    // crawl junk hits the isIp/empty null path long before this)
    val i0Safe = when(col("__i0") < 1024, col("__i0"))
      .otherwise(raise_error(concat(
        lit("host has ≥1024 labels: "), col("host"))).cast("int"))
    val matched = cands.join(broadcast(dim),
        cands("__cand.__key") === dim("rule") &&
          cands("__cand.__want") === dim("kind"))
      .select(col(idCol), col("url"), col("host"), col("__n"),
        (((when(col("kind") === "exception", 1L).otherwise(0L) *
          1024L + col("rule_labels")) * 1024L + i0Safe) * 4L +
          kindCode).as("__code"))
    // prevailing rule = plain max over the encoded priority: a
    // HashAggregate with map-side partials, back to input
    // cardinality (url/host/__n are functionally dependent on the
    // distinct (id, url) key)
    val best = matched
      .groupBy(col(idCol), col("url"), col("host"), col("__n"))
      .agg(max(col("__code")).as("__code"))
    // decode the winner row-locally: ps from (i0, kind) against the
    // re-split host labels (cheap — host is an attribute here)
    val ls = split(col("host"), "\\.")
    val i0 = (col("__code") / 4).cast("long") % 1024L
    val kc = col("__code") % 4
    val psLen = when(kc === 2, col("__n") - i0 - 1)
      .when(kc === 3, lit(1L))
      .otherwise(col("__n") - i0)
    best
      .withColumn("public_suffix",
        when(col("host").isNull, lit(null).cast("string"))
          .otherwise(array_join(
            slice(ls, (col("__n") - psLen + 1).cast("int"),
              psLen.cast("int")), ".")))
      .withColumn("registrable_domain",
        when(col("host").isNull || col("__n") <= psLen, lit(null))
          .otherwise(array_join(
            slice(ls, (col("__n") - psLen).cast("int"),
              (psLen + 1).cast("int")), ".")))
      .select(col(idCol), col("url"), col("host"),
        col("public_suffix"), col("registrable_domain"))
  }
}
