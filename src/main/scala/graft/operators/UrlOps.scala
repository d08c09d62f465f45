package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and domain-level curation for crawl corpora.
  *
  * A web-scale training pipeline's first grouping key is the URL: exact
  * dedup by canonical URL, per-domain document caps (no single host may
  * dominate the mixture), domain blocklists, and per-registered-domain
  * stats. All of it is plain column algebra — regexp extraction plus
  * string rebuild — so every step is codegen'd, fully distributed, and
  * mirrorable verbatim in the DuckDB oracle (the `*SqlExpr` twins below).
  *
  * Parsing is regexp-based rather than `parse_url` so the Spark plan and
  * the oracle SQL share one grammar: scheme `://` host[:port] path
  * [?query] [#fragment]. Inputs that don't match the grammar normalize to
  * empty components, never throw.
  *
  * 100 TB notes: normalization/domain extraction are narrow (no shuffle);
  * [[domainStats]] is one hash aggregate on eTLD+1 (low cardinality →
  * map-side partials collapse it); [[perDomainCap]] shuffles once on
  * (domain, md5-prefix bucket) via [[Sampling.perKey]]'s distributed
  * prefix machinery — a wikipedia.org-scale hub domain splits across
  * 256 buckets instead of landing on one sorted task, with no pre-thin
  * pass needed.
  */
object UrlOps {

  /** Query params stripped by [[normalizeUrl]]: tracking/click IDs that
    * differ per impression but never change the document behind the URL. */
  val TrackingParamRe = "^(utm_[A-Za-z]+|gclid|fbclid|msclkid|ref|mc_eid)="

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostPortRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val QueryRe = "\\?([^#]*)"

  /** Two-level public suffixes recognized by [[registeredDomain]]. A
    * heuristic slice of the public-suffix list: enough for grouping
    * crawl domains and cheap (one regexp, no join). For PSL-exact
    * grouping — wildcard rules, exceptions, 3-label suffixes — use
    * [[PublicSuffix.registeredDomainPsl]] (broadcast longest-match
    * join over the embedded snapshot, q_domain_stats2's oracle-proven
    * path). */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "co.jp",
    "or.jp", "co.in", "com.br", "com.cn", "com.mx", "co.nz", "co.za")

  private val RegDomainRe =
    "([^.]+\\.(?:" + TwoLevelSuffixes.map(_.replace(".", "\\.")).mkString("|") +
      ")|[^.]+\\.[^.]+)$"

  /** Lower-cased scheme of `url` ('' when the grammar doesn't match). */
  def schemeOf(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** Lower-cased host of `url`, port stripped (kept: www. prefix — host
    * identity is [[registeredDomain]]'s job, not this one's). */
  def hostOf(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, HostPortRe, 1)), ":[0-9]+$", "")

  /** eTLD+1 of a (lower-case) host: last two labels, or last three when
    * the tail is a known two-level public suffix. '' for dotless hosts. */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, RegDomainRe, 1)

  /** Registered domain straight from a raw URL. */
  def urlDomain(url: Column): Column = registeredDomain(hostOf(url))

  /** Canonical form of a URL:
    *   - scheme and host lower-cased; fragment dropped
    *   - default port stripped (http:80 / https:443); other ports kept
    *   - empty path → '/', trailing slashes trimmed elsewhere
    *   - query params: tracking params ([[TrackingParamRe]]) and empties
    *     removed, the rest sorted (param order never changes content)
    * Non-URL input (no scheme://host) canonicalizes to '://'-rooted
    * emptiness; callers gate on `schemeOf =!= ""` when input is dirty. */
  def normalizeUrl(url: Column): Column = {
    val scheme = schemeOf(url)
    val hostport = lower(regexp_extract(url, HostPortRe, 1))
    val host = regexp_replace(hostport, ":[0-9]+$", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = (port =!= "") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val hostOut = concat(host, when(keepPort, concat(lit(":"), port)).otherwise(lit("")))
    val rawPath = regexp_extract(url, PathRe, 1)
    val pathOut = when(rawPath === "" || rawPath === "/", lit("/"))
      .otherwise(regexp_replace(rawPath, "/+$", ""))
    val rawQuery = regexp_extract(url, QueryRe, 1)
    val params = array_sort(filter(split(rawQuery, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe)))
    val qOut = when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
      .otherwise(lit(""))
    concat(scheme, lit("://"), hostOut, pathOut, qOut)
  }

  /** Per-registered-domain corpus stats: document count and char volume.
    * One hash aggregate keyed on eTLD+1 — partial aggregation collapses
    * it map-side, so the shuffle carries one row per (task, domain). */
  def domainStats(df: DataFrame, urlCol: String, charsCol: String): DataFrame =
    df.groupBy(urlDomain(col(urlCol)).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(charsCol).cast("long")).as("n_chars"))

  /** Keep at most `cap` rows per registered domain, chosen by the stable
    * md5 pseudo-random order (reuses [[Sampling.perKey]] — reproducible
    * across runs/engines, no rand()). The anti-monoculture dial: no
    * domain contributes more than `cap` documents to the mixture. */
  def perDomainCap(df: DataFrame, urlCol: String, idCol: String,
                   cap: Int): DataFrame = {
    require(cap > 0, s"cap must be > 0, got $cap")
    Sampling.perKey(df.withColumn("__domain", urlDomain(col(urlCol))),
        Seq("__domain"), idCol, cap)
      .drop("__domain")
  }

  /** Drop rows whose registered domain is in `blocked` (literal IN —
    * fine for hand-curated lists; for a large blocklist table use a
    * broadcast LEFT ANTI join on the domain instead). */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
                           blocked: Seq[String]): DataFrame =
    df.where(!urlDomain(col(urlCol)).isin(blocked: _*))

  // ---- DuckDB oracle twins (same grammar, same regexes) ----

  def schemeSqlExpr(u: String): String =
    s"lower(regexp_extract($u, '$SchemeRe', 1))"

  def hostSqlExpr(u: String): String =
    s"regexp_replace(lower(regexp_extract($u, '$HostPortRe', 1)), ':[0-9]+$$', '')"

  def registeredDomainSqlExpr(host: String): String =
    s"regexp_extract($host, '$RegDomainRe', 1)"

  def urlDomainSqlExpr(u: String): String =
    registeredDomainSqlExpr(hostSqlExpr(u))

  def normalizeUrlSqlExpr(u: String): String = {
    val scheme = schemeSqlExpr(u)
    val hostport = s"lower(regexp_extract($u, '$HostPortRe', 1))"
    val host = s"regexp_replace($hostport, ':[0-9]+$$', '')"
    val port = s"regexp_extract($hostport, ':([0-9]+)$$', 1)"
    val keepPort = s"($port <> '' AND NOT (($scheme = 'http' AND $port = '80') " +
      s"OR ($scheme = 'https' AND $port = '443')))"
    val hostOut = s"($host || CASE WHEN $keepPort THEN ':' || $port ELSE '' END)"
    val rawPath = s"regexp_extract($u, '$PathRe', 1)"
    val pathOut = s"(CASE WHEN $rawPath IN ('', '/') THEN '/' " +
      s"ELSE regexp_replace($rawPath, '/+$$', '') END)"
    val rawQuery = s"regexp_extract($u, '\\?([^#]*)', 1)"
    val params = s"list_sort(list_filter(string_split($rawQuery, '&'), " +
      s"p -> p <> '' AND NOT regexp_matches(p, '$TrackingParamRe')))"
    val qOut = s"(CASE WHEN len($params) > 0 " +
      s"THEN '?' || array_to_string($params, '&') ELSE '' END)"
    s"($scheme || '://' || $hostOut || $pathOut || $qOut)"
  }

  // ---- deterministic synthetic URLs over the events table ----
  // (the test corpus carries no real URLs; both engines build identical
  // strings from event_id/user_id/event_type, then exercise the real ops)

  /** Spark side of the synthetic crawl URL. Mixed case, assorted default/
    * non-default ports, empty/dirty paths, tracking + unsorted params,
    * fragments — every branch of [[normalizeUrl]] is exercised. */
  def syntheticUrl(eventId: Column, userId: Column, eventType: Column): Column = {
    val scheme = when(eventId % 2 === 0, lit("HTTPS")).otherwise(lit("http"))
    val host = when(eventId % 3 === 0,
        concat(lit("WWW.News"), (userId % 7).cast("string"), lit(".Example.CO.UK")))
      .when(eventId % 3 === 1,
        concat(lit("blog"), (userId % 7).cast("string"), lit(".example.com")))
      .otherwise(concat(lit("Media"), (userId % 7).cast("string"), lit(".example.org")))
    val port = when(eventId % 4 === 0, lit(":443"))
      .when(eventId % 4 === 1, lit(":8080")).otherwise(lit(""))
    val path = when(eventId % 5 === 0, lit(""))
      .when(eventId % 5 === 1, lit("/"))
      .otherwise(concat(lit("/a/"), eventType, lit("/item"),
        (eventId % 50).cast("string"),
        when(eventId % 5 === 2, lit("/")).otherwise(lit(""))))
    val query = when(eventId % 6 === 0, lit("?utm_source=feed&z=9&a=1&gclid=XYZ"))
      .when(eventId % 6 === 1, lit("?b=2&a=1"))
      .when(eventId % 6 === 2, lit("?utm_campaign=x")).otherwise(lit(""))
    val frag = when(eventId % 7 === 0, lit("#Section2")).otherwise(lit(""))
    concat(scheme, lit("://"), host, port, path, query, frag)
  }

  /** Deterministic synthetic LINK TARGET host for the same events row —
    * the "this page links to that host" half of the crawl link graph
    * [[graft.operators.GraphOps.pageRankNano]] ranks. Same host grammar
    * as [[syntheticUrl]] (already lowercase, so it lands in the same node
    * space as [[hostOf]] of the source URL) but different residues, so
    * the graph is a dense asymmetric 21-host web rather than an identity
    * map. */
  def syntheticLinkHost(eventId: Column, userId: Column): Column = {
    val cls = (eventId + userId) % 3
    val idx = ((eventId * 3) + userId) % 7
    when(cls === 0,
        concat(lit("www.news"), idx.cast("string"), lit(".example.co.uk")))
      .when(cls === 1,
        concat(lit("blog"), idx.cast("string"), lit(".example.com")))
      .otherwise(
        concat(lit("media"), idx.cast("string"), lit(".example.org")))
  }

  /** DuckDB twin of [[syntheticLinkHost]] (events columns by name). */
  def syntheticLinkHostSqlExpr: String =
    "(CASE WHEN (event_id + user_id) % 3 = 0 " +
      "THEN 'www.news' || ((event_id * 3 + user_id) % 7) || '.example.co.uk' " +
      "WHEN (event_id + user_id) % 3 = 1 " +
      "THEN 'blog' || ((event_id * 3 + user_id) % 7) || '.example.com' " +
      "ELSE 'media' || ((event_id * 3 + user_id) % 7) || '.example.org' END)"

  /** Deterministic synthetic host exercising every [[PublicSuffix]] rule
    * kind: exact multi-label suffixes (`co.uk`), wildcards (`*.ck`,
    * `*.kawasaki.jp` — including hosts that ARE public suffixes and so
    * have no registered domain), exceptions (`www.ck`,
    * `city.kawasaki.jp`), unknown TLDs (the implicit `*` rule), a
    * dotless host, the DEEP private-section families (one label under
    * the 3-label wildcard base `*.compute.amazonaws.com`; the 5-label
    * exact `s3.dualstack.eu-west-1.amazonaws.com` both as a suffix
    * carrying a registrant label and as a bare host that IS the
    * suffix), and a punycode IDN registry (`xn--55qx5d.cn`).
    * Lower-case on purpose (PSL matching is over [[hostOf]] output). */
  def syntheticPslHost(eventId: Column, userId: Column): Column = {
    val u = (userId % 5).cast("string")
    val e = (eventId % 7).cast("string")
    val cls = eventId % 13
    when(cls === 0, concat(lit("www.site"), u, lit(".example.co.uk")))
      .when(cls === 1, concat(lit("blog"), u, lit(".shop"), e, lit(".ck")))
      .when(cls === 2, concat(lit("shop"), e, lit(".ck"))) // IS a public suffix
      .when(cls === 3, lit("www.ck")) // exception under *.ck
      .when(cls === 4, concat(lit("media"), u, lit(".city.kawasaki.jp")))
      .when(cls === 5, concat(lit("host"), u, lit(".ward"), e,
        lit(".kawasaki.jp")))
      .when(cls === 6, concat(lit("a"), e, lit(".b"), u,
        lit(".unknowntld")))
      .when(cls === 7, concat(lit("cdn"), u, lit(".example.com")))
      .when(cls === 8, concat(lit("vm"), u, lit(".region"), e,
        lit(".compute.amazonaws.com"))) // suffix = region?.compute… (4 labels)
      .when(cls === 9, concat(lit("bkt"), u,
        lit(".s3.dualstack.eu-west-1.amazonaws.com"))) // 5-label exact rule
      .when(cls === 10,
        lit("s3.dualstack.eu-west-1.amazonaws.com")) // IS the 5-label suffix
      .when(cls === 11, concat(lit("shop"), e, lit(".xn--55qx5d.cn")))
      .otherwise(lit("localhost"))
  }

  /** DuckDB twin of [[syntheticPslHost]] (events columns by name). */
  def syntheticPslHostSqlExpr: String =
    "(CASE event_id % 13 " +
      "WHEN 0 THEN 'www.site' || (user_id % 5) || '.example.co.uk' " +
      "WHEN 1 THEN 'blog' || (user_id % 5) || '.shop' || (event_id % 7) || '.ck' " +
      "WHEN 2 THEN 'shop' || (event_id % 7) || '.ck' " +
      "WHEN 3 THEN 'www.ck' " +
      "WHEN 4 THEN 'media' || (user_id % 5) || '.city.kawasaki.jp' " +
      "WHEN 5 THEN 'host' || (user_id % 5) || '.ward' || (event_id % 7) || '.kawasaki.jp' " +
      "WHEN 6 THEN 'a' || (event_id % 7) || '.b' || (user_id % 5) || '.unknowntld' " +
      "WHEN 7 THEN 'cdn' || (user_id % 5) || '.example.com' " +
      "WHEN 8 THEN 'vm' || (user_id % 5) || '.region' || (event_id % 7) || '.compute.amazonaws.com' " +
      "WHEN 9 THEN 'bkt' || (user_id % 5) || '.s3.dualstack.eu-west-1.amazonaws.com' " +
      "WHEN 10 THEN 's3.dualstack.eu-west-1.amazonaws.com' " +
      "WHEN 11 THEN 'shop' || (event_id % 7) || '.xn--55qx5d.cn' " +
      "ELSE 'localhost' END)"

  /** DuckDB twin of [[syntheticUrl]] (events columns by name). */
  def syntheticUrlSqlExpr: String = {
    val scheme = "(CASE WHEN event_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END)"
    val host = "(CASE WHEN event_id % 3 = 0 THEN 'WWW.News' || (user_id % 7) || '.Example.CO.UK' " +
      "WHEN event_id % 3 = 1 THEN 'blog' || (user_id % 7) || '.example.com' " +
      "ELSE 'Media' || (user_id % 7) || '.example.org' END)"
    val port = "(CASE WHEN event_id % 4 = 0 THEN ':443' " +
      "WHEN event_id % 4 = 1 THEN ':8080' ELSE '' END)"
    val path = "(CASE WHEN event_id % 5 = 0 THEN '' WHEN event_id % 5 = 1 THEN '/' " +
      "ELSE '/a/' || event_type || '/item' || (event_id % 50) || " +
      "(CASE WHEN event_id % 5 = 2 THEN '/' ELSE '' END) END)"
    val query = "(CASE WHEN event_id % 6 = 0 THEN '?utm_source=feed&z=9&a=1&gclid=XYZ' " +
      "WHEN event_id % 6 = 1 THEN '?b=2&a=1' " +
      "WHEN event_id % 6 = 2 THEN '?utm_campaign=x' ELSE '' END)"
    val frag = "(CASE WHEN event_id % 7 = 0 THEN '#Section2' ELSE '' END)"
    s"($scheme || '://' || $host || $port || $path || $query || $frag)"
  }
}
