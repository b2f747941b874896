package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and domain extraction — the normalization step a
  * web-crawl training pipeline runs before URL-level dedup and domain
  * filtering (beyond-reference addition; the reference has no URL surface).
  *
  * Everything here is a composition of codegen'd string/regexp/array
  * expressions over one scan: no UDF, no shuffle, no state. At 100 TB the
  * cost is the scan itself; canonicalization rides whatever pass already
  * reads the column. The rules are deliberately engine-portable (regexp +
  * list ops that exist in any SQL engine) so a downstream system can
  * re-derive the canonical form and verify joins against it.
  *
  * Canonical form:
  *   - scheme and host lowercased; userinfo dropped; leading `www.` dropped
  *   - default ports removed (http:80, https:443), others kept
  *   - fragment dropped
  *   - tracking params removed (`utm_*`, `fbclid`, `gclid`, `msclkid`,
  *     `ref`), remaining params sorted byte-wise
  *   - trailing slashes stripped from the path
  * Strings without a `scheme://` prefix canonicalize to null (not-a-URL).
  */
object UrlOps {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val TrackingRe = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)"

  /** Multi-label public suffixes recognized by [[registeredDomain]] — the
    * high-traffic subset; a production deployment would load the full
    * public-suffix list into [[SetMembership]] the same way. */
  val MultiPartTlds: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "co.jp", "com.au", "com.br",
    "co.in", "com.cn")

  private def hostport(url: Column): Column =
    // the host begins after the LAST '@' in the authority (WHATWG/RFC
    // 3986 — userinfo may itself contain '@'); the former lazy
    // "^[^@]*@" stripped only to the FIRST one, so a crafted
    // "http://a@b@evil.com/" yielded host "b@evil.com" and bypassed
    // domain blocklists (r19 hunt)
    regexp_replace(regexp_extract(url, HostRe, 1), "^.*@", "")

  /** Lowercased registrable host: userinfo, port, leading `www.` and any
    * trailing dot (FQDN form — `example.com.` ≡ `example.com`, and the
    * dangling dot would otherwise break the suffix-table match AND
    * blocklist equality; r19 hunt) removed. */
  def domain(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_replace(hostport(url), ":[0-9]+$", "")),
        "^www\\.", ""),
      "\\.+$", "")

  /** eTLD+1 of [[domain]] under the [[MultiPartTlds]] suffix table:
    * `a.b.example.co.uk` → `example.co.uk`, `a.example.com` →
    * `example.com`. */
  def registeredDomain(url: Column): Column = {
    val ls = split(domain(url), "\\.")
    val n = size(ls)
    val last2 = concat_ws(".", element_at(ls, -2), element_at(ls, -1))
    val last3 = concat_ws(".", element_at(ls, -3), last2)
    when(n >= 3 && last2.isin(MultiPartTlds: _*), last3)
      .when(n >= 2, last2)
      .otherwise(domain(url))
  }

  /** Canonical URL (see object doc); null when `url` has no scheme. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val host = domain(url)
    val port = regexp_extract(hostport(url), ":([0-9]+)$", 1)
    val path = regexp_replace(regexp_extract(url, PathRe, 1), "/+$", "")
    // the query starts at the FIRST '?' before any '#': the prefix class
    // excludes BOTH '#' and '?' — an unanchored extract resurrected a
    // "?x=1" living inside the fragment (r18 hunt), and a '^[^#]*'
    // prefix backtracks greedily to the LAST '?' and drops earlier
    // params like "?next=/page?x=1" (r18 fourth-pass review; '?' is
    // legal inside an RFC 3986 query)
    val rawQ = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val q = array_join(array_sort(filter(split(rawQ, "&"),
      x => x =!= "" && !x.rlike(TrackingRe))), "&")
    // leading-zero-normalized compare + re-render: a zero-padded default
    // port (":080") failed the former raw STRING compare and survived,
    // and a padded non-default port kept its padding — both produced
    // non-canonical duplicates that URL dedup missed (r19 hunt). The
    // normalization is pure string regex, NOT a cast: an absurd
    // 12-digit port would crash a cast under ANSI (this function's
    // contract is null/passthrough, never crash on dirty crawl data)
    // and silently drop under non-ANSI (r19 review)
    val portNorm = regexp_replace(port, "^0+([0-9])", "$1")
    val keepPort = portNorm =!= "" &&
      !(scheme === "http" && portNorm === "80") &&
      !(scheme === "https" && portNorm === "443")
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(
        scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), portNorm)).otherwise(lit("")),
        path,
        when(q =!= "", concat(lit("?"), q)).otherwise(lit(""))))
  }

  /** Drop rows whose registered domain is on `blocked` — the blocklist
    * filter of a crawl pipeline. Small lists fold into the scan as an
    * `isin` predicate; large lists become a broadcast anti-join (the
    * blocklist ships to executors once; `df` is never shuffled). */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
      blocked: Seq[String], inlineThreshold: Int = 256): DataFrame = {
    val rd = registeredDomain(col("`" + urlCol.replace("`", "``") + "`"))
    // sanitize: a null/empty entry (a blocklist file's blank line) would
    // turn the inline `isin` three-valued for every non-matching row —
    // dropping nearly everything — while the anti-join path ignores it
    // (r18 fourth-pass review); neither is a real domain, so strip both.
    // Entries then normalize to the registeredDomain output form —
    // lowercase, no leading www., no trailing dot (r19 hunt: a
    // "Doubleclick.NET" entry silently never matched on either path)
    val cleaned = blocked.filterNot(b => b == null || b.isEmpty)
      .map(_.toLowerCase.stripPrefix("www.").replaceAll("\\.+$", ""))
      .filterNot(_.isEmpty)
    if (cleaned.isEmpty) df
    else if (cleaned.size <= inlineThreshold)
      // rd is null exactly when the url value is null; `!isin` on a null
      // is null and the filter would DROP the row, where the anti-join
      // path below keeps it (r18 hunt: the two paths diverged at the
      // threshold). A null url is not blocked — keep it on both paths.
      df.filter(rd.isNull || !rd.isin(cleaned: _*))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      df.join(broadcast(cleaned.toDF("__blocked_rd")),
        rd === col("__blocked_rd"), "left_anti")
    }
  }
}
