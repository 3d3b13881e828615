package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL normalization and host extraction for web-corpus curation — the
  * standard Common-Crawl-pipeline pass (CCNet / RefinedWeb / Dolma all
  * run one): canonicalize each document's URL, strip click-tracking
  * query parameters, extract host and registrable domain, then dedup /
  * filter / stratify BY domain.
  *
  * Everything here is pure regex-and-CASE over the URL string — native
  * codegen'd `regexp_*` expressions, deliberately NOT `java.net.URI`
  * (whose parse failures throw on the malformed URLs a web corpus is
  * full of) and NOT `parse_url` (whose Java-specific edge semantics an
  * external oracle can't replay). Row-local, zero shuffles, and every
  * regex sticks to the RE2-compatible subset (no lookarounds) so the
  * exact same patterns run in DuckDB/RE2 engines.
  *
  * Scale: all scalar expressions inside whole-stage codegen; a
  * domain-level groupBy after [[registrableDomain]] shuffles only
  * (domain, counters) pairs, never URLs or payloads.
  */
object UrlOps {

  /** Query-parameter names that carry click-tracking state, not
    * content identity: the utm_* family plus the big ad/mail-platform
    * click ids (public lists: Google/Facebook/Microsoft docs). */
  private[graft] val trackingNames =
    "utm_[a-z0-9_]*|fbclid|gclid|msclkid|yclid|igshid|mc_eid|mc_cid|_ga"

  private val schemePrefix = "^[a-zA-Z][a-zA-Z0-9+.-]*://"

  /** Lowercased scheme; empty string when the value has no
    * `scheme://` prefix (protocol-relative or garbage rows). */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, s"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))

  /** The authority component minus userinfo — `host[:port]`, original
    * case. Empty string when there is no authority. */
  private def hostPort(url: Column): Column =
    regexp_replace(
      regexp_extract(url, s"$schemePrefix([^/?#]*)", 1),
      "^[^@]*@", "")

  /** Lowercased hostname (authority minus userinfo and port). */
  def host(url: Column): Column =
    lower(regexp_replace(hostPort(url), ":[0-9]*$", ""))

  /** Registrable-domain HEURISTIC: the last two dot-labels of the
    * host (`news.bbc.co.uk` → `co.uk`). Correct for generic TLDs,
    * wrong for two-level public suffixes — the honest fix is the
    * Public Suffix List, a data file this environment doesn't ship;
    * callers that have one should join against it instead. */
  def registrableDomain(url: Column): Column =
    regexp_extract(host(url), "([^.]+\\.[^.]+)$", 1)

  /** URL with tracking query parameters removed and separators
    * re-tidied. Three global regex passes (each RE2-safe):
    *   1. drop every RUN of `name=value&` pairs whose name is a
    *      tracking name, keeping the `?`/`&` that introduced the run
    *      (runs, not single params: a global pass can't re-examine the
    *      separator it just consumed, so consecutive tracking params
    *      must die in one match);
    *   2. collapse separators left dangling before the fragment;
    *   3. strip a trailing `?`/`&` when the whole query died.
    * Names anchor to a real `?`/`&` so `myutm_x=1` (tracking-name as a
    * SUFFIX of a legit name) survives. */
  def stripTrackingParams(url: Column): Column = {
    val dropped = regexp_replace(
      url, s"(?i)([?&])((?:$trackingNames)=[^&#]*&?)+", "$1")
    val preFrag = regexp_replace(dropped, "[?&]+#", "#")
    regexp_replace(preFrag, "[?&]+$", "")
  }

  /** Canonical URL: lowercased scheme and host, userinfo and fragment
    * dropped, default port stripped (80 for http, 443 for https —
    * scheme-aware, not blanket), empty path normalized to `/`,
    * tracking params stripped. Rows without a `scheme://` prefix pass
    * through unchanged (a relative reference has no authority to
    * normalize — garbage in, same garbage out, never null). */
  def canonicalize(url: Column): Column = {
    val sch = scheme(url)
    val hp = hostPort(url)
    val port = regexp_extract(hp, ":([0-9]+)$", 1)
    val keepPort = (port =!= "") &&
      !((sch === "http" && port === "80") || (sch === "https" && port === "443"))
    // path?query, fragment dropped, tracking stripped; "" → "/"
    val rest = stripTrackingParams(
      regexp_replace(regexp_replace(url, "#.*$", ""), s"$schemePrefix[^/?#]*", ""))
    val built = concat(
      sch, lit("://"), host(url),
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      when(rest === "", lit("/")).otherwise(rest))
    when(sch === "", url).otherwise(built)
  }

  /** Remove rows whose registrable domain is on a blocklist — the
    * URL-level filter every web-corpus pipeline runs (spam/adult/SEO
    * domain lists). Matching is by [[registrableDomain]], so
    * `spam.example.com` is caught by a `example.com` entry exactly when
    * the naive last-two-labels rule says so (same caveat as
    * registrableDomain; bring a PSL join for two-level suffixes).
    *
    * Scale: blocklists are millions of rows at most — the anti-join
    * broadcasts the lowercased domain set (a forced hint; even a 10M ×
    * 20-char list is ~moderate broadcast state), so the corpus never
    * shuffles. For a list too big even for that, pre-filter with
    * [[BloomJoin.bloomSemiJoin]] on the domain instead. */
  def dropBlockedDomains(
      df: DataFrame, urlCol: String,
      blocklist: DataFrame, domainCol: String): DataFrame = {
    val bad = blocklist.select(lower(col(domainCol)).as("__bad_domain")).distinct()
    df.join(broadcast(bad),
      registrableDomain(col(urlCol)) === col("__bad_domain"), "left_anti")
  }
}
