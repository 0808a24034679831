package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-crawl curation — the normalization
  * pass that runs before URL-level dedup and domain aggregation in
  * every crawl pipeline (two captures of one page routinely differ
  * only in scheme/host case, default ports, tracking params,
  * fragments, or trailing slashes; without canonicalization the
  * URL-dedup key is noise). Pure codegen'd column expressions
  * (regexp_replace chains + split/filter/sort higher-order functions
  * in the Java-regex/RE2 shared subset) — map-only at any scale, and
  * every step replays in the DuckDB oracle.
  *
  * Deliberately NOT done here: public-suffix-list registered-domain
  * extraction (the PSL is a versioned external artifact; [[host]] is
  * the stable primitive) and percent-encoding normalization (%-case
  * differences are rare and encoding tables are locale-free but
  * large — a documented contract gap, not a silent one).
  */
object UrlOps {

  /** Tracking query parameters stripped by [[canonicalizeUrl]] —
    * the standard analytics/click-id families.
    */
  val TrackingParams: Seq[String] =
    Seq("utm_[a-z]+", "fbclid", "gclid", "msclkid", "ref", "mc_eid")

  private val trackingRe = s"^(${TrackingParams.mkString("|")})="

  /** Canonical form:
    *  1. scheme and host lowercased (path/query stay case-sensitive);
    *  2. default ports dropped (:80 for http, :443 for https);
    *  3. fragment dropped;
    *  4. tracking params dropped, surviving params SORTED (param
    *     order is not semantic; sorting makes equal param sets equal
    *     strings), empty query dropped;
    *  5. trailing slash dropped from non-root paths;
    *  6. `www.` prefix dropped (the dedup convention: www/apex pairs
    *     are the same logical page).
    */
  def canonicalizeUrl(url: Column): Column = {
    // 1: lowercase scheme://host[:port] — the prefix up to the first
    // '/' (or '?'/'#') after the authority; regexp_replace has no
    // callback, so split at the authority boundary instead
    val schemeHost = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    val rest = regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    // 2: default port only for ITS scheme (http://x:443 keeps :443)
    val hostNorm = regexp_replace(
      regexp_replace(
        regexp_replace(schemeHost, "^(http://[^:/]*):80$", "$1"),
        "^(https://[^:/]*):443$", "$1"),
      "^(https?://)www\\.", "$1")
    // 3: fragment off the tail first (so query handling sees no '#')
    val noFrag = regexp_replace(rest, "#.*$", "")
    val path = regexp_extract(noFrag, "^([^?]*)", 1)
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    // 4: param surgery on the query string
    val params = filter(split(query, "&"),
      p => length(p) > 0 && !(p rlike trackingRe))
    val queryNorm = concat_ws("&", array_sort(params))
    // 5: trailing slash off non-root paths
    val pathNorm = when(path rlike "^.+/$",
      regexp_replace(path, "/$", "")).otherwise(path)
    concat(hostNorm, pathNorm,
      when(length(queryNorm) > 0, concat(lit("?"), queryNorm))
        .otherwise(lit("")))
  }

  /** Lowercased host, no port, `www.` stripped (same www≡apex
    * convention as the canonical form) — the domain-aggregation key.
    */
  def host(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)", 1)),
      "^www\\.", "")
}
