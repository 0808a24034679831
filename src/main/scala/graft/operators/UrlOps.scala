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
  * Registered-domain extraction lives in [[PublicSuffix]] (r11 —
  * the PSL is a versioned artifact, pinned there as a broadcast
  * dimension); percent-encoding normalization is
  * [[percentNormalize]] (r11), kept as its own pass so each
  * normalization is independently gateable.
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

  /** RFC 3986 §6.2.2 percent-encoding normalization (r11 — promoted
    * from the documented gap): two captures of one URL routinely
    * differ only in `%7e` vs `%7E` vs `~`, so without this pass the
    * URL-dedup key still carries encoding noise. Rules, straight
    * from the RFC:
    *  - a percent-escape of an UNRESERVED character (ALPHA / DIGIT /
    *    `-` `.` `_` `~`) decodes to the character (`%41` → `A`);
    *  - any other valid escape keeps its `%` but uppercases the hex
    *    digits (`%2f` → `%2F` — decoding a reserved char would
    *    change meaning);
    *  - malformed escapes (`%zz`, `%4`, trailing `%`) pass through
    *    untouched — normalizing garbage would destroy evidence.
    * Pure HOF rendering: split on `%`, indexed transform fixes each
    * fragment's leading escape, concat back — map-only, codegen'd,
    * and every step replays in DuckDB (strpos-over-hex-digits value
    * decode, the duckSignedBytes pattern). Composes BEFORE
    * [[canonicalizeUrl]] when both passes are wanted; kept separate
    * so each normalization is independently gateable.
    */
  def percentNormalize(url: Column): Column = {
    val parts = split(url, "%")
    concat_ws("", transform(parts, (p, i) => {
      val h2 = substring(p, 1, 2)
      val code = conv(h2, 16, 10).cast("int")
      val unreserved = (code >= 65 && code <= 90) ||
        (code >= 97 && code <= 122) ||
        (code >= 48 && code <= 57) ||
        code.isin(45, 46, 95, 126)
      val rest = substring(p, 3, 1000000)
      when(i === 0, p).otherwise(
        when(h2 rlike "^[0-9A-Fa-f]{2}$",
          when(unreserved, concat(chr(code), rest))
            .otherwise(concat(lit("%"), upper(h2), rest)))
          .otherwise(concat(lit("%"), p)))
    }))
  }
}
